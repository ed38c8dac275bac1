// hulkrt — native runtime for hulk_tpu.
//
// Implements the host-side hot paths around the TPU compute:
//   * FASTQ/FASTA line parsing + 2-bit-plus-N packing into fixed-shape
//     batches (the input feeder; reference equivalent: src/pipeline/
//     DataStreamer+FastqHandler)
//   * Go math/rand ALFG + go_rng gammavariate + CWS table generation
//     (reference: histosketch.go newCWS via leesper/go_rng)
//   * the exact histosketch flush (CMS scan + CWS update; reference:
//     histosketch.go AddElement over a spectrum dump)
//
// Exactness: exp/log are operation-for-operation ports of Go's math.Exp/Log
// (fdlibm lineage) so results are bit-identical to the Go reference and to
// the Python fdlibm port in hashes/fdlibm.py (cross-validated in tests).
//
// C ABI only; loaded from Python with ctypes.

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------------
// Go math.Exp / math.Log ports (see hashes/fdlibm.py for provenance notes)
// ---------------------------------------------------------------------------

static inline double go_ldexp(double y, int k) {
    // scalbn on finite doubles matches Ldexp exactly
    return scalbn(y, k);
}

double hulk_go_exp(double x) {
    static const double Ln2Hi = 6.93147180369123816490e-01;
    static const double Ln2Lo = 1.90821492927058770002e-10;
    static const double Log2e = 1.44269504088896338700e+00;
    static const double Overflow = 7.09782712893383973096e+02;
    static const double Underflow = -7.45133219101941108420e+02;
    static const double NearZero = 1.0 / (1 << 28);
    static const double P1 = 1.66666666666666657415e-01;
    static const double P2 = -2.77777777770155933842e-03;
    static const double P3 = 6.61375632143793436117e-05;
    static const double P4 = -1.65339022054652515390e-06;
    static const double P5 = 4.13813679705723846039e-08;

    if (std::isnan(x)) return x;
    if (std::isinf(x)) return x > 0 ? x : 0.0;
    if (x > Overflow) return HUGE_VAL;
    if (x < Underflow) return 0.0;
    if (-NearZero < x && x < NearZero) return 1.0 + x;

    int k;
    if (x < 0) k = (int)(Log2e * x - 0.5);
    else k = (int)(Log2e * x + 0.5);
    double hi = x - (double)k * Ln2Hi;
    double lo = (double)k * Ln2Lo;
    double r = hi - lo;
    double t = r * r;
    double c = r - t * (P1 + t * (P2 + t * (P3 + t * (P4 + t * P5))));
    double y = 1.0 - ((lo - (r * c) / (2.0 - c)) - hi);
    return go_ldexp(y, k);
}

double hulk_go_log(double x) {
    static const double Ln2Hi = 6.93147180369123816490e-01;
    static const double Ln2Lo = 1.90821492927058770002e-10;
    static const double L1 = 6.666666666666735130e-01;
    static const double L2 = 3.999999999940941908e-01;
    static const double L3 = 2.857142874366239149e-01;
    static const double L4 = 2.222219843214978396e-01;
    static const double L5 = 1.818357216161805012e-01;
    static const double L6 = 1.531383769920937332e-01;
    static const double L7 = 1.479819860511658591e-01;
    static const double Sqrt2Over2 = 0.7071067811865476;

    if (std::isnan(x) || (std::isinf(x) && x > 0)) return x;
    if (x < 0) return NAN;
    if (x == 0) return -HUGE_VAL;

    int ki;
    double f1 = frexp(x, &ki);
    if (f1 < Sqrt2Over2) { f1 *= 2; ki--; }
    double f = f1 - 1;
    double k = (double)ki;
    double s = f / (2 + f);
    double s2 = s * s;
    double s4 = s2 * s2;
    double t1 = s2 * (L1 + s4 * (L3 + s4 * (L5 + s4 * L7)));
    double t2 = s4 * (L2 + s4 * (L4 + s4 * L6));
    double R = t1 + t2;
    double hfsq = 0.5 * f * f;
    return k * Ln2Hi - ((hfsq - (s * (hfsq + R) + k * Ln2Lo)) - f);
}

// ---------------------------------------------------------------------------
// Go math/rand rngSource replica (see hashes/gorand.py)
// ---------------------------------------------------------------------------

struct GoRand {
    uint64_t vec[607];
    int tap, feed;
};

static int32_t seedrand(int32_t x) {
    int32_t hi = x / 44488;
    int32_t lo = x % 44488;
    x = 48271 * lo - 3399 * hi;
    if (x < 0) x += 2147483647;
    return x;
}

void hulk_gorand_seed(GoRand* g, int64_t seed, const int64_t* cooked) {
    g->tap = 0;
    g->feed = 607 - 273;
    seed %= 2147483647;
    if (seed < 0) seed += 2147483647;
    if (seed == 0) seed = 89482311;
    int32_t x = (int32_t)seed;
    for (int i = -20; i < 607; i++) {
        x = seedrand(x);
        if (i >= 0) {
            uint64_t u = (uint64_t)x << 40;
            x = seedrand(x);
            u ^= (uint64_t)x << 20;
            x = seedrand(x);
            u ^= (uint64_t)x;
            u ^= (uint64_t)cooked[i];
            g->vec[i] = u;
        }
    }
}

static inline uint64_t gorand_u64(GoRand* g) {
    if (--g->tap < 0) g->tap += 607;
    if (--g->feed < 0) g->feed += 607;
    uint64_t x = g->vec[g->feed] + g->vec[g->tap];
    g->vec[g->feed] = x;
    return x;
}

static inline double gorand_f64(GoRand* g) {
    for (;;) {
        double f = (double)(int64_t)(gorand_u64(g) & 0x7FFFFFFFFFFFFFFFULL) /
                   9223372036854775808.0;
        if (f != 1.0) return f;
    }
}

double hulk_gorand_float64(GoRand* g) { return gorand_f64(g); }
int64_t hulk_gorand_int63(GoRand* g) {
    return (int64_t)(gorand_u64(g) & 0x7FFFFFFFFFFFFFFFULL);
}
int32_t hulk_gorand_sizeof() { return (int32_t)sizeof(GoRand); }

// go_rng gammavariate (Cheng 1977, alpha > 1) — hashes/gamma.py provenance
static double gammavariate(GoRand* g, double alpha, double beta,
                           double log4, double sg) {
    double ainv = sqrt(2.0 * alpha - 1.0);
    double bbb = alpha - log4;
    double ccc = alpha + ainv;
    for (;;) {
        double u1 = gorand_f64(g);
        if (!(1e-7 < u1 && u1 < 0.9999999)) continue;
        double u2 = 1.0 - gorand_f64(g);
        double v = hulk_go_log(u1 / (1.0 - u1)) / ainv;
        double x = alpha * hulk_go_exp(v);
        double z = u1 * u1 * u2;
        double r = bbb + ccc * v - x;
        if (r + sg - 4.5 * z >= 0.0 || r >= hulk_go_log(z)) return x * beta;
    }
}

// Fill the CWS tables exactly as histosketch.go newCWS (row-major over
// [sketch_size, dims]; gamma stream interleaved r/c pairs, uniform stream
// one draw per cell).
void hulk_cws_fill(int64_t sketch_size, int64_t dims, const int64_t* cooked,
                   double* r, double* c, double* b, double* exp_r) {
    GoRand gg, ug;
    hulk_gorand_seed(&gg, 1, cooked);
    hulk_gorand_seed(&ug, 1, cooked);
    const double log4 = hulk_go_log(4.0);
    const double sg = 1.0 + hulk_go_log(4.5);
    int64_t n = sketch_size * dims;
    for (int64_t i = 0; i < n; i++) {
        double rv = gammavariate(&gg, 2.0, 1.0, log4, sg);
        double cv = hulk_go_log(gammavariate(&gg, 2.0, 1.0, log4, sg));
        double u = gorand_f64(&ug);  // Float64Range(0,1) == Float64 bitwise
        r[i] = rv;
        c[i] = cv;
        b[i] = u * rv;
        exp_r[i] = hulk_go_exp(rv);
    }
}

// ---------------------------------------------------------------------------
// Exact histosketch flush (histosketch.go AddElement over a dump)
// ---------------------------------------------------------------------------
// cms:      [depth * width] counters (modified)
// row_bins: [n * depth] per-element CMS positions
// tables:   [s * dims] row-major; bins index the dims axis
void hulk_flush_exact(int64_t n, const int64_t* bins, const double* freqs,
                      const int32_t* row_bins, double* cms, int64_t depth,
                      int64_t width, int64_t s, int64_t dims, const double* c_t,
                      const double* b_t, const double* er_t, uint64_t* sketch,
                      double* weights, int32_t drift, double decay_weight) {
    for (int64_t i = 0; i < n; i++) {
        if (drift) {
            int64_t total = depth * width;
            for (int64_t j = 0; j < total; j++) cms[j] *= decay_weight;
        }
        double esti = 1.7976931348623157e+308;
        const int32_t* rb = row_bins + i * depth;
        for (int64_t d = 0; d < depth; d++) {
            double* cell = cms + d * width + rb[d];
            *cell += freqs[i];
            if (*cell < esti) esti = *cell;
        }
        double lf = hulk_go_log(esti);
        int64_t bin = bins[i];
        for (int64_t j = 0; j < s; j++) {
            double yka = hulk_go_exp(lf - b_t[j * dims + bin]);
            double aka = c_t[j * dims + bin] / (yka * er_t[j * dims + bin]);
            double cur = drift ? weights[j] / decay_weight : weights[j];
            if (aka < cur) {
                sketch[j] = (uint64_t)bin;
                weights[j] = aka;
            }
        }
    }
}

// ---------------------------------------------------------------------------
// FASTQ/FASTA parser + packer (reference: pipeline DataStreamer+FastqHandler)
// ---------------------------------------------------------------------------
// Streaming chunk parser: caller feeds decompressed bytes; reads are packed
// into [cap_reads, cap_len] uint8 code batches (pad code 5). State carries
// partial lines/records across chunk boundaries on the Python side (the
// caller splits on the last newline), so this parser sees whole lines only.

static uint8_t NT4[256];
static bool nt4_init_done = false;
static void nt4_init() {
    if (nt4_init_done) return;
    memset(NT4, 4, 256);
    NT4['A'] = NT4['a'] = 0;
    NT4['C'] = NT4['c'] = 1;
    NT4['G'] = NT4['g'] = 2;
    NT4['T'] = NT4['t'] = 3;
    NT4['U'] = NT4['u'] = 3;
    nt4_init_done = true;
}

// Parse complete FASTQ lines from buf. line_phase: 0..3 position within the
// 4-line record (carried across calls). Returns number of reads packed;
// *consumed is bytes used (always the whole buffer — caller pre-splits), and
// *phase_out the new phase. Reads longer than cap_len are truncated (caller
// chooses cap_len as the max read length bucket).
int64_t hulk_pack_fastq(const uint8_t* buf, int64_t len, int32_t* phase_io,
                        uint8_t* codes, int32_t* lengths, int64_t cap_reads,
                        int64_t cap_len, int64_t* consumed_out) {
    nt4_init();
    int32_t phase = *phase_io;
    int64_t nreads = 0;
    int64_t pos = 0;
    while (pos < len && nreads < cap_reads) {
        const uint8_t* nl = (const uint8_t*)memchr(buf + pos, '\n', len - pos);
        if (!nl) break;  // caller guarantees whole lines; leftover has none
        int64_t llen = nl - (buf + pos);
        if (llen > 0 && buf[pos + llen - 1] == '\r') llen--;
        if (phase == 1) {  // sequence line
            int64_t L = llen < cap_len ? llen : cap_len;
            uint8_t* dst = codes + nreads * cap_len;
            for (int64_t i = 0; i < L; i++) dst[i] = NT4[buf[pos + i]];
            // tail beyond L is left untouched (pages stay unmapped for large
            // cap_len); the Python side pads to the batch's length bucket
            lengths[nreads] = (int32_t)L;
            nreads++;
        }
        phase = (phase + 1) & 3;
        pos = (nl - buf) + 1;
    }
    *phase_io = phase;
    *consumed_out = pos;
    return nreads;
}

}  // extern "C"
