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
#include <dlfcn.h>
#include <sys/mman.h>

#ifdef _OPENMP
#include <omp.h>
#else
static inline int omp_get_num_threads() { return 1; }
static inline int omp_get_thread_num() { return 0; }
#endif

#if defined(__SSE2__)
#include <xmmintrin.h>
#endif

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

// Honour the CLI's -p/--processors for host-side parallel passes (the
// reference's NumMinions = p semantics, cmd/sketch.go:140).
void hulk_set_threads(int32_t n) {
#ifdef _OPENMP
    if (n > 0) omp_set_num_threads(n);
#else
    (void)n;
#endif
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
//
// Bit-identical restructure of the reference's element-at-a-time loop into
// two parallel passes:
//
//   Pass 1 (parallel over disjoint CMS cell ranges): each thread advances
//   only its own cells' timelines — per element, the drift scale of its
//   range, then the increments that land in its range — so every f64 op on a
//   cell happens in exactly the order the sequential loop produces. The
//   post-increment row values are recorded; esti is their min (order-free)
//   and lf = log(esti) vectorises over elements.
//
//   Pass 2 (parallel over sketch slots): slot j's state (weights[j],
//   sketch[j]) only ever depends on its own history and the lf stream, so
//   per-slot scans in element order are exact. decay_weight is a constant
//   for the whole flush (countmin.go computes it once).
//
// Subnormal squash (drift mode): counters decay by *dw (dw <= exp(-ratio)
// < 1) every element, so each cell spends ~40 multiplies in the subnormal
// range before reaching zero — each a ~100-cycle microcode trap that
// dominated the drift flush. Pass 1 runs with FTZ (subnormal multiply
// results flushed to +0), which is OUTPUT-equivalent to Go's semantics:
// a subnormal counter s (< 2^-1022) is only ever consumed by (a) further
// *dw multiplies, which reach +0 within ~52 steps anyway, or (b) a +freq
// increment with freq >= 1 (histogram counts), where RN(freq + s) == freq
// exactly because s < ulp(freq)/2; the post-increment values (the only
// reads: esti minima and the persistent state as seen by later increments)
// are therefore bit-identical either way. The Python CMS paths apply the
// same squash explicitly so cross-path state stays bit-equal
// (tests/test_sketch_layer.py::test_drift_subnormal_squash_is_output_exact).
void hulk_flush_exact(int64_t n, const int64_t* bins, const double* freqs,
                      const int32_t* row_bins, double* cms, int64_t depth,
                      int64_t width, int64_t s, int64_t dims, const double* c_t,
                      const double* b_t, const double* er_t, uint64_t* sketch,
                      double* weights, int32_t drift, double decay_weight) {
    double* vals = new double[n * depth];
    double* lf = new double[n];

    #pragma omp parallel
    {
        const int nt = omp_get_num_threads();
        const int t = omp_get_thread_num();
        const int64_t total = depth * width;
        const int64_t lo = total * t / nt;
        const int64_t hi = total * (t + 1) / nt;
        double* __restrict__ own = cms;
#if defined(__SSE2__)
        const unsigned int csr_save = _mm_getcsr();
        if (drift) _mm_setcsr(csr_save | 0x8040);  // FTZ | DAZ, this pass only
#endif
        for (int64_t i = 0; i < n; i++) {
            if (drift) {
                for (int64_t cidx = lo; cidx < hi; cidx++) {
#if defined(__SSE2__)
                    own[cidx] *= decay_weight;
#else
                    const double v = own[cidx] * decay_weight;
                    own[cidx] = (v >= 2.2250738585072014e-308) ? v : 0.0;
#endif
                }
            }
            const int32_t* rb = row_bins + i * depth;
            const double f = freqs[i];
            for (int64_t d = 0; d < depth; d++) {
                const int64_t cell = d * width + rb[d];
                if (cell >= lo && cell < hi) {
                    own[cell] += f;
                    vals[i * depth + d] = own[cell];
                }
            }
        }
#if defined(__SSE2__)
        if (drift) _mm_setcsr(csr_save);
#endif
    }

    #pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; i++) {
        double esti = 1.7976931348623157e+308;
        for (int64_t d = 0; d < depth; d++) {
            const double v = vals[i * depth + d];
            if (v < esti) esti = v;
        }
        lf[i] = hulk_go_log(esti);
    }

    #pragma omp parallel for schedule(static)
    for (int64_t j = 0; j < s; j++) {
        double wj = weights[j];
        uint64_t sk = sketch[j];
        const double* __restrict__ bj = b_t + j * dims;
        const double* __restrict__ cj = c_t + j * dims;
        const double* __restrict__ ej = er_t + j * dims;
        for (int64_t i = 0; i < n; i++) {
            const int64_t bin = bins[i];
            const double yka = hulk_go_exp(lf[i] - bj[bin]);
            const double aka = cj[bin] / (yka * ej[bin]);
            const double cur = drift ? wj / decay_weight : wj;
            if (aka < cur) {
                sk = (uint64_t)bin;
                wj = aka;
            }
        }
        weights[j] = wj;
        sketch[j] = sk;
    }

    delete[] vals;
    delete[] lf;
}

// ---------------------------------------------------------------------------
// gzip decompression via libdeflate (dlopen'd; ~2-3x zlib throughput)
// ---------------------------------------------------------------------------
// The input pipeline's host floor is gunzip (zlib ~320 MB/s measured vs the
// parser's ~1.5 GB/s); libdeflate lifts it to ~1 GB/s. Whole-buffer API:
// the caller passes the full compressed file and an output buffer; members
// are looped (multi-member .gz is legal FASTQ practice). Returns the
// decompressed size, -1 on corrupt data (caller falls back to zlib
// streaming), or -2 when the output buffer is too small (caller doubles it).

struct libdeflate_decompressor;
static struct libdeflate_decompressor* (*ld_alloc)(void) = nullptr;
static int (*ld_gzip_ex)(struct libdeflate_decompressor*, const void*,
                         size_t, void*, size_t, size_t*, size_t*) = nullptr;
static int ld_tried = 0;
static struct libdeflate_decompressor* ld_decomp = nullptr;

static bool ld_init() {
    if (!ld_tried) {
        ld_tried = 1;
        void* h = dlopen("libdeflate.so.0", RTLD_NOW | RTLD_LOCAL);
        if (!h) h = dlopen("libdeflate.so", RTLD_NOW | RTLD_LOCAL);
        if (h) {
            ld_alloc = (struct libdeflate_decompressor * (*)(void))
                dlsym(h, "libdeflate_alloc_decompressor");
            ld_gzip_ex = (int (*)(struct libdeflate_decompressor*, const void*,
                                  size_t, void*, size_t, size_t*, size_t*))
                dlsym(h, "libdeflate_gzip_decompress_ex");
            if (ld_alloc && ld_gzip_ex) ld_decomp = ld_alloc();
        }
    }
    return ld_decomp != nullptr;
}

int32_t hulk_gunzip_available() { return ld_init() ? 1 : 0; }

int64_t hulk_gunzip(const uint8_t* in, int64_t in_n, uint8_t* out,
                    int64_t cap) {
    if (!ld_init()) return -1;
    int64_t in_pos = 0, out_pos = 0;
    while (in_pos < in_n) {
        size_t a_in = 0, a_out = 0;
        int r = ld_gzip_ex(ld_decomp, in + in_pos, (size_t)(in_n - in_pos),
                           out + out_pos, (size_t)(cap - out_pos), &a_in, &a_out);
        if (r == 3 /* INSUFFICIENT_SPACE */) return -2;
        if (r != 0 /* SUCCESS */) return -1;
        if (a_in == 0) return -1;  // no forward progress
        in_pos += (int64_t)a_in;
        out_pos += (int64_t)a_out;
        // tolerate trailing NUL padding after the last member (some writers)
        while (in_pos < in_n && in[in_pos] == 0) in_pos++;
    }
    return out_pos;
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

// FASTA parser+packer (reference FastqHandler FASTA mode,
// src/pipeline/sketch.go:102-135): '>' starts a record and emits the
// previous one; sequence lines append to the carry buffer (records span
// chunk boundaries); an EMPTY line terminates the file's parsing, emitting
// the in-progress record (the reference loop breaks at sketch.go:104-105 and
// the trailing record is still flushed). Lines before the first header
// accumulate then are discarded at the first '>', as in the reference.
//
// state_io: [have_header, terminated, carry_len, emitted_any]. The caller
// feeds whole lines, emits the final carry at file end (have_header set),
// errors if emitted_any stays 0, and resets state between files. Sequence
// bytes beyond cap_len are dropped with carry_len clamped to cap_len — the
// caller detects carry_len/lengths >= cap_len and retries with a wider
// stride from a saved (state, carry) snapshot.
int64_t hulk_pack_fasta(const uint8_t* buf, int64_t len, int32_t* state_io,
                        uint8_t* carry, uint8_t* codes, int32_t* lengths,
                        int64_t cap_reads, int64_t cap_len,
                        int64_t* consumed_out) {
    nt4_init();
    int32_t have_header = state_io[0];
    int32_t terminated = state_io[1];
    int64_t carry_len = state_io[2];
    int32_t emitted_any = state_io[3];
    int64_t nreads = 0;
    int64_t pos = 0;
    while (pos < len && nreads < cap_reads) {
        if (terminated) {
            pos = len;  // discard the rest of the file
            break;
        }
        const uint8_t* nl = (const uint8_t*)memchr(buf + pos, '\n', len - pos);
        if (!nl) break;  // caller guarantees whole lines
        int64_t llen = nl - (buf + pos);
        if (llen > 0 && buf[pos + llen - 1] == '\r') llen--;
        if (llen == 0) {
            terminated = 1;
            if (have_header) {  // emit the in-progress record now
                memcpy(codes + nreads * cap_len, carry, carry_len);
                lengths[nreads++] = (int32_t)carry_len;
                emitted_any = 1;
                have_header = 0;
                carry_len = 0;
            }
        } else if (buf[pos] == '>') {
            if (have_header) {
                memcpy(codes + nreads * cap_len, carry, carry_len);
                lengths[nreads++] = (int32_t)carry_len;
                emitted_any = 1;
            }
            have_header = 1;
            carry_len = 0;
        } else {
            // pre-header lines accumulate too (discarded at the first '>')
            int64_t room = cap_len - carry_len;
            int64_t L = llen < room ? llen : room;
            for (int64_t i = 0; i < L; i++)
                carry[carry_len + i] = NT4[buf[pos + i]];
            carry_len += L;  // == cap_len on overflow -> caller widens
        }
        pos = (nl - buf) + 1;
    }
    state_io[0] = have_header;
    state_io[1] = terminated;
    state_io[2] = (int32_t)carry_len;
    state_io[3] = emitted_any;
    *consumed_out = pos;
    return nreads;
}

// ---------------------------------------------------------------------------
// Parallel FASTQ parse (OMP two-pass; VERDICT r3 item 2)
// ---------------------------------------------------------------------------
// The serial parser above tops out ~1.4 GB/s on one core; at p=2 these split
// the chunk across threads. Pass 1 counts newlines per byte-slice (memchr
// speed); a serial prefix sum gives each slice its starting global line
// index; pass 2 re-walks each slice's TERMINATORS (a line belongs to the
// slice holding its '\n'), deriving each sequence line's read row from its
// global line index — so rows land exactly where the serial parser would
// put them, in parallel, with no cross-thread ordering.

int64_t hulk_count_lines(const uint8_t* buf, int64_t len) {
    int64_t total = 0;
    #pragma omp parallel reduction(+:total)
    {
        const int nt = omp_get_num_threads();
        const int t = omp_get_thread_num();
        const int64_t b0 = len * t / nt, b1 = len * (t + 1) / nt;
        const uint8_t* p = buf + b0;
        const uint8_t* end = buf + b1;
        while (p < end) {
            const uint8_t* nl = (const uint8_t*)memchr(p, '\n', end - p);
            if (!nl) break;
            total++;
            p = nl + 1;
        }
    }
    return total;
}

// Parse ALL whole lines of buf (caller pre-splits at the last newline) into
// codes[cap_reads, stride]/lengths. phase: position within the 4-line record
// at buf[0] (0..3). Returns the number of reads packed; *consumed_out = byte
// after the last newline; *phase_out = phase after the final line. Reads
// longer than stride-1 are truncated to stride (caller detects
// lengths >= stride and retries wider, same protocol as hulk_pack_fastq).
// cap_reads must be >= the number of sequence lines (from hulk_count_lines).
int64_t hulk_pack_fastq_par(const uint8_t* buf, int64_t len, int32_t phase,
                            uint8_t* codes, int32_t* lengths,
                            int64_t cap_reads, int64_t stride,
                            int64_t* consumed_out, int32_t* phase_out) {
    nt4_init();
    const int64_t o = (int64_t)((1 - phase) & 3);  // global idx of 1st seq line
    int64_t nthreads = 1;
    #ifdef _OPENMP
    nthreads = omp_get_max_threads();
    #endif
    // Fixed slice count independent of the actual OMP team size, so pass 1
    // and pass 2 always agree on slice boundaries.
    if (nthreads > 64) nthreads = 64;
    const int64_t S = nthreads;
    int64_t counts[64] = {0};
    // pass 1: newline count per byte-slice
    #pragma omp parallel for schedule(static, 1)
    for (int64_t s = 0; s < S; s++) {
        const int64_t b0 = len * s / S, b1 = len * (s + 1) / S;
        int64_t c = 0;
        const uint8_t* p = buf + b0;
        const uint8_t* end = buf + b1;
        while (p < end) {
            const uint8_t* nl = (const uint8_t*)memchr(p, '\n', end - p);
            if (!nl) break;
            c++;
            p = nl + 1;
        }
        counts[s] = c;
    }
    int64_t base[65];
    base[0] = 0;
    for (int64_t s = 0; s < S; s++) base[s + 1] = base[s] + counts[s];
    const int64_t total_lines = base[S];
    int64_t nreads = (total_lines > o) ? (total_lines - o + 3) / 4 : 0;
    if (nreads > cap_reads) return -1;  // caller sized via hulk_count_lines
    // pass 2: pack sequence lines, each slice handling lines whose '\n' it owns
    int64_t last_nl = -1;
    #pragma omp parallel for schedule(static, 1) reduction(max:last_nl)
    for (int64_t s = 0; s < S; s++) {
        const int64_t b0 = len * s / S, b1 = len * (s + 1) / S;
        int64_t g = base[s];  // global line index of the first '\n' in slice
        // line start: after the last newline before b0 (scan back; FASTQ
        // lines are short so this is a handful of bytes)
        int64_t start = b0;
        while (start > 0 && buf[start - 1] != '\n') start--;
        const uint8_t* p = buf + b0;
        const uint8_t* end = buf + b1;
        while (p < end) {
            const uint8_t* nl = (const uint8_t*)memchr(p, '\n', end - p);
            if (!nl) break;
            if (g >= o && ((g - o) & 3) == 0) {  // sequence line
                int64_t llen = (nl - buf) - start;
                if (llen > 0 && buf[start + llen - 1] == '\r') llen--;
                const int64_t row = (g - o) >> 2;
                const int64_t L = llen < stride ? llen : stride;
                uint8_t* dst = codes + row * stride;
                for (int64_t i = 0; i < L; i++) dst[i] = NT4[buf[start + i]];
                lengths[row] = (int32_t)L;
            }
            g++;
            start = (nl - buf) + 1;
            if ((nl - buf) > last_nl) last_nl = nl - buf;
            p = nl + 1;
        }
    }
    *consumed_out = total_lines ? last_nl + 1 : 0;
    *phase_out = (int32_t)((phase + total_lines) & 3);
    return nreads;
}

// ---------------------------------------------------------------------------
// Transfer-group packing (device_step.build_group_buffer, fused)
// ---------------------------------------------------------------------------
// The device stream ships G sub-batches as ONE flat uint8 buffer: nibble-
// packed codes [G, R, ceil(L/2)] followed by little-endian u16 lengths
// [G, R]. The NumPy construction (pad-to-bucket copy + putmask + strided
// nibble OR + concatenate) costs ~4 full passes over the batch bytes; this
// fuses pad + nibble-pack + length write into one OMP pass reading each code
// byte once, straight from the parser's strided [rows, stride] output (no
// padded intermediate is ever materialised). Rows >= rows_live become dead
// pad rows (all 0x55 nibbles, length 0) — inert in every kernel, same as the
// Python path's tail padding.
//
// Packs ONE sub-batch per call into its slice of the flat buffer; the caller
// loops over the group (32 ctypes calls per ~22 MB buffer — negligible).
void hulk_pack_group_batch(const uint8_t* codes, int64_t rows_live,
                           int64_t stride, const int32_t* lengths, int64_t R,
                           int64_t L, uint8_t* out_codes, uint8_t* out_lens) {
    const int64_t L2 = (L + 1) / 2;
    #pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < R; r++) {
        uint8_t* dst = out_codes + r * L2;
        if (r >= rows_live) {
            memset(dst, 0x55, L2);
            out_lens[r * 2] = 0;
            out_lens[r * 2 + 1] = 0;
            continue;
        }
        const uint8_t* src = codes + r * stride;
        const int64_t len = lengths[r] < L ? lengths[r] : L;
        // whole nibble pairs inside the read
        int64_t j = 0;
        for (; 2 * j + 1 < len; j++)
            dst[j] = (uint8_t)(src[2 * j] | (src[2 * j + 1] << 4));
        if (2 * j < len) {  // odd tail: low nibble real, high nibble pad
            dst[j] = (uint8_t)(src[2 * j] | 0x50);
            j++;
        }
        if (j < L2) memset(dst + j, 0x55, L2 - j);
        const uint16_t l16 = (uint16_t)len;
        out_lens[r * 2] = (uint8_t)(l16 & 0xFF);
        out_lens[r * 2 + 1] = (uint8_t)(l16 >> 8);
    }
}

// v2 layout: 2-bit codes + N bitmask (wire entropy cut). The tunnel wire
// charges ~per compressed byte, but its compressor/checksum work scales with
// RAW bytes on the host CPU — measured 40% faster per group than the nibble
// layout. Sections per group: [G, R, L/4] 2-bit codes (position p in bits
// 2*(p%4) of byte p/4), [G, R, L/8] N bitmask (position p in bit 7-(p%8) of
// byte p/8 — np.packbits big-endian order), [G, R] LE u16 lengths. Codes
// >= 4 (N) pack as 0 with the mask bit set; the device rebuilds the exact
// padded codes as where(pos >= len, 5, where(maskbit, 4, code2)). Requires
// L % 8 == 0 (every production length bucket is).
void hulk_pack_group_batch2(const uint8_t* codes, int64_t rows_live,
                            int64_t stride, const int32_t* lengths, int64_t R,
                            int64_t L, uint8_t* out_codes, uint8_t* out_mask,
                            uint8_t* out_lens) {
    const int64_t L4 = L / 4, L8 = L / 8;
    #pragma omp parallel for schedule(static)
    for (int64_t r = 0; r < R; r++) {
        uint8_t* dst = out_codes + r * L4;
        uint8_t* msk = out_mask + r * L8;
        if (r >= rows_live) {
            memset(dst, 0, L4);
            memset(msk, 0, L8);
            out_lens[r * 2] = 0;
            out_lens[r * 2 + 1] = 0;
            continue;
        }
        const uint8_t* src = codes + r * stride;
        const int64_t len = lengths[r] < L ? lengths[r] : L;
        memset(dst, 0, L4);
        memset(msk, 0, L8);
        for (int64_t p = 0; p < len; p++) {
            const uint8_t c = src[p];
            if (c >= 4) {
                msk[p >> 3] |= (uint8_t)(1u << (7 - (p & 7)));
            } else {
                dst[p >> 2] |= (uint8_t)(c << (2 * (p & 3)));
            }
        }
        const uint16_t l16 = (uint16_t)len;
        out_lens[r * 2] = (uint8_t)(l16 & 0xFF);
        out_lens[r * 2 + 1] = (uint8_t)(l16 >> 8);
    }
}

// Parallel first-touch of a fresh allocation: faulting 100s of MB of 4 KB
// pages measures ~17 us/page here (~2 s for 500 MB) when it happens serially
// inside the decompressor. THP is in madvise mode on this kernel, so ask for
// 2 MB pages first (~500x fewer faults), then fault everything in from both
// cores off the critical path.
void hulk_touch_pages(uint8_t* buf, int64_t n) {
    const uintptr_t a = (uintptr_t)buf & ~(uintptr_t)4095;
    madvise((void*)a, (size_t)(n + ((uintptr_t)buf - a)), MADV_HUGEPAGE);
    #pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; i += 4096) buf[i] = 0;
}

}  // extern "C"
