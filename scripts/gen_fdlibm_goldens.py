"""Generate correctly-rounded golden values for the Go math.Exp/Log ports.

VERDICT r2 item 3: with no Go toolchain in the image, pin value-level hex
goldens on adversarial inputs from a high-precision correctly-rounded
evaluation (mpmath, 300-bit working precision), and record exactly where the
fdlibm-lineage port (hulk_tpu/hashes/fdlibm.py, operation-for-operation from
Go's exp.go/log.go) differs from correct rounding — fdlibm is faithfully
rounded (<= 1 ULP), not correctly rounded, so a small documented set of
1-ULP departures is expected and is itself part of the Go-equality contract.

Writes tests/fixtures/fdlibm_goldens.json:
  {"exp": [[x_hex, correct_hex, port_hex], ...], "log": [...]}

Subnormal-safe conversion: float(mpf) would double-round near the subnormal
boundary, so results below 2^-1022 are rounded manually at their true
precision via integer half-even rounding of v * 2^1074.
"""
from __future__ import annotations

import json
import os
import sys

import mpmath as mp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from hulk_tpu.hashes.fdlibm import go_exp, go_log  # noqa: E402

mp.mp.prec = 300


def f2h(v: float) -> str:
    return f"{np.float64(v).view(np.uint64):016x}"


def h2f(h: str) -> np.float64:
    return np.uint64(int(h, 16)).view(np.float64)


def round_to_f64(v: "mp.mpf") -> float:
    """Correctly-rounded (half-even) conversion of an mpf to float64,
    including the subnormal range and overflow to inf."""
    if mp.isnan(v):
        return float("nan")
    if v == 0:
        return 0.0
    sign = -1.0 if v < 0 else 1.0
    a = abs(v)
    if a >= mp.mpf(2) ** 1024:  # overflow after rounding handled below
        # values in [maxfinite + ulp/2, inf) round to inf
        pass
    if a < mp.mpf(2) ** -1021:  # (sub)normal boundary region: round manually
        scaled = a * mp.mpf(2) ** 1074
        n = int(mp.nint(scaled))  # mpmath nint = half-even on exact ties
        # mp.nint rounds half-even only approximately for mpf; do it exactly:
        fl = int(mp.floor(scaled))
        frac = scaled - fl
        if frac > 0.5:
            n = fl + 1
        elif frac < 0.5:
            n = fl
        else:
            n = fl + (fl & 1)
        return sign * float(np.ldexp(np.float64(n), -1074)) if n < (1 << 53) else sign * float(
            n * mp.mpf(2) ** -1074
        )
    # normal range: float() of an mpf at prec 300 rounds correctly to 53 bits
    return sign * float(a)


def gen_exp_inputs() -> np.ndarray:
    rng = np.random.default_rng(42)
    xs = []
    ulp = np.spacing
    # overflow / underflow thresholds (Go's constants) and neighbours
    for base in (709.782712893383973096, -745.133219101941108420,
                 -708.396418532264078749):  # exp goes subnormal below ~-708.4
        for d in (-2, -1, 0, 1, 2):
            xs.append(np.nextafter(np.float64(base), np.float64(d and d * 1e9 or 1), ) if False else
                      float(np.float64(base) + d * ulp(np.float64(base))))
    # k*ln2 reduction boundaries +- 1 ulp
    ln2 = 0.6931471805599453
    for k in range(-40, 41):
        b = np.float64(k) * ln2
        for d in (-1, 0, 1):
            xs.append(float(b + d * ulp(b)))
    # half-integer multiples of ln2 (where k rounding flips)
    for k in range(-20, 21):
        b = (np.float64(k) + 0.5) * ln2
        for d in (-1, 0, 1):
            xs.append(float(b + d * ulp(b)))
    # near-zero threshold 2^-28 and tiny values
    t = 1.0 / (1 << 28)
    for d in (-2, -1, 0, 1, 2):
        xs.append(float(np.float64(t) + d * ulp(np.float64(t))))
        xs.append(float(-(np.float64(t) + d * ulp(np.float64(t)))))
    xs += [0.0, -0.0, 5e-324, -5e-324, 1e-308, -1e-308]
    # deep subnormal results
    xs += list(rng.uniform(-744.9, -708.5, 200))
    # CWS-like magnitudes: ln(freq) - b for freq in [1, 1e6], b in [0, ~10]
    xs += list(rng.uniform(-15.0, 15.0, 400))
    xs += list(rng.uniform(-700.0, 700.0, 400))
    return np.array(xs, dtype=np.float64)


def gen_log_inputs() -> np.ndarray:
    rng = np.random.default_rng(43)
    xs = []
    ulp = np.spacing
    # around 1.0 (catastrophic-cancellation region)
    one = np.float64(1.0)
    for d in range(-8, 9):
        xs.append(float(one + d * ulp(one)))
    # frexp branch boundary f1 = sqrt(2)/2 (x near 2^k * sqrt(2)/2)
    s22 = np.float64(0.7071067811865476)
    for k in (-3, -1, 0, 1, 4, 10):
        b = np.ldexp(s22, k)
        for d in (-2, -1, 0, 1, 2):
            xs.append(float(b + d * ulp(b)))
    # powers of two +- 1 ulp
    for k in range(-30, 31, 3):
        b = np.ldexp(np.float64(1.0), k)
        for d in (-1, 0, 1):
            xs.append(float(b + d * ulp(b)))
    # subnormal inputs and extremes
    xs += [5e-324, 1e-320, 2.2250738585072014e-308, 1.7976931348623157e308]
    xs += [float(v) for v in rng.uniform(0.0, 1.0, 300)]
    xs += [float(np.exp(v)) for v in rng.uniform(-700, 700, 300)]
    # integer frequencies (the flush's ln(estiFreq) inputs)
    xs += [float(v) for v in range(1, 200)]
    return np.array(xs, dtype=np.float64)


def main() -> None:
    out = {"exp": [], "log": []}
    xs = gen_exp_inputs()
    port = go_exp(xs)
    for x, p in zip(xs, port):
        correct = round_to_f64(mp.exp(mp.mpf(float(x))))
        out["exp"].append([f2h(x), f2h(correct), f2h(p)])
    xs = gen_log_inputs()
    port = go_log(xs)
    for x, p in zip(xs, port):
        correct = round_to_f64(mp.log(mp.mpf(float(x)))) if x > 0 else (
            float("-inf") if x == 0 else float("nan")
        )
        out["log"].append([f2h(x), f2h(correct), f2h(p)])

    path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "fixtures", "fdlibm_goldens.json"
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    # report the departure set
    for name in ("exp", "log"):
        rows = out[name]
        diff = [r for r in rows if r[1] != r[2]]
        print(f"{name}: {len(rows)} inputs, {len(diff)} differ from correct rounding")
        for r in diff[:20]:
            x, c, p = (h2f(h) for h in r)
            print(f"  x={x!r}: correct={c!r} port={p!r}")


if __name__ == "__main__":
    main()
