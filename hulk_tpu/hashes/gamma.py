"""Replica of go_rng's GammaGenerator (leesper/go_rng), as used by the
reference to build CWS tables (src/histosketch/histosketch.go:103,112-113).

go_rng ports Python's random.gammavariate; for alpha > 1 that is Cheng (1977)
rejection sampling. Draw order is data-dependent (each attempt consumes one
uniform for u1 — possibly rejected by the range guard — then one for u2), so
the stream must be consumed sequentially; the bulk path precomputes all
per-position candidate quantities vectorised, then walks the chain with cheap
index arithmetic only.

All transcendentals go through the Go math.Exp/Log ports (fdlibm.py) so
accepted values match Go bit-for-bit.
"""
from __future__ import annotations

import numpy as np

from hulk_tpu.hashes.fdlibm import go_exp, go_log, log4, sg_magicconst
from hulk_tpu.hashes.gorand import GoRand

_CHUNK = 1 << 21  # uniforms fetched/derived per chunk (~2M)


class GammaGenerator:
    """rng.NewGammaGenerator(seed) replica (alpha > 1 path implemented)."""

    def __init__(self, seed: int):
        self._rng = GoRand(seed)
        self._log4 = log4()
        self._sg = sg_magicconst()

    # ---- scalar, call-for-call mirror ------------------------------------

    def gamma(self, alpha: float, beta: float) -> float:
        if not (alpha > 0.0) or not (beta > 0.0):
            raise ValueError("invalid gamma parameters")
        if alpha <= 1.0:
            raise NotImplementedError(
                "reference only draws Gamma(2,1); alpha<=1 paths unused"
            )
        ainv = np.sqrt(2.0 * alpha - 1.0)
        bbb = alpha - self._log4
        ccc = alpha + ainv
        while True:
            u1 = self._rng.float64()
            if not (1e-7 < u1 < 0.9999999):
                continue
            u2 = 1.0 - self._rng.float64()
            v = float(go_log(u1 / (1.0 - u1))) / ainv
            x = alpha * float(go_exp(v))
            z = u1 * u1 * u2
            r = bbb + ccc * v - x
            if r + self._sg - 4.5 * z >= 0.0 or r >= float(go_log(z)):
                return x * beta

    # ---- bulk path -------------------------------------------------------

    def gamma_block(self, n: int, alpha: float = 2.0, beta: float = 1.0) -> np.ndarray:
        """n sequential Gamma(alpha, beta) draws, identical to n gamma() calls."""
        if not alpha > 1.0:
            raise NotImplementedError
        ainv = np.sqrt(2.0 * alpha - 1.0)
        bbb = alpha - self._log4
        ccc = alpha + ainv

        out = np.empty(n, dtype=np.float64)
        got = 0

        u = self._rng.float64_block(_CHUNK)
        valid, accept, xval = self._derive(u, alpha, ainv, bbb, ccc, self._sg)
        pos = 0
        while got < n:
            # ensure lookahead of one position (u2) and derived coverage
            if pos + 1 >= u.shape[0]:
                fresh = self._rng.float64_block(_CHUNK)
                u = np.concatenate([u[pos:], fresh])  # keep unconsumed tail (0-1 elems)
                valid, accept, xval = self._derive(u, alpha, ainv, bbb, ccc, self._sg)
                pos = 0
            if not valid[pos]:
                pos += 1
                continue
            if accept[pos]:
                out[got] = xval[pos]
                got += 1
                pos += 2
            else:
                pos += 2
        if beta != 1.0:
            out = out * beta
        return out

    @staticmethod
    def _derive(u: np.ndarray, alpha, ainv, bbb, ccc, sg):
        """Per-position candidate quantities for a Cheng attempt at index i
        (u1 = u[i], u2 = 1 - u[i+1]). The last position has no lookahead and
        is never consumed as a u1 (the chain refills first)."""
        m = u.shape[0]
        valid = (1e-7 < u) & (u < 0.9999999)
        with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
            v = go_log(u / (1.0 - u)) / ainv
            x = alpha * go_exp(v)
            u2 = np.empty_like(u)
            u2[: m - 1] = 1.0 - u[1:]
            u2[m - 1] = 0.0
            z = u * u * u2
            r = bbb + ccc * v - x
            accept = (r + sg - 4.5 * z >= 0.0) | (r >= go_log(z))
        return valid, accept, x
