"""Single-device reduction engines for the coverage/mapping/pileup/
similarity paths.

Behavioral reference: the per-alignment accumulation loops of
Statistics::avgCoverage / lowOrHighCoverage (cppNGS/Statistics.cpp:
2534-2804, WorkerLowOrHighCoverage.cpp:173-204 per-base increments) and
SampleSimilarity::calculateSimilarity (SampleSimilarity.cpp:201-255).

TPU formulation: XLA lowers *unsorted* scatter-add on TPU to a serialized
update loop (measured ~1 s per 65k-index scatter into a 200M-element
buffer on v5e — unusable), so these engines never scatter. Spans/loci are
buffered host-side; one finalize dispatch sorts them on device (bitonic
sort is fast on the VPU) and reduces with
``segment_sum(..., indices_are_sorted=True)`` + prefix sum — integer ops
only, bit-identical to the numpy host path. Pearson moments come from
integer-doubled genotypes (0/0.5/1 → 0/1/2), so the device reduction is
exact; the final correlation forms in float64 on host.

Dispatch policy: device engages only when `is_tpu_backend()` AND the
problem amortizes the transfer (thresholds measured on the axon tunnel,
BASELINE.md round 4); NGSBITS_DEVICE_ENGINES=1/0 forces it on/off.
"""

from __future__ import annotations

import os

import numpy as np

from ..utils.backend import is_tpu_backend, is_tunneled_backend

# int32 device moments stay exact while 4n < 2^31 (values are 0/1/2)
INT32_MOMENT_LIMIT = 2**31

# measured on the v5e tunnel (BASELINE.md round 4)
COVERAGE_DEVICE_MIN_SPAN = 1 << 22      # 4M-base chromosome window
CORR_DEVICE_MIN_N = 1 << 16
PILEUP_DEVICE_MIN_SNPS = 1 << 14


def _force() -> bool | None:
    v = os.environ.get("NGSBITS_DEVICE_ENGINES", "").strip().lower()
    if v == "":
        return None
    return v not in ("0", "false", "no", "off")


def use_device(n_items: int, min_items: int) -> bool:
    f = _force()
    if f is not None:
        return f and is_tpu_backend()
    # auto: engage on a directly-attached TPU; through the axon tunnel the
    # result fetch dominates (measured: BedCoverage 1M-read e2e 0.6s host
    # vs 5.8s device — the 67 MB coverage fetch — while the pure kernel is
    # 40x faster than the host scatter; BASELINE.md round 4)
    return (n_items >= min_items and is_tpu_backend()
            and not is_tunneled_backend())




def _pad_pow2(arr: np.ndarray, fill: int) -> np.ndarray:
    """Pad to the next power-of-two length so jit compiles O(log N) shapes."""
    n = len(arr)
    cap = 1 << max(n - 1, 0).bit_length()
    if cap == n:
        return arr
    out = np.full(cap, fill, dtype=arr.dtype)
    out[:n] = arr
    return out


_COV_EVAL = None
_SENTINEL = np.int32(2**31 - 1)


def _cov_eval_fn():
    global _COV_EVAL
    if _COV_EVAL is None:
        import jax
        import jax.numpy as jnp

        def f(s, e, p):
            # coverage(p) = #(start <= p) - #(end_excl <= p); the sort-based
            # searchsorted turns the whole evaluation into three bitonic
            # sorts — no scatter (XLA serializes TPU scatter; measured
            # ~1 s per 65k-index scatter vs 0.07 s for this formulation)
            s = jnp.sort(s)
            e = jnp.sort(e)
            a = jnp.searchsorted(s, p, side="right", method="sort")
            b = jnp.searchsorted(e, p, side="right", method="sort")
            return (a - b).astype(jnp.int32)

        _COV_EVAL = jax.jit(f)
    return _COV_EVAL


class DeviceCoverage:
    """Coverage engine for one chromosome span (positions 0..span-1).

    Spans are buffered host-side (two int32 vectors per batch — no host
    scatter work at all); one finalize dispatch sorts the events on device
    and evaluates coverage with two searchsorteds. Events pad to power-of-
    two lengths with INT32_MAX sentinels (count into neither side)."""

    def __init__(self, span: int):
        self.span = span
        self._s: list[np.ndarray] = []
        self._e: list[np.ndarray] = []

    def add(self, starts: np.ndarray, ends_excl: np.ndarray):
        if len(starts):
            self._s.append(np.asarray(starts, dtype=np.int32))
            self._e.append(np.asarray(ends_excl, dtype=np.int32))

    def coverage_at(self, pos: np.ndarray) -> np.ndarray:
        """Coverage at the given (same-coordinate-space) positions."""
        m = len(pos)
        if not self._s or m == 0:
            return np.zeros(m, dtype=np.int64)
        s = _pad_pow2(np.concatenate(self._s), _SENTINEL)
        e = _pad_pow2(np.concatenate(self._e), _SENTINEL)
        p = np.asarray(pos, dtype=np.int32)
        p = _pad_pow2(p, int(p[-1]) if m else 0)
        out = np.asarray(_cov_eval_fn()(s, e, p))[:m].astype(np.int64)
        return out

    def finalize(self) -> np.ndarray:
        """Dense coverage over the full span."""
        out = self.coverage_at(np.arange(self.span, dtype=np.int32))
        self._s = self._e = None
        return out


class DeviceBincount:
    """Counter array engine (pileup base counts): indices are buffered and
    counted in one finalize dispatch — sort + searchsorted over the bin
    edges, never scatter."""

    def __init__(self, size: int):
        self.size = size
        self._idx: list[np.ndarray] = []

    def add(self, idx: np.ndarray):
        if len(idx):
            self._idx.append(np.asarray(idx, dtype=np.int32))

    def finalize(self) -> np.ndarray:
        if not self._idx:
            return np.zeros(self.size, dtype=np.int64)
        idx = _pad_pow2(np.concatenate(self._idx), _SENTINEL)
        # count of bin k = #(idx <= k) - #(idx <= k-1): reuse the coverage
        # evaluator with an empty 'ends' side
        edges = np.arange(self.size, dtype=np.int32)
        none = np.full(1, _SENTINEL, dtype=np.int32)
        cum = np.asarray(_cov_eval_fn()(idx, none, edges)).astype(np.int64)
        out = np.empty(self.size, dtype=np.int64)
        out[0] = cum[0]
        out[1:] = np.diff(cum)
        self._idx = None
        return out


_CORR_JIT = None


def _corr_fn():
    global _CORR_JIT
    if _CORR_JIT is None:
        import jax
        import jax.numpy as jnp

        @jax.jit
        def moments(x2, y2):
            # x2/y2: integer-doubled genotypes (0/1/2) — exact int32 sums
            # (all terms non-negative, caller guards 4n < 2^31)
            return (jnp.sum(x2), jnp.sum(y2), jnp.sum(x2 * x2),
                    jnp.sum(y2 * y2), jnp.sum(x2 * y2))

        _CORR_JIT = moments
    return _CORR_JIT


def pearson_from_genotypes(x: np.ndarray, y: np.ndarray) -> float:
    """Pearson correlation of genotype vectors (values in {0, 0.5, 1}).

    The device reduces exact integer moments of the doubled genotypes; the
    host forms r in float64. Mathematically identical to
    BasicStatistics::correlation; rounding differs only below 1e-12.
    """
    n = len(x)
    x2 = np.rint(np.asarray(x, dtype=np.float64) * 2).astype(np.int32)
    y2 = np.rint(np.asarray(y, dtype=np.float64) * 2).astype(np.int32)
    if 4 * n >= INT32_MOMENT_LIMIT:
        # int32 device accumulators would overflow: exact int64 on host
        sx, sy = int(x2.sum()), int(y2.sum())
        sxx = int((x2.astype(np.int64) ** 2).sum())
        syy = int((y2.astype(np.int64) ** 2).sum())
        sxy = int((x2.astype(np.int64) * y2).sum())
    else:
        # zero pads leave every sum unchanged; n comes from the true length
        sx, sy, sxx, syy, sxy = (int(v) for v in _corr_fn()(
            _pad_pow2(x2, 0), _pad_pow2(y2, 0)))
    num = n * sxy - sx * sy
    den = np.sqrt(float(n * sxx - sx * sx)) * np.sqrt(float(n * syy - sy * sy))
    if den == 0.0:
        return float("nan")
    return float(num / den)
