"""Device compute for raw-read QC (ReadQC engine inner loops).

Behavioral reference: ngs-bits ``StatisticsReads::update``
(cppNGS/StatisticsReads.cpp:26-81): per-cycle base pileups, per-cycle quality
sums, base-quality histogram, per-read quality sums.

TPU-first design: a whole batch of reads is one [B, L] uint8 tensor; the
per-read C++ loop becomes masked vector reductions (VPU work, fused by XLA):
  counts5[c, L]   = sum_B onehot(base)        (per-cycle pileups)
  qsum_cycle[L]   = sum_B qual                (per-cycle quality sums)
  qhist[Q]        = histogram of all quals    (one-hot matmul)
  read_qsum[B]    = sum_L qual                (per-read quality sums)
All masked by position < length. Padding never contributes.
"""

from __future__ import annotations

import numpy as np

# base codes in pileup order A, C, G, T, N (ASCII)
BASE_CODES = np.frombuffer(b"ACGTN", dtype=np.uint8)
QHIST_SIZE = 100  # reference base_qualities_ array size (StatisticsReads.h:48)

_READQC_JIT = None
_READQC_RAW = None


def _build_readqc_raw():
    # jax is imported lazily so CPU-host tool invocations (which take the
    # native readqc_batch_host path) never pay the ~1.5s jax import
    import jax
    import jax.numpy as jnp

    def readqc_batch_impl(bases, quals, lengths):
        B, L = bases.shape
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
        mask = pos < lengths[:, None]
        q = jnp.where(mask, quals.astype(jnp.int32) - 33, 0)

        counts5 = jnp.stack([
            jnp.sum(((bases == code) & mask).astype(jnp.int32), axis=0)
            for code in BASE_CODES
        ])  # [5, L]

        qsum_cycle = jnp.sum(q, axis=0, dtype=jnp.int32)  # [L]
        read_qsum = jnp.sum(q, axis=1, dtype=jnp.int32)   # [B]

        # base-quality histogram via one-hot reduction: padding is masked by
        # routing it to a sentinel bin that is dropped.
        q_or_sentinel = jnp.where(mask, q, QHIST_SIZE)
        onehot = q_or_sentinel[:, :, None] == jnp.arange(QHIST_SIZE + 1)[None, None, :]
        qhist = jnp.sum(onehot, axis=(0, 1), dtype=jnp.int32)[:QHIST_SIZE]

        return counts5, qsum_cycle, qhist, read_qsum

    return readqc_batch_impl


def readqc_batch_raw():
    """The traceable (unjitted) batch function — for composition inside
    shard_map (parallel/mesh.py)."""
    global _READQC_RAW
    if _READQC_RAW is None:
        _READQC_RAW = _build_readqc_raw()
    return _READQC_RAW


def readqc_batch(bases, quals, lengths):
    """Compute ReadQC partial statistics for one batch (device path).

    Args:
      bases:   [B, L] uint8 ASCII base codes (zero-padded)
      quals:   [B, L] uint8 ASCII quality codes (zero-padded)
      lengths: [B] int32 read lengths

    Returns:
      counts5:    [5, L] int32 per-cycle base counts (A,C,G,T,N)
      qsum_cycle: [L] int32 per-cycle quality sums (offset-33 units)
      qhist:      [QHIST_SIZE] int32 base-quality histogram
      read_qsum:  [B] int32 per-read quality sums
    """
    global _READQC_JIT
    if _READQC_JIT is None:
        import jax
        _READQC_JIT = jax.jit(readqc_batch_raw())
    return _READQC_JIT(bases, quals, lengths)


def readqc_batch_host(bases: np.ndarray, quals: np.ndarray,
                      lengths: np.ndarray):
    """Same contract as readqc_batch, computed on the host.

    Used when no TPU is attached: CPU XLA materializes the [B, L, Q] one-hot
    (measured ~2k reads/s at B=64k). Preferred order: the native C++ single
    pass (ngs_readqc_batch, ~10x the numpy fallback), then numpy bincount.
    """
    B, L = bases.shape
    from ..io.native import get_lib
    lib = get_lib()
    if (lib is not None and B and bases.flags.c_contiguous
            and quals.flags.c_contiguous and bases.shape == quals.shape):
        counts5 = np.zeros((5, L), dtype=np.int32)
        qsum_cycle = np.zeros(L, dtype=np.int64)
        qhist = np.zeros(QHIST_SIZE, dtype=np.int64)
        read_qsum = np.zeros(B, dtype=np.int32)
        lib.ngs_readqc_batch(bases, quals,
                             np.ascontiguousarray(lengths, dtype=np.int32),
                             B, L, counts5, qsum_cycle, qhist, read_qsum)
        return counts5, qsum_cycle, qhist, read_qsum
    mask = np.arange(L, dtype=np.int32)[None, :] < lengths[:, None]
    q = np.where(mask, quals.astype(np.int32) - 33, 0)
    counts5 = np.stack([
        np.sum((bases == code) & mask, axis=0, dtype=np.int32)
        for code in BASE_CODES
    ])
    qsum_cycle = q.sum(axis=0, dtype=np.int32)
    read_qsum = q.sum(axis=1, dtype=np.int32)
    qflat = q[mask].ravel()
    qflat = qflat[qflat >= 0]  # device one-hot drops out-of-range too
    qhist = np.bincount(qflat, minlength=QHIST_SIZE)
    qhist = qhist[:QHIST_SIZE].astype(np.int32)
    return counts5, qsum_cycle, qhist, read_qsum
