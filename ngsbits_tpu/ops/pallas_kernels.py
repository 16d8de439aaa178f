"""Pallas TPU kernels for the hot QC ops.

Behavioral reference: the inner loops of ngs-bits
``StatisticsReads::update`` (cppNGS/StatisticsReads.cpp:26-81) and SeqPurge's
insert-match offset scan (SeqPurge/AnalysisWorker.cpp:141-266).

The portable XLA formulations live in ``ops/readqc.py`` / ``ops/seqpurge.py``.
These Pallas versions keep each batch tile resident in VMEM and emit only the
tiny accumulator outputs, so HBM traffic is the input bytes once:

* ``readqc_batch_pallas`` — per-cycle base pileups, per-cycle quality sums,
  base-quality histogram and per-read quality sums in ONE pass over a
  ``[B, L]`` tile. Measured on v5e (B=64k, L=160): 1.63 G reads/s vs the
  XLA path's 1.74 G reads/s — XLA's fusion already handles this memory-bound
  reduction well, so the XLA path stays the production dispatch and this
  kernel documents/validates the Pallas formulation.
* ``insert_scan_pallas`` — the O(L²) banded overlap correlation (SeqPurge's
  hottest loop). The XLA path materializes a gathered ``[B, O, L]``
  intermediate in HBM; here each offset is a dynamic rotate of the
  VMEM-resident tile, so HBM traffic drops from O(B·L²) to O(B·L).
  Measured on v5e (B=4096, L=128): 2.46 M pairs/s vs 0.01 M — ~250x. This
  IS the production dispatch on TPU (ops/seqpurge.py insert_scan_auto).

Both kernels are exact (integer) computations — results are bit-identical to
the XLA path, which the tests assert via interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BASE_CODES = np.frombuffer(b"ACGTN", dtype=np.uint8)
QHIST_SIZE = 100  # StatisticsReads.h:48 (base_qualities_ array)
N_CODE = ord("N")

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# --------------------------------------------------------------------------
# ReadQC batch statistics
# --------------------------------------------------------------------------

def _readqc_kernel(bases_ref, quals_ref, len_ref,
                   counts_ref, qsum_ref, qhist_ref, rq_ref):
    i = pl.program_id(0)
    tb, lp = bases_ref.shape

    b = bases_ref[:].astype(jnp.int32)   # v5e: no sub-word vector compares
    ln = len_ref[:]                                   # [TB, 1] int32
    pos = jax.lax.broadcasted_iota(jnp.int32, (tb, lp), 1)
    mask = pos < ln
    q = jnp.where(mask, quals_ref[:].astype(jnp.int32) - 33, 0)

    # per-cycle base pileups (A, C, G, T, N), padded to 8 sublanes
    rows = [jnp.sum((b == int(code)) & mask, axis=0, dtype=jnp.int32)
            for code in BASE_CODES]
    rows += [jnp.zeros((lp,), jnp.int32)] * (8 - len(rows))
    counts_update = jnp.stack(rows)                   # [8, LP]

    qsum_update = jnp.sum(q, axis=0, dtype=jnp.int32)[None, :]   # [1, LP]

    # base-quality histogram: one-hot expand in sublane chunks so the 3D
    # intermediate stays small in VMEM (CH x LP x 128 int8).
    ch = 64 if tb % 64 == 0 else 8
    bins = jax.lax.broadcasted_iota(jnp.int32, (ch, lp, _LANE), 2)
    pos_c = jax.lax.broadcasted_iota(jnp.int32, (ch, lp), 1)

    def hist_body(c, acc):
        qc_raw = quals_ref[pl.ds(c * ch, ch), :].astype(jnp.int32) - 33
        ln_c = len_ref[pl.ds(c * ch, ch), :]
        qc = jnp.where(pos_c < ln_c, qc_raw, _LANE - 1)  # padding -> dropped
        oh = (qc[:, :, None] == bins).astype(jnp.int32)
        return acc + jnp.sum(oh, axis=(0, 1))[None, :]

    qhist_update = jax.lax.fori_loop(
        0, tb // ch, hist_body, jnp.zeros((1, _LANE), jnp.int32))
    # padding was routed to bin 127; drop it (QHIST_SIZE < 127 always)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
    qhist_update = jnp.where(lane < QHIST_SIZE, qhist_update, 0)

    rq_ref[:] = jnp.sum(q, axis=1, dtype=jnp.int32)[:, None]     # [TB, 1]

    @pl.when(i == 0)
    def _init():
        counts_ref[:] = counts_update
        qsum_ref[:] = qsum_update
        qhist_ref[:] = qhist_update

    @pl.when(i > 0)
    def _acc():
        counts_ref[:] += counts_update
        qsum_ref[:] += qsum_update
        qhist_ref[:] += qhist_update


@functools.partial(jax.jit, static_argnames=("interpret",))
def readqc_batch_pallas(bases: jax.Array, quals: jax.Array,
                        lengths: jax.Array, *, interpret: bool = False):
    """Pallas version of ``ops.readqc.readqc_batch`` (same contract).

    Returns (counts5 [5, L], qsum_cycle [L], qhist [QHIST_SIZE], read_qsum [B]).
    """
    B, L = bases.shape
    LP = _round_up(max(L, _LANE), _LANE)
    TB = 512 if B % 512 == 0 else (64 if B % 64 == 0 else 8)
    BP = _round_up(B, TB)
    if LP != L or BP != B:
        bases = jnp.pad(bases, ((0, BP - B), (0, LP - L)))
        quals = jnp.pad(quals, ((0, BP - B), (0, LP - L)))
        lengths = jnp.pad(lengths, (0, BP - B))
    len2d = lengths.astype(jnp.int32)[:, None]

    grid = (BP // TB,)
    counts, qsum, qhist, rq = pl.pallas_call(
        _readqc_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, LP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, LP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, LP), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LP), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANE), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, LP), jnp.int32),
            jax.ShapeDtypeStruct((1, LP), jnp.int32),
            jax.ShapeDtypeStruct((1, _LANE), jnp.int32),
            jax.ShapeDtypeStruct((BP, 1), jnp.int32),
        ],
        interpret=interpret,
    )(bases, quals, len2d)
    return (counts[:5, :L], qsum[0, :L], qhist[0, :QHIST_SIZE], rq[:B, 0])


# --------------------------------------------------------------------------
# SeqPurge insert-match offset scan
# --------------------------------------------------------------------------

def _insert_scan_kernel(seq1_ref, seq2_ref, len_ref, m_ref, mm_ref):
    # Outputs are transposed ([O, TB], offsets on sublanes) because TPU
    # vector stores need lane indices aligned to 128; sublane-group stores
    # of 8 consecutive offsets are natively supported.
    tb, lp = seq1_ref.shape
    s1 = seq1_ref[:].astype(jnp.int32)
    s2 = seq2_ref[:].astype(jnp.int32)
    ln = len_ref[:]                                    # [TB, 1]
    j = jax.lax.broadcasted_iota(jnp.int32, (tb, lp), 1)
    s2_is_n = s2 == N_CODE

    def group(g, _):
        o0 = g * 8
        m_rows = []
        mm_rows = []
        for k in range(8):                             # unrolled: static rolls off o0
            o = o0 + k
            # s1 rotated right by o: s1r[b, j] = s1[b, j - o mod LP]
            s1r = pltpu.roll(pltpu.roll(s1, o0, 1), k, 1)
            valid = (j >= o) & (j < ln)
            eff = valid & jnp.logical_not((s1r == N_CODE) | s2_is_n)
            eq = s1r == s2
            m_rows.append(jnp.sum(eff & eq, axis=1, dtype=jnp.int32))
            mm_rows.append(jnp.sum(eff & jnp.logical_not(eq), axis=1,
                                   dtype=jnp.int32))
        m_ref[pl.ds(o0, 8), :] = jnp.stack(m_rows)     # [8, TB]
        mm_ref[pl.ds(o0, 8), :] = jnp.stack(mm_rows)
        return 0

    jax.lax.fori_loop(0, lp // 8, group, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def insert_scan_pallas(seq1: jax.Array, seq2rc: jax.Array,
                       min_len: jax.Array, *, interpret: bool = False):
    """Pallas version of ``ops.seqpurge.insert_scan`` (same contract).

    Returns (matches, mismatches): [B, L] int32 indexed by offset.
    """
    B, L = seq1.shape
    LP = _round_up(max(L, _LANE), _LANE)
    TB = 256  # transposed outputs put TB on lanes: must be 128-divisible
    BP = _round_up(B, TB)
    if LP != L or BP != B:
        seq1 = jnp.pad(seq1, ((0, BP - B), (0, LP - L)))
        seq2rc = jnp.pad(seq2rc, ((0, BP - B), (0, LP - L)))
        min_len = jnp.pad(min_len, (0, BP - B))
    len2d = min_len.astype(jnp.int32)[:, None]

    m_t, mm_t = pl.pallas_call(
        _insert_scan_kernel,
        grid=(BP // TB,),
        in_specs=[
            pl.BlockSpec((TB, LP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, LP), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((LP, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((LP, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((LP, BP), jnp.int32),
            jax.ShapeDtypeStruct((LP, BP), jnp.int32),
        ],
        interpret=interpret,
    )(seq1, seq2rc, len2d)
    return m_t[:L, :B].T, mm_t[:L, :B].T


def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
