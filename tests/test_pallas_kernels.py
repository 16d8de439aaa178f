"""Pallas kernels must be bit-identical to the portable XLA formulations.

On CPU the kernels run in interpret mode; on TPU hardware the same code
compiles via Mosaic (exercised by bench.py / the driver).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from ngsbits_tpu.ops import pallas_kernels as pk
from ngsbits_tpu.ops.readqc import readqc_batch
from ngsbits_tpu.ops.seqpurge import insert_scan


def _reads(B, L, seed=0, lmin=1):
    rng = np.random.default_rng(seed)
    bases = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8), size=(B, L))
    quals = rng.integers(33, 74, size=(B, L)).astype(np.uint8)
    lengths = rng.integers(lmin, L + 1, size=(B,)).astype(np.int32)
    return bases, quals, lengths


@pytest.mark.parametrize("B,L", [(64, 151), (24, 40), (128, 128)])
def test_readqc_pallas_matches_xla(B, L):
    bases, quals, lengths = _reads(B, L, seed=B + L)
    ref = readqc_batch(bases, quals, lengths)
    got = pk.readqc_batch_pallas(bases, quals, lengths, interpret=True)
    for r, g, name in zip(ref, got, ["counts5", "qsum_cycle", "qhist", "read_qsum"]):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g), err_msg=name)


@pytest.mark.parametrize("B,L", [(16, 100), (8, 64)])
def test_insert_scan_pallas_matches_xla(B, L):
    rng = np.random.default_rng(L)
    seq1 = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8), size=(B, L))
    seq2 = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8), size=(B, L))
    # make some pairs truly overlap so matches aren't uniform noise
    seq2[: B // 2, : L // 2] = seq1[: B // 2, L // 2 :]
    min_len = rng.integers(1, L + 1, size=(B,)).astype(np.int32)
    rm, rmm = insert_scan(seq1, seq2, min_len)
    gm, gmm = pk.insert_scan_pallas(seq1, seq2, min_len, interpret=True)
    np.testing.assert_array_equal(np.asarray(rm), np.asarray(gm))
    np.testing.assert_array_equal(np.asarray(rmm), np.asarray(gmm))
