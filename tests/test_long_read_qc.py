"""Long-read (ONT-scale) ReadQC behavior beyond the replayed reference
golden (ReadQC_out7.qcML pins N50=10411 on the real ONT fixture):

* N50 / N95 on a synthetic ONT-length library, checked against an
  independent brute-force formulation incl. the reference's plot-cap
  rounding (StatisticsReads.cpp:178-252: N95 ceil'd to 1k below 100kb
  longest read, to 10k above; plots capped at min(N95, longest)).
* the power-of-two length bucketing bounds the number of distinct jit
  shapes (recompiles) to O(log L) across arbitrary batch length mixes.
"""

from __future__ import annotations

import gzip
import math

import numpy as np
import pytest

from helpers import execute


def _write_fastq(path, lengths, seed=0):
    rng = np.random.default_rng(seed)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    with gzip.open(path, "wb") as fh:
        for i, ln in enumerate(lengths):
            seq = lut[rng.integers(0, 4, size=int(ln))].tobytes()
            fh.write(b"@ont_%d\n%s\n+\n%s\n" % (i, seq, b"I" * int(ln)))


def _expected_n50(lengths):
    ls = np.sort(np.asarray(lengths))[::-1]
    cum = np.cumsum(ls)
    total = int(ls.sum())
    return int(ls[np.argmax(cum > total // 2)])


def _expected_n95(lengths):
    ls = np.sort(np.asarray(lengths))
    cum = np.cumsum(ls)
    total = int(ls.sum())
    n95 = int(ls[np.argmax(cum > 0.95 * total)])
    if ls[-1] <= 100000:
        return int(math.ceil(n95 / 1000.0) * 1000)
    return int(math.ceil(n95 / 10000.0) * 10000)


@pytest.mark.parametrize("seed,maxlen", [(3, 60_000), (4, 140_000)])
def test_n50_n95_on_synthetic_ont_lengths(tmp_path, monkeypatch, seed, maxlen):
    rng = np.random.default_rng(seed)
    lengths = np.clip((rng.lognormal(8.8, 0.9, size=120)).astype(int),
                      500, maxlen)
    lengths[0] = maxlen  # pin the longest read (rounding-branch selector)
    fq = tmp_path / "ont.fastq.gz"
    _write_fastq(fq, lengths, seed)

    # capture the per-cycle plot x-extents (the N95 cap applies to plots)
    captured = []
    from ngsbits_tpu.core import plots as plots_mod
    orig = plots_mod.LinePlot.set_xvalues

    def capture(self, xs):
        captured.append(len(xs))
        return orig(self, xs)

    monkeypatch.setattr(plots_mod.LinePlot, "set_xvalues", capture)

    out = tmp_path / "ont.qcML"
    assert execute("ReadQC", ["-in1", fq, "-long_read", "-out", out]) == 0

    text = out.read_text()
    n50 = _expected_n50(lengths)
    assert f'name="N50 read length (bp)" description="Minimum read length ' \
           f'to reach 50% of sequenced bases." value="{n50}"' in text

    n95 = _expected_n95(lengths)
    expected_cycles = min(n95, int(lengths.max()))
    assert captured, "no plots produced"
    assert max(captured) == expected_cycles, \
        f"plot cycle cap {max(captured)} != min(N95, longest)={expected_cycles}"


def test_length_bucketing_bounds_recompiles():
    """qc/read_stats.py _bucket: arbitrary long-read batch length mixes must
    map to O(log L) distinct padded shapes, bounding jit recompiles."""
    from ngsbits_tpu.io.fastq import FastqBatch
    from ngsbits_tpu.qc.read_stats import ReadStatistics

    rng = np.random.default_rng(1)
    shapes = set()
    for _ in range(60):
        lmax = int(rng.integers(200, 1_000_000))
        b = int(rng.integers(1, 64))  # small B: only the shapes matter here
        batch = FastqBatch(
            bases=np.zeros((b, lmax), dtype=np.uint8),
            quals=np.zeros((b, lmax), dtype=np.uint8),
            lengths=np.full(b, lmax, dtype=np.int64),
            headers=None)
        pb, pq, pl = ReadStatistics._bucket(batch)
        assert pb.shape[1] >= lmax
        shapes.add(pb.shape)
    # 200..1e6 spans ~12 length octaves; batch dim buckets likewise
    n_len_buckets = len({s[1] for s in shapes})
    n_b_buckets = len({s[0] for s in shapes})
    assert n_len_buckets <= 14, f"{n_len_buckets} length buckets"
    assert n_b_buckets <= 14, f"{n_b_buckets} batch buckets"
