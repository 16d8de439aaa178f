"""Randomized IO round-trips and batch-split invariance.

The reference processes records one at a time; this framework batches.
Every batched engine must therefore be invariant to how the stream is cut
into batches — pinned here over random inputs for FASTQ IO, ReadQC
accumulation, and SeqPurge trim decisions (the goldens only ever use one
block size)."""

from __future__ import annotations

import gzip

import numpy as np
import pytest

from helpers import execute


def _random_fastq(path, rng, n, long_read=False):
    lut = np.frombuffer(b"ACGTN", dtype=np.uint8)
    qmax = 126 if long_read else 74
    recs = []
    with gzip.open(path, "wb") as fh:
        for i in range(n):
            ln = int(rng.integers(1, 1200 if long_read else 160))
            seq = lut[rng.integers(0, 5, size=ln)].tobytes()
            qual = rng.integers(33, qmax, size=ln).astype(np.uint8).tobytes()
            rec = b"@read_%d some comment\n%s\n+\n%s\n" % (i, seq, qual)
            fh.write(rec)
            recs.append((b"@read_%d some comment" % i, seq, qual))
    return recs


@pytest.mark.parametrize("seed,long_read", [(1, False), (2, False), (3, True)])
def test_fastq_reader_batch_split_invariance(tmp_path, seed, long_read):
    rng = np.random.default_rng(seed)
    fq = tmp_path / "r.fastq.gz"
    recs = _random_fastq(fq, rng, 230, long_read)
    from ngsbits_tpu.io.fastq import FastqReader
    for batch_reads in (7, 64, 1 << 16):
        got = []
        for b in FastqReader(str(fq), batch_reads=batch_reads,
                             keep_headers=True, long_read=long_read):
            b.materialize_headers()
            for i in range(len(b)):
                ln = int(b.lengths[i])
                got.append((b.header_bytes(i), b.bases[i, :ln].tobytes(),
                            b.quals[i, :ln].tobytes()))
        assert got == recs, f"batch_reads={batch_reads} altered the records"


@pytest.mark.parametrize("seed", [4, 5])
def test_fastq_writer_roundtrip(tmp_path, seed):
    """FastqReader -> FastqWriter -> decompressed bytes identical to the
    original decompressed input."""
    rng = np.random.default_rng(seed)
    fq = tmp_path / "in.fastq.gz"
    _random_fastq(fq, rng, 150)
    out = tmp_path / "out.fastq.gz"
    # FastqConcat of one file is a pure read->write pass-through
    assert execute("FastqConcat", ["-in", fq, "-out", out]) == 0
    assert gzip.decompress(out.read_bytes()) == gzip.decompress(fq.read_bytes())


def test_readqc_qcml_batch_split_invariance(tmp_path):
    """The complete ReadQC qcML must not depend on decode batch size."""
    rng = np.random.default_rng(6)
    fq = tmp_path / "r.fastq.gz"
    _random_fastq(fq, rng, 400)
    import ngsbits_tpu.io.fastq as fastq_mod
    from ngsbits_tpu.qc.read_stats import FORWARD, ReadStatistics
    results = []
    for batch_reads in (13, 111, 1 << 16):
        stats = ReadStatistics(single_end=True)
        for b in fastq_mod.FastqReader(str(fq), batch_reads=batch_reads):
            stats.update_batch(b, FORWARD)
        qc = stats.get_result()
        results.append([(v.accession, str(v.value)) for v in qc
                        if v.type.name != "IMAGE"])
    assert results[0] == results[1] == results[2]


@pytest.mark.parametrize("seed", [7, 8])
def test_seqpurge_output_block_size_invariance(tmp_path, seed):
    """Trimmed outputs must be byte-identical for any -block_size."""
    rng = np.random.default_rng(seed)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    adapter1 = b"AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
    adapter2 = b"AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGT"
    f1 = tmp_path / "R1.fastq.gz"
    f2 = tmp_path / "R2.fastq.gz"
    comp = dict(zip(b"ACGT", b"TGCA"))
    with gzip.open(f1, "wb") as o1, gzip.open(f2, "wb") as o2:
        for i in range(300):
            insert_len = int(rng.integers(20, 140))
            insert = lut[rng.integers(0, 4, size=insert_len)].tobytes()
            L = 100
            # read1 = insert + adapter1..., read2 = revcomp(insert) + adapter2...
            r1 = (insert + adapter1 + bytes(lut[rng.integers(0, 4, size=L)]))[:L]
            rc = bytes(comp[c] for c in reversed(insert))
            r2 = (rc + adapter2 + bytes(lut[rng.integers(0, 4, size=L)]))[:L]
            q = bytes([60]) * L
            o1.write(b"@p%d/1\n%s\n+\n%s\n" % (i, r1, q))
            o2.write(b"@p%d/2\n%s\n+\n%s\n" % (i, r2, q))
    outs = []
    for bs in ("17", "100", "4096"):
        o1 = tmp_path / f"o1_{bs}.fastq.gz"
        o2 = tmp_path / f"o2_{bs}.fastq.gz"
        assert execute("SeqPurge", ["-in1", f1, "-in2", f2, "-out1", o1,
                                    "-out2", o2, "-block_size", bs]) == 0
        outs.append((gzip.decompress(o1.read_bytes()),
                     gzip.decompress(o2.read_bytes())))
    assert outs[0] == outs[1] == outs[2]
