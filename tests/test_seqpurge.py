"""SeqPurge golden parity (SeqPurge_Test.cpp). fastq.gz outputs are compared
decompressed (gzip container bytes differ from Qt's zlib stream)."""

import gzip

import pytest

from helpers import QCML_STRIP, compare_files, execute


def cmp_gz(out, golden):
    a = gzip.decompress(open(out, "rb").read())
    b = gzip.decompress(open(golden, "rb").read())
    assert a == b, f"{out} differs from {golden}"


def run(tmp_path, ref_data_in, args):
    assert execute("SeqPurge", args) == 0


def test_base(ref_data_in, ref_data_out, tmp_path):
    o1 = tmp_path / "o1.fastq.gz"
    o2 = tmp_path / "o2.fastq.gz"
    qc = tmp_path / "o1.qcML"
    assert execute("SeqPurge", ["-in1", ref_data_in / "SeqPurge_in1.fastq.gz",
                                "-in2", ref_data_in / "SeqPurge_in2.fastq.gz",
                                "-out1", o1, "-out2", o2, "-ncut", "0", "-qcut", "0",
                                "-min_len", "15", "-qc", qc,
                                "-block_size", "100", "-block_prefetch", "1"]) == 0
    cmp_gz(o1, ref_data_out / "SeqPurge_out1.fastq.gz")
    cmp_gz(o2, ref_data_out / "SeqPurge_out2.fastq.gz")
    compare_files(qc, ref_data_out / "SeqPurge_out1.qcML", QCML_STRIP)


@pytest.mark.parametrize("in1,in2,g1,g2,extra", [
    ("SeqPurge_in3.fastq.gz", "SeqPurge_in4.fastq.gz", "SeqPurge_out3.fastq.gz", "SeqPurge_out4.fastq.gz", []),
    ("SeqPurge_in5.fastq.gz", "SeqPurge_in6.fastq.gz", "SeqPurge_out5.fastq.gz", "SeqPurge_out6.fastq.gz", []),
    ("SeqPurge_in7.fastq.gz", "SeqPurge_in8.fastq.gz", "SeqPurge_out7.fastq.gz", "SeqPurge_out8.fastq.gz",
     ["-a1", "CTGTCTCTTATACACATCT", "-a2", "CTGTCTCTTATACACATCT"]),
])
def test_variants_nq0(ref_data_in, ref_data_out, tmp_path, in1, in2, g1, g2, extra):
    o1 = tmp_path / "a.fastq.gz"
    o2 = tmp_path / "b.fastq.gz"
    assert execute("SeqPurge", ["-in1", ref_data_in / in1, "-in2", ref_data_in / in2,
                                "-out1", o1, "-out2", o2] + extra +
                   ["-ncut", "0", "-qcut", "0", "-min_len", "15",
                    "-block_size", "100", "-block_prefetch", "1"]) == 0
    cmp_gz(o1, ref_data_out / g1)
    cmp_gz(o2, ref_data_out / g2)


def test_quality_trimming(ref_data_in, ref_data_out, tmp_path):
    o1 = tmp_path / "o9.fastq.gz"
    o2 = tmp_path / "o10.fastq.gz"
    assert execute("SeqPurge", ["-in1", ref_data_in / "SeqPurge_in1.fastq.gz",
                                "-in2", ref_data_in / "SeqPurge_in2.fastq.gz",
                                "-out1", o1, "-out2", o2, "-qcut", "15", "-ncut", "0",
                                "-min_len", "15", "-block_size", "100", "-block_prefetch", "1"]) == 0
    cmp_gz(o1, ref_data_out / "SeqPurge_out9.fastq.gz")
    cmp_gz(o2, ref_data_out / "SeqPurge_out10.fastq.gz")


def test_n_trimming(ref_data_in, ref_data_out, tmp_path):
    o1 = tmp_path / "o11.fastq.gz"
    o2 = tmp_path / "o12.fastq.gz"
    assert execute("SeqPurge", ["-in1", ref_data_in / "SeqPurge_in1.fastq.gz",
                                "-in2", ref_data_in / "SeqPurge_in2.fastq.gz",
                                "-out1", o1, "-out2", o2, "-ncut", "7", "-qcut", "0",
                                "-min_len", "15", "-block_size", "100", "-block_prefetch", "1"]) == 0
    cmp_gz(o1, ref_data_out / "SeqPurge_out11.fastq.gz")
    cmp_gz(o2, ref_data_out / "SeqPurge_out12.fastq.gz")


def test_singletons(ref_data_in, ref_data_out, tmp_path):
    o1 = tmp_path / "o13.fastq.gz"
    o2 = tmp_path / "o14.fastq.gz"
    o3 = tmp_path / "o15"
    assert execute("SeqPurge", ["-in1", ref_data_in / "SeqPurge_in1.fastq.gz",
                                "-in2", ref_data_in / "SeqPurge_in2.fastq.gz",
                                "-out1", o1, "-out2", o2, "-out3", o3, "-qcut", "25",
                                "-block_size", "100", "-block_prefetch", "1"]) == 0
    cmp_gz(o1, ref_data_out / "SeqPurge_out13.fastq.gz")
    cmp_gz(o2, ref_data_out / "SeqPurge_out14.fastq.gz")
    cmp_gz(str(o3) + "_R1.fastq.gz", ref_data_out / "SeqPurge_out15_R1.fastq.gz")
    cmp_gz(str(o3) + "_R2.fastq.gz", ref_data_out / "SeqPurge_out15_R2.fastq.gz")


@pytest.mark.parametrize("in1,in2,g1,g2", [
    ("SeqPurge_in9.fastq.gz", "SeqPurge_in10.fastq.gz", "SeqPurge_out16.fastq.gz", "SeqPurge_out17.fastq.gz"),
    ("SeqPurge_in11.fastq.gz", "SeqPurge_in12.fastq.gz", "SeqPurge_out18.fastq.gz", "SeqPurge_out19.fastq.gz"),
])
def test_default_qn(ref_data_in, ref_data_out, tmp_path, in1, in2, g1, g2):
    o1 = tmp_path / "x.fastq.gz"
    o2 = tmp_path / "y.fastq.gz"
    assert execute("SeqPurge", ["-in1", ref_data_in / in1, "-in2", ref_data_in / in2,
                                "-out1", o1, "-out2", o2, "-min_len", "15",
                                "-block_size", "100", "-block_prefetch", "1"]) == 0
    cmp_gz(o1, ref_data_out / g1)
    cmp_gz(o2, ref_data_out / g2)


def test_error_correction(ref_data_in, ref_data_out, tmp_path):
    o1 = tmp_path / "o20.fastq.gz"
    o2 = tmp_path / "o21.fastq.gz"
    assert execute("SeqPurge", ["-in1", ref_data_in / "SeqPurge_in1.fastq.gz",
                                "-in2", ref_data_in / "SeqPurge_in2.fastq.gz",
                                "-out1", o1, "-out2", o2, "-ncut", "0", "-qcut", "0",
                                "-ec", "-min_len", "15",
                                "-block_size", "100", "-block_prefetch", "1"]) == 0
    cmp_gz(o1, ref_data_out / "SeqPurge_out20.fastq.gz")
    cmp_gz(o2, ref_data_out / "SeqPurge_out21.fastq.gz")


def _random_pair_batch(rng, B=300, L=120, with_n=True):
    import numpy as np
    from ngsbits_tpu.io.fastq import FastqBatch

    def make(lmax):
        lens = rng.integers(31, lmax + 1, size=B).astype(np.int32)
        alphabet = np.frombuffer(b"ACGTN" if with_n else b"ACGT", dtype=np.uint8)
        probs = [0.24, 0.24, 0.24, 0.24, 0.04] if with_n else None
        bases = alphabet[rng.choice(len(alphabet), size=(B, lmax), p=probs)]
        quals = rng.integers(35, 74, size=(B, lmax)).astype(np.uint8)
        pos = np.arange(lmax)[None, :]
        mask = pos < lens[:, None]
        bases = np.where(mask, bases, 0).astype(np.uint8)
        quals = np.where(mask, quals, 0).astype(np.uint8)
        return FastqBatch(bases=bases.copy(), quals=quals.copy(), lengths=lens)

    b1 = make(L)
    b2 = make(L - 7)  # differing pad widths exercise the re-pad path
    # make a subset genuinely overlapping (insert match candidates): read2 =
    # revcomp(read1 shifted) + adapter-ish tail
    import numpy as np
    comp = np.zeros(256, np.uint8)
    for a, c in zip(b"ACGTN", b"TGCAN"):
        comp[a] = c
    for i in range(0, B, 3):
        l1 = int(b1.lengths[i])
        off = int(rng.integers(1, 20))
        l2 = max(31, l1 - off)
        if l2 > b2.bases.shape[1]:
            l2 = b2.bases.shape[1]
        frag = b1.bases[i, :l2][::-1]
        b2.bases[i, :l2] = comp[frag]
        b2.bases[i, l2:] = 0
        b2.lengths[i] = l2
    return b1, b2


@pytest.mark.parametrize("ec", [False, True])
def test_native_matches_numpy(monkeypatch, ec):
    """The C++ batch kernel (native/seqpurge.cpp) and the numpy/device
    formulation must make identical decisions on randomized batches."""
    import numpy as np
    from ngsbits_tpu.qc.seqpurge import SeqPurgeEngine, SeqPurgeParams

    rng = np.random.default_rng(42)
    b1, b2 = _random_pair_batch(rng)
    import copy
    b1n, b2n = copy.deepcopy(b1), copy.deepcopy(b2)

    params = SeqPurgeParams(ec=ec)
    eng_native = SeqPurgeEngine(params)
    assert eng_native.native_available()
    nl1_nat, nl2_nat = eng_native.process_batch(b1n, b2n)

    monkeypatch.setenv("NGSBITS_SEQPURGE_NO_NATIVE", "1")
    eng_np = SeqPurgeEngine(params)
    assert not eng_np.native_available()
    nl1_np, nl2_np = eng_np.process_batch(b1, b2)

    assert np.array_equal(nl1_nat, nl1_np)
    assert np.array_equal(nl2_nat, nl2_np)
    sn, sp = eng_native.stats, eng_np.stats
    assert sn.read_num == sp.read_num
    assert sn.reads_trimmed_insert == sp.reads_trimmed_insert
    assert sn.reads_trimmed_adapter == sp.reads_trimmed_adapter
    assert sn.reads_trimmed_q == sp.reads_trimmed_q
    assert sn.reads_trimmed_n == sp.reads_trimmed_n
    assert abs(sn.bases_perc_trim_sum - sp.bases_perc_trim_sum) < 1e-9
    assert np.array_equal(sn.bases_remaining, sp.bases_remaining)
    assert np.array_equal(sn.acons1, sp.acons1)
    assert np.array_equal(sn.acons2, sp.acons2)
    if ec:
        assert np.array_equal(sn.mismatch_r1, sp.mismatch_r1)
        assert np.array_equal(sn.mismatch_r2, sp.mismatch_r2)
        assert np.array_equal(sn.errors_per_read, sp.errors_per_read)
        assert np.array_equal(b1n.bases, b1.bases)
        assert np.array_equal(b1n.quals, b1.quals)
        assert np.array_equal(b2n.bases, b2.bases)
        assert np.array_equal(b2n.quals, b2.quals)


def test_native_threads_deterministic():
    """threads>1 uses a static row partition with ordered merge — results
    must be identical to threads=1."""
    import numpy as np
    from ngsbits_tpu.qc.seqpurge import SeqPurgeEngine, SeqPurgeParams

    rng = np.random.default_rng(7)
    b1, b2 = _random_pair_batch(rng, B=500)
    import copy
    b1b, b2b = copy.deepcopy(b1), copy.deepcopy(b2)

    e1 = SeqPurgeEngine(SeqPurgeParams(), threads=1)
    e4 = SeqPurgeEngine(SeqPurgeParams(), threads=4)
    if not e1.native_available():
        pytest.skip("native kernel unavailable")
    r1 = e1.process_batch(b1, b2)
    r4 = e4.process_batch(b1b, b2b)
    assert np.array_equal(r1[0], r4[0])
    assert np.array_equal(r1[1], r4[1])
    # double partial sums merge in partition order — bitwise equality is not
    # guaranteed across thread counts (the reference's mutex-merged doubles
    # have the same property); the 2-decimal summary output is unaffected
    assert abs(e1.stats.bases_perc_trim_sum - e4.stats.bases_perc_trim_sum) < 1e-9
    assert np.array_equal(e1.stats.bases_remaining, e4.stats.bases_remaining)
