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
