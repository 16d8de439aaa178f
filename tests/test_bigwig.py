"""BigWigReader unit tests pinned to the reference's BigWigReader_Test.cpp
values, plus VcfAnnotateFromBigWig semantics (the reference tool test needs a
downloaded phyloP bigwig; the reader fixture ships in cppNGS-TEST)."""

import pytest

from helpers import execute, read_lines
from ngsbits_tpu.io.bigwig import BigWigError, BigWigReader

BW = "/root/reference/src/cppNGS-TEST/data_in/BigWigReader.bw"


def test_bigwig_reader_pinned():
    r = BigWigReader(BW)
    h = r.header
    assert (h.version, h.zoom_levels) == (4, 1)
    assert h.chromosome_tree_offset == 0x158
    assert h.full_data_offset == 0x190
    assert h.full_index_offset == 0x1E7
    assert h.auto_sql_offset == 0x0
    assert h.total_summary_offset == 0x130
    assert h.uncompress_buf_size == 32768
    s = r.summary
    assert s.bases_covered == 154
    assert abs(s.min_val - 0.1) < 1e-6
    assert abs(s.max_val - 2.0) < 1e-6
    assert abs(s.sum_data - 272.1) < 1e-4
    assert abs(s.sum_squares - 500.389992) < 1e-4

    with pytest.raises(BigWigError):
        r.read_value("chr1", 0, 0)
    with pytest.raises(BigWigError):
        r.read_values("chr1", 100, 150, 0)
    with pytest.raises(BigWigError):
        r.read_values_region("chr1:0-1", 0)

    r.set_default_value(-50)
    assert abs(r.read_value("chr1", 0, 0) - 0.1) < 1e-6
    assert abs(r.read_value("chr1", 1, 0) - 0.2) < 1e-6
    assert abs(r.read_value("chr1", 100, 0) - 1.4) < 1e-6
    assert r.read_value("chr1", 99, 0) == -50

    v = r.read_values("chr1", 100, 150, 0)
    assert len(v) == 50 and all(abs(x - 1.4) < 1e-6 for x in v)
    v = r.read_values_region("chr1:100-110", 0)
    assert len(v) == 10 and all(abs(x - 1.4) < 1e-6 for x in v)
    v = r.read_values("chr1", 80, 90, 0)
    assert len(v) == 10 and all(x == -50 for x in v)
    v = r.read_values("chr1", 90, 110, 0)
    assert all(x == -50 for x in v[:10]) and all(abs(x - 1.4) < 1e-6 for x in v[10:])
    r.close()


def test_vcf_annotate_from_bigwig(tmp_path):
    vcf = tmp_path / "in.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
        "chr1\t1\t.\tA\tG\t.\t.\t.",             # 0-based 0 -> 0.1
        "chr1\t101\t.\tA\tC\t.\t.\tFOO=1",        # 0-based 100 -> 1.4
        "chr1\t100\t.\tAAA\tA\t.\t.\t.",          # deletion, same first base -> [100,102] -> 1.4
        "chr1\t50\t.\tA\tACGT\t.\t.\t.",          # insertion -> unchanged
        "chr2\t10\t.\tA\tC\t.\t.\t.",             # chromosome not in bw -> unchanged
    ]) + "\n")
    out = tmp_path / "out.vcf"
    assert execute("VcfAnnotateFromBigWig", ["-in", vcf, "-out", out,
                                             "-bw", BW, "-name", "SCORE", "-mode", "max"]) == 0
    lines = [l for l in read_lines(out) if not l.startswith("#")]
    assert lines[0].split("\t")[7] == "SCORE=0.1"
    assert lines[1].split("\t")[7] == "FOO=1;SCORE=1.4"
    assert lines[2].split("\t")[7] == "SCORE=1.4"
    assert lines[3].split("\t")[7] == "."
    assert lines[4].split("\t")[7] == "."
    header = [l for l in read_lines(out) if l.startswith("##INFO")]
    assert header == ['##INFO=<ID=SCORE,Number=1,Type=Float,Description="Annotation from BigWigReader.bw (mode max)">']


def test_annotate_threads_identical(tmp_path):
    """-threads chunk workers produce byte-identical output (chunkpool
    ordered processing; block_size 2 forces multiple chunks)."""
    import os
    import random

    if not os.path.exists(BW):
        import pytest
        pytest.skip("BigWigReader.bw fixture missing")
    rng = random.Random(3)
    lines = ["##fileformat=VCFv4.2",
             "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"]
    for i in range(40):
        lines.append(f"chr1\t{rng.randint(1, 120)}\t.\tA\tG\t.\t.\t.")
    vcf = tmp_path / "in.vcf"
    vcf.write_text("\n".join(lines) + "\n")
    a = tmp_path / "t1.vcf"
    b = tmp_path / "t4.vcf"
    assert execute("VcfAnnotateFromBigWig", ["-in", vcf, "-out", a, "-bw", BW,
                                             "-name", "S", "-mode", "max",
                                             "-threads", "1"]) == 0
    assert execute("VcfAnnotateFromBigWig", ["-in", vcf, "-out", b, "-bw", BW,
                                             "-name", "S", "-mode", "max",
                                             "-threads", "4", "-block_size", "2"]) == 0
    assert a.read_bytes() == b.read_bytes()
