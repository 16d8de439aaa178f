"""VCF tool golden parity (Vcf*_Test.cpp)."""

import gzip

import pytest

from helpers import compare_files, execute

CPPNGS_DATA = "/root/reference/src/cppNGS-TEST/data_in"


def test_vcf_sort(ref_data_in, ref_data_out, tmp_path):
    for n, src, extra in [(1, "VcfSort_in1.vcf", []),
                          (2, "VcfSort_in1.vcf", ["-split_chrs"]),
                          (3, "VcfSort_in1.vcf", ["-remove_unused_contigs"]),
                          (5, "VcfSort_in2.vcf", [])]:
        out = tmp_path / f"s{n}.vcf"
        assert execute("VcfSort", ["-in", ref_data_in / src, "-out", out] + extra) == 0
        compare_files(out, ref_data_out / f"VcfSort_out{n}.vcf")
    out = tmp_path / "s4.vcf.gz"
    assert execute("VcfSort", ["-in", ref_data_in / "VcfSort_in1.vcf",
                               "-compression_level", "5", "-out", out]) == 0
    a = gzip.decompress(open(out, "rb").read())
    b = gzip.decompress(open(ref_data_out / "VcfSort_out4.vcf.gz", "rb").read())
    assert a == b


def test_vcf_to_tsv(ref_data_in, ref_data_out, tmp_path):
    for n in (1, 2):
        out = tmp_path / f"t{n}.tsv"
        assert execute("VcfToTsv", ["-in", ref_data_in / f"VcfToTsv_in{n}.vcf", "-out", out]) == 0
        compare_files(out, ref_data_out / f"VcfToTsv_out{n}.tsv")


def test_vcf_to_bed(ref_data_out, tmp_path):
    out = tmp_path / "b.bed"
    assert execute("VcfToBed", ["-in", f"{CPPNGS_DATA}/panel_vep.vcf", "-out", out]) == 0
    compare_files(out, ref_data_out / "VcfToBed_out01.bed")


def test_vcf_extract_samples(ref_data_in, ref_data_out, tmp_path):
    for n, samples in [(1, "Sample1"), (2, "Sample2,Sample1")]:
        out = tmp_path / f"x{n}.vcf"
        assert execute("VcfExtractSamples", ["-in", ref_data_in / "VcfExtractSamples_in1.vcf",
                                             "-out", out, "-samples", samples]) == 0
        compare_files(out, ref_data_out / f"VcfExtractSamples_out{n}.vcf")


def test_vcf_strip(ref_data_in, ref_data_out, tmp_path):
    cases = [(1, ["-info", "AF,PQR,SRR,AB,PQA", "-format", "GT,AD,QR,QA"]),
             (2, ["-format", "GT,DP,AO", "-clear_info"]),
             (3, []),
             (4, ["-info", "DP,LEN,SOME_FLAG", "-format", "GT,DP,QA"])]
    for n, extra in cases:
        out = tmp_path / f"st{n}.vcf"
        assert execute("VcfStrip", ["-in", ref_data_in / "VcfStrip_in1.vcf", "-out", out] + extra) == 0
        compare_files(out, ref_data_out / f"VcfStrip_out{n}.vcf")


def test_vcf_add(ref_data_in, ref_data_out, tmp_path):
    cases = [(1, []),
             (2, ["-filter", "mosaic", "-filter_desc", "bli_bla_bluff."]),
             (3, ["-filter", "mosaic", "-filter_desc", "bli_bla_bluff.", "-skip_duplicates"])]
    for n, extra in cases:
        out = tmp_path / f"a{n}.vcf"
        assert execute("VcfAdd", ["-in", ref_data_in / "VcfAdd_in1.vcf",
                                  ref_data_in / "VcfAdd_in2.vcf.gz", "-out", out] + extra) == 0
        compare_files(out, ref_data_out / f"VcfAdd_out{n}.vcf")


def test_vcf_subtract(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "sub.vcf"
    assert execute("VcfSubtract", ["-in", ref_data_in / "VcfSubtract_in1.vcf",
                                   "-in2", ref_data_in / "VcfSubtract_in2.vcf",
                                   "-out", out]) == 0
    compare_files(out, ref_data_out / "VcfSubtract_out1.vcf")


def test_vcf_stream_sort(ref_data_in, ref_data_out, tmp_path):
    for n in (1, 2):
        out = tmp_path / f"ss{n}.vcf"
        assert execute("VcfStreamSort", ["-n", "4", "-in", ref_data_in / f"VcfStreamSort_in{n}.vcf",
                                         "-out", out]) == 0
        compare_files(out, ref_data_out / f"VcfStreamSort_out{n}.vcf")


def test_vcf_break_multi(ref_data_in, ref_data_out, tmp_path):
    for n, extra in [(1, []), (2, []), (3, []), (4, ["-no_errors", "-verbose"])]:
        out = tmp_path / f"bm{n}.vcf"
        assert execute("VcfBreakMulti", ["-in", ref_data_in / f"VcfBreakMulti_in{n}.vcf",
                                         "-out", out] + extra) == 0
        compare_files(out, ref_data_out / f"VcfBreakMulti_out{n}.vcf")


def test_vcfsort_split_chrs_identical(ref_data_in, tmp_path):
    """-split_chrs (one chromosome at a time via tmp files) must produce
    byte-identical output to the in-memory sort."""
    from helpers import execute

    src = ref_data_in / "VcfSort_in1.vcf"
    a = tmp_path / "mem.vcf"
    b = tmp_path / "split.vcf"
    assert execute("VcfSort", ["-in", src, "-out", a]) == 0
    assert execute("VcfSort", ["-in", src, "-out", b, "-split_chrs"]) == 0
    assert a.read_bytes() == b.read_bytes()


def test_tsvmerge_simple_identical(ref_data_in, tmp_path):
    """-simple (positional merge) matches the hash-join on same-key inputs
    and errors on mismatched keys."""
    from helpers import execute

    f1 = tmp_path / "a.tsv"
    f2 = tmp_path / "b.tsv"
    f1.write_text("#key\tx\nk1\t1\nk2\t2\n")
    f2.write_text("#key\ty\nk1\t9\nk2\t8\n")
    a = tmp_path / "m1.tsv"
    b = tmp_path / "m2.tsv"
    assert execute("TsvMerge", ["-in", f1, f2, "-cols", "key", "-out", a]) == 0
    assert execute("TsvMerge", ["-in", f1, f2, "-cols", "key", "-out", b,
                                "-simple"]) == 0
    assert a.read_bytes() == b.read_bytes()

    f3 = tmp_path / "c.tsv"
    f3.write_text("#key\ty\nk2\t9\nk1\t8\n")   # different key order
    assert execute("TsvMerge", ["-in", f1, f3, "-cols", "key",
                                "-out", tmp_path / "m3.tsv", "-simple"]) == 1
