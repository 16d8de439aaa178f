"""SampleAncestry golden parity (SampleAncestry_Test.cpp)."""

from helpers import compare_files, execute

CPPNGS_DATA = "/root/reference/src/cppNGS-TEST/data_in"


def test_hg19(ref_data_out, tmp_path):
    out = tmp_path / "a1.tsv"
    assert execute("SampleAncestry", ["-in", f"{CPPNGS_DATA}/ancestry.vcf.gz",
                                      "-build", "hg19", "-out", out]) == 0
    compare_files(out, ref_data_out / "SampleAncestry_out1.tsv")


def test_hg38(ref_data_out, tmp_path):
    out = tmp_path / "a2.tsv"
    assert execute("SampleAncestry", ["-build", "hg38",
                                      "-in", f"{CPPNGS_DATA}/ancestry_hg38.vcf.gz",
                                      "-out", out]) == 0
    compare_files(out, ref_data_out / "SampleAncestry_out2.tsv")
