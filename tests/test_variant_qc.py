"""VariantQC golden parity vs reference tools-TEST (VariantQC_Test.cpp)."""

from helpers import QCML_STRIP, compare_files, execute


def test_txt_ignore_filter(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "v1.txt"
    assert execute("VariantQC", ["-in", ref_data_in / "VariantQC_in1.vcf",
                                 "-out", out, "-txt", "-ignore_filter"]) == 0
    compare_files(out, ref_data_out / "VariantQC_test01_out.txt")


def test_qcml_ignore_filter(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "v2.qcML"
    assert execute("VariantQC", ["-in", ref_data_in / "VariantQC_in1.vcf",
                                 "-out", out, "-ignore_filter"]) == 0
    compare_files(out, ref_data_out / "VariantQC_test02_out.qcML", QCML_STRIP)


def test_qcml_with_filter(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "v3.qcML"
    assert execute("VariantQC", ["-in", ref_data_in / "VariantQC_in1.vcf",
                                 "-out", out]) == 0
    compare_files(out, ref_data_out / "VariantQC_test03_out.qcML", QCML_STRIP)


def test_long_read_phasing(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "v4.qcML"
    bed = tmp_path / "v4.bed"
    assert execute("VariantQC", ["-long_read", "-in", ref_data_in / "VariantQC_in2.vcf",
                                 "-out", out, "-phasing_bed", bed]) == 0
    compare_files(out, ref_data_out / "VariantQC_test04_out.qcML", QCML_STRIP)
    compare_files(bed, ref_data_out / "VariantQC_test04_out.bed")
