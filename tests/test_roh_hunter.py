"""RohHunter golden parity (RohHunter_Test.cpp tests 1-3; out4 golden is
not present in this mount)."""

from helpers import compare_files, execute


def test_vep_af(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "r1.tsv"
    assert execute("RohHunter", ["-in", ref_data_in / "RohHunter_in1.vcf.gz",
                                 "-out", out, "-var_af_keys_vep", "gnomAD_AF,AF"]) == 0
    compare_files(out, ref_data_out / "RohHunter_out1.tsv")


def test_inc_chrx(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "r2.tsv"
    assert execute("RohHunter", ["-in", ref_data_in / "RohHunter_in1.vcf.gz",
                                 "-out", out, "-var_af_keys_vep", "gnomAD_AF,AF",
                                 "-inc_chrx"]) == 0
    compare_files(out, ref_data_out / "RohHunter_out2.tsv")


def test_annotate(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "r3.tsv"
    assert execute("RohHunter", ["-in", ref_data_in / "RohHunter_in1.vcf.gz",
                                 "-out", out, "-var_af_keys_vep", "gnomAD_AF,AF",
                                 "-annotate", ref_data_in / "RohHunter_genes.bed"]) == 0
    compare_files(out, ref_data_out / "RohHunter_out3.tsv")
