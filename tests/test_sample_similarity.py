"""SampleSimilarity golden parity (SampleSimilarity_Test.cpp; tests 02/03
need SampleSimilarity_in5.bam which is absent from this mount)."""

from helpers import compare_files, execute


def test_gsvar_multisample(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "s1.tsv"
    assert execute("SampleSimilarity", ["-in", ref_data_in / "SampleSimilarity_in1.GSvar",
                                        ref_data_in / "SampleSimilarity_in2.GSvar",
                                        ref_data_in / "SampleSimilarity_in3.GSvar",
                                        "-build", "hg19", "-out", out,
                                        "-include_gonosomes", "-mode", "gsvar"]) == 0
    compare_files(out, ref_data_out / "SampleSimilarity_out1.tsv")


def test_vcf(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "s4.tsv"
    assert execute("SampleSimilarity", ["-in", ref_data_in / "SampleSimilarity_in6.vcf.gz",
                                        ref_data_in / "SampleSimilarity_in7.vcf.gz",
                                        "-mode", "vcf", "-build", "hg19", "-out", out]) == 0
    compare_files(out, ref_data_out / "SampleSimilarity_out4.tsv")


def test_vcf_roi_one_input_file(ref_data_in, ref_data_out, tmp_path):
    lst = tmp_path / "samples.txt"
    lst.write_text(f"{ref_data_in}/SampleSimilarity_in6.vcf.gz\n"
                   f"{ref_data_in}/SampleSimilarity_in7.vcf.gz\n")
    out = tmp_path / "s5.tsv"
    assert execute("SampleSimilarity", ["-in", lst, "-mode", "vcf", "-build", "hg19",
                                        "-out", out,
                                        "-roi", ref_data_in / "SampleSimilarity_roi.bed"]) == 0
    compare_files(out, ref_data_out / "SampleSimilarity_out5.tsv")


def test_bam(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "s6.tsv"
    assert execute("SampleSimilarity", ["-in", ref_data_in / "SampleSimilarity_in8.bam",
                                        ref_data_in / "SampleSimilarity_in9.bam",
                                        "-out", out, "-mode", "bam", "-max_snps", "200"]) == 0
    compare_files(out, ref_data_out / "SampleSimilarity_out6.tsv")


def test_bam_long_read(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "s7.tsv"
    assert execute("SampleSimilarity", ["-in", ref_data_in / "SampleSimilarity_in8.bam",
                                        ref_data_in / "SampleSimilarity_in9.bam",
                                        "-out", out, "-mode", "bam", "-max_snps", "200",
                                        "-long_read", "-min_cov", "5"]) == 0
    compare_files(out, ref_data_out / "SampleSimilarity_out7.tsv")
