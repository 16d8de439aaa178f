"""Golden parity for FASTA tools and RnaQC.

Reference tests: src/tools-TEST/FastaInfo_Test.cpp, FastaMask_Test.cpp,
RnaQC_Test.cpp. RnaQC_in1.bam is absent from the reference checkout (only
its .bai is present), so only the splicing/expression path (base_test3 /
RnaQC_out3.qcML) can be exercised; the housekeeping-genes path is covered
indirectly through the MappingQC engine tests.
"""

from helpers import execute, compare_files, QCML_STRIP


def test_fasta_info(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "info.txt"
    out_n = tmp_path / "n.bed"
    out_other = tmp_path / "other.bed"
    assert execute("FastaInfo", ["-in", ref_data_in / "FastaInfo_in1.fa",
                                 "-out", out, "-write_n", out_n,
                                 "-write_other", out_other]) == 0
    compare_files(out, ref_data_out / "FastaInfo_test01_out.txt")
    compare_files(out_n, ref_data_out / "FastaInfo_test01_out_n.bed")
    compare_files(out_other, ref_data_out / "FastaInfo_test01_out_other.bed")


def test_fasta_mask(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "masked.fa"
    assert execute("FastaMask", ["-in", ref_data_in / "FastaMask_in1.fa",
                                 "-reg", ref_data_in / "FastaMask_in1.bed",
                                 "-out", out]) == 0
    compare_files(out, ref_data_out / "FastaMask_out1.fa")


def test_rna_qc_splicing_expression(ref_data_in, ref_data_out, tmp_path):
    # base_test3: no housekeeping genes -> BAM is never opened (basename only)
    out = tmp_path / "rna3.qcML"
    assert execute("RnaQC", ["-bam", ref_data_in / "RnaQC_in1.bam",
                             "-splicing", ref_data_in / "RnaQC_in1_splicing_gene.tsv",
                             "-expression", ref_data_in / "RnaQC_in1_expr.tsv",
                             "-ref", "/dev/null", "-out", out]) == 0
    compare_files(out, ref_data_out / "RnaQC_out3.qcML", QCML_STRIP)


def test_rna_qc_requires_ref(ref_data_in, tmp_path, capsys):
    assert execute("RnaQC", ["-bam", ref_data_in / "RnaQC_in1.bam"]) == 1
    assert "Reference genome FASTA unset" in capsys.readouterr().err
