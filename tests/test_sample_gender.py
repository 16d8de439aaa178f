"""SampleGender golden parity (SampleGender_Test.cpp tests 04-08; tests
01-03 need panel.bam/sry.bam which are absent from this mount)."""

from helpers import compare_files, execute


def test_xy_lr1(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "g4.tsv"
    assert execute("SampleGender", ["-in", ref_data_in / "SampleGender_in_lr1.bam",
                                    "-method", "xy", "-out", out, "-long_read"]) == 0
    compare_files(out, ref_data_out / "SampleGender_test04_out.tsv")


def test_xy_lr2(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "g5.tsv"
    assert execute("SampleGender", ["-in", ref_data_in / "SampleGender_in_lr2.bam",
                                    "-method", "xy", "-out", out, "-long_read"]) == 0
    compare_files(out, ref_data_out / "SampleGender_test05_out.tsv")


def test_hetx_lr1(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "g6.tsv"
    assert execute("SampleGender", ["-in", ref_data_in / "SampleGender_in_lr1.bam",
                                    "-method", "hetx", "-out", out, "-long_read"]) == 0
    compare_files(out, ref_data_out / "SampleGender_test06_out.tsv")


def test_hetx_lr2(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "g7.tsv"
    assert execute("SampleGender", ["-in", ref_data_in / "SampleGender_in_lr2.bam",
                                    "-method", "hetx", "-out", out, "-long_read"]) == 0
    compare_files(out, ref_data_out / "SampleGender_test07_out.tsv")


def test_sry_multi(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "g8.tsv"
    assert execute("SampleGender", ["-in", ref_data_in / "SampleGender_in_lr1.bam",
                                    ref_data_in / "SampleGender_in_lr2.bam",
                                    "-method", "sry", "-out", out, "-long_read"]) == 0
    compare_files(out, ref_data_out / "SampleGender_test08_out.tsv")
