"""ReadQC golden parity vs the reference test suite
(tools-TEST/ReadQC_Test.cpp, data_out/ReadQC_out*.qcML)."""

import pytest

from helpers import QCML_STRIP, compare_files, compare_files_delta, execute


def test_base_test(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "ReadQC_out1.qcML"
    assert execute("ReadQC", ["-in1", ref_data_in / "ReadQC_in1.fastq.gz",
                              "-in2", ref_data_in / "ReadQC_in2.fastq.gz",
                              "-out", out]) == 0
    compare_files(out, ref_data_out / "ReadQC_out1.qcML", QCML_STRIP)


def test_with_txt_parameter(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "ReadQC_out2.txt"
    assert execute("ReadQC", ["-in1", ref_data_in / "ReadQC_in1.fastq.gz",
                              "-in2", ref_data_in / "ReadQC_in2.fastq.gz",
                              "-out", out, "-txt"]) == 0
    compare_files(out, ref_data_out / "ReadQC_out2.txt")


def test_single_end(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "ReadQC_out3.qcML"
    assert execute("ReadQC", ["-in1", ref_data_in / "ReadQC_in1.fastq.gz",
                              "-out", out]) == 0
    compare_files(out, ref_data_out / "ReadQC_out3.qcML", QCML_STRIP)


def test_different_read_lengths(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "ReadQC_out4.qcML"
    assert execute("ReadQC", ["-in1", ref_data_in / "ReadQC_in3.fastq.gz",
                              "-in2", ref_data_in / "ReadQC_in4.fastq.gz",
                              "-out", out]) == 0
    compare_files_delta(out, ref_data_out / "ReadQC_out4.qcML", 0.01, QCML_STRIP)


def test_multiple_input_files(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "ReadQC_out5.qcML"
    assert execute("ReadQC", ["-in1", ref_data_in / "ReadQC_in1.fastq.gz",
                              ref_data_in / "ReadQC_in3.fastq.gz",
                              "-in2", ref_data_in / "ReadQC_in2.fastq.gz",
                              ref_data_in / "ReadQC_in4.fastq.gz",
                              "-out", out]) == 0
    compare_files(out, ref_data_out / "ReadQC_out5.qcML", QCML_STRIP)


def test_with_fastq_output(ref_data_in, tmp_path):
    out1 = tmp_path / "R1.fastq.gz"
    out2 = tmp_path / "R2.fastq.gz"
    out = tmp_path / "out6.qcML"
    assert execute("ReadQC", ["-in1", ref_data_in / "ReadQC_in1.fastq.gz",
                              "-in2", ref_data_in / "ReadQC_in2.fastq.gz",
                              "-out1", out1, "-out2", out2, "-out", out]) == 0
    compare_files(out1, ref_data_in / "ReadQC_in1.fastq.gz")
    compare_files(out2, ref_data_in / "ReadQC_in2.fastq.gz")


def test_long_read(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "ReadQC_out7.qcML"
    assert execute("ReadQC", ["-in1", ref_data_in / "ReadQC_in5.fastq.gz",
                              "-long_read", "-out", out]) == 0
    compare_files(out, ref_data_out / "ReadQC_out7.qcML", QCML_STRIP)
