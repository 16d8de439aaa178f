"""QcToTsv / TsvToQC golden parity."""

from helpers import QCML_STRIP, compare_files, execute


def test_qc_to_tsv(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "q.tsv"
    assert execute("QcToTsv", ["-in"] + [ref_data_in / f"QcToTsv_in{n}.qcML" for n in (1, 2, 3, 4)]
                   + ["-out", out]) == 0
    compare_files(out, ref_data_out / "QcToTsv_out1.tsv")


def test_tsv_to_qc(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "t.qcML"
    assert execute("TsvToQC", ["-in", ref_data_in / "TsvToQC_in1.tsv",
                               "-sources", ref_data_in / "TsvToQC_in1.tsv",
                               "-out", out]) == 0
    compare_files(out, ref_data_out / "TsvToQC_out1.qcML", QCML_STRIP)
