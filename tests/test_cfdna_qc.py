"""CfDnaQC parity. The cfDNA BAM fixtures (CfDnaQC_in_cfdna1/2.bam,
CfDnaQC_in_tumor.bam) are absent from the reference checkout (only .bai
files are present), so depth/correlation values cannot be reproduced.
What IS deterministic from the available fixtures is pinned against the
golden CfDnaQC_out5.qcML: panel splitting (5 monitoring / 9 ID variants)
and the umiVar error-rate values at precision 8.
"""

from helpers import execute


def _param_lines(path):
    return [l.strip() for l in open(path) if "qualityParameter" in l]


def test_cfdna_qc_panel_and_error_rates(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "cfdna.qcML"
    # substitute BAM: panel split + error-rate parsing don't depend on it
    assert execute("CfDnaQC", ["-bam", ref_data_in / "SomaticQC_in1_tum.bam",
                               "-cfdna_panel", ref_data_in / "CfDnaQC_in_panel.bed",
                               "-build", "hg19",
                               "-error_rates", ref_data_in / "CfDnaQC_in_error_rates.tsv",
                               "-ref", "/dev/null", "-out", out]) == 0
    mine = _param_lines(out)
    golden = _param_lines(ref_data_out / "CfDnaQC_out5.qcML")
    # umiVar error rates: byte-exact vs golden (precision-8 overwrite)
    assert [l for l in mine if "umiVar" in l] == [l for l in golden if "umiVar" in l]
    # panel split counts: byte-exact vs golden
    for name in ("monitoring variant count", "ID variant count"):
        assert [l for l in mine if name in l] == [l for l in golden if name in l]


def test_cfdna_qc_txt(ref_data_in, tmp_path):
    out = tmp_path / "cfdna.txt"
    assert execute("CfDnaQC", ["-bam", ref_data_in / "SomaticQC_in1_tum.bam",
                               "-cfdna_panel", ref_data_in / "CfDnaQC_in_panel.bed",
                               "-build", "hg19", "-ref", "/dev/null",
                               "-txt", "-out", out]) == 0
    lines = out.read_text().splitlines()
    assert lines[0] == "monitoring variant read depth: 0.00"
    assert "monitoring variant count: 5" in lines
    assert "ID variant count: 9" in lines
