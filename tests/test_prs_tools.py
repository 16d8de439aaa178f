"""Golden parity for VcfCalculatePRS (reference tools-TEST fixtures; the
hg38 genome is replaced by a consensus FASTA reconstructed from the test BAM,
which covers every position the indel-region logic reads)."""

import pytest

from helpers import compare_files, execute
from test_annotate_frequency import consensus_fasta


@pytest.fixture(scope="module")
def cons_ref(tmp_path_factory):
    d = tmp_path_factory.mktemp("prs_ref")
    return consensus_fasta(
        "/root/reference/src/tools-TEST/data_in/VcfCalculatePRS_in1.bam",
        d / "cons.fa")


def run_prs(ref_data_in, tmp_path, cons_ref, prs_files, details=False):
    out = tmp_path / "out.tsv"
    args = ["-bam", ref_data_in / "VcfCalculatePRS_in1.bam",
            "-in", ref_data_in / "VcfCalculatePRS_in1.vcf.gz",
            "-prs"] + [ref_data_in / p for p in prs_files] + ["-out", out,
            "-ref", cons_ref]
    if details:
        args += ["-details", tmp_path / "details.tsv"]
    assert execute("VcfCalculatePRS", args) == 0
    return out, tmp_path / "details.tsv"


@pytest.mark.parametrize("prs,golden", [
    (["VcfCalculatePRS_prs1.vcf"], "VcfCalculatePRS_out1.tsv"),
    (["VcfCalculatePRS_prs2.vcf"], "VcfCalculatePRS_out2.tsv"),
    (["VcfCalculatePRS_prs1.vcf", "VcfCalculatePRS_prs2.vcf"], "VcfCalculatePRS_out3.tsv"),
])
def test_prs_scores(ref_data_in, ref_data_out, tmp_path, cons_ref, prs, golden):
    out, _ = run_prs(ref_data_in, tmp_path, cons_ref, prs)
    compare_files(out, ref_data_out / golden)


@pytest.mark.parametrize("prs,golden,golden_details", [
    ("VcfCalculatePRS_prs2.vcf", "VcfCalculatePRS_out2.tsv", "VcfCalculatePRS_out4_details.tsv"),
    ("VcfCalculatePRS_prs3.vcf", "VcfCalculatePRS_out5.tsv", "VcfCalculatePRS_out5_details.tsv"),
    ("VcfCalculatePRS_prs4.vcf", "VcfCalculatePRS_out5.tsv", "VcfCalculatePRS_out5_details.tsv"),
    ("VcfCalculatePRS_prs5.vcf", "VcfCalculatePRS_out5.tsv", "VcfCalculatePRS_out5_details.tsv"),
    ("VcfCalculatePRS_prs6.vcf", "VcfCalculatePRS_out6.tsv", "VcfCalculatePRS_out6_details.tsv"),
])
def test_prs_details(ref_data_in, ref_data_out, tmp_path, cons_ref, prs, golden, golden_details):
    out, details = run_prs(ref_data_in, tmp_path, cons_ref, [prs], details=True)
    compare_files(out, ref_data_out / golden)
    compare_files(details, ref_data_out / golden_details)
