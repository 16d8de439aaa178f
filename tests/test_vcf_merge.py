"""VcfMerge golden parity (reference: src/tools-TEST/VcfMerge_Test.cpp).
Re-calling cases (out3/out5) use CRAM fixtures — CRAM is not supported."""

import pytest

from helpers import execute, compare_files

FILES_SR = ["VcfMerge_SR_FB.vcf.gz", "VcfMerge_SR_DR.vcf.gz", "VcfMerge_SR_DV.vcf.gz"]
FILES_ALL = FILES_SR + ["VcfMerge_LR_ONT_CL.vcf.gz", "VcfMerge_LR_PacBio_DV.vcf.gz"]


@pytest.mark.parametrize("files,extra,golden", [
    (FILES_ALL, [], "VcfMerge_out1.vcf"),
    (FILES_SR, [], "VcfMerge_out2.vcf"),
    (FILES_SR, ["-no_special_calls", "-min_qual", "20"], "VcfMerge_out4.vcf"),
])
def test_vcf_merge(ref_data_in, ref_data_out, tmp_path, capsys, files, extra, golden):
    out = tmp_path / "m.vcf"
    ins = [str(ref_data_in / f) for f in files]
    assert execute("VcfMerge", ["-in"] + ins + ["-out", out] + extra) == 0
    compare_files(out, ref_data_out / golden, (r"##fileDate",))
