"""SomaticQC golden parity (reference: src/tools-TEST/SomaticQC_Test.cpp).

The 'linked file' metadata line is stripped because its uri is a path
relative to the output directory (QDir::relativeFilePath), which differs
between the reference test layout and our tmp dirs; its shape is asserted
separately. Plot binaries are stripped like the reference tests.
"""

import pytest

from helpers import execute, compare_files

TOOLS_IN = "/root/reference/src/tools-TEST/data_in"
CPPNGS_IN = "/root/reference/src/cppNGS-TEST/data_in"

STRIP = (r"creation ", r"<binary>", r"linked file")


@pytest.fixture(scope="module")
def stub_ref38(tmp_path_factory):
    d = tmp_path_factory.mktemp("ref38sq")
    ref = d / "hg38.fa"
    ref.write_bytes(b"")
    from ngsbits_tpu.io.bam import BamReader
    r = BamReader(CPPNGS_IN + "/tumor.bam")
    with open(str(ref) + ".fai", "w") as fh:
        for n, l in zip(r.ref_names, r.ref_lengths):
            fh.write(f"{n}\t{l}\t0\t60\t61\n")
    r.close()
    return str(ref)


def run(tmp_path, name, vcf, extra, ref="/dev/null"):
    out = tmp_path / name
    args = ["-tumor_bam", CPPNGS_IN + "/tumor.bam",
            "-normal_bam", CPPNGS_IN + "/normal.bam",
            "-somatic_vcf", f"{TOOLS_IN}/{vcf}",
            "-links", f"{TOOLS_IN}/SomaticQC_in4.qcML",
            "-ref", ref, "-out", out] + extra
    assert execute("SomaticQC", args) == 0
    return out


@pytest.mark.parametrize("golden,vcf", [
    ("SomaticQC_out1.qcML", "SomaticQC_in7.vcf"),
    ("SomaticQC_out2.qcML", "SomaticQC_in6.vcf"),
    ("SomaticQC_out6.qcML", "SomaticQC_in9.vcf"),
])
def test_skip_plots(ref_data_out, tmp_path, golden, vcf):
    out = run(tmp_path, "o.qcML", vcf, ["-skip_plots"])
    compare_files(out, ref_data_out / golden, STRIP)
    assert any("linked file" in l and 'value="SomaticQC_in4.qcML"' in l
               for l in open(out))


def test_tumor_content(ref_data_out, tmp_path):
    out = tmp_path / "o3.qcML"
    assert execute("SomaticQC", [
        "-tumor_bam", f"{TOOLS_IN}/SomaticQC_in1_tum.bam",
        "-normal_bam", f"{TOOLS_IN}/SomaticQC_in1_nor.bam",
        "-somatic_vcf", f"{TOOLS_IN}/SomaticQC_in1.vcf",
        "-links", f"{TOOLS_IN}/SomaticQC_in4.qcML",
        "-skip_plots", "-ref", "/dev/null", "-out", out]) == 0
    compare_files(out, ref_data_out / "SomaticQC_out3.qcML", STRIP)


def test_target_with_tmb_and_plots(ref_data_out, tmp_path, stub_ref38):
    # plots run against the stub genome: binaries are stripped, TMB metrics
    # are genome-independent (BED+VCF arithmetic only)
    out = run(tmp_path, "o4.qcML", "SomaticQC_in7.vcf",
              ["-target_bed", f"{TOOLS_IN}/SomaticQC_in8.bed",
               "-tsg_bed", f"{TOOLS_IN}/SomaticQC_tmb_tsg.bed",
               "-blacklist", f"{TOOLS_IN}/SomaticQC_tmb_blacklist.bed",
               "-target_exons", f"{TOOLS_IN}/SomaticQC_tmb_exons.bed"],
              ref=stub_ref38)
    compare_files(out, ref_data_out / "SomaticQC_out4.qcML", STRIP)


def test_target_no_tmb(ref_data_out, tmp_path, stub_ref38):
    out = run(tmp_path, "o5.qcML", "SomaticQC_in7.vcf",
              ["-target_bed", f"{TOOLS_IN}/SomaticQC_in8.bed"],
              ref=stub_ref38)
    compare_files(out, ref_data_out / "SomaticQC_out5.qcML", STRIP)
