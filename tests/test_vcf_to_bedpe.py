"""VcfToBedpe golden parity (reference: src/tools-TEST/VcfToBedpe_Test.cpp)."""

import pytest

from helpers import execute, compare_files

CASES = [
    ("VcfToBedpe_in1_manta.vcf.gz", "VcfToBedpe_out1_manta.bedpe", True),
    ("VcfToBedpe_in1_manta.vcf.gz", "VcfToBedpe_out2_manta.bedpe", False),
    ("VcfToBedpe_in2_manta.vcf.gz", "VcfToBedpe_out3_manta.bedpe", False),
    ("VcfToBedpe_in1_delly.vcf.gz", "VcfToBedpe_out1_delly.bedpe", True),
    ("VcfToBedpe_in1_delly.vcf.gz", "VcfToBedpe_out2_delly.bedpe", False),
    ("VcfToBedpe_in3_sniffles.vcf.gz", "VcfToBedpe_out1_sniffles.bedpe", True),
    ("VcfToBedpe_in4_cutesv.vcf.gz", "VcfToBedpe_out1_cutesv.bedpe", True),
    ("VcfToBedpe_in5_dipdiff.vcf.gz", "VcfToBedpe_out1_dipdiff.bedpe", True),
    ("VcfToBedpe_in6_dragen_ambigous_bug.vcf",
     "VcfToBedpe_out_bug_dragen_ambigous_format_entries.bedpe", True),
]


@pytest.mark.parametrize("inf,golden,no_sort", CASES)
def test_vcf_to_bedpe(ref_data_in, ref_data_out, tmp_path, inf, golden, no_sort):
    out = tmp_path / "o.bedpe"
    args = ["-in", ref_data_in / inf, "-out", out]
    if no_sort:
        args.append("-no_sort")
    assert execute("VcfToBedpe", args) == 0
    compare_files(out, ref_data_out / golden, (r"##fileDate=",))
