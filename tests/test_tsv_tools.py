"""TSV tool golden parity (Tsv*_Test.cpp)."""

import pytest

from helpers import compare_files, execute


def test_tsv_info(ref_data_in, ref_data_out, tmp_path):
    for n in (1, 2):
        out = tmp_path / f"i{n}.txt"
        assert execute("TsvInfo", ["-in", ref_data_in / f"TsvInfo_in{n}.tsv", "-out", out]) == 0
        compare_files(out, ref_data_out / f"TsvInfo_out{n}.txt")


def test_tsv_slice(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "s1.tsv"
    assert execute("TsvSlice", ["-cols", "chr,start,end,ref,obs,snp_q,variant_frequency,sample",
                                "-in", ref_data_in / "TsvSlice_in1.tsv", "-out", out]) == 0
    compare_files(out, ref_data_out / "TsvSlice_out1.tsv")
    out2 = tmp_path / "s1n.tsv"
    assert execute("TsvSlice", ["-numeric", "-cols", "1,2,3,4,5,7,11,22",
                                "-in", ref_data_in / "TsvSlice_in1.tsv", "-out", out2]) == 0
    compare_files(out2, ref_data_out / "TsvSlice_out1.tsv")
    out3 = tmp_path / "s2.tsv"
    assert execute("TsvSlice", ["-rm", "-cols", "snp_q,variant_frequency",
                                "-in", ref_data_in / "TsvSlice_in1.tsv", "-out", out3]) == 0
    compare_files(out3, ref_data_out / "TsvSlice_out2.tsv")


@pytest.mark.parametrize("n,filt,extra", [
    (1, "depth >= 205", []),
    (2, "depth > 205", []),
    (3, "depth = 205", []),
    (4, "snp_q > 186", []),
    (5, "snp_q >= 186", []),
    (6, "ref is -", []),
    (7, "obs contains CT", []),
    (8, "genotype is hom", ["-v"]),
])
def test_tsv_filter(ref_data_in, ref_data_out, tmp_path, n, filt, extra):
    out = tmp_path / f"f{n}.tsv"
    assert execute("TsvFilter", ["-filter", filt, "-in", ref_data_in / "TsvFilter_in1.tsv",
                                 "-out", out] + extra) == 0
    compare_files(out, ref_data_out / f"TsvFilter_out{n}.tsv")
