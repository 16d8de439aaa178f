"""BEDPE tool golden parity (reference: src/tools-TEST/Bedpe*_Test.cpp).
BedpeExtractGenotype out3 golden is absent from the reference checkout."""

import pytest

from helpers import execute, compare_files


def test_bedpe_sort(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "s.bedpe"
    assert execute("BedpeSort", ["-in", ref_data_in / "BedpeSort_in1.bedpe",
                                 "-out", out]) == 0
    compare_files(out, ref_data_out / "BedpeSort_out1.bedpe")


def test_bedpe_to_bed(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "t.bed"
    assert execute("BedpeToBed", ["-in", ref_data_in / "BedpeToBed_in1.bedpe",
                                  "-out", out]) == 0
    compare_files(out, ref_data_out / "BedpeToBed_out1.bed")


def test_bedpe_filter(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "f.bedpe"
    assert execute("BedpeFilter", ["-in", ref_data_in / "BedpeFilter_in1.bedpe",
                                   "-bed", ref_data_in / "BedpeFilter_in.bed",
                                   "-out", out]) == 0
    compare_files(out, ref_data_out / "BedpeFilter_out1.bedpe")


@pytest.mark.parametrize("inf,bed,extra,golden", [
    ("in1", "bed", ["-url_decode", "-col_name", "OMIM"], "out1"),
    ("in1", "bed", ["-url_decode", "-col_name", "OMIM", "-replace_underscore"], "out2"),
    ("in2", "bed", ["-url_decode", "-col_name", "OMIM", "-replace_underscore"], "out2"),
    ("in3", "bed_int", ["-col_name", "LIST", "-no_duplicates"], "out3"),
    ("in3", "bed_int", ["-max_value", "-col_name", "INTEGER"], "out4"),
    ("in3", "bed_double", ["-max_value", "-col_name", "DOUBLE"], "out5"),
    ("in3", "bed_int", ["-max_value", "-col_name", "INTEGER", "-only_breakpoints"], "out6"),
])
def test_bedpe_annotate_from_bed(ref_data_in, ref_data_out, tmp_path, inf, bed, extra, golden):
    out = tmp_path / "a.bedpe"
    assert execute("BedpeAnnotateFromBed",
                   ["-in", ref_data_in / f"BedpeAnnotateFromBed_{inf}.bedpe",
                    "-bed", ref_data_in / f"BedpeAnnotateFromBed_{bed}.bed",
                    "-out", out] + extra) == 0
    compare_files(out, ref_data_out / f"BedpeAnnotateFromBed_{golden}.bedpe")


@pytest.mark.parametrize("inf,extra,golden", [
    ("in1", [], "out1"),
    ("in1", ["-include_unphased"], "out2"),
    ("in3", ["-include_unphased"], "out4"),
])
def test_bedpe_extract_genotype(ref_data_in, ref_data_out, tmp_path, inf, extra, golden):
    out = tmp_path / "g.bedpe"
    assert execute("BedpeExtractGenotype",
                   ["-in", ref_data_in / f"BedpeExtractGenotype_{inf}.bedpe",
                    "-out", out] + extra) == 0
    compare_files(out, ref_data_out / f"BedpeExtractGenotype_{golden}.bedpe")


@pytest.mark.parametrize("inf,extra,golden", [
    ("in1", [], "out1"),
    ("in2", ["-info_column", "CUSTOM_INFO_COLUMN"], "out2"),
])
def test_bedpe_extract_info_field(ref_data_in, ref_data_out, tmp_path, inf, extra, golden):
    out = tmp_path / "i.bedpe"
    assert execute("BedpeExtractInfoField",
                   ["-in", ref_data_in / f"BedpeExtractInfoField_{inf}.bedpe",
                    "-info_fields", "END:SV_END,SUPPORT,AF:allele_frequency,PRECISE",
                    "-out", out] + extra) == 0
    compare_files(out, ref_data_out / f"BedpeExtractInfoField_{golden}.bedpe")


def test_bedpe_annotate_cnv_overlap(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "c.bedpe"
    assert execute("BedpeAnnotateCnvOverlap",
                   ["-in", ref_data_in / "BedpeAnnotateCnvOverlap_in1.bedpe",
                    "-cnv", ref_data_in / "BedpeAnnotateCnvOverlap_in_cnv.tsv",
                    "-out", out]) == 0
    compare_files(out, ref_data_out / "BedpeAnnotateCnvOverlap_out1.bedpe")
