"""FilterCascade tools golden parity (reference: src/tools-TEST/
VariantFilterAnnotations_Test.cpp, SvFilterAnnotations_Test.cpp,
CnvFilterAnnotations_Test.cpp)."""

import pytest

from helpers import execute, compare_files


@pytest.mark.parametrize("i", [1, 2, 3, 4, 5])
def test_variant_filter_annotations_single(ref_data_in, ref_data_out, tmp_path, i):
    out = tmp_path / "o.GSvar"
    assert execute("VariantFilterAnnotations",
                   ["-in", ref_data_in / "VariantFilterAnnotations_in.GSvar",
                    "-filters", ref_data_in / f"VariantFilterAnnotations_filters{i}.txt",
                    "-out", out]) == 0
    compare_files(out, ref_data_out / f"VariantFilterAnnotations_out{i}.GSvar")


@pytest.mark.parametrize("i", [6, 7, 8])
def test_variant_filter_annotations_multi(ref_data_in, ref_data_out, tmp_path, i):
    out = tmp_path / "o.GSvar"
    assert execute("VariantFilterAnnotations",
                   ["-in", ref_data_in / "VariantFilterAnnotations_in_multi.GSvar",
                    "-filters", ref_data_in / f"VariantFilterAnnotations_filters{i}.txt",
                    "-out", out]) == 0
    compare_files(out, ref_data_out / f"VariantFilterAnnotations_out{i}.GSvar")


@pytest.mark.parametrize("i", [1, 2, 3, 4])
def test_sv_filter_annotations(ref_data_in, ref_data_out, tmp_path, i):
    out = tmp_path / "o.bedpe"
    assert execute("SvFilterAnnotations",
                   ["-in", ref_data_in / "SvFilterAnnotations_in1.bedpe",
                    "-filters", ref_data_in / f"SvFilterAnnotations_filters{i}.txt",
                    "-out", out]) == 0
    golden = (ref_data_in / "SvFilterAnnotations_in1.bedpe" if i == 1
              else ref_data_out / f"SvFilterAnnotations_out{i}.bedpe")
    compare_files(out, golden)


@pytest.mark.parametrize("i", [1, 2, 3, 4])
def test_cnv_filter_annotations(ref_data_in, ref_data_out, tmp_path, i):
    out = tmp_path / "o.tsv"
    assert execute("CnvFilterAnnotations",
                   ["-in", ref_data_in / "CnvFilterAnnotations_in1.tsv",
                    "-filters", ref_data_in / f"CnvFilterAnnotations_filters{i}.txt",
                    "-out", out]) == 0
    golden = (ref_data_in / "CnvFilterAnnotations_in1.tsv" if i == 1
              else ref_data_out / f"CnvFilterAnnotations_out{i}.tsv")
    compare_files(out, golden)
