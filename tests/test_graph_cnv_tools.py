"""Golden parity for GraphStringDb, GenePrioritization (flooding + random-walk
rank correlation, like the reference test), CnvReferenceCohort, and
BedpeAnnotateBreakpointDensity."""

import numpy as np
import pytest

from helpers import compare_files, execute, read_lines


def test_graph_string_db(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "out.tsv"
    assert execute("GraphStringDb", [
        "-string", ref_data_in / "GraphStringDb_in.txt",
        "-alias", ref_data_in / "GraphStringDb_alias.tsv", "-out", out]) == 0
    compare_files(out, ref_data_out / "GraphStringDb_out.tsv")


def test_gene_prioritization_flooding(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "out1.tsv"
    assert execute("GenePrioritization", [
        "-in", ref_data_in / "GenePrioritization_in.tsv",
        "-graph", ref_data_in / "GenePrioritization_graph.tsv",
        "-out", out, "-method", "flooding"]) == 0
    compare_files(out, ref_data_out / "GenePrioritization_out1.tsv")


def test_gene_prioritization_random_walk(ref_data_in, ref_data_out, tmp_path):
    # RNG differs from the reference (platform-specific there too); the
    # reference test itself checks rank-score correlation > 0.95
    out = tmp_path / "out2.tsv"
    assert execute("GenePrioritization", [
        "-in", ref_data_in / "GenePrioritization_in.tsv",
        "-graph", ref_data_in / "GenePrioritization_graph.tsv",
        "-out", out, "-method", "random_walk"]) == 0

    def score_map(path):
        return {l.split("\t")[0]: float(l.split("\t")[1])
                for l in read_lines(path) if l.startswith("HGNC:")}

    expected = score_map(ref_data_out / "GenePrioritization_out2.tsv")
    ours = score_map(out)
    genes = sorted(expected)
    assert all(g in ours for g in genes)
    corr = np.corrcoef([expected[g] for g in genes], [ours[g] for g in genes])[0, 1]
    assert corr > 0.95


def test_cnv_reference_cohort(ref_data_in, ref_data_out, tmp_path, capsys):
    out = tmp_path / "out.tsv"
    assert execute("CnvReferenceCohort", [
        "-in", ref_data_in / "CnvReferenceCohort_in.cov",
        "-in_ref"] + [ref_data_in / f"CnvReferenceCohort_in_ref{i}.cov{s}"
                      for i, s in ((1, ""), (2, ""), (3, ".gz"), (4, ".gz"), (5, ".gz"))]
        + ["-exclude"] + [ref_data_in / f"CnvReferenceCohort_exclude{i}.bed" for i in (1, 2, 3)]
        + ["-out", out, "-cov_max", "3"]) == 0
    compare_files(out, ref_data_out / "CnvReferenceCohort_test01_out.tsv")
    log = capsys.readouterr().out
    golden_log = open("/root/reference/src/tools-TEST/data_out/CnvReferenceCohort_out.log").read()
    assert log == golden_log


@pytest.mark.parametrize("n,extra", [(1, []), (2, ["-density_sys"])])
def test_bedpe_breakpoint_density(ref_data_in, ref_data_out, tmp_path, n, extra):
    out = tmp_path / f"out{n}.bedpe"
    args = ["-in", ref_data_in / "BedpeAnnotateBreakpointDensity_in1.bedpe",
            "-density", ref_data_in / "BedpeAnnotateBreakpointDensity_density.igv",
            "-out", out]
    if extra:
        args += ["-density_sys",
                 ref_data_in / "BedpeAnnotateBreakpointDensity_density_sys.igv"]
    assert execute("BedpeAnnotateBreakpointDensity", args) == 0
    compare_files(out, ref_data_out / f"BedpeAnnotateBreakpointDensity_out{n}.bedpe")
