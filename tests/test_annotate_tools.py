"""Golden parity: BedAnnotateFromBed, TsvTo, TsvDiff; structural check for
BedAnnotateFreq (its golden needs the absent panel.bam fixture)."""

import pytest

from helpers import execute, compare_files


@pytest.mark.parametrize("inf,db,extra,golden", [
    ("BedAnnotateFromBed_in1.bed", "BedAnnotateFromBed_db1.bed",
     ["-no_duplicates"], "BedAnnotateFromBed_out1.bed"),
    ("BedAnnotateFromBed_in2.bed", "BedAnnotateFromBed_db1.bed",
     ["-col", "5", "-no_duplicates"], "BedAnnotateFromBed_out2.bed"),
    ("BedAnnotateFromBed_in2.bed", "BedAnnotateFromBed_db1.bed",
     ["-clear", "-col", "5"], "BedAnnotateFromBed_out3.bed"),
    ("BedAnnotateFromBed_in3.tsv", "BedAnnotateFromBed_db1.bed",
     ["-no_duplicates", "-name", "tsv_header"], "BedAnnotateFromBed_out4.tsv"),
    ("BedAnnotateFromBed_in3.bed", "BedAnnotateFromBed_db1.bed",
     ["-overlap", "-no_duplicates"], "BedAnnotateFromBed_out5.bed"),
    ("BedAnnotateFromBed_in1.bed", "BedAnnotateFromBed_db2.bed",
     ["-url_decode", "-no_duplicates"], "BedAnnotateFromBed_out6.bed"),
    ("BedAnnotateFromBed_in8.tsv", "BedAnnotateFromBed_db1.bed",
     ["-overlap", "-no_duplicates", "-name", "tsv_header"], "BedAnnotateFromBed_out8.tsv"),
])
def test_bed_annotate_from_bed(ref_data_in, ref_data_out, tmp_path, inf, db, extra, golden):
    out = tmp_path / ("o" + golden[-4:])
    assert execute("BedAnnotateFromBed", ["-in", ref_data_in / inf,
                                          "-in2", ref_data_in / db,
                                          "-out", out] + extra) == 0
    compare_files(out, ref_data_out / golden)


@pytest.mark.parametrize("fmt,golden", [
    ("html", "TsvTo_out1.html"), ("txt", "TsvTo_out2.txt"), ("md", "TsvTo_out3.md"),
])
def test_tsv_to(ref_data_in, ref_data_out, tmp_path, fmt, golden):
    out = tmp_path / ("o." + fmt)
    assert execute("TsvTo", ["-in", ref_data_in / "TsvTo_in1.tsv",
                             "-format", fmt, "-out", out]) == 0
    compare_files(out, ref_data_out / golden)


@pytest.mark.parametrize("in2,extra,golden,rc", [
    ("TsvDiff_in1.tsv", [], "TsvDiff_out1.txt", 0),
    ("TsvDiff_in2.tsv", ["-no_error"], "TsvDiff_out2.txt", 0),
    ("TsvDiff_in2.tsv", ["-skip_comments_matching", "insert1,bla", "-no_error"],
     "TsvDiff_out3.txt", 0),
    ("TsvDiff_in2.tsv", ["-comp", "chr,start,end,ref,obs", "-no_error"],
     "TsvDiff_out4.txt", 0),
    ("TsvDiff_in3.tsv", ["-skip_cols", "snp_q,depth", "-no_error"],
     "TsvDiff_out5.txt", 0),
    ("TsvDiff_in2.tsv", ["-diff_abs", "depth=1,snp_q=3", "-no_error"],
     "TsvDiff_out6.txt", 0),
])
def test_tsv_diff(ref_data_in, ref_data_out, tmp_path, in2, extra, golden, rc):
    out = tmp_path / "d.txt"
    assert execute("TsvDiff", ["-in1", ref_data_in / "TsvDiff_in1.tsv",
                               "-in2", ref_data_in / in2,
                               "-out", out] + extra) == rc
    compare_files(out, ref_data_out / golden)


def test_tsv_diff_in4_in5(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "d7.txt"
    assert execute("TsvDiff", ["-in1", ref_data_in / "TsvDiff_in4.tsv",
                               "-in2", ref_data_in / "TsvDiff_in5.tsv",
                               "-out", out, "-no_error"]) == 0
    compare_files(out, ref_data_out / "TsvDiff_out7.txt")


def test_tsv_diff_exit_code(ref_data_in, tmp_path):
    # without -no_error, differences set a non-zero exit state
    out = tmp_path / "d.txt"
    assert execute("TsvDiff", ["-in1", ref_data_in / "TsvDiff_in1.tsv",
                               "-in2", ref_data_in / "TsvDiff_in2.tsv",
                               "-out", out]) == 1


def test_bed_annotate_freq_structural(ref_data_in, tmp_path):
    # golden needs the absent panel.bam; cross-check one locus against the
    # value the somatic engine derived from the same BAM (24 A / 20 C)
    bed = tmp_path / "l.bed"
    bed.write_text("chr1\t40777371\t40777372\n")
    out = tmp_path / "f.tsv"
    assert execute("BedAnnotateFreq", ["-in", bed,
                                       "-bam", ref_data_in / "SomaticQC_in1_tum.bam",
                                       "-out", out]) == 0
    lines = out.read_text().splitlines()
    assert lines[0] == "#chr\tstart\tend\tsample\tA\tC\tG\tT\ttotal"
    assert lines[1] == "chr1:40777372-40777372\tSomaticQC_in1_tum\t24\t20\t0\t0\t44"
