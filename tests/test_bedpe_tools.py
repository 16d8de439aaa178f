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
def _mk_bedpe(path, sample, rows):
    header = ["##fileformat=BEDPE",
              "#CHROM_A\tSTART_A\tEND_A\tCHROM_B\tSTART_B\tEND_B\tTYPE\tFORMAT\t" + sample]
    lines = []
    for chrom1, s1, e1, chrom2, s2, e2, t, gt in rows:
        lines.append(f"{chrom1}\t{s1}\t{e1}\t{chrom2}\t{s2}\t{e2}\t{t}\tGT\t{gt}")
    path.write_text("\n".join(header + lines) + "\n")


def test_bedpe_trio_analysis(tmp_path):
    from helpers import execute
    index = tmp_path / "index.bedpe"
    father = tmp_path / "father.bedpe"
    mother = tmp_path / "mother.bedpe"
    _mk_bedpe(index, "child", [
        ("chr1", 100, 200, "chr1", 500, 600, "DEL", "0/1"),
        ("chr2", 100, 200, "chr2", 900, 950, "DUP", "1/1"),
    ])
    _mk_bedpe(father, "dad", [
        ("chr1", 120, 180, "chr1", 520, 580, "DEL", "0/1"),   # fuzzy match to index DEL
        ("chr3", 10, 20, "chr3", 100, 110, "INV", "1/1"),     # father only
    ])
    _mk_bedpe(mother, "mum", [
        ("chr2", 150, 210, "chr2", 920, 980, "DUP", "0/1"),   # fuzzy match to index DUP
    ])
    out = tmp_path / "out.bedpe"
    assert execute("BedpeTrioAnalysis", ["-index", index, "-father", father,
                                         "-mother", mother, "-out", out]) == 0
    lines = [l for l in out.read_text().splitlines() if not l.startswith("#")]
    assert len(lines) == 3
    by_key = {l.split("\t")[0] + ":" + l.split("\t")[1]: l.split("\t")[6:9] for l in lines}
    assert by_key["chr1:100"] == ["het", "het", "wt"]      # index + father
    assert by_key["chr2:100"] == ["hom", "wt", "het"]      # index + mother
    assert by_key["chr3:10"] == ["wt", "hom", "wt"]        # father only
    header = [l for l in out.read_text().splitlines() if l.startswith("#CHROM_A")][0]
    assert "\tindex\tfather\tmother\t" in header

