"""Golden/behavior tests for tools that lacked direct coverage:
VcfFilter, VcfCheck, TsvMerge, VcfLeftNormalize, BedAnnotateGC, BedToFasta,
NgsBitsInfo (mirroring the corresponding tools-TEST suites; genome-dependent
validation steps are replaced by synthetic mini-FASTAs since no hg38 FASTA
ships in this environment — the reference CI also skips those without one).
"""

import pathlib

import pytest

from helpers import compare_files, execute

DATA_IN = pathlib.Path("/root/reference/src/tools-TEST/data_in")
DATA_OUT = pathlib.Path("/root/reference/src/tools-TEST/data_out")


@pytest.mark.parametrize("out_name,extra", [
    ("VcfFilter_out01.vcf", ["-reg", str(DATA_IN / "VcfFilter_roi.bed")]),
    ("VcfFilter_out02.vcf", ["-reg", "chr1:27687466-62728838,chr1:62728861-62739198"]),
    ("VcfFilter_out03.vcf", ["-variant_type", "snp"]),
    ("VcfFilter_out04.vcf", ["-id", "rs2"]),
    ("VcfFilter_out05.vcf", ["-qual", "3000"]),
    ("VcfFilter_out06.vcf", ["-filter_empty"]),
    ("VcfFilter_out07.vcf", ["-filter", "off-target"]),
    ("VcfFilter_out08.vcf", ["-info", "DP > 100;AO > 5"]),
    ("VcfFilter_out09.vcf", ["-sample", "GT is 1|1;DP > 200"]),
])
def test_vcf_filter_in01(tmp_path, out_name, extra):
    out = tmp_path / out_name
    assert execute("VcfFilter", ["-in", DATA_IN / "VcfFilter_in01.vcf",
                                 "-out", out] + extra) == 0
    compare_files(out, DATA_OUT / out_name)


def test_vcf_filter_exclude_and_multisample(tmp_path):
    out = tmp_path / "out12.vcf"
    assert execute("VcfFilter", ["-in", DATA_IN / "VcfFilter_in01.vcf",
                                 "-out", out, "-filter_exclude", "off-target"]) == 0
    compare_files(out, DATA_OUT / "VcfFilter_out06.vcf")

    out = tmp_path / "out13.vcf"
    assert execute("VcfFilter", ["-in", DATA_IN / "VcfFilter_in01.vcf",
                                 "-out", out, "-filter", "off-target",
                                 "-filter_exclude", "test"]) == 0
    compare_files(out, DATA_OUT / "VcfFilter_out13.vcf")

    out = tmp_path / "out10.vcf"
    assert execute("VcfFilter", ["-in", DATA_IN / "VcfFilter_in02.vcf.gz",
                                 "-out", out, "-sample", "GT is 1|1;DP > 200"]) == 0
    compare_files(out, DATA_OUT / "VcfFilter_out10.vcf")

    out = tmp_path / "out11.vcf"
    assert execute("VcfFilter", ["-in", DATA_IN / "VcfFilter_in02.vcf.gz",
                                 "-out", out, "-sample", "GT is 1|1;DP > 200",
                                 "-sample_one_match"]) == 0
    compare_files(out, DATA_OUT / "VcfFilter_out11.vcf")


def test_vcf_filter_remove_invalid_nonref_flags(tmp_path):
    for out_name, extra in [
        ("VcfFilter_out15.vcf", ["-remove_non_ref"]),
        ("VcfFilter_out16.vcf", ["-remove_non_ref", "-filter_clear"]),
    ]:
        out = tmp_path / out_name
        assert execute("VcfFilter", ["-in", DATA_IN / "VcfFilter_in03.vcf",
                                     "-out", out] + extra) == 0
        compare_files(out, DATA_OUT / out_name)
    for out_name, extra in [
        ("VcfFilter_out17.vcf", ["-info_flags", "TARGETED,MOSAIC"]),
        ("VcfFilter_out18.vcf", ["-info_flags_exclude", "MOSAIC"]),
    ]:
        out = tmp_path / out_name
        assert execute("VcfFilter", ["-in", DATA_IN / "VcfFilter_in04.vcf",
                                     "-out", out] + extra) == 0
        compare_files(out, DATA_OUT / out_name)


def test_vcf_filter_bugfix_tab(tmp_path):
    out = tmp_path / "bug01.vcf"
    assert execute("VcfFilter", ["-in", DATA_IN / "VcfFilter_bug01.vcf",
                                 "-out", out, "-sample", "GT not ./0"]) == 0
    compare_files(out, DATA_OUT / "VcfFilter_bug01.vcf")


@pytest.fixture
def stub_hg19(tmp_path):
    # empty FASTA + real .fai: ref-base checks yield warnings (stripped below)
    # since no genome FASTA ships in this environment
    import shutil
    ref = tmp_path / "hg19.fa"
    ref.write_bytes(b"")
    shutil.copy(str(DATA_IN / "hg19.fa.fai"), str(ref) + ".fai")
    return str(ref)


# stub genome produces 'Reference base(s) not correct' warnings (2 lines each:
# message + echoed variant line) that the real hg38 run doesn't have
VCFCHECK_STRIP = (r"^WARNING: Reference base", r"^chr")


def test_vcf_check(tmp_path, stub_hg19):
    out = tmp_path / "check1.txt"
    assert execute("VcfCheck", ["-in", DATA_IN / "VcfCheck_in1.vcf",
                                "-out", out, "-ref", stub_hg19]) == 0
    compare_files(out, DATA_OUT / "VcfCheck_out1.txt",
                  strip_patterns=VCFCHECK_STRIP)

    out = tmp_path / "check2.txt"
    assert execute("VcfCheck", ["-in", DATA_IN / "VcfCheck_in1.vcf",
                                "-out", out, "-info", "-lines", "200",
                                "-ref", stub_hg19]) == 0
    compare_files(out, DATA_OUT / "VcfCheck_out2.txt",
                  strip_patterns=VCFCHECK_STRIP)

    # gz input equals plain output
    out = tmp_path / "check4.txt"
    assert execute("VcfCheck", ["-in", DATA_IN / "VcfCheck_in1.vcf.gz",
                                "-out", out, "-ref", stub_hg19]) == 0
    compare_files(out, DATA_OUT / "VcfCheck_out1.txt",
                  strip_patterns=VCFCHECK_STRIP)

    # with warnings (variant lines stripped like the reference test)
    out = tmp_path / "check3.txt"
    assert execute("VcfCheck", ["-in", DATA_IN / "VcfCheck_in2.vcf",
                                "-out", out, "-ref", stub_hg19]) == 0
    compare_files(out, DATA_OUT / "VcfCheck_out3.txt",
                  strip_patterns=VCFCHECK_STRIP)


@pytest.mark.parametrize("out_name,args", [
    ("TsvMerge_out1.tsv", ["-cols", "1,2,3", "-numeric",
                           "-in", str(DATA_IN / "TsvMerge_in1.tsv"),
                           str(DATA_IN / "TsvMerge_in2.tsv")]),
    ("TsvMerge_out2.tsv", ["-cols", "chr,start,end", "-mv", "missing",
                           "-in", str(DATA_IN / "TsvMerge_in1.tsv"),
                           str(DATA_IN / "TsvMerge_in2.tsv"),
                           str(DATA_IN / "TsvMerge_in3.tsv")]),
    ("TsvMerge_out3.tsv", ["-cols", "chr,start,end", "-simple",
                           "-in", str(DATA_IN / "TsvMerge_in1.tsv"),
                           str(DATA_IN / "TsvMerge_in4.tsv"),
                           str(DATA_IN / "TsvMerge_in5.tsv")]),
])
def test_tsv_merge(tmp_path, out_name, args):
    out = tmp_path / out_name
    assert execute("TsvMerge", args + ["-out", str(out)]) == 0
    compare_files(out, DATA_OUT / out_name)


@pytest.fixture
def mini_ref(tmp_path):
    # chrM: 60bp with a deterministic pattern including repeats for
    # normalization shifts
    seq = "ACGTACGTAAAAAATTTTTCCCCCGGGGGACACACACGTGTGTGTACGTACGTACGTACG"
    fa = tmp_path / "mini.fa"
    fa.write_text(">chrM\n" + seq + "\n")
    fai = tmp_path / "mini.fa.fai"
    fai.write_text(f"chrM\t{len(seq)}\t6\t{len(seq)}\t{len(seq) + 1}\n")
    return str(fa), seq


def test_vcf_left_normalize(tmp_path, mini_ref):
    ref, seq = mini_ref
    # deletion of one 'A' in the AAAAAA run (pos 9-14, 1-based): right-most
    # representation shifts left to pos 8 (anchor 'A' at 1-based 8? anchor T)
    vcf_in = tmp_path / "in.vcf"
    vcf_in.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chrM\t13\t.\tAA\tA\t30\tPASS\t.\n"       # del in homopolymer
        "chrM\t20\t.\tT\tT\t30\tPASS\t.\n"        # ref==alt stays
    )
    out = tmp_path / "out.vcf"
    assert execute("VcfLeftNormalize", ["-in", vcf_in, "-out", out,
                                        "-ref", ref]) == 0
    lines = [l for l in out.read_text().splitlines() if not l.startswith("#")]
    pos, _, ref_a, alt_a = lines[0].split("\t")[1:5]
    # homopolymer A run starts at 1-based 9; left-aligned deletion anchors at 8
    assert (pos, ref_a, alt_a) == ("8", "TA", "T")


def test_bed_annotate_gc_and_to_fasta(tmp_path, mini_ref):
    ref, seq = mini_ref
    bed = tmp_path / "in.bed"
    bed.write_text("chrM\t0\t8\nchrM\t8\t14\nchrM\t29\t37\n")
    out = tmp_path / "gc.bed"
    assert execute("BedAnnotateGC", ["-in", bed, "-out", out, "-ref", ref]) == 0
    rows = [l.split("\t") for l in out.read_text().splitlines()]
    assert rows[0][3] == "0.5000"     # ACGTACGT
    assert rows[1][3] == "0.0000"     # AAAAAA
    gc = seq[29:37].count("G") + seq[29:37].count("C")
    assert rows[2][3] == f"{gc / 8:.4f}"

    fa_out = tmp_path / "out.fa"
    assert execute("BedToFasta", ["-in", bed, "-out", fa_out, "-ref", ref]) == 0
    text = fa_out.read_text()
    assert ">chrM:1-8" in text and "ACGTACGT" in text
    assert seq[8:14] in text


def test_ngsbits_info(capsys):
    assert execute("NgsBitsInfo", []) == 0
    out = capsys.readouterr().out
    assert "ngs-bits" in out.lower() or "ngsbits" in out.lower()
