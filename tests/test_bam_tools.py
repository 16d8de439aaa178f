"""BAM tool golden parity. BAM outputs are compared semantically (SAM-text
of my writer's output vs the htslib-written golden, both decoded by the same
reader — the BAM_TO_TEXT approach of the reference tests)."""

import gzip

import pytest

from helpers import execute
from ngsbits_tpu.io.bam import BamReader, batch_to_sam_text


def bam_text(path):
    r = BamReader(str(path))
    out = []
    for b in r:
        out += batch_to_sam_text(b, r.ref_names)
    r.close()
    return out


def cmp_gz(out, golden):
    a = gzip.decompress(open(out, "rb").read())
    b = gzip.decompress(open(golden, "rb").read())
    assert a == b


@pytest.mark.parametrize("args,g1,g2", [
    ([], "BamToFastq_out1.fastq.gz", "BamToFastq_out2.fastq.gz"),
    (["-remove_duplicates"], "BamToFastq_out3.fastq.gz", "BamToFastq_out4.fastq.gz"),
    (["-reg", "chr17:7571319-7575084"], "BamToFastq_out5.fastq.gz", "BamToFastq_out6.fastq.gz"),
])
def test_bam_to_fastq_paired(ref_data_in, ref_data_out, tmp_path, args, g1, g2):
    o1 = tmp_path / "r1.fastq.gz"
    o2 = tmp_path / "r2.fastq.gz"
    assert execute("BamToFastq", ["-in", ref_data_in / "BamToFastq_in1.bam",
                                  "-out1", o1, "-out2", o2] + args) == 0
    cmp_gz(o1, ref_data_out / g1)
    cmp_gz(o2, ref_data_out / g2)


def test_bam_to_fastq_single_end(ref_data_in, ref_data_out, tmp_path):
    o1 = tmp_path / "se.fastq.gz"
    assert execute("BamToFastq", ["-in", ref_data_in / "BamToFastq_in3.bam", "-out1", o1]) == 0
    cmp_gz(o1, ref_data_out / "BamToFastq_out7.fastq.gz")


def test_bam_filter(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "f1.bam"
    assert execute("BamFilter", ["-in", ref_data_in / "BamFilter_in1.bam", "-out", out]) == 0
    assert bam_text(out) == bam_text(ref_data_out / "BamFilter_out1.bam")
    out2 = tmp_path / "f2.bam"
    assert execute("BamFilter", ["-in", ref_data_in / "BamFilter_in2.bam", "-out", out2,
                                 "-minMQ", "50"]) == 0
    assert bam_text(out2) == bam_text(ref_data_out / "BamFilter_out2.bam")


def test_bam_downsample(ref_data_in, tmp_path):
    out = tmp_path / "d.bam"
    assert execute("BamDownsample", ["-in", ref_data_in / "BamDownsample_in1.bam",
                                     "-out", out, "-percentage", "20", "-test"]) == 0
    # RNG differs from Qt — structural check: output parses, pairs kept together
    lines = bam_text(out)
    assert 0 < len(lines) < 322
    names = [l.split("\t")[0] for l in lines]
    from collections import Counter
    assert all(v <= 2 for v in Counter(names).values())


def test_bam_extract_roundtrip(ref_data_in, tmp_path):
    # panel.bam fixture is missing — extract from another BAM and verify
    src = ref_data_in / "BamFilter_in1.bam"
    full = bam_text(src)
    pick = sorted({l.split("\t")[0] for l in full})[:5]
    ids = tmp_path / "ids.txt"
    ids.write_text("".join(n + "\n" for n in pick))
    out = tmp_path / "e1.bam"
    out2 = tmp_path / "e2.bam"
    assert execute("BamExtract", ["-in", src, "-ids", ids, "-out", out, "-out2", out2]) == 0
    kept = bam_text(out)
    rest = bam_text(out2)
    assert len(kept) + len(rest) == len(full)
    assert all(l.split("\t")[0] in pick for l in kept)
    assert not any(l.split("\t")[0] in pick for l in rest)


def test_bam_info(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "i.tsv"
    assert execute("BamInfo", ["-in", ref_data_in / "MappingQC_in1.bam", "-name", "-out", out]) == 0
    lines = out.read_text().splitlines()
    assert lines[0].startswith("#filename")
    assert lines[1].startswith("MappingQC_in1.bam\tBAM\thg38")


@pytest.mark.parametrize("n,extra,clipped", [
    ("1", [], 256), ("2", [], 42), ("3", [], 434), ("5", [], 5624),
    ("4", ["-overlap_mismatch_basen"], 446),
])
def test_bam_clip_overlap(ref_data_in, tmp_path, capsys, n, extra, clipped):
    # reference tests are smoke tests without golden comparison; we pin the
    # softclip statistics and verify the output BAM parses with all reads
    out = tmp_path / "c.bam"
    assert execute("BamClipOverlap", ["-in", ref_data_in / f"BamClipOverlap_in{n}.bam",
                                      "-out", out] + extra) == 0
    err = capsys.readouterr().err
    assert f"Softclipped {clipped} of" in err
    n_in = sum(1 for _ in bam_text(ref_data_in / f"BamClipOverlap_in{n}.bam"))
    lines = bam_text(out)
    assert len(lines) == n_in


def test_bam_remove_variants(ref_data_in, ref_data_out, tmp_path, capsys):
    out = tmp_path / "rv.bam"
    assert execute("BamRemoveVariants",
                   ["-in", ref_data_in / "BamRemoveVariants_in1.bam",
                    "-vcf", ref_data_in / "BamRemoveVariants_in1.vcf.gz",
                    "-out", out]) == 0
    assert bam_text(out) == bam_text(ref_data_out / "BamRemoveVariants_out1.bam")
    assert "pairs passed: 7933" in capsys.readouterr().out
