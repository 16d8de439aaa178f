"""Coverage engine tests.

The reference goldens for BedCoverage/BedLow/HighCoverage use panel.bam,
which is not present in this mount (only its .bai is). Instead the engines
are cross-checked against an independent brute-force per-read implementation
on MappingQC_in1.bam — including the min_baseq CIGAR-quality path — plus
determinism and the tool-level output format.
"""

import numpy as np
import pytest

from helpers import execute, read_lines
from ngsbits_tpu.core.chromosome import Chromosome
from ngsbits_tpu.core.intervals import BedFile, BedLine
from ngsbits_tpu.io.bam import BamReader, CIGAR_CONSUMES_REF
from ngsbits_tpu.qc import coverage as cov

BAM = "/root/reference/src/tools-TEST/data_in/MappingQC_in1.bam"

ROI = [
    ("chr1", 152084800, 152087700),
    ("chr9", 5919600, 5921000),
    ("chr9", 27609000, 27610000),
    ("chr13", 49891400, 49893000),
    ("chr13", 51908000, 51909000),
    ("chr18", 22415400, 22418000),
]


def make_roi():
    bed = BedFile()
    for c, s, e in ROI:
        bed.append(BedLine(Chromosome(c), s, e, [b"region_" + c.encode()]))
    bed.sort()
    return bed


def brute_force_coverage(bed, bam_path, min_mapq, min_baseq=0):
    """Independent per-read implementation of the reference worker logic."""
    per_region = [np.zeros(l.length(), dtype=np.int64) for l in bed.lines]
    reader = BamReader(bam_path)
    name2num = {n: Chromosome(n).num for n in reader.ref_names}
    for batch in reader:
        ends = batch.end_positions()
        for i in range(len(batch)):
            flag = int(batch.flag[i])
            if flag & (0x400 | 0x100 | 0x800 | 0x4):
                continue
            if batch.mapq[i] < min_mapq:
                continue
            rid = batch.ref_id[i]
            if rid < 0:
                continue
            chr_num = name2num[reader.ref_names[rid]]
            a_start = int(batch.pos[i]) + 1
            a_end = int(ends[i])
            if min_baseq == 0:
                for ri, line in enumerate(bed.lines):
                    if line.chr.num != chr_num:
                        continue
                    s = max(line.start, a_start)
                    e = min(line.end, a_end)
                    if s <= e:
                        per_region[ri][s - line.start:e - line.start + 1] += 1
            else:
                # reference qualities() mapping: bits over ref span, default
                # covered; M bases with q<min_baseq excluded; D/N kept
                span = a_end - a_start + 1
                bits = np.ones(span, dtype=bool)
                quals = batch.qual_of(i)
                qi = 0
                gi = 0
                for c in batch.cigar_of(i):
                    op = c & 0xF
                    ln = int(c) >> 4
                    if op in (0, 7, 8):  # M,=,X
                        for k in range(ln):
                            if quals[qi + k] < min_baseq:
                                bits[gi + k] = False
                        qi += ln
                        gi += ln
                    elif op in (2, 3):  # D,N
                        gi += ln
                    elif op in (1, 4):  # I,S
                        qi += ln
                for ri, line in enumerate(bed.lines):
                    if line.chr.num != chr_num:
                        continue
                    s = max(line.start, a_start)
                    e = min(line.end, a_end)
                    for p in range(s, e + 1):
                        if bits[p - a_start]:
                            per_region[ri][p - line.start] += 1
    reader.close()
    return per_region


@pytest.fixture(scope="module")
def brute_q0():
    return brute_force_coverage(make_roi(), BAM, min_mapq=1, min_baseq=0)


@pytest.fixture(scope="module")
def brute_q30():
    return brute_force_coverage(make_roi(), BAM, min_mapq=20, min_baseq=30)


def test_avg_coverage_matches_brute_force(brute_q0):
    bed = make_roi()
    cov.avg_coverage(bed, BAM, min_mapq=1, threads=1, decimals=2)
    for line, bf in zip(bed.lines, brute_q0):
        expected = bf.sum() / len(bf)
        got = float(line.annotations[-1])
        assert abs(got - expected) < 0.005, (line.chr.str, line.start, got, expected)


def test_low_coverage_matches_brute_force(brute_q0):
    bed = make_roi()
    out = cov.low_or_high_coverage(bed, BAM, cutoff=20, min_mapq=1, min_baseq=0,
                                   threads=1, is_high=False)
    expected = _expected_runs(make_roi(), brute_q0, lambda c: c < 20)
    got = [(l.chr.str, l.start, l.end) for l in out.lines]
    assert got == expected


def test_high_coverage_matches_brute_force(brute_q0):
    bed = make_roi()
    out = cov.low_or_high_coverage(bed, BAM, cutoff=20, min_mapq=1, min_baseq=0,
                                   threads=1, is_high=True)
    expected = _expected_runs(make_roi(), brute_q0, lambda c: c >= 20)
    got = [(l.chr.str, l.start, l.end) for l in out.lines]
    assert got == expected


def test_low_coverage_baseq_matches_brute_force(brute_q30):
    bed = make_roi()
    out = cov.low_or_high_coverage(bed, BAM, cutoff=20, min_mapq=20, min_baseq=30,
                                   threads=1, is_high=False)
    expected = _expected_runs(make_roi(), brute_q30, lambda c: c < 20)
    got = [(l.chr.str, l.start, l.end) for l in out.lines]
    assert got == expected


def _expected_runs(bed, per_region, pred):
    """Reference post-processing: threshold runs per region then
    merge(true,true,true)."""
    out = BedFile()
    for line, bf in zip(bed.lines, per_region):
        mask = pred(bf)
        m = np.concatenate(([False], mask, [False]))
        d = np.diff(m.astype(np.int8))
        starts = np.flatnonzero(d == 1)
        ends = np.flatnonzero(d == -1) - 1
        for s, e in zip(starts, ends):
            out.append(BedLine(line.chr, line.start + int(s), line.start + int(e),
                               list(line.annotations)))
    out.merge(True, True, True)
    return [(l.chr.str, l.start, l.end) for l in out.lines]


def test_bed_coverage_tool_output_format(tmp_path):
    roi = tmp_path / "roi.bed"
    bed = make_roi()
    bed.store(str(roi))
    out = tmp_path / "out.tsv"
    assert execute("BedCoverage", ["-in", roi, "-bam", BAM, "-out", out]) == 0
    lines = read_lines(out)
    assert lines[0] == "#chr\tstart\tend\tMappingQC_in1"
    assert len(lines) == 1 + len(bed.lines)
    for l in lines[1:]:
        parts = l.split("\t")
        assert len(parts) == 5  # chr start end name coverage
        float(parts[4])


def test_bed_read_count_tool(tmp_path, brute_q0):
    roi = tmp_path / "roi.bed"
    make_roi().store(str(roi))
    out = tmp_path / "out.tsv"
    assert execute("BedReadCount", ["-in", roi, "-bam", BAM, "-out", out]) == 0
    lines = read_lines(out)
    assert lines[0] == "#chr\tstart\tend\tMappingQC_in1"
    # cross-check count for the first region with a brute force overlap count
    reader = BamReader(BAM)
    name2num = {n: Chromosome(n).num for n in reader.ref_names}
    bed = make_roi()
    counts = np.zeros(len(bed.lines), dtype=np.int64)
    for batch in reader:
        ends = batch.end_positions()
        for i in range(len(batch)):
            flag = int(batch.flag[i])
            if flag & (0x100 | 0x800 | 0x4):
                continue
            if batch.mapq[i] < 1:
                continue
            rid = batch.ref_id[i]
            if rid < 0:
                continue
            cn = name2num[reader.ref_names[rid]]
            s, e = int(batch.pos[i]) + 1, int(ends[i])
            for ri, line in enumerate(bed.lines):
                if line.chr.num == cn and line.start <= e and s <= line.end:
                    counts[ri] += 1
    reader.close()
    # merge(false) inside the tool clears annotations -> count is column 4
    got = [int(l.split("\t")[3]) for l in lines[1:]]
    assert got == counts.tolist()


def test_low_coverage_tool_headers(tmp_path):
    roi = tmp_path / "roi.bed"
    make_roi().store(str(roi))
    out = tmp_path / "low.bed"
    assert execute("BedLowCoverage", ["-in", roi, "-bam", BAM, "-cutoff", "20", "-out", out]) == 0
    lines = read_lines(out)
    assert lines[0] == "#BAM: MappingQC_in1.bam"
    assert lines[1] == "#ROI: roi.bed"
    assert lines[2].startswith("#ROI regions: ")
    assert lines[3].startswith("#ROI bases: ")
