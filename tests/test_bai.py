"""BAI index + region iteration (io/bai.py, BamReader.region_batches)."""

import numpy as np
import pytest

from ngsbits_tpu.io.bai import BaiIndex, find_index
from ngsbits_tpu.io.bam import BamReader


@pytest.fixture
def indexed_bam(ref_data_in):
    import os
    p = str(ref_data_in / "BamClipOverlap_in1.bam")
    if not os.path.exists(p + ".bai"):
        pytest.skip("fixture index missing")
    return p


def test_bai_parses(indexed_bam):
    idx = BaiIndex(find_index(indexed_bam))
    assert idx.n_refs() > 0
    assert any(idx.bins[r] for r in range(idx.n_refs()))


def test_region_matches_full_scan(indexed_bam):
    reader = BamReader(indexed_bam)
    # pick a region around the median mapped position of some reference
    all_recs = {}
    rid_pick, lo, hi = None, None, None
    for batch in reader:
        for i in range(len(batch)):
            rid = int(batch.ref_id[i])
            if rid < 0 or (batch.flag[i] & 0x4):
                continue
            all_recs.setdefault(rid, []).append(
                (int(batch.pos[i]), batch.name(i), int(batch.flag[i])))
    reader.close()
    rid_pick = max(all_recs, key=lambda r: len(all_recs[r]))
    positions = sorted(p for p, _, _ in all_recs[rid_pick])
    lo = positions[len(positions) // 4] + 1      # 1-based
    hi = positions[3 * len(positions) // 4] + 1

    reader = BamReader(indexed_bam)
    chrom = reader.ref_names[rid_pick]
    got = []
    for batch, mask in reader.region_batches(chrom, lo, hi):
        ends = batch.end_positions()
        for i in np.flatnonzero(mask):
            got.append((int(batch.pos[i]), batch.name(i), int(batch.flag[i])))
            assert int(batch.pos[i]) <= hi - 1
            assert int(ends[i]) > lo - 1
    reader.close()

    # expected: same overlap filter over the full scan
    reader = BamReader(indexed_bam)
    expected = []
    for batch in reader:
        ends = batch.end_positions()
        for i in range(len(batch)):
            if (int(batch.ref_id[i]) == rid_pick
                    and int(batch.pos[i]) <= hi - 1 and int(ends[i]) > lo - 1):
                expected.append((int(batch.pos[i]), batch.name(i),
                                 int(batch.flag[i])))
    reader.close()
    assert got == expected and len(got) > 0


def test_subset_roundtrip(indexed_bam):
    reader = BamReader(indexed_bam)
    batch = reader.read_batch()
    reader.close()
    mask = np.zeros(len(batch), dtype=bool)
    mask[::3] = True
    sub = batch.subset(mask)
    idx = np.flatnonzero(mask)
    assert len(sub) == len(idx)
    for k, i in enumerate(idx):
        assert sub.name(k) == batch.name(int(i))
        assert np.array_equal(sub.cigar_of(k), batch.cigar_of(int(i)))
        assert np.array_equal(sub.seq_of(k), batch.seq_of(int(i)))
        assert np.array_equal(sub.qual_of(k), batch.qual_of(int(i)))
        assert sub.tags[sub.tags_off[k]:sub.tags_off[k + 1]].tobytes() == \
            batch.tags[batch.tags_off[int(i)]:batch.tags_off[int(i) + 1]].tobytes()


def test_pileup_indexed_matches_sweep(indexed_bam):
    """pileup_at_positions must give identical counts with and without the
    BAI-restricted scan."""
    import shutil

    from ngsbits_tpu.core.chromosome import Chromosome
    from ngsbits_tpu.qc.pileup import pileup_at_positions

    reader = BamReader(indexed_bam)
    # loci: sample positions across the file
    chrn, pos = [], []
    for batch in reader:
        for i in range(0, len(batch), 37):
            if int(batch.ref_id[i]) >= 0:
                chrn.append(Chromosome(reader.ref_names[int(batch.ref_id[i])]).num)
                pos.append(int(batch.pos[i]) + 5)
    reader.close()
    chrn = np.asarray(chrn, dtype=np.int64)
    pos = np.asarray(pos, dtype=np.int64)

    r1 = pileup_at_positions(indexed_bam, chrn, pos, min_mapq=1)

    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        # copy WITHOUT the index -> sequential sweep
        noidx = os.path.join(td, "x.bam")
        shutil.copy(indexed_bam, noidx)
        r2 = pileup_at_positions(noidx, chrn, pos, min_mapq=1)

    assert np.array_equal(r1.counts, r2.counts)
    assert np.array_equal(r1.dels, r2.dels)
    assert r1.counts.sum() > 0


def test_bedcoverage_random_access_identical(ref_data_in, tmp_path):
    """BedCoverage -random_access must produce the same BED as the sweep."""
    from helpers import execute

    bam = ref_data_in / "BamClipOverlap_in1.bam"
    reader = BamReader(str(bam))
    # ROI: a few windows on the most-covered reference
    best = {}
    for batch in reader:
        for i in range(0, len(batch), 11):
            r = int(batch.ref_id[i])
            if r >= 0:
                best.setdefault(r, []).append(int(batch.pos[i]))
    rid = max(best, key=lambda r: len(best[r]))
    chrom = reader.ref_names[rid]
    ps = sorted(best[rid])
    reader.close()
    roi = tmp_path / "roi.bed"
    with open(roi, "w") as fh:
        for p in (ps[0], ps[len(ps) // 2], ps[-1]):
            fh.write(f"{chrom}\t{max(0, p - 50)}\t{p + 100}\n")
    a = tmp_path / "sweep.bed"
    b = tmp_path / "ra.bed"
    assert execute("BedCoverage", ["-in", roi, "-bam", bam, "-out", a]) == 0
    assert execute("BedCoverage", ["-in", roi, "-bam", bam, "-out", b,
                                   "-random_access"]) == 0
    assert a.read_bytes() == b.read_bytes()

    a2 = tmp_path / "sweep_low.bed"
    b2 = tmp_path / "ra_low.bed"
    assert execute("BedLowCoverage", ["-in", roi, "-bam", bam, "-cutoff", "5",
                                      "-out", a2]) == 0
    assert execute("BedLowCoverage", ["-in", roi, "-bam", bam, "-cutoff", "5",
                                      "-out", b2, "-random_access"]) == 0
    assert a2.read_bytes() == b2.read_bytes()
