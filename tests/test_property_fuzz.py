"""Randomized property tests: interval algebra against a brute-force
per-base model, and CRAM write/read round-trips over randomized records.

The golden suite pins exact reference parity on fixed fixtures; these
sweep the input space for invariants the fixtures cannot cover
(BedFile.cpp set-op semantics; io/cram_write.py inverse of io/cram.py)."""

from __future__ import annotations

import numpy as np
import pytest

from ngsbits_tpu.core.chromosome import Chromosome
from ngsbits_tpu.core.intervals import BedFile, BedLine

GENOME = 400   # tiny per-base model domain
CHRS = [Chromosome(b"chr1"), Chromosome(b"chr2")]


def _random_bed(rng, n_max=25) -> BedFile:
    bed = BedFile()
    for _ in range(rng.integers(0, n_max)):
        c = CHRS[rng.integers(0, len(CHRS))]
        start = int(rng.integers(1, GENOME))
        end = int(min(GENOME, start + rng.integers(0, 40)))
        bed.lines.append(BedLine(c, start, end, []))
    return bed


def _mask(bed: BedFile) -> dict:
    m = {c.num: np.zeros(GENOME + 2, bool) for c in CHRS}
    for l in bed.lines:
        m[l.chr.num][l.start:l.end + 1] = True
    return m


def _masks_equal(a, b):
    return all(np.array_equal(a[k], b[k]) for k in a)


@pytest.mark.parametrize("seed", range(30))
def test_merge_matches_base_mask_and_is_canonical(seed):
    rng = np.random.default_rng(seed)
    bed = _random_bed(rng)
    before = _mask(bed)
    bed.merge()
    assert _masks_equal(before, _mask(bed))
    assert bed.is_merged_and_sorted()
    # merged output has no touching neighbours (end+1 == next start merges)
    for a, b in zip(bed.lines, bed.lines[1:]):
        if a.chr.num == b.chr.num:
            assert a.end + 1 < b.start


@pytest.mark.parametrize("seed", range(30))
def test_subtract_intersect_match_base_masks(seed):
    rng = np.random.default_rng(100 + seed)
    a = _random_bed(rng)
    b = _random_bed(rng)
    b.merge()   # subtract requires a merged+sorted operand (BedFile.cpp:374)
    ma, mb = _mask(a), _mask(b)

    sub = BedFile()
    sub.lines = [BedLine(l.chr, l.start, l.end, list(l.annotations)) for l in a.lines]
    sub.subtract(b)
    expected = {k: ma[k] & ~mb[k] for k in ma}
    assert _masks_equal(expected, _mask(sub))

    inter = BedFile()
    inter.lines = [BedLine(l.chr, l.start, l.end, list(l.annotations)) for l in a.lines]
    inter.intersect(b)
    expected = {k: ma[k] & mb[k] for k in ma}
    assert _masks_equal(expected, _mask(inter))


@pytest.mark.parametrize("seed", range(20))
def test_extend_then_shrink_roundtrip_on_merged(seed):
    rng = np.random.default_rng(200 + seed)
    bed = _random_bed(rng)
    bed.merge()
    n = int(rng.integers(1, 10))
    # extend by n then shrink by n returns the original regions when no
    # merging occurred and no region hit the chromosome start clamp
    gaps_ok = all(b.start - a.end - 1 > 2 * n
                  for a, b in zip(bed.lines, bed.lines[1:])
                  if a.chr.num == b.chr.num)
    starts_ok = all(l.start - n >= 1 for l in bed.lines)
    if not (gaps_ok and starts_ok):
        pytest.skip("extend would merge or clamp — not a round-trip input")
    original = [(l.chr.num, l.start, l.end) for l in bed.lines]
    bed.extend(n)
    bed.shrink(n)
    assert [(l.chr.num, l.start, l.end) for l in bed.lines] == original


@pytest.mark.parametrize("seed", range(20))
def test_chunk_preserves_bases_and_bounds(seed):
    rng = np.random.default_rng(300 + seed)
    bed = _random_bed(rng)
    bed.merge()
    before = _mask(bed)
    size = int(rng.integers(5, 60))
    bed.chunk(size)
    assert _masks_equal(before, _mask(bed))
    # Statistics.cpp GC bins depend on chunks never exceeding ~2x target
    for l in bed.lines:
        assert l.length() <= 2 * size


@pytest.mark.parametrize("seed", range(10))
def test_cram_roundtrip_random_records(seed, tmp_path):
    """BAM batch -> CRAM -> decode must preserve names/flags/positions/
    CIGAR/bases/quals/tags for mapped and unmapped randomized records."""
    from ngsbits_tpu.io.bam import BamReader
    from ngsbits_tpu.io.cram import CramReader
    from ngsbits_tpu.io.cram_write import CramWriter

    rng = np.random.default_rng(400 + seed)

    class FakeReader:
        header_text = "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chr1\tLN:100000\n"

    n = int(rng.integers(1, 60))
    recs = []
    for i in range(n):
        ln = int(rng.integers(1, 120))
        seq = rng.choice(np.frombuffer(b"ACGTN", np.uint8), size=ln)
        qual = rng.integers(0, 60, size=ln).astype(np.uint8)
        mapped = rng.random() < 0.8
        flag = 0 if mapped else 0x4
        # simple but varied CIGAR: optional soft clips around a match,
        # with an insertion or deletion in the middle sometimes
        cigar = []
        rest = ln
        if mapped:
            sc = int(rng.integers(0, min(10, rest)))
            if sc:
                cigar.append((sc << 4) | 4)
                rest -= sc
            if rest > 2 and rng.random() < 0.5:
                a = rest // 2
                cigar.append((a << 4) | 0)
                if rng.random() < 0.5:
                    cigar.append((int(rng.integers(1, 5)) << 4) | 2)  # D
                    cigar.append(((rest - a) << 4) | 0)
                else:
                    b = int(rng.integers(1, rest - a + 1))
                    cigar.append((b << 4) | 1)                        # I
                    if rest - a - b:
                        cigar.append(((rest - a - b) << 4) | 0)
            elif rest:
                cigar.append((rest << 4) | 0)
        recs.append(dict(
            flag=flag, ref_id=0 if mapped else -1,
            pos=int(rng.integers(0, 90000)) if mapped else -1,
            # unmapped records carry no MQ series in CRAM; they decode as 0
            # (htslib does the same)
            mapq=int(rng.integers(0, 61)) if mapped else 0,
            cigar=np.array(cigar, np.uint32),
            seq=seq, qual=qual, name=f"r{i}".encode(),
            mate_ref=-1, mate_pos=-1, tlen=0,
            tags=b"NMC" + bytes([i % 250]),
        ))

    path = tmp_path / "rt.cram"
    w = CramWriter(str(path), FakeReader())
    for r in recs:

        class R:  # BamRecord-shaped
            pass

        rr = R()
        rr.flag, rr.ref_id, rr.pos = r["flag"], r["ref_id"], r["pos"]
        rr.mapq, rr.cigar = r["mapq"], r["cigar"]
        # write_bam_record takes 4-bit codes; map ASCII -> nibble
        nib = np.zeros(len(r["seq"]), np.uint8)
        for code, ch in ((1, ord("A")), (2, ord("C")), (4, ord("G")),
                         (8, ord("T")), (15, ord("N"))):
            nib[r["seq"] == ch] = code
        rr.seq = nib
        rr.qual = r["qual"]
        rr.name = r["name"]
        rr.mate_ref_id, rr.mate_pos, rr.tlen = r["mate_ref"], r["mate_pos"], r["tlen"]
        rr.tags = r["tags"]
        w.write_bam_record(rr)
    w.close()

    rd = CramReader(str(path))
    batches = []
    while True:
        batch = rd.read_batch()
        if batch is None or len(batch) == 0:
            break
        batches.append(batch)
    # the record count fits one container, so exactly one batch comes back
    assert len(batches) == 1 and len(batches[0]) == n
    batch = batches[0]
    from ngsbits_tpu.io.bam import SEQ_NIBBLE_ASCII
    for i, r in enumerate(recs):
        assert batch.name(i) == r["name"]
        assert int(batch.flag[i]) == r["flag"]
        assert int(batch.pos[i]) == r["pos"]
        assert int(batch.mapq[i]) == r["mapq"]
        np.testing.assert_array_equal(batch.cigar_of(i), r["cigar"])
        seq_ascii = SEQ_NIBBLE_ASCII[batch.seq_of(i)]
        np.testing.assert_array_equal(seq_ascii, r["seq"])
        np.testing.assert_array_equal(batch.qual_of(i), r["qual"])
        assert batch.tags[batch.tags_off[i]:batch.tags_off[i + 1]].tobytes() == r["tags"]


@pytest.mark.parametrize("seed", range(15))
def test_roh_raw_runs_match_brute_force(seed):
    """RohHunter's raw ROH scan (RohHunter/main.cpp:119-161) must find
    exactly the maximal runs of consecutive hom markers per chromosome
    (no exclude regions, Q threshold off), with the correct Q score."""
    import math

    from ngsbits_tpu.tools.roh_hunter import _Var, _calculate_raw_rohs

    rng = np.random.default_rng(500 + seed)
    var_info = []
    for c in (CHRS[0], CHRS[1]):
        pos = 0
        for _ in range(rng.integers(0, 80)):
            pos += int(rng.integers(1, 10000))
            var_info.append(_Var(c, pos, bool(rng.random() < 0.6),
                                 float(np.float32(rng.uniform(0.01, 0.5)))))
    rohs = _calculate_raw_rohs(var_info, 0.0, None)

    # brute force: maximal hom runs per chromosome
    expected = []
    i = 0
    n = len(var_info)
    while i < n:
        if not var_info[i].hom:
            i += 1
            continue
        j = i
        while (j + 1 < n and var_info[j + 1].hom
               and var_info[j + 1].chr == var_info[i].chr):
            j += 1
        expected.append((var_info[i].chr.num, var_info[i].pos,
                         var_info[j].pos, i, j))
        i = j + 1

    got = [(r.chr.num, r.start_pos, r.end_pos, r.start_index, r.end_index)
           for r in rohs]
    assert got == expected

    # Q score: -10*log10(prod af^2), capped at 10000
    for r in rohs:
        p = 1.0
        for k in range(r.start_index, r.end_index + 1):
            p *= float(var_info[k].af) ** 2
        want = 10000.0 if p <= 0 else min(-10.0 * math.log10(p), 10000.0)
        assert abs(r.q_score(var_info) - want) < 1e-9
