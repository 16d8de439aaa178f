"""Per-variant AF/depth extraction from a BAM (SNVs and indels).

Behavioral reference: ngs-bits BamReader::getVariantDetails
(cppNGS/BamReader.cpp:888-946), BamReader::getIndels (:949-1140) and
Variant::indelRegion (cppNGS/VariantList.cpp:1326-1383):

- SNV: pileup at the position (min_mapq 1, min_baseq 13); depth counts
  A/C/G/T plus deletions; frequency = obs/depth.
- indel: widen to the repeat-aware indel region, collect '+SEQ'/'-REFSEQ'
  indel strings from reads spanning [region.start-1, region.end+1], depth =
  spanning reads (mapq>0, ref-skip-spanning reads removed), obs counts the
  matching indel string; frequency = min(1, obs/depth).
"""

from __future__ import annotations

import math

import numpy as np

from ..core.chromosome import Chromosome
from ..io.bam import (BamReader, SEQ_NIBBLE_ASCII, FLAG_DUPLICATE,
                      FLAG_PROPER_PAIR, FLAG_SECONDARY, FLAG_SUPPLEMENTARY,
                      FLAG_UNMAPPED)
from .pileup import BASE2IDX, pileup_at_positions


def normalize(start: int, ref: bytes, obs: bytes):
    """Variant::normalize(int&, Sequence&, Sequence&) (VariantList.cpp)."""
    if (len(ref) != 1 or len(obs) != 1) and ref and obs and ref[0] == obs[0]:
        ref, obs, start = ref[1:], obs[1:], start + 1
    while (len(ref) != 1 or len(obs) != 1) and ref and obs and ref[-1:] == obs[-1:]:
        ref, obs = ref[:-1], obs[:-1]
    while (len(ref) != 1 or len(obs) != 1) and ref and obs and ref[0] == obs[0]:
        ref, obs, start = ref[1:], obs[1:], start + 1
    return start, ref, obs


def gsvar_from_vcf(pos: int, ref: bytes, alt: bytes):
    """Variant(const VcfLine&) + normalize('-', to_gsvar=True): VCF 1-based
    (pos, ref, alt) -> GSvar (start, end, ref, obs) with '-' for empty."""
    start, r, o = normalize(pos, ref, alt)
    end = start + len(r) - 1
    if not r:
        r = b"-"
        end += 1
    if not o:
        o = b"-"
    if r == b"-":
        start -= 1
        end -= 1
    return start, end, r, o


def is_snv(ref: bytes, obs: bytes) -> bool:
    return len(ref) == 1 and len(obs) == 1 and ref != b"-" and obs != b"-"


def min_block(seq: bytes) -> bytes:
    """Variant::minBlock — smallest repeated unit."""
    n = len(seq)
    for size in range(1, n // 2 + 1):
        if n % size:
            continue
        block = seq[:size]
        if block * (n // size) == seq:
            return block
    return seq


def _seq(fasta, chr_, start, length):
    try:
        return fasta.seq(chr_, start, length, True)
    except Exception:
        return b""


def indel_region(chr_: Chromosome, start: int, end: int, ref: bytes,
                 obs: bytes, fasta):
    """Variant::indelRegion — repeat-aware region around an indel."""
    if ref == b"-":
        ref = b""
    if obs == b"-":
        obs = b""
    start, ref, obs = normalize(start, ref, obs)
    if ref and obs:
        return start, end
    start_orig, end_orig = start, end
    block = min_block(ref + obs)
    bl = len(block)
    is_repeat = False
    end -= bl - 1
    while _seq(fasta, chr_, end + bl, bl) == block:
        end += bl
        is_repeat = True
    if not ref:  # insertion
        start += 1
    while _seq(fasta, chr_, start - bl, bl) == block:
        start -= bl
        is_repeat = True
    if is_repeat:
        return start, end + bl - 1
    return start_orig, end_orig


class IndelRegionResult:
    __slots__ = ("indels", "depth", "mapq0_frac")

    def __init__(self):
        self.indels: list[bytes] = []
        self.depth = 0
        self.mapq0_frac = float("nan")


def get_indels(bam_file: str, regions, fasta,
               include_not_properly_paired: bool = False,
               count_fragments: bool = False) -> list[IndelRegionResult]:
    """BamReader::getIndels for each (Chromosome, start, end) region, in one
    sequential BAM pass."""
    out = [IndelRegionResult() for _ in regions]
    if not regions:
        return out
    by_chr: dict[int, list[int]] = {}
    for i, (chr_, _s, _e) in enumerate(regions):
        by_chr.setdefault(chr_.num, []).append(i)
    mapped = [0] * len(regions)
    mapq0 = [0] * len(regions)
    # fragment dedup state per region: name -> (read_variant, indel_idx)
    read_names: list[dict] = [dict() for _ in regions]
    to_remove: list[list[int]] = [[] for _ in regions]

    reader = BamReader(bam_file)
    ref_num = np.array([Chromosome(nm).num for nm in reader.ref_names], dtype=np.int64)
    for batch in reader:
        flag = batch.flag
        sel = (flag & (FLAG_SECONDARY | FLAG_SUPPLEMENTARY | FLAG_DUPLICATE | FLAG_UNMAPPED)) == 0
        if not include_not_properly_paired:
            sel &= (flag & FLAG_PROPER_PAIR) != 0
        if not sel.any():
            continue
        r_start = batch.pos.astype(np.int64) + 1
        r_end = batch.end_positions().astype(np.int64)
        r_chr = ref_num[np.maximum(batch.ref_id, 0)]
        for cn, reg_idx in by_chr.items():
            on_chr = np.flatnonzero(sel & (r_chr == cn))
            if len(on_chr) == 0:
                continue
            for gi in reg_idx:
                chr_, start, end = regions[gi]
                # reads overlapping the region (setRegion semantics)
                ov = on_chr[(r_start[on_chr] <= end) & (r_end[on_chr] >= start)]
                for t in ov:
                    t = int(t)
                    mapped[gi] += 1
                    if batch.mapq[t] == 0:
                        mapq0[gi] += 1
                        continue
                    # skip reads that do not span the whole region
                    if r_start[t] > start or r_end[t] < end:
                        continue
                    res = out[gi]
                    res.depth += 1
                    read_variant = b"NONE"
                    indel_idx = -1
                    # CIGAR walk (BamReader.cpp getIndels :1030-1100)
                    genome_pos = int(r_start[t])
                    read_pos = 0
                    cig = batch.cigar[batch.cigar_off[t]:batch.cigar_off[t + 1]]
                    seq_base = int(batch.seq_off[t])
                    for c in cig:
                        op = int(c) & 0xF
                        ln = int(c) >> 4
                        if op in (0, 7, 8):       # M/=/X
                            genome_pos += ln
                            read_pos += ln
                        elif op == 1:             # I
                            if start <= genome_pos <= end:
                                indel_idx = len(res.indels)
                                bases = SEQ_NIBBLE_ASCII[
                                    batch.seq[seq_base + read_pos:seq_base + read_pos + ln]].tobytes()
                                read_variant = b"+" + bases
                                res.indels.append(read_variant)
                            read_pos += ln
                        elif op == 2:             # D
                            if start <= genome_pos <= end:
                                indel_idx = len(res.indels)
                                read_variant = b"-" + _seq(fasta, chr_, genome_pos, ln)
                                res.indels.append(read_variant)
                            genome_pos += ln
                        elif op == 3:             # N (ref skip)
                            if genome_pos <= start and genome_pos + ln >= end:
                                res.depth -= 1
                            genome_pos += ln
                        elif op == 4:             # S
                            read_pos += ln
                        # H (5) ignored
                    if count_fragments:
                        name = batch.name(t)
                        if name in read_names[gi]:
                            prev_var, prev_idx = read_names[gi].pop(name)
                            if prev_var != read_variant:
                                res.depth -= 2
                                to_remove[gi].append(prev_idx)
                            else:
                                res.depth -= 1
                                to_remove[gi].append(indel_idx)
                        else:
                            read_names[gi][name] = (read_variant, indel_idx)
    reader.close()
    for gi, res in enumerate(out):
        for idx in sorted(to_remove[gi], reverse=True):
            if idx == -1:
                continue
            del res.indels[idx]
        res.mapq0_frac = mapq0[gi] / mapped[gi] if mapped[gi] else float("nan")
    return out


class VariantDetails:
    __slots__ = ("depth", "obs", "frequency", "mapq0_frac")

    def __init__(self):
        self.depth = 0
        self.obs = 0
        self.frequency = float("nan")
        self.mapq0_frac = float("nan")


def variant_details(bam_file: str, fasta, variants,
                    include_not_properly_paired: bool = False,
                    count_fragments: bool = False) -> list[VariantDetails]:
    """getVariantDetails for a list of GSvar-style variants
    (Chromosome, start, end, ref, obs). Two sequential BAM passes: one batched
    pileup for all SNVs, one indel-region pass for all indels."""
    n = len(variants)
    out = [VariantDetails() for _ in range(n)]
    snv_idx = [i for i, v in enumerate(variants) if is_snv(v[3], v[4])]
    ind_idx = [i for i in range(n) if i not in set(snv_idx)]

    if snv_idx:
        chr_nums = np.array([variants[i][0].num for i in snv_idx], dtype=np.int64)
        positions = np.array([variants[i][1] for i in snv_idx], dtype=np.int64)
        res = pileup_at_positions(
            bam_file, chr_nums, positions, min_mapq=1,
            include_not_properly_paired=include_not_properly_paired,
            min_baseq=13, count_fragments=count_fragments, track_mapq0=True)
        depth = res.depth(count_del=True)
        m0 = res.mapq0_frac()
        for k, i in enumerate(snv_idx):
            d = out[i]
            d.depth = int(depth[k])
            if d.depth != 0:
                bi = BASE2IDX.get(variants[i][4][:1], -1)
                d.obs = int(res.counts[k, bi]) if bi >= 0 else 0
                d.frequency = d.obs / d.depth
            d.mapq0_frac = float(m0[k])

    if ind_idx:
        regions = []
        normed = []
        for i in ind_idx:
            chr_, start, end, ref, obs = variants[i]
            rs, re_ = indel_region(chr_, start, end, ref, obs, fasta)
            regions.append((chr_, rs - 1, re_ + 1))
            # variant.normalize("-") on the GSvar representation
            s2, r2, o2 = normalize(start, ref.replace(b"-", b""), obs.replace(b"-", b""))
            normed.append((r2 if r2 else b"-", o2 if o2 else b"-"))
        results = get_indels(bam_file, regions, fasta,
                             include_not_properly_paired, count_fragments)
        for k, i in enumerate(ind_idx):
            d = out[i]
            res = results[k]
            d.depth = res.depth
            d.mapq0_frac = res.mapq0_frac
            ref_n, obs_n = normed[k]
            if ref_n != b"-" and obs_n != b"-":
                c_ins = sum(1 for s in res.indels if s[:1] == b"+")
                c_del = sum(1 for s in res.indels if s[:1] == b"-")
                d.obs = min(c_ins, c_del)
            elif ref_n == b"-":
                d.obs = res.indels.count(b"+" + obs_n)
            else:
                d.obs = res.indels.count(b"-" + ref_n)
            if d.depth > 0:
                d.frequency = min(1.0, d.obs / d.depth)
            elif d.obs > 0:
                d.frequency = 1.0  # std::min(1.0, inf)
            else:
                d.frequency = 1.0 if d.depth == 0 else float("nan")
    return out


def is_valid_float(v: float) -> bool:
    return not (math.isnan(v) or math.isinf(v))
