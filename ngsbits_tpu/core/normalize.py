"""Variant normalization (left/right shifting of InDels).

Behavioral reference: ngs-bits VcfLine::normalize (cppNGS/VcfLine.cpp:477-616)
with Variant::normalize prefix/suffix trimming (VariantList.cpp:1283-1307)
and Variant::minBlock repeat-unit detection (VariantList.cpp:1309-1324).
"""

from __future__ import annotations

LEFT = "left"
RIGHT = "right"

SKIPPED = "skipped"
PROCESSED = "processed"


def trim_variant(start: int, ref: bytes, obs: bytes) -> tuple[int, bytes, bytes]:
    """Variant::normalize — strip common first base, suffix, then prefix."""
    if (len(ref) != 1 or len(obs) != 1) and ref and obs and ref[0] == obs[0]:
        ref, obs, start = ref[1:], obs[1:], start + 1
    while (len(ref) != 1 or len(obs) != 1) and ref and obs and ref[-1:] == obs[-1:]:
        ref, obs = ref[:-1], obs[:-1]
    while (len(ref) != 1 or len(obs) != 1) and ref and obs and ref[0] == obs[0]:
        ref, obs, start = ref[1:], obs[1:], start + 1
    return start, ref, obs


def min_block(seq: bytes) -> bytes:
    """Smallest repeat unit composing `seq` (Variant::minBlock)."""
    n = len(seq)
    for size in range(1, n // 2 + 1):
        if n % size:
            continue
        block = seq[:size]
        if block * (n // size) == seq:
            return block
    return seq


def normalize_variant(chrom, pos: int, ref: bytes, alt: bytes, reference,
                      direction: str = LEFT):
    """Shift a single-alt variant; returns (status, pos, ref, alt).

    `reference` is a FastaFileIndex-like object with seq(chr, start, length)
    (1-based) and length_of(chr). Mirrors VcfLine::normalize exactly,
    including its SKIPPED early-outs (ref mismatch, multi-allelic, SNV/MNP,
    complex indel, chromosome-boundary variants).
    """
    ref = ref.upper()
    alt = alt.upper()
    if ref != reference.seq(chrom, pos, len(ref)).upper():
        return SKIPPED, pos, ref, alt
    if b"," in alt or not alt:
        return SKIPPED, pos, ref, alt

    pos, ref, alt = trim_variant(pos, ref, alt)
    if len(ref) == 1 and len(alt) == 1:
        return SKIPPED, pos, ref, alt

    # complex indel (e.g. ACGT -> CA): re-prepend the prefix base and skip
    if ref and alt:
        if len(ref) != len(alt):
            pos -= 1
            base = reference.seq(chrom, pos, 1).upper()
            ref = base + ref
            alt = base + alt
        return SKIPPED, pos, ref, alt

    chr_len = reference.length_of(chrom)
    if (pos == 1 and direction == LEFT) or \
       (pos + len(ref) - 1 == chr_len and direction == RIGHT):
        return SKIPPED, pos, ref, alt

    seq = lambda p, n: reference.seq(chrom, p, n).upper()

    if direction == LEFT:
        if len(ref) == 0:  # insertion
            block = min_block(alt)
            pos -= len(block)
            while pos > 0 and seq(pos, len(block)) == block:
                pos -= len(block)
            pos += len(block)
            pos -= 1
            ref = seq(pos, 1)
            alt = ref + alt
            while ref[:1] == alt[-1:]:
                pos -= 1
                ref = seq(pos, 1)
                alt = ref + alt[:-1]
        else:  # deletion
            block = min_block(ref)
            while pos >= 1 and seq(pos, len(block)) == block:
                pos -= len(block)
            pos += len(block)
            pos -= 1
            alt = seq(pos, 1)
            ref = alt + ref
            while ref[-1:] == alt[:1]:
                pos -= 1
                alt = seq(pos, 1)
                ref = alt + ref[:-1]
    else:  # RIGHT
        if len(ref) == 0:  # insertion
            block = min_block(alt)
            while pos < chr_len - len(block) and seq(pos, len(block)) == block:
                pos += len(block)
            pos -= 1
            ref = seq(pos, 1)
            alt = ref + alt
            while seq(pos + 1, 1)[:1] == alt[1:2]:
                pos += 1
                ref = seq(pos, 1)
                alt = ref + alt[2:] + seq(pos, 1)
        else:  # deletion
            block = min_block(ref)
            while pos < chr_len - len(block) and seq(pos, len(block)) == block:
                pos += len(block)
            pos -= len(ref)
            pos -= 1
            alt = seq(pos, 1)
            ref = alt + ref
            while ref[1:2] == seq(pos + len(ref), 1)[:1]:
                pos += 1
                alt = seq(pos, 1)
                ref = seq(pos, len(ref))

    return PROCESSED, pos, ref, alt
