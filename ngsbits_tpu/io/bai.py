"""BAI index reader — random access into coordinate-sorted BAM.

Behavioral reference: BamReader::setRegion + getNextAlignment
(cppNGS/BamReader.h:383-398; htslib BAI). The BAM spec's 5-level binning
(identical scheme to tabix) plus the 16kb linear index give the minimal
virtual offset for a region; the decoder seeks there and scans forward,
stopping once past the region end (input is coordinate-sorted).
"""

from __future__ import annotations

import os
import struct

PSEUDO_BIN = 37450


def find_index(bam_path: str) -> str | None:
    """<bam>.bai or <stem>.bai next to the file (htslib lookup order)."""
    p = str(bam_path)
    for cand in (p + ".bai", os.path.splitext(p)[0] + ".bai"):
        if os.path.exists(cand):
            return cand
    return None


def _reg2bins(beg: int, end: int) -> list:
    """Candidate bins overlapping [beg, end) (SAM spec section 5.3)."""
    bins = [0]
    end -= 1
    for shift, offset in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
        bins.extend(range(offset + (beg >> shift), offset + (end >> shift) + 1))
    return bins


class BaiIndex:
    """Parsed .bai: per-reference bin->chunks plus the linear index."""

    def __init__(self, path: str):
        with open(path, "rb") as fh:
            raw = fh.read()
        if raw[:4] != b"BAI\x01":
            raise ValueError(f"Not a BAI index: {path}")
        pos = 4
        (n_ref,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        self.bins: list[dict] = []
        self.linear: list = []
        for _ in range(n_ref):
            (n_bin,) = struct.unpack_from("<i", raw, pos)
            pos += 4
            bins = {}
            for _ in range(n_bin):
                b, n_chunk = struct.unpack_from("<Ii", raw, pos)
                pos += 8
                chunks = list(struct.unpack_from(f"<{2 * n_chunk}Q", raw, pos))
                pos += 16 * n_chunk
                if b != PSEUDO_BIN:
                    bins[b] = [(chunks[i], chunks[i + 1])
                               for i in range(0, len(chunks), 2)]
            (n_intv,) = struct.unpack_from("<i", raw, pos)
            pos += 4
            linear = list(struct.unpack_from(f"<{n_intv}Q", raw, pos))
            pos += 8 * n_intv
            self.bins.append(bins)
            self.linear.append(linear)

    def n_refs(self) -> int:
        return len(self.bins)

    def min_voffset(self, rid: int, beg0: int, end: int) -> int | None:
        """Smallest virtual offset whose chunk can contain records
        overlapping [beg0, end) on reference rid; None when the region has
        no indexed records."""
        if rid < 0 or rid >= len(self.bins):
            return None
        linear = self.linear[rid]
        lin_min = 0
        if linear:
            i = min(beg0 >> 14, len(linear) - 1)
            lin_min = linear[i]
        best = None
        bins = self.bins[rid]
        for b in _reg2bins(beg0, end):
            for cbeg, cend in bins.get(b, ()):
                if cend <= lin_min:
                    continue
                cand = max(cbeg, lin_min)
                if best is None or cand < best:
                    best = cand
        return best
