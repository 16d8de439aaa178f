"""Indexed FASTA access (.fai).

Behavioral reference: ngs-bits ``FastaFileIndex`` (cppNGS/FastaFileIndex.cpp:
71-115 offset/line arithmetic, newline-stripped reads) and ``Sequence``
helpers (gcContent = GC/(GC+AT), NaN when none — Sequence.cpp:85-99).

Lenient mode: a chromosome missing from the index yields an empty sequence
(gcContent NaN) instead of raising, so GC-dependent metrics degrade to 'n/a'
when only a partial/stub genome is available (e.g. genome-less CI).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from ..core.chromosome import Chromosome


@dataclass
class _FaiEntry:
    length: int
    offset: int
    line_bases: int
    line_bytes: int


class FastaFileIndex:
    def __init__(self, filename: str, strict: bool = False):
        self.filename = filename
        self.strict = strict
        self.entries: dict[int, _FaiEntry] = {}
        self.names: dict[int, str] = {}
        fai = filename + ".fai"
        with open(fai) as fh:
            for line in fh:
                parts = line.rstrip("\n").split("\t")
                if len(parts) < 5:
                    continue
                c = Chromosome(parts[0])
                self.entries[c.num] = _FaiEntry(int(parts[1]), int(parts[2]),
                                                int(parts[3]), int(parts[4]))
                self.names[c.num] = parts[0]
        self._fh = open(filename, "rb")

    def close(self):
        self._fh.close()

    def lengths(self) -> dict[int, int]:
        return {num: e.length for num, e in self.entries.items()}

    def chromosomes(self) -> list[Chromosome]:
        return [Chromosome(name) for name in self.names.values()]

    def length_of(self, chr_: Chromosome | str) -> int:
        c = chr_ if isinstance(chr_, Chromosome) else Chromosome(chr_)
        e = self.entries.get(c.num)
        return e.length if e else 0

    def seq_whole(self, chr_: Chromosome | str, to_upper: bool = True) -> bytes:
        """FastaFileIndex::seq(chr, to_upper) — the complete chromosome."""
        return self.seq(chr_, 1, self.length_of(chr_), to_upper)

    def seq(self, chr_: Chromosome | str, start: int, length: int, to_upper: bool = True) -> bytes:
        """1-based start; clipped to the chromosome like the reference."""
        if not isinstance(chr_, Chromosome):
            chr_ = Chromosome(chr_)
        e = self.entries.get(chr_.num)
        if e is None:
            if self.strict:
                raise KeyError(f"Chromosome '{chr_.str}' not in FASTA index!")
            return b""
        if start < 1:
            length += start - 1
            start = 1
        if start > e.length:
            return b""
        length = min(length, e.length - start + 1)
        if length <= 0:
            return b""
        row0 = (start - 1) // e.line_bases
        col0 = (start - 1) % e.line_bases
        byte_start = e.offset + row0 * e.line_bytes + col0
        # bytes needed incl. newlines
        rows_spanned = (col0 + length + e.line_bases - 1) // e.line_bases
        raw_len = length + (rows_spanned - 1) * (e.line_bytes - e.line_bases)
        # pread: no shared-offset mutation — safe across threads and forked
        # chunk workers sharing the fd (VcfAnnotate* -threads)
        import os as _os
        raw = _os.pread(self._fh.fileno(), raw_len, byte_start)
        seq = raw.replace(b"\n", b"").replace(b"\r", b"")[:length]
        return seq.upper() if to_upper else seq

    def n_count(self, chr_: Chromosome | str) -> int:
        """Number of N bases in the chromosome (FastaFileIndex-based scan)."""
        if not isinstance(chr_, Chromosome):
            chr_ = Chromosome(chr_)
        e = self.entries.get(chr_.num)
        if e is None:
            return 0
        total = 0
        pos = 1
        chunk = 16 << 20
        while pos <= e.length:
            ln = min(chunk, e.length - pos + 1)
            s = np.frombuffer(self.seq(chr_, pos, ln, to_upper=False), dtype=np.uint8)
            total += int(((s == ord("N")) | (s == ord("n"))).sum())
            pos += ln
        return total


def gc_content(seq: bytes) -> float:
    """GC/(GC+AT); NaN if no ACGT bases (Sequence.cpp:85-99)."""
    if not seq:
        return math.nan
    a = np.frombuffer(seq, dtype=np.uint8)
    gc = int(((a == ord("G")) | (a == ord("C")) | (a == ord("g")) | (a == ord("c"))).sum())
    at = int(((a == ord("A")) | (a == ord("T")) | (a == ord("a")) | (a == ord("t"))).sum())
    if gc + at == 0:
        return math.nan
    return gc / (gc + at)


_COMPLEMENT = bytes.maketrans(b"ACGTNacgtn", b"TGCANtgcan")


def reverse_complement(seq: bytes) -> bytes:
    return seq.translate(_COMPLEMENT)[::-1]


def complement(seq: bytes) -> bytes:
    """Sequence::complement (Sequence.cpp:46-66) — unknown bases unchanged."""
    return seq.translate(_COMPLEMENT)


def only_acgt(seq: bytes) -> bool:
    """Sequence::onlyACGT (Sequence.cpp:101-110)."""
    return all(c in b"ACGT" for c in seq)
