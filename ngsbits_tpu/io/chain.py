"""Liftover chain file reader.

Behavioral reference: ngs-bits cppNGS/ChainFileReader.{h,cpp} — per-reference
chromosome list of genomic alignments with block-wise lifting, the same
unmapped-base accounting and percent-deletion cutoff (including the quirk
that the last chain block of the file is never registered, and the start/end
adjustment rules for positions inside unmapped gaps).
"""

from __future__ import annotations

import gzip

from ..core.chromosome import Chromosome


class ChainError(Exception):
    pass


class GenomicAlignment:
    __slots__ = ("score", "id", "ref_chr", "ref_chr_size", "ref_start", "ref_end",
                 "ref_on_plus", "q_chr", "q_chr_size", "q_start", "q_end",
                 "q_on_plus", "alignment", "index")
    INDEX_FREQUENCY = 25

    def __init__(self, score, ref_chr, ref_chr_size, ref_start, ref_end, ref_on_plus,
                 q_chr, q_chr_size, q_start, q_end, q_on_plus, id_):
        self.score = score
        self.id = id_
        self.ref_chr = ref_chr
        self.ref_chr_size = ref_chr_size
        self.ref_start = ref_start
        self.ref_end = ref_end
        self.ref_on_plus = ref_on_plus
        self.q_chr = q_chr
        self.q_chr_size = q_chr_size
        self.q_start = q_start
        self.q_end = q_end
        self.q_on_plus = q_on_plus
        self.alignment: list[tuple[int, int, int]] = []  # (size, ref_dt, q_dt)
        self.index: list[tuple[int, int, int]] = [(ref_start, q_start, 0)]

    def add_alignment_line(self, size: int, ref_dt: int, q_dt: int):
        self.alignment.append((size, ref_dt, q_dt))
        if len(self.alignment) % self.INDEX_FREQUENCY == 0:
            rs, qs, idx = self.index[-1]
            for i in range(idx, len(self.alignment) - 1):
                s, rdt, qdt = self.alignment[i]
                rs += s + rdt
                qs += s + qdt
            self.index.append((rs, qs, len(self.alignment) - 1))

    def overlaps_with(self, start: int, end: int) -> bool:
        return (self.ref_start <= start <= self.ref_end) or (self.ref_start <= end <= self.ref_end)

    def lift(self, start: int, end: int, percent_deletion: float):
        """Returns (q_chr, lifted_start, lifted_end) or None."""
        start_index = 0
        ref_pos = self.ref_start
        q_pos = self.q_start
        for cur in range(1, len(self.index)):
            if self.index[cur][0] > start:
                ref_pos, q_pos, start_index = self.index[cur - 1]
                break
            if cur == len(self.index) - 1:
                ref_pos, q_pos, start_index = self.index[cur]
                break

        lifted_start = -1
        lifted_end = -1
        unmapped = 0
        start_was_in_unmapped = False
        if self.ref_start >= start:
            lifted_start = q_pos
            unmapped += ref_pos - start
        if self.ref_end <= end:
            lifted_end = self.q_end
            unmapped += end - self.ref_end

        for i in range(start_index, len(self.alignment)):
            if unmapped > percent_deletion * (end - start):
                break
            size, ref_dt, q_dt = self.alignment[i]
            if lifted_start == -1:
                if ref_pos <= start < ref_pos + size:
                    lifted_start = q_pos + (start - ref_pos)
                if ref_pos + size <= start < ref_pos + size + ref_dt:
                    unmapped += (ref_pos + size + ref_dt) - start
                    lifted_start = q_pos + size + q_dt
                    start_was_in_unmapped = True
            if lifted_end == -1:
                if ref_pos <= end < ref_pos + size:
                    lifted_end = q_pos + (end - ref_pos)
                if ref_pos + size <= end < ref_pos + size + ref_dt:
                    unmapped += end - (ref_pos + size)
                    lifted_end = q_pos + size
                if ref_pos + size + ref_dt == end:
                    unmapped += ref_dt
                    lifted_end = q_pos + size
            ref_pos += size + ref_dt
            q_pos += size + q_dt
            if lifted_start != -1 and lifted_end == -1 and not start_was_in_unmapped:
                unmapped += ref_dt
            start_was_in_unmapped = False
            if ref_pos > end:
                break

        if lifted_start != -1 and lifted_end != -1:
            if unmapped > percent_deletion * (end - start):
                return None
            if self.q_on_plus:
                return (self.q_chr, lifted_start, lifted_end)
            return (self.q_chr, self.q_chr_size - lifted_end, self.q_chr_size - lifted_start)
        return None


class ChainFileReader:
    def __init__(self, filepath: str, percent_deletion: float):
        self.filepath = str(filepath)
        self.percent_deletion = percent_deletion
        self.chromosomes: dict[int, list[GenomicAlignment]] = {}  # chr.num -> alignments
        self.ref_chrom_sizes: dict[int, int] = {}
        self._load()

    def _load(self):
        low = self.filepath.lower()
        if not low.endswith(".chain") and not low.endswith(".gz"):
            raise ChainError(f"Unknown chain file type: File doesn't end with .chain or .gz: {self.filepath}")
        opener = gzip.open if low.endswith(".gz") else open
        with opener(self.filepath, "rb") as fh:
            lines = fh.read().split(b"\n")
        current = self._parse_chain_line(lines[0].strip().split(b" "))
        for raw in lines[1:]:
            line = raw.strip()
            if not line:
                continue
            if line.startswith(b"chain"):
                # register the previous chain (the reference never registers
                # the final one — replicated)
                self.chromosomes.setdefault(current.ref_chr.num, []).append(current)
                current = self._parse_chain_line(line.split(b" "))
            else:
                parts = line.split(b"\t") if b"\t" in line else line.split(b" ")
                if len(parts) == 1:
                    current.add_alignment_line(int(parts[0]), 0, 0)
                elif len(parts) == 3:
                    current.add_alignment_line(int(parts[0]), int(parts[1]), int(parts[2]))
                else:
                    raise ChainError(f"Alignment Data line with neither 3 nor a single number. {line.decode()}")

    def _parse_chain_line(self, parts: list[bytes]) -> GenomicAlignment:
        ref_chr = Chromosome(parts[2])
        if ref_chr.num not in self.ref_chrom_sizes:
            self.ref_chrom_sizes[ref_chr.num] = int(parts[3])
        return GenomicAlignment(
            float(parts[1]), ref_chr, int(parts[3]), int(parts[5]), int(parts[6]),
            parts[4] == b"+", Chromosome(parts[7]), int(parts[8]), int(parts[10]),
            int(parts[11]), parts[9] == b"+", int(parts[12]))

    def lift(self, chr_: Chromosome, start: int, end: int):
        """Lift a 1-based region; returns (Chromosome, start, end) 1-based."""
        if end < start:
            raise ChainError("End is smaller than start!")
        if chr_.num not in self.chromosomes:
            raise ChainError(f"Position to lift is in unknown chromosome. Tried to lift: {chr_.str_normalized(True)}")
        if start < 1 or end > self.ref_chrom_sizes[chr_.num]:
            raise ChainError(f"Position to lift is outside of the chromosome size for chromosome. Tried to lift: {chr_.str_normalized(True)}: {start}-{end}")
        start = start - 1
        for a in self.chromosomes[chr_.num]:
            if not a.overlaps_with(start, end):
                continue
            result = a.lift(start, end, self.percent_deletion)
            if result is None:
                continue
            q_chr, s, e = result
            return (q_chr, s + 1, e)
        raise ChainError(f"Region is unmapped or more than {_num(self.percent_deletion * 100)}% deleted/unmapped bases.")


def _num(v: float) -> str:
    s = f"{v:.6g}"
    return s
