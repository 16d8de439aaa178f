"""Genomic interval lists (BED) and a binned interval index.

Behavioral reference: ngs-bits ``BedFile``/``BedLine`` (cppNGS/BedFile.cpp)
— 1-based closed intervals internally, 0-based half-open on disk; operations
load/store/sort/merge/extend/shrink/add/subtract/intersect/overlapping/chunk
with the reference's exact edge semantics (merge_back_to_back joins
end+1==start; subtract can split a region; chunk splits into n near-equal
parts with remainder distributed round-robin).

``ChromosomalIndex`` mirrors cppNGS/ChromosomalIndex.h but vectorized:
per-chromosome contiguous slices + numpy searchsorted over starts, with the
same max_length walk-back bound.
"""

from __future__ import annotations

import sys

from ngsbits_tpu.utils.stdio import stdin_binary
from dataclasses import dataclass, field

import numpy as np

from .chromosome import Chromosome


@dataclass
class BedLine:
    chr: Chromosome
    start: int  # 1-based inclusive
    end: int    # 1-based inclusive
    annotations: list = field(default_factory=list)  # list[bytes]

    def is_valid(self) -> bool:
        return self.chr.is_valid() and 0 <= self.start <= self.end

    def length(self) -> int:
        return self.end - self.start + 1

    def overlaps(self, chr_: Chromosome | None, start: int, end: int) -> bool:
        if chr_ is not None and self.chr != chr_:
            return False
        return self.start <= end and start <= self.end

    def adjacent_to(self, *args) -> bool:
        """BedLine::adjacentTo — (start, end) or (chr, start, end)."""
        if len(args) == 3:
            chr_, start, end = args
            if not isinstance(chr_, Chromosome):
                chr_ = Chromosome(chr_)
            if chr_.num != self.chr.num:
                return False
        else:
            start, end = args
        return self.start == end + 1 or self.end == start - 1

    @staticmethod
    def from_string(text: str | bytes) -> "BedLine":
        """BedLine::fromString — tab-separated 'chr start end [annos...]'."""
        if isinstance(text, bytes):
            text = text.decode()
        parts = text.strip().split("\t")
        if len(parts) < 3:
            raise ValueError(f"BedLine::fromString: '{text}' has less than "
                             "3 parts!")
        return BedLine(Chromosome(parts[0]), int(parts[1]), int(parts[2]),
                       [p.encode() for p in parts[3:]])

    def to_string_with_annotations(self) -> str:
        """BedLine::toStringWithAnnotations — tab-separated round trip."""
        out = f"{self.chr.str}\t{self.start}\t{self.end}"
        for a in self.annotations:
            out += "\t" + (a.decode() if isinstance(a, bytes) else str(a))
        return out

    def sort_key(self):
        return (self.chr.num, self.start, self.end)

    def to_string(self, human_readable: bool = False) -> str:
        """BedLine::toString (BedFile.h:117-128): human-readable uses the
        chr-prefixed normalized chromosome name."""
        if human_readable:
            return f"{self.chr.str_normalized(True)}:{self.start}-{self.end}"
        return f"{self.chr.str}:{self.start}-{self.end}"


class BedFile:
    def __init__(self):
        self.lines: list[BedLine] = []
        self.headers: list[bytes] = []

    # ---- container ----
    def __len__(self):
        return len(self.lines)

    def __getitem__(self, i) -> BedLine:
        return self.lines[i]

    def __iter__(self):
        return iter(self.lines)

    def append(self, line: BedLine):
        if not line.chr.is_valid():
            raise ValueError("Invalid BED line chromosome - empty string!")
        if line.start < 1 or line.end < 1 or line.start > line.end:
            raise ValueError(f"Invalid BED line range '{line.start}' to '{line.end}'!")
        self.lines.append(line)

    def base_count(self) -> int:
        return sum(l.length() for l in self.lines)

    def chromosomes(self) -> set:
        return {l.chr for l in self.lines}

    # ---- IO ----
    @staticmethod
    def from_file(filename: str, read_annotations: bool = True) -> "BedFile":
        out = BedFile()
        if filename in ("", "-", None):
            data = stdin_binary().read()
        else:
            from ..io.versatile import is_remote, local_path
            if is_remote(str(filename)):
                filename = local_path(filename)
            with open(filename, "rb") as fh:
                data = fh.read()
        chr_cache: dict[bytes, Chromosome] = {}
        for raw in data.split(b"\n"):
            line = raw.rstrip(b"\r")
            if not line.strip():
                continue
            if (line.startswith(b"#") or line.startswith(b"track ")
                    or line.startswith(b"browser ") or line.startswith(b"Chromosome\tStart\tEnd")):
                out.headers.append(line)
                continue
            fields = line.split(b"\t")
            if len(fields) < 3:
                raise ValueError(
                    f"BED file line with less than three fields found: '{line.decode(errors='replace').strip()}'")
            cb = fields[0]
            if cb not in chr_cache:
                chr_cache[cb] = Chromosome(cb)
            try:
                start = int(fields[1]) + 1
            except ValueError:
                raise ValueError(f"BED file line with invalid starts position found: '{line.decode(errors='replace')}'")
            try:
                end = int(fields[2])
            except ValueError:
                raise ValueError(f"BED file line with invalid end position found: '{line.decode(errors='replace')}'")
            annos = list(fields[3:]) if read_annotations else []
            out.append(BedLine(chr_cache[cb], start, end, annos))
        return out

    def to_text(self) -> str:
        parts = []
        for header in self.headers:
            parts.append(header.decode().strip())
        for l in self.lines:
            row = f"{l.chr.str}\t{l.start - 1}\t{l.end}"
            if l.annotations:
                row += "\t" + "\t".join(a.decode() for a in l.annotations)
            parts.append(row)
        return "".join(p + "\n" for p in parts)

    def store(self, filename: str | None):
        text = self.to_text()
        if filename in ("", "-", None):
            sys.stdout.write(text)
        else:
            with open(filename, "w") as fh:
                fh.write(text)

    # ---- ops ----
    def clear_annotations(self):
        for l in self.lines:
            l.annotations = []

    def sort(self):
        self.lines.sort(key=BedLine.sort_key)

    def sort_with_name(self):
        self.lines.sort(key=lambda l: (l.chr.num, l.start, l.end,
                                       l.annotations[0] if l.annotations else b""))

    def remove_duplicates(self):
        if not self.is_sorted():
            raise RuntimeError("Cannot use remove_duplicates on unsorted BED file!")
        out = []
        for l in self.lines:
            if out and (out[-1].chr == l.chr and out[-1].start == l.start and out[-1].end == l.end):
                continue
            out.append(l)
        self.lines = out

    def is_sorted(self) -> bool:
        keys = [l.sort_key() for l in self.lines]
        return all(keys[i] <= keys[i + 1] for i in range(len(keys) - 1))

    def is_merged(self) -> bool:
        """BedFile::isMerged — no overlapping fragments, order irrelevant
        (BedFile.cpp semantics: checked on a sorted copy)."""
        lines = sorted(self.lines, key=lambda l: l.sort_key())
        for i in range(1, len(lines)):
            if lines[i - 1].overlaps(lines[i].chr, lines[i].start, lines[i].end):
                return False
        return True

    @staticmethod
    def from_text(text: str | bytes) -> "BedFile":
        """BedFile::fromText — parse BED text ('#'/track lines -> headers)."""
        if isinstance(text, bytes):
            text = text.decode()
        out = BedFile()
        for raw in text.split("\n"):
            line = raw.rstrip("\r")
            if not line.strip():
                continue
            if line.startswith("#") or line.startswith("track ") or line.startswith("browser "):
                out.headers.append(line.encode())
                continue
            parts = line.split("\t")
            out.append(BedLine(Chromosome(parts[0]), int(parts[1]) + 1, int(parts[2]),
                               [p.encode() for p in parts[3:]]))
        return out

    def overlaps_with_file(self, other: "BedFile") -> bool:
        """BedFile::overlapsWith(BedFile) — any pairwise region overlap."""
        return any(self.overlaps_with(l.chr, l.start, l.end) for l in other.lines)

    def is_merged_and_sorted(self) -> bool:
        for i in range(1, len(self.lines)):
            a, b = self.lines[i - 1], self.lines[i]
            if b.sort_key() < a.sort_key():
                return False
            if a.overlaps(b.chr, b.start, b.end):
                return False
        return True

    def merge(self, merge_back_to_back: bool = True, merge_names: bool = False,
              merged_names_unique: bool = False):
        if not self.lines:
            return
        if not merge_names:
            self.clear_annotations()
        else:
            for l in self.lines:
                name = l.annotations[0] if l.annotations else b""
                l.annotations = [name]
        if not self.is_sorted():
            self.sort()
        out = []
        cur = self.lines[0]
        cur_annos = list(cur.annotations)
        for line in self.lines[1:]:
            if (cur.overlaps(line.chr, line.start, line.end)
                    or (merge_back_to_back and cur.chr == line.chr
                        and cur.adjacent_to(line.start, line.end))):
                if line.end > cur.end:
                    cur = BedLine(cur.chr, cur.start, line.end, cur_annos)
                if merge_names:
                    anno = line.annotations[0]
                    if not merged_names_unique or anno not in cur_annos:
                        cur_annos.append(anno)
            else:
                out.append(BedLine(cur.chr, cur.start, cur.end,
                                   [b",".join(cur_annos)] if merge_names else []))
                cur = line
                cur_annos = list(line.annotations)
        out.append(BedLine(cur.chr, cur.start, cur.end,
                           [b",".join(cur_annos)] if merge_names else []))
        self.lines = out

    def extend(self, n: int):
        if n < 1:
            raise ValueError(f"Cannot extend BED file by '{n}' bases!")
        for l in self.lines:
            l.start = max(1, l.start - n)
            end = l.end + n
            if l.chr.is_m() and end > 16569:
                end = 16569
            l.end = end

    def shrink(self, n: int):
        if n < 1:
            raise ValueError(f"Cannot shrink BED file by '{n}' bases!")
        for l in self.lines:
            l.start += n
            l.end -= n
        self.remove_invalid_lines()

    def add(self, other: "BedFile"):
        for l in other.lines:
            self.append(l)

    def subtract(self, other: "BedFile"):
        if not other.is_merged_and_sorted():
            raise ValueError("Merged and sorted BED file required for calculating the difference of BED files!")
        idx = ChromosomalIndex(other)
        self.clear_annotations()
        removed = 0
        i = 0
        while i < len(self.lines):
            l = self.lines[i]
            for j in idx.matching_indices(l.chr, l.start, l.end):
                l2 = other[int(j)]
                if not l.overlaps(l2.chr, l2.start, l2.end):
                    continue
                if l2.start <= l.start and l2.end >= l.end:
                    l.start = 0
                    l.end = 0
                    removed += 1
                elif l2.start > l.start and l2.end < l.end:
                    self.lines.append(BedLine(l.chr, l2.end + 1, l.end))
                    l.end = l2.start - 1
                elif l2.start > l.start:
                    l.end = l2.start - 1
                else:
                    l.start = l2.end + 1
            i += 1
        if removed:
            self.remove_invalid_lines()

    def intersect(self, other: "BedFile", keep_anno: bool = False):
        if not other.is_merged_and_sorted():
            raise ValueError("Merged and sorted BED file required for for calculating the intersect of BED files!")
        idx = ChromosomalIndex(other)
        if not keep_anno:
            self.clear_annotations()
        n_original = len(self.lines)
        for i in range(n_original):
            l = self.lines[i]
            matches = idx.matching_indices(l.chr, l.start, l.end)
            if len(matches) == 0:
                l.start = 0
                l.end = 0
                continue
            start0, end0, chr0 = l.start, l.end, l.chr
            anno = list(l.annotations) if keep_anno else []
            l.start = max(start0, other[int(matches[0])].start)
            l.end = min(end0, other[int(matches[0])].end)
            for j in matches[1:]:
                self.lines.append(BedLine(chr0, max(start0, other[int(j)].start),
                                          min(end0, other[int(j)].end), list(anno)))
        self.remove_invalid_lines()

    def overlapping(self, other: "BedFile"):
        if not other.is_merged_and_sorted():
            raise ValueError("Merged and sorted BED file required for calculating the overlap of BED files!")
        idx = ChromosomalIndex(other)
        for l in self.lines:
            if len(idx.matching_indices(l.chr, l.start, l.end)) == 0:
                l.start = 0
                l.end = 0
        self.remove_invalid_lines()

    def overlapping_region(self, chr_: Chromosome, start: int, end: int):
        for l in self.lines:
            if not l.overlaps(chr_, start, end):
                l.start = 0
                l.end = 0
        self.remove_invalid_lines()

    def chunk(self, chunk_size: int):
        """Split regions larger than chunk_size into n near-equal chunks
        (n minimizing |chunk_size - length/n|, remainder spread round-robin ±1)
        — exact reference semantics (BedFile.cpp:519-566), feeds GC bins."""
        new_lines = []
        for l in self.lines:
            length = l.length()
            if length > chunk_size:
                n = int(length // chunk_size)
                if abs(chunk_size - length / n) > abs(chunk_size - length / (n + 1)):
                    n += 1
                sizes = [chunk_size] * n
                rest = length - n * chunk_size
                cur = 0
                while rest != 0:
                    sign = 1 if rest > 0 else -1
                    sizes[cur] += sign
                    rest -= sign
                    cur += 1
                    if cur == n:
                        cur = 0
                start = l.start
                for k in range(n):
                    end = start + sizes[k] - 1
                    new_lines.append(BedLine(l.chr, start, end, list(l.annotations)))
                    start = end + 1
            else:
                new_lines.append(l)
        self.lines = new_lines

    def remove_invalid_lines(self):
        self.lines = [l for l in self.lines if l.start > 0 and l.start <= l.end]

    def overlaps_with(self, chr_: Chromosome, start: int, end: int) -> bool:
        return any(l.overlaps(chr_, start, end) for l in self.lines)

    # ---- columnar views (device feeding) ----
    def columns(self):
        """(chr_nums int32, starts int64, ends int64) numpy views for
        vectorized/device processing."""
        n = len(self.lines)
        chrs = np.fromiter((l.chr.num for l in self.lines), dtype=np.int32, count=n)
        starts = np.fromiter((l.start for l in self.lines), dtype=np.int64, count=n)
        ends = np.fromiter((l.end for l in self.lines), dtype=np.int64, count=n)
        return chrs, starts, ends


class ChromosomalIndex:
    """Vectorized binned interval index over a *sorted* BedFile-like container
    (cppNGS/ChromosomalIndex.h semantics: query = all indices overlapping
    [start, end], bounded by the container's max region length)."""

    def __init__(self, container: BedFile):
        if not container.is_sorted():
            raise ValueError("ChromosomalIndex created on unsorted container!")
        self.container = container
        chrs, starts, ends = container.columns()
        self.starts = starts
        self.ends = ends
        self.max_length = int((ends - starts + 1).max()) if len(starts) else 0
        # contiguous [lo, hi) slice per chromosome num
        self.chr_slices: dict[int, tuple[int, int]] = {}
        if len(chrs):
            change = np.flatnonzero(np.diff(chrs)) + 1
            bounds = np.concatenate(([0], change, [len(chrs)]))
            for k in range(len(bounds) - 1):
                self.chr_slices[int(chrs[bounds[k]])] = (int(bounds[k]), int(bounds[k + 1]))

    def matching_indices(self, chr_: Chromosome, start: int, end: int) -> np.ndarray:
        sl = self.chr_slices.get(chr_.num)
        if sl is None:
            return np.empty(0, dtype=np.int64)
        lo, hi = sl
        s = self.starts[lo:hi]
        e = self.ends[lo:hi]
        a = int(np.searchsorted(s, start - self.max_length, side="left"))
        b = int(np.searchsorted(s, end, side="right"))
        cand = np.arange(a, b, dtype=np.int64)
        sel = e[a:b] >= start
        return cand[sel] + lo

    def matching_index(self, chr_: Chromosome, start: int, end: int) -> int:
        m = self.matching_indices(chr_, start, end)
        return int(m[0]) if len(m) else -1
