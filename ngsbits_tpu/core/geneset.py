"""Gene symbol set — sorted, unique, upper-cased.

Behavioral reference: ngs-bits cppNGS/GeneSet.{h,cpp} (insert trims,
upper-cases and keeps the list sorted; createFromFile skips '#' comments).
"""

from __future__ import annotations

import bisect
import sys

from ngsbits_tpu.utils.stdio import stdin_binary


class GeneSet:
    def __init__(self):
        self._list: list[str] = []
        self._set: set[str] = set()

    def insert(self, gene: str | bytes):
        if isinstance(gene, bytes):
            gene = gene.decode()
        tmp = gene.strip().upper()
        if not tmp or tmp in self._set:
            return
        bisect.insort(self._list, tmp)
        self._set.add(tmp)

    def insert_all(self, genes):
        for g in genes:
            self.insert(g)

    def clear(self):
        self._list.clear()
        self._set.clear()

    def contains_all(self, other: "GeneSet") -> bool:
        """GeneSet::containsAll."""
        return all(g in self._set for g in other)

    def intersects_with(self, other: "GeneSet") -> bool:
        """GeneSet::intersectsWith."""
        return any(g in self._set for g in other)

    def remove_all(self, genes):
        """GeneSet::remove(list/set overloads)."""
        for g in list(genes):
            self.remove(g if isinstance(g, str) else g.decode())

    def remove(self, gene: str):
        tmp = gene.strip().upper()
        if tmp in self._set:
            self._list.remove(tmp)
            self._set.remove(tmp)

    def contains(self, gene: str | bytes) -> bool:
        if isinstance(gene, bytes):
            gene = gene.decode()
        return gene.strip().upper() in self._set

    __contains__ = contains

    def __iter__(self):
        return iter(self._list)

    def __len__(self):
        return len(self._list)

    def __getitem__(self, i):
        return self._list[i]

    def count(self) -> int:
        return len(self._list)

    def join(self, sep: str = ", ") -> str:
        return sep.join(self._list)

    def intersect(self, other: "GeneSet") -> "GeneSet":
        out = GeneSet()
        for g in self._list:
            if g in other:
                out.insert(g)
        return out

    @staticmethod
    def create_from_file(filename: str) -> "GeneSet":
        out = GeneSet()
        fh = open(filename, "rb") if filename else stdin_binary()
        for raw in fh:
            line = raw.rstrip(b"\r\n")
            if line.startswith(b"#"):
                continue
            out.insert(line)
        if filename:
            fh.close()
        return out

    @staticmethod
    def create_from_text(text: str | bytes, separator: str = "\n") -> "GeneSet":
        if isinstance(text, bytes):
            text = text.decode()
        out = GeneSet()
        for line in text.split(separator):
            if line.startswith("#"):
                continue
            out.insert(line)
        return out

    def store(self, filename: str | None):
        data = "".join(g + "\n" for g in self._list)
        if filename:
            with open(filename, "w") as fh:
                fh.write(data)
        else:
            sys.stdout.write(data)
