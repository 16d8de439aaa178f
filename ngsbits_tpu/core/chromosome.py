"""Chromosome name normalization.

Behavioral reference: ngs-bits ``Chromosome`` (cppNGS/Chromosome.cpp):
"chr1"/"1" -> 1, X -> 1001, Y -> 1002, M/MT -> 1003, other contigs get
process-wide first-seen numbers from 1004 (sort order of non-standard contigs
is therefore first-seen order, like the reference's static cache).
"""

from __future__ import annotations

import threading
from functools import total_ordering

_FIXED = {}
for _i in range(1, 23):
    _FIXED[str(_i)] = _i
    _FIXED[f"chr{_i}"] = _i
_FIXED.update({"X": 1001, "chrX": 1001, "Y": 1002, "chrY": 1002,
               "MT": 1003, "chrMT": 1003, "": 0})

_dynamic: dict = {}
_dynamic_lock = threading.Lock()
_next_num = 1004


def reset_dynamic_contigs():
    """Clear the first-seen registry of non-standard contigs. The reference
    runs one process per tool, so its registry starts empty per invocation;
    ToolBase.execute calls this to match that when several tools run in one
    process (e.g. the test suite). Cached Chromosome objects from before the
    reset keep their old num — callers must not hold them across resets."""
    global _next_num
    with _dynamic_lock:
        _dynamic.clear()
        _next_num = 1004


def _numeric(s: str) -> int:
    if s in _FIXED:
        return _FIXED[s]
    tmp = s.upper()
    if tmp.startswith("CHR"):
        tmp = tmp[3:]
    if tmp == "M":
        tmp = "MT"
    if tmp == "":
        return 0
    if tmp == "X":
        return 1001
    if tmp == "Y":
        return 1002
    if tmp == "MT":
        return 1003
    if not tmp.startswith("0"):
        try:
            value = int(tmp)
            if 0 < value <= 1000:
                return value
        except ValueError:
            pass
    global _next_num
    with _dynamic_lock:
        if tmp not in _dynamic:
            _dynamic[tmp] = _next_num
            _next_num += 1
        return _dynamic[tmp]


_NUM2STR = {0: ""}
for _i in range(1, 23):
    _NUM2STR[_i] = str(_i)
_NUM2STR.update({1001: "X", 1002: "Y", 1003: "MT"})


@total_ordering
class Chromosome:
    __slots__ = ("str", "num")

    def __init__(self, chr_: "str | bytes | Chromosome" = ""):
        if isinstance(chr_, Chromosome):
            self.str = chr_.str
            self.num = chr_.num
            return
        if isinstance(chr_, bytes):
            chr_ = chr_.decode()
        self.str = chr_.strip()
        self.num = _numeric(self.str)

    def is_valid(self) -> bool:
        return self.num > 0

    def is_autosome(self) -> bool:
        return 0 < self.num < 1001

    def is_gonosome(self) -> bool:
        return self.num in (1001, 1002)

    def is_x(self) -> bool:
        return self.num == 1001

    def is_y(self) -> bool:
        return self.num == 1002

    def is_m(self) -> bool:
        return self.num == 1003

    def is_non_special(self) -> bool:
        return 0 < self.num < 1004

    def str_normalized(self, prepend_chr: bool) -> str:
        base = _NUM2STR.get(self.num)
        if base is None:
            base = self.str.upper()
            if base.startswith("CHR"):
                base = base[3:]
        return ("chr" + base) if prepend_chr else base

    def __eq__(self, other):
        return isinstance(other, Chromosome) and self.num == other.num

    def __lt__(self, other):
        return self.num < other.num

    def __hash__(self):
        return hash(self.num)

    def __repr__(self):
        return f"Chromosome({self.str!r})"

    def __str__(self):
        return self.str
