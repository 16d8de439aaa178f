"""VCF reader/writer with columnar storage.

Behavioral reference: ngs-bits ``VcfFile``/``VcfLine``/``VcfHeader``
(cppNGS/VcfFile.cpp, VcfLine.cpp): 1-based start, end = start+len(ref)-1,
filtersPassed = empty or single PASS, ins = len(alt)>1 and len(ref)==1,
del = len(alt)==1 and len(ref)>1, VCF.GZ via BGZF.

Storage is columnar (numpy positions + python byte-field lists) with lazy
INFO/FORMAT parsing — per-line work happens only for fields actually
requested; bulk numeric extraction has vectorized helpers for device feeding.
"""

from __future__ import annotations

import gzip
import sys
from dataclasses import dataclass, field

import numpy as np

from ..core.chromosome import Chromosome


@dataclass
class VcfHeaderLine:
    line: bytes  # full '##...' line


def _parse_structured_value(line: bytes) -> dict:
    """Parse '##KEY=<ID=...,Description="...">' fields (quote-aware)."""
    inner = line.split(b"<", 1)[1].rsplit(b">", 1)[0]
    out = {}
    key = b""
    val = b""
    in_key = True
    in_quotes = False
    i = 0
    while i < len(inner):
        c = inner[i:i + 1]
        if in_key:
            if c == b"=":
                in_key = False
            else:
                key += c
        else:
            if c == b'"':
                in_quotes = not in_quotes
            elif c == b"," and not in_quotes:
                out[key.decode()] = val
                key = b""
                val = b""
                in_key = True
            else:
                val += c
        i += 1
    if key:
        out[key.decode()] = val
    return out


class VcfHeader:
    def __init__(self):
        self.lines: list[bytes] = []      # all ## lines in order
        self.info_ids: set[str] = set()
        self.format_ids: set[str] = set()
        self.info_descriptions: dict[str, bytes] = {}
        self.fileformat: bytes = b""

    def add(self, line: bytes):
        self.lines.append(line)
        if line.startswith(b"##INFO=<ID="):
            fields = _parse_structured_value(line)
            iid = fields.get("ID", b"").decode()
            self.info_ids.add(iid)
            self.info_descriptions[iid] = fields.get("Description", b"")
        elif line.startswith(b"##FORMAT=<ID="):
            self.format_ids.add(line[13:].split(b",", 1)[0].decode())
        elif line.startswith(b"##fileformat="):
            self.fileformat = line.split(b"=", 1)[1]

    def info_id_defined(self, key: str) -> bool:
        return key in self.info_ids

    def format_id_defined(self, key: str) -> bool:
        return key in self.format_ids

    def vep_index_by_name(self, name: str, error_if_not_found: bool = True) -> int:
        """Index of a field in the CSQ annotation (VcfLine.cpp:125-149:
        split the CSQ Description on '|', first part is forced to 'Allele')."""
        desc = self.info_descriptions.get("CSQ")
        if desc is None:
            if error_if_not_found:
                raise ValueError("Info field 'CSQ' containing VEP annotation not found!")
            return -1
        parts = desc.strip().split(b"|")
        parts[0] = b"Allele"
        try:
            return parts.index(name.encode())
        except ValueError:
            if error_if_not_found:
                raise ValueError(f"Field '{name}' not found in VEP CSQ field!")
            return -1


class VcfLineView:
    """Lightweight accessor over one row of a VcfFile."""

    __slots__ = ("f", "i")

    def __init__(self, f: "VcfFile", i: int):
        self.f = f
        self.i = i

    @property
    def chr(self) -> Chromosome:
        return self.f.chr_of(self.i)

    @property
    def start(self) -> int:
        return int(self.f.pos[self.i])

    @property
    def end(self) -> int:
        return self.start + len(self.ref) - 1

    @property
    def ref(self) -> bytes:
        return self.f.refs[self.i]

    @property
    def alts(self) -> list[bytes]:
        return self.f.alts[self.i].split(b",")

    def alt(self, idx: int = 0) -> bytes:
        return self.alts[idx]

    def alt_string(self) -> bytes:
        return self.f.alts[self.i]

    @property
    def id(self) -> bytes:
        return self.f.ids[self.i]

    @property
    def qual(self) -> bytes:
        return self.f.quals[self.i]

    @property
    def filters(self) -> list[bytes]:
        raw = self.f.filters[self.i]
        if raw in (b"", b"."):
            return []
        return raw.split(b";")

    def filters_passed(self) -> bool:
        fl = self.filters
        return len(fl) == 0 or (len(fl) == 1 and fl[0] == b"PASS")

    def is_multi_allelic(self) -> bool:
        return b"," in self.f.alts[self.i]

    def is_snv(self) -> bool:
        return len(self.alt(0)) == 1 and len(self.ref) == 1

    def is_ins(self) -> bool:
        return len(self.alt(0)) > 1 and len(self.ref) == 1

    def is_del(self) -> bool:
        return len(self.alt(0)) == 1 and len(self.ref) > 1

    def is_indel(self) -> bool:
        return len(self.alt(0)) > 1 and len(self.ref) > 1

    def info(self, key: str) -> bytes:
        """INFO value; b'' if absent, b'TRUE' for flags (reference returns
        the value only; callers use contains/startswith so '' is safe)."""
        raw = self.f.infos[self.i]
        kb = key.encode()
        for part in raw.split(b";"):
            if b"=" in part:
                k, v = part.split(b"=", 1)
                if k == kb:
                    return v
            elif part == kb:
                return b"TRUE"
        return b""

    def qual_value(self) -> float:
        """QUAL as float; '.' -> -1 (VcfLine semantics)."""
        q = self.f.quals[self.i]
        if q in (b".", b""):
            return -1.0
        try:
            return float(q)
        except ValueError:
            return -1.0

    def vep_annotations(self, field_index: int) -> list[bytes]:
        csq = self.info("CSQ").strip()
        out = []
        if csq:
            for transcript in csq.split(b","):
                fields = transcript.split(b"|")
                out.append(fields[field_index])
        return out

    def format_keys(self) -> list[bytes]:
        fk = self.f.format_keys[self.i]
        return fk.split(b":") if fk else []

    def format_value(self, key: str, sample_idx: int = 0) -> bytes:
        """FORMAT value for a sample; b'.' if the key is missing (matches
        VcfLine::formatValueFromSample returning an empty/'.'-like value)."""
        keys = self.format_keys()
        kb = key.encode()
        try:
            ki = keys.index(kb)
        except ValueError:
            return b"."
        vals = self.f.samples[self.i][sample_idx].split(b":")
        if ki >= len(vals):
            return b"."
        return vals[ki]


class VcfFile:
    def __init__(self):
        self.header = VcfHeader()
        self.column_headers: list[bytes] = []   # the #CHROM line fields
        self.chr_strs: list[bytes] = []
        self.pos = np.empty(0, dtype=np.int64)
        self.ids: list[bytes] = []
        self.refs: list[bytes] = []
        self.alts: list[bytes] = []             # raw comma-joined
        self.quals: list[bytes] = []
        self.filters: list[bytes] = []
        self.infos: list[bytes] = []
        self.format_keys: list[bytes] = []
        self.samples: list[list[bytes]] = []    # per line: list per sample
        self._chr_cache: dict[bytes, Chromosome] = {}

    # ---- container ----
    def __len__(self):
        return len(self.refs)

    count = __len__

    def __getitem__(self, i: int) -> VcfLineView:
        return VcfLineView(self, i)

    def __iter__(self):
        for i in range(len(self)):
            yield VcfLineView(self, i)

    def chr_of(self, i: int) -> Chromosome:
        raw = self.chr_strs[i]
        c = self._chr_cache.get(raw)
        if c is None:
            c = Chromosome(raw)
            self._chr_cache[raw] = c
        return c

    def sample_ids(self) -> list[bytes]:
        if len(self.column_headers) <= 9:
            return []
        return self.column_headers[9:]

    # ---- IO ----
    @staticmethod
    def from_file(filename: str) -> "VcfFile":
        out = VcfFile()
        if filename in ("", "-", None):
            data = sys.stdin.buffer.read()
        else:
            with open(filename, "rb") as fh:
                magic = fh.read(2)
                fh.seek(0)
                if magic == b"\x1f\x8b":
                    data = gzip.decompress(fh.read())
                else:
                    data = fh.read()
        pos_list = []
        for raw in data.split(b"\n"):
            line = raw.rstrip(b"\r")
            if not line:
                continue
            if line.startswith(b"##"):
                out.header.add(line)
                continue
            if line.startswith(b"#"):
                out.column_headers = line[1:].split(b"\t")
                continue
            fields = line.split(b"\t")
            if len(fields) < 8:
                raise ValueError(
                    f"VCF line with less than 8 fields found: '{line.decode(errors='replace')}'")
            out.chr_strs.append(fields[0])
            pos_list.append(int(fields[1]))
            out.ids.append(fields[2])
            out.refs.append(fields[3].upper())
            out.alts.append(fields[4].upper())
            out.quals.append(fields[5])
            out.filters.append(fields[6])
            out.infos.append(fields[7])
            out.format_keys.append(fields[8] if len(fields) > 8 else b"")
            out.samples.append(fields[9:] if len(fields) > 9 else [])
        out.pos = np.array(pos_list, dtype=np.int64)
        # the reference registers FORMAT ids seen in data lines even when the
        # header lacks a ##FORMAT declaration — mirror that
        for fk in set(out.format_keys):
            if fk:
                for key in fk.split(b":"):
                    out.header.format_ids.add(key.decode())
        if not out.column_headers:
            out.column_headers = [b"CHROM", b"POS", b"ID", b"REF", b"ALT",
                                  b"QUAL", b"FILTER", b"INFO"]
        return out

    def to_text(self) -> bytes:
        parts = []
        for h in self.header.lines:
            parts.append(h)
        parts.append(b"#" + b"\t".join(self.column_headers))
        for i in range(len(self)):
            fields = [self.chr_strs[i], str(int(self.pos[i])).encode(), self.ids[i],
                      self.refs[i], self.alts[i], self.quals[i], self.filters[i],
                      self.infos[i]]
            if self.format_keys[i]:
                fields.append(self.format_keys[i])
                fields.extend(self.samples[i])
            parts.append(b"\t".join(fields))
        return b"\n".join(parts) + b"\n"

    def store(self, filename: str | None):
        data = self.to_text()
        if filename in ("", "-", None):
            sys.stdout.buffer.write(data)
        elif filename.endswith(".gz"):
            from .bgzf import bgzf_compress
            with open(filename, "wb") as fh:
                fh.write(bgzf_compress(data))
        else:
            with open(filename, "wb") as fh:
                fh.write(data)

    # ---- vectorized helpers (device feeding) ----
    def gt_codes(self, sample_idx: int = 0) -> np.ndarray:
        """GT per line coded as: 0=hom-ref, 1=het, 2=hom-alt, -1=other/missing.
        Vectorized enough for ROH/similarity engines."""
        out = np.full(len(self), -1, dtype=np.int8)
        for i in range(len(self)):
            gt = VcfLineView(self, i).format_value("GT", sample_idx)
            g = gt.replace(b"|", b"/")
            if g in (b"0/0",):
                out[i] = 0
            elif g in (b"0/1", b"1/0"):
                out[i] = 1
            elif g in (b"1/1",):
                out[i] = 2
        return out
