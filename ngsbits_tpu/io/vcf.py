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

from ngsbits_tpu.utils.stdio import stdin_binary, stdout_binary
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


def _ref_info_format_roundtrip(line: bytes, kind: bytes):
    """Reproduce the reference's parse+store cycle for ##INFO/##FORMAT lines
    (VcfHeader::parseInfoFormatLine, VcfLine.cpp:319-377 + storeLine):
    naive '='/',' splitting — a '=' inside the Description drops the text up
    to the next ',' (pinned by the VcfSort_out5 golden)."""
    prefix = b"##" + kind + b"=<"
    inner = line[len(prefix):]
    parts = inner.split(b",")
    if len(parts) < 4:
        return None
    try:
        id_ = parts[0].split(b"=")[1]
        number = parts[1].split(b"=")[1]
        type_ = parts[2].split(b"=")[1]
        desc_first = parts[3].split(b"=")[1]
    except IndexError:
        return None
    desc = b",".join([desc_first] + parts[4:])
    desc = desc[1:-2]  # remove leading '"' and trailing '">'
    return (id_, b"##" + kind + b"=<ID=" + id_ + b",Number=" + number
            + b",Type=" + type_ + b',Description="' + desc + b'">')


def _ref_filter_roundtrip(line: bytes):
    """VcfHeader::setFilterLine + FilterLine::storeLine round trip."""
    inner = line[13:-2]  # strip '##FILTER=<ID=' and '">'
    parts = inner.split(b"=")
    if parts and parts[0].endswith(b"Description"):
        parts = [parts[0], b"=".join(parts[1:])]
    if len(parts) != 2:
        return None
    first = parts[0].split(b",")
    if len(first) != 2 or first[1].strip() != b"Description":
        return None
    fid = first[0]
    desc = parts[1][1:]  # remove leading '"'
    return fid, b"##FILTER=<ID=" + fid + b',Description="' + desc + b'">'


class VcfHeader:
    def __init__(self):
        self.lines: list[bytes] = []      # all ## lines in order
        self.info_ids: set[str] = set()
        self.format_ids: set[str] = set()
        self.info_descriptions: dict[str, bytes] = {}
        self.format_descriptions: dict[str, bytes] = {}
        self.info_types: dict[str, bytes] = {}
        self.fileformat: bytes = b""
        # categorized raw lines for reference-order store
        self.comments: list[bytes] = []
        self.info_lines: list[tuple[str, bytes]] = []    # (id, raw line)
        self.format_lines: list[tuple[str, bytes]] = []
        self.filter_lines: list[tuple[str, bytes]] = []  # (id, raw line)
        self.filter_descriptions: dict[str, bytes] = {}

    def add(self, line: bytes):
        self.lines.append(line)
        if line.startswith(b"##INFO=<ID="):
            fields = _parse_structured_value(line)
            iid = fields.get("ID", b"").decode()
            rt = _ref_info_format_roundtrip(line, b"INFO")
            stored = rt[1] if rt else line
            if iid in self.info_ids:
                return  # duplicate metadata skipped like the reference
            self.info_ids.add(iid)
            self.info_descriptions[iid] = fields.get("Description", b"")
            self.info_types[iid] = fields.get("Type", b"")
            self.info_lines.append((iid, stored))
        elif line.startswith(b"##FORMAT=<ID="):
            fields = _parse_structured_value(line)
            fid = fields.get("ID", b"").decode()
            rt = _ref_info_format_roundtrip(line, b"FORMAT")
            stored = rt[1] if rt else line
            if fid in self.format_ids:
                return
            self.format_ids.add(fid)
            self.format_descriptions[fid] = fields.get("Description", b"")
            # GT is always moved to the front (VcfHeader::setFormatLine,
            # VcfLine.cpp:250-254)
            if fid == "GT" and self.format_lines:
                self.format_lines.insert(0, (fid, stored))
            else:
                self.format_lines.append((fid, stored))
        elif line.startswith(b"##FILTER=<ID="):
            fields = _parse_structured_value(line)
            rt = _ref_filter_roundtrip(line)
            stored = rt[1] if rt else line
            self.filter_lines.append((fields.get("ID", b"").decode(), stored))
            self.filter_descriptions[fields.get("ID", b"").decode()] = fields.get("Description", b"")
        elif line.startswith(b"##fileformat=") and not self.fileformat:
            self.fileformat = line.split(b"=", 1)[1]
        else:
            self.comments.append(line)

    def header_text(self) -> bytes:
        """Reference store order (VcfHeader::storeHeaderInformation,
        VcfLine.cpp:172-195): fileformat, comments, INFO, FILTER, FORMAT."""
        out = [b"##fileformat=" + (self.fileformat if self.fileformat else b"VCFv4.2")]
        out += self.comments
        out += [l for _i, l in self.info_lines]
        out += [l for _i, l in self.filter_lines]
        out += [l for _i, l in self.format_lines]
        return b"\n".join(out) + b"\n"

    def _line_by_id(self, lines, descriptions, iid, error_if_not_found, what):
        from types import SimpleNamespace

        for lid, raw in lines:
            if lid == iid:
                fields = _parse_structured_value(raw)
                return SimpleNamespace(id=lid, description=descriptions[lid],
                                       number=fields.get("Number", b""),
                                       type=fields.get("Type", b""))
        if error_if_not_found:
            raise ValueError(f"No {what} line with ID '{iid}' in VCF header!")
        return SimpleNamespace(id="", description=b"", number=b"", type=b"")

    def info_line_by_id(self, iid: str, error_if_not_found: bool = True):
        """VcfHeader::infoLineByID."""
        return self._line_by_id(self.info_lines, self.info_descriptions, iid,
                                error_if_not_found, "INFO")

    def format_line_by_id(self, fid: str, error_if_not_found: bool = True):
        """VcfHeader::formatLineByID."""
        return self._line_by_id(self.format_lines, self.format_descriptions,
                                fid, error_if_not_found, "FORMAT")

    def filter_line_by_id(self, fid: str, error_if_not_found: bool = True):
        """VcfHeader::filterLineByID."""
        return self._line_by_id(self.filter_lines, self.filter_descriptions,
                                fid, error_if_not_found, "FILTER")

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

    def is_mnp(self) -> bool:
        """VcfLine::isMNP (VcfLine.cpp:457-462)."""
        a, r = len(self.alt(0)), len(self.ref)
        return a > 1 and r > 1 and a == r

    def overlaps_with(self, *args) -> bool:
        """VcfLine::overlapsWith — (chr,start,end), (start,end) or BedLine."""
        if len(args) == 1:
            line = args[0]
            return self.overlaps_with(line.chr, line.start, line.end)
        if len(args) == 3:
            chr_, start, end = args
            if not isinstance(chr_, Chromosome):
                chr_ = Chromosome(chr_)
            if chr_.num != self.chr.num:
                return False
        else:
            start, end = args
        return self.start <= end and self.end >= start

    def __lt__(self, rhs: "VcfLineView") -> bool:
        """VcfLine::operator< (VcfLine.cpp:464-475)."""
        return ((self.chr.num, self.start, self.ref, self.alt_string())
                < (rhs.chr.num, rhs.start, rhs.ref, rhs.alt_string()))

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
        """FORMAT value for a sample; b'' if the key is missing
        (VcfLine::formatValueFromSample returns Helper::empty(),
        VcfLine.h:265-277)."""
        keys = self.format_keys()
        kb = key.encode()
        try:
            ki = keys.index(kb)
        except ValueError:
            return b""
        vals = self.f.samples[self.i][sample_idx].split(b":")
        if ki >= len(vals):
            return b""
        return vals[ki]

    def sample(self, which) -> list[bytes]:
        """VcfLine::sample — FORMAT values of one sample by index or name."""
        if isinstance(which, (str, bytes)):
            which = self.f.sample_ids().index(
                which.encode() if isinstance(which, str) else which)
        return self.f.samples[self.i][which].split(b":")

    def format_value_from_sample(self, key: str, sample=0) -> bytes:
        """VcfLine::formatValueFromSample — sample given by name or index."""
        if isinstance(which := sample, (str, bytes)):
            sample = self.f.sample_ids().index(
                which.encode() if isinstance(which, str) else which)
        return self.format_value(key, sample)


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

    def sort(self):
        """VcfFile::sort — VcfLine::operator< semantics."""
        vcf_sort(self)

    def is_sorted(self) -> bool:
        keys = [_vcf_sort_key(self, i) for i in range(len(self))]
        return all(keys[i] <= keys[i + 1] for i in range(len(keys) - 1))

    def remove_duplicates(self, sort_first: bool = True):
        """VcfFile::removeDuplicates — sort, then drop consecutive
        (chr,start,ref,alt) duplicates."""
        if sort_first:
            self.sort()
        keep = [i for i in range(len(self))
                if i == 0 or _vcf_sort_key(self, i) != _vcf_sort_key(self, i - 1)]
        if len(keep) == len(self):
            return
        self.chr_strs = [self.chr_strs[i] for i in keep]
        self.pos = self.pos[keep]
        self.ids = [self.ids[i] for i in keep]
        self.refs = [self.refs[i] for i in keep]
        self.alts = [self.alts[i] for i in keep]
        self.quals = [self.quals[i] for i in keep]
        self.filters = [self.filters[i] for i in keep]
        self.infos = [self.infos[i] for i in keep]
        self.format_keys = [self.format_keys[i] for i in keep]
        self.samples = [self.samples[i] for i in keep]

    def sort_by_file(self, filename: str):
        """VcfFile::sortByFile — chromosome rank from a FAI-like file."""
        rank = {}
        with open(filename, "rb") as fh:
            for n, line in enumerate(fh):
                c = Chromosome(line.split(b"\t")[0].strip())
                rank[c.num] = n + 1

        def key(i):
            num = self.chr_of(i).num
            if num not in rank:
                raise ValueError(f"Reference file for sorting does not contain "
                                 f"chromosome '{self.chr_of(i).str}'!")
            return (rank[num], int(self.pos[i]), self.refs[i], self.alts[i])

        order = sorted(range(len(self)), key=key)
        _vcf_reorder(self, order)

    # ---- IO ----
    @staticmethod
    def from_text(text: bytes, roi=None) -> "VcfFile":
        """VcfFile::fromText."""
        return VcfFile._parse(text, roi)

    @staticmethod
    def from_file(filename: str, roi=None) -> "VcfFile":
        if filename not in ("", "-", None):
            from .versatile import is_remote, local_path
            if is_remote(str(filename)):
                filename = local_path(filename)
        if filename in ("", "-", None):
            data = stdin_binary().read()
        else:
            with open(filename, "rb") as fh:
                magic = fh.read(2)
                fh.seek(0)
                if magic == b"\x1f\x8b":
                    data = gzip.decompress(fh.read())
                else:
                    data = fh.read()
        return VcfFile._parse(data, roi)

    @staticmethod
    def _parse(data: bytes, roi=None) -> "VcfFile":
        out = VcfFile()
        roi_idx = None
        if roi is not None and len(roi):
            from ..core.intervals import BedFile, ChromosomalIndex
            rs = BedFile()
            rs.lines = sorted(roi.lines, key=lambda l: l.sort_key())
            roi_idx = ChromosomalIndex(rs)
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
            if roi_idx is not None:
                c = out._chr_cache.get(fields[0])
                if c is None:
                    c = Chromosome(fields[0])
                    out._chr_cache[fields[0]] = c
                start = int(fields[1])
                end = start + len(fields[3]) - 1
                if len(roi_idx.matching_indices(c, start, end)) == 0:
                    continue
            out.chr_strs.append(fields[0])
            pos_list.append(int(fields[1]))
            out.ids.append(fields[2])
            out.refs.append(fields[3].upper())
            out.alts.append(fields[4].upper())
            out.quals.append(fields[5])
            out.filters.append(fields[6])
            out.infos.append(fields[7])
            fk = fields[8] if len(fields) > 8 else b""
            samples = fields[9:] if len(fields) > 9 else []
            # move GT to the front of FORMAT + sample values
            # (VcfFile.cpp:222-243)
            if fk and b"GT" in fk.split(b":"):
                keys = fk.split(b":")
                gi = keys.index(b"GT")
                if gi != 0:
                    order = [gi] + [k for k in range(len(keys)) if k != gi]
                    fk = b":".join(keys[k] for k in order)
                    samples = [b":".join((v.split(b":") + [b""] * len(keys))[k] for k in order)
                               for v in samples]
            out.format_keys.append(fk)
            out.samples.append(samples)
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
        # reference registers undeclared FILTER/INFO/FORMAT ids while parsing
        # data lines (VcfFile.cpp:160-245)
        add_missing_header_lines(out)
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
            stdout_binary().write(data)
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


def _qt_num(v: float) -> bytes:
    """QByteArray::number(double) — '%g' with 6 significant digits."""
    s = f"{v:g}"
    return s.encode()


class _VcfStoreMixin:
    pass


def add_missing_header_lines(f: "VcfFile"):
    """VcfFile::parseVcfEntry (VcfFile.cpp:160-245): FILTER/INFO/FORMAT keys
    seen in data lines but not declared in the header get auto-added lines
    with Description "no description available" (first-seen order)."""
    header = f.header
    filter_ids = {i for i, _l in header.filter_lines}
    info_ids = set(header.info_ids)
    format_ids = {i for i, _l in header.format_lines}
    for i in range(len(f)):
        for filt in f.filters[i].split(b";"):
            fid = filt.decode()
            if fid and fid not in filter_ids and filt not in (b"PASS", b"."):
                header.filter_lines.append(
                    (fid, b"##FILTER=<ID=" + filt + b',Description="no description available">'))
                header.filter_descriptions[fid] = b"no description available"
                filter_ids.add(fid)
        if f.infos[i] != b".":
            for item in f.infos[i].split(b";"):
                key = item.split(b"=", 1)[0]
                kid = key.decode()
                if kid and kid not in info_ids:
                    header.info_lines.append(
                        (kid, b"##INFO=<ID=" + key +
                         b',Number=1,Type=String,Description="no description available">'))
                    header.info_ids.add(kid)
                    header.info_descriptions[kid] = b"no description available"
                    header.info_types[kid] = b"String"
                    info_ids.add(kid)
        if f.format_keys[i]:
            for key in f.format_keys[i].split(b":"):
                kid = key.decode()
                if kid and kid not in format_ids and key != b".":
                    line = (kid, b"##FORMAT=<ID=" + key +
                            b',Number=1,Type=String,Description="no description available">')
                    if key == b"GT":
                        header.format_lines.insert(0, line)
                    else:
                        header.format_lines.append(line)
                    format_ids.add(kid)


def _vcf_sort_key(f: "VcfFile", i: int):
    return (f.chr_of(i).num, int(f.pos[i]), f.refs[i], f.alts[i])


def _vcf_reorder(f: "VcfFile", order: list):
    f.chr_strs = [f.chr_strs[i] for i in order]
    f.pos = f.pos[order] if len(order) else f.pos
    f.ids = [f.ids[i] for i in order]
    f.refs = [f.refs[i] for i in order]
    f.alts = [f.alts[i] for i in order]
    f.quals = [f.quals[i] for i in order]
    f.filters = [f.filters[i] for i in order]
    f.infos = [f.infos[i] for i in order]
    f.format_keys = [f.format_keys[i] for i in order]
    f.samples = [f.samples[i] for i in order]


def vcf_sort(f: "VcfFile"):
    """Sort lines with VcfLine::operator< semantics (chr, pos, ref, alt)."""
    _vcf_reorder(f, sorted(range(len(f)), key=lambda i: _vcf_sort_key(f, i)))


def encode_info_value(text: str) -> str:
    """VcfFile::encodeInfoValue — percent-encode VCF-INFO-breaking chars."""
    out = []
    for ch in text:
        if ch in "%=, ;\t\r\n":
            out.append("%%%02X" % ord(ch))
        else:
            out.append(ch)
    return "".join(out)


def decode_info_value(text: str) -> str:
    """VcfFile::decodeInfoValue."""
    from urllib.parse import unquote

    return unquote(text)


def vcf_store(f: "VcfFile", filename: str | None, compression_level: int = 0,
              remove_unused_contigs: bool = False):
    """Store with the reference's header order and line formatting
    (VcfFile::storeLineInformation / storeHeaderColumns)."""
    header = f.header
    comments = header.comments
    if remove_unused_contigs:
        used = {c.decode() for c in f.chr_strs}
        kept = []
        for line in comments:
            if line.startswith(b"##contig=<ID="):
                cid = line[13:].split(b",", 1)[0].split(b">", 1)[0].decode()
                if cid not in used:
                    continue
            kept.append(line)
        comments = kept

    out = [b"##fileformat=" + (header.fileformat if header.fileformat else b"VCFv4.2")]
    out += comments
    out += [l for _i, l in header.info_lines]
    out += [l for _i, l in header.filter_lines]
    out += [l for _i, l in header.format_lines]
    cols = b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
    has_samples = len(f.sample_ids()) > 0
    if has_samples:
        cols += b"\tFORMAT"
        for s in f.sample_ids():
            cols += b"\t" + s
    out.append(cols)

    for i in range(len(f)):
        q = f.quals[i]
        if q in (b".", b""):
            qtxt = b"."
        else:
            try:
                qtxt = _qt_num(float(q))
            except ValueError:
                qtxt = q
        info = f.infos[i] if f.infos[i] else b"."
        if info != b".":
            # flags without a Type=Flag header declaration are stored as
            # KEY=TRUE (VcfFile.cpp:565-577)
            parts = []
            for item in info.split(b";"):
                if b"=" not in item and item and \
                        header.info_types.get(item.decode()) != b"Flag":
                    parts.append(item + b"=TRUE")
                else:
                    parts.append(item)
            info = b";".join(parts)
        fields = [f.chr_strs[i], str(int(f.pos[i])).encode(),
                  f.ids[i] if f.ids[i] else b".",
                  f.refs[i], f.alts[i], qtxt,
                  f.filters[i] if f.filters[i] not in (b"",) else b".",
                  info]
        if has_samples:
            fields.append(f.format_keys[i])
            fields.extend(f.samples[i])
        out.append(b"\t".join(fields))
    data = b"\n".join(out) + b"\n"
    if filename in ("", "-", None):
        stdout_binary().write(data)
    elif compression_level > 0 or (filename and filename.endswith(".gz")):
        from .bgzf import bgzf_compress
        with open(filename, "wb") as fh:
            fh.write(bgzf_compress(data, level=max(compression_level, 1)))
    else:
        with open(filename, "wb") as fh:
            fh.write(data)


def vcf_store_as_tsv(f: "VcfFile", filename: str | None):
    """VcfFile::storeAsTsv (VcfFile.cpp:347-428)."""
    header = f.header
    out = []
    out += header.comments
    out.append(b"##DESCRIPTION=ID=ID of the variant, often dbSNP rsnumber")
    out.append(b"##DESCRIPTION=QUAL=Phred-scaled quality score")
    out.append(b"##DESCRIPTION=FILTER=Filter status")
    for iid, _line in header.info_lines:
        desc = header.info_descriptions.get(iid, b"")
        if iid == "." or not desc:
            continue
        out.append(b"##DESCRIPTION=" + iid.encode() + b"_info=" + desc)
    for fid, _line in header.format_lines:
        desc = header.format_descriptions.get(fid, b"")
        if fid == "." or not desc:
            continue
        out.append(b"##DESCRIPTION=" + fid.encode() + b"_format=" + desc)
    for flt, _line in header.filter_lines:
        out.append(b"##FILTER=" + flt.encode() + b"=" + header.filter_descriptions.get(flt, b""))

    cols = b"#chr\tpos\tref\talt\tID\tQUAL\tFILTER"
    for iid, _l in header.info_lines:
        if iid == ".":
            continue
        cols += b"\t" + iid.encode() + b"_info"
    for sid in f.sample_ids():
        for fid, _l in header.format_lines:
            if fid == ".":
                continue
            cols += b"\t" + sid + b"_" + fid.encode() + b"_format"
    out.append(cols)

    sample_ids = f.sample_ids()
    for i in range(len(f)):
        v = f[i]
        q = f.quals[i]
        if q in (b".", b""):
            qtxt = b"."
        else:
            try:
                qtxt = _qt_num(float(q))
            except ValueError:
                qtxt = q
        row = [f.chr_strs[i], str(int(f.pos[i])).encode(), f.refs[i], f.alts[i],
               f.ids[i], qtxt,
               f.filters[i] if f.filters[i] not in (b"", b".") else b"."]
        for iid, _l in header.info_lines:
            row.append(v.info(iid))
        for si in range(len(sample_ids)):
            for fid, _l in header.format_lines:
                row.append(v.format_value(fid, si))
        out.append(b"\t".join(row))
    data = b"\n".join(out) + b"\n"
    if filename in ("", "-", None):
        stdout_binary().write(data)
    else:
        with open(filename, "wb") as fh:
            fh.write(data)
