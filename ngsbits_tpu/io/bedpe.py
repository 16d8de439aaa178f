"""BEDPE structural-variant file format.

Behavioral reference: ngs-bits cppNGS/BedpeFile.h/.cpp (columnar TSV with
six fixed columns, ## comment headers, #CHROM_A... header line, TYPE column
required; sample header info from ##SAMPLE=<...> lines with FORMAT-column
fallback, BedpeFile.cpp:850-907).
"""

from __future__ import annotations

import sys
from ngsbits_tpu.utils.stdio import stdin_binary, stdout_binary

from ..core.chromosome import Chromosome
from ..core.intervals import BedFile, BedLine

SV_TYPES = (b"DEL", b"DUP", b"INS", b"INV", b"BND")

_TYPE_FULL = {b"DEL": b"Deletion", b"DUP": b"Duplication", b"INS": b"Insertion",
              b"INV": b"Inversion", b"BND": b"Breakpoint"}


def type_to_full_string(t: bytes) -> bytes:
    return _TYPE_FULL[t]


def _parse_pos(raw: bytes) -> int:
    try:
        return int(raw.strip())
    except ValueError:
        return -1


def _pos_to_str(v: int) -> bytes:
    return b"." if v == -1 else str(v).encode()


def _parse_info_field(raw: bytes) -> dict[bytes, bytes]:
    """BedpeFile::parseInfoField — key=value pairs of a ##NAME=<...> meta
    line; values may be double-quoted (quotes stripped, whitespace
    simplified)."""
    import re

    s = raw.decode().replace(">", "").replace("<", "").replace("##", "")
    s = " ".join(s.split())
    out = {}
    for key, value in re.findall(r'([^,="]+)=("[^"]*"|[^,]*)', s):
        out[key.strip().encode()] = value.strip('"').strip().encode()
    return out


class BedpeLine:
    __slots__ = ("chr1", "start1", "end1", "chr2", "start2", "end2", "type",
                 "annotations")

    def __init__(self, chr1, start1, end1, chr2, start2, end2, type_,
                 annotations):
        self.chr1 = chr1 if isinstance(chr1, Chromosome) else Chromosome(chr1)
        self.start1 = start1
        self.end1 = end1
        self.chr2 = chr2 if isinstance(chr2, Chromosome) else Chromosome(chr2)
        self.start2 = start2
        self.end2 = end2
        self.type = type_  # bytes, one of SV_TYPES
        self.annotations = list(annotations)

    def sort_key(self):
        return (self.chr1.num, self.start1, self.chr2.num, self.start2)

    def to_tsv(self) -> bytes:
        fields = [self.chr1.str.encode(), _pos_to_str(self.start1),
                  _pos_to_str(self.end1), self.chr2.str.encode(),
                  _pos_to_str(self.start2), _pos_to_str(self.end2)]
        fields += self.annotations
        return b"\t".join(fields)

    def size(self) -> int:
        if self.type in (b"DEL", b"DUP", b"INV"):
            return self.end2 - self.start1 + 1
        return -1

    def affected_region(self, plus_one: bool = True) -> BedFile:
        """BedpeLine::affectedRegion (BedpeFile.cpp:154-185)."""
        offset = 1 if plus_one else 0
        region = BedFile()
        if self.type in (b"DEL", b"DUP", b"INV"):
            region.append(BedLine(self.chr1, self.start1 + offset, self.end2 + offset))
        elif self.type == b"BND":
            region.append(BedLine(self.chr1, self.start1 + offset, self.end1 + offset))
            region.append(BedLine(self.chr2, self.start2 + offset, self.end2 + offset))
        elif self.type == b"INS":
            region.append(BedLine(self.chr1,
                                  min(self.start1, self.start2) + offset,
                                  max(self.end1, self.end2) + offset))
        else:
            raise ValueError(f"Unhandled variant type: {self.type!r}")
        return region

    def intersects_with(self, regions: BedFile, imprecise_breakpoints: bool = False) -> bool:
        if self.type in (b"DEL", b"DUP", b"INV"):
            return regions.overlaps_with(self.chr1, self.start1, self.end2)
        if imprecise_breakpoints:
            return (regions.overlaps_with(self.chr1, self.start1, self.end1)
                    or regions.overlaps_with(self.chr2, self.start2, self.end2))
        return (regions.overlaps_with(self.chr1, self.start1, self.start1)
                or regions.overlaps_with(self.chr2, self.start2, self.start2))

    def position1(self) -> str:
        return f"{self.chr1.str}:{self.start1}-{self.end1}"

    def position2(self) -> str:
        return f"{self.chr2.str}:{self.start2}-{self.end2}"

    def position_range(self) -> str:
        if self.type in (b"DEL", b"DUP", b"INV"):
            return f"{self.chr1.str}:{self.start1}-{self.end2}"
        return self.position1()

    def format_value(self, annotation_headers: list[bytes], key: bytes,
                     sample_col: int = -1, error_on_missing_key: bool = True) -> bytes:
        """FORMAT:sample accessor (value column defaults to FORMAT+1)."""
        try:
            format_idx = annotation_headers.index(b"FORMAT")
        except ValueError:
            raise ValueError("No FORMAT column found!")
        keys = self.annotations[format_idx].split(b":")
        if key not in keys:
            if not error_on_missing_key:
                return b""
            raise ValueError(f"Key '{key.decode()}' not found in FORMAT column!")
        key_idx = keys.index(key)
        if sample_col < 0:
            sample_col = format_idx + 1
        vals = self.annotations[sample_col].split(b":")
        return vals[key_idx]

    def __lt__(self, rhs: "BedpeLine") -> bool:
        """BedpeLine::operator< (BedpeFile.h:111-119) — chr1/start1 then
        chr2/start2."""
        a, b = self.chr1.num, rhs.chr1.num
        if a != b:
            return a < b
        if self.start1 != rhs.start1:
            return self.start1 < rhs.start1
        a, b = self.chr2.num, rhs.chr2.num
        if a != b:
            return a < b
        return self.start2 < rhs.start2

    def genes(self, annotation_headers: list[bytes],
              error_on_mismatch: bool = True):
        """BedpeLine::genes (BedpeFile.cpp:333-343) — GENES column as GeneSet."""
        from ..core.geneset import GeneSet

        out = GeneSet()
        try:
            gene_idx = annotation_headers.index(b"GENES")
        except ValueError:
            if error_on_mismatch:
                raise ValueError('Column "GENES" not found in annotation header!')
            return out
        for g in self.annotations[gene_idx].split(b","):
            out.insert(g)
        return out

    def set_genes(self, annotation_headers: list[bytes], genes):
        """BedpeLine::setGenes (BedpeFile.cpp:345-353)."""
        try:
            gene_idx = annotation_headers.index(b"GENES")
        except ValueError:
            raise ValueError('Column "GENES" not found in annotation header!')
        self.annotations[gene_idx] = ",".join(genes).encode()

    def set_genotype(self, annotation_headers: list[bytes], value: bytes,
                     sample_idx: int = 0):
        """BedpeLine::setGenotype (BedpeFile.cpp:251-282)."""
        try:
            format_idx = annotation_headers.index(b"FORMAT")
        except ValueError:
            raise ValueError('Column "FORMAT" not found in annotation header!')
        if sample_idx < 0:
            raise ValueError(f"Sample index {sample_idx} must not be less than 0!")
        col = format_idx + 1 + sample_idx
        if col >= len(self.annotations):
            raise ValueError(f"Sample index {col} points to a annotation column "
                             "that does not exist!")
        keys = self.annotations[format_idx].split(b":")
        values = self.annotations[col].split(b":")
        if len(keys) != len(values):
            raise ValueError("Format and value column differ in length in "
                             "BedpeLine::setGenotype!")
        if b"GT" not in keys:
            raise ValueError('Key "GT" was not found in FORMAT column!')
        values[keys.index(b"GT")] = value
        self.annotations[col] = b":".join(values)

    def genotype_human_readable(self, annotation_headers: list[bytes],
                                error_if_not_found: bool = True,
                                sample_idx: int = 0) -> bytes:
        """BedpeLine::genotypeHumanReadable (BedpeFile.cpp:284-300)."""
        gt = self.genotype(annotation_headers, error_if_not_found, sample_idx)
        gt = gt.replace(b"|", b"/")
        table = {b"1/1": b"hom", b"0/1": b"het", b"1/0": b"het",
                 b"0/0": b"wt", b"": b"n/a", b"./.": b"n/a"}
        if gt not in table:
            raise ValueError(f"Unhandled SV genotype '{gt.decode()}'!")
        return table[gt]

    def genotype(self, annotation_headers: list[bytes],
                 error_if_not_found: bool = True, sample_idx: int = 0) -> bytes:
        try:
            format_idx = annotation_headers.index(b"FORMAT")
        except ValueError:
            if error_if_not_found:
                raise ValueError('Column "FORMAT" not found in annotation header!')
            return b""
        col = format_idx + 1 + sample_idx
        keys = self.annotations[format_idx].split(b":")
        values = self.annotations[col].split(b":")
        if b"GT" not in keys:
            if error_if_not_found:
                raise ValueError('Genotype ("GT") not found in FORMAT column!')
            return b""
        return values[keys.index(b"GT")]


class SampleInfo:
    def __init__(self, name: str):
        self.name = name
        self.properties: dict[str, str] = {}
        self.column_index = -1


class BedpeFile:
    def __init__(self):
        self.filename = ""
        self.headers: list[bytes] = []            # ## comment lines
        self.annotation_headers: list[bytes] = []  # header fields after col 6
        self.annotation_descriptions: dict[bytes, bytes] = {}
        self.sample_header_info: list[SampleInfo] = []
        self.lines: list[BedpeLine] = []

    def __len__(self):
        return len(self.lines)

    count = __len__

    def __getitem__(self, i) -> BedpeLine:
        return self.lines[i]

    def append(self, line: BedpeLine):
        self.lines.append(line)

    def remove_at(self, i: int):
        del self.lines[i]

    def annotation_index_by_name(self, name: bytes, error_on_mismatch: bool = True) -> int:
        matches = [i for i, h in enumerate(self.annotation_headers) if h == name]
        if len(matches) > 1:
            if error_on_mismatch:
                raise ValueError(f"Found multiple column annotations for "
                                 f"'{name.decode()}' in BEDPE file!")
            return -2
        if not matches:
            if error_on_mismatch:
                raise ValueError(f"Could not find column '{name.decode()}' in BEDPE file!")
            return -1
        return matches[0]

    def format(self) -> str:
        for comment in self.headers:
            if comment.startswith(b"##fileformat=BEDPE_TUMOR_NORMAL_PAIR"):
                return "somatic_tumor_normal"
            if comment.startswith(b"##fileformat=BEDPE_TUMOR_ONLY"):
                return "somatic_tumor_only"
            if comment.startswith(b"##fileformat=BEDPE_GERMLINE_MULTI"):
                return "germline_multi"
            if comment.startswith(b"##fileformat=BEDPE_GERMLINE_TRIO"):
                return "germline_trio"
        return "germline_single"

    def is_somatic(self) -> bool:
        return self.format() in ("somatic_tumor_normal", "somatic_tumor_only")

    def build(self) -> str:
        """BedpeFile::build (BedpeFile.cpp:638-660) — from ##reference=."""
        for line in self.headers:
            if line.startswith(b"##reference="):
                parts = line.split(b"/")
                if b"/DRAGEN/" in line:
                    return parts[-3].decode()
                return parts[-1].split(b".")[0].decode()
        return ""

    def caller(self) -> str:
        """BedpeFile::caller (BedpeFile.cpp:662-684) — from ##source=."""
        for line in self.headers:
            if line.startswith(b"##source=GenerateSVCandidates"):
                return "Manta"
            if line.startswith(b"##source=Sniffles"):
                return "Sniffles"
            if line.startswith(b"##source=DRAGEN_SV"):
                return "DRAGEN"
        raise ValueError(f"Could not determine caller from {self.filename}")

    def caller_version(self) -> str:
        """BedpeFile::callerVersion (BedpeFile.cpp:686-710)."""
        for line in self.headers:
            if line.startswith(b"##source=GenerateSVCandidates "):
                return line.strip().split(b" ")[1].decode()
            if line.startswith(b"##source=Sniffles2_"):
                return line.strip().split(b"_")[1].decode()
            if line.startswith(b"##DRAGENVersion="):
                i1 = line.index(b"SW:") + 3
                i2 = line.index(b",", i1)
                return line[i1:i2].strip().decode()
        raise ValueError(f"Could not determine caller version from {self.filename}")

    def calling_date(self):
        """BedpeFile::callingDate (BedpeFile.cpp:712-723) — ##fileDate=yyyyMMdd."""
        import datetime

        for line in self.headers:
            if line.startswith(b"##fileDate="):
                raw = line.split(b"=")[1].strip().decode()
                return datetime.datetime.strptime(raw, "%Y%m%d").date()
        raise ValueError(f"Could not determine calling date from {self.filename}")

    def get_infos(self, name: bytes) -> list:
        """BedpeFile::getInfos (BedpeFile.cpp:555-568)."""
        if b"=" not in name:
            name += b"="
        out = []
        for comment in self.headers:
            c = comment.replace(b"##", b"")
            if not c.startswith(name):
                continue
            out.append(_parse_info_field(c[len(name):]))
        return out

    def meta_info_description_by_id(self, name: bytes) -> dict[bytes, bytes]:
        """BedpeFile::metaInfoDescriptionByID (BedpeFile.cpp:570-584)."""
        out = {}
        for info in self.get_infos(name):
            id_ = info.get(b"ID", b"")
            desc = info.get(b"Description", b"")
            if id_ and desc:
                out[id_] = desc
        return out

    def annotation_description_by_name(self, name: bytes) -> bytes:
        """BedpeFile::annotationDescriptionByName (BedpeFile.h:285-288)."""
        return self.annotation_descriptions.get(name, b"")

    def find_match(self, sv: BedpeLine, deep_ins_compare: bool = True,
                   error_on_mismatch: bool = True,
                   compare_ci: bool = False) -> int:
        """BedpeFile::findMatch (BedpeFile.cpp:748-848) — exact/deep-INS/CI
        matching against this file's lines."""
        pos_min_q = min(sv.start1, sv.end1, sv.start2, sv.end2)
        pos_max_q = max(sv.start1, sv.end1, sv.start2, sv.end2)
        left_q = right_q = b""
        alt_a_idx = info_a_idx = -1
        if deep_ins_compare:
            alt_a_idx = self.annotation_index_by_name(b"ALT_A")
            info_a_idx = self.annotation_index_by_name(b"INFO_A")
            for entry in sv.annotations[info_a_idx].split(b";"):
                e = entry.strip()
                if e.startswith(b"LEFT_SVINSSEQ="):
                    left_q = e
                elif e.startswith(b"RIGHT_SVINSSEQ="):
                    right_q = e
        for i, line in enumerate(self.lines):
            if line.type != sv.type or line.chr1 != sv.chr1 or line.chr2 != sv.chr2:
                continue
            pos_min_r = min(line.start1, line.end1, line.start2, line.end2)
            pos_max_r = max(line.start1, line.end1, line.start2, line.end2)
            if sv.type == b"INS" and deep_ins_compare:
                if pos_min_q != pos_min_r or pos_max_q != pos_max_r:
                    continue
                if line.annotations[alt_a_idx] != sv.annotations[alt_a_idx]:
                    continue
                left_r = right_r = b""
                for entry in line.annotations[info_a_idx].split(b";"):
                    e = entry.strip()
                    if e.startswith(b"LEFT_SVINSSEQ="):
                        left_r = e
                    elif e.startswith(b"RIGHT_SVINSSEQ="):
                        right_r = e
                if left_q != left_r or right_q != right_r:
                    continue
                return i
            if compare_ci:
                if sv.type == b"INS":
                    if not (pos_min_r <= pos_max_q and pos_max_r >= pos_min_q):
                        continue
                else:
                    if not (line.start1 <= sv.end1 and line.end1 >= sv.start1):
                        continue
                    if not (line.start2 <= sv.end2 and line.end2 >= sv.start2):
                        continue
                return i
            if (line.start1 == sv.start1 and line.end1 == sv.end1
                    and line.start2 == sv.start2 and line.end2 == sv.end2):
                return i
        if error_on_mismatch:
            raise ValueError("No match found in given SV in BedpeFile!")
        return -1

    # ---- IO ----
    @staticmethod
    def load_header_only(filename: str) -> "BedpeFile":
        """BedpeFile::loadHeaderOnly."""
        return BedpeFile.from_file(filename, header_only=True)

    @staticmethod
    def from_file(filename: str, header_only: bool = False) -> "BedpeFile":
        import sys
        out = BedpeFile()
        out.filename = filename or "-"
        if filename in ("", "-", None):
            data = stdin_binary().read()
        else:
            opener = open
            if str(filename).endswith(".gz"):
                import gzip
                opener = gzip.open
            with opener(filename, "rb") as fh:
                data = fh.read()
        header_fields = []
        body = []
        for raw in data.split(b"\n"):
            line = raw.rstrip(b"\r")
            if not line.strip():
                continue
            if line.startswith(b"##"):
                out.headers.append(line)
                continue
            if line.startswith(b"#") and not header_fields:
                header_fields = line[1:].split(b"\t")
                continue
            body.append(line)

        for comment in out.headers:
            if comment.startswith(b"##DESCRIPTION="):
                parts = comment.split(b"=")
                if len(parts) < 3:
                    continue
                out.annotation_descriptions[parts[1]] = parts[2]

        out.annotation_headers = header_fields[6:]
        if out.format() in ("germline_single", "germline_multi", "germline_trio"):
            out._parse_sample_header_info()

        if header_only:
            return out

        i_type = out.annotation_index_by_name(b"TYPE")
        for line in body:
            fields = line.split(b"\t")
            if len(fields) < 6:
                raise ValueError("BEDPE file line with less than six fields "
                                 "found: '" + line.decode() + "'")
            t = fields[6 + i_type]
            if t not in SV_TYPES:
                raise ValueError(f"Unsupported structural variant type '{t.decode()}'!")
            out.lines.append(BedpeLine(
                fields[0], _parse_pos(fields[1]), _parse_pos(fields[2]),
                fields[3], _parse_pos(fields[4]), _parse_pos(fields[5]),
                t, fields[6:]))
        return out

    def _parse_sample_header_info(self):
        for raw in self.headers:
            line = raw.strip()
            if not line.startswith(b"##SAMPLE=<"):
                continue
            parts = line[10:-1].split(b",")
            i = 1
            while i < len(parts):
                if b"=" not in parts[i]:
                    parts[i - 1] += b"," + parts[i]
                    del parts[i]
                else:
                    i += 1
            for part in parts:
                sep = part.find(b"=")
                key = part[:sep].decode()
                value = part[sep + 1:].decode()
                if key == "ID":
                    self.sample_header_info.append(SampleInfo(value))
                elif self.sample_header_info:
                    self.sample_header_info[-1].properties[key] = value
        if not self.sample_header_info:
            i_format = self.annotation_index_by_name(b"FORMAT", False)
            if i_format >= 0 and i_format + 1 < len(self.annotation_headers):
                self.sample_header_info.append(
                    SampleInfo(self.annotation_headers[i_format + 1].decode()))
        for info in self.sample_header_info:
            info.column_index = self.annotation_index_by_name(info.name.encode())

    def sort(self):
        self.lines.sort(key=lambda l: l.sort_key())

    def header_line(self) -> bytes:
        return (b"#CHROM_A\tSTART_A\tEND_A\tCHROM_B\tSTART_B\tEND_B\t"
                + b"\t".join(self.annotation_headers))

    def store(self, filename: str):
        import sys
        out = []
        for comment in self.headers:
            out.append(comment)
        out.append(self.header_line())
        for line in self.lines:
            out.append(line.to_tsv())
        data = b"\n".join(out) + b"\n"
        if filename in ("", "-", None):
            stdout_binary().write(data)
        else:
            with open(filename, "wb") as fh:
                fh.write(data)

    def estimated_sv_size(self, index: int) -> int:
        """SVLEN from INFO_A if present; otherwise for INS the known
        left+right inserted bases; -1 for BND (BedpeFile.cpp:727-746)."""
        line = self.lines[index]
        if line.type == b"BND":
            return -1
        info_idx = self.annotation_index_by_name(b"INFO_A")
        sv_length = 0
        for entry in line.annotations[info_idx].split(b";"):
            if entry.startswith(b"SVLEN="):
                return abs(int(entry[6:]))
            if entry.startswith(b"LEFT_SVINSSEQ="):
                sv_length += len(entry) - 14
            if entry.startswith(b"RIGHT_SVINSSEQ="):
                sv_length += len(entry) - 15
        return sv_length
