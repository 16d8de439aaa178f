"""GSvar variant-list TSV reader (minimal).

Behavioral reference: ngs-bits ``VariantList`` GSvar loading
(cppNGS/VariantList.cpp): '##'-comment headers (##SAMPLE=<ID=...,Status=...>),
one '#chr start end ref obs [annotations...]' column header, TSV rows with
1-based start/end.
"""

from __future__ import annotations

import sys

from ngsbits_tpu.utils.stdio import stdout_binary
from dataclasses import dataclass, field

from ..core.chromosome import Chromosome


@dataclass
class VariantTranscript:
    """One coding_and_splicing transcript entry
    (VariantList.h:15-33, parse: VariantList.cpp:1386-1416)."""
    gene: bytes = b""
    id: bytes = b""
    type: bytes = b""
    impact: str = ""
    exon: bytes = b""
    hgvs_c: bytes = b""
    hgvs_p: bytes = b""
    domain: bytes = b""

    def id_without_version(self) -> bytes:
        return self.id.split(b".")[0]

    def to_string(self, sep: bytes = b":") -> bytes:
        return sep.join([self.gene, self.id, self.type, self.impact.encode(),
                         self.exon, self.hgvs_c, self.hgvs_p, self.domain])


def parse_transcript_string(text: bytes,
                            allow_old_format_with_7_columns: bool = False
                            ) -> list[VariantTranscript]:
    """Variant::parseTranscriptString (VariantList.cpp:1386-1416)."""
    out = []
    for entry in text.split(b","):
        entry = entry.strip()
        if not entry:
            continue
        parts = entry.split(b":")
        if allow_old_format_with_7_columns:
            parts.append(b"")
        if len(parts) < 8:
            raise ValueError(
                "Could not split transcript information from "
                f"'coding_and_splicing' column to 8 parts. {len(parts)} parts "
                f"found in: {entry.decode(errors='replace')}")
        out.append(VariantTranscript(
            gene=parts[0].strip(), id=parts[1].strip(), type=parts[2].strip(),
            impact=parts[3].strip().decode(), exon=parts[4].strip(),
            hgvs_c=parts[5].strip(), hgvs_p=parts[6].strip(),
            domain=parts[7].strip()))
    return out


def vcf_to_gsvar(chr_, pos: int, ref: bytes, alt: bytes) -> "GSvarVariant":
    """Variant::Variant(const VcfLine&) + Variant::normalize('-', true)
    (VariantList.cpp:49-64, 1283+): VCF coordinates to GSvar TSV convention
    ('-' for empty alleles, insertion anchored on the previous base)."""
    from ..core.normalize import trim_variant

    if b"," in alt:
        raise ValueError("Cannot convert multi-allelic VCF variant to GSvar "
                         "variant!")
    start, ref, obs = trim_variant(pos, ref, alt)
    end = start + len(ref) - 1
    if not ref:
        ref = b"-"
        end += 1
    if not obs:
        obs = b"-"
    if ref == b"-":
        start -= 1
        end -= 1
    c = chr_ if isinstance(chr_, Chromosome) else Chromosome(chr_)
    return GSvarVariant(c, start, end, ref, obs, [])


@dataclass
class GSvarVariant:
    chr: Chromosome
    start: int
    end: int
    ref: bytes
    obs: bytes
    annotations: list  # columns after the 5 fixed ones
    filters: list = None  # tags from the 'filter' column (Variant.cpp ctor)

    def __post_init__(self):
        if self.filters is None:
            self.filters = []
        # Variant ctor trims whitespace of the sequences (VariantList.cpp:29-30)
        self.ref = self.ref.strip()
        self.obs = self.obs.strip()

    def __lt__(self, rhs: "GSvarVariant") -> bool:
        """Variant::operator< (VariantList.cpp:109-121)."""
        return self.sort_key() < rhs.sort_key()

    def __eq__(self, rhs) -> bool:
        return isinstance(rhs, GSvarVariant) and self.sort_key() == rhs.sort_key()

    def overlaps_with(self, *args) -> bool:
        """Variant::overlapsWith — (chr,start,end), (start,end) or BedLine."""
        if len(args) == 1:  # BedLine
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

    def normalize(self, empty_seq: bytes = b"", to_gsvar_format: bool = False):
        """Variant::normalize (VariantList.cpp) — member variant of the
        static trim; optional GSvar insertion anchoring."""
        from ..core.normalize import trim_variant

        self.start, self.ref, self.obs = trim_variant(self.start, self.ref,
                                                      self.obs)
        self.end = self.start + len(self.ref) - 1
        if not self.ref:
            self.ref = empty_seq
            self.end += 1
        if not self.obs:
            self.obs = empty_seq
        if to_gsvar_format and self.ref == empty_seq:
            self.start -= 1
            self.end -= 1

    def add_filter(self, tag: bytes, filter_column_index: int):
        """Variant::addFilter (VariantList.cpp:85-103)."""
        tag = tag.strip()
        value = self.annotations[filter_column_index].strip().upper()
        if not value or value in (b".", b"PASS", b"PASSED"):
            self.annotations[filter_column_index] = tag
        else:
            self.annotations[filter_column_index] += b";" + tag
        self.filters.append(tag)

    @staticmethod
    def from_string(text: str) -> "GSvarVariant":
        """Variant::fromString — GSvar tab format or human-readable
        'chr:start-end ref>obs'."""
        import re

        t = text.strip().replace("\t", " ").replace(":", " ").replace(">", " ")
        t = re.sub(r"-([0-9])", r" \1", t)
        t = re.sub(r"([0-9]+)", r"\1 ", t)
        parts = " ".join(t.split()).split(" ")
        if len(parts) != 5:
            raise ValueError(f"Input text has {len(parts)} part(s), but must "
                             "consist of 5 parts (chr, start, end, ref, obs)!")
        return GSvarVariant(Chromosome(parts[0]), int(parts[1]), int(parts[2]),
                            parts[3].encode(), parts[4].encode(), [])

    def set_filters_from_column(self, filter_index: int):
        """Variant(chr,start,...,filter_index) (VariantList.cpp:25-47):
        ';'-split tags minus empty/'.'/PASS/PASSED. Bug-faithful: only
        filter_index > 0 populates."""
        self.filters = []
        if filter_index > 0:
            for tag in self.annotations[filter_index].split(b";"):
                tag = tag.strip()
                if tag and tag != b"." and tag.upper() not in (b"PASS", b"PASSED"):
                    self.filters.append(tag)

    def sort_key(self):
        """VariantList::LessComparator (VariantList.cpp:543-557)."""
        return (self.chr.num, self.start, self.end, self.ref, self.obs)

    def to_string(self) -> str:
        return f"{self.chr.str}:{self.start}-{self.end} {self.ref.decode()}>{self.obs.decode()}"


class GSvarFile:
    def __init__(self):
        self.comments: list[bytes] = []                 # ## lines except DESCRIPTION/FILTER
        self.descriptions: list[tuple[str, str]] = []   # column descriptions, load order
        self.filters: dict[str, str] = {}               # FILTER id -> description
        self.columns: list[str] = []          # annotation column names (after obs)
        self.variants: list[GSvarVariant] = []
        self.samples: list[tuple[str, str]] = []  # (id, status)

    def add_description(self, name: str, desc: str):
        """VariantList::annotationDescriptions().append — replaces an existing
        description of the same column."""
        for i, (n, _d) in enumerate(self.descriptions):
            if n == name:
                self.descriptions[i] = (name, desc)
                return
        self.descriptions.append((name, desc))

    @staticmethod
    def from_file(filename: str, roi=None, header_only: bool = False) -> "GSvarFile":
        out = GSvarFile()
        with open(filename, "rb") as fh:
            data = fh.read()
        roi_idx = None
        if roi is not None and len(roi):
            from ..core.intervals import BedFile, ChromosomalIndex
            rs = BedFile()
            rs.lines = sorted(roi.lines, key=lambda l: l.sort_key())
            roi_idx = ChromosomalIndex(rs)
        chr_cache: dict[bytes, Chromosome] = {}
        for raw in data.split(b"\n"):
            line = raw.rstrip(b"\r")
            if not line:
                continue
            if line.startswith(b"##"):
                if line.startswith(b"##DESCRIPTION=") and line.count(b"=") >= 2:
                    _tag, name, desc = line.split(b"=", 2)
                    out.descriptions.append((name.decode(), desc.decode()))
                    continue
                if line.startswith(b"##FILTER=") and line.count(b"=") >= 2:
                    _tag, fid, desc = line.split(b"=", 2)
                    out.filters[fid.decode()] = desc.decode()
                    continue
                out.comments.append(line)
                if line.startswith(b"##SAMPLE=<"):
                    inner = line[10:].rstrip(b">")
                    kv = {}
                    for part in inner.split(b","):
                        if b"=" in part:
                            k, v = part.split(b"=", 1)
                            kv[k.decode()] = v.decode()
                    out.samples.append((kv.get("ID", ""),
                                        kv.get("Status", kv.get("DiseaseStatus", ""))))
                continue
            if line.startswith(b"#"):
                out.columns = [c.decode() for c in line[1:].split(b"\t")[5:]]
                continue
            if header_only:
                continue
            fields = line.split(b"\t")
            cb = fields[0]
            if cb not in chr_cache:
                chr_cache[cb] = Chromosome(cb)
            v = GSvarVariant(chr_cache[cb], int(fields[1]), int(fields[2]),
                             fields[3], fields[4], fields[5:])
            fi = out.columns.index("filter") if "filter" in out.columns else -1
            v.set_filters_from_column(fi)
            if roi_idx is not None:
                if len(roi_idx.matching_indices(v.chr, v.start, v.end)) == 0:
                    continue
            out.variants.append(v)
        return out

    def __len__(self):
        return len(self.variants)

    count = __len__

    def __getitem__(self, i) -> GSvarVariant:
        return self.variants[i]

    def append(self, v: GSvarVariant):
        self.variants.append(v)

    def annotation_index(self, name: str) -> int:
        for i, c in enumerate(self.columns):
            if c == name:
                return i
        raise KeyError(f"Could not find annotation column '{name}'")

    def annotation_index_by_name(self, name: str, exact_match: bool = True,
                                 error_on_mismatch: bool = True) -> int:
        """VariantList::annotationIndexByName (VariantList.cpp:653-694) —
        case-insensitive exact or substring column lookup."""
        nl = name.lower()
        matches = [i for i, c in enumerate(self.columns)
                   if (exact_match and c.lower() == nl)
                   or (not exact_match and nl in c.lower())]
        if not matches:
            if error_on_mismatch:
                raise ValueError(f"Could not find column '{name}' in variant list!")
            return -1
        if len(matches) > 1:
            if error_on_mismatch:
                raise ValueError(f"Found multiple columns for '{name}' in "
                                 "variant list!")
            return -2
        return matches[0]

    def annotation_description_by_name(self, name: str,
                                       error_if_not_found: bool = True) -> str:
        for n, d in self.descriptions:
            if n == name:
                return d
        if error_if_not_found:
            raise ValueError(f"Could not find annotation description '{name}'!")
        return ""

    def sort(self):
        """VariantList::sort — chr/start/end/ref/obs."""
        self.variants.sort(key=lambda v: v.sort_key())

    def is_sorted(self) -> bool:
        return all(self.variants[i].sort_key() <= self.variants[i + 1].sort_key()
                   for i in range(len(self.variants) - 1))

    def sort_by_file(self, filename: str):
        """VariantList::sortByFile (LessComparatorByFile,
        VariantList.cpp:497-536) — chromosome rank from a FAI-like file."""
        rank = {}
        with open(filename, "rb") as fh:
            for i, line in enumerate(fh):
                c = Chromosome(line.split(b"\t")[0].strip())
                rank[c.num] = i + 1

        def key(v):
            if v.chr.num not in rank:
                raise ValueError(f"Reference file for sorting does not contain "
                                 f"chromosome '{v.chr.str}'!")
            return (rank[v.chr.num], v.start, v.end, v.ref, v.obs)

        self.variants.sort(key=key)

    def remove_duplicates(self):
        """VariantList::removeDuplicates (VariantList.cpp:1030-1052) — sort,
        then drop consecutive (chr,start,ref,obs) duplicates."""
        self.sort()
        out = []
        for i in range(len(self.variants) - 1):
            a, b = self.variants[i], self.variants[i + 1]
            if (a.chr.num, a.start, a.obs, a.ref) != (b.chr.num, b.start, b.obs, b.ref):
                out.append(a)
        if self.variants:
            out.append(self.variants[-1])
        self.variants = out

    def remove_annotation(self, index: int):
        """VariantList::removeAnnotation — drop a column everywhere."""
        if index < 0 or index >= len(self.columns):
            raise ValueError(f"Invalid annotation index {index} in "
                             "removeAnnotation!")
        name = self.columns[index]
        del self.columns[index]
        self.descriptions = [(n, d) for n, d in self.descriptions if n != name]
        for v in self.variants:
            if index < len(v.annotations):
                del v.annotations[index]

    def add_annotation(self, name: str, description: str,
                       default_value: bytes = b"") -> int:
        """VariantList::addAnnotation — errors if the column exists."""
        if name in self.columns:
            raise ValueError(f"Annotation '{name}' already present in "
                             "variant list!")
        if isinstance(default_value, str):
            default_value = default_value.encode()
        self.columns.append(name)
        self.add_description(name, description)
        for v in self.variants:
            v.annotations.append(default_value)
        return len(self.columns) - 1

    def add_annotation_if_missing(self, name: str, description: str,
                                  default_value: bytes = b"") -> int:
        """VariantList::addAnnotationIfMissing — updates the description of an
        existing column."""
        if name in self.columns:
            self.add_description(name, description)
            return self.columns.index(name)
        return self.add_annotation(name, description, default_value)

    def remove_annotation_by_name(self, name: str, exact_match: bool = True,
                                  error_on_mismatch: bool = True):
        index = self.annotation_index_by_name(name, exact_match, error_on_mismatch)
        if index >= 0:
            self.remove_annotation(index)

    def copy_meta_data(self, other: "GSvarFile"):
        """VariantList::copyMetaData — header state without the variants."""
        self.comments = list(other.comments)
        self.descriptions = list(other.descriptions)
        self.filters = dict(other.filters)
        self.columns = list(other.columns)
        self.samples = list(other.samples)

    def analysis_type(self) -> str:
        """VariantList::type — ##ANALYSISTYPE= with single-sample fallback."""
        for c in self.comments:
            if c.startswith(b"##ANALYSISTYPE="):
                return c[len(b"##ANALYSISTYPE="):].strip().decode()
        return "GERMLINE_SINGLESAMPLE"

    _TYPE_HUMAN = {"GERMLINE_SINGLESAMPLE": "single-sample analysis",
                   "GERMLINE_TRIO": "trio analysis",
                   "GERMLINE_MULTISAMPLE": "multi-sample analysis",
                   "SOMATIC_SINGLESAMPLE": "tumor-only analysis",
                   "SOMATIC_PAIR": "tumor/normal analysis",
                   "CFDNA": "cfDNA analysis"}

    def analysis_name(self) -> str:
        """VariantList::analysisName (VariantList.cpp:569-580)."""
        names = [sid for sid, _status in self.samples]
        return self._TYPE_HUMAN[self.analysis_type()] + " " + "/".join(names)

    def build(self) -> str:
        """VariantList::build (VariantList.cpp:1169-1180) — hg19 fallback."""
        for c in self.comments:
            if c.startswith(b"##GENOME_BUILD="):
                raw = c[len(b"##GENOME_BUILD="):].strip().decode()
                return {"GRCh37": "hg19", "hg19": "hg19",
                        "GRCh38": "hg38", "hg38": "hg38"}.get(raw, raw)
        return "hg19"

    def creation_date(self):
        """VariantList::getCreationDate — None if unset (invalid QDate)."""
        import datetime

        for c in self.comments:
            if c.startswith(b"##CREATION_DATE="):
                raw = c[len(b"##CREATION_DATE="):].strip().decode()
                return datetime.datetime.strptime(raw, "%Y-%m-%d").date()
        return None

    def caller(self) -> str:
        """VariantList::caller — first word of ##SOURCE=."""
        for c in self.comments:
            if c.startswith(b"##SOURCE="):
                return c[len(b"##SOURCE="):].strip().split(b" ")[0].decode()
        return ""

    def caller_version(self) -> str:
        for c in self.comments:
            if c.startswith(b"##SOURCE="):
                parts = c[len(b"##SOURCE="):].strip().split(b" ", 1)
                return parts[1].strip().decode() if len(parts) > 1 else ""
        return ""

    def calling_date(self):
        """VariantList::callingDate — date part of ##CALLING_DATE=."""
        import datetime

        for c in self.comments:
            if c.startswith(b"##CALLING_DATE="):
                raw = c[len(b"##CALLING_DATE="):].strip().decode()[:10]
                return datetime.datetime.strptime(raw, "%Y-%m-%d").date()
        return None

    def pipeline(self) -> str:
        """VariantList::getPipeline — the ##PIPELINE= comment ('n/a' if absent)."""
        for c in self.comments:
            if c.startswith(b"##PIPELINE="):
                return c[len(b"##PIPELINE="):].decode().strip()
        return "n/a"

    def transcript_annotations(self, variant, column_index: int) -> list[VariantTranscript]:
        """Variant::transcriptAnnotations (VariantList.h:221-224)."""
        if column_index < 0:
            return []
        return parse_transcript_string(variant.annotations[column_index])

    def affected_sample_columns(self) -> list[int]:
        out = []
        for sid, status in self.samples:
            if status.lower() == "affected":
                try:
                    out.append(self.annotation_index(sid))
                except KeyError:
                    pass
        return out


    def sample_columns(self, affected: bool) -> list[int]:
        """Annotation-column indices of affected/control samples
        (SampleHeaderInfo::sampleColumns, NGSHelper.cpp:1177-1188; affected =
        Status/DiseaseStatus == 'affected', ##SAMPLE headers)."""
        out = []
        for raw in self.comments:
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
            props = {}
            name = ""
            for part in parts:
                sep = part.find(b"=")
                k = part[:sep].decode()
                v = part[sep + 1:].decode()
                if k == "ID":
                    name = v
                else:
                    props[k.lower()] = v.lower()
            is_affected = props.get("status") == "affected" or props.get("diseasestatus") == "affected"
            if is_affected == affected:
                try:
                    out.append(self.annotation_index(name))
                except KeyError:
                    pass
        return out

    def store(self, filename: str | None):
        """VariantList::store (VariantList.cpp:937-1004): comments, then
        ##DESCRIPTION lines, then ##FILTER lines (sorted by id), then header
        and rows (values with newlines/tabs replaced by spaces)."""
        lines = [c for c in self.comments if not c.startswith(b"##fileformat=")]
        for name, desc in self.descriptions:
            if not desc or name == ".":
                continue
            lines.append(f"##DESCRIPTION={name}={desc}".encode())
        for fid in sorted(self.filters):
            lines.append(f"##FILTER={fid}={self.filters[fid]}".encode())
        lines.append(b"#chr\tstart\tend\tref\tobs\t"
                     + b"\t".join(c.encode() for c in self.columns))
        for v in self.variants:
            lines.append(b"\t".join(
                [v.chr.str.encode(), str(v.start).encode(),
                 str(v.end).encode(), v.ref, v.obs]
                + [a.replace(b"\n", b" ").replace(b"\t", b" ") for a in v.annotations]))
        data = b"".join(l + b"\n" for l in lines)
        if filename:
            with open(filename, "wb") as fh:
                fh.write(data)
        else:
            stdout_binary().write(data)
