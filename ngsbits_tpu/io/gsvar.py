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


@dataclass
class GSvarVariant:
    chr: Chromosome
    start: int
    end: int
    ref: bytes
    obs: bytes
    annotations: list  # columns after the 5 fixed ones

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
    def from_file(filename: str, roi=None) -> "GSvarFile":
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
            fields = line.split(b"\t")
            cb = fields[0]
            if cb not in chr_cache:
                chr_cache[cb] = Chromosome(cb)
            v = GSvarVariant(chr_cache[cb], int(fields[1]), int(fields[2]),
                             fields[3], fields[4], fields[5:])
            if roi_idx is not None:
                if len(roi_idx.matching_indices(v.chr, v.start, v.end)) == 0:
                    continue
            out.variants.append(v)
        return out

    def annotation_index(self, name: str) -> int:
        for i, c in enumerate(self.columns):
            if c == name:
                return i
        raise KeyError(f"Could not find annotation column '{name}'")

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
