"""ClinCNV copy-number variant list (TSV).

Behavioral reference: ngs-bits cppNGS/CnvList.cpp:108-295 (ANALYSISTYPE
header, per-type column handling, annotation extraction) and
CopyNumberVariant::copyNumber (CnvList.cpp:47-67).
"""

from __future__ import annotations

import sys

from ngsbits_tpu.utils.stdio import stdin_binary, stdout_binary

from ..core.chromosome import Chromosome

_TYPES = {
    b"CLINCNV_GERMLINE_SINGLE": "germline_single",
    b"CLINCNV_GERMLINE_MULTI": "germline_multi",
    b"CLINCNV_TUMOR_NORMAL_PAIR": "tumor_normal",
    b"CLINCNV_TUMOR_ONLY": "tumor_only",
}
_TYPE_STR = {v: k for k, v in _TYPES.items()}


class CopyNumberVariant:
    __slots__ = ("chr", "start", "end", "num_regs", "genes", "annotations")

    def __init__(self, chr_, start, end, num_regs=0, genes=(), annotations=()):
        self.chr = chr_ if isinstance(chr_, Chromosome) else Chromosome(chr_)
        self.start = start
        self.end = end
        self.num_regs = num_regs
        self.genes = list(genes)
        self.annotations = list(annotations)

    def copy_number(self, annotation_headers: list[bytes],
                    throw_if_not_found: bool = True) -> int:
        for i, h in enumerate(annotation_headers):
            if h in (b"tumor_CN_change", b"CN_change"):
                return int(self.annotations[i])
        if throw_if_not_found:
            raise ValueError("Copy-number could not be determined for CNV!")
        return -1

    def to_string(self) -> str:
        return f"{self.chr.str}:{self.start}-{self.end}"


class CnvList:
    def __init__(self):
        self.type = "invalid"
        self.comments: list[bytes] = []
        self.annotation_headers: list[bytes] = []
        self.annotation_header_desc: dict[bytes, bytes] = {}
        self.variants: list[CopyNumberVariant] = []

    def __len__(self):
        return len(self.variants)

    count = __len__

    def __getitem__(self, i) -> CopyNumberVariant:
        return self.variants[i]

    def build(self) -> str:
        """CnvList::build (CnvList.cpp:440-452) — '##GENOME_BUILD=' header."""
        for line in self.comments:
            if line.startswith(b"##GENOME_BUILD="):
                return line.split(b"=")[-1].strip().decode()
        return ""

    def caller_as_string(self) -> str:
        """CnvList::callerAsString — by ANALYSISTYPE ('ClinCNV')."""
        for line in self.comments:
            if line.startswith(b"##ANALYSISTYPE=CLINCNV_"):
                return "ClinCNV"
        if self.type in ("germline_single", "germline_multi", "germline_trio",
                         "tumor_normal", "tumor_only", "somatic_pair",
                         "somatic_single"):
            return "ClinCNV"
        raise ValueError("CNV list type not handled in CnvList::caller()!")

    def caller_version(self) -> str:
        """CnvList::callerVersion (CnvList.cpp:408-421) — '<caller> version:'."""
        for line in self.comments:
            if b":" not in line:
                continue
            key, _, value = line[2:].partition(b":")
            if key.endswith(b" version"):
                return value.strip().decode()
        raise ValueError("CNV caller version could not be determined!")

    def calling_date(self) -> str:
        """CnvList::callingDate (CnvList.cpp:424-438) — ISO yyyy-mm-dd."""
        for line in self.comments:
            if b":" not in line:
                continue
            key, _, value = line[2:].partition(b":")
            if key.endswith(b" finished on"):
                return value.strip()[:10].decode()
        raise ValueError("CNV calling data could not be determined!")

    def qc_metric(self, name: str, throw_if_missing: bool = True) -> str:
        """CnvList::qcMetric (CnvList.cpp:473-506) — also matches keys with a
        processed-sample-name prefix (trio output)."""
        value = b""
        name_b = name.encode()
        for comment in self.comments:
            if b":" not in comment:
                continue
            body = comment[2:]
            sep = body.index(b":")
            key = body[:sep]
            if key == name_b:
                value = body[sep + 1:].strip()
            key2 = b" ".join(key.split(b" ")[1:])
            if key2 == name_b:
                value = body[sep + 1:].strip()
        if not value and throw_if_missing:
            raise ValueError(f"Cannot find QC metric '{name}' in CNV list header!")
        return value.decode()

    def find_match(self, cnv: "CopyNumberVariant", copy_number: int = -1,
                   fuzzy_match: bool = False) -> int:
        """CnvList::findMatch (CnvList.cpp:572-604) — exact or ≥90%-reciprocal
        overlap match, optionally constrained to a copy number."""
        for i, v in enumerate(self.variants):
            if v.chr == cnv.chr and v.start == cnv.start and v.end == cnv.end:
                if copy_number >= 0 and v.copy_number(self.annotation_headers) != copy_number:
                    continue
                return i
            if fuzzy_match and v.chr == cnv.chr and v.start <= cnv.end and v.end >= cnv.start:
                overlap = min(v.end, cnv.end) - max(v.start, cnv.start)
                if (overlap / (cnv.end - cnv.start) < 0.9
                        or overlap / (v.end - v.start) < 0.9):
                    continue
                if copy_number >= 0 and v.copy_number(self.annotation_headers) != copy_number:
                    continue
                return i
        return -1

    def annotation_index_by_name(self, name: bytes, throw_on_error: bool = True) -> int:
        matches = [i for i, h in enumerate(self.annotation_headers) if h == name]
        if len(matches) != 1:
            if throw_on_error:
                raise ValueError(f"Could not find unique column '{name.decode()}' "
                                 f"in CNV list!")
            return -1
        return matches[0]

    @staticmethod
    def from_file(filename: str, header_only: bool = False) -> "CnvList":
        out = CnvList()
        if filename in ("", "-", None):
            data = stdin_binary().read()
        else:
            with open(filename, "rb") as fh:
                data = fh.read()

        comments = []
        header_fields: list[bytes] = []
        body = []
        for raw in data.split(b"\n"):
            line = raw.rstrip(b"\r")
            if not line.strip():
                continue
            if line.startswith(b"##"):
                comments.append(line)
            elif line.startswith(b"#") and not header_fields:
                header_fields = line[1:].split(b"\t")
            else:
                body.append(line)

        for line in comments:
            if line.startswith(b"##ANALYSISTYPE="):
                t = line[len(b"##ANALYSISTYPE="):].strip()
                if t not in _TYPES:
                    raise ValueError(f"CNV file '{filename}' contains unknown "
                                     f"analysis type: {t.decode()}")
                out.type = _TYPES[t]
            elif line.startswith(b"##DESCRIPTION="):
                parts = line.strip().split(b"=")
                if len(parts) > 2:
                    out.annotation_header_desc[parts[1]] = parts[2]
            else:
                out.comments.append(line)
        if out.type == "invalid":
            raise ValueError(f"CNV file '{filename}' is outdated. It does not "
                             "contain an ##ANALYSISTYPE header line. "
                             "Please re-run CNV calling!")

        def col(name: bytes, mandatory: bool) -> int:
            try:
                return header_fields.index(name)
            except ValueError:
                if mandatory:
                    raise ValueError(f"Could not find column '{name.decode()}' "
                                     f"in CNV file!")
                return -1

        anno_idx = list(range(len(header_fields)))

        def drop(i):
            if i in anno_idx:
                anno_idx.remove(i)

        i_chr = col(b"chr", True); drop(i_chr)
        i_start = col(b"start", True); drop(i_start)
        i_end = col(b"end", True); drop(i_end)
        i_genes = col(b"genes", False); drop(i_genes)
        if out.type == "germline_single":
            i_region_count = col(b"no_of_regions", False); drop(i_region_count)
            drop(col(b"length_KB", True))
        elif out.type == "germline_multi":
            i_region_count = col(b"no_of_regions", False)
            if i_region_count < 0:
                i_region_count = -2
            drop(col(b"sample", True))
            drop(col(b"size", True))
        elif out.type == "tumor_normal":
            i_region_count = col(b"number_of_regions", False); drop(i_region_count)
            drop(col(b"sample", True))
            drop(col(b"size", True))
        else:  # tumor_only
            i_region_count = col(b"no_of_regions", False); drop(i_region_count)
            drop(col(b"length_KB", True))
        if i_region_count == -1:
            raise ValueError("No column with region/exon count found!")

        out.annotation_headers = [header_fields[i] for i in anno_idx]

        if not header_only:
            for line in body:
                parts = line.split(b"\t")
                region_count = 0
                if i_region_count >= 0:
                    try:
                        region_count = int(parts[i_region_count])
                    except ValueError:
                        pass
                genes = []
                if i_genes != -1:
                    # reference keeps genes as a GeneSet: trimmed, UPPERCASED,
                    # sorted, deduplicated (GeneSet::insert)
                    genes = sorted({g.strip().upper()
                                    for g in parts[i_genes].split(b",") if g.strip()})
                annos = [parts[i] for i in anno_idx]
                out.variants.append(CopyNumberVariant(
                    parts[i_chr], int(parts[i_start]), int(parts[i_end]),
                    region_count, genes, annos))
        return out


def _store_cnv_list(self, filename: str | None):
    """CnvList::store (CnvList.cpp:255-366): reinsert the type-specific
    derived columns (regions/length/genes) into the annotation layout."""
    if self.type == "invalid":
        raise ValueError("Invalid CnvListType! Cannot create file.")
    lines = [b"##ANALYSISTYPE=" + _TYPE_STR[self.type]]
    lines.extend(self.comments)
    for header in self.annotation_headers:
        desc = self.annotation_header_desc.get(header, b"")
        if desc.strip():
            lines.append(b"##DESCRIPTION=" + header + b"=" + desc)

    header_line = list(self.annotation_headers)
    if self.type == "germline_single":
        header_line.insert(2, b"no_of_regions")
        header_line.insert(3, b"length_KB")
        header_line.insert(5, b"genes")
    elif self.type == "germline_multi":
        header_line.insert(0, b"sample")
        header_line.insert(1, b"size")
        header_line.insert(9, b"genes")
    elif self.type == "tumor_normal":
        header_line.insert(0, b"sample")
        header_line.insert(1, b"size")
        header_line.insert(9, b"number_of_regions")
        header_line.insert(10, b"genes")
    else:  # tumor_only
        header_line.insert(5, b"no_of_regions")
        header_line.insert(6, b"length_KB")
        header_line.insert(8, b"genes")
    lines.append(b"#chr\tstart\tend\t" + b"\t".join(header_line))

    from decimal import ROUND_HALF_UP, Decimal

    def kb(v):
        d = Decimal(v).quantize(Decimal("0.001"), rounding=ROUND_HALF_UP)
        return f"{d:.3f}".rjust(8).encode()

    for v in self.variants:
        annos = list(v.annotations)
        size = v.end - v.start + 1
        if self.type == "germline_single":
            annos.insert(2, str(v.num_regs).encode())
            annos.insert(3, kb((size - 1) / 1000.0))
            annos.insert(5, b",".join(v.genes))
        elif self.type == "germline_multi":
            annos.insert(0, b"multi")
            annos.insert(1, str(size - 1).encode())
            annos.insert(9, b", ".join(v.genes))
        elif self.type == "tumor_normal":
            annos.insert(0, b"somatic")
            annos.insert(1, str(size).encode())
            annos.insert(9, str(v.num_regs).encode())
            annos.insert(10, b",".join(v.genes))
        else:
            annos.insert(5, str(v.num_regs).encode())
            annos.insert(6, kb((size - 1) / 1000.0))
            annos.insert(8, b",".join(v.genes))
        lines.append(v.chr.str_normalized(True).encode() + b"\t"
                     + str(v.start).encode() + b"\t" + str(v.end).encode()
                     + b"\t" + b"\t".join(annos))

    data = b"".join(l + b"\n" for l in lines)
    if filename:
        with open(filename, "wb") as fh:
            fh.write(data)
    else:
        stdout_binary().write(data)


CnvList.store = _store_cnv_list
