"""BEDPE structural-variant tools.

Behavioral reference: ngs-bits src/BedpeSort, src/BedpeToBed, src/BedpeFilter,
src/BedpeAnnotateFromBed, src/BedpeExtractGenotype, src/BedpeExtractInfoField
main.cpp files.
"""

from __future__ import annotations

import sys

from ngsbits_tpu.utils.stdio import stdout_binary
from urllib.parse import unquote

from ..core.intervals import BedFile, BedLine, ChromosomalIndex
from ..io.bedpe import BedpeFile
from .toolbase import ToolBase, ToolError


def _write_buffer(out: str, buf: list[bytes]):
    data = b"".join(l + b"\n" for l in buf)
    if out:
        with open(out, "wb") as fh:
            fh.write(data)
    else:
        stdout_binary().write(data)


class BedpeSortTool(ToolBase):
    name = "BedpeSort"
    description = "Sort a BEDPE file according to chromosomal position."

    def setup(self):
        self.add_infile("in", "Input BEDPE file.")
        self.add_outfile("out", "Output BEDPE file.")

    def main(self):
        f = BedpeFile.from_file(self.get("in"))
        f.sort()
        f.store(self.get("out"))


class BedpeToBedTool(ToolBase):
    name = "BedpeToBed"
    description = "Converts a BEDPE file into BED file."

    def setup(self):
        self.add_infile("in", "Input BEDPE file.")
        self.add_outfile("out", "Output BED file.")
        self.add_flag("merge", "Merge the resulting BED file.")

    def main(self):
        in_file = BedpeFile.from_file(self.get("in"))
        out_file = BedFile()
        for line in in_file.lines:
            region = line.affected_region()
            for bed_line in region.lines:
                bed_line.annotations.append(line.type)
                out_file.append(bed_line)
        out_file.sort()
        if self.get_flag("merge"):
            out_file.merge()
        out_file.store(self.get("out"))


class BedpeFilterTool(ToolBase):
    name = "BedpeFilter"
    description = "Filters a BEDPE file by region."

    def setup(self):
        self.add_infile("in", "Input BEDPE file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output BEDPE file. If unset, writes to STDOUT.", optional=True)
        self.add_infile("bed", "BED file that is used as ROI. Only one of the SV breakpoint has to be in the target region!", optional=True)

    def main(self):
        bed = self.get("bed")
        if not bed:
            raise ToolError("-bed parameter has to be provided")
        f = BedpeFile.from_file(self.get("in"))
        roi = BedFile.from_file(bed)
        roi.sort()
        idx = ChromosomalIndex(roi)
        keep = []
        for line in f.lines:
            region = line.affected_region()
            if any(len(idx.matching_indices(r.chr, r.start, r.end))
                   for r in region.lines):
                keep.append(line)
        f.lines = keep
        f.store(self.get("out"))


class BedpeAnnotateFromBedTool(ToolBase):
    name = "BedpeAnnotateFromBed"
    description = "Annotates a BEDPE file with information from a BED file."

    def setup(self):
        self.add_infile("bed", "BED file that is used as annotation source.")
        self.add_infile("in", "Input BEDPE file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output BEDPE file. If unset, writes to STDOUT.", optional=True)
        self.add_int("col", "Annotation source column.", optional=True, default=4)
        self.add_string("col_name", "Name of the annotated column", optional=True, default="ANNOTATION")
        self.add_flag("no_duplicates", "Remove duplicate annotations if several intervals from 'bed' overlap.")
        self.add_flag("url_decode", "Decode URL encoded characters.")
        self.add_flag("replace_underscore", "Replaces underscores with spaces in the annotation column.")
        self.add_flag("max_value", "Select maximum value if several intervals from 'bed' overlap. (only for numeric columns)")
        self.add_flag("only_breakpoints", "Only annotate overlaps with the confidence intervall of the break points.")

    def main(self):
        i_col = self.get_int("col") - 4
        col_name = self.get("col_name").encode()
        no_duplicates = self.get_flag("no_duplicates")
        url_decode = self.get_flag("url_decode")
        replace_underscore = self.get_flag("replace_underscore")
        max_value = self.get_flag("max_value")
        only_breakpoints = self.get_flag("only_breakpoints")

        anno_file = BedFile.from_file(self.get("bed"))
        if not anno_file.is_sorted():
            anno_file.sort()
        anno_index = ChromosomalIndex(anno_file)

        f = BedpeFile.from_file(self.get("in"))
        i_annotation = f.annotation_index_by_name(col_name, False)

        buf = list(f.headers)
        header = list(f.annotation_headers)
        if i_annotation < 0:
            header.append(col_name)
        buf.append(b"#CHROM_A\tSTART_A\tEND_A\tCHROM_B\tSTART_B\tEND_B\t"
                   + b"\t".join(header))

        for line in f.lines:
            if only_breakpoints:
                region = BedFile()
                region.append(BedLine(line.chr1, line.start1 + 1, line.end1 + 1))
                if line.type != b"INS":
                    region.append(BedLine(line.chr2, line.start2 + 1, line.end2 + 1))
            else:
                region = line.affected_region()

            additional = []
            for r in region.lines:
                for mi in anno_index.matching_indices(r.chr, r.start, r.end):
                    match = anno_file.lines[int(mi)]
                    if len(match.annotations) > i_col:
                        additional.append(match.annotations[i_col])

            if max_value and additional:
                mv = max(float(a) for a in additional)
                additional = [f"{mv:.0f}".encode() if mv % 1 == 0.0
                              else f"{mv:.4f}".encode()]
            if no_duplicates:
                seen = sorted(set(additional))
                additional = seen
            value = b";".join(additional)
            if url_decode:
                value = unquote(value.decode()).encode()
            if replace_underscore:
                value = value.replace(b"_", b" ")

            annotations = list(line.annotations)
            if i_annotation > -1:
                annotations[i_annotation] = value
            else:
                annotations.append(value)
            line.annotations = annotations
            buf.append(line.to_tsv())

        _write_buffer(self.get("out"), buf)


class BedpeExtractGenotypeTool(ToolBase):
    name = "BedpeExtractGenotype"
    description = "Extracts the phased genotype into seperate column."

    def setup(self):
        self.add_infile("in", "Input BEDPE file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output BEDPE file. If unset, writes to STDOUT.", optional=True)
        self.add_flag("include_unphased", "Also annotate genotype of unphased SVs.")

    def _format_value(self, key, line, annotation_headers, idx_format_value=-1,
                      error_on_missing_key=True):
        try:
            format_idx = annotation_headers.index(b"FORMAT")
        except ValueError:
            raise ToolError("No FORMAT column found!")
        keys = line.annotations[format_idx].split(b":")
        if key not in keys:
            if not error_on_missing_key:
                return b""
            raise ToolError(f"Key '{key.decode()}' not found in FORMAT column!")
        if idx_format_value < 0:
            idx_format_value = format_idx + 1
        return line.annotations[idx_format_value].split(b":")[keys.index(key)]

    def main(self):
        f = BedpeFile.from_file(self.get("in"))
        buf = list(f.headers)

        sample_info = f.sample_header_info
        is_multisample = len(sample_info) > 1
        i_annotations = []
        updated_header = list(f.annotation_headers)
        if is_multisample:
            for info in sample_info:
                i_annotations.append(
                    f.annotation_index_by_name(info.name.encode() + b"_GENOTYPE", False))
                if i_annotations[-1] < 0:
                    updated_header.append(info.name.encode() + b"_GENOTYPE")
        else:
            i_annotations.append(f.annotation_index_by_name(b"GENOTYPE", False))
            if i_annotations[0] < 0:
                updated_header.append(b"GENOTYPE")

        buf.append(b"#CHROM_A\tSTART_A\tEND_A\tCHROM_B\tSTART_B\tEND_B\t"
                   + b"\t".join(updated_header))

        for line in f.lines:
            annotations = list(line.annotations)
            for s, i_anno in enumerate(i_annotations):
                idx_format_value = sample_info[s].column_index if is_multisample else -1
                genotype = self._format_value(b"GT", line, f.annotation_headers,
                                              idx_format_value)
                phasing_block = self._format_value(b"PS", line, f.annotation_headers,
                                                   idx_format_value, False)
                entry = b""
                if b"|" in genotype:
                    entry = genotype
                elif self.get_flag("include_unphased"):
                    entry = genotype
                if phasing_block and phasing_block.strip() != b".":
                    entry += b" (" + phasing_block + b")"
                if i_anno < 0:
                    annotations.append(entry)
                else:
                    annotations[i_anno] = entry
            line.annotations = annotations
            buf.append(line.to_tsv())

        _write_buffer(self.get("out"), buf)


class BedpeExtractInfoFieldTool(ToolBase):
    name = "BedpeExtractInfoField"
    description = "Extract a given INFO field key and annotates it as a separate column."

    def setup(self):
        self.add_string("info_fields", "Comma separate list of INFO keys (and column header names) which should be extracted: \"INFO_KEY1[:COLUMN_HEADER1],INFO_KEY2[:COLUMN_HEADER2],...\"")
        self.add_infile("in", "Input BEDPE file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output BEDPE file. If unset, writes to STDOUT.", optional=True)
        self.add_string("info_column", "Header name of the INFO column.", optional=True, default="INFO_A")

    def main(self):
        column_info_mapping = {}
        columns = []
        for kv_pair in self.get("info_fields").split(","):
            if ":" in kv_pair:
                info, column = (p.strip().encode() for p in kv_pair.split(":")[:2])
            else:
                info = column = kv_pair.strip().encode()
            column_info_mapping[column] = info
            columns.append(column)

        f = BedpeFile.from_file(self.get("in"))
        column_indices = {c: f.annotation_index_by_name(c, False) for c in columns}

        buf = list(f.headers)
        updated_header = list(f.annotation_headers)
        for c in columns:
            if column_indices[c] < 0:
                updated_header.append(c)
        buf.append(b"#CHROM_A\tSTART_A\tEND_A\tCHROM_B\tSTART_B\tEND_B\t"
                   + b"\t".join(updated_header))

        info_idx = f.annotation_index_by_name(self.get("info_column").encode(), True)

        for line in f.lines:
            info_values = {}
            raw = line.annotations[info_idx].strip()
            if raw and raw != b".":
                for kv in raw.split(b";"):
                    if b"=" in kv:
                        # reference takes split('=').at(1): only the segment
                        # between the first and second '='
                        parts = kv.split(b"=")
                        info_values[parts[0].strip()] = parts[1].strip()
                    else:
                        info_values[kv.strip()] = b"TRUE"
            annotations = list(line.annotations)
            for c in columns:
                value = info_values.get(column_info_mapping[c], b"")
                ci = column_indices[c]
                if ci < 0:
                    annotations.append(value)
                else:
                    annotations[ci] = value
            line.annotations = annotations
            buf.append(line.to_tsv())

        _write_buffer(self.get("out"), buf)


class BedpeAnnotateCnvOverlapTool(ToolBase):
    """Behavioral reference: ngs-bits src/BedpeAnnotateCnvOverlap/main.cpp."""

    name = "BedpeAnnotateCnvOverlap"
    description = "Annotates a SV file with (high-quality) CNV overlap of a given file."

    def setup(self):
        self.add_infile("in", "Input SV file (in BEDPE format).")
        self.add_outfile("out", "Output SV file (in BEDPE format).")
        self.add_infile("cnv", "Input CNV file (in TSV format).")

    def main(self):
        import numpy as np

        from ..io.cnv import CnvList

        cnvs = CnvList.from_file(self.get("cnv"))
        svs = BedpeFile.from_file(self.get("in"))

        overlap_idx = svs.annotation_index_by_name(b"CNV_OVERLAP", False)
        if overlap_idx < 0:
            svs.annotation_headers = list(svs.annotation_headers) + [b"CNV_OVERLAP"]

        ll_idx = cnvs.annotation_index_by_name(b"loglikelihood", True)
        cnvs_del = []
        cnvs_dup = []
        for cnv in cnvs.variants:
            try:
                ll = float(cnv.annotations[ll_idx])
            except ValueError:
                ll = 0.0
            if ll < 20.0:
                continue
            if cnv.copy_number(cnvs.annotation_headers) < 2:
                cnvs_del.append(cnv)
            else:
                cnvs_dup.append(cnv)

        for line in svs.lines:
            overlap_string = b""
            if line.type in (b"DEL", b"DUP"):
                current = cnvs_del if line.type == b"DEL" else cnvs_dup
                sv_region = line.affected_region().lines[0]
                overlapping = BedFile()
                for cnv in current:
                    if sv_region.overlaps(cnv.chr, cnv.start, cnv.end):
                        overlapping.append(BedLine(cnv.chr, cnv.start, cnv.end))
                overlapping.sort()
                overlapping.merge()
                sv_bed = BedFile()
                sv_bed.append(BedLine(sv_region.chr, sv_region.start, sv_region.end))
                overlapping.intersect(sv_bed)
                overlap = overlapping.base_count()
                frac = np.float32(overlap) / np.float32(sv_region.end - sv_region.start + 1)
                overlap_string = f"{float(frac):g}".encode()
            annotations = list(line.annotations)
            if overlap_idx < 0:
                annotations.append(overlap_string)
            else:
                annotations[overlap_idx] = overlap_string
            line.annotations = annotations

        svs.store(self.get("out"))


class BedpeAnnotateBreakpointDensityTool(ToolBase):
    """Behavioral reference: ngs-bits src/BedpeAnnotateBreakpointDensity/main.cpp."""

    name = "BedpeAnnotateBreakpointDensity"
    description = "Annotates a BEDPE file with breakpoint density."

    def setup(self):
        self.add_infile("density", "IGV density file containing break point density.")
        self.add_infile("density_sys", "Optional IGV density file containing break point density for a specific processing system.", optional=True)
        self.add_infile("in", "Input BEDPE file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output BEDPE file. If unset, writes to STDOUT.", optional=True)

    def main(self):
        sys_path = self.get_infile("density_sys")

        def load_density(path):
            bed = BedFile.from_file(path)
            if not bed.is_sorted():
                bed.sort()
            return bed, ChromosomalIndex(bed)

        density_file, anno_index = load_density(self.get_infile("density"))
        if sys_path:
            sys_file, sys_index = load_density(sys_path)

        f = BedpeFile.from_file(self.get("in"))
        i_anno = f.annotation_index_by_name(b"NGSD_SV_BREAKPOINT_DENSITY", False)
        i_anno_sys = f.annotation_index_by_name(b"NGSD_SV_BREAKPOINT_DENSITY_SYS", False) if sys_path else -1

        buf = list(f.headers)
        header = list(f.annotation_headers)
        if i_anno < 0:
            header.append(b"NGSD_SV_BREAKPOINT_DENSITY")
        if sys_path and i_anno_sys < 0:
            header.append(b"NGSD_SV_BREAKPOINT_DENSITY_SYS")
        buf.append(b"#CHROM_A\tSTART_A\tEND_A\tCHROM_B\tSTART_B\tEND_B\t" + b"\t".join(header))

        def density_of(bed, index, line):
            vals = []
            for mi in index.matching_indices(line.chr1, line.start1 + 1, line.end1 + 1):
                vals.append(int(bed.lines[int(mi)].annotations[1]))
            out = [str(max(vals) if vals else 0).encode()]
            if line.type != b"INS":
                vals = []
                for mi in index.matching_indices(line.chr2, line.start2 + 1, line.end2 + 1):
                    vals.append(int(bed.lines[int(mi)].annotations[1]))
                out.append(str(max(vals) if vals else 0).encode())
            return b" / ".join(out)

        for line in f.lines:
            annotations = list(line.annotations)
            value = density_of(density_file, anno_index, line)
            if i_anno > -1:
                annotations[i_anno] = value
            else:
                annotations.append(value)
            if sys_path:
                value = density_of(sys_file, sys_index, line)
                if i_anno_sys > -1:
                    annotations[i_anno_sys] = value
                else:
                    annotations.append(value)
            line.annotations = annotations
            buf.append(line.to_tsv())

        _write_buffer(self.get("out"), buf)


TOOLS = {
    "BedpeSort": BedpeSortTool,
    "BedpeToBed": BedpeToBedTool,
    "BedpeFilter": BedpeFilterTool,
    "BedpeAnnotateFromBed": BedpeAnnotateFromBedTool,
    "BedpeExtractGenotype": BedpeExtractGenotypeTool,
    "BedpeExtractInfoField": BedpeExtractInfoFieldTool,
    "BedpeAnnotateCnvOverlap": BedpeAnnotateCnvOverlapTool,
    "BedpeAnnotateBreakpointDensity": BedpeAnnotateBreakpointDensityTool,
}
