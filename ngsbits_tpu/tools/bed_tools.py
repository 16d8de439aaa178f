"""BED set-algebra tools.

Behavioral reference: ngs-bits src/Bed*/main.cpp (thin wrappers over
cppNGS/BedFile ops).
"""

from __future__ import annotations

import os
import sys

from ngsbits_tpu.utils.stdio import stdout_binary

from ..core.chromosome import Chromosome
from ..core.intervals import BedFile, BedLine
from ..qc import statistics
from .toolbase import ToolBase, ToolError


def _load_fai_maxima(fai_path: str) -> dict:
    maxima = {}
    with open(fai_path) as fh:
        for line in fh:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 2:
                continue
            try:
                value = int(parts[1])
            except ValueError:
                continue
            maxima[Chromosome(parts[0]).num] = value
    return maxima


class BedSortTool(ToolBase):
    name = "BedSort"
    description = "Sort the regions in a BED file."

    def setup(self):
        self.add_infile("in", "Input BED file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output BED file. If unset, writes to STDOUT.", optional=True)
        self.add_flag("with_name", "Uses name column (i.e. the 4th column) to sort if chr/start/end are equal.")
        self.add_flag("uniq", "If set, entries with the same chr/start/end are removed after sorting.")

    def main(self):
        f = BedFile.from_file(self.get("in"))
        if self.get_flag("with_name"):
            f.sort_with_name()
        else:
            f.sort()
        if self.get_flag("uniq"):
            f.remove_duplicates()
        f.store(self.get("out"))


class BedMergeTool(ToolBase):
    name = "BedMerge"
    description = "Merges overlapping regions in a BED file."

    def setup(self):
        self.add_infile("in", "Input BED file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output BED file. If unset, writes to STDOUT.", optional=True)
        self.add_flag("keep_b2b", "Do not merge non-overlapping but adjacent (back-to-back) regions.")
        self.add_flag("merge_names", "Merge name columns instead of removing all annotations.")

    def main(self):
        f = BedFile.from_file(self.get("in"))
        f.merge(not self.get_flag("keep_b2b"), self.get_flag("merge_names"))
        f.store(self.get("out"))


class BedAddTool(ToolBase):
    name = "BedAdd"
    description = "Merges regions from several BED files."

    def setup(self):
        self.add_infile_list("in", "Input BED files.")
        self.add_outfile("out", "Output BED file. If unset, writes to STDOUT.", optional=True)

    def main(self):
        out = BedFile()
        for path in self.get_infile_list("in"):
            out.add(BedFile.from_file(path))
        out.store(self.get("out"))


class BedExtendTool(ToolBase):
    name = "BedExtend"
    description = "Extends the regions in a BED file."

    def setup(self):
        self.add_int("n", "The number of bases to extend (on both sides of each region).")
        self.add_infile("in", "Input BED file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output BED file. If unset, writes to STDOUT.", optional=True)
        self.add_infile("fai", "Optional FASTA index file that determines the maximum position for each chromosome.", optional=True)

    def main(self):
        f = BedFile.from_file(self.get("in"))
        f.extend(self.get_int("n"))
        fai = self.get("fai")
        if fai:
            maxima = _load_fai_maxima(fai)
            for line in f.lines:
                if line.chr.num not in maxima:
                    raise ToolError(f"Chromsome '{line.chr.str}' not contained in FASTA index file '{fai}'!")
                line.end = min(line.end, maxima[line.chr.num])
        f.store(self.get("out"))


class BedShrinkTool(ToolBase):
    name = "BedShrink"
    description = "Shrinks the regions in a BED file."

    def setup(self):
        self.add_int("n", "The number of bases to shrink (on both sides of each region).")
        self.add_infile("in", "Input BED file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output BED file. If unset, writes to STDOUT.", optional=True)

    def main(self):
        f = BedFile.from_file(self.get("in"))
        f.shrink(self.get_int("n"))
        f.store(self.get("out"))


class BedSubtractTool(ToolBase):
    name = "BedSubtract"
    description = "Subtracts the regions in one BED file from another."

    def setup(self):
        self.add_infile("in2", "Input BED file which is subtracted from 'in'.")
        self.add_infile("in", "Input BED file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output BED file. If unset, writes to STDOUT.", optional=True)

    def main(self):
        f1 = BedFile.from_file(self.get("in"))
        f2 = BedFile.from_file(self.get("in2"))
        if not f2.is_merged_and_sorted():
            f2.merge()
        f1.subtract(f2)
        f1.store(self.get("out"))


class BedIntersectTool(ToolBase):
    name = "BedIntersect"
    description = "Intersects the regions in two BED files."

    def setup(self):
        self.add_infile("in2", "Second input BED file.")
        self.add_enum("mode", "Output mode: intersect of both files (intersect), original entry of file 1 (in) or original entry of file 2 (in2).",
                      optional=True, valid=["intersect", "in", "in2"], default="intersect")
        self.add_enum("annotation", "In intersect mode the annotations are removed by default. Setting this option to 'in' or 'in2' keeps the annotation of the respective file.",
                      optional=True, valid=["none", "in", "in2"], default="none")
        self.add_infile("in", "Input BED file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output BED file. If unset, writes to STDOUT.", optional=True)

    def main(self):
        f1 = BedFile.from_file(self.get("in"))
        f2 = BedFile.from_file(self.get("in2"))
        mode = self.get_enum("mode")
        if mode == "intersect":
            if not f2.is_merged_and_sorted():
                f2.merge()
            anno = self.get_enum("annotation")
            if anno == "none":
                f1.intersect(f2)
                f1.store(self.get("out"))
            elif anno == "in":
                f1.intersect(f2, True)
                f1.store(self.get("out"))
            else:
                f2.intersect(f1, True)
                f2.store(self.get("out"))
        elif mode == "in":
            if not f2.is_merged_and_sorted():
                f2.merge()
            f1.overlapping(f2)
            f1.store(self.get("out"))
        else:
            if not f1.is_merged_and_sorted():
                f1.merge()
            f2.overlapping(f1)
            f2.store(self.get("out"))


class BedChunkTool(ToolBase):
    name = "BedChunk"
    description = "Splits all regions to chunks of an approximate desired size."

    def setup(self):
        self.add_int("n", "The desired chunk size. Note: Not all chunks will have this size. Regions are split to chunks that are closest to the desired size.")
        self.add_infile("in", "Input BED file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output BED file. If unset, writes to STDOUT.", optional=True)

    def main(self):
        f = BedFile.from_file(self.get("in"))
        f.chunk(self.get_int("n"))
        f.store(self.get("out"))


class BedInfoTool(ToolBase):
    name = "BedInfo"
    description = "Prints information about a (merged) BED file."

    def setup(self):
        self.add_infile("in", "Input BED file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output file. If unset, writes to STDOUT.", optional=True)
        self.add_flag("nomerge", "If set, the input is not merged before printing statistics.")
        self.add_flag("filename", "If set, prints the input file name before each line.")
        self.add_infile("fai", "If set, checks that the maximum position for each chromosome is not exceeded.", optional=True)

    def main(self):
        in_path = self.get("in")
        f = BedFile.from_file(in_path)
        stats = statistics.region(f, not self.get_flag("nomerge"))
        prefix = (os.path.basename(in_path) + ": ") if self.get_flag("filename") else ""

        lines = [
            prefix + "Regions    : " + stats.value("roi_fragments").to_string(),
            prefix + "Bases      : " + stats.value("roi_bases").to_string(0),
            prefix + "Chromosomes: " + stats.value("roi_chromosomes").to_string(),
            prefix,
            prefix + "Is sorted  : " + stats.value("roi_is_sorted").to_string(),
            prefix + "Is merged  : " + stats.value("roi_is_merged").to_string(),
            prefix,
            prefix + "Fragment size (min)  : " + stats.value("roi_fragment_min").to_string(),
            prefix + "Fragment size (max)  : " + stats.value("roi_fragment_max").to_string(),
            prefix + "Fragment size (mean) : " + stats.value("roi_fragment_mean").to_string(),
            prefix + "Fragment size (stdev): " + stats.value("roi_fragment_stdev").to_string(),
        ]
        fai = self.get("fai")
        if fai:
            lines.append(prefix)
            maxima = _load_fai_maxima(fai)
            for line in f.lines:
                if line.chr.num not in maxima:
                    raise ToolError(f"Chromsome '{line.chr.str}' not contained in FASTA index file '{fai}'!")
                if line.end > maxima[line.chr.num]:
                    lines.append(prefix + f"Warning: maximum position {maxima[line.chr.num]} exceeded for region {line.chr.str}:{line.start}-{line.end}")

        text = "".join(l + "\n" for l in lines)
        out = self.get("out")
        if out:
            with open(out, "w") as fh:
                fh.write(text)
        else:
            sys.stdout.write(text)


class BedAnnotateFromBedTool(ToolBase):
    """Behavioral reference: ngs-bits src/BedAnnotateFromBed/main.cpp."""

    name = "BedAnnotateFromBed"
    description = "Annotates BED file regions with information from a second BED file."

    def setup(self):
        self.add_infile("in2", "BED file that is used as annotation source.")
        self.add_infile("in", "Input BED file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output BED file. If unset, writes to STDOUT.", optional=True)
        self.add_int("col", "Annotation source column (if column number does not exist, 'yes' is used).", optional=True, default=4)
        self.add_flag("clear", "Clear all annotations present in the 'in' file.")
        self.add_flag("no_duplicates", "Remove duplicate annotations if several intervals from 'in2' overlap.")
        self.add_flag("overlap", "Annotate overlap with regions in 'in2'. The regular annotation is appended in brackets.")
        self.add_flag("url_decode", "Decode URL encoded characters")
        self.add_string("name", "Use this name as column header of TSV files output files. If unset, the base file name if 'in2' is used.", optional=True)

    def main(self):
        import os
        from urllib.parse import unquote

        from ..core.intervals import ChromosomalIndex

        in_ = self.get("in") or ""
        in2 = self.get("in2")
        col = self.get_int("col") - 4
        clear = self.get_flag("clear")
        no_duplicates = self.get_flag("no_duplicates")
        overlap = self.get_flag("overlap")
        url_decode = self.get_flag("url_decode")
        name = (self.get("name") or "").encode()
        if not name:
            name = os.path.basename(in2).split(".")[0].encode()

        anno_file = BedFile.from_file(in2)
        if not anno_file.is_sorted():
            anno_file.sort()
        anno_index = ChromosomalIndex(anno_file)

        f = BedFile.from_file(in_)

        # TSV-mode: overwrite existing columns and extend the header line
        col_idx = -1
        if in_.lower().endswith(".tsv"):
            for hi, raw in enumerate(f.headers):
                line = raw
                if line.startswith(b"#") and not line.startswith(b"##") and b"\t" in line:
                    column_headers = line.split(b"\t")
                    wanted = (b"overlap " if overlap else b"") + name
                    try:
                        col_idx = column_headers.index(wanted) - 3
                    except ValueError:
                        col_idx = -1
                    if col_idx < 0:
                        f.headers[hi] = line + b"\t" + wanted
                    if len(f.lines) > 0 and len(f.lines[0].annotations) != len(column_headers) - 3:
                        raise ToolError("BED/TSV file format error: Number of header columns does not match number of data columns!")
                    break

        if clear:
            f.clear_annotations()
        for line in f.lines:
            annos = []
            overlap_regions = BedFile()
            for mi in anno_index.matching_indices(line.chr, line.start, line.end):
                match = anno_file.lines[int(mi)]
                if len(match.annotations) > col:
                    annos.append(match.annotations[col])
                elif not overlap:
                    annos.append(b"yes")
                if overlap:
                    overlap_regions.append(BedLine(line.chr,
                                                   max(line.start, match.start),
                                                   min(line.end, match.end)))
            if no_duplicates:
                annos = sorted(set(annos))
            if overlap:
                overlap_regions.merge()
                from decimal import ROUND_HALF_UP, Decimal
                frac = 1.0 * overlap_regions.base_count() / line.length()
                anno = f"{Decimal(frac).quantize(Decimal('0.001'), rounding=ROUND_HALF_UP):.3f}".encode()
                if annos:
                    anno += b" (" + b",".join(annos) + b")"
            else:
                anno = b",".join(annos)
            if url_decode:
                anno = unquote(anno.decode()).encode()
            if col_idx < 0:
                line.annotations.append(anno)
            else:
                line.annotations[col_idx] = anno

        f.store(self.get("out"))


class BedAnnotateGCTool(ToolBase):
    """BedAnnotateGC (BedAnnotateGC/main.cpp): GC fraction per region."""

    name = "BedAnnotateGC"
    description = "Annotates GC content fraction to regions in a BED file."

    def setup(self):
        self.add_infile("in", "Input BED file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output BED file. If unset, writes to STDOUT.", optional=True)
        self.add_infile("ref", "Reference genome FASTA file. If unset, 'reference_genome' from the 'settings.ini' file is used.", optional=True)
        self.add_int("extend", "Bases to extend around the input region for calculating the GC content.", optional=True, default=0)
        self.add_flag("clear", "Clear all annotations present in the input file.")

    def main(self):
        from ..io.fasta import FastaFileIndex
        ref_file = self.get_ref()
        if not ref_file:
            raise ToolError("Reference genome FASTA unset in both command-line and settings.ini file!")
        reference = FastaFileIndex(ref_file)
        extend = self.get_int("extend")
        bed = BedFile.from_file(self.get("in"))
        if self.get_flag("clear"):
            bed.clear_annotations()
        for line in bed:
            seq = reference.seq(line.chr, line.start - extend,
                                line.length() + 2 * extend).upper()
            gc = seq.count(b"G") + seq.count(b"C")
            at = seq.count(b"A") + seq.count(b"T")
            if gc + at == 0:
                line.annotations.append(b"n/a")
            else:
                line.annotations.append(f"{gc / (gc + at):.4f}".encode())
        bed.store(self.get("out"))


class BedToFastaTool(ToolBase):
    """BedToFasta (BedToFasta/main.cpp): region sequences as FASTA."""

    name = "BedToFasta"
    description = "Converts a BED file to a FASTA file."

    def setup(self):
        self.add_infile("in", "Input BED file.")
        self.add_outfile("out", "Output FASTA file. If unset, writes to STDOUT.", optional=True)
        self.add_infile("ref", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)

    def main(self):
        import sys
        from ..io.fasta import FastaFileIndex
        ref_file = self.get_ref()
        if not ref_file:
            raise ToolError("Reference genome FASTA unset in both command-line and settings.ini file!")
        reference = FastaFileIndex(ref_file)
        bed = BedFile.from_file(self.get("in"))
        parts = []
        for line in bed:
            parts.append(f">{line.chr.str}:{line.start}-{line.end}\n".encode())
            parts.append(reference.seq(line.chr, line.start, line.length(),
                                       to_upper=False) + b"\n")
        data = b"".join(parts)
        out = self.get("out")
        if out in ("", None):
            stdout_binary().write(data)
        else:
            with open(out, "wb") as fh:
                fh.write(data)


TOOLS = {
    "BedSort": BedSortTool,
    "BedAnnotateFromBed": BedAnnotateFromBedTool,
    "BedMerge": BedMergeTool,
    "BedAdd": BedAddTool,
    "BedExtend": BedExtendTool,
    "BedShrink": BedShrinkTool,
    "BedSubtract": BedSubtractTool,
    "BedIntersect": BedIntersectTool,
    "BedChunk": BedChunkTool,
    "BedInfo": BedInfoTool,
    "BedAnnotateGC": BedAnnotateGCTool,
    "BedToFasta": BedToFastaTool,
}
