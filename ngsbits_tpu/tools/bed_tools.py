"""BED set-algebra tools.

Behavioral reference: ngs-bits src/Bed*/main.cpp (thin wrappers over
cppNGS/BedFile ops).
"""

from __future__ import annotations

import os
import sys

from ..core.chromosome import Chromosome
from ..core.intervals import BedFile
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


TOOLS = {
    "BedSort": BedSortTool,
    "BedMerge": BedMergeTool,
    "BedAdd": BedAddTool,
    "BedExtend": BedExtendTool,
    "BedShrink": BedShrinkTool,
    "BedSubtract": BedSubtractTool,
    "BedIntersect": BedIntersectTool,
    "BedChunk": BedChunkTool,
    "BedInfo": BedInfoTool,
}
