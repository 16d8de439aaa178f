"""RohHunter — ROH detection from a variant list.

Behavioral reference: ngs-bits src/RohHunter/main.cpp: QC-filter variants
(DP>=20, QUAL>=20, exclude regions, autosomes ± chrX), mark hom (GT 1/1|1|1),
AF = max over info keys / VEP CSQ fields (default 0.01, float32); raw ROH =
maximal hom runs per chromosome not crossing exclude regions, kept if
Q = -10·log10(∏ af²) (capped 10000) >= roh_min_q; iterative pairwise merging
with marker/het/size-gap thresholds; filters on marker count and size;
BED annotation columns; TSV output.
"""

from __future__ import annotations

import math
import os
import sys
from dataclasses import dataclass, field

import numpy as np

from ..core.chromosome import Chromosome
from ..core.intervals import BedFile, ChromosomalIndex
from ..io.vcf import VcfFile
from .toolbase import ToolBase, ToolError


@dataclass
class _Var:
    chr: Chromosome
    pos: int
    hom: bool
    af: float  # float32 value


@dataclass
class _Roh:
    chr: Chromosome
    start_pos: int
    end_pos: int
    start_index: int
    end_index: int
    het_count: int = 0
    annotations: list = field(default_factory=list)

    def size_markers(self) -> int:
        return self.end_index - self.start_index + 1

    def size_bases(self) -> int:
        return self.end_pos - self.start_pos

    def q_score(self, var_info) -> float:
        # ∏ af² in double like the reference (pow of float-cast af)
        p = 1.0
        for i in range(self.start_index, self.end_index + 1):
            p *= float(var_info[i].af) ** 2
        if p <= 0:
            return 10000.0
        q = -10.0 * math.log10(p)
        return min(q, 10000.0)


def _calculate_raw_rohs(var_info, roh_min_q, exclude_index):
    out = []
    count = len(var_info)
    last_end = -1
    while True:
        start = last_end + 1
        while start < count and not var_info[start].hom:
            start += 1
        if start >= count:
            break
        end = start
        while end < count and var_info[end].hom and var_info[end].chr == var_info[start].chr:
            end += 1
            if (end > 1 and start < end - 1 and exclude_index is not None
                    and exclude_index.matching_index(var_info[end - 1].chr,
                                                     var_info[end - 2].pos,
                                                     var_info[end - 1].pos) != -1):
                end -= 1
                break
        end -= 1
        last_end = end
        region = _Roh(var_info[start].chr, var_info[start].pos, var_info[end].pos, start, end)
        if region.q_score(var_info) >= roh_min_q:
            out.append(region)
    return out


def _merge_rohs(raw, var_info, ext_marker_perc, ext_size_perc, ext_max_het_perc,
                exclude_index):
    merged = True
    while merged:
        merged = False
        i = 0
        while i < len(raw) - 1:
            a, b = raw[i], raw[i + 1]
            if a.chr != b.chr:
                i += 1
                continue
            het_gap = sum(1 for j in range(a.end_index + 1, b.start_index)
                          if not var_info[j].hom)
            if het_gap > 1 and het_gap > ext_marker_perc / 100.0 * (a.size_markers() + b.size_markers()):
                i += 1
                continue
            het_after = sum(1 for j in range(a.start_index, b.end_index + 1)
                            if not var_info[j].hom)
            if het_after > 1 and het_after / (b.end_index - a.start_index) > ext_max_het_perc / 100.0:
                i += 1
                continue
            if b.start_pos - a.end_pos > ext_size_perc / 100.0 * (a.size_bases() + b.size_bases()):
                i += 1
                continue
            if (exclude_index is not None
                    and exclude_index.matching_index(a.chr, a.end_pos, b.start_pos) != -1):
                i += 1
                continue
            a.end_index = b.end_index
            a.end_pos = b.end_pos
            a.het_count += b.het_count + het_gap
            del raw[i + 1]
            merged = True
            if i > 0:
                i -= 1


def _fmt(v: float, p: int) -> str:
    from decimal import ROUND_HALF_UP, Decimal
    if v != v:
        return "nan"
    return f"{Decimal(v).quantize(Decimal(1).scaleb(-p), rounding=ROUND_HALF_UP):.{p}f}"


class RohHunterTool(ToolBase):
    name = "RohHunter"
    description = "ROH detection based on a variant list."

    def setup(self):
        self.add_infile("in", "Input variant list in VCF format.")
        self.add_outfile("out", "Output TSV file with ROH regions.")
        self.add_infile_list("annotate", "List of BED files used for annotation. Each file adds a column to the output file. The base filename is used as column name and 4th column of the BED file is used as annotation value.", optional=True)
        self.add_infile("exclude", "BED files with regions to exclude from ROH analysis. Regions where variant calling is not possible should be removed (centromers, MQ=0 regions and large stretches of N bases).", optional=True)
        self.add_int("var_min_dp", "Minimum variant depth ('DP'). Variants with lower depth are excluded from the analysis.", optional=True, default=20)
        self.add_float("var_min_q", "Minimum variant quality. Variants with lower quality are excluded from the analysis.", optional=True, default=20)
        self.add_string("var_af_keys", "Comma-separated allele frequency info field names in 'in'.", optional=True, default="")
        self.add_string("var_af_keys_vep", "Comma-separated VEP CSQ field names of allele frequency annotations in 'in'.", optional=True, default="")
        self.add_float("roh_min_q", "Minimum Q score of output ROH regions.", optional=True, default=30.0)
        self.add_int("roh_min_markers", "Minimum marker count of output ROH regions.", optional=True, default=20)
        self.add_float("roh_min_size", "Minimum size in Kb of output ROH regions.", optional=True, default=20.0)
        self.add_float("ext_marker_perc", "Percentage of ROH markers that can be spanned when merging ROH regions.", optional=True, default=1.0)
        self.add_float("ext_size_perc", "Percentage of ROH size that can be spanned when merging ROH regions.", optional=True, default=50.0)
        self.add_float("ext_max_het_perc", "Maximum percentage of heterozygous markers in ROH regions.", optional=True, default=5.0)
        self.add_flag("inc_chrx", "Include chrX into the analysis. Excluded by default.")
        self.add_flag("debug", "Enable debug output")

    def main(self):
        inc_chrx = self.get_flag("inc_chrx")
        vl = VcfFile.from_file(self.get("in"))
        if len(vl.sample_ids()) > 1:
            raise ToolError("Multi sample is not supported.")

        exclude_index = None
        if self.get("exclude"):
            exclude = BedFile.from_file(self.get("exclude"))
            exclude_index = ChromosomalIndex(exclude)

        if not vl.header.format_id_defined("DP"):
            raise ToolError("Could not find 'DP' annotation in vcf header!")

        csq_af_indices = []
        keys_vep = self.get("var_af_keys_vep").strip()
        if keys_vep:
            for key in keys_vep.split(","):
                csq_af_indices.append(vl.header.vep_index_by_name(key))
        af_keys = [k for k in self.get("var_af_keys").strip().split(",") if k]

        var_min_dp = self.get_int("var_min_dp")
        var_min_q = self.get_float("var_min_q")
        var_info: list[_Var] = []
        for i in range(len(vl)):
            v = vl[i]
            c = v.chr
            if not c.is_autosome() and not (inc_chrx and c.is_x()):
                continue
            try:
                dp = int(v.format_value("DP"))
            except ValueError:
                continue  # GENE_CONVERSION events from DRAGEN
            if dp < var_min_dp:
                continue
            if var_min_q > 0:
                q = v.qual_value()
                if q < 0:
                    raise ToolError(f"Quality not available for variant {c.str}:{v.start}")
                if q < var_min_q:
                    continue
            if exclude_index is not None and exclude_index.matching_index(c, v.start, v.end) != -1:
                continue
            geno = v.format_value("GT")
            hom = geno in (b"1/1", b"1|1")
            af = np.float32(0.01)
            for key in af_keys:
                try:
                    af_new = np.float32(float(v.info(key)))
                except ValueError:
                    continue
                af = max(af, af_new)
            for idx in csq_af_indices:
                for anno in v.vep_annotations(idx):
                    try:
                        af_new = np.float32(float(anno))
                    except ValueError:
                        af_new = np.float32(0.0)  # toFloat() returns 0 on failure
                    af = max(af, af_new)
            var_info.append(_Var(c, v.start, hom, float(af)))

        regions = _calculate_raw_rohs(var_info, self.get_float("roh_min_q"), exclude_index)
        _merge_rohs(regions, var_info, self.get_float("ext_marker_perc"),
                    self.get_float("ext_size_perc"), self.get_float("ext_max_het_perc"),
                    exclude_index)

        roh_min_markers = self.get_int("roh_min_markers")
        roh_min_size = self.get_float("roh_min_size") * 1000.0
        regions = [r for r in regions if r.size_markers() >= roh_min_markers]
        regions = [r for r in regions if r.size_bases() >= roh_min_size]

        annotate = self.get_infile_list("annotate")
        for anno_path in annotate:
            anno_file = BedFile.from_file(anno_path)
            if not anno_file.is_sorted():
                anno_file.sort()
            anno_index = ChromosomalIndex(anno_file)
            for r in regions:
                annos = set()
                for idx in anno_index.matching_indices(r.chr, r.start_pos, r.end_pos):
                    line = anno_file.lines[int(idx)]
                    annos.add(line.annotations[0].decode() if line.annotations else "yes")
                r.annotations.append(",".join(sorted(annos)))

        lines = []
        header = "#chr\tstart\tend\tnumber of markers\thet markers\tsize [Kb]\tQ score"
        for anno_path in annotate:
            header += "\t" + os.path.basename(anno_path).split(".")[0]
        lines.append(header)
        for r in regions:
            row = (f"{r.chr.str}\t{r.start_pos}\t{r.end_pos}\t{r.size_markers()}\t"
                   f"{r.het_count}\t{_fmt(r.size_bases() / 1000.0, 2)}\t"
                   f"{_fmt(r.q_score(var_info), 2)}")
            if annotate:
                row += "\t" + "\t".join(r.annotations)
            lines.append(row)
        with open(self.get("out"), "w") as fh:
            fh.write("".join(l + "\n" for l in lines))


TOOLS = {"RohHunter": RohHunterTool}
