"""SampleAncestry — estimates sample ancestry from variants.

Behavioral reference: ngs-bits src/SampleAncestry/main.cpp and
Statistics::ancestry (cppNGS/Statistics.cpp:2388-2532): correlation of
sample genotypes (count of '1' in GT) vs AF_AFR/EUR/SAS/EAS of the embedded
ancestry SNP panel; population call via score cutoff + per-population
median/MAD table.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

from ..core import resources
from ..core.basicstats import correlation
from ..core.intervals import BedFile, BedLine, ChromosomalIndex
from ..io.vcf import VcfFile
from .toolbase import ToolBase, ToolError

# per-population score distributions (Statistics.cpp:2399-2415)
_SCORES = {
    "AFR": {"AFR": (0.5002, 0.0291), "EUR": (0.0553, 0.0280),
            "SAS": (0.1061, 0.0267), "EAS": (0.0895, 0.0274)},
    "EUR": {"AFR": (0.0727, 0.0271), "EUR": (0.3251, 0.0252),
            "SAS": (0.1922, 0.0249), "EAS": (0.0603, 0.0264)},
    "SAS": {"AFR": (0.0698, 0.0264), "EUR": (0.1574, 0.0295),
            "SAS": (0.3395, 0.0291), "EAS": (0.1693, 0.0288)},
    "EAS": {"AFR": (0.08415, 0.0275), "EUR": (0.06725, 0.0269),
            "SAS": (0.21495, 0.0228), "EAS": (0.47035, 0.0242)},
}


def ancestry(build: str, filename: str, min_snps: int = 1000,
             abs_score_cutoff: float = 0.32, max_mad_dist: float = 4.2):
    panel = resources.ancestry_vcf(build)
    # build an interval index over the panel variants
    bed = BedFile()
    for i in range(len(panel)):
        v = panel[i]
        bed.append(BedLine(v.chr, v.start, v.end, [str(i).encode()]))
    bed.sort()
    idx = ChromosomalIndex(bed)

    vl = VcfFile.from_file(filename)
    if len(vl.sample_ids()) != 1:
        raise ToolError("Only single-sample VCFs are supported for ancestry estimation!")
    if not vl.header.format_id_defined("GT"):
        raise ToolError("VCF file does not contain FORMAT entry 'GT', which is required for ancestry estimation!")

    geno = []
    afs = {p: [] for p in ("AFR", "EUR", "SAS", "EAS")}
    for i in range(len(vl)):
        v = vl[i]
        m = idx.matching_indices(v.chr, v.start, v.end)
        if len(m) == 0:
            continue
        pi = int(bed.lines[int(m[0])].annotations[0])
        p = panel[pi]
        if v.ref != p.ref or v.alt_string() != p.alt_string():
            continue
        geno.append(float(v.format_value("GT").count(b"1")))
        for pop in afs:
            try:
                afs[pop].append(float(p.info(f"AF_{pop}")))
            except ValueError:
                afs[pop].append(0.0)

    n = len(geno)
    if n < min_snps:
        return n, math.nan, math.nan, math.nan, math.nan, "NOT_ENOUGH_SNPS"

    out_scores = {}
    for pop in ("AFR", "EUR", "SAS", "EAS"):
        c = correlation(geno, afs[pop])
        out_scores[pop] = 0.0 if c < 0 else c

    matches = set()
    for pop, score in out_scores.items():
        if score >= abs_score_cutoff:
            matches.add(pop)
    for pop, dist in _SCORES.items():
        in_dist = True
        for p2, (median, mad) in dist.items():
            if abs((out_scores[p2] - median) / mad) > max_mad_dist:
                in_dist = False
        if in_dist:
            matches.add(pop)
    population = matches.pop() if len(matches) == 1 else "ADMIXED/UNKNOWN"
    return (n, out_scores["AFR"], out_scores["EUR"], out_scores["SAS"],
            out_scores["EAS"], population)


def _fmt(v: float, p: int) -> str:
    if v != v:
        return "nan"
    from decimal import ROUND_HALF_UP, Decimal
    return f"{Decimal(v).quantize(Decimal(1).scaleb(-p), rounding=ROUND_HALF_UP):.{p}f}"


class SampleAncestryTool(ToolBase):
    name = "SampleAncestry"
    description = "Estimates the ancestry of a sample based on variants."

    def setup(self):
        self.add_infile_list("in", "Input variant list(s) in VCF or VCF.GZ format.")
        self.add_outfile("out", "Output TSV file. If unset, writes to STDOUT.", optional=True)
        self.add_int("min_snps", "Minimum number of informative SNPs for population determination. If less SNPs are found, 'NOT_ENOUGH_SNPS' is returned.", optional=True, default=1000)
        self.add_float("score_cutoff", "Absolute score cutoff above which a sample is assigned to a population.", optional=True, default=0.32)
        self.add_float("mad_dist", "Maximum number of median average diviations that are allowed from median population score.", optional=True, default=4.2)
        self.add_enum("build", "Genome build used to generate the input.", optional=True,
                      valid=["hg19", "hg38"], default="hg38")

    def main(self):
        lines = ["#sample\tsnps\tAFR\tEUR\tSAS\tEAS\tpopulation"]
        for filename in self.get_infile_list("in"):
            n, afr, eur, sas, eas, pop = ancestry(
                self.get_enum("build"), filename, self.get_int("min_snps"),
                self.get_float("score_cutoff"), self.get_float("mad_dist"))
            lines.append(f"{os.path.basename(filename)}\t{n}\t{_fmt(afr, 4)}\t"
                         f"{_fmt(eur, 4)}\t{_fmt(sas, 4)}\t{_fmt(eas, 4)}\t{pop}")
        text = "".join(l + "\n" for l in lines)
        out = self.get("out")
        if out:
            with open(out, "w") as fh:
                fh.write(text)
        else:
            sys.stdout.write(text)


TOOLS = {"SampleAncestry": SampleAncestryTool}
