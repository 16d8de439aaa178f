"""SampleGender — determines sample gender from BAM/CRAM.

Behavioral reference: ngs-bits src/SampleGender/main.cpp:55-92 and
Statistics::genderXY/genderHetX/genderSRY (cppNGS/Statistics.cpp:2811-2902).
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

from ..core import resources
from ..core.chromosome import Chromosome
from ..core.intervals import BedFile, BedLine
from ..io.bam import BamReader, FLAG_SECONDARY, FLAG_SUPPLEMENTARY
from ..qc import coverage as cov
from ..qc.pileup import BASE2IDX, pileup_at_positions
from .toolbase import ToolBase


def _fmt(v: float, p: int) -> str:
    if v != v:
        return "nan"
    from decimal import ROUND_HALF_UP, Decimal
    return f"{Decimal(v).quantize(Decimal(1).scaleb(-p), rounding=ROUND_HALF_UP):.{p}f}"


def gender_xy(bam: str, max_female: float, min_male: float):
    from ..utils.prefetch import prefetch
    reader = BamReader(bam)
    counts = np.zeros(len(reader.ref_names), dtype=np.int64)
    for batch in prefetch(reader, depth=2):
        primary = (batch.flag & (FLAG_SECONDARY | FLAG_SUPPLEMENTARY)) == 0
        rid = batch.ref_id[primary]
        ok = rid >= 0
        np.add.at(counts, rid[ok], 1)
    nums = [Chromosome(n).num for n in reader.ref_names]
    reader.close()
    have_x = 1001 in nums
    have_y = 1002 in nums
    reads_x = int(sum(c for c, n in zip(counts, nums) if n == 1001))
    reads_y = int(sum(c for c, n in zip(counts, nums) if n == 1002))
    if not have_x or not have_y or reads_x == 0:
        ratio = math.nan
    else:
        ratio = reads_y / reads_x
    info = [("reads_chry", _fmt(float(reads_y), 0)),
            ("reads_chrx", _fmt(float(reads_x), 0)),
            ("ratio_chry_chrx", _fmt(ratio, 4))]
    if ratio <= max_female:
        gender = "female"
    elif ratio >= min_male:
        gender = "male"
    else:
        gender = "unknown (ratio in gray area)"
    return gender, info


def gender_hetx(build: str, bam: str, max_male: float, min_female: float,
                include_not_properly_paired: bool):
    reader = BamReader(bam)
    chrx_len = 0
    for n, l in zip(reader.ref_names, reader.ref_lengths):
        if Chromosome(n).num == 1001:
            chrx_len = int(l)
    reader.close()
    roi = BedFile()
    roi.append(BedLine(Chromosome("chrX"), 1, max(chrx_len, 1)))
    roi.subtract(resources.pseudoautosomal_regions(build))
    snps = resources.known_variants(build, True, 0.2, 0.8, roi=roi)

    n = len(snps)
    chr_nums = np.array([snps.chr_of(i).num for i in range(n)], dtype=np.int64)
    res = pileup_at_positions(bam, chr_nums, snps.pos.copy(), min_mapq=20,
                              include_not_properly_paired=include_not_properly_paired,
                              min_baseq=20)
    depth = res.depth()
    ref_idx = np.array([BASE2IDX.get(snps.refs[i][:1], 0) for i in range(n)], dtype=np.int64)
    alt_idx = np.array([BASE2IDX.get(snps.alts[i].split(b",")[0][:1], 0) for i in range(n)], dtype=np.int64)
    af = res.frequency(ref_idx, alt_idx)
    ok = (depth >= 20) & np.isfinite(af)
    c_all = int(ok.sum())
    c_het = int(((af > 0.1) & (af < 0.9) & ok).sum())
    het_frac = c_het / c_all if c_all else math.nan

    info = [("snps_usable", f"{c_all} of {n}"),
            ("hom_count", str(c_all - c_het)),
            ("het_count", str(c_het)),
            ("het_fraction", _fmt(het_frac, 4))]
    if c_all < 20:
        gender = "unknown (too few SNPs)"
    elif het_frac <= max_male:
        gender = "male"
    elif het_frac >= min_female:
        gender = "female"
    else:
        gender = "unknown (fraction in gray area)"
    return gender, info


def gender_sry(build: str, bam: str, min_cov: float):
    start = 2786989 if build == "hg38" else 2655031
    end = 2787603 if build == "hg38" else 2655641
    roi = BedFile()
    roi.append(BedLine(Chromosome("chrY"), start, end))
    cov.avg_coverage(roi, bam, min_mapq=1, threads=1, decimals=2)
    c = float(roi.lines[0].annotations[0])
    info = [("coverage_sry", _fmt(c, 2))]
    return ("male" if c >= min_cov else "female"), info


class SampleGenderTool(ToolBase):
    name = "SampleGender"
    description = "Determines the gender of a sample from the BAM/CRAM file."

    def setup(self):
        self.add_infile_list("in", "Input BAM/CRAM file(s).")
        self.add_outfile("out", "Output TSV file - one line per input BAM/CRAM file. If unset, writes to STDOUT.", optional=True)
        self.add_enum("method", "Method selection: Read distribution on X and Y chromosome (xy), fraction of heterozygous variants on X chromosome (hetx), or coverage of SRY gene (sry).",
                      valid=["xy", "hetx", "sry"])
        self.add_float("max_female", "Maximum Y/X ratio for female (method xy).", optional=True, default=0.06)
        self.add_float("min_male", "Minimum Y/X ratio for male (method xy).", optional=True, default=0.09)
        self.add_float("min_female", "Minimum heterozygous SNP fraction for female (method hetx).", optional=True, default=0.25)
        self.add_float("max_male", "Maximum heterozygous SNP fraction for male (method hetx).", optional=True, default=0.05)
        self.add_float("sry_cov", "Minimum average coverage of SRY gene for males (method sry).", optional=True, default=20.0)
        self.add_enum("build", "Genome build used to generate the input (methods hetx and sry).",
                      optional=True, valid=["hg19", "hg38"], default="hg38")
        self.add_infile("ref", "Reference genome for CRAM support (mandatory if CRAM is used).", optional=True)
        self.add_flag("long_read", "Support long reads (> 1kb) and uses single-end reads for gender calculation.")

    def main(self):
        method = self.get_enum("method")
        build = self.get_enum("build")
        lines = []
        header_done = False
        for bam in self.get_infile_list("in"):
            if method == "xy":
                gender, info = gender_xy(bam, self.get_float("max_female"), self.get_float("min_male"))
            elif method == "hetx":
                gender, info = gender_hetx(build, bam, self.get_float("max_male"),
                                           self.get_float("min_female"), self.get_flag("long_read"))
            else:
                gender, info = gender_sry(build, bam, self.get_float("sry_cov"))
            if not header_done:
                lines.append("#file\tgender" + "".join("\t" + k for k, _v in info))
                header_done = True
            lines.append(os.path.basename(bam) + "\t" + gender + "".join("\t" + v for _k, v in info))
        text = "".join(l + "\n" for l in lines)
        out = self.get("out")
        if out:
            with open(out, "w") as fh:
                fh.write(text)
        else:
            sys.stdout.write(text)


TOOLS = {"SampleGender": SampleGenderTool}
