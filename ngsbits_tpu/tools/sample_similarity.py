"""SampleSimilarity — pairwise sample similarity metrics.

Behavioral reference: ngs-bits src/SampleSimilarity/main.cpp:102-163.
"""

from __future__ import annotations

import os
import sys

from ..core.intervals import BedFile
from ..qc import sample_similarity as ss
from .toolbase import ToolBase, ToolError


def _fmt(v: float, p: int) -> str:
    if v != v:
        return "nan"
    from decimal import ROUND_HALF_UP, Decimal
    return f"{Decimal(v).quantize(Decimal(1).scaleb(-p), rounding=ROUND_HALF_UP):.{p}f}"


class SampleSimilarityTool(ToolBase):
    name = "SampleSimilarity"
    description = "Calculates pairwise sample similarity metrics from VCF/BAM/CRAM files."

    def setup(self):
        self.add_infile_list("in", "Input variant lists in VCF format (two or more). If only one file is given, each line in this file is interpreted as an input file path.")
        self.add_outfile("out", "Output file. If unset, writes to STDOUT.", optional=True)
        self.add_enum("mode", "Mode (input format).", optional=True,
                      valid=["vcf", "gsvar", "bam"], default="vcf")
        self.add_infile("roi", "Restrict similarity calculation to variants in target region.", optional=True)
        self.add_flag("roi_hg38_wes_wgs", "Used pre-defined high-confidence coding region of hg38. Speeds up calculations, especially for WGS. Also makes scores comparable when mixing WES and WGS or different WES kits.")
        self.add_flag("include_gonosomes", "Includes gonosomes into calculation (by default only variants on autosomes are considered).")
        self.add_int("min_cov", "Minimum coverage to consider a SNP for the analysis (BAM mode).", optional=True, default=30)
        self.add_int("max_snps", "The maximum number of high-coverage SNPs to extract from BAM/CRAM. 0 means unlimited (BAM mode).", optional=True, default=5000)
        self.add_enum("build", "Genome build used to generate the input (BAM mode).", optional=True,
                      valid=["hg19", "hg38"], default="hg38")
        self.add_infile("ref", "Reference genome for CRAM support (mandatory if CRAM is used).", optional=True)
        self.add_flag("long_read", "Support long reads (BAM mode).")
        self.add_flag("debug", "Print debug output.")

    def main(self):
        in_files = self.get_infile_list("in")
        if len(in_files) == 1:
            with open(in_files[0]) as fh:
                in_files = [l.strip() for l in fh
                            if l.strip() and not l.strip().startswith("#")]
        mode = self.get_enum("mode")
        build = self.get_enum("build")
        roi_path = self.get("roi")
        roi_hg38 = self.get_flag("roi_hg38_wes_wgs")
        include_gonosomes = self.get_flag("include_gonosomes")
        min_cov = self.get_int("min_cov")
        max_snps = self.get_int("max_snps")

        lines = []
        if mode in ("vcf", "gsvar"):
            lines.append("#file1\tfile2\toverlap_percent\tcorrelation\tibs2_percent\tcount1\tcount2\tcomments")
        else:
            lines.append("#file1\tfile2\tvariant_count\tcorrelation\tibs0_percent\tibs2_percent\tcomments")

        if roi_path and roi_hg38:
            raise ToolError("Parameters 'roi' and 'roi_hg38_wes_wgs' are mutually exclusive!")
        if roi_hg38 and build == "hg19":
            raise ToolError("Parameters 'build hg19' and 'roi_hg38_wes_wgs' are mutually exclusive!")
        roi = None
        if roi_path:
            roi = BedFile.from_file(roi_path)
        if roi_hg38:
            raise ToolError("hg38_coding_highconf_all_kits.bed resource not bundled yet")

        data = []
        files = []
        for filename in in_files:
            if not os.path.exists(filename):
                lines.append(f"##skipped missing file {filename}")
                continue
            files.append(filename)
            if mode == "vcf":
                data.append(ss.genotypes_from_vcf(filename, include_gonosomes, True, roi))
            elif mode == "gsvar":
                data.append(ss.genotypes_from_gsvar(filename, include_gonosomes, roi))
            else:
                data.append(ss.genotypes_from_bam(build, filename, min_cov, max_snps,
                                                  include_gonosomes, roi,
                                                  self.get_flag("long_read")))

        for i in range(len(files)):
            for j in range(i + 1, len(files)):
                r = ss.calculate_similarity(data[i], data[j])
                cols = [os.path.basename(files[i]), os.path.basename(files[j])]
                if mode in ("vcf", "gsvar"):
                    cols += [_fmt(r.ol_perc, 2), _fmt(r.sample_correlation, 4),
                             _fmt(r.ibs2_perc, 2), str(r.no_variants1), str(r.no_variants2)]
                else:
                    cols += [str(r.ol_count), _fmt(r.sample_correlation, 4),
                             _fmt(r.ibs0_perc, 2), _fmt(r.ibs2_perc, 2)]
                cols.append(", ".join(r.messages))
                lines.append("\t".join(cols))

        text = "".join(l + "\n" for l in lines)
        out = self.get("out")
        if out:
            with open(out, "w") as fh:
                fh.write(text)
        else:
            sys.stdout.write(text)


TOOLS = {"SampleSimilarity": SampleSimilarityTool}
