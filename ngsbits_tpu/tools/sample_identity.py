"""SampleIdentity — identifies datasets from the same patient (hg38 only).

Behavioral reference: ngs-bits src/SampleIdentity/main.cpp + BamWorker.cpp:
AF at 75 embedded identity SNPs (rounded to int 0-100, -1 if depth <
min_depth; reads filtered only for secondary/supplementary/duplicate),
pairwise identity = both wt (<10) / both hom (>90) / both het (10..90);
pairs shown when snps_used >= min_snps, identity >= min_identity and
correlation >= min_correlation.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..core import resources
from ..core.basicstats import correlation, round_half_away
from ..qc.pileup import BASE2IDX, pileup_at_positions
from .toolbase import ToolBase, ToolError


class SampleIdentityTool(ToolBase):
    name = "SampleIdentity"
    description = "Tries to identify datasets that are from the same patient based on BAM/CRAM files of WGS/WES/lrGS/RNA sequencing."

    def setup(self):
        self.add_infile_list("bams", "Input BAM/CRAM files. If only one file is given, it must be a text file with one BAM/CRAM path per line.")
        self.add_outfile("out", "Output TSV file. If unset, writes to STDOUT.", optional=True)
        self.add_int("min_depth", "Minimum depth to use a SNP for the sample comparison.", optional=True, default=15)
        self.add_int("min_snps", "Minimum SNPs required to comare samples.", optional=True, default=40)
        self.add_int("min_identity", "Minimum identity percentage to show sample pairs in output.", optional=True, default=95)
        self.add_int("threads", "Number of threads to calculate Allele frequencies", optional=True, default=4)
        self.add_float("min_correlation", "Minimum correlation to show sample pairs in output.", optional=True, default=0.9)
        self.add_infile("ref", "Reference genome for CRAM support (mandatory if CRAM is used).", optional=True)
        self.add_flag("basename", "Use BAM/CRAM basename instead of full path in output.")
        self.add_flag("debug", "Add debug output to STDOUT. If used, make sure to provide a file for 'out'!")
        self.add_flag("time", "Add timing output to STDOUT. If used, make sure to provide a file for 'out'!")

    def main(self):
        bams = self.get_infile_list("bams")
        if len(bams) == 1:
            with open(bams[0]) as fh:
                bams = [l.strip() for l in fh if l.strip() and not l.startswith("#")]
        min_depth = self.get_int("min_depth")
        min_snps = self.get_int("min_snps")
        min_identity = self.get_int("min_identity")
        min_corr = self.get_float("min_correlation")
        basename = self.get_flag("basename")

        snps = resources.identity_snps_vcf()
        n = len(snps)
        chr_nums = np.array([snps.chr_of(i).num for i in range(n)], dtype=np.int64)
        positions = snps.pos.copy()
        ref_idx = np.array([BASE2IDX.get(snps.refs[i][:1], 0) for i in range(n)], dtype=np.int64)
        alt_idx = np.array([BASE2IDX.get(snps.alts[i].split(b",")[0][:1], 0) for i in range(n)], dtype=np.int64)

        def compute_af(bam: str):
            """(label, af array or None, skip message or None) for one BAM —
            the per-sample unit run on the worker pool (reference BamWorker,
            SampleIdentity/main.cpp:8 QThreadPool)."""
            if not os.path.exists(bam):
                return "", None, f"##skipped {bam}: file does not exist"
            label = os.path.basename(bam).split(".")[0] if basename else bam
            try:
                r = pileup_at_positions(bam, chr_nums, positions, min_mapq=0,
                                        include_not_properly_paired=True)
            except Exception as e:  # noqa: BLE001 — mirrors worker catch-all
                return label, None, f"##skipped {bam} because of error: {e}"
            ref_c = r.counts[np.arange(n), ref_idx]
            alt_c = r.counts[np.arange(n), alt_idx]
            depth = ref_c + alt_c
            with np.errstate(divide="ignore", invalid="ignore"):
                af = round_half_away(100.0 * alt_c / depth)
            af = np.where(depth < min_depth, -1, af).astype(np.int64)
            return label, af, None

        if self.get_flag("time"):
            # -time: per-sample wall time on STDOUT (SampleIdentity/main.cpp)
            import time as _time
            inner = compute_af

            def compute_af(b, _inner=inner):
                t0 = _time.perf_counter()
                res = _inner(b)
                print(f"time {b}: {(_time.perf_counter() - t0) * 1000:.0f} ms")
                return res

        threads = max(1, self.get_int("threads"))
        if threads > 1 and len(bams) > 1:
            # per-sample parallelism: BAM decode releases the GIL in the
            # native decoder, so samples pileup concurrently
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=threads) as pool:
                results = list(pool.map(compute_af, bams))
        else:
            results = [compute_af(b) for b in bams]

        lines = []
        labels = []
        af_data = []
        for label, af, skip_msg in results:
            labels.append(label)
            af_data.append(af)
            if skip_msg is not None:
                lines.append(skip_msg)

        from decimal import ROUND_HALF_UP, Decimal

        def fmtp(v, p):
            if v != v:
                return "nan"
            return f"{Decimal(v).quantize(Decimal(1).scaleb(-p), rounding=ROUND_HALF_UP):.{p}f}"

        lines.append("#file1\tfile2\tsnps_used\tidentity_percentage\tcorrelation")
        for i in range(len(af_data)):
            if af_data[i] is None:
                continue
            for j in range(i + 1, len(af_data)):
                if af_data[j] is None:
                    continue
                a1 = af_data[i]
                a2 = af_data[j]
                both = (a1 > -1) & (a2 > -1)
                used = int(both.sum())
                if used < min_snps:
                    continue
                ident = int((((a1 < 10) & (a2 < 10) & both)
                             | ((a1 > 90) & (a2 > 90) & both)
                             | ((a1 >= 10) & (a1 <= 90) & (a2 >= 10) & (a2 <= 90) & both)).sum())
                identity_perc = 100.0 * ident / used
                if identity_perc < min_identity:
                    continue
                corr = correlation(a1[both].astype(float), a2[both].astype(float))
                if corr < min_corr:
                    continue
                lines.append(f"{labels[i]}\t{labels[j]}\t{used}\t{fmtp(identity_perc, 2)}\t{fmtp(corr, 4)}")

        text = "".join(l + "\n" for l in lines)
        out = self.get("out")
        if out:
            with open(out, "w") as fh:
                fh.write(text)
        else:
            sys.stdout.write(text)


TOOLS = {"SampleIdentity": SampleIdentityTool}
