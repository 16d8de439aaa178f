"""CNV support tools: CnvReferenceCohort.

Behavioral reference: ngs-bits src/CnvReferenceCohort/main.cpp — pick the
best-correlating reference coverage profiles (median per-chromosome Pearson
correlation on autosomal, non-excluded, covered bins) and merge them into a
multi-column coverage TSV.
"""

from __future__ import annotations

import gzip
import os
import sys

import numpy as np

from ..core.chromosome import Chromosome
from ..core.intervals import BedFile, ChromosomalIndex
from .toolbase import ToolBase, ToolError


def _read_lines(path: str) -> list[bytes]:
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    return [l for l in data.split(b"\n") if l]


def _is_header(line: bytes) -> bool:
    return line.startswith(b"#") or line.startswith(b"track ") or line.startswith(b"browser ")


class CnvReferenceCohortTool(ToolBase):
    name = "CnvReferenceCohort"
    description = "Create a reference cohort for CNV calling from a list of coverage profiles."

    def setup(self):
        self.add_infile("in", "Coverage profile of main sample in BED format.")
        self.add_infile_list("in_ref", "Reference coverage profiles of other sample in BED format (GZ files supported).")
        self.add_outfile("out", "Output TSV file with coverage profiles of selected reference samples.")
        self.add_infile_list("exclude", "Regions in the given BED file(s) are excluded from the coverage calcualtion, e.g. copy-number polymorphic regions.", optional=True)
        self.add_int("cov_max", "Best n reference coverage files to include in 'out' based on correlation.", optional=True, default=150)
        self.add_flag("debug", "Enable debug output.")

    def main(self):
        in_file = self.get_infile("in")
        cov_max = self.get_int("cov_max")

        merged_excludes = BedFile()
        for path in self.get_infile_list("exclude"):
            merged_excludes.add(BedFile.from_file(path))
        merged_excludes.merge()
        exclude_idx = ChromosomalIndex(merged_excludes)

        # main sample rows (headers skipped)
        chrs, starts, ends, depths = [], [], [], []
        for line in _read_lines(in_file):
            line = line.strip()
            if not line or _is_header(line):
                continue
            fields = line.split(b"\t")
            if len(fields) < 4:
                raise ToolError(f"COV file line with less than three fields found: '{line.decode()}'")
            chrs.append(Chromosome(fields[0]))
            starts.append(int(fields[1]))
            ends.append(int(fields[2]))
            depths.append(float(fields[3]))
        n = len(chrs)
        depths = np.asarray(depths)

        use = np.zeros(n, dtype=bool)
        for i in range(n):
            if depths[i] == 0.0:
                continue
            if exclude_idx.matching_index(chrs[i], starts[i], ends[i]) != -1:
                continue
            if not chrs[i].is_autosome():
                continue
            use[i] = True

        # per-chromosome [min,max] row ranges over the compacted rows
        # (main.cpp:258-276: max defaults to 0 for single-row chromosomes)
        chr_ranges: dict[str, list[int]] = {}
        row = 0
        for i in range(n):
            if not use[i]:
                continue
            key = chrs[i].str
            if key in chr_ranges:
                chr_ranges[key][1] = row
            else:
                chr_ranges[key] = [row, 0]
            row += 1
        cov1 = depths[use]

        def correlation_range(a, b, lo, hi) -> float:
            if hi < lo:
                return float("nan")
            x = a[lo:hi + 1]
            y = b[lo:hi + 1]
            if len(x) < 2:
                return float("nan")
            with np.errstate(invalid="ignore", divide="ignore"):
                c = np.corrcoef(x, y)[0, 1]
            return float(c)

        file2corr = []
        for ref_file in self.get_infile_list("in_ref"):
            rows = [l for l in _read_lines(ref_file) if l.strip() and not _is_header(l)]
            if len(rows) != n:
                raise ToolError(f"Reference sample {ref_file} contains a different number of lines ({len(rows)}) than main sample ({n})")
            cov2 = np.empty(int(use.sum()))
            k = 0
            for i in range(n):
                if not use[i]:
                    continue
                fields = rows[i].split(b"\t")
                if len(fields) < 4:
                    raise ToolError(f"COV file line with less than four fields found: '{rows[i].decode()}'")
                expect = f"{chrs[i].str}\t{starts[i]}\t{ends[i]}".encode()
                if b"\t".join(fields[:3]) != expect:
                    raise ToolError(f"Chromosomal position '{b'	'.join(fields[:3]).decode()}' does not match the main file: '{expect.decode()}'")
                cov2[k] = float(fields[3])
                k += 1
            corr = []
            for key in sorted(chr_ranges):   # QMap iterates keys sorted
                lo, hi = chr_ranges[key]
                c = correlation_range(cov1, cov2, lo, hi)
                if not (np.isnan(c) or np.isinf(c)):
                    corr.append(c)
            corr.sort()
            median_corr = float(np.median(corr)) if corr else 0.0
            file2corr.append((ref_file, median_corr))

        file2corr.sort(key=lambda p: -p[1])
        sys.stdout.write(f"compared number of coverage files: {len(file2corr)}\n")
        sys.stdout.write("Selected the following files as reference samples based on correlation: \n")
        best = []
        mean_corr = 0.0
        for path, c in file2corr:
            best.append(path)
            mean_corr += c
            sys.stdout.write(f"{os.path.basename(path)}: {c:.6g}\n")
            if len(best) >= cov_max:
                break
        best.sort()
        mean_corr /= len(best)
        sys.stdout.write(f"Mean correlation to reference samples is: {mean_corr:.6g}\n")

        # merge coverage profiles positionally (headers included)
        all_lines = [_read_lines(in_file)] + [_read_lines(p) for p in best]
        out_rows = []
        for j in range(max(len(ls) for ls in all_lines)):
            row_parts = []
            for i, ls in enumerate(all_lines):
                if j >= len(ls):
                    continue
                fields = ls[j].rstrip(b"\r\n").split(b"\t")
                if i == 0:
                    row_parts.extend(fields[:3])
                row_parts.append(fields[3] if len(fields) > 3 else b"")
            out_rows.append(b"\t".join(row_parts))
        with open(self.get_outfile("out"), "wb") as fh:
            fh.write(b"".join(r + b"\n" for r in out_rows))


TOOLS = {
    "CnvReferenceCohort": CnvReferenceCohortTool,
}
