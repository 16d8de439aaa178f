"""UpdHunter — UPD detection from trio variant data.

Behavioral reference: ngs-bits src/UpdHunter/main.cpp (variant QC filters,
UPD typing table, raw range detection with exclude-region sentinels, pairwise
merge loop, Q score from binomial tail).
"""

from __future__ import annotations

import math
import sys
from dataclasses import dataclass

from ..core.basicstats import match_probability
from ..core.chromosome import Chromosome
from ..core.intervals import BedFile, ChromosomalIndex
from ..io.vcf import VcfFile
from .toolbase import ToolBase, ToolError

HOM, HET, WT = range(3)
EXCLUDED, BIPARENTAL, UNINFORMATIVE, ISO, ISO_OR_HET = range(5)
NONE, FATHER, MOTHER = range(3)


def _str2geno(gt: bytes) -> int:
    gt = gt.replace(b"|", b"/").replace(b".", b"0")
    if gt == b"1/1":
        return HOM
    if gt in (b"0/1", b"1/0"):
        return HET
    if gt == b"0/0":
        return WT
    raise ToolError(f"Invalid string '{gt.decode(errors='replace')}' for conversion to genotype!")


@dataclass
class _Var:
    chr: Chromosome
    start: int
    end: int
    c: int
    f: int
    m: int
    type: int = UNINFORMATIVE
    source: int = NONE

    def determine_type(self):
        c, f, m = self.c, self.f, self.m
        if (c == HET and f == HOM and m == WT) or (c == HET and f == WT and m == HOM):
            self.type, self.source = BIPARENTAL, NONE
        if (c == HOM and f == HET and m == WT) or (c == WT and f == HET and m == HOM):
            self.type, self.source = ISO, FATHER
        if (c == HOM and f == WT and m == HET) or (c == WT and f == HOM and m == HET):
            self.type, self.source = ISO, MOTHER
        if (c == HOM and f == WT and m == HOM) or (c == WT and f == HOM and m == WT):
            self.type, self.source = ISO_OR_HET, MOTHER
        if (c == HOM and f == HOM and m == WT) or (c == WT and f == WT and m == HOM):
            self.type, self.source = ISO_OR_HET, FATHER


class _Range:
    def __init__(self, data, start, end):
        self.data = data
        self.start = start  # index
        self.end = end      # exclusive index

    def size_markers(self):
        return self.end - self.start

    def size_bases(self):
        return self.data[self.end - 1].end - self.data[self.start].start + 1

    def count_type(self, t):
        return sum(1 for i in range(self.start, self.end) if self.data[i].type == t)

    def het_marker_percentage(self):
        c_het = sum(1 for i in range(self.start, self.end) if self.data[i].c == HET)
        return 100.0 * c_het / self.size_markers()

    def q_score(self, p_biparental, p_upd):
        c_upd = self.count_type(ISO) + self.count_type(ISO_OR_HET)
        markers = self.size_markers()
        p_no_bip = (1 - p_biparental) ** markers
        p_n_upd = 1.0 if c_upd < 2 else match_probability(p_upd, c_upd - 1, markers - 1)
        return -10.0 * math.log10(p_no_bip * p_n_upd)


class UpdHunterTool(ToolBase):
    name = "UpdHunter"
    description = "UPD detection from trio variant data."

    def setup(self):
        self.add_infile("in", "Input VCF file of trio.")
        self.add_string("c", "Header name of child.")
        self.add_string("f", "Header name of father.")
        self.add_string("m", "Header name of mother.")
        self.add_outfile("out", "Output TSV file containing the detected UPDs.")
        self.add_outfile("out_informative", "Output IGV file containing informative variants.", optional=True)
        self.add_infile_list("exclude", "BED file with regions to exclude, e.g. regions with N base or copy-number variant regions of the sample.", optional=True)
        self.add_int("var_min_dp", "Minimum depth (DP) of a variant (in all three samples).", optional=True, default=20)
        self.add_float("var_min_q", "Minimum quality (QUAL) of a variant.", optional=True, default=20)
        self.add_flag("var_use_indels", "Also use InDels. The default is to use SNVs only.")
        self.add_flag("var_use_special_calls", "Also use variant calls with special call type (FORMAT entry CT from VcfMerge). The default is to skip where at least one call is flagged as special call.")
        self.add_float("ext_marker_perc", "Percentage of markers that can be spanned when merging adjacent regions .", optional=True, default=1.0)
        self.add_float("ext_size_perc", "Percentage of base size that can be spanned when merging adjacent regions.", optional=True, default=20.0)
        self.add_float("reg_min_kb", "Mimimum size in kilo-bases required for a UPD region.", optional=True, default=1000.0)
        self.add_int("reg_min_markers", "Mimimum number of UPD markers required in a region.", optional=True, default=15)
        self.add_float("reg_min_q", "Mimimum Q-score required for a UPD region.", optional=True, default=20.0)
        self.add_flag("debug", "Enable verbose debug output.")

    def main(self):
        out_path = self.get("out")
        if not out_path.endswith(".tsv"):
            raise ToolError("Output file name has to end with '.tsv'!")

        vl = VcfFile.from_file(self.get("in"))
        c = self.get("c").encode()
        f = self.get("f").encode()
        m = self.get("m").encode()
        samples = vl.sample_ids()
        try:
            i_c = samples.index(c)
            i_f = samples.index(f)
            i_m = samples.index(m)
        except ValueError as e:
            raise ToolError(f"Sample not found in VCF header: {e}")
        var_min_dp = self.get_int("var_min_dp")
        var_min_q = self.get_float("var_min_q")
        use_indels = self.get_flag("var_use_indels")
        use_special = self.get_flag("var_use_special_calls")

        exclude = BedFile()
        for path in self.get_infile_list("exclude"):
            exclude.add(BedFile.from_file(path))
        exclude.merge()
        exclude_idx = ChromosomalIndex(exclude) if len(exclude) else None

        data: list[_Var] = []
        for i in range(len(vl)):
            v = vl[i]
            if not v.chr.is_autosome():
                continue
            if not use_indels and not (len(v.ref) == 1 and len(v.alt(0)) == 1):
                continue
            if var_min_q > 0:
                q = v.qual_value()
                if q < 0:
                    raise ToolError(f"Quality not available for variant {v.chr.str}:{v.start}")
                if q < var_min_q:
                    continue
            if var_min_dp > 0:
                dps = []
                for si in (i_c, i_f, i_m):
                    tmp = v.format_value("DP", si)
                    if tmp in (b"", b"."):
                        dps.append(0)
                    else:
                        dps.append(int(tmp))
                if min(dps) < var_min_dp:
                    continue
            if not use_special:
                cts = [v.format_value("CT", si) for si in (i_c, i_f, i_m)]
                cts = [b"" if x == b"." else x for x in cts]
                if any(cts):
                    continue
            entry = _Var(v.chr, v.start, v.end,
                         _str2geno(v.format_value("GT", i_c)),
                         _str2geno(v.format_value("GT", i_f)),
                         _str2geno(v.format_value("GT", i_m)))
            if exclude_idx is not None and exclude_idx.matching_index(v.chr, v.start, v.end) != -1:
                entry.type, entry.source = EXCLUDED, NONE
            else:
                entry.determine_type()
            data.append(entry)

        # fake markers at exclude-region bounds prevent range spanning
        for reg in exclude.lines:
            for pos in (reg.start, reg.end):
                data.append(_Var(reg.chr, pos, pos, WT, WT, WT, EXCLUDED, NONE))
        data.sort(key=lambda e: (e.chr.num, e.start, e.end))

        # mendelian error sanity check
        err_f = err_m = err_fm = 0
        for e in data:
            if e.type == EXCLUDED:
                continue
            if (e.f == HOM and e.c == WT) or (e.f == WT and e.c == HOM):
                err_f += 1
            if (e.m == HOM and e.c == WT) or (e.m == WT and e.c == HOM):
                err_m += 1
            if (e.m == HOM and e.f == WT) or (e.m == WT and e.f == HOM):
                err_fm += 1
        if err_f > err_fm or err_m > err_fm:
            raise ToolError("Mendelian error rates suggest a sample swap!")

        # statistics
        biparental = 0
        upd = 0
        chr_upd: dict[str, int] = {}
        chr_var: dict[str, int] = {}
        for e in data:
            if e.type == EXCLUDED:
                continue
            if e.type == BIPARENTAL:
                biparental += 1
            if e.type in (ISO, ISO_OR_HET):
                upd += 1
                chr_upd[e.chr.str] = chr_upd.get(e.chr.str, 0) + 1
            chr_var[e.chr.str] = chr_var.get(e.chr.str, 0) + 1
        p_biparental = biparental / len(data) if data else 0.0
        mx = max(chr_upd.values()) if chr_upd else 0
        # QMap iterates keys lexicographically; key(max) = first matching
        max_chr = ""
        for k in sorted(chr_upd.keys()):
            if chr_upd[k] == mx:
                max_chr = k
                break
        denom = len(data) - chr_var.get(max_chr, 0)
        p_upd = (upd - mx) / denom if denom else 0.0

        # raw range detection
        ranges: list[_Range] = []
        in_range = False
        cur = None
        for idx, e in enumerate(data):
            if in_range:
                if (e.type in (BIPARENTAL, EXCLUDED) or e.chr != data[cur.start].chr
                        or idx + 1 == len(data)):
                    ranges.append(cur)
                    in_range = False
                elif e.type in (ISO, ISO_OR_HET):
                    if e.source == data[cur.start].source:
                        cur.end = idx + 1
                    else:
                        ranges.append(cur)
                        in_range = False
            if not in_range:
                if e.type in (ISO, ISO_OR_HET):
                    cur = _Range(data, idx, idx + 1)
                    in_range = True

        # merge ranges
        ext_marker_perc = self.get_float("ext_marker_perc")
        ext_size_perc = self.get_float("ext_size_perc")
        merged = True
        while merged:
            merged = False
            i = 0
            while i < len(ranges) - 1:
                a, b = ranges[i], ranges[i + 1]
                if (data[a.start].chr != data[b.start].chr
                        or data[a.start].source != data[b.start].source):
                    i += 1
                    continue
                marker_diff = b.start - a.end
                marker_cutoff = ext_marker_perc / 100.0 * (a.size_markers() + b.size_markers())
                base_diff = data[b.start].start - data[a.end - 1].end
                base_cutoff = ext_size_perc / 100.0 * (a.size_bases() + b.size_bases())
                if marker_diff < marker_cutoff or base_diff < base_cutoff:
                    a.end = b.end
                    del ranges[i + 1]
                    merged = True
                    if i > 0:
                        i -= 1
                else:
                    i += 1

        # write output
        from decimal import ROUND_HALF_UP, Decimal

        def fmt(v, p):
            if v != v:
                return "nan"
            return f"{Decimal(v).quantize(Decimal(1).scaleb(-p), rounding=ROUND_HALF_UP):.{p}f}"

        reg_min_markers = self.get_int("reg_min_markers")
        reg_min_bases = 1000.0 * self.get_float("reg_min_kb")
        reg_min_q = self.get_float("reg_min_q")
        out_lines = ["#chr\tstart\tend\tsize_kb\tsize_markers\tupd_markers\tsource\thet_percentage\tq-score"]
        for r in ranges:
            if r.size_bases() < reg_min_bases:
                continue
            upd_markers = r.count_type(ISO) + r.count_type(ISO_OR_HET)
            if upd_markers < reg_min_markers:
                continue
            q_score = r.q_score(p_biparental, p_upd)
            if q_score < reg_min_q:
                continue
            src = "father" if data[r.start].source == FATHER else "mother"
            out_lines.append(
                f"{data[r.start].chr.str}\t{data[r.start].start}\t{data[r.end - 1].end}\t"
                f"{fmt(r.size_bases() / 1000.0, 3)}\t{r.size_markers()}\t{upd_markers}\t"
                f"{src}\t{fmt(r.het_marker_percentage(), 2)}\t{fmt(q_score, 2)}")
        with open(out_path, "w") as fh:
            fh.write("".join(l + "\n" for l in out_lines))

        # informative variants (IGV heatmap)
        out_inf = self.get("out_informative")
        if out_inf:
            if not out_inf.endswith(".igv"):
                raise ToolError("Output file name for informative variants has to end with '.igv'!")
            lines = ["#track graphtype=heatmap viewLimits=1:4 maxHeightPixels=80:80:80 color=0,0,255 altColor=255,0,0 midRange=2.5:2.5 midColor=255,255,255 windowingFunction=mean",
                     "Chromosome\tStart\tEnd\tFeature\tUPD variants"]
            for e in data:
                if e.source == FATHER:
                    src = "father"
                elif e.source == MOTHER:
                    src = "mother"
                else:
                    continue
                if e.type == ISO:
                    typ = "iso"
                elif e.type == ISO_OR_HET:
                    typ = "het_or_iso"
                else:
                    continue
                score = {(FATHER, ISO): "4", (FATHER, ISO_OR_HET): "3",
                         (MOTHER, ISO_OR_HET): "2", (MOTHER, ISO): "1"}[(e.source, e.type)]
                lines.append(f"{e.chr.str_normalized(True)}\t{e.start}\t{e.start + 1}\t{src} - {typ}\t{score}")
            with open(out_inf, "w") as fh:
                fh.write("".join(l + "\n" for l in lines))


TOOLS = {"UpdHunter": UpdHunterTool}
