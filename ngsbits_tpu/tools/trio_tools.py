"""Trio analysis tools.

Behavioral reference: ngs-bits src/TrioMendelianErrors/main.cpp and
src/TrioMaternalContamination/main.cpp.
"""

from __future__ import annotations

import sys

import numpy as np

from ..core.chromosome import Chromosome
from .toolbase import ToolBase, ToolError
from .vcf_tools import _open_lines

HOM, HET, WT, UNKNOWN, INVALID = range(5)


def _genotype(field: bytes, dot_as_wt: bool) -> int:
    sep = field.find(b":")
    gt = field if sep == -1 else field[:sep]
    gt = gt.replace(b"|", b"/")
    if dot_as_wt:
        gt = gt.replace(b".", b"0")
    if gt == b"1/1":
        return HOM
    if gt in (b"0/1", b"1/0"):
        return HET
    if gt == b"0/0":
        return WT
    if b"." in gt:
        return UNKNOWN
    return INVALID


class TrioMendelianErrorsTool(ToolBase):
    name = "TrioMendelianErrors"
    description = "Determines mendelian error rate from a trio VCF."

    def setup(self):
        self.add_infile("vcf", "Multi-sample VCF or VCF.GZ file.")
        self.add_string("c", "Sample name of child in VCF.")
        self.add_string("f", "Sample name of father in VCF.")
        self.add_string("m", "Sample name of mother in VCF.")
        self.add_outfile("out", "Output text file. If unset, writes to STDOUT.", optional=True)
        self.add_int("min_dp", "Minimum depth in each sample.", optional=True, default=0)
        self.add_float("min_qual", "Minimum QUAL of variants.", optional=True, default=0.0)
        self.add_flag("dot_as_wt", "Treat '.' in GT field as '0'.")
        self.add_flag("debug", "Enable debug output")

    def main(self):
        c = self.get("c").encode()
        f = self.get("f").encode()
        m = self.get("m").encode()
        min_dp = self.get_int("min_dp")
        min_qual = self.get_float("min_qual")
        dot_as_wt = self.get_flag("dot_as_wt")

        i_c = i_f = i_m = -1
        counts = {k: 0 for k in ("checked_snv", "checked_indel", "mer_snv", "mer_indel",
                                 "not_autosome", "multiallelic", "depth_low", "depth_invalid",
                                 "qual_low", "qual_invalid", "gt_unknown", "gt_invalid")}

        def depth(parts, idx, i_dp):
            fmt = parts[idx].split(b":")
            try:
                return int(fmt[i_dp])
            except (ValueError, IndexError):
                return -1

        chr_cache: dict[bytes, Chromosome] = {}
        for line in _open_lines(self.get("vcf")):
            if not line or line.startswith(b"##"):
                continue
            parts = line.split(b"\t")
            if len(parts) < 12:
                raise ToolError(f"VCF with too few columns: {line.decode(errors='replace')}")
            if line.startswith(b"#"):
                for name, attr in ((c, "i_c"), (f, "i_f"), (m, "i_m")):
                    if name not in parts:
                        raise ToolError(f"Could not find FORMAT column for sample '{name.decode()}'!")
                i_c = parts.index(c)
                i_f = parts.index(f)
                i_m = parts.index(m)
                continue
            if parts[8] != b"GT" and not parts[8].startswith(b"GT:"):
                raise ToolError(f"Invalid FORMAT column! GT is not first entry: '{parts[8].decode()}'!")
            cb = parts[0]
            ch = chr_cache.get(cb)
            if ch is None:
                ch = Chromosome(cb)
                chr_cache[cb] = ch
            if not ch.is_autosome():
                counts["not_autosome"] += 1
                continue
            if b"," in parts[4]:
                counts["multiallelic"] += 1
                continue
            if min_qual > 0:
                qual = parts[5]
                if qual != b".":
                    try:
                        q = float(qual)
                    except ValueError:
                        counts["qual_invalid"] += 1
                        continue
                    if q < min_qual:
                        counts["qual_low"] += 1
                        continue
            if min_dp > 0:
                fkeys = parts[8].split(b":")
                try:
                    i_dp = fkeys.index(b"DP")
                except ValueError:
                    i_dp = -1
                dp_c = depth(parts, i_c, i_dp)
                dp_f = depth(parts, i_f, i_dp)
                dp_m = depth(parts, i_m, i_dp)
                if dp_c == -1 or dp_f == -1 or dp_m == -1:
                    counts["depth_invalid"] += 1
                    continue
                if dp_c < min_dp or dp_f < min_dp or dp_m < min_dp:
                    counts["depth_low"] += 1
                    continue
            gt_c = _genotype(parts[i_c], dot_as_wt)
            gt_f = _genotype(parts[i_f], dot_as_wt)
            gt_m = _genotype(parts[i_m], dot_as_wt)
            if UNKNOWN in (gt_c, gt_f, gt_m):
                counts["gt_unknown"] += 1
                continue
            if INVALID in (gt_c, gt_f, gt_m):
                counts["gt_invalid"] += 1
                continue
            is_snv = len(parts[3]) == 1 and len(parts[4]) == 1
            counts["checked_snv" if is_snv else "checked_indel"] += 1
            error = False
            if gt_f == HOM and gt_m == HOM and gt_c != HOM:
                error = True
            elif (gt_f == HOM or gt_m == HOM) and gt_c == WT:
                error = True
            elif (gt_f == WT or gt_m == WT) and gt_c == HOM:
                error = True
            elif gt_f == WT and gt_m == WT and gt_c != WT:
                error = True
            if error:
                counts["mer_snv" if is_snv else "mer_indel"] += 1

        from decimal import ROUND_HALF_UP, Decimal

        def fmt2(v):
            if v != v:
                return "nan"
            return f"{Decimal(v).quantize(Decimal('0.01'), rounding=ROUND_HALF_UP):.2f}"

        lines = [f"Skipped variants not on autosomes: {counts['not_autosome']}",
                 f"Skipped variants with multi-allelic alt: {counts['multiallelic']}"]
        if min_dp > 0:
            lines.append(f"Skipped variants with low depth: {counts['depth_low']}")
            lines.append(f"Skipped variants for which no depth could be determined: {counts['depth_invalid']}")
        if min_qual > 0:
            lines.append(f"Skipped variants with low quality: {counts['qual_low']}")
            lines.append(f"Skipped variants for which no quality could be determined: {counts['qual_invalid']}")
        lines.append(f"Skipped variants with (partially) unknown genotype: {counts['gt_unknown']}")
        lines.append(f"Skipped variants with invalid genotype: {counts['gt_invalid']}")
        lines.append("")
        checked = counts["checked_snv"] + counts["checked_indel"]
        mer = counts["mer_snv"] + counts["mer_indel"]
        lines.append(f"Variants checked: {checked} (SNVs: {counts['checked_snv']} InDels: {counts['checked_indel']})")
        lines.append(f"Mendelian error rate: {fmt2(100.0 * mer / checked)}%")
        lines.append(f"Mendelian error rate SNVs: {fmt2(100.0 * counts['mer_snv'] / counts['checked_snv'])}%")
        lines.append(f"Mendelian error rate InDels: {fmt2(100.0 * counts['mer_indel'] / counts['checked_indel'])}%")
        text = "".join(l + "\n" for l in lines)
        out = self.get("out")
        if out:
            with open(out, "w") as fh:
                fh.write(text)
        else:
            sys.stdout.write(text)


class TrioMaternalContaminationTool(ToolBase):
    name = "TrioMaternalContamination"
    description = "Detects maternal contamination of a child using SNPs from parents."

    def setup(self):
        self.add_infile("bam_m", "Input BAM/CRAM file of mother.")
        self.add_infile("bam_f", "Input BAM/CRAM file of father.")
        self.add_infile("bam_c", "Input BAM/CRAM file of child.")
        self.add_int("min_depth", "Minimum depth for calling SNPs.", optional=True, default=3)
        self.add_int("min_alt_count", "Minimum number of alternative observations for calling a SNP.", optional=True, default=1)
        self.add_enum("build", "Genome build used to generate the input.", optional=True,
                      valid=["hg19", "hg38"], default="hg38")
        self.add_outfile("out", "Output file. If unset, writes to STDOUT.", optional=True)
        self.add_infile("ref", "Reference genome for CRAM support (mandatory if CRAM is used).", optional=True)

    def main(self):
        # Behavioral reference: src/TrioMaternalContamination/main.cpp:
        # pileup known SNPs (full AF range, SNVs only incl. multi-allelic),
        # depth(true)>=min_depth; per alt: freq==1 marks the variant tag
        # homozygous globally; variants unique to one parent checked in child.
        from ..core import resources
        from ..qc.pileup import BASE2IDX, pileup_at_positions

        build = self.get_enum("build")
        min_depth = self.get_int("min_depth")
        min_alt = self.get_int("min_alt_count")
        snps = resources.known_variants(build, True)
        n = len(snps)
        sel = []
        for i in range(n):
            if not snps.chr_of(i).is_autosome():
                continue
            sel.append(i)
        sel = np.array(sel, dtype=np.int64)
        chr_nums = np.array([snps.chr_of(int(i)).num for i in sel], dtype=np.int64)
        positions = snps.pos[sel]
        tags = [f"{snps.chr_strs[int(i)].decode()}:{int(snps.pos[int(i)])} "
                f"{snps.refs[int(i)].decode()}>{snps.alts[int(i)].decode()}" for i in sel]
        ref_idx = np.array([BASE2IDX.get(snps.refs[int(i)][:1], 0) for i in sel], dtype=np.int64)
        alts_per = [snps.alts[int(i)].split(b",") for i in sel]

        homozygous: set[str] = set()
        member_variants: dict[str, dict] = {}
        for name, key in (("mother", "bam_m"), ("father", "bam_f"), ("child", "bam_c")):
            r = pileup_at_positions(self.get(key), chr_nums, positions, min_mapq=1,
                                    include_not_properly_paired=False, min_baseq=13)
            depth = r.depth(count_del=True)
            variants: dict = {}
            for k in range(len(sel)):
                if depth[k] < min_depth:
                    continue
                tag = tags[k]
                for alt in alts_per[k]:
                    ai = BASE2IDX.get(alt[:1], -1)
                    if ai < 0:
                        continue
                    count = int(r.counts[k, ai])
                    wt = int(r.counts[k, ref_idx[k]])
                    freq = count / (wt + count) if (wt + count) else float("nan")
                    if freq == 1.0:
                        homozygous.add(tag)
                        continue
                    if tag in homozygous:
                        continue
                    if count < min_alt:
                        continue
                    variants[tag] = freq
            member_variants[name] = variants

        for variants in member_variants.values():
            for tag in list(variants.keys()):
                if tag in homozygous:
                    del variants[tag]

        vm = member_variants["mother"]
        vf = member_variants["father"]
        vc = member_variants["child"]
        mother_variants = 0
        from_mother = 0
        for tag in vm:
            if tag in vf:
                continue
            mother_variants += 1
            if tag in vc:
                from_mother += 1
        father_variants = 0
        from_father = 0
        for tag in vf:
            if tag in vm:
                continue
            father_variants += 1
            if tag in vc:
                from_father += 1
        with np.errstate(divide="ignore", invalid="ignore"):
            perc_m = 100.0 * from_mother / mother_variants if mother_variants else float("nan")
            perc_f = 100.0 * from_father / father_variants if father_variants else float("nan")

        from decimal import ROUND_HALF_UP, Decimal

        def fmt2(v):
            if v != v:
                return "nan"
            return f"{Decimal(v).quantize(Decimal('0.01'), rounding=ROUND_HALF_UP):.2f}"

        lines = [f"Variants in mother: {mother_variants}",
                 f"Percentage of variants from mother passed to child: {fmt2(perc_m)}",
                 f"Variants in father: {father_variants}",
                 f"Percentage of variants from father passed to child: {fmt2(perc_f)}",
                 f"Ratio mother/father: {fmt2(perc_m / perc_f) if perc_f == perc_f and perc_f != 0 else 'nan'}"]
        text = "".join(l + "\n" for l in lines)
        out = self.get("out")
        if out:
            with open(out, "w") as fh:
                fh.write(text)
        else:
            sys.stdout.write(text)


TOOLS = {
    "TrioMendelianErrors": TrioMendelianErrorsTool,
    "TrioMaternalContamination": TrioMaternalContaminationTool,
}
