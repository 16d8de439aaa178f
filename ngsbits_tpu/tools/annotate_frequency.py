"""BAM-derived per-variant frequency annotation tools.

Behavioral reference: ngs-bits src/VcfAnnotateFrequency/main.cpp,
src/VariantAnnotateFrequency/main.cpp, src/VariantAnnotateASE/main.cpp.
All three drive BamReader::getVariantDetails (see qc/variant_details.py).
"""

from __future__ import annotations

import math

from ..core.basicstats import factorial, is_valid_float
from ..core.intervals import BedFile, ChromosomalIndex
from ..io.fasta import FastaFileIndex
from ..io.gsvar import GSvarFile
from ..io.vcf import VcfFile, add_missing_header_lines, vcf_store
from ..qc.variant_details import gsvar_from_vcf, variant_details
from .toolbase import ToolBase, ToolError


def _require_ref(tool) -> str:
    ref = tool.get_infile("ref")
    if not ref:
        raise ToolError("Reference genome FASTA unset in both command-line and settings.ini file!")
    return ref


class VcfAnnotateFrequencyTool(ToolBase):
    name = "VcfAnnotateFrequency"
    description = "Annotates VCF variants with allele frequency and depth from a BAM/CRAM file."

    def setup(self):
        self.add_infile("in", "Input variant list to annotate in VCF(.GZ) format.")
        self.add_infile("bam", "Input BAM/CRAM file.")
        self.add_outfile("out", "Output variant list file in VCF format.")
        self.add_flag("depth", "Annotate an additional INFO field entry containing the depth.")
        self.add_string("name", "INFO field entry prefix in output file.", optional=True, default="N")
        self.add_infile("ref", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)

    def main(self):
        depth = self.get_flag("depth")
        name = self.get_string("name").encode()
        ref_file = _require_ref(self)
        fasta = FastaFileIndex(ref_file)

        f = VcfFile.from_file(self.get_infile("in"))
        add_missing_header_lines(f)

        variants = []
        for i in range(len(f)):
            if b"," in f.alts[i]:
                raise ToolError(f"Cannot convert multi-allelic VCF variant to GSvar variant")
            s, e, r, o = gsvar_from_vcf(int(f.pos[i]), f.refs[i], f.alts[i])
            variants.append((f.chr_of(i), s, e, r, o))
        details = variant_details(self.get_infile("bam"), fasta, variants)

        for i, d in enumerate(details):
            if d.depth == 0 or not is_valid_float(d.frequency):
                af = b"0"
            else:
                af = f"{d.frequency:.4f}".encode()
            prefix = name + b"_AF=" + af
            if depth:
                prefix += b";" + name + b"_DP=" + str(d.depth).encode()
            old = f.infos[i]
            f.infos[i] = prefix if old in (b".", b"") else prefix + b";" + old

        sample = b"normal sample" if name == b"N" else name
        f.header.info_lines.append((
            (name + b"_AF").decode(),
            b"##INFO=<ID=" + name + b'_AF,Number=1,Type=Float,Description="Variant allele frequency in ' + sample + b'">'))
        f.header.info_ids.add((name + b"_AF").decode())
        if depth:
            f.header.info_lines.append((
                (name + b"_DP").decode(),
                b"##INFO=<ID=" + name + b'_DP,Number=1,Type=Integer,Description="Read depth in ' + sample + b'">'))
            f.header.info_ids.add((name + b"_DP").decode())

        vcf_store(f, self.get_outfile("out"))


class VariantAnnotateFrequencyTool(ToolBase):
    name = "VariantAnnotateFrequency"
    description = "Annotates a variant list with variant frequencies from a BAM/CRAM file."

    def setup(self):
        self.add_infile("in", "Input variant list to annotate in GSvar format.")
        self.add_infile("bam", "Input BAM/CRAM file.")
        self.add_outfile("out", "Output variant list file in GSvar format.")
        self.add_flag("depth", "Annotate an additional column containing the depth.")
        self.add_flag("mapq0", "Annotate an additional column containing the percentage of mapq 0 reads.")
        self.add_string("name", "Column header prefix in output file.", optional=True, default="")
        self.add_infile("ref", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)
        self.add_flag("long_read", "Support long reads (> 1kb).")
        self.add_flag("fragments", "Count based on fragments not reads.")
        self.add_infile("target", "Only annotate variants within the target region given in BED format.", optional=True)

    def main(self):
        depth = self.get_flag("depth")
        mapq0 = self.get_flag("mapq0")
        ref_file = _require_ref(self)
        long_read = self.get_flag("long_read")
        count_fragments = self.get_flag("fragments")
        fasta = FastaFileIndex(ref_file)

        gs = GSvarFile.from_file(self.get_infile("in"))
        target_path = self.get_infile("target")
        index = None
        if target_path:
            target = BedFile.from_file(target_path)
            target.lines.sort(key=lambda l: l.sort_key())
            index = ChromosomalIndex(target)

        in_target = []
        todo = []
        for v in gs.variants:
            ok = True
            if index is not None:
                ok = len(index.matching_indices(v.chr, v.start, v.end)) > 0
            in_target.append(ok)
            if ok:
                todo.append((v.chr, v.start, v.end, v.ref, v.obs))
        details = variant_details(self.get_infile("bam"), fasta, todo,
                                  include_not_properly_paired=long_read,
                                  count_fragments=count_fragments)
        k = 0
        for v, ok in zip(gs.variants, in_target):
            if not ok:
                v.annotations.append(b".")
                if depth:
                    v.annotations.append(b".")
                if mapq0:
                    v.annotations.append(b".")
                continue
            d = details[k]
            k += 1
            if d.depth == 0 or not is_valid_float(d.frequency):
                v.annotations.append(b"n/a")
            else:
                v.annotations.append(f"{d.frequency:.4f}".encode())
            if depth:
                v.annotations.append(str(d.depth).encode())
            if mapq0:
                v.annotations.append(f"{d.mapq0_frac:.2f}".encode())

        prefix = self.get_string("name")
        prefix = prefix + "_" if prefix else ""
        gs.columns.append(prefix + "freq")
        gs.add_description(prefix + "freq", "Variant frequency.")
        if depth:
            gs.columns.append(prefix + "depth")
            gs.add_description(prefix + "depth", "Sequencing depth at the variant position.")
        if mapq0:
            gs.columns.append(prefix + "mapq0_frac")
            gs.add_description(prefix + "mapq0_frac", "Fraction of reads with mapping quality 0 at the variant position.")
        gs.store(self.get_outfile("out"))


def _binom(x: int, n: int, p: float) -> float:
    return (math.pow(p, x) * math.pow(1 - p, n - x) * factorial(n)
            / factorial(x) / factorial(n - x))


def binomtest_p(x: int, n: int, p: float) -> float:
    """VariantAnnotateASE/main.cpp:38-60 — two-sided exact binomial test by
    summing all outcome probabilities <= P(x), with halving for n beyond the
    finite factorial range."""
    while not is_valid_float(factorial(n)):
        x //= 2
        n //= 2
    pval = 0.0
    prob_x = _binom(x, n, p)
    for i in range(n + 1):
        prob_i = _binom(i, n, p)
        if prob_i <= prob_x:
            pval += prob_i
    return pval


class VariantAnnotateASETool(ToolBase):
    name = "VariantAnnotateASE"
    description = "Annotates variants with frequencies from RNA BAM (allele-specific expression)."

    def setup(self):
        self.add_infile("in", "Input variant list to annotate in GSvar format.")
        self.add_infile("bam", "Input BAM/CRAM file.")
        self.add_outfile("out", "Output variant list file name (VCF or GSvar).")
        self.add_infile("ref", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)

    def main(self):
        ref_file = _require_ref(self)
        fasta = FastaFileIndex(ref_file)

        gs = GSvarFile.from_file(self.get_infile("in"))
        analysis_type = b""
        for c in gs.comments:
            if c.startswith(b"##ANALYSISTYPE="):
                analysis_type = c.split(b"=", 1)[1].strip()
        somatic = analysis_type in (b"SOMATIC_PAIR", b"SOMATIC_SINGLESAMPLE")
        col_name = "tumor_af" if somatic else (gs.samples[0][0] if gs.samples else "")
        col_idx = gs.annotation_index(col_name)

        details = variant_details(
            self.get_infile("bam"), fasta,
            [(v.chr, v.start, v.end, v.ref, v.obs) for v in gs.variants])

        for v, d in zip(gs.variants, details):
            if d.depth == 0 or not is_valid_float(d.frequency):
                v.annotations += [b"n/a (no coverage)", str(d.depth).encode(),
                                  b"n/a (no coverage)", b"n/a (no coverage)"]
                continue
            if not somatic and v.annotations[col_idx] != b"het":
                pval_str = b"n/a (non-het)"
            else:
                prob = 0.5 if not somatic else float(v.annotations[col_idx])
                pval = binomtest_p(d.obs, d.depth, prob)
                pval_str = f"{pval:.4f}".encode()
            v.annotations += [f"{d.frequency:.4f}".encode(), str(d.depth).encode(),
                              str(d.obs).encode(), pval_str]

        for cname, desc in (("ASE_af", "Expressed variant allele frequency."),
                            ("ASE_depth", "Sequencing depth at the variant position."),
                            ("ASE_alt", "Expressed variant alternative observation count."),
                            ("ASE_pval", "Binomial test p-value.")):
            gs.columns.append(cname)
            gs.add_description(cname, desc)
        gs.comments.append(b"##VariantAnnotateASE_BAM=" + self.get_infile("bam").encode())
        gs.store(self.get_outfile("out"))


TOOLS = {
    "VcfAnnotateFrequency": VcfAnnotateFrequencyTool,
    "VariantAnnotateFrequency": VariantAnnotateFrequencyTool,
    "VariantAnnotateASE": VariantAnnotateASETool,
}
