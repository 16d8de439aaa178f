"""Somatic tumor-normal QC engine.

Behavioral reference: ngs-bits Statistics::somatic (cppNGS/Statistics.cpp:
1712-2332), Statistics::mutationBurden (1442-1492) and
Statistics::mutationBurdenNormalized (1494-1572).

Host/device split: the variant-table statistics and binomial pileup logic run
as columnar numpy passes (the VCFs are small); the pileups for the tumor
content estimate go through the batched pileup engine (one sequential BAM
pass, vectorized M-op expansion) instead of the reference's per-locus
jump-and-scan.
"""

from __future__ import annotations

import os

import numpy as np

from ..core.basicstats import median
from ..core.intervals import BedFile
from ..core.qcml import QCCollection, QCValue
from ..io.vcf import VcfFile, vcf_sort
from . import pileup as pileup_mod
from . import sample_similarity as ss
from .variant_stats import add_qc_value, add_qc_plot

# filters excluded from mutation burden calculation (Statistics.cpp:1468-1477)
_TMB_SKIP_FILTERS = (b"freq-nor", b"freq-tum", b"depth-nor", b"depth-tum",
                     b"lt-3-reads", b"LowEVS", b"LowDepth", b"weak-evidence")


def _fmt2(v: float) -> str:
    from decimal import ROUND_HALF_UP, Decimal
    return f"{Decimal(v).quantize(Decimal('0.01'), rounding=ROUND_HALF_UP):.2f}"


def _tmb_variant_positions(vcf: VcfFile):
    """(chr, start, end) of variants passing the TMB filter exclusions."""
    out = []
    for line in vcf:
        filters = line.filters
        if any(f in filters for f in _TMB_SKIP_FILTERS):
            continue
        out.append((line.chr, line.start, line.end))
    return out


def mutation_burden(somatic_vcf: str, target: str, blacklist: str) -> QCValue:
    """Raw somatic variant rate QC:2000089 (Statistics.cpp:1442-1492)."""
    name = "raw somatic variant rate"
    desc = ("Somatic variant rate in variants per Megabase without normalization "
            "to TSG/Oncogenes or exome size. SNVs in blacklisted genes were "
            "discarded for the calculation.")
    acc = "QC:2000089"
    undefined = QCValue.from_string(name, "n/a", desc, acc)
    if not target or not blacklist:
        return undefined

    target_file = BedFile.from_file(target)
    blacklist_file = BedFile.from_file(blacklist)
    if len(target_file) == 0 or len(blacklist_file) == 0:
        return undefined

    blacklist_file.merge()
    target_file.subtract(blacklist_file)

    vcf = VcfFile.from_file(somatic_vcf)
    count = 0
    for chr_, start, end in _tmb_variant_positions(vcf):
        if target_file.overlaps_with(chr_, start, end):
            count += 1

    target_size = target_file.base_count() / 1_000_000.0
    return QCValue.from_string(name, _fmt2(count / target_size), desc, acc)


def mutation_burden_normalized(somatic_vcf: str, exons: str, target: str,
                               tsg: str, blacklist: str) -> QCValue:
    """Normalized somatic variant rate QC:2000053 (Statistics.cpp:1494-1572)."""
    name = "somatic variant rate"
    desc = ("Categorized somatic variant rate followed by the somatic variant "
            "rate [variants/Mbp] normalized for the target region and exome "
            "size and corrected for tumor suppressors.")
    acc = "QC:2000053"
    undefined = QCValue.from_string(name, "n/a", desc, acc)
    if not exons or not target or not tsg or not blacklist:
        return undefined

    target_file = BedFile.from_file(target)
    target_exon_file = BedFile.from_file(exons)
    exome_size = target_exon_file.base_count() / 1_000_000.0
    blacklist_file = BedFile.from_file(blacklist)
    tsg_bed_file = BedFile.from_file(tsg)
    if (len(target_file) == 0 or len(target_exon_file) == 0
            or len(blacklist_file) == 0 or len(tsg_bed_file) == 0):
        return undefined

    target_exon_file.merge()
    target_file.intersect(target_exon_file)
    blacklist_file.merge()
    target_file.subtract(blacklist_file)
    if len(target_file) == 0:
        return undefined

    vcf = VcfFile.from_file(somatic_vcf)
    var_count = 0
    tsg_count = 0
    for chr_, start, end in _tmb_variant_positions(vcf):
        if target_file.overlaps_with(chr_, start, end):
            var_count += 1
            if tsg_bed_file.overlaps_with(chr_, start, end):
                tsg_count += 1

    target_size = target_file.base_count() / 1_000_000.0
    burden = ((var_count - tsg_count) * exome_size / target_size + tsg_count) / exome_size
    return QCValue.from_string(name, _fmt2(burden), desc, acc)


def somatic(build: str, tumor_bam: str, normal_bam: str, somatic_vcf: str,
            ref_fasta: str, target_file: BedFile, skip_plots: bool) -> QCCollection:
    """Statistics::somatic (cppNGS/Statistics.cpp:1712-2332)."""
    output = QCCollection()

    # sample correlation. The reference routes an EMPTY target through
    # VcfFile::setRegion, which restricts the known-SNP list to nothing —
    # so an empty target means ZERO genotyping SNPs, not "all".
    if len(target_file):
        tumor_geno = ss.genotypes_from_bam(build, tumor_bam, 30, 500, True, roi=target_file)
        normal_geno = ss.genotypes_from_bam(build, normal_bam, 30, 500, True, roi=target_file)
    else:
        tumor_geno, normal_geno = {}, {}
    sim = ss.calculate_similarity(tumor_geno, normal_geno)
    add_qc_value(output, "QC:2000040", "sample correlation",
                 "n/a (too few variants)" if sim.ol_count < 100
                 else _fmt2(sim.sample_correlation))

    variants = VcfFile.from_file(somatic_vcf)
    vcf_sort(variants)

    add_qc_value(output, "QC:2000013", "variant count", len(variants))

    passed = [variants[i].filters_passed() for i in range(len(variants))]
    somatic_count = sum(passed)
    add_qc_value(output, "QC:2000041", "somatic variant count", somatic_count)

    # percentage known variants
    if variants.header.info_id_defined("gnomADg_AF"):
        if len(variants) != 0:
            known_count = 0
            for i in range(len(variants)):
                if not passed[i]:
                    continue
                anno = variants[i].info("gnomADg_AF")
                try:
                    if float(anno) > 0.01:
                        known_count += 1
                except ValueError:
                    pass
            add_qc_value(output, "QC:2000045", "known somatic variants percentage",
                         100.0 * known_count / somatic_count)
        else:
            add_qc_value(output, "QC:2000045", "known somatic variants percentage",
                         "n/a (no somatic variants)")
    else:
        add_qc_value(output, "QC:2000045", "known somatic variants percentage",
                     "n/a (no gnomADg_AF annotation info field)")

    # indel percentage / Ti-Tv ratio
    indel_count = ti_count = tv_count = 0
    for i in range(len(variants)):
        if not passed[i]:
            continue
        line = variants[i]
        ref = line.ref
        alt = line.alt(0)
        if (len(alt) > 1 and len(ref) == 1) or (len(alt) == 1 and len(ref) > 1):
            indel_count += 1
        elif (alt, ref) in ((b"A", b"G"), (b"G", b"A"), (b"T", b"C"), (b"C", b"T")):
            ti_count += 1
        else:
            tv_count += 1
    if somatic_count != 0:
        add_qc_value(output, "QC:2000042", "somatic indel variants percentage",
                     100.0 * indel_count / somatic_count)
    else:
        add_qc_value(output, "QC:2000042", "somatic indel variants percentage",
                     "n/a (no variants)")
    if tv_count != 0:
        add_qc_value(output, "QC:2000043", "somatic transition/transversion ratio",
                     ti_count / tv_count)
    else:
        add_qc_value(output, "QC:2000043", "somatic transition/transversion ratio",
                     "n/a (no variants or transversions)")

    # tumor content estimate: batched pileups at passing autosomal SNVs
    min_depth = 30
    loci = []  # (chr_num, pos, ref_idx, alt_idx)
    for i in range(len(variants)):
        line = variants[i]
        if not line.is_snv():
            continue
        if not line.chr.is_autosome():
            continue
        if not passed[i]:
            continue
        r = pileup_mod.base_index(line.ref)
        a = pileup_mod.base_index(line.alt(0))
        loci.append((line.chr.num, line.start, r, a))

    freqs = []
    if loci:
        chr_nums = np.array([l[0] for l in loci], dtype=np.int64)
        positions = np.array([l[1] for l in loci], dtype=np.int64)
        ref_idx = np.array([l[2] for l in loci], dtype=np.int64)
        alt_idx = np.array([l[3] for l in loci], dtype=np.int64)
        # getPileup defaults: min_mapq=1, min_baseq=13 (BamReader.h:417)
        pu_tu = pileup_mod.pileup_at_positions(tumor_bam, chr_nums, positions,
                                               min_mapq=1, min_baseq=13)
        pu_no = pileup_mod.pileup_at_positions(normal_bam, chr_nums, positions,
                                               min_mapq=1, min_baseq=13)
        tu_depth = pu_tu.depth(True)
        no_depth = pu_no.depth(True)
        no_freq = pu_no.frequency(ref_idx, alt_idx)
        tu_freq = pu_tu.frequency(ref_idx, alt_idx)
        for k in range(len(loci)):
            if tu_depth[k] < min_depth:
                continue
            if no_depth[k] < min_depth:
                continue
            nf = no_freq[k]
            if not np.isfinite(nf) or nf >= 0.01:
                continue
            tf = tu_freq[k]
            if not np.isfinite(tf) or tf > 0.6:
                continue
            freqs.append(float(tf))

    freqs.sort()
    n = 10
    if len(freqs) >= n:
        top = freqs[len(freqs) - n:]
        # BasicStatistics::median averages the two middle elements for even n
        tmp = min(median(top) * 200, 100.0)
        value = _fmt2(tmp)
    else:
        value = "n/a (too few variants)"
    add_qc_value(output, "QC:2000054", "tumor content estimate", value)

    if skip_plots:
        return output

    _somatic_plots(output, tumor_bam, normal_bam, ref_fasta, target_file,
                   variants, passed)
    return output


def _somatic_plots(output, tumor_bam, normal_bam, ref_fasta, target_file,
                   variants, passed):
    """Plots QC:2000055/56/48/47/46 (Statistics.cpp:1867-2329). Binary
    content is stripped in golden comparisons; shapes/labels mirror the
    reference, rasterization is our own."""
    from ..core.chromosome import Chromosome
    from ..core.histogram import Histogram
    from ..core.plots import BarPlot, LinePlot, ScatterPlot
    from ..io.fasta import FastaFileIndex, reverse_complement

    tumor_id = os.path.basename(tumor_bam).split(".")[0].encode()
    normal_id = os.path.basename(normal_bam).split(".")[0].encode()
    nucleotides = [b"A", b"C", b"G", b"T"]
    header = variants.header
    sample_names = variants.sample_ids()

    def sample_idx(name: bytes) -> int:
        try:
            return sample_names.index(name)
        except ValueError:
            return -1

    def fmt_sample(i, key: bytes, sample: bytes) -> bytes:
        si = sample_idx(sample)
        if si < 0:
            return b""
        return variants[i].format_value(key.decode(), si)

    # plot0: allele-frequency histograms
    hist_filtered = Histogram(0, 1, 0.0125)
    hist_all = Histogram(0, 1, 0.0125)
    for i in range(len(variants)):
        line = variants[i]
        if not line.is_snv():
            continue
        alt = line.alt(0)
        if header.format_id_defined("AU") and fmt_sample(i, b"AU", tumor_id):
            count_mut = count_all = 0
            for nname in nucleotides:
                v = fmt_sample(i, nname + b"U", tumor_id).split(b",")[0]
                tmp = int(v) if v else 0
                if nname == alt:
                    count_mut += tmp
                count_all += tmp
            if count_all > 0:
                hist_all.inc(count_mut / count_all)
                if passed[i]:
                    hist_filtered.inc(count_mut / count_all)
        elif header.format_id_defined("AO"):
            count_mut = int(fmt_sample(i, b"AO", tumor_id) or 0)
            count_all = count_mut + int(fmt_sample(i, b"RO", tumor_id) or 0)
            if count_all > 0:
                hist_all.inc(count_mut / count_all)
                if passed[i]:
                    hist_filtered.inc(count_mut / count_all)
        else:
            for key in ("FA", "AF", "VAF"):
                if header.format_id_defined(key):
                    v = float(fmt_sample(i, key.encode(), tumor_id) or 0)
                    hist_all.inc(v)
                    if passed[i]:
                        hist_filtered.inc(v)
                    break

    plot0 = LinePlot()
    plot0.set_xlabel("tumor allele frequency")
    plot0.set_ylabel("count")
    plot0.set_xvalues(hist_all.x_coords())
    plot0.add_line(hist_all.y_coords(), "all variants")
    plot0.add_line(hist_filtered.y_coords(), "variants with filter PASS")
    add_qc_plot(output, "QC:2000055", "somatic SNVs allele frequency histogram",
                plot0.to_base64())

    # plot0b: base-change counts
    nuc_changes = [b"C>A", b"C>G", b"C>T", b"T>A", b"T>G", b"T>C"]
    counts = [0] * 6
    for i in range(len(variants)):
        if not passed[i]:
            continue
        line = variants[i]
        if not line.is_snv():
            continue
        n = line.ref + b">" + line.alt(0)
        if n not in nuc_changes:
            n = reverse_complement(line.ref) + b">" + reverse_complement(line.alt(0))
            if n not in nuc_changes:
                continue
        counts[nuc_changes.index(n)] += 1
    plot0b = BarPlot()
    plot0b.set_xlabel("base change")
    plot0b.set_ylabel("count")
    ymax = max(counts) if counts else 0
    plot0b.set_yrange(-ymax * 0.02, ymax * 1.2)
    plot0b.set_xrange(-1.5, len(nuc_changes) + 0.5)
    plot0b.set_values(counts, [c.decode() for c in nuc_changes])
    add_qc_plot(output, "QC:2000056", "somatic SNV mutation types", plot0b.to_base64())

    # plot1: tumor-vs-normal allele frequencies
    points = []
    greens = []
    for i in range(len(variants)):
        line = variants[i]
        af_tumor = -1.0
        af_normal = -1.0
        alt = line.alt(0)
        if header.format_id_defined("TIR") and fmt_sample(i, b"AU", tumor_id):
            for sample, is_t in ((tumor_id, True), (normal_id, False)):
                count_mut = count_all = 0
                for nname in nucleotides:
                    v = fmt_sample(i, nname + b"U", sample).split(b",")[0]
                    tmp = int(v) if v else 0
                    if nname == alt:
                        count_mut += tmp
                    count_all += tmp
                if count_all > 0:
                    if is_t:
                        af_tumor = count_mut / count_all
                    else:
                        af_normal = count_mut / count_all
        elif header.format_id_defined("TIR") and fmt_sample(i, b"TIR", tumor_id):
            for sample, is_t in ((tumor_id, True), (normal_id, False)):
                mut = fmt_sample(i, b"TIR", sample).split(b",")[0]
                tar = fmt_sample(i, b"TAR", sample).split(b",")[0]
                count_mut = int(mut) if mut else 0
                count_all = (int(tar) if tar else 0) + count_mut
                if count_all > 0:
                    if is_t:
                        af_tumor = count_mut / count_all
                    else:
                        af_normal = count_mut / count_all
        elif header.format_id_defined("AO"):
            for sample, is_t in ((tumor_id, True), (normal_id, False)):
                count_mut = int(fmt_sample(i, b"AO", sample) or 0)
                count_all = count_mut + int(fmt_sample(i, b"RO", sample) or 0)
                if count_all > 0:
                    if is_t:
                        af_tumor = count_mut / count_all
                    else:
                        af_normal = count_mut / count_all
        elif header.format_id_defined("FA"):
            af_tumor = float(fmt_sample(i, b"FA", tumor_id) or 0)
            af_normal = float(fmt_sample(i, b"FA", normal_id) or 0)
        elif header.format_id_defined("AF"):
            af_tumor = float(fmt_sample(i, b"AF", tumor_id) or 0)
            af_normal = float(fmt_sample(i, b"AF", normal_id) or 0)
        elif (header.info_id_defined((normal_id + b"_AF").decode())
              and header.format_id_defined("VAF")):
            af_tumor = float(fmt_sample(i, b"VAF", tumor_id) or 0)
            af_normal = float(line.info((normal_id + b"_AF").decode()) or 0)
        points.append((af_tumor, af_normal))
        greens.append(bool(passed[i]))
    plot1 = ScatterPlot()
    plot1.set_xlabel("tumor allele frequency")
    plot1.set_ylabel("normal allele frequency")
    plot1.set_xrange(-0.015, 1.015)
    plot1.set_yrange(-0.015, 1.015)
    ordered = [p for p, g in zip(points, greens) if not g] + \
              [p for p, g in zip(points, greens) if g]
    plot1.set_values(ordered)
    add_qc_plot(output, "QC:2000048", "somatic variants allele frequencies plot",
                plot1.to_base64())

    # plot2: triplet signature, normalized by target codon content
    reference = FastaFileIndex(ref_fasta)
    codons = []
    labels = []
    sig_counts = []
    for r in (b"C", b"T"):
        for o in nucleotides:
            if r == o:
                continue
            for rr in nucleotides:
                for rrr in nucleotides:
                    codons.append(rr + r + rrr + b" - " + o)
                    labels.append((rr + r + rrr).decode())
                    sig_counts.append(0)
    for i in range(len(variants)):
        if not passed[i]:
            continue
        line = variants[i]
        if not line.is_snv():
            continue
        chr_, start = line.chr, line.start
        left = reference.seq(chr_, start - 1, 1).upper()
        right = reference.seq(chr_, start + 1, 1).upper()
        c = left + line.ref.upper() + right + b" - " + line.alt(0).upper()
        if c not in codons:
            c = (reverse_complement(left + line.ref.upper() + right)
                 + b" - " + reverse_complement(line.alt(0)).upper())
        if c in codons:
            sig_counts[codons.index(c)] += 1

    codon_targets = {}
    for rr in nucleotides:
        for r in (b"C", b"T"):
            for rrr in nucleotides:
                codon_targets[rr + r + rrr] = 0

    def count_codons(seq):
        for codon in codon_targets:
            codon_targets[codon] += seq.count(codon)
            codon_targets[codon] += seq.count(reverse_complement(codon))

    if len(target_file) == 0:
        bin_size = 50_000_000
        for chr_ in reference.chromosomes():
            if not chr_.is_non_special():
                continue
            chrom_length = reference.length_of(chr_)
            j = 1
            while j <= chrom_length:
                start = j
                length = bin_size
                if start > 1:
                    start -= 2
                    length += 2
                if start + length - 1 > chrom_length:
                    length = chrom_length - start + 1
                count_codons(reference.seq(chr_, start, length).upper())
                j += bin_size
    else:
        for l in target_file.lines:
            count_codons(reference.seq(l.chr, l.start, l.end - l.start + 1).upper())

    normalized = []
    for i, c in enumerate(codons):
        denom = codon_targets[c[:3]]
        normalized.append(sig_counts[i] / denom if denom else 0.0)
    total = sum(normalized)
    frequencies = [v / total * 100 if total else 0.0 for v in normalized]
    y_max = max([5.0] + frequencies)
    plot2 = BarPlot()
    plot2.set_xlabel("triplett")
    plot2.set_ylabel("normalized variant type percentage" if len(target_file)
                     else "variant type percentage")
    plot2.set_xrange(-1.5, len(frequencies) + 0.5)
    plot2.set_yrange(-y_max * 0.02, y_max * 1.2)
    plot2.set_values(frequencies, labels)
    add_qc_plot(output, "QC:2000047", "somatic variant signature plot", plot2.to_base64())

    # plot3: somatic variant distances (WGS only)
    if len(target_file) == 0:
        genome_size = 0
        chrom_starts = {}
        with open(ref_fasta + ".fai", "rb") as fh:
            for raw in fh:
                parts = raw.split(b"\t")
                if len(parts) < 2:
                    continue
                c = Chromosome(parts[0])
                if not c.is_non_special():
                    continue
                chrom_starts[c.num] = genome_size
                genome_size += int(parts[1])
        pts = []
        tmp_chr = None
        tmp_pos = 0
        tmp_offset = 0.0
        for i in range(len(variants)):
            line = variants[i]
            if not line.chr.is_non_special():
                continue
            if not passed[i]:
                continue
            if tmp_chr == line.chr.num:
                pts.append((tmp_offset + line.start / genome_size,
                            line.start - tmp_pos))
            if tmp_chr != line.chr.num and tmp_chr is not None:
                if line.chr.num in chrom_starts:
                    tmp_offset = chrom_starts.get(tmp_chr, 0) / genome_size
            tmp_chr = line.chr.num
            tmp_pos = line.start
        plot3 = ScatterPlot()
        plot3.set_xlabel("chromosomes")
        plot3.set_ylabel("somatic variant distance [bp]")
        plot3.set_xrange(0, 1)
        maxd = max([p[1] for p in pts], default=1)
        plot3.set_yrange(0.975, maxd * 100)
        plot3.set_values(pts)
        add_qc_plot(output, "QC:2000046", "somatic variant distance plot",
                    plot3.to_base64())
