"""Unit tests for the FilterCascade registry (reference:
cppNGS/FilterCascade.cpp filter classes + cppNGS-TEST/FilterCascade_Test.cpp).

Every filter name in the reference FilterFactory registry must be
instantiable by name, and the filters added in round 3 are behavior-tested
on synthetic variant lists.
"""

from __future__ import annotations

import pytest

from ngsbits_tpu.core.chromosome import Chromosome
from ngsbits_tpu.filters import cascade
from ngsbits_tpu.io.bedpe import BedpeFile, BedpeLine, SampleInfo
from ngsbits_tpu.io.cnv import CnvList, CopyNumberVariant
from ngsbits_tpu.io.gsvar import GSvarFile, GSvarVariant

REFERENCE_REGISTRY = [
    "Allele frequency", "Genes", "Filter column empty", "SNVs only",
    "Allele frequency (sub-populations)", "Impact", "Count NGSD",
    "Filter columns", "Classification NGSD", "Gene inheritance",
    "Gene constraint", "Genotype control", "Genotype affected",
    "Column match", "Annotated pathogenic", "Predicted pathogenic",
    "Text search", "Variant type", "Variant quality", "Trio", "OMIM genes",
    "Conservedness", "Regulatory", "CNV size", "CNV regions",
    "CNV copy-number", "CNV allele frequency", "CNV maximum log-likelihood",
    "CNV log-likelihood", "CNV q-value", "CNV compound-heterozygous",
    "CNV OMIM genes", "CNV polymorphism region", "CNV gene constraint",
    "CNV tumor CN change", "CNV clonality", "CNV gene overlap",
    "CNV pathogenic CNV overlap", "SV type", "SV remove chr type",
    "SV genotype control", "SV genotype affected", "SV quality",
    "SV filter columns", "SV paired read AF", "SV split read AF",
    "SV PE read depth", "SV SomaticScore", "SV gene constraint",
    "SV gene overlap", "SV size", "SV OMIM genes",
    "SV compound-heterozygous", "SV count NGSD", "SV allele frequency NGSD",
    "SV break point density NGSD", "SV trio", "Somatic allele frequency",
    "Tumor zygosity", "GSvar score/rank", "Splice effect",
    "RNA ASE allele frequency", "RNA ASE depth", "RNA ASE alternative count",
    "RNA ASE p-value", "RNA aberrant splicing fraction",
    "RNA gene expression", "RNA expression fold-change",
    "RNA expression z-score", "lr short-read overlap", "SV CNV overlap",
    "SV-lr AF", "SV-lr support reads", "SV annotated pathogenic",
]


@pytest.mark.parametrize("name", REFERENCE_REGISTRY)
def test_every_reference_filter_instantiable(name):
    f = cascade.create_filter(name)
    assert f.NAME == name


def test_unknown_filter_raises():
    with pytest.raises(ValueError, match="not valid"):
        cascade.create_filter("No such filter")


# ------------------------------------------------------------ helpers

def make_gsvar(columns, rows, comments=()):
    g = GSvarFile()
    g.columns = list(columns)
    g.comments = [c if isinstance(c, bytes) else c.encode() for c in comments]
    for chrom, start, end, ref, obs, annos in rows:
        g.variants.append(GSvarVariant(Chromosome(chrom), start, end,
                                       ref, obs, list(annos)))
    return g


def run_filter(name, params, target, subject="snv"):
    f = cascade.create_filter(name, params)
    n = len(target.variants) if hasattr(target, "variants") else len(target.lines)
    result = cascade.FilterResult(n)
    f.apply(target, result)
    return result.flags


def make_cnvs(headers, rows, type_="germline_single"):
    c = CnvList()
    c.type = type_
    c.annotation_headers = [h.encode() for h in headers]
    for chrom, start, end, num_regs, genes, annos in rows:
        c.variants.append(CopyNumberVariant(Chromosome(chrom), start, end,
                                            num_regs, genes, annos))
    return c


def make_bedpe(headers, rows, fmt_comment=None, samples=()):
    b = BedpeFile()
    if fmt_comment:
        b.headers.append(fmt_comment)
    b.annotation_headers = [h.encode() for h in headers]
    for name, props in samples:
        info = SampleInfo(name)
        info.properties.update(props)
        info.column_index = b.annotation_index_by_name(name.encode())
        b.sample_header_info.append(info)
    for chrom1, s1, e1, chrom2, s2, e2, type_, annos in rows:
        b.lines.append(BedpeLine(chrom1, s1, e1, chrom2, s2, e2, type_, annos))
    if not b.sample_header_info:
        i_format = b.annotation_index_by_name(b"FORMAT", False)
        if i_format >= 0 and i_format + 1 < len(b.annotation_headers):
            info = SampleInfo(b.annotation_headers[i_format + 1].decode())
            info.column_index = i_format + 1
            b.sample_header_info.append(info)
    return b


def run_sv_filter(name, params, svs):
    f = cascade.create_filter(name, params)
    result = cascade.FilterResult(len(svs.lines))
    f.apply(svs, result)
    return result.flags


def run_cnv_filter(name, params, cnvs):
    f = cascade.create_filter(name, params)
    result = cascade.FilterResult(len(cnvs.variants))
    f.apply(cnvs, result)
    return result.flags


# ------------------------------------------------------------ SNV filters

def test_filter_genes_plain_and_wildcard():
    g = make_gsvar(["gene"], [
        ("chr1", 1, 1, b"A", b"C", [b"BRCA1"]),
        ("chr1", 2, 2, b"A", b"C", [b"TP53,EGFR"]),
        ("chr1", 3, 3, b"A", b"C", [b""]),
    ])
    assert run_filter("Genes", ["genes=BRCA1"], g) == [True, False, False]
    assert run_filter("Genes", ["genes=BRCA*"], g) == [True, False, False]
    assert run_filter("Genes", ["genes=TP5*,BRCA1"], g) == [True, True, False]


def test_filter_gene_inheritance():
    g = make_gsvar(["gene_info"], [
        ("chr1", 1, 1, b"A", b"C", [b"PRPF31 (inh=AD pLI=0.97)"]),
        ("chr1", 2, 2, b"A", b"C", [b"CPT2 (inh=AR+AD oe_lof=0.76)"]),
        ("chr1", 3, 3, b"A", b"C", [b"X (inh=n/a pLI=n/a)"]),
        ("chr1", 4, 4, b"A", b"C", [b"NOINFO"]),
    ])
    assert run_filter("Gene inheritance", ["modes=AD"], g) == [True, True, False, False]
    assert run_filter("Gene inheritance", ["modes=AR"], g) == [False, True, False, False]


def test_filter_gene_constraint():
    g = make_gsvar(["gene_info"], [
        ("chr1", 1, 1, b"A", b"C", [b"A (oe_lof=0.10)"]),
        ("chr1", 2, 2, b"A", b"C", [b"B (oe_lof=0.90)"]),
        ("chr1", 3, 3, b"A", b"C", [b"C (oe_lof=n/a)"]),  # unparsable > skip (SNV)
    ])
    assert run_filter("Gene constraint", ["max_oe_lof=0.35"], g) == [True, False, False]


def test_filter_column_match():
    g = make_gsvar(["info"], [
        ("chr1", 1, 1, b"A", b"C", [b"hit_ABC"]),
        ("chr1", 2, 2, b"A", b"C", [b"other"]),
    ])
    assert run_filter("Column match",
                      ["pattern=hit_[A-Z]+", "column=info", "action=FILTER"],
                      g) == [True, False]
    assert run_filter("Column match",
                      ["pattern=hit_[A-Z]+", "column=info", "action=REMOVE"],
                      g) == [False, True]


def test_filter_predicted_pathogenic():
    cols = ["phyloP", "CADD", "REVEL", "coding_and_splicing"]
    g = make_gsvar(cols, [
        ("chr1", 1, 1, b"A", b"C", [b"2.5", b"30", b"0.95", b""]),   # 3 votes
        ("chr1", 2, 2, b"A", b"C", [b"2.5", b"1", b"0.1", b""]),     # 1 vote
        ("chr1", 3, 3, b"A", b"C", [b"0.1", b"1", b"0.1", b""]),     # 0 votes
        ("chr1", 4, 4, b"A", b"C", [b"n/a", b"n/a", b"n/a", b":HIGH:"]),
    ])
    assert run_filter("Predicted pathogenic", ["min=2"], g) == [True, False, False, False]
    # skip_high_impact leaves HIGH variants untouched
    assert run_filter("Predicted pathogenic", ["min=1", "skip_high_impact=true"],
                      g) == [True, True, False, True]


def test_filter_variant_type():
    g = make_gsvar(["coding_and_splicing"], [
        ("chr1", 1, 1, b"A", b"C", [b"GENE:missense_variant:MODERATE"]),
        ("chr1", 2, 2, b"A", b"C", [b"GENE:intron_variant:MODIFIER"]),
    ])
    assert run_filter("Variant type", [], g) == [True, False]
    assert run_filter("Variant type",
                      ["HIGH=", "MODERATE=", "LOW=", "MODIFIER=intron_variant"],
                      g) == [False, True]


def test_filter_omim_conservedness_regulatory():
    g = make_gsvar(["OMIM", "phyloP", "regulatory"], [
        ("chr1", 1, 1, b"A", b"C", [b"600123", b"3.0", b"promoter"]),
        ("chr1", 2, 2, b"A", b"C", [b"", b"0.1", b""]),
    ])
    assert run_filter("OMIM genes", [], g) == [True, False]
    assert run_filter("OMIM genes", ["action=REMOVE"], g) == [False, True]
    assert run_filter("Conservedness", [], g) == [True, False]
    assert run_filter("Regulatory", [], g) == [True, False]
    assert run_filter("Regulatory", ["action=REMOVE"], g) == [False, True]


def test_filter_somatic_af_and_tumor_zygosity():
    g = make_gsvar(["tumor_af", "normal_af"], [
        ("chr1", 1, 1, b"A", b"C", [b"0.30", b"0.001"]),
        ("chr1", 2, 2, b"A", b"C", [b"0.02", b"0.001"]),   # tumor AF too low
        ("chr1", 3, 3, b"A", b"C", [b"0.30", b"0.20"]),    # normal AF too high
        ("chr1", 4, 4, b"A", b"C", [b"0.50", b"0.0"]),     # germline het
        ("chr1", 5, 5, b"A", b"C", [b"0.99", b"0.0"]),     # germline hom
    ])
    assert run_filter("Somatic allele frequency", [], g) == [True, False, False, True, True]
    assert run_filter("Tumor zygosity", ["het_af_range=5", "hom_af_range=5"],
                      g) == [True, True, True, False, False]


def test_filter_gsvar_score_rank():
    g = make_gsvar(["GSvar_rank"], [
        ("chr1", 1, 1, b"A", b"C", [b"1"]),
        ("chr1", 2, 2, b"A", b"C", [b"15"]),
        ("chr1", 3, 3, b"A", b"C", [b""]),
    ])
    assert run_filter("GSvar score/rank", ["top=10"], g) == [True, False, False]


def test_filter_lr_short_read_overlap():
    g = make_gsvar(["in_short-read"], [
        ("chr1", 1, 1, b"A", b"C", [b"yes"]),
        ("chr1", 2, 2, b"A", b"C", [b""]),
    ])
    assert run_filter("lr short-read overlap", [], g) == [True, False]
    assert run_filter("lr short-read overlap", ["invert=true"], g) == [False, True]


def test_rna_filters():
    cols = ["ASE_af", "ASE_depth", "ASE_alt", "ASE_pval",
            "aberrant_splicing", "tpm", "expr_log2fc", "expr_zscore"]
    g = make_gsvar(cols, [
        ("chr1", 1, 1, b"A", b"C",
         [b"0.4", b"50", b"10", b"0.01", b"0.02", b"7.5", b"-3.0", b"2.5"]),
        ("chr1", 2, 2, b"A", b"C",
         [b"n/a", b"5", b"n/a", b"n/a", b"n/a", b"0.1", b"0.5", b"0.2"]),
    ])
    assert run_filter("RNA ASE allele frequency", ["min_af=0.2", "max_af=0.8"], g) == [True, False]
    assert run_filter("RNA ASE depth", ["min_depth=20"], g) == [True, False]
    assert run_filter("RNA ASE alternative count", [], g) == [True, False]
    assert run_filter("RNA ASE p-value", [], g) == [True, False]
    assert run_filter("RNA aberrant splicing fraction", [], g) == [True, False]
    assert run_filter("RNA gene expression", [], g) == [True, False]
    assert run_filter("RNA expression fold-change", [], g) == [True, False]  # abs
    assert run_filter("RNA expression z-score", [], g) == [True, False]


def test_filter_trio_denovo_recessive_loh():
    comments = [
        "##SAMPLE=<ID=CHILD,Gender=male,DiseaseStatus=affected>",
        "##SAMPLE=<ID=FATHER,Gender=male,DiseaseStatus=control>",
        "##SAMPLE=<ID=MOTHER,Gender=female,DiseaseStatus=control>",
    ]
    cols = ["CHILD", "FATHER", "MOTHER", "quality", "gene"]
    g = make_gsvar(cols, [
        # de-novo: child het, parents wt (AF entries keep genotypes)
        ("chr1", 10, 10, b"A", b"C", [b"het", b"wt", b"wt", b"AF=0.5,0.0,0.0", b"G1"]),
        # recessive: hom child, het parents
        ("chr1", 20, 20, b"A", b"C", [b"hom", b"het", b"het", b"AF=1.0,0.5,0.5", b"G2"]),
        # LOH: hom child, het father, wt mother
        ("chr1", 30, 30, b"A", b"C", [b"hom", b"het", b"wt", b"AF=1.0,0.5,0.0", b"G3"]),
        # none: child wt
        ("chr1", 40, 40, b"A", b"C", [b"wt", b"het", b"het", b"AF=0.0,0.5,0.5", b"G4"]),
    ], comments)
    assert run_filter("Trio", ["types=de-novo"], g) == [True, False, False, False]
    assert run_filter("Trio", ["types=recessive"], g) == [False, True, False, False]
    assert run_filter("Trio", ["types=LOH"], g) == [False, False, True, False]
    # AF correction: father wt with AF 0.2 becomes het -> de-novo suppressed
    g2 = make_gsvar(cols, [
        ("chr1", 10, 10, b"A", b"C", [b"het", b"wt", b"wt", b"AF=0.5,0.2,0.0", b"G1"]),
    ], comments)
    assert run_filter("Trio", ["types=de-novo"], g2) == [False]


def test_filter_trio_comphet():
    comments = [
        "##SAMPLE=<ID=CHILD,Gender=female,DiseaseStatus=affected>",
        "##SAMPLE=<ID=FATHER,Gender=male,DiseaseStatus=control>",
        "##SAMPLE=<ID=MOTHER,Gender=female,DiseaseStatus=control>",
    ]
    cols = ["CHILD", "FATHER", "MOTHER", "quality", "gene"]
    g = make_gsvar(cols, [
        ("chr1", 10, 10, b"A", b"C", [b"het", b"het", b"wt", b"", b"GENEA"]),
        ("chr1", 20, 20, b"A", b"C", [b"het", b"wt", b"het", b"", b"GENEA"]),
        ("chr1", 30, 30, b"A", b"C", [b"het", b"het", b"wt", b"", b"GENEB"]),
    ], comments)
    # GENEA has one paternal-het and one maternal-het -> comp-het
    assert run_filter("Trio", ["types=comp-het"], g) == [True, True, False]


# ------------------------------------------------------------ CNV filters

def test_cnv_allele_frequency_and_cnp_overlap():
    cnvs = make_cnvs(["potential_AF", "overlap af_genomes_imgag"], [
        ("chr1", 100, 200, 3, [b"G1"], [b"0.01", b"0.50 some text"]),
        ("chr1", 300, 400, 3, [b"G2"], [b"0.20", b"0.99 other"]),
    ])
    assert run_cnv_filter("CNV allele frequency", [], cnvs) == [True, False]
    assert run_cnv_filter("CNV polymorphism region", [], cnvs) == [True, False]


def test_cnv_max_loglikelihood_tumor_normal_only():
    cnvs = make_cnvs(["loglikelihood"], [
        ("chr1", 100, 200, 3, [], [b"100"]),
        ("chr1", 300, 400, 3, [], [b"500"]),
    ], type_="tumor_normal")
    assert run_cnv_filter("CNV maximum log-likelihood", [], cnvs) == [True, False]
    cnvs.type = "germline_single"  # no-op on other types
    assert run_cnv_filter("CNV maximum log-likelihood", [], cnvs) == [True, True]


def test_cnv_gene_constraint_na_passes():
    cnvs = make_cnvs(["gene_info"], [
        ("chr1", 100, 200, 3, [], [b"A (region=complete oe_lof=0.10)"]),
        ("chr1", 300, 400, 3, [], [b"B (region=complete oe_lof=0.90)"]),
        ("chr1", 500, 600, 3, [], [b"C (region=complete oe_lof=n/a)"]),
    ])
    # n/a parses as 1.0 in the CNV variant (pass only if <= max) — with
    # max 0.95 it passes, unlike the SNV filter
    assert run_cnv_filter("CNV gene constraint", ["max_oe_lof=0.35"],
                          cnvs) == [True, False, False]
    assert run_cnv_filter("CNV gene constraint", ["max_oe_lof=1.0"],
                          cnvs) == [True, True, True]


def test_cnv_tumor_cn_and_clonality():
    cnvs = make_cnvs(["tumor_CN_change", "tumor_clonality"], [
        ("chr1", 100, 200, 3, [], [b"4", b"0.5"]),
        ("chr1", 300, 400, 3, [], [b"12", b"0.05"]),
        ("chr1", 500, 600, 3, [], [b"n/a", b"n/a"]),  # unparsable > keep
    ])
    assert run_cnv_filter("CNV tumor CN change", [], cnvs) == [True, False, True]
    assert run_cnv_filter("CNV clonality", ["min_clonality=0.1"],
                          cnvs) == [True, False, True]


def test_cnv_gene_overlap_and_pathogenic():
    cnvs = make_cnvs(["gene_info", "ngsd_pathogenic_cnvs"], [
        ("chr1", 100, 200, 3, [], [b"A (region=complete)", b"patho1"]),
        ("chr1", 300, 400, 3, [], [b"B (region=intronic/intergenic)", b""]),
    ])
    assert run_cnv_filter("CNV gene overlap", [], cnvs) == [True, False]
    assert run_cnv_filter("CNV gene overlap",
                          ["complete=false", "exonic/splicing=false",
                           "intronic/intergenic=true"], cnvs) == [False, True]
    assert run_cnv_filter("CNV pathogenic CNV overlap", [], cnvs) == [True, False]


def test_cnv_comp_het_modes():
    cnvs = make_cnvs(["x"], [
        ("chr1", 100, 200, 3, [b"SHARED"], [b""]),
        ("chr1", 300, 400, 3, [b"SHARED"], [b""]),
        ("chr1", 500, 600, 3, [b"SOLO"], [b""]),
    ])
    assert run_cnv_filter("CNV compound-heterozygous", ["mode=CNV-CNV"],
                          cnvs) == [True, True, False]
    f = cascade.create_filter("CNV compound-heterozygous", ["mode=CNV-SNV/INDEL"])
    f.het_hit_genes = {b"SOLO"}
    result = cascade.FilterResult(3)
    f.apply(cnvs, result)
    assert result.flags == [False, False, True]


# ------------------------------------------------------------ SV filters

def _sv_headers():
    return ["TYPE", "FORMAT", "SAMPLE1"]


def test_sv_genotype_affected_and_quality():
    svs = make_bedpe(["QUAL", "FORMAT", "SAMPLE1"], [
        ("chr1", 100, 110, "chr1", 500, 510, b"DEL", [b"40", b"GT:PR", b"0/1:10,5"]),
        ("chr1", 700, 710, "chr1", 900, 910, b"DEL", [b"10", b"GT:PR", b"0/0:9,1"]),
    ])
    assert run_sv_filter("SV genotype affected", ["genotypes=het"],
                         svs) == [True, False]
    assert run_sv_filter("SV quality", ["quality=20"], svs) == [True, False]


def test_sv_genotype_control():
    # a single sample without ##SAMPLE headers counts as control
    svs = make_bedpe(["FORMAT", "SAMPLE1"], [
        ("chr1", 100, 110, "chr1", 500, 510, b"DEL", [b"GT", b"0/1"]),
        ("chr1", 700, 710, "chr1", 900, 910, b"DEL", [b"GT", b"0/0"]),
    ])
    assert run_sv_filter("SV genotype control", ["genotypes=wt"],
                         svs) == [False, True]
    # with only affected samples the filter must refuse to run
    samples = [("SAMPLE1", {"DiseaseStatus": "affected"})]
    svs2 = make_bedpe(["FORMAT", "SAMPLE1"], [
        ("chr1", 100, 110, "chr1", 500, 510, b"DEL", [b"GT", b"0/1"]),
    ], samples=samples)
    with pytest.raises(ValueError, match="without control samples"):
        run_sv_filter("SV genotype control", ["genotypes=wt"], svs2)


def test_sv_paired_and_split_read_af():
    svs = make_bedpe(["FORMAT", "SAMPLE1"], [
        # PR af = 5/15 = 0.33; SR af = 2/10 = 0.2
        ("chr1", 100, 110, "chr1", 500, 510, b"DEL",
         [b"GT:PR:SR", b"0/1:10,5:8,2"]),
        # no SR key in FORMAT -> removed by split-read filter
        ("chr1", 700, 710, "chr1", 900, 910, b"DUP",
         [b"GT:PR", b"0/1:10,10"]),
    ])
    assert run_sv_filter("SV paired read AF", ["Paired Read AF=0.3"],
                         svs) == [True, False]
    assert run_sv_filter("SV split read AF", ["Split Read AF=0.2"],
                         svs) == [True, False]
    assert run_sv_filter("SV PE read depth", ["PE Read Depth=6"],
                         svs) == [False, True]


def test_sv_somaticscore_requires_somatic():
    svs = make_bedpe(["SOMATICSCORE"], [
        ("chr1", 100, 110, "chr1", 500, 510, b"DEL", [b"60"]),
        ("chr1", 700, 710, "chr1", 900, 910, b"DEL", [b"10"]),
    ], fmt_comment=b"##fileformat=BEDPE_TUMOR_NORMAL_PAIR")
    assert run_sv_filter("SV SomaticScore", ["Somaticscore=30"], svs) == [True, False]
    svs.headers = []
    with pytest.raises(ValueError, match="somatic tumor normal"):
        run_sv_filter("SV SomaticScore", ["Somaticscore=30"], svs)


def test_sv_gene_constraint_and_overlap():
    svs = make_bedpe(["GENE_INFO"], [
        ("chr1", 100, 110, "chr1", 500, 510, b"DEL",
         [b"A (region=complete oe_lof=0.10)"]),
        ("chr1", 700, 710, "chr1", 900, 910, b"DEL",
         [b"B (region=intronic/intergenic oe_lof=n/a)"]),
    ])
    assert run_sv_filter("SV gene constraint", [], svs) == [True, False]
    assert run_sv_filter("SV gene overlap", [], svs) == [True, False]
    assert run_sv_filter("SV gene overlap",
                         ["complete=false", "exonic/splicing=false",
                          "intronic/near gene=true"], svs) == [False, True]


def test_sv_count_and_af_ngsd():
    svs = make_bedpe(["NGSD_HOM", "NGSD_HET", "NGSD_AF", "FORMAT", "SAMPLE1"], [
        ("chr1", 100, 110, "chr1", 500, 510, b"DEL",
         [b"1", b"5", b"0.001", b"GT", b"0/1"]),
        ("chr1", 700, 710, "chr1", 900, 910, b"DEL",
         [b"50", b"100", b"0.30", b"GT", b"1/1"]),
        ("chr1", 800, 810, "chr1", 990, 999, b"DEL",
         [b"2", b"100", b"", b"GT", b"1/1"]),  # hom: only hom count matters
    ])
    assert run_sv_filter("SV count NGSD", ["max_count=20"], svs) == [True, False, True]
    assert run_sv_filter("SV count NGSD", ["max_count=20", "ignore_genotype=true"],
                         svs) == [True, False, False]
    # AF: empty entry passes
    assert run_sv_filter("SV allele frequency NGSD", ["max_af=1.0"],
                         svs) == [True, False, True]


def test_sv_breakpoint_density():
    svs = make_bedpe(["NGSD_SV_BREAKPOINT_DENSITY"], [
        ("chr1", 100, 110, "chr1", 500, 510, b"INS", [b"5"]),
        ("chr1", 700, 710, "chr1", 900, 910, b"DEL", [b"50/5"]),
        ("chr1", 800, 810, "chr1", 990, 999, b"DEL", [b"50/30"]),
        ("chr1", 900, 910, "chr2", 100, 110, b"BND", [b""]),  # empty > keep
    ])
    assert run_sv_filter("SV break point density NGSD", ["max_density=20"],
                         svs) == [True, True, False, True]
    assert run_sv_filter("SV break point density NGSD",
                         ["max_density=20", "remove_strict=true"],
                         svs) == [True, False, False, True]


def test_sv_lr_af_and_support():
    svs = make_bedpe(["AF", "SUPPORT"], [
        ("chr1", 100, 110, "chr1", 500, 510, b"DEL", [b"0.5", b"12"]),
        ("chr1", 700, 710, "chr1", 900, 910, b"DEL", [b"0.9", b"2"]),
        ("chr1", 800, 810, "chr1", 990, 999, b"DEL", [b"", b"8"]),  # no AF > keep
    ])
    assert run_sv_filter("SV-lr AF", ["min_af=0.3", "max_af=0.7"],
                         svs) == [True, False, True]
    assert run_sv_filter("SV-lr support reads", [], svs) == [True, False, True]


def test_sv_cnv_overlap_and_pathogenic():
    svs = make_bedpe(["CNV_OVERLAP", "NGSD_PATHOGENIC_SVS", "INFO_A"], [
        # large DEL with low overlap -> removed
        ("chr1", 100, 110, "chr1", 50000, 50010, b"DEL",
         [b"0.10", b"", b"SVLEN=-49900"]),
        # large DEL with good overlap -> kept
        ("chr1", 100, 110, "chr1", 50000, 50010, b"DEL",
         [b"0.90", b"patho", b"SVLEN=-49900"]),
        # small DEL skipped by min_size
        ("chr1", 100, 110, "chr1", 500, 510, b"DEL",
         [b"0.10", b"", b"SVLEN=-400"]),
        # empty overlap (not DEL/DUP) skipped
        ("chr1", 100, 110, "chr2", 500, 510, b"BND", [b"", b"", b""]),
    ])
    assert run_sv_filter("SV CNV overlap", [], svs) == [False, True, True, True]
    assert run_sv_filter("SV annotated pathogenic", [],
                         svs) == [False, True, False, False]


def test_sv_comp_het():
    svs = make_bedpe(["GENES"], [
        ("chr1", 100, 110, "chr1", 500, 510, b"DEL", [b"SHARED"]),
        ("chr1", 700, 710, "chr1", 900, 910, b"DEL", [b"SHARED,OTHER"]),
        ("chr1", 800, 810, "chr1", 990, 999, b"DEL", [b"SOLO"]),
    ])
    assert run_sv_filter("SV compound-heterozygous", ["mode=SV-SV"],
                         svs) == [True, True, False]


def test_sv_trio():
    samples = [("CHILD", {"Gender": "male", "DiseaseStatus": "affected"}),
               ("FATHER", {"Gender": "male", "DiseaseStatus": "control"}),
               ("MOTHER", {"Gender": "female", "DiseaseStatus": "control"})]
    headers = ["GENES", "FORMAT", "CHILD", "FATHER", "MOTHER"]
    svs = make_bedpe(headers, [
        ("chr1", 100, 110, "chr1", 500, 510, b"DEL",
         [b"G1", b"GT", b"0/1", b"0/0", b"0/0"]),      # de-novo
        ("chr1", 700, 710, "chr1", 900, 910, b"DEL",
         [b"G2", b"GT", b"1/1", b"0/1", b"0/1"]),      # recessive
        ("chr1", 800, 810, "chr1", 990, 999, b"DEL",
         [b"G3", b"GT", b"0/0", b"0/1", b"0/1"]),      # child wt -> drop
    ], fmt_comment=b"##fileformat=BEDPE_GERMLINE_TRIO", samples=samples)
    assert run_sv_filter("SV trio", ["types=de-novo"], svs) == [True, False, False]
    assert run_sv_filter("SV trio", ["types=recessive"], svs) == [False, True, False]


@pytest.mark.parametrize("ini", ["GSvar_filters.ini", "GSvar_filters_cnv.ini",
                                 "GSvar_filters_sv.ini"])
def test_shipped_filter_presets_parse(ini):
    """Every preset cascade shipped with the reference
    (/root/reference/bin/GSvar_filters*.ini) must be constructible by name
    with all its parameters (incl. the 'disabled' toggle)."""
    path = f"/root/reference/bin/{ini}"
    n = 0
    for raw in open(path, encoding="utf-8", errors="replace"):
        line = raw.rstrip("\n").strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        f = cascade.create_filter(parts[0], parts[1:])
        assert f.NAME == parts[0]
        n += 1
    assert n > 10


def test_disabled_filter_is_skipped():
    g = make_gsvar(["OMIM"], [
        ("chr1", 1, 1, b"A", b"C", [b""]),
    ])
    c = cascade.FilterCascade.from_text(["OMIM genes\taction=FILTER\tdisabled"])
    flags = c.apply(g, "snv").flags
    assert flags == [True]  # disabled filter must not remove anything
