"""GSvar variant ranking algorithms (GSvar_v1, GSvar_v2_dominant/recessive).

Behavioral reference: ngs-bits cppNGS/VariantScores.cpp.
"""

from __future__ import annotations

import math
import os

from ..filters.cascade import FilterCascade, create_filter

ALGORITHMS = ["GSvar_v1", "GSvar_v2_dominant", "GSvar_v2_recessive"]

_DESCRIPTIONS = {
    "GSvar_v1": "Variant ranking based on clinical information only.",
    "GSvar_v2_dominant": "Variant ranking based on clinical information only (dominant model)",
    "GSvar_v2_recessive": "Variant ranking based on clinical information only (recessive model)",
}


def description(algorithm: str) -> str:
    if algorithm not in _DESCRIPTIONS:
        raise ValueError(f"VariantScores::description: Unregistered algorithm name '{algorithm}'!")
    return _DESCRIPTIONS[algorithm]


class Parameters:
    def __init__(self):
        self.use_blacklist = False
        self.use_ngsd_classifications = True
        self.use_clinvar = True


class Result:
    def __init__(self):
        self.algorithm = ""
        self.scores: list[float] = []
        self.ranks: list[int] = []
        self.score_explanations: list[list[str]] = []
        self.warnings: list[str] = []


class CategorizedScores(dict):
    """CategorizedScores — per-gene categorized maxima ('*' = gene-independent)."""

    def add(self, category: str, value: float, gene: str = "*"):
        d = self.setdefault(gene, {})
        d[category] = max(d.get(category, 0.0), value)

    def score(self) -> tuple[float, list[str]]:
        output = sum(self.get("*", {}).values())
        gene2score = {g: sum(d.values()) for g, d in self.items() if g != "*"}
        max_gene = max(gene2score.values()) if gene2score else 0.0
        best_genes = [g for g, s in gene2score.items() if s == max_gene]
        return output + max_gene, best_genes

    def explanations(self, best_genes: list[str]) -> list[str]:
        if not best_genes:
            out = [f"{k}:{v:.1f}" for k, v in self.get("*", {}).items()]
            out.sort(key=str.lower)
            return out
        out = []
        for gene in best_genes:
            entries = [f"{k}:{v:.1f}" for k, v in self.get("*", {}).items()]
            entries += [f"{k}:{v:.1f}" for k, v in self.get(gene, {}).items()]
            entries.sort(key=str.lower)
            if len(best_genes) > 1:
                out.append(f"[{gene}]")
            out.extend(entries)
        return out


def _parse_transcripts(anno: bytes):
    """Variant::transcriptAnnotations — parse coding_and_splicing entries."""
    out = []
    for entry in anno.split(b","):
        parts = entry.split(b":")
        gene = parts[0].strip() if parts else b""
        impact = parts[3].strip().decode() if len(parts) > 3 else ""
        out.append((gene, impact))
    return out


def load_blacklist() -> list:
    entries = os.environ.get("NGSBITS_RANKING_VARIANT_BLACKLIST", "")
    out = []
    for entry in entries.split(";"):
        entry = entry.strip()
        if entry:
            out.append(entry)
    return out


def prefilters(parameters: Parameters) -> list[str]:
    filters = [
        "Allele frequency\tmax_af=0.1",
        "Allele frequency (sub-populations)\tmax_af=0.1",
        "Variant quality\tqual=20\tdepth=1",
        "Count NGSD\tmax_count=10\tignore_genotype=false\tmosaic_as_het=false",
        "Impact\timpact=HIGH,MODERATE,LOW",
        "Splice effect\tMaxEntScan=LOW\tSpliceAi=0.5\tsplice_site_only=false\taction=KEEP",
        "Count NGSD\tmax_count=100\tignore_genotype=false\tmosaic_as_het=false",
        "Annotated pathogenic\taction=KEEP\tsources=HGMD" + (",ClinVar" if parameters.use_clinvar else "") + "\talso_likely_pathogenic=false",
        "Allele frequency\tmax_af=1.0",
        "Filter columns\tentries=mosaic\taction=REMOVE",
    ]
    if parameters.use_ngsd_classifications:
        filters.append("Classification NGSD\taction=REMOVE\tclasses=1,2")
        filters.append("Classification NGSD\taction=KEEP\tclasses=4,5")
    return filters


def _cascade_from_lines(lines: list[str]) -> FilterCascade:
    cascade = FilterCascade()
    for line in lines:
        parts = line.split("\t")
        cascade.add(create_filter(parts[0], parts[1:]))
    return cascade


def _variant_key(v) -> str:
    return f"{v.chr.str_normalized(True)}:{v.start}-{v.end} {v.ref.decode()}>{v.obs.decode()}"


def score(algorithm: str, gsvar, phenotype_rois: dict, parameters: Parameters) -> Result:
    """VariantScores::score — dispatch + rank calculation."""
    if algorithm not in ALGORITHMS:
        raise ValueError(f"VariantScores: Unregistered algorithm name '{algorithm}'!")
    if algorithm == "GSvar_v1":
        result = _score_v1(gsvar, phenotype_rois, parameters)
    elif algorithm == "GSvar_v2_dominant":
        result = _score_v2(gsvar, phenotype_rois, parameters, recessive=False)
    else:
        result = _score_v2(gsvar, phenotype_rois, parameters, recessive=True)

    order = sorted(range(len(result.scores)), key=lambda i: -result.scores[i])
    result.ranks = [-1] * len(result.scores)
    for rank_pos, idx in enumerate(order):
        if result.scores[idx] >= 0:
            result.ranks[idx] = rank_pos + 1
    result.algorithm = algorithm
    return result


def annotate(gsvar, result: Result, add_explanations: bool) -> int:
    """VariantScores::annotate — prepend rank/score columns."""
    if len(gsvar.variants) != len(result.scores):
        raise ValueError("Variant list and scoring result differ in count!")

    def prepend(name, desc):
        if name not in gsvar.columns:
            gsvar.columns.insert(0, name)
            gsvar.add_description(name, desc)
            for v in gsvar.variants:
                v.annotations.insert(0, b"")

    if add_explanations:
        prepend("GSvar_score_explanations", "GSvar score explanations.")
    prepend("GSvar_score", f"GSvar score (algorithm: {result.algorithm}, description:{description(result.algorithm)})")
    prepend("GSvar_rank", "GSvar score based rank.")
    i_rank = gsvar.annotation_index("GSvar_rank")
    i_score = gsvar.annotation_index("GSvar_score")
    i_exp = gsvar.annotation_index("GSvar_score_explanations") if add_explanations else -1
    c_scored = 0
    for i, v in enumerate(gsvar.variants):
        score_str = b""
        rank_str = b""
        if result.scores[i] >= 0:
            score_str = f"{result.scores[i]:.2f}".encode()
            rank_str = str(result.ranks[i]).encode()
            c_scored += 1
        v.annotations[i_score] = score_str
        v.annotations[i_rank] = rank_str
        if add_explanations:
            v.annotations[i_exp] = " ".join(result.score_explanations[i]).encode()
    return c_scored


def _overlaps_roi(roi_lines, v) -> bool:
    for l in roi_lines:
        if l.chr.num == v.chr.num and l.start <= v.end and v.start <= l.end:
            return True
    return False


def _hgmd_score(anno: bytes) -> float:
    out = 0.0
    for entry in anno.strip().split(b";"):
        if b"DM?" in entry:
            out = max(out, 0.3)
        elif b"DM" in entry:
            out = max(out, 0.5)
    return out


def _clinvar_score(anno: bytes) -> float:
    out = 0.0
    for entry in anno.strip().split(b";"):
        if b"likely pathogenic" in entry:
            out = max(out, 0.5)
        elif b"pathogenic" in entry:
            out = max(out, 1.0)
    return out


def _score_v1(gsvar, phenotype_rois, parameters) -> Result:
    output = Result()
    i_coding = gsvar.annotation_index("coding_and_splicing")
    i_gnomad = gsvar.annotation_index("gnomAD")
    i_omim = _opt_index(gsvar, "OMIM")
    i_hgmd = _opt_index(gsvar, "HGMD")
    i_clinvar = gsvar.annotation_index("ClinVar")
    i_gene_info = gsvar.annotation_index("gene_info")
    i_classification = gsvar.annotation_index("classification")
    affected_cols = gsvar.affected_sample_columns()
    if len(affected_cols) != 1:
        raise ValueError("VariantScores: Algorihtm 'GSvar_v1' can only be applied to variant lists with exactly one affected patient!")
    i_genotype = affected_cols[0]

    blacklist = set(load_blacklist())

    if not phenotype_rois:
        output.warnings.append("No phenotype region(s) set!")
    roi_lines = []
    for roi in phenotype_rois.values():
        roi_lines.extend(roi.lines)

    filters = [
        "Allele frequency\tmax_af=0.1",
        "Allele frequency (sub-populations)\tmax_af=0.1",
        "Variant quality\tqual=20\tdepth=5",
        "Count NGSD\tmax_count=10\tignore_genotype=false\tmosaic_as_het=false",
        "Impact\timpact=HIGH,MODERATE,LOW",
        "Annotated pathogenic\taction=KEEP\tsources=HGMD,ClinVar\talso_likely_pathogenic=false",
        "Allele frequency\tmax_af=1.0",
        "Filter columns\tentries=mosaic\taction=REMOVE",
        "Classification NGSD\taction=REMOVE\tclasses=1,2",
    ]
    if parameters.use_ngsd_classifications:
        filters.append("Classification NGSD\taction=KEEP\tclasses=4,5")
    cascade_result = _cascade_from_lines(filters).apply(gsvar, "snv")

    for i, v in enumerate(gsvar.variants):
        if not cascade_result.flags[i]:
            output.scores.append(-1.0)
            output.score_explanations.append([])
            continue
        if parameters.use_blacklist and _variant_key(v) in blacklist:
            output.scores.append(-2.0)
            output.score_explanations.append([])
            continue

        transcripts = _parse_transcripts(v.annotations[i_coding])
        genes = sorted({g for g, _imp in transcripts if g})

        score_val = 0.0
        explanations = []

        if _overlaps_roi(roi_lines, v):
            score_val += 2.0
            explanations.append("HPO:2.0")

        impact_score = 0.0
        for _g, impact in transcripts:
            if impact == "HIGH":
                impact_score = max(impact_score, 3.0)
            elif impact == "MODERATE":
                impact_score = max(impact_score, 2.0)
            elif impact == "LOW":
                impact_score = max(impact_score, 1.0)
        if impact_score > 0:
            score_val += impact_score
            explanations.append(f"impact:{impact_score:.1f}")

        af_gnomad = v.annotations[i_gnomad].strip()
        if af_gnomad == b"":
            score_val += 1.0
            explanations.append("gnomAD:1.0")
        elif float(af_gnomad) <= 0.0001:
            score_val += 0.5
            explanations.append("gnomAD:0.5")

        if i_omim != -1 and v.annotations[i_omim].strip():
            score_val += 1.0
            explanations.append("OMIM:1.0")

        if i_hgmd != -1:
            hgmd_score = _hgmd_score(v.annotations[i_hgmd])
            if hgmd_score > 0:
                score_val += hgmd_score
                explanations.append(f"HGMD:{hgmd_score:.1f}")

        clinvar_score = _clinvar_score(v.annotations[i_clinvar])
        if clinvar_score > 0:
            score_val += clinvar_score
            explanations.append(f"ClinVar:{clinvar_score:.1f}")

        if parameters.use_ngsd_classifications:
            classification = v.annotations[i_classification].strip()
            if classification == b"4":
                score_val += 0.5
                explanations.append("NGSD class:0.5")
            if classification == b"5":
                score_val += 1
                explanations.append("NGSD class:1.0")

        genotype = v.annotations[i_genotype].strip()
        if genotype == b"hom":
            score_val += 1.0
            explanations.append("homozygous:1.0")

        inh_match = False
        min_oe = 1.0
        gene_infos = v.annotations[i_gene_info].strip().split(b",")
        for gene in genes:
            for gene_info in gene_infos:
                if not gene_info.startswith(gene + b" "):
                    continue
                start = gene_info.find(b"(")
                entries = gene_info[start + 1:len(gene_info) - 1].split(b" ")
                for entry in entries:
                    if entry.startswith(b"inh="):
                        mode = entry.split(b"=")[1].strip()
                        if ((genotype == b"het" and (b"AD" in mode or b"XLD" in mode))
                                or (genotype == b"hom" and (b"AR" in mode or b"XLR" in mode))):
                            inh_match = True
                    if entry.startswith(b"oe_lof="):
                        oe = entry.split(b"=")[1].strip()
                        if oe not in (b"n/a", b""):
                            min_oe = min(min_oe, float(oe))
        if inh_match:
            score_val += 0.5
            explanations.append("gene_inheritance:0.5")
        if min_oe < 0.1:
            score_val += 0.5
            explanations.append("gene_oe_lof:0.5")

        output.scores.append(score_val)
        explanations.sort(key=str.lower)
        output.score_explanations.append(explanations)
    return output


def _opt_index(gsvar, name) -> int:
    try:
        return gsvar.annotation_index(name)
    except KeyError:
        return -1


def _score_v2(gsvar, phenotype_rois, parameters, recessive: bool) -> Result:
    output = Result()
    i_coding = gsvar.annotation_index("coding_and_splicing")
    i_gnomad = gsvar.annotation_index("gnomAD")
    i_ngsd_het = gsvar.annotation_index("NGSD_het") if not recessive else -1
    i_omim = _opt_index(gsvar, "OMIM")
    i_hgmd = _opt_index(gsvar, "HGMD")
    i_clinvar = gsvar.annotation_index("ClinVar")
    i_gene_info = gsvar.annotation_index("gene_info")
    i_classification = gsvar.annotation_index("classification")
    i_phylop = gsvar.annotation_index("phyloP")
    affected_cols = gsvar.affected_sample_columns()
    if len(affected_cols) != 1:
        raise ValueError("VariantScores: Algorihtm 'GSvar_v1' can only be applied to variant lists with exactly one affected patient!")
    i_genotype = affected_cols[0]

    blacklist = set(load_blacklist())
    if not phenotype_rois:
        output.warnings.append("No phenotype region(s) set!")

    cascade_result = _cascade_from_lines(prefilters(parameters)).apply(gsvar, "snv")

    gene_hits_het: dict[bytes, int] = {}
    if recessive:
        for i, v in enumerate(gsvar.variants):
            if not cascade_result.flags[i]:
                continue
            if parameters.use_blacklist and _variant_key(v) in blacklist:
                continue
            if v.annotations[i_genotype].strip() != b"het":
                continue
            for gene in {g for g, _imp in _parse_transcripts(v.annotations[i_coding]) if g}:
                gene_hits_het[gene] = gene_hits_het.get(gene, 0) + 1

    for i, v in enumerate(gsvar.variants):
        if not cascade_result.flags[i]:
            output.scores.append(-1.0)
            output.score_explanations.append([])
            continue
        if parameters.use_blacklist and _variant_key(v) in blacklist:
            output.scores.append(-2.0)
            output.score_explanations.append([])
            continue

        scores = CategorizedScores()

        af_gnomad = v.annotations[i_gnomad].strip()
        if af_gnomad == b"":
            scores.add("gnomAD", 1.0)
        elif float(af_gnomad) <= 0.0001:
            scores.add("gnomAD", 0.5)

        if not recessive:
            ngsd_het = v.annotations[i_ngsd_het].strip()
            try:
                ngsd_het2 = int(ngsd_het)
                if ngsd_het2 <= 2:
                    scores.add("NGSD", 1.0)
                elif ngsd_het2 <= 5:
                    scores.add("NGSD", 0.5)
            except ValueError:
                pass

        pheno_roi_hits = 0
        for roi in phenotype_rois.values():
            if _overlaps_roi(roi.lines, v):
                pheno_roi_hits += 1
        if pheno_roi_hits > 0:
            import numpy as np
            pheno_score = 1.0 + math.sqrt(pheno_roi_hits)
            # truncf in the reference operates on float32
            pheno_score = math.trunc(float(np.float32(pheno_score) * np.float32(10.0))) / 10.0
            scores.add("HPO", pheno_score)

        if i_hgmd != -1:
            hgmd_score = _hgmd_score(v.annotations[i_hgmd])
            if hgmd_score > 0:
                scores.add("HGMD", hgmd_score)

        if parameters.use_clinvar:
            clinvar_score = _clinvar_score(v.annotations[i_clinvar])
            if clinvar_score > 0:
                scores.add("ClinVar", clinvar_score)

        if parameters.use_ngsd_classifications:
            classification = v.annotations[i_classification].strip()
            if classification == b"4":
                scores.add("NGSD class", 0.5)
            if classification == b"5":
                scores.add("NGSD class", 1.0)

        if i_omim != -1:
            omim = v.annotations[i_omim].strip()
            if omim:
                for entry in omim.split(b"&"):
                    parts = entry.replace(b"GENE=", b"|").replace(b"_PHENOS=", b"|").split(b"|")
                    if len(parts) < 3:
                        continue
                    scores.add("OMIM", 1.0, parts[1].strip().decode())

        try:
            phylop = float(v.annotations[i_phylop].strip())
        except ValueError:
            phylop = 0.0
        if phylop >= 1.6:
            scores.add("phyloP", 0.3)

        transcripts = _parse_transcripts(v.annotations[i_coding])
        for gene, impact in transcripts:
            g = gene.decode()
            if impact == "HIGH":
                scores.add("impact", 3.0, g)
            elif impact == "MODERATE":
                scores.add("impact", 2.0, g)
            elif impact == "LOW":
                scores.add("impact", 1.0, g)

        genotype = v.annotations[i_genotype].strip()
        for gene_info in v.annotations[i_gene_info].split(b","):
            gene_info = gene_info.strip()
            if not gene_info:
                continue
            gene_info = gene_info[:-1]
            start = gene_info.find(b"(")
            if start == -1:
                continue
            gene = gene_info[:start - 1].strip().decode()
            for entry in gene_info[start + 1:].split(b" "):
                if entry.startswith(b"inh="):
                    mode = entry.split(b"=")[1].strip()
                    if recessive:
                        if b"AR" in mode or b"XLR" in mode:
                            scores.add("gene_inheritance", 0.5, gene)
                    else:
                        if b"AD" in mode or b"XLD" in mode:
                            scores.add("gene_inheritance", 0.5, gene)
                if entry.startswith(b"oe_lof="):
                    oe = entry.split(b"=")[1].strip()
                    if oe not in (b"n/a", b"") and float(oe) < 0.1:
                        scores.add("gene_oe_lof", 0.5, gene)

        if recessive:
            if genotype == b"hom":
                scores.add("genotype_hom", 1.0)
            if genotype == b"het":
                for gene, _impact in transcripts:
                    if gene_hits_het.get(gene, 0) >= 2:
                        scores.add("genotype_comp_het", 1.0, gene.decode())

        total, best_genes = scores.score()
        output.scores.append(total)
        output.score_explanations.append(scores.explanations(best_genes))
    return output
