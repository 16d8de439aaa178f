"""Germline report generator (HTML + XML).

Behavioral reference: ``cppNGSD/GermlineReportGenerator.{h,cpp}`` (2961 LoC);
replayed against ``cppNGSD-TEST/data_out/germline_report1.{html,xml}``
(NGSD_Test.cpp report_germline:1875-2128 — tests 2-5 additionally require the
HG38 genome FASTA and ``cppNGS-TEST/data_in/panel.bam``, both absent from
this environment: the BAM is a stripped large blob and no genome exists, so
only the minimal-report replay and structural tests run here).

The report is a German (or English) clinical XHTML document — sample
metadata, phenotype, filters, selected small variants/CNVs/SVs/REs, coverage
gap statistics, OMIM table and PRS scores — plus a structured XML export
with the HTML embedded base64 per section.
"""

from __future__ import annotations

import base64
import math
from dataclasses import dataclass, field

from ..core.genome_regions import (chromosome_mapping, cyto_band,
                                   population_code_to_human_readable)
from ..core.geneset import GeneSet
from ..core.intervals import BedFile
from ..core.qtxml import QtXmlStreamWriter
from .db import NGSD, NgsdError

APPLICATION_NAME = "ngs-bits-tpu"
APPLICATION_VERSION = ""


# Translation tables of GermlineReportGenerator::trans — reference DATA
# (parity-required strings, GermlineReportGenerator.cpp trans()).
EN2DE = {
    'male': 'm&auml;nnlich',
    'female': 'weiblich',
    'splicing effect validated by RNA dataset': 'Splicing-Effekt mit RNA-Daten validiert',
    'no splicing effect found in RNA dataset': 'kein Splicing-Effekt in RNA-Daten gefunden',
    'RNA dataset not usable': 'RNA-Daten nicht nutzbar',
}

DE2EN = {
    'male': 'male',
    'female': 'female',
    'Technischer Report zur bioinformatischen Analyse': 'Technical Report for Bioinformatic Analysis',
    'Probe': 'Sample',
    'Prozessierungssystem': 'Processing system',
    'Prozessierungssystem-Typ': 'Processing system type',
    'Sequenziersystem': 'Sequencer',
    'Datum des Sequenzierlaufs': 'Date of the sequencing run',
    'Readl&auml;nge': 'Read length',
    'Referenzgenom': 'Reference genome',
    'Datum': 'Date',
    'Benutzer': 'User',
    'Analysepipeline': 'Analysis pipeline',
    'Auswertungssoftware': 'Analysis software',
    'Ph&auml;notyp': 'Phenotype information',
    'Filterkriterien': 'Criteria for variant filtering',
    'Gefundene SNVs/InDels in Zielregion gesamt': 'Small variants in target region',
    'Anzahl SNVs/InDels ausgew&auml;hlt f&uuml;r Report': 'SNVs/InDels selected for report',
    'Anzahl CNVs/SVs/REs ausgew&auml;hlt f&uuml;r Report': 'CNVs/SVs/REs selected for report',
    'Anzahl anderer Varianten ausgew&auml;hlt f&uuml;r Report': 'Other variants selected for report',
    'Einzelbasenver&auml;nderungen (SNVs) und Insertionen/Deletionen (InDels) nach klinischer Interpretation im Kontext der Fragestellung': 'List of prioritized small variants',
    'Kopienzahlver&auml;nderungen (CNV) und/oder Strukturver&auml;nderungen (SV) nach klinischer Interpretation im Kontext der Fragestellung': 'List of prioritized copy-number variants and/or structural variants',
    'Erbgang': 'Inheritance',
    'gnomAD Allelfrequenz': 'gnomAD allele frequency',
    'Kontrollkohorte': 'control cohort',
    'Klasse': 'Class',
    'Details': 'Details',
    'Genotyp': 'Genotype',
    'Variante': 'Variant',
    'Gen': 'Gene',
    'Klassifikation von Varianten': 'Classification of variants',
    'Die Klassifikation der Varianten erfolgt in Anlehnung an die Publikation von Plon et al. (Hum Mutat 2008)': 'Classification and interpretation of variants: The classification of variants is based on the criteria of Plon et al. (PMID: 18951446). A short description of each class can be found in the following',
    'Klasse 5: Eindeutig pathogene Ver&auml;nderung / Mutation': 'Class 5, pathogenic variant',
    'Ver&auml;nderung, die bereits in der Fachliteratur mit ausreichender Evidenz als krankheitsverursachend bezogen auf das vorliegende Krankheitsbild beschrieben wurde sowie als pathogen zu wertende Mutationstypen (i.d.R. Frameshift- bzw. Stoppmutationen).': "The variant is considered to be the cause of the patient's disease.",
    'Klasse 4: Wahrscheinlich pathogene Ver&auml;nderung': 'Class 4, probably pathogenic variants',
    'DNA-Ver&auml;nderung, die aufgrund ihrer Eigenschaften als sehr wahrscheinlich krankheitsverursachend zu werten ist.': "The identified variant is considered to be the probable cause of the patient's disease. This information should be used cautiously for clinical decision-making, as there is still a degree of uncertainty.",
    'Klasse 3: Variante unklarer Signifikanz (VUS) - Unklare Pathogenit&auml;t': 'Class 3, variant of unclear significance (VUS)',
    'Variante, bei der es unklar ist, ob eine krankheitsverursachende Wirkung besteht. Diese Varianten werden tabellarisch im technischen Report mitgeteilt.': 'The variant has characteristics of being an independent disease-causing mutation, but insufficient or conflicting evidence exists.',
    'Klasse 2: Sehr wahrscheinlich benigne Ver&auml;nderungen': 'Class 2, most likely benign variants',
    'Aufgrund der H&auml;ufigkeit in der Allgemeinbev&ouml;lkerung oder der Lokalisation bzw. aufgrund von Angaben in der Literatur sehr wahrscheinlich benigne. Werden nicht mitgeteilt, k&ouml;nnen aber erfragt werden.': 'The variant is not likely to be the cause of the tested disease. Class 2 variants are not reported, but can be provided upon request.',
    'Klasse 1: Benigne Ver&auml;nderungen': 'Class 1, benign variants',
    'Werden nicht mitgeteilt, k&ouml;nnen aber erfragt werden.': 'The variant is not considered to be the cause of the tested disease. Class 1 variants are not reported, but can be provided upon request.',
    'Zielregion': 'Target region',
    'Die Zielregion umfasst mindestens die CCDS ("consensus coding sequence") unten genannter Gene &plusmn;20 Basen flankierender intronischer Sequenz, kann aber auch zus&auml;tzliche Exons und/oder flankierende Basen beinhalten.': 'The target region includes CCDS ("consensus coding sequence") of the genes listed below &plusmn;20 flanking bases of the intronic sequence. It may comprise additional exons and/or flanking bases.',
    'Name': 'Name',
    'Ausgewertete Gene': 'Genes analyzed',
    'siehe Abdeckungsstatistik': 'see coverage statistics',
    'Keine': 'none',
    'OMIM Gene und Phenotypen': 'OMIM gene and phenotypes',
    'Phenotyp': 'phenotype',
    'Gen MIM': 'gene MIM',
    'Phenotyp MIM': 'phenotype MIM',
    'Gen(e)': 'Genes',
    'Details zu Programmen der Analysepipeline': 'Analysis pipeline tool details',
    'Parameter': 'Parameters',
    'Version': 'Version',
    'Tool': 'Tool',
    'Abdeckungsstatistik Zielregion': 'Coverage statistics of target region',
    'Durchschnittliche Sequenziertiefe': 'Average sequencing depth',
    'Durchschnittliche Sequenziertiefe (chrMT)': 'Average sequencing depth (chrMT)',
    'Komplett abgedeckte Gene': 'Genes without gaps',
    'Basen mit Tiefe &lt;': 'Percentage of regions with depth &lt;',
    'Prozent L&uuml;cken': 'Percentage gaps',
    'Unvollst&auml;ndig abgedeckte Gene (fehlende Basen in bp)': 'Genes with incomplete coverage (missing bp in brackets)',
    'Details Regionen mit Tiefe &lt;': 'Details regions with depth &lt;',
    'Koordinaten (hg38)': 'Coordinates (hg38)',
    'Chromosom': 'Chromosome',
    'Basen': 'Bases',
    'L&uuml;ckenreport Zielregion': 'Gap report based on entire target region',
    'L&uuml;ckenreport basierend auf Exons der Zielregion': 'Gap report based on exons of target region',
    'Gene f&uuml;r die keine genomische Region bestimmt werden konnte': 'Genes for which no genomic region could be determined',
    'Gr&ouml;&szlig;e': 'Size',
    'Transcript': 'Transcript',
    'gesamt': 'overall',
    'mit Tiefe': 'with depth',
    'Geschlecht': 'sample sex',
    'Vater': 'father',
    'Mutter': 'mother',
    'Zusatzprobe': 'additional sample',
    'Regionen': 'regions',
    'Gene': 'genes',
    'CNV/SV/RE': 'CNV/SV/RE',
    'Kopienzahl/Genotyp': 'copy-number/genotype',
    'n/a': 'n/a',
    'Position': 'Position',
    'Deletion': 'deletion',
    'Duplikation': 'duplication',
    'Insertion': 'insertion',
    'Inversion': 'inversion',
    'Translokation': 'translocation',
    'Variantentyp': 'variant type',
    'Kommentar': 'comment',
    'Repeat-Expansion': 'repeat expansion',
    'uniparentale Disomie': 'uniparental disomy',
    'mosaik CNV': 'mosaic CNV',
    'nicht-detektierte kleine Variante (SNV/InDel)': 'uncalled small variant (SNV/InDel)',
    'nicht-detektierte CNV': 'uncalled CNV',
    'nicht-detektierte Strukturvariante': 'uncalled structural variant',
    'L&uuml;cken die mit Sanger-Sequenzierung geschlossen wurden:': 'Gaps closed by Sanger sequencing:',
    'L&uuml;cken die mit visueller Inspektion der Rohdaten &uuml;berpr&uuml;ft wurden:': 'Gaps checked by visual inspection of raw data:',
    'Basen gesamt:': 'Base sum:',
    'Polygener Risiko-Score (PRS)': 'Polygenic Risk Scores (PRS)',
    'Erkrankung': 'Trait',
    'Score': 'Score',
    'Publikation': 'Publication',
    'Hauptphenotyp': 'preferred phenotype',
    'ja': 'yes',
    'nein': 'no',
    'Z-Score': 'z-score',
    'Population (gesch&auml;tzt aus NGS)': 'population (estimated from NGS)',
    'Die Einsch&auml;tzung der klinischen Bedeutung eines PRS ist nur unter Verwendung eines entsprechenden validierten Risiko-Kalkulations-Programms und unter Ber&uuml;cksichtigung der ethnischen Zugeh&ouml;rigkeit m&ouml;glich (z.B. CanRisk.org f&uuml;r Brustkrebs).': 'A validated risk estimation program must be used to judge the clinical importance of a PRS, e.g. CanRisk.org for breast cancer. The ethnicity of the patient must also be considered.',
    'nach L&uuml;ckenschluss': 'after closing gaps',
    'Verbleibende L&uuml;cken nach L&uuml;ckenschluss': 'gaps remaining',
    'splicing effect validated by RNA dataset': 'splicing effect validated by RNA dataset',
    'no splicing effect found in RNA dataset': 'no splicing effect found in RNA dataset',
    'RNA dataset not usable': 'RNA dataset not usable',
    'Abdeckungsstatistik der RNA-Probe': 'Coverage statistics of RNA sample',
    'Abgedeckte Gene': 'Covered genes',
    'Anzahl der Reads': 'Number of reads',
    'Durchschnittliche Sequenziertiefe der Housekeeping-Gene': 'Average sequencing depth of housekeeping genes',
    'kb': 'kb',
    'Sofern vorhanden, werden in den nachfolgenden Tabellen erfasst: pathogene Varianten (Klasse 5)<sup>*</sup> und wahrscheinlich pathogene Varianten (Klasse 4)<sup>*</sup>, bei denen jeweils ein Zusammenhang mit der klinischen Fragestellung anzunehmen ist, sowie Varianten unklarer klinischer Signifikanz (Klasse 3)<sup>*</sup> f&uuml;r welche in Zusammenschau von Literatur und Klinik des Patienten ein Beitrag zur Symptomatik denkbar ist und f&uuml;r die gegebenenfalls eine weitere Einordnung der klinischen Relevanz durch Folgeuntersuchungen sinnvoll erscheint.': 'If present, the following tables contain: likely pathogenic variants (class 4)<sup>*</sup> and pathogenic variants (class 5)<sup>*</sup>, for which a contribution to the clinical symptoms of the patient is conceivable, and variants of uncertain significance (class 3)<sup>*</sup>, for which a further evaluation of the clinical relevance by follow-up examinations may be useful.',
    'Teilweise k&ouml;nnen - in Abh&auml;ngigkeit von der Art der genetischen Ver&auml;nderung, der Familienanamnese und der Klinik der Patientin/des Patienten - weiterf&uuml;hrende Untersuchungen eine &Auml;nderung der Klassifizierung bewirken.': 'Depending on the type of genetic alteration, family history and clinical features of the patient further investigations might change the classification of variants.',
    'Eine (unkommentierte) Liste aller detektierten Varianten kann bei Bedarf angefordert werden.': 'A (uncommented) list of all detected variants can be provided on request.',
    'Bei konkreten differentialdiagnostischen Hinweisen auf eine konkrete Erkrankung k&ouml;nnen ggf. weiterf&uuml;hrende genetische Untersuchungen bzw. Untersuchungsmethoden indiziert sein.': 'In case of a suspected clinical diagnosis genetic counseling is necessary to evaluate the indication/possibility of further genetic studies.',
    '<sup>*</sup> F&uuml;r Informationen zur Klassifizierung von Varianten, siehe allgemeine Zusatzinformationen.': '<sup>*</sup> For information on the classification of variants, see the general information.',
    'kein &Uuml;berlappung mit Gen': 'no gene overlap',
    'Konnte nicht erstellt werden, weil keine Gene der Zielregion definiert wurden.': 'Could not be performed because no target region genes are definded.',
    'expandiert': 'expanded',
    '&Uuml;berpr&uuml;fte Variante': 'Tested variant',
    'Nachgewiesener Genotyp': 'Detected alleles',
    'keine Genotypisierung weil Tiefe unter 20': 'no genotyping as depth is below 20',
    'Tiefe': 'depth',
    'Indikationsbezogene Polymorphismen': "Polymorphisms relevant for the patient's phenotype",
    '*Diese Analyse ist nicht Teil des Akkreditierungsumfangs.': 'This analysis is not part of the scope of accreditation.',
}


@dataclass
class ReportVariantConfiguration:
    """ReportConfiguration variant entry (cppNGSD/ReportConfiguration.h)."""
    variant_type: str = "SNVS_INDELS"   # SNVS_INDELS / CNVS / SVS / RES
    variant_index: int = -1
    causal: bool = False
    de_novo: bool = False
    mosaic: bool = False
    comp_het: bool = False
    report_type: str = "n/a"
    rna_info: str = "n/a"
    inheritance: str = "n/a"
    classification: str = "n/a"
    comments: str = ""
    comments2: str = ""
    exclude_artefact: bool = False
    exclude_frequency: bool = False
    exclude_phenotype: bool = False
    exclude_mechanism: bool = False
    exclude_hit2_missing: bool = False
    exclude_gus: bool = False
    exclude_used_other_var_type: bool = False
    exclude_other: bool = False
    # manual curation fields
    manual_var: str = ""
    manual_genotype: str = ""
    manual_cnv_start: str = ""
    manual_cnv_end: str = ""
    manual_cnv_cn: str = ""
    manual_cnv_hgvs_type: str = ""
    manual_cnv_hgvs_suffix: str = ""
    manual_sv_start: str = ""
    manual_sv_end: str = ""
    manual_sv_genotype: str = ""
    manual_sv_start_bnd: str = ""
    manual_sv_end_bnd: str = ""
    manual_sv_hgvs_type: str = ""
    manual_sv_hgvs_suffix: str = ""
    manual_sv_hgvs_type_bnd: str = ""
    manual_sv_hgvs_suffix_bnd: str = ""
    manual_re_allele1: str = ""
    manual_re_allele2: str = ""

    def show_in_report(self) -> bool:
        return not (self.exclude_artefact or self.exclude_frequency
                    or self.exclude_phenotype or self.exclude_mechanism
                    or self.exclude_other)

    # per-field validators (ReportConfiguration.cpp:254-400)
    @staticmethod
    def _pos_int(value: str) -> bool:
        try:
            return int(value) > 0
        except (TypeError, ValueError):
            return False

    @staticmethod
    def _nonneg_int(value: str) -> bool:
        try:
            return int(value) >= 0
        except (TypeError, ValueError):
            return False

    def manual_var_geno_is_valid(self) -> bool:
        return self.manual_genotype in ("hom", "het")

    def manual_cnv_start_is_valid(self) -> bool:
        return bool(self.manual_cnv_start) and self._pos_int(self.manual_cnv_start)

    def manual_cnv_end_is_valid(self) -> bool:
        return bool(self.manual_cnv_end) and self._pos_int(self.manual_cnv_end)

    def manual_cnv_cn_is_valid(self) -> bool:
        return bool(self.manual_cnv_cn) and self._nonneg_int(self.manual_cnv_cn)

    def manual_sv_start_is_valid(self) -> bool:
        return bool(self.manual_sv_start) and self._pos_int(self.manual_sv_start)

    def manual_sv_end_is_valid(self) -> bool:
        return bool(self.manual_sv_end) and self._pos_int(self.manual_sv_end)

    def manual_sv_geno_is_valid(self) -> bool:
        return self.manual_sv_genotype in ("hom", "het")

    def manual_sv_start_bnd_is_valid(self) -> bool:
        return bool(self.manual_sv_start_bnd) and self._pos_int(self.manual_sv_start_bnd)

    def manual_sv_end_bnd_is_valid(self) -> bool:
        return bool(self.manual_sv_end_bnd) and self._pos_int(self.manual_sv_end_bnd)

    def manual_re_allele1_is_valid(self) -> bool:
        return bool(self.manual_re_allele1) and self._nonneg_int(self.manual_re_allele1)

    def manual_re_allele2_is_valid(self) -> bool:
        return bool(self.manual_re_allele2) and self._nonneg_int(self.manual_re_allele2)

    def is_manually_curated(self) -> bool:
        """ReportVariantConfiguration::isManuallyCurated
        (ReportConfiguration.cpp:232-252) — per variant type."""
        if self.variant_type == "SNVS_INDELS":
            return bool(self.manual_var) or self.manual_var_geno_is_valid()
        if self.variant_type == "CNVS":
            return (self.manual_cnv_start_is_valid()
                    or self.manual_cnv_end_is_valid()
                    or bool(self.manual_cnv_cn)
                    or bool(self.manual_cnv_hgvs_type)
                    or bool(self.manual_cnv_hgvs_suffix))
        if self.variant_type == "SVS":
            return (self.manual_sv_start_is_valid()
                    or self.manual_sv_end_is_valid()
                    or self.manual_sv_geno_is_valid()
                    or self.manual_sv_start_bnd_is_valid()
                    or self.manual_sv_end_bnd_is_valid()
                    or bool(self.manual_sv_hgvs_type)
                    or bool(self.manual_sv_hgvs_suffix)
                    or bool(self.manual_sv_hgvs_type_bnd)
                    or bool(self.manual_sv_hgvs_suffix_bnd))
        if self.variant_type == "RES":
            return (self.manual_re_allele1_is_valid()
                    or self.manual_re_allele2_is_valid())
        raise ValueError("ReportVariantConfiguration::isManuallyCurated() "
                         "called on invalid variant type!")


@dataclass
class OtherCausalVariant:
    coordinates: str = ""
    gene: str = ""
    type: str = ""
    inheritance: str = ""
    comment: str = ""
    comment_reviewer1: str = ""
    comment_reviewer2: str = ""


class ReportConfiguration:
    """Subset of cppNGSD/ReportConfiguration used by the generator."""

    def __init__(self):
        self._variant_config: list[ReportVariantConfiguration] = []
        self.other_causal_variant = OtherCausalVariant()

    def set(self, var_conf: ReportVariantConfiguration):
        """ReportConfiguration::set — replace entry of same type+index."""
        import copy
        for i, vc in enumerate(self._variant_config):
            if (vc.variant_type == var_conf.variant_type
                    and vc.variant_index == var_conf.variant_index):
                self._variant_config[i] = copy.copy(var_conf)
                return
        self._variant_config.append(copy.copy(var_conf))
        self._variant_config.sort(key=lambda vc: vc.variant_index)

    def variant_config(self) -> list[ReportVariantConfiguration]:
        return self._variant_config


@dataclass
class ReportSettings:
    """cppNGSD/ReportSettings (data holder)."""
    report_type: str = ""
    language: str = "german"
    min_depth: int = 20
    show_coverage_details: bool = True
    cov_based_on_complete_roi: bool = True
    cov_exon_padding: int = 20
    recalculate_avg_depth: bool = False
    show_omim_table: bool = True
    show_one_entry_in_omim_table: bool = True
    show_class_details: bool = False
    show_refseq_transcripts: bool = False
    select_other_causal_variant: bool = False
    selected_variants: list = field(default_factory=list)  # (type, index)
    ps_additional: list = field(default_factory=list)
    polymorphisms: list = field(default_factory=list)
    report_config: ReportConfiguration = field(default_factory=ReportConfiguration)


@dataclass
class TargetRegionInfo:
    name: str = ""
    regions: BedFile = field(default_factory=BedFile)
    genes: GeneSet = field(default_factory=GeneSet)

    def is_valid(self) -> bool:
        return self.name != ""


class PrsTable:
    """PRS TSV (pgs_id/trait/score/percentile/citation columns)."""

    def __init__(self):
        self.columns: list[str] = []
        self.rows: list[list[str]] = []

    @staticmethod
    def load(filename: str) -> "PrsTable":
        out = PrsTable()
        with open(filename) as fh:
            for line in fh:
                line = line.rstrip("\n").rstrip("\r")
                if not line:
                    continue
                if line.startswith("#") and not out.columns:
                    out.columns = line[1:].split("\t")
                    continue
                if line.startswith("#"):
                    continue
                out.rows.append(line.split("\t"))
        return out

    def column_index(self, name: str) -> int:
        return self.columns.index(name)

    def __len__(self):
        return len(self.rows)


@dataclass
class GermlineReportGeneratorData:
    """GermlineReportGeneratorData (GermlineReportGenerator.h)."""
    build: str = "hg38"                  # 'hg19'/'hg38'
    ps: str = ""
    variants: object = None              # GSvarFile
    cnvs: object = None                  # CnvList
    svs: object = None                   # BedpeFile
    res: object = None                   # RepeatLocusList
    prs: PrsTable = field(default_factory=PrsTable)
    report_settings: ReportSettings = field(default_factory=ReportSettings)
    filters: object = None               # FilterCascade
    roi: TargetRegionInfo = field(default_factory=TargetRegionInfo)
    processing_system_roi: BedFile = field(default_factory=BedFile)
    ps_bam: str = ""
    ps_lowcov: str = ""
    threads: int = 1


def _build_str(build: str, long_form: bool = False) -> str:
    b = build.lower()
    if long_form:
        return "GRCh38" if b == "hg38" else "GRCh37"
    return b


class GermlineReportGenerator:
    """GermlineReportGenerator (GermlineReportGenerator.cpp:26-2960)."""

    def __init__(self, data: GermlineReportGeneratorData, db: NGSD | None = None,
                 test_mode: bool = False):
        self.db = db if db is not None else NGSD(test_db=test_mode)
        self.data = data
        self.test_mode = test_mode
        import datetime
        self.date = datetime.date.today()
        self.ps_id = self.db.processed_sample_id(data.ps)
        self.selected_small: list[int] = []
        self.selected_cnvs: list[int] = []
        self.selected_svs: list[int] = []
        self.selected_res: list[int] = []
        self.gap_percentage = -1.0
        self.bases_ccds_sequenced = -1
        self.gaps_by_gene: dict[bytes, BedFile] = {}

    def override_date(self, date):
        if not self.test_mode:
            raise NgsdError("This function can only be used in test mode!")
        self.date = date

    # ---- translation / formatting ---------------------------------------

    def trans(self, text: str) -> str:
        """(:1829-2171) — German applies the small en->de table, English the
        full de->en dictionary (unknown keys throw in test mode)."""
        lang = self.data.report_settings.language
        if lang == "german":
            return EN2DE.get(text, text)
        if lang == "english":
            if text in DE2EN:
                return DE2EN[text]
            if self.test_mode:
                raise NgsdError(f"Could not translate '{text}' to {lang}!")
            return text
        raise NgsdError(f"Unsupported language '{lang}'!")

    def format_float(self, number: float, decimals: int) -> str:
        out = f"{number:.{decimals}f}"
        if self.data.report_settings.language == "german":
            out = out.replace(".", ",")
        return out

    def format_genotype(self, build: str, gender: str, genotype: str, variant) -> str:
        """(:2200-2210) — hom on gonosomes outside the PAR becomes hemi for
        males."""
        from ..core import resources
        if gender != "male" or genotype != "hom":
            return genotype
        if not variant.chr.is_gonosome():
            return genotype
        if resources.pseudoautosomal_regions(build).overlaps_with(
                variant.chr, variant.start, variant.end):
            return genotype
        return "hemi"

    def _filter_text(self, f) -> str:
        """FilterBase::toText analogues for the filters the reports use."""
        if f.NAME == "Allele frequency":
            return f"Allele frequency &le; {f.get('max_af'):.2f}%"
        if f.NAME == "Allele frequency (sub-populations)":
            return f"Allele frequency (sub-populations) &le; {f.get('max_af'):.2f}%"
        return f.NAME

    # ---- HTML -----------------------------------------------------------

    def write_html(self, filename: str):
        """(:36-806)."""
        rs = self.data.report_settings
        out: list[str] = []
        s = out.append
        self._html_header(s, self.data.ps)

        # data from the database
        sample_id = self.db.sample_id(self.data.ps)
        sample_data = self.db.get_sample_data(sample_id)
        psd = self.db.get_processed_sample_data(self.ps_id)
        sys_data = self.db.get_processing_system_data(
            self.db.processing_system_id_from_processed_sample(self.data.ps))

        s("<h4>" + self.trans("Technischer Report zur bioinformatischen Analyse") + "</h4>\n")
        s("\n")
        s("<p><b>" + self.trans("Probe") + ": " + self.data.ps + "</b> ("
          + str(sample_data.get("name_external", "")) + ")\n")
        s("<br />\n")
        s("<br />" + self.trans("Geschlecht") + ": " + self.trans(psd["gender"]) + "\n")
        s("<br />" + self.trans("Prozessierungssystem") + ": " + psd["processing_system"] + "\n")
        s("<br />" + self.trans("Prozessierungssystem-Typ") + ": "
          + psd["processing_system_type"] + "\n")
        run_id = self.db.get_value("SELECT id FROM sequencing_run WHERE name=?",
                                   params=(psd["run_name"],))
        sequencer = self.db.get_value(
            "SELECT d.type FROM device d, sequencing_run r "
            "WHERE r.device_id=d.id AND r.id=?", params=(run_id,))
        s("<br />" + self.trans("Sequenziersystem") + ": " + str(sequencer or "") + "\n")
        start_date = self.db.get_value(
            "SELECT start_date FROM sequencing_run WHERE id=?", params=(run_id,))
        s("<br />" + self.trans("Datum des Sequenzierlaufs") + ": "
          + _qt_date(start_date) + "\n")
        if psd["processing_system_type"] != "lrGS":
            recipe = self.db.get_value(
                "SELECT recipe FROM sequencing_run WHERE id=?", params=(run_id,))
            s("<br />" + self.trans("Readl&auml;nge") + ": " + str(recipe or "") + "\n")
        s("<br />" + self.trans("Referenzgenom") + ": " + str(sys_data["genome"]) + "\n")
        s("<br />" + self.trans("Datum") + ": " + self.date.strftime("%d.%m.%Y") + "\n")
        s("<br />" + self.trans("Analysepipeline") + ": "
          + self.data.variants.pipeline() + "\n")
        s("<br />" + self.trans("Auswertungssoftware") + ": " + APPLICATION_NAME
          + " " + APPLICATION_VERSION + "\n")
        s("</p>\n")

        # phenotype
        s("\n")
        s("<p><b>" + self.trans("Ph&auml;notyp") + "</b>\n")
        for _t, info in self.db.get_sample_disease_info(sample_id, "ICD10 code"):
            s("<br />ICD10: " + info + "\n")
        for _t, info in self.db.get_sample_disease_info(sample_id, "HPO term id"):
            hpo_id = self.db.phenotype_id_by_accession(info, False)
            if hpo_id != -1:
                s("<br />HPO: " + info + " (" + self.db.phenotype_name(hpo_id) + ")\n")
        for _t, info in self.db.get_sample_disease_info(
                sample_id, "OMIM disease/phenotype identifier"):
            s("<br />OMIM: " + info + "\n")
        for _t, info in self.db.get_sample_disease_info(sample_id, "Orpha number"):
            s("<br />Orphanet: " + info + "\n")
        s("</p>\n")

        # target region statistics
        if self.data.roi.is_valid():
            from ..core import settings as core_settings
            s("\n")
            s("<p><b>" + self.trans("Zielregion") + "</b>\n")
            s("<br /><span style=\"font-size: 8pt;\">" + self.trans(
                "Die Zielregion umfasst mindestens die CCDS (\"consensus coding "
                "sequence\") unten genannter Gene &plusmn;20 Basen flankierender "
                "intronischer Sequenz, kann aber auch zus&auml;tzliche Exons "
                "und/oder flankierende Basen beinhalten.") + "\n")
            s("<br />" + self.trans("Name") + ": " + self.data.roi.name + "\n")
            if len(self.data.roi.genes):
                s("<br />" + self.trans("Ausgewertete Gene") + ": ")
                if (rs.show_coverage_details
                        and core_settings.string("location", optional=True) != "MHH"):
                    s(str(len(self.data.roi.genes)) + " ("
                      + self.trans("siehe Abdeckungsstatistik") + ")\n")
                else:
                    s(self.data.roi.genes.join(", ") + "\n")
            s("</span></p>\n")

        # column indices
        vl = self.data.variants
        i_genotype = vl.annotation_index(self.data.ps)
        i_gene = vl.annotation_index("gene")
        i_omim = vl.annotation_index("OMIM")
        i_class = vl.annotation_index("classification")
        i_gnomad = vl.annotation_index("gnomAD")

        # applied filters
        s("\n")
        s("<p><b>" + self.trans("Filterkriterien") + " " + "</b>\n")
        for f in self.data.filters.filters:
            if f.enabled:
                s("<br />&nbsp;&nbsp;&nbsp;&nbsp;- " + self._filter_text(f) + "\n")
        s("<br />")

        # variant count inside target region
        var_count = len(vl.variants)
        if self.data.roi.is_valid():
            from ..core.intervals import ChromosomalIndex
            idx = ChromosomalIndex(self.data.roi.regions)
            var_count = sum(1 for v in vl.variants
                            if len(idx.matching_indices(v.chr, v.start, v.end)))

        s("<br />" + self.trans("Gefundene SNVs/InDels in Zielregion gesamt")
          + ": " + str(var_count) + "\n")
        self.selected_small = [i for t, i in rs.selected_variants if t == "SNVS_INDELS"]
        self.selected_cnvs = [i for t, i in rs.selected_variants if t == "CNVS"]
        self.selected_svs = [i for t, i in rs.selected_variants if t == "SVS"]
        self.selected_res = [i for t, i in rs.selected_variants if t == "RES"]
        s("<br />" + self.trans("Anzahl SNVs/InDels ausgew&auml;hlt f&uuml;r Report")
          + ": " + str(len(self.selected_small)) + "\n")
        s("<br />" + self.trans("Anzahl CNVs/SVs/REs ausgew&auml;hlt f&uuml;r Report")
          + ": " + str(len(self.selected_cnvs) + len(self.selected_svs)
                       + len(self.selected_res)) + "\n")
        s("</p>\n")

        s("<br />" + self.trans(
            "Sofern vorhanden, werden in den nachfolgenden Tabellen erfasst: "
            "pathogene Varianten (Klasse 5)<sup>*</sup> und wahrscheinlich pathogene "
            "Varianten (Klasse 4)<sup>*</sup>, bei denen jeweils ein Zusammenhang mit "
            "der klinischen Fragestellung anzunehmen ist, sowie Varianten unklarer "
            "klinischer Signifikanz (Klasse 3)<sup>*</sup> f&uuml;r welche in "
            "Zusammenschau von Literatur und Klinik des Patienten ein Beitrag zur "
            "Symptomatik denkbar ist und f&uuml;r die gegebenenfalls eine weitere "
            "Einordnung der klinischen Relevanz durch Folgeuntersuchungen sinnvoll "
            "erscheint.") + "\n")
        s(self.trans(
            "Teilweise k&ouml;nnen - in Abh&auml;ngigkeit von der Art der genetischen "
            "Ver&auml;nderung, der Familienanamnese und der Klinik der Patientin/des "
            "Patienten - weiterf&uuml;hrende Untersuchungen eine &Auml;nderung der "
            "Klassifizierung bewirken.") + "\n")
        s("<br />" + self.trans(
            "Eine (unkommentierte) Liste aller detektierten Varianten kann bei Bedarf "
            "angefordert werden.") + "\n")
        s("<br />" + self.trans(
            "Bei konkreten differentialdiagnostischen Hinweisen auf eine konkrete "
            "Erkrankung k&ouml;nnen ggf. weiterf&uuml;hrende genetische Untersuchungen "
            "bzw. Untersuchungsmethoden indiziert sein.") + "\n")
        s("<br />" + self.trans(
            "<sup>*</sup> F&uuml;r Informationen zur Klassifizierung von Varianten, "
            "siehe allgemeine Zusatzinformationen.") + "\n")

        # small variant table
        s("<br /><br /><b>" + self.trans(
            "Einzelbasenver&auml;nderungen (SNVs) und Insertionen/Deletionen (InDels) "
            "nach klinischer Interpretation im Kontext der Fragestellung") + "</b>\n")
        s("<table>\n")
        s("<tr><td><b>" + self.trans("Variante") + "</b></td><td><b>"
          + self.trans("Genotyp") + "</b></td>")
        colspan = 8
        s("<td><b>" + self.trans("Gen(e)") + "</b></td><td><b>"
          + self.trans("Details") + "</b></td><td><b>" + self.trans("Klasse")
          + "</b></td><td><b>" + self.trans("Erbgang") + "</b></td><td><b>"
          + self.trans("gnomAD Allelfrequenz") + "<br />("
          + self.trans("Kontrollkohorte") + ")</b></td><td><b>RNA</b></td></tr>\n")
        for var_conf in rs.report_config.variant_config():
            if var_conf.variant_type != "SNVS_INDELS":
                continue
            if var_conf.variant_index not in self.selected_small:
                continue
            variant = vl.variants[var_conf.variant_index]
            if var_conf.is_manually_curated():
                raise NgsdError("Manually-curated small variants need the reference "
                                "genome (absent in this environment)")

            s("<tr>\n")
            s("<td>\n")
            s(variant.chr.str_normalized(True) + ":" + str(variant.start)
              + "&nbsp;" + variant.ref.decode() + "&nbsp;&gt;&nbsp;"
              + variant.obs.decode() + "</td>")
            geno = self.format_genotype(self.data.build, psd["gender"],
                                        variant.annotations[i_genotype].decode(),
                                        variant)
            if var_conf.de_novo:
                geno += " (de-novo)"
            if var_conf.mosaic:
                geno += " (mosaic)"
            if var_conf.comp_het:
                geno += " (comp-het)"
            s("<td>" + geno + "</td>\n")
            s("<td>")
            genes = GeneSet.create_from_text(variant.annotations[i_gene].decode(), ",")
            for i in range(len(genes)):
                sep = "" if i == 0 else ", "
                gene = genes[i].strip()
                inheritance = ""
                gene_info = self.db.gene_info(gene)
                if gene_info.get("inheritance") not in ("", "n/a", None):
                    inheritance = " (" + gene_info["inheritance"] + ")"
                s(sep + gene + inheritance + "\n")
            s("</td>\n")
            s("<td>" + self.format_coding_splicing(variant) + "</td>\n")
            s("<td>" + variant.annotations[i_class].decode() + "</td>\n")
            s("<td>" + var_conf.inheritance + "</td>\n")
            gnomad_percentage = "n/a"
            freq = variant.annotations[i_gnomad].strip()
            if freq:
                try:
                    gnomad_percentage = self.format_float(
                        100.0 * float(freq), 3) + "%"
                except ValueError:
                    pass
            s("<td>" + gnomad_percentage + "</td>\n")
            s("<td>" + self.trans(var_conf.rna_info) + "</td>\n")
            s("</tr>\n")

            # OMIM line
            omim = variant.annotations[i_omim].decode().strip()
            if omim != "":
                for omim_part in (omim + " ").split("]; "):
                    if len(omim_part) < 10:
                        continue
                    omim = ("OMIM ID: " + omim_part[:6] + " Details: "
                            + omim_part[8:])
                s("<tr><td colspan=\"" + str(colspan) + "\">" + omim
                  + "</td></tr>\n")
        if len(self.selected_small) == 0:
            s("<tr><td colspan=\"" + str(colspan) + "\">" + self.trans("Keine")
              + "</td></tr>")
        s("</table>\n")

        # ---- CNVs + SVs + REs table
        s("<br /><b>" + self.trans(
            "Kopienzahlver&auml;nderungen (CNV) und/oder Strukturver&auml;nderungen "
            "(SV) nach klinischer Interpretation im Kontext der Fragestellung")
          + "</b>\n")
        s("<table>\n")
        s("<tr><td><b>" + self.trans("CNV/SV/RE") + "</b></td><td><b>"
          + self.trans("Position") + "</b></td><td><b>"
          + self.trans("Gr&ouml;&szlig;e") + "</b></td><td><b>"
          + self.trans("Kopienzahl/Genotyp") + "</b></td><td><b>"
          + self.trans("Gen(e)") + "</b></td><td><b>" + self.trans("Klasse")
          + "</b></td><td><b>" + self.trans("Erbgang")
          + "</b></td><td><b>RNA</b></td></tr>\n")
        colspan = 8
        for var_conf in rs.report_config.variant_config():
            if var_conf.variant_type != "CNVS":
                continue
            if var_conf.variant_index not in self.selected_cnvs:
                continue
            cnv = self.data.cnvs[var_conf.variant_index]
            if var_conf.is_manually_curated():
                cnv = _update_cnv(cnv, var_conf)
            cn = cnv.copy_number(self.data.cnvs.annotation_headers)
            s("<tr>\n")
            s("<td>" + (self.trans("Deletion") if cn < 2 else self.trans("Duplikation"))
              + "</td>\n")
            s("<td>" + cnv.to_string() + "</td>\n")
            s("<td>" + self.format_float((cnv.end - cnv.start) / 1000.0, 3) + " "
              + self.trans("kb") + " / " + str(max(1, cnv.num_regs)) + " "
              + self.trans("Regionen") + "</td>\n")
            cn_str = str(cn)
            if var_conf.de_novo:
                cn_str += " (de-novo)"
            if var_conf.mosaic:
                cn_str += " (mosaic)"
            if var_conf.comp_het:
                cn_str += " (comp-het)"
            s("<td>" + cn_str + "</td>\n")
            s("<td>" + ", ".join(g.decode() if isinstance(g, bytes) else g
                                 for g in cnv.genes) + "</td>\n")
            s("<td>" + var_conf.classification + "</td>\n")
            s("<td>" + var_conf.inheritance + "</td>\n")
            s("<td>" + self.trans(var_conf.rna_info) + "</td>\n")
            s("</tr>\n")
        for var_conf in rs.report_config.variant_config():
            if var_conf.variant_type != "SVS":
                continue
            if var_conf.variant_index not in self.selected_svs:
                continue
            sv = self.data.svs[var_conf.variant_index]
            if var_conf.is_manually_curated():
                sv = _update_sv(sv, var_conf)
            s("<tr>\n")
            s("<td>")
            type_names = {b"DEL": "Deletion", b"DUP": "Duplikation",
                          b"INS": "Insertion", b"INV": "Inversion",
                          b"BND": "Translokation"}
            s(self.trans(type_names[sv.type]) + "</td>\n")
            affected = sv.affected_region(False)
            pos_txt = affected[0].to_string(True)
            if sv.type == b"BND":
                pos_txt += " &lt;-&gt; " + affected[1].to_string(True)
            s("<td>" + pos_txt + "</td>\n")
            size = sv.size()
            s("<td>")
            if size != -1:
                s(self.format_float(size / 1000.0, 3) + " " + self.trans("kb"))
            s("</td>")
            gt = sv.genotype(self.data.svs.annotation_headers,
                             human_readable=True).decode()
            s("<td>" + gt)
            if var_conf.de_novo:
                s(" (de-novo)")
            if var_conf.mosaic:
                s(" (mosaic)")
            if var_conf.comp_het:
                s(" (comp-het)")
            s("</td>\n")
            s("<td>" + _sv_genes(self.data.svs, sv).join(", ") + "</td>\n")
            s("<td>" + var_conf.classification + "</td>\n")
            s("<td>" + var_conf.inheritance + "</td>\n")
            s("<td>" + self.trans(var_conf.rna_info) + "</td>\n")
            s("</tr>\n")
        for var_conf in rs.report_config.variant_config():
            if var_conf.variant_type != "RES":
                continue
            if var_conf.variant_index not in self.selected_res:
                continue
            re_locus = self.data.res[var_conf.variant_index]
            if var_conf.is_manually_curated():
                re_locus = _update_re(re_locus, var_conf)
            s("<tr>\n")
            s("<td>" + self.trans("Repeat-Expansion") + "</td>\n")
            s("<td>" + re_locus.region_string() + "</td>\n")
            s("<td></td>\n")
            geno = self.trans("expandiert")
            if var_conf.de_novo:
                geno += " (de-novo)"
            if var_conf.mosaic:
                geno += " (mosaic)"
            if var_conf.comp_het:
                geno += " (comp-het)"
            s("<td>" + geno + "</td>\n")
            s("<td>" + re_locus.name.decode() + "</td>\n")
            s("<td></td>\n")
            s("<td>" + var_conf.inheritance + "</td>\n")
            s("<td></td>\n")
            s("</tr>\n")
        if (len(self.selected_cnvs) == 0 and len(self.selected_svs) == 0
                and len(self.selected_res) == 0):
            s("<tr><td colspan=\"" + str(colspan) + "\">" + self.trans("Keine")
              + "</td></tr>")
        s("</table>\n")

        # other causal variant
        if rs.select_other_causal_variant:
            s("<p>&nbsp;</p>\n")
            cv = rs.report_config.other_causal_variant
            s("<table>\n")
            s("<tr><td><b>" + self.trans("Variantentyp") + "</b></td><td><b>"
              + self.trans("Regionen") + "</b></td><td><b>" + self.trans("Gen(e)")
              + "</b></td><td><b>" + self.trans("Erbgang") + "</b></td><td><b>"
              + self.trans("Kommentar") + "</b></td></tr>\n")
            s("<tr>\n")
            s("<td>" + self.trans(_convert_other_variant_type(cv.type)) + "</td>\n")
            s("<td>" + cv.coordinates + "</td>\n")
            s("<td>" + cv.gene + "</td>\n")
            s("<td>" + cv.inheritance + "</td>\n")
            s("<td>" + cv.comment + "</td>\n")
            s("</tr>\n")
            s("</table>\n")

        # classification explanation
        if rs.show_class_details:
            s("\n")
            s("<p><b>" + self.trans("Klassifikation von Varianten") + ":</b>\n")
            s("<br />" + self.trans(
                "Die Klassifikation der Varianten erfolgt in Anlehnung an die "
                "Publikation von Plon et al. (Hum Mutat 2008)") + "\n")
            s("<br /><b>" + self.trans(
                "Klasse 5: Eindeutig pathogene Ver&auml;nderung / Mutation")
              + ":</b> " + self.trans(
                "Ver&auml;nderung, die bereits in der Fachliteratur mit ausreichender "
                "Evidenz als krankheitsverursachend bezogen auf das vorliegende "
                "Krankheitsbild beschrieben wurde sowie als pathogen zu wertende "
                "Mutationstypen (i.d.R. Frameshift- bzw. Stoppmutationen).") + "\n")
            s("<br /><b>" + self.trans(
                "Klasse 4: Wahrscheinlich pathogene Ver&auml;nderung") + ":</b> "
              + self.trans(
                "DNA-Ver&auml;nderung, die aufgrund ihrer Eigenschaften als sehr "
                "wahrscheinlich krankheitsverursachend zu werten ist.") + "\n")
            s("<br /><b>" + self.trans(
                "Klasse 3: Variante unklarer Signifikanz (VUS) - Unklare "
                "Pathogenit&auml;t") + ":</b> " + self.trans(
                "Variante, bei der es unklar ist, ob eine krankheitsverursachende "
                "Wirkung besteht. Diese Varianten werden tabellarisch im technischen "
                "Report mitgeteilt.") + "\n")
            s("<br /><b>" + self.trans(
                "Klasse 2: Sehr wahrscheinlich benigne Ver&auml;nderungen") + ":</b> "
              + self.trans(
                "Aufgrund der H&auml;ufigkeit in der Allgemeinbev&ouml;lkerung oder "
                "der Lokalisation bzw. aufgrund von Angaben in der Literatur sehr "
                "wahrscheinlich benigne. Werden nicht mitgeteilt, k&ouml;nnen aber "
                "erfragt werden.") + "\n")
            s("<br /><b>" + self.trans("Klasse 1: Benigne Ver&auml;nderungen")
              + ":</b> " + self.trans(
                "Werden nicht mitgeteilt, k&ouml;nnen aber erfragt werden.") + "\n")
            s("</p>\n")
        s("<!-- SECTION: MAIN END -->\n")

        # low-coverage analysis (needs the BAM — absent in this mount)
        if rs.show_coverage_details:
            raise NgsdError("show_coverage_details needs the processed-sample BAM "
                            "(stripped large blob in this environment)")

        # OMIM table
        if rs.show_omim_table:
            self._write_omim_table(s, sample_data)

        # PRS table
        if len(self.data.prs) > 0:
            from ..core import settings as core_settings
            at_ukt = core_settings.string("location", optional=True) == "UKT"
            s("\n")
            s("<!-- SECTION: PRS -->\n")
            s("<p><b>" + self.trans("Polygener Risiko-Score (PRS)")
              + ("*" if at_ukt else "") + "</b></p>\n")
            s("<table>\n")
            s("<tr><td><b>" + self.trans("Erkrankung")
              + "</b></td><td><b>PRS</b></td><td><b>" + self.trans("Publikation")
              + "</b></td><td><b>" + self.trans("Score") + "</b></td><td><b>"
              + self.trans("Z-Score") + "</b></td><td><b>"
              + self.trans("Population (gesch&auml;tzt aus NGS)")
              + "</b></td></tr>\n")
            prs = self.data.prs
            i_id = prs.column_index("pgs_id")
            i_trait = prs.column_index("trait")
            i_score = prs.column_index("score")
            i_citation = prs.column_index("citation")
            eur = population_code_to_human_readable("EUR")
            for row in prs.rows:
                pgs_id, trait, score = row[i_id], row[i_trait], row[i_score]
                zscore = "n/a"
                population = population_code_to_human_readable(psd["ancestry"])
                # z-score means/stdevs per PGS id (GermlineReportGenerator.cpp:728-767)
                Z = {"BRIDGES_306": (-0.421862361518865, 0.607541543780287),
                     "OCAC_36": (-0.250, 0.322), "PGS000004": (-0.424, 0.611)}
                if pgs_id in Z:
                    mean, stdev = Z[pgs_id]
                    znum = (float(score) - mean) / stdev
                    zscore = self.format_float(znum, 3)
                    if znum >= 1.6 and population == eur:
                        zscore = "<b>" + zscore + "</b>"
                    if population != eur or psd["gender"] == "male":
                        zscore = "(" + zscore + ")"
                s("<tr><td>" + trait + "</td><td>" + pgs_id + "</td><td>"
                  + row[i_citation] + "</td><td>" + score + "</td><td>" + zscore
                  + "</td><td>" + population + "</td></tr>")
            s("</table>\n")
            s("<p>" + self.trans(
                "Die Einsch&auml;tzung der klinischen Bedeutung eines PRS ist nur "
                "unter Verwendung eines entsprechenden validierten "
                "Risiko-Kalkulations-Programms und unter Ber&uuml;cksichtigung der "
                "ethnischen Zugeh&ouml;rigkeit m&ouml;glich (z.B. CanRisk.org "
                "f&uuml;r Brustkrebs).") + "</p>\n")
            if at_ukt:
                s("<p>" + self.trans(
                    "*Diese Analyse ist nicht Teil des Akkreditierungsumfangs.")
                  + "</p>\n")
            s("<!-- SECTION: PRS END -->\n")

        self._html_footer(s)
        with open(filename, "w", encoding="utf-8") as fh:
            fh.write("".join(out))

    # ---- helpers --------------------------------------------------------

    def format_coding_splicing(self, v) -> str:
        """(:2212-2250) — re-annotates relevant transcripts via the genome.
        Absent a genome FASTA (this environment), falls back to the
        coding_and_splicing annotation restricted to relevant transcripts."""
        relevant = []
        genes = self.db.genes_overlapping(v.chr, v.start, v.end, 5000)
        i_co_sp = _ann_idx(self.data.variants, "coding_and_splicing")
        if i_co_sp == -1:
            return ""
        parts = []
        names = set()
        for gene in genes:
            gene_id = self.db.gene_id(gene)
            if gene_id == -1:
                continue
            for t in self.db.relevant_transcripts(gene_id):
                names.add(t.name if isinstance(t.name, str) else t.name.decode())
        for trans in self.data.variants.transcript_annotations(v, i_co_sp):
            if trans.id_without_version().decode() in names:
                parts.append(trans.gene.decode() + ":" + trans.id.decode() + ":"
                             + trans.hgvs_c.decode() + ":" + trans.hgvs_p.decode())
        return "<br />".join(parts)

    def _write_omim_table(self, s, sample_data):
        """OMIM gene/phenotype table (:634-703)."""
        rs = self.data.report_settings
        s("<!-- SECTION: GENES -->\n")
        s("\n")
        s("<p><b>" + self.trans("OMIM Gene und Phenotypen") + "</b>\n")
        s("</p>\n")
        s("<table>\n")
        s("<tr><td><b>" + self.trans("Gen") + "</b></td><td><b>" + "HGNC ID"
          + "</b></td><td><b>" + self.trans("Gen MIM") + "</b></td><td><b>"
          + self.trans("Phenotyp MIM") + "</b></td><td><b>" + self.trans("Phenotyp")
          + "</b></td>")
        if rs.show_one_entry_in_omim_table:
            s("<td><b>" + self.trans("Hauptphenotyp") + "</b></td>\n")
        s("</tr>")
        for gene in self.data.roi.genes:
            preferred_accession = ""
            if sample_data.get("disease_group", "n/a") != "n/a":
                preferred_accession = self.db.omim_preferred_phenotype(
                    gene, sample_data["disease_group"])
            for omim_info in self.db.omim_info(gene):
                preferred_name = ""
                names, accessions = [], []
                for p in omim_info["phenotypes"]:
                    names.append(p["name"])
                    accessions.append(p["accession"])
                    if preferred_accession and p["accession"] == preferred_accession:
                        preferred_name = p["name"]
                if rs.show_one_entry_in_omim_table:
                    if preferred_name:
                        names, accessions = [preferred_name], [preferred_accession]
                    elif len(accessions) > 1:
                        sel = 0
                        for i, a in enumerate(accessions):
                            if a != "":
                                sel = i
                                break
                        accessions, names = [accessions[sel]], [names[sel]]
                hgnc_id = ""
                gene_id = self.db.gene_id(omim_info["gene_symbol"])
                if gene_id != -1:
                    hgnc_id = self.db.gene_hgnc_id(gene_id)
                s("<tr><td>" + omim_info["gene_symbol"] + "</td><td>" + str(hgnc_id)
                  + "</td><td>" + omim_info["mim"] + "</td><td>"
                  + "<br />".join(accessions) + "</td><td>" + "<br />".join(names)
                  + "</td>")
                if rs.show_one_entry_in_omim_table:
                    s("<td>" + self.trans("ja" if preferred_name else "nein")
                      + "</td>\n")
                s("</tr>")
        s("</table>\n")
        s("<!-- SECTION: GENES END -->\n")

    def _html_header(self, s, sample_name: str):
        """(:1781-1821)."""
        s('<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN" '
          '"http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd">\n')
        s('<html xmlns="http://www.w3.org/1999/xhtml">\n')
        s("\t<head>\n")
        s("\t   <title>Report " + sample_name + "</title>\n")
        s('\t   <meta http-equiv="Content-Type" content="text/html; charset=utf-8" />\n')
        s('\t   <style type="text/css">\n')
        s("\t\t<!--\n")
        s("body\n{\n\tfont-family: Calibri, sans-serif;\n\tfont-size: 8pt;\n}\n")
        s("h4\n{\n\tfont-family: Calibri, sans-serif;\n\tfont-size: 10pt;\n}\n")
        s("table\n{\n\tborder-collapse: collapse;\n\tborder: 1px solid black;\n"
          "\twidth: 100%;\n}\n")
        s("th, td\n{\n\tborder: 1px solid black;\n\tfont-size: 8pt;\n"
          "\ttext-align: left;\n}\n")
        s("p\n{\n margin-bottom: 0cm;\n}\n")
        s("\t\t-->\n")
        s("\t   </style>\n")
        s("\t</head>\n")
        s("\t<body>\n")
        s("<!-- SECTION: MAIN -->\n")

    def _html_footer(self, s):
        s("\t</body>\n")
        s("</html>\n")


def _ann_idx(vl, name: str) -> int:
    try:
        return vl.annotation_index(name)
    except KeyError:
        return -1


def _qt_date(v) -> str:
    """QVariant::toDate().toString('dd.MM.yyyy')."""
    import datetime
    if v in (None, ""):
        return ""
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.strftime("%d.%m.%Y")
    s = str(v)[:10]
    try:
        return datetime.datetime.strptime(s, "%Y-%m-%d").strftime("%d.%m.%Y")
    except ValueError:
        return s


def _convert_other_variant_type(type_: str, xml: bool = False) -> str:
    """(:2947-2957)."""
    table = {
        "RE": ("repeat_expansion", "Repeat-Expansion"),
        "UPD": ("uniparental_disomy", "uniparentale Disomie"),
        "mosaic CNV": ("mosaic_cnv", "mosaik CNV"),
        "uncalled small variant": ("uncalled_small_variant",
                                   "nicht-detektierte kleine Variante (SNV/InDel)"),
        "uncalled CNV": ("uncalled_cnv", "nicht-detektierte CNV"),
        "uncalled SV": ("uncalled_sv", "nicht-detektierte Strukturvariante"),
    }
    if type_ not in table:
        raise NgsdError(f"Invalid variant type '{type_}'!")
    return table[type_][0 if xml else 1]


def _sv_genes(svs, sv) -> GeneSet:
    """BedpeLine::genes — GENE_INFO annotation gene names."""
    out = GeneSet()
    idx = svs.annotation_index_by_name(b"GENE_INFO", False)
    if idx == -1:
        return out
    for entry in sv.annotations[idx].split(b","):
        gene = entry.strip().split(b" ")[0].split(b"(")[0]
        if gene:
            out.insert(gene)
    return out


def _update_cnv(cnv, var_conf: ReportVariantConfiguration):
    """ReportVariantConfiguration::updateCnv — apply manual curation."""
    import copy
    cnv = copy.copy(cnv)
    cnv.annotations = list(cnv.annotations)
    if var_conf.manual_cnv_start:
        cnv.start = int(var_conf.manual_cnv_start)
    if var_conf.manual_cnv_end:
        cnv.end = int(var_conf.manual_cnv_end)
    return cnv


def _update_sv(sv, var_conf: ReportVariantConfiguration):
    """ReportVariantConfiguration::updateSv — apply manual curation."""
    import copy
    sv = copy.copy(sv)
    if var_conf.manual_sv_start:
        sv.start1 = int(var_conf.manual_sv_start)
    if var_conf.manual_sv_end:
        sv.end1 = int(var_conf.manual_sv_end)
    if var_conf.manual_sv_start_bnd:
        sv.start2 = int(var_conf.manual_sv_start_bnd)
    if var_conf.manual_sv_end_bnd:
        sv.end2 = int(var_conf.manual_sv_end_bnd)
    return sv


def _update_re(re_locus, var_conf: ReportVariantConfiguration):
    import copy
    re_locus = copy.copy(re_locus)
    if var_conf.manual_re_allele1:
        re_locus.allele1 = var_conf.manual_re_allele1.encode()
    if var_conf.manual_re_allele2:
        re_locus.allele2 = var_conf.manual_re_allele2.encode()
    return re_locus


def _is_numeric(s) -> bool:
    try:
        float(s)
        return True
    except (TypeError, ValueError):
        return False


class _GermlineXmlMixin:
    """writeXML (GermlineReportGenerator.cpp:807-1722)."""

    def write_xml(self, filename: str, html_document: str):
        data = self.data
        rs = data.report_settings
        db = self.db
        w = QtXmlStreamWriter()
        w.start_document()

        w.start_element("DiagnosticNgsReport")
        w.attribute("version", "13")
        w.attribute("type", rs.report_type)

        w.start_element("ReportGeneration")
        w.attribute("date", self.date.isoformat())
        from .db import current_user_login
        w.attribute("user_name", current_user_login())
        w.attribute("software", APPLICATION_NAME + " " + APPLICATION_VERSION)
        w.attribute("outcome", db.get_diagnostic_status(self.ps_id)["outcome"])
        w.end_element()

        # ChromosomeAliases
        w.start_element("ChromosomeAliases")
        table = chromosome_mapping(data.build)
        for key in sorted(table.keys()):
            w.start_element("Chromosome")
            w.attribute("chr", key.str)
            w.attribute("refseq", table[key])
            w.end_element()
        w.end_element()

        # Sample
        w.start_element("Sample")
        w.attribute("name", data.ps)
        sample_data = db.get_sample_data(db.sample_id(data.ps))
        w.attribute("name_external", str(sample_data.get("name_external", "")))
        psd = db.get_processed_sample_data(self.ps_id)
        w.attribute("processing_system", psd["processing_system"])
        w.attribute("processing_system_type", psd["processing_system_type"])
        run_id = db.get_value("SELECT id FROM sequencing_run WHERE name=?",
                              params=(psd["run_name"],))
        sequencer = db.get_value(
            "SELECT d.type FROM device d, sequencing_run r "
            "WHERE r.device_id=d.id AND r.id=?", params=(run_id,))
        w.attribute("sequencer_type", str(sequencer or ""))
        comments = psd["comments"].strip()
        if comments:
            w.attribute("comments", comments)
        ancestry = psd["ancestry"].strip()
        if ancestry:
            w.attribute("ancestry", ancestry)
        from ..core.qcml import QCType
        for term in db.get_qc_collection(self.ps_id):
            if term.type == QCType.IMAGE:
                continue
            w.start_element("QcTerm")
            w.attribute("id", term.accession)
            w.attribute("name", term.name)
            w.attribute("def", term.description)
            w.attribute("value", term.to_string())
            w.end_element()
        w.end_element()

        # RNA sample QC
        sample_id = db.sample_id(data.ps)
        rna_ps_ids = []
        for rna_sample in db.related_samples(int(sample_id), "same sample", "RNA"):
            rna_ps_ids.extend(int(v) for v in db.get_values(
                "SELECT id FROM processed_sample WHERE quality!='bad' AND sample_id=?",
                params=(rna_sample,)))
        if rna_ps_ids:
            rna_ps_id = str(sorted(rna_ps_ids, reverse=True)[0])
            w.start_element("RNASample")
            w.attribute("name", db.processed_sample_name(rna_ps_id))
            valid_accessions = {"QC:2000005", "QC:2000025", "QC:2000101", "QC:2000109"}
            for term in db.get_qc_collection(rna_ps_id):
                if term.accession not in valid_accessions:
                    continue
                w.start_element("QcTerm")
                w.attribute("id", term.accession)
                w.attribute("name", term.name)
                w.attribute("def", term.description)
                w.attribute("value", term.to_string())
                w.end_element()
            w.end_element()

        # TargetRegion (optional)
        if data.roi.is_valid():
            w.start_element("TargetRegion")
            w.attribute("name", data.roi.name)
            w.attribute("regions", str(len(data.roi.regions.lines)))
            w.attribute("bases", str(data.roi.regions.base_count()))
            w.attribute("gap_cutoff", str(rs.min_depth))
            if self.gap_percentage > 0:
                w.attribute("gap_percentage", f"{self.gap_percentage:.2f}")
            if self.bases_ccds_sequenced != -1:
                w.attribute("ccds_bases_sequenced", str(self.bases_ccds_sequenced))
            for gene in data.roi.genes:
                gene_id = db.gene_id(gene)
                if gene_id == -1:
                    continue
                w.start_element("Gene")
                w.attribute("name", gene)
                w.attribute("identifier", str(db.gene_hgnc_id(gene_id)))
                best = db.best_transcript(gene_id)
                w.attribute("bases", str(best.regions.base_count() if best else 0))
                preferred_accession = ""
                if sample_data.get("disease_group", "n/a") != "n/a":
                    preferred_accession = db.omim_preferred_phenotype(
                        gene, sample_data["disease_group"])
                for omim_info in db.omim_info(gene):
                    for pheno in omim_info["phenotypes"]:
                        w.start_element("Omim")
                        w.attribute("gene", str(omim_info["mim"]))
                        w.attribute("phenotype", pheno["name"])
                        if pheno["accession"]:
                            w.attribute("phenotype_number", pheno["accession"])
                            if pheno["accession"] == preferred_accession:
                                w.attribute("preferred_phenotype", "true")
                        w.end_element()
                gaps = self.gaps_by_gene.get(
                    gene.encode() if isinstance(gene, str) else gene, BedFile())
                for line in gaps.lines:
                    w.start_element("Gap")
                    w.attribute("chr", line.chr.str_normalized(True))
                    w.attribute("start", str(line.start))
                    w.attribute("end", str(line.end))
                    w.end_element()
                w.end_element()
            w.end_element()

        # VariantList
        w.start_element("VariantList")
        w.attribute("overall_number", str(len(data.variants.variants)))
        w.attribute("genome_build", _build_str(data.build, True))
        for var_conf in rs.report_config.variant_config():
            if var_conf.variant_type != "SNVS_INDELS":
                continue
            if not var_conf.show_in_report():
                continue
            if var_conf.variant_index not in self.selected_small:
                continue
            if rs.report_type != "all" and var_conf.report_type != rs.report_type:
                continue
            raise NgsdError("Variant XML export of selected small variants needs "
                            "the reference genome (absent in this environment)")
        w.end_element()

        # CnvList
        caller = _cnv_caller(data.cnvs)
        no_cnv_calling = caller is None
        w.start_element("CnvList")
        w.attribute("cnv_caller", "NONE" if no_cnv_calling else caller)
        w.attribute("overall_number", str(len(data.cnvs)))
        w.attribute("genome_build", _build_str(data.build, True))
        cnv_callset_id = db.get_value(
            "SELECT id FROM cnv_callset WHERE processed_sample_id=?",
            params=(self.ps_id,))
        cnv_callset_id = "" if (cnv_callset_id is None or no_cnv_calling) \
            else str(cnv_callset_id)
        quality = ""
        if cnv_callset_id:
            quality = str(db.get_value("SELECT quality FROM cnv_callset WHERE id=?",
                                       params=(cnv_callset_id,)) or "").strip()
        w.attribute("quality", quality if quality else "n/a")
        if caller == "ClinCNV" and cnv_callset_id:
            metrics = db.cnv_callset_metrics(int(cnv_callset_id))
            iterations = metrics.get("number of iterations", "").strip()
            if iterations:
                w.attribute("number_of_iterations", iterations)
            hq = metrics.get("high-quality cnvs", "").strip()
            if hq:
                w.attribute("number_of_hq_cnvs", hq)
            corr = metrics.get("mean correlation to reference samples", "").strip()
            if corr:
                w.attribute("correlation_ref_samples", corr)
        for var_conf in rs.report_config.variant_config():
            if var_conf.variant_type != "CNVS" or not var_conf.show_in_report():
                continue
            if var_conf.variant_index not in self.selected_cnvs:
                continue
            if rs.report_type != "all" and var_conf.report_type != rs.report_type:
                continue
            cnv = data.cnvs[var_conf.variant_index]
            if var_conf.is_manually_curated():
                cnv = _update_cnv(cnv, var_conf)
            w.start_element("Cnv")
            w.attribute("chr", cnv.chr.str_normalized(True))
            w.attribute("start", str(cnv.start))
            w.attribute("end", str(cnv.end))
            w.attribute("start_band",
                              cyto_band(data.build, cnv.chr, cnv.start).decode())
            w.attribute("end_band",
                              cyto_band(data.build, cnv.chr, cnv.end).decode())
            cn = cnv.copy_number(data.cnvs.annotation_headers)
            w.attribute("type", "dup" if cn >= 2 else "del")
            w.attribute("cn", str(cn))
            w.attribute("regions", str(max(1, cnv.num_regs)))
            w.attribute("causal", "true" if var_conf.causal else "false")
            w.attribute("de_novo", "true" if var_conf.de_novo else "false")
            w.attribute("comp_het", "true" if var_conf.comp_het else "false")
            w.attribute("mosaic", "true" if var_conf.mosaic else "false")
            if var_conf.inheritance != "n/a":
                w.attribute("inheritance", var_conf.inheritance)
            if var_conf.classification != "n/a":
                w.attribute("class", var_conf.classification)
            if var_conf.comments.strip():
                w.attribute("comments_1st_assessor", var_conf.comments.strip())
            if var_conf.comments2.strip():
                w.attribute("comments_2nd_assessor", var_conf.comments2.strip())
            w.attribute("rna_info", var_conf.rna_info)
            w.attribute("report_type", var_conf.report_type)
            if var_conf.manual_cnv_hgvs_type:
                w.attribute("hgvs_type", var_conf.manual_cnv_hgvs_type)
            if var_conf.manual_cnv_hgvs_suffix:
                w.attribute("hgvs_suffix", var_conf.manual_cnv_hgvs_suffix)
            for gene in cnv.genes:
                gene_s = gene.decode() if isinstance(gene, bytes) else gene
                w.start_element("Gene")
                w.attribute("name", gene_s)
                gene_id = db.gene_id(gene_s)
                w.attribute("identifier",
                                  "n/a" if gene_id == -1 else str(db.gene_hgnc_id(gene_id)))
                w.end_element()
            for url, link_type in (
                    ("http://dgv.tcag.ca/gb2/gbrowse/dgv2_" + _build_str(data.build)
                     + "/?name=" + cnv.to_string(), "DGV"),
                    ("https://genome.ucsc.edu/cgi-bin/hgTracks?db="
                     + _build_str(data.build) + "&position=" + cnv.to_string(),
                     "UCSC")):
                w.start_element("ExternalLink")
                w.attribute("url", url)
                w.attribute("type", link_type)
                w.end_element()
            w.end_element()
        w.end_element()

        # SvList
        w.start_element("SvList")
        sv_caller = "Unknown"
        for header in data.svs.headers:
            if not header.startswith(b"##cmdline="):
                continue
            if b"configManta.py" in header:
                sv_caller = "Manta"
            break
        w.attribute("sv_caller", sv_caller)
        w.attribute("overall_number", str(len(data.svs)))
        w.attribute("genome_build", _build_str(data.build, True))
        for var_conf in rs.report_config.variant_config():
            if not var_conf.show_in_report() or var_conf.variant_type != "SVS":
                continue
            if var_conf.variant_index not in self.selected_svs:
                continue
            if rs.report_type != "all" and var_conf.report_type != rs.report_type:
                continue
            self._write_sv_element(w, var_conf, psd)
        w.end_element()

        # ReList
        w.start_element("ReList")
        w.attribute("re_caller", data.res.caller_as_string()
                          if data.res is not None else "invalid")
        w.attribute("genome_build", _build_str(data.build, True))
        for var_conf in rs.report_config.variant_config():
            if not var_conf.show_in_report() or var_conf.variant_type != "RES":
                continue
            if var_conf.variant_index not in self.selected_res:
                continue
            if rs.report_type != "all" and var_conf.report_type != rs.report_type:
                continue
            self._write_re_element(w, var_conf)
        w.end_element()

        # PrsList
        w.start_element("PrsList")
        if len(data.prs) > 0:
            prs = data.prs
            i_id = prs.column_index("pgs_id")
            i_trait = prs.column_index("trait")
            i_citation = prs.column_index("citation")
            i_score = prs.column_index("score")
            i_percentile = prs.column_index("percentile")
            for row in prs.rows:
                w.start_element("Prs")
                w.attribute("id", row[i_id].strip())
                w.attribute("trait", row[i_trait].strip())
                w.attribute("citation", row[i_citation].strip())
                w.attribute("score", row[i_score].strip())
                percentile = row[i_percentile].strip()
                if percentile:
                    w.attribute("percentile", percentile)
                w.end_element()
        w.end_element()

        if rs.select_other_causal_variant:
            cv = rs.report_config.other_causal_variant
            w.start_element("OtherCausalVariant")
            w.attribute("type", _convert_other_variant_type(cv.type, True))
            w.attribute("coordinates", cv.coordinates)
            w.attribute("gene", cv.gene)
            w.attribute("inheritance", cv.inheritance)
            w.attribute("comments", cv.comment)
            w.end_element()

        # ReportDocument + section parts
        with open(html_document, "rb") as fh:
            html_full = fh.read()
        w.start_element("ReportDocument")
        w.attribute("format", "HTML")
        w.characters(base64.b64encode(html_full).decode())
        w.end_element()

        sections = _html_sections(html_full.split(b"\n"))
        if "MAIN" not in sections:
            raise NgsdError("Could not determine section MAIN in HTML report!")
        for tag, element in (("MAIN", "ReportDocumentPartMain"),
                             ("GAPS", "ReportDocumentPartGaps"),
                             ("GENES", "ReportDocumentPartGenes"),
                             ("PRS", "ReportDocumentPartPRS")):
            if tag not in sections:
                continue
            w.start_element(element)
            w.attribute("format", "HTML")
            w.characters(base64.b64encode(sections[tag]).decode())
            w.end_element()

        w.end_document()
        with open(filename, "wb") as fh:
            fh.write(w.to_bytes())

    def _write_sv_element(self, w, var_conf, psd):
        raise NgsdError("SV XML export needs genome-dependent fixtures absent "
                        "from this environment")

    def _write_re_element(self, w, var_conf):
        data = self.data
        re_locus = data.res[var_conf.variant_index]
        if var_conf.is_manually_curated():
            re_locus = _update_re(re_locus, var_conf)
        w.start_element("Re")
        w.attribute("name", re_locus.name.decode())
        w.attribute("chr", re_locus.chr.str_normalized(True))
        w.attribute("start", str(re_locus.start))
        w.attribute("end", str(re_locus.end))
        w.attribute("repeat_unit", re_locus.unit.decode())
        w.attribute("allele1", str(int(float(re_locus.allele1))))
        if re_locus.allele2:
            w.attribute("allele2", str(int(float(re_locus.allele2))))
        w.attribute("causal", "true" if var_conf.causal else "false")
        w.attribute("de_novo", "true" if var_conf.de_novo else "false")
        w.attribute("comp_het", "true" if var_conf.comp_het else "false")
        w.attribute("mosaic", "true" if var_conf.mosaic else "false")
        if var_conf.inheritance != "n/a":
            w.attribute("inheritance", var_conf.inheritance)
        if var_conf.comments.strip():
            w.attribute("comments_1st_assessor", var_conf.comments.strip())
        if var_conf.comments2.strip():
            w.attribute("comments_2nd_assessor", var_conf.comments2.strip())
        w.attribute("report_type", var_conf.report_type)
        w.end_element()


def _cnv_caller(cnvs) -> str | None:
    """CnvList::caller from the file headers (None = INVALID/none)."""
    for c in getattr(cnvs, "comments", []):
        line = c if isinstance(c, bytes) else c.encode()
        if b"ClinCNV version" in line or b"clincnv" in line.lower():
            return "ClinCNV"
    return None


def _html_sections(html_lines: list[bytes]) -> dict[str, bytes]:
    """(:2934-2961) — extract the SECTION-delimited parts."""
    indices: dict[bytes, int] = {}
    for i, raw in enumerate(html_lines):
        line = raw.strip()
        if line.startswith(b"<!-- SECTION:") and line.endswith(b"-->"):
            tag = line.replace(b"<!-- SECTION:", b"").replace(b"-->", b"").strip()
            indices[tag] = i
    out: dict[str, bytes] = {}
    for tag in (b"MAIN", b"GAPS", b"GENES", b"PRS"):
        start = indices.get(tag, -1)
        end = indices.get(tag + b" END", -1)
        if start != -1 and end != -1:
            out[tag.decode()] = b"\n".join(html_lines[start + 1:end])
    return out


# graft the XML writer onto the generator (kept separate for readability)
GermlineReportGenerator.write_xml = _GermlineXmlMixin.write_xml
GermlineReportGenerator._write_sv_element = _GermlineXmlMixin._write_sv_element
GermlineReportGenerator._write_re_element = _GermlineXmlMixin._write_re_element


@dataclass
class EvaluationSheetData:
    """cppNGSD EvaluationSheetData."""
    ps_id: str = ""
    dna_rna: str = ""
    build: str = "hg38"
    reviewer1: str = ""
    review_date1: object = None
    reviewer2: str = ""
    review_date2: object = None
    analysis_scope: str = ""
    acmg_requested: bool = False
    acmg_noticeable: bool = False
    acmg_analyzed: bool = False
    filtered_by_freq_based_dominant: bool = False
    filtered_by_freq_based_recessive: bool = False
    filtered_by_mito: bool = False
    filtered_by_x_chr: bool = False
    filtered_by_cnv: bool = False
    filtered_by_svs: bool = False
    filtered_by_res: bool = False
    filtered_by_mosaic: bool = False
    filtered_by_phenotype: bool = False
    filtered_by_multisample: bool = False
    filtered_by_trio_stringent: bool = False
    filtered_by_trio_relaxed: bool = False


def _exclusion_criteria(conf: ReportVariantConfiguration) -> str:
    """(:2857-2870)."""
    out = []
    if conf.exclude_artefact:
        out.append("Artefakt")
    if conf.exclude_frequency:
        out.append("Frequenz")
    if conf.exclude_phenotype:
        out.append("Phenotyp")
    if conf.exclude_mechanism:
        out.append("Pathomechanismus")
    if conf.exclude_hit2_missing:
        out.append("2. Hit fehlt")
    if conf.exclude_gus:
        out.append("GUS")
    if conf.exclude_used_other_var_type:
        out.append("Anderer Typ genutzt")
    if conf.exclude_other:
        out.append("Anderer (siehe Kommentare)")
    return ", ".join(out)


def _checkbox(v: bool) -> str:
    return "&#9745;" if v else "&#9633;"


def _sheet_impl(self, filename: str, esd: EvaluationSheetData):
    """writeEvaluationSheet (GermlineReportGenerator.cpp:2284-2573)."""
    db = self.db
    rs = self.data.report_settings
    out: list[str] = []
    s = out.append

    s("<html>\n")
    s("  <head>\n")
    s("    <style>\n")
    s("      @page\n      {\n        size: landscape;\n        margin: 1cm;\n      }\n")
    s("      table\n      {\n        border-collapse: collapse;\n"
      "        border: 1px solid black;\n      }\n")
    s("      th, td\n      {\n        border: 1px solid black;\n      }\n")
    s("      .line {\n        display: inline-block;\n"
      "        border-bottom: 1px solid #000;\n        width: 250px;\n"
      "        margin-left: 10px;\n        margin-right: 10px;\n      }\n")
    s("      .noborder {\n        border: 0px;\n      }\n")
    s("    </style>\n")
    s("  </head>\n")
    s("  <body>\n")
    s("    <table class='noborder' width='100%'>\n")
    s("      <tr>\n")
    s("        <td class='noborder' valign='top'>\n")
    s("           <h3>Probe: " + self.data.ps + "</h3>\n")
    s("        </td>\n")
    s("      </tr>\n")
    s("    </table>\n")
    s("    <table class='noborder' width='100%'>\n")
    s("      <tr>\n")
    s("        <td class='noborder' valign='top'>\n")
    s("          <p>DNA/RNA#: <span class='line'>" + esd.dna_rna + "</span></p>\n")
    s("          <p>Genom: <span class='line'>" + _build_str(esd.build, True)
      + "</span></p>\n")
    # KASP contamination check
    kasp = db.get_rows("SELECT random_error_prob FROM kasp_status "
                       "WHERE processed_sample_id=?", params=(self.ps_id,))
    if kasp and kasp[0][0] is not None:
        prob = float(kasp[0][0])
        pct = _qt_number(100.0 * prob)
        kasp_text = (f"auff&auml;llig ({pct}%)" if prob > 0.011 else f"ok ({pct}%)")
    else:
        kasp_text = self.trans("nicht durchgef&uuml;hrt")
    s("          <p>KASP: <span class='line'>" + kasp_text + "</span></p>\n")
    s("          <br />\n")
    s("          <p>1. Auswerter: <span class='line'>" + esd.reviewer1
      + "</span> Datum: <span class='line'>" + _qt_date(esd.review_date1)
      + "</span></p>\n")
    s("          <p><nobr>2. Auswerter: <span class='line'>" + esd.reviewer2
      + "</span> Datum: <span class='line'>" + _qt_date(esd.review_date2)
      + "</span></nobr></p>\n")
    s("          <br />\n")
    s("          <p>Auswerteumfang: <span class='line'>" + esd.analysis_scope
      + "</span></p>\n")
    s("          <br />\n")
    s("          <table border='0'>\n")
    s("            <tr> <td colspan='2'><b>ACMG</b></td> </tr>\n")
    s("            <tr> <td>angefordert: &nbsp;&nbsp; </td> <td>"
      + _checkbox(esd.acmg_requested) + "</td> </tr>\n")
    s("            <tr> <td>analysiert: &nbsp;&nbsp; </td> <td>"
      + _checkbox(esd.acmg_analyzed) + "</td> </tr>\n")
    s("            <tr> <td>auff&auml;llig: &nbsp;&nbsp; </td> <td>"
      + _checkbox(esd.acmg_noticeable) + "</td> </tr>\n")
    s("          </table>\n")
    s("        </td>\n")
    s("        <td class='noborder' valign='top' style='width: 1%; white-space: nowrap;'>\n")
    s("          <table border='0'>\n")
    s("            <tr> <td colspan='2'><b>Filterung erfolgt</b></td> </tr>\n")
    for label, flag in (
            ("<td style='white-space: nowrap'>Freq.-basiert dominant&nbsp;&nbsp;</td>",
             esd.filtered_by_freq_based_dominant),
            ("<td>Freq.-basiert rezessiv</td>", esd.filtered_by_freq_based_recessive),
            ("<td>Mitochondrial</td>", esd.filtered_by_mito),
            ("<td>X-chromosomal</td>", esd.filtered_by_x_chr),
            ("<td>CNV</td>", esd.filtered_by_cnv),
            ("<td>Strukturvarianten</td>", esd.filtered_by_svs),
            ("<td>Repeat Expansions</td>", esd.filtered_by_res),
            ("<td>Mosaikvarianten</td>", esd.filtered_by_mosaic),
            ("<td>Ph&auml;notyp-basiert</td>", esd.filtered_by_phenotype),
            ("<td>Multi-Sample-Auswertung</td>", esd.filtered_by_multisample),
            ("<td>Trio stringent</td>", esd.filtered_by_trio_stringent),
            ("<td>Trio relaxed</td>", esd.filtered_by_trio_relaxed)):
        s("            <tr> " + label + " <td>" + _checkbox(flag) + "</td> </tr>\n")
    s("          </table>\n")
    s("          <br />\n")
    s("        </td>\n")
    s("      </tr>\n")
    s("    </table>\n")

    # phenotype
    sample_id = db.sample_id(self.data.ps)
    clinical_phenotype = ""
    infos = []
    for dtype, info in db.get_sample_disease_info(sample_id):
        if dtype == "ICD10 code":
            infos.append(dtype + ": " + info)
        if dtype == "HPO term id":
            hpo_id = db.phenotype_id_by_accession(info, False)
            if hpo_id != -1:
                infos.append(info + " - " + db.phenotype_name(hpo_id))
        if dtype == "Orpha number":
            infos.append(dtype + ": " + info)
        if dtype == "clinical phenotype (free text)":
            clinical_phenotype += info + " "
    s("    <br />\n")
    s("    <b>Klinik:</b>\n")
    s("    <table class='noborder' width='100%'>\n")
    s("      <tr>\n")
    s("        <td class='noborder' valign='top'>\n")
    s("          " + clinical_phenotype.strip() + "\n")
    s("        </td>\n")
    s("        <td class='noborder' style='width: 1%; white-space: nowrap;'>\n")
    s("          " + "<br />          ".join(infos) + "\n")
    s("        </td>\n")
    s("      </tr>\n")
    s("    </table>\n")

    def table(title, header_fn, row_fn, var_type, causal):
        s("    <p><b>" + title + "</b>\n")
        s("      <table border='1'>\n")
        header_fn(s, causal)
        for conf in rs.report_config.variant_config():
            if conf.variant_type != var_type:
                continue
            if conf.causal == causal:
                row_fn(s, conf)
        s("      </table>\n")
        s("    </p>\n")

    table("Kausale Varianten:", self._sheet_header_small, self._sheet_row_small,
          "SNVS_INDELS", True)
    table("Sonstige Varianten:", self._sheet_header_small, self._sheet_row_small,
          "SNVS_INDELS", False)
    table("Kausale CNVs:", self._sheet_header_cnv, self._sheet_row_cnv, "CNVS", True)
    table("Sonstige CNVs:", self._sheet_header_cnv, self._sheet_row_cnv, "CNVS", False)
    table("Kausale SVs:", self._sheet_header_sv, self._sheet_row_sv, "SVS", True)
    table("Sonstige SVs:", self._sheet_header_sv, self._sheet_row_sv, "SVS", False)
    table("Kausale REs:", self._sheet_header_re, self._sheet_row_re, "RES", True)
    table("Sonstige REs:", self._sheet_header_re, self._sheet_row_re, "RES", False)

    cv = rs.report_config.other_causal_variant
    if cv.coordinates or cv.gene or cv.type:
        s("    <p><b>Sonstige kausale Varianten:</b>\n")
        s("      <table border='1'>\n")
        s("     <tr>\n")
        for th in ("Variantentyp", "Regionen", "Gene", "Erbgang", "Kommentar"):
            s("       <th>" + th + "</th>\n")
        s("       <th style='white-space: nowrap'>Kommentar 1. Auswerter</th>\n")
        s("       <th style='white-space: nowrap'>Kommentar 2. Auswerter</th>\n")
        s("     </tr>\n")
        s("     <tr>\n")
        s("       <td>" + _convert_other_variant_type(cv.type) + "</td>\n")
        s("       <td>" + cv.coordinates + "</td>\n")
        s("       <td>" + cv.gene + "</td>\n")
        s("       <td>" + cv.inheritance + "</td>\n")
        s("       <td>" + cv.comment + "</td>\n")
        s("       <td>" + cv.comment_reviewer1 + "</td>\n")
        s("       <td>" + cv.comment_reviewer2 + "</td>\n")
        s("     </tr>\n")
        s("      </table>\n")
        s("    </p>\n")

    s("  </body>\n")
    s("</html>\n")
    with open(filename, "w", encoding="utf-8") as fh:
        fh.write("".join(out))


def _sheet_header_small(self, s, causal):
    s("     <tr>\n")
    for th in ("Gen", "Typ", "Genotyp", "Variante", "Erbgang", "c.", "p."):
        s("       <th>" + th + "</th>\n")
    if not causal:
        s("       <th>Ausschlussgrund</th>\n")
    s("       <th>gnomAD</th>\n")
    s("       <th style='white-space: nowrap'>NGSD hom/het</th>\n")
    s("       <th style='white-space: nowrap'>Kommentar 1. Auswerter</th>\n")
    s("       <th style='white-space: nowrap'>Kommentar 2. Auswerter</th>\n")
    s("       <th>Klasse</th>\n")
    s("       <th style='white-space: nowrap'>In Report</th>\n")
    s("       <th>RNA</th>\n")
    s("     </tr>\n")


def _sheet_row_small(self, s, conf):
    """printVariantSheetRow (:2599-2672) — HGVS re-annotation needs the
    genome FASTA; absent one, the best-transcript entries from the
    coding_and_splicing annotation are used."""
    vl = self.data.variants
    v = vl.variants[conf.variant_index]
    i_genotype = vl.annotation_index(self.data.ps)
    i_class = vl.annotation_index("classification")
    i_gnomad = vl.annotation_index("gnomAD")
    i_ngsd_hom = vl.annotation_index("NGSD_hom")
    i_ngsd_het = vl.annotation_index("NGSD_het")
    if conf.is_manually_curated():
        raise NgsdError("Manually-curated small variants need the reference genome")

    genes = self.db.genes_overlapping(v.chr, v.start, v.end, 5000)
    types, hgvs_cs, hgvs_ps = [], [], []
    i_co_sp = _ann_idx(vl, "coding_and_splicing")
    trans_by_id = {}
    if i_co_sp != -1:
        for t in vl.transcript_annotations(v, i_co_sp):
            trans_by_id[t.id_without_version().decode()] = t
    for gene in genes:
        gene_id = self.db.gene_id(gene)
        best = self.db.best_transcript(gene_id) if gene_id != -1 else None
        t = trans_by_id.get(best.name) if best is not None else None
        if t is not None:
            types.append(t.type.decode().replace("&", "&amp;"))
            hgvs_cs.append(t.id.decode() + ":" + t.hgvs_c.decode())
            hgvs_ps.append(t.id.decode() + ":" + t.hgvs_p.decode())
        else:
            types.append("")
            hgvs_cs.append("")
            hgvs_ps.append("")

    s("     <tr>\n")
    s("       <td>" + genes.join(", ") + "</td>\n")
    s("       <td>" + ", ".join(types) + "</td>\n")
    geno = v.annotations[i_genotype].decode()
    if conf.de_novo:
        geno += " (de-novo)"
    if conf.mosaic:
        geno += " (mosaic)"
    if conf.comp_het:
        geno += " (comp-het)"
    s("       <td>" + geno + "</td>\n")
    ref = v.ref.decode()
    obs = v.obs.decode()
    s("       <td style='white-space: nowrap'>" + v.chr.str + ":" + str(v.start)
      + "-" + str(v.end) + " " + (ref[:20] + "..." if len(ref) > 20 else ref)
      + ">" + (obs[:20] + "..." if len(obs) > 20 else obs) + "</td>\n")
    s("       <td>" + conf.inheritance + "</td>\n")
    s("       <td>" + ", ".join(hgvs_cs) + "</td>\n")
    s("       <td>" + ", ".join(hgvs_ps) + "</td>\n")
    if not conf.causal:
        s("       <td>" + _exclusion_criteria(conf) + "</td>\n")
    s("       <td>" + v.annotations[i_gnomad].decode() + "</td>\n")
    s("       <td>" + v.annotations[i_ngsd_hom].decode() + " / "
      + v.annotations[i_ngsd_het].decode() + "</td>\n")
    s("       <td>" + conf.comments + "</td>\n")
    s("       <td>" + conf.comments2 + "</td>\n")
    s("       <td>" + v.annotations[i_class].decode() + "</td>\n")
    s("       <td>" + ("ja" if conf.show_in_report() else "nein") + " ("
      + conf.report_type + ")</td>\n")
    s("       <td>" + self.trans(conf.rna_info) + "</td>\n")
    s("     </tr>\n")


def _sheet_header_cnv(self, s, causal):
    s("     <tr>\n")
    s("       <th>CNV</th>\n")
    s("       <th>copy-number</th>\n")
    s("       <th>Gene</th>\n")
    s("       <th>Erbgang</th>\n")
    s("       <th>" + ("Infos" if causal else "Ausschlussgrund") + "</th>\n")
    s("       <th style='white-space: nowrap'>Kommentar 1. Auswerter</th>\n")
    s("       <th style='white-space: nowrap'>Kommentar 2. Auswerter</th>\n")
    s("       <th>Klasse</th>\n")
    s("       <th style='white-space: nowrap'>In Report</th>\n")
    s("       <th>RNA</th>\n")
    s("     </tr>\n")


def _sheet_row_cnv(self, s, conf):
    cnv = self.data.cnvs[conf.variant_index]
    if conf.is_manually_curated():
        cnv = _update_cnv(cnv, conf)
    s("     <tr>\n")
    s("       <td>" + cnv.to_string()
      + (" (manually curated)" if conf.is_manually_curated() else "") + "</td>\n")
    geno = str(cnv.copy_number(self.data.cnvs.annotation_headers))
    if conf.de_novo:
        geno += " (de-novo)"
    if conf.mosaic:
        geno += " (mosaic)"
    if conf.comp_het:
        geno += " (comp-het)"
    s("       <td>" + geno + "</td>\n")
    s("       <td>" + ", ".join(g.decode() if isinstance(g, bytes) else g
                                for g in cnv.genes) + "</td>\n")
    s("       <td>" + conf.inheritance + "</td>\n")
    if conf.causal:
        s("       <td>regions:" + str(cnv.num_regs) + " size:"
          + self.format_float((cnv.end - cnv.start) / 1000.0, 3) + "kb</td>\n")
    else:
        s("       <td>" + _exclusion_criteria(conf) + "</td>\n")
    s("       <td>" + conf.comments + "</td>\n")
    s("       <td>" + conf.comments2 + "</td>\n")
    s("       <td>" + conf.classification + "</td>\n")
    s("       <td>" + ("ja" if conf.show_in_report() else "nein") + " ("
      + conf.report_type + ")</td>\n")
    s("       <td>" + self.trans(conf.rna_info) + "</td>\n")
    s("     </tr>\n")


def _sheet_header_sv(self, s, causal):
    s("     <tr>\n")
    s("       <th>SV</th>\n")
    s("       <th>Typ</th>\n")
    s("       <th>Gene</th>\n")
    s("       <th>Erbgang</th>\n")
    s("       <th>" + ("Infos" if causal else "Ausschlussgrund") + "</th>\n")
    s("       <th style='white-space: nowrap'>Kommentar 1. Auswerter</th>\n")
    s("       <th style='white-space: nowrap'>Kommentar 2. Auswerter</th>\n")
    s("       <th>Klasse</th>\n")
    s("       <th style='white-space: nowrap'>In Report</th>\n")
    s("       <th>RNA</th>\n")
    s("     </tr>\n")


def _sheet_row_sv(self, s, conf):
    sv = self.data.svs[conf.variant_index]
    if conf.is_manually_curated():
        sv = _update_sv(sv, conf)
    affected = sv.affected_region(False)
    s("     <tr>\n")
    cell = "       <td>" + affected[0].to_string(True)
    if sv.type == b"BND":
        cell += " &lt;-&gt; " + affected[1].to_string(True)
    if conf.is_manually_curated():
        cell += " (manually curated)"
    s(cell + "</td>\n")
    geno = sv.type.decode()
    if conf.de_novo:
        geno += " (de-novo)"
    if conf.mosaic:
        geno += " (mosaic)"
    if conf.comp_het:
        geno += " (comp-het)"
    s("       <td>" + geno + "</td>\n")
    s("       <td>" + _sv_genes(self.data.svs, sv).join(", ") + "</td>\n")
    s("       <td>" + conf.inheritance + "</td>\n")
    if conf.causal:
        size = sv.size()
        s("       <td>estimated size:" + self.format_float(size / 1000.0, 3)
          + "kb</td>\n")
    else:
        s("       <td>" + _exclusion_criteria(conf) + "</td>\n")
    s("       <td>" + conf.comments + "</td>\n")
    s("       <td>" + conf.comments2 + "</td>\n")
    s("       <td>" + conf.classification + "</td>\n")
    s("       <td>" + ("ja" if conf.show_in_report() else "nein") + " ("
      + conf.report_type + ")</td>\n")
    s("       <td>" + self.trans(conf.rna_info) + "</td>\n")
    s("     </tr>\n")


def _sheet_header_re(self, s, causal):
    s("     <tr>\n")
    s("       <th>RE</th>\n")
    s("       <th>Genotyp</th>\n")
    s("       <th>Erbgang</th>\n")
    s("       <th>" + ("Infos" if causal else "Ausschlussgrund") + "</th>\n")
    s("       <th style='white-space: nowrap'>Kommentar 1. Auswerter</th>\n")
    s("       <th style='white-space: nowrap'>Kommentar 2. Auswerter</th>\n")
    s("       <th style='white-space: nowrap'>In Report</th>\n")
    s("     </tr>\n")


def _sheet_row_re(self, s, conf):
    re_locus = self.data.res[conf.variant_index]
    if conf.is_manually_curated():
        re_locus = _update_re(re_locus, conf)
    s("     <tr>\n")
    s("       <td>" + re_locus.name.decode() + " " + re_locus.region_string()
      + " " + re_locus.unit.decode() + "</td>\n")
    geno = re_locus.allele1.decode()
    if re_locus.allele2:
        geno += "/" + re_locus.allele2.decode()
    if conf.de_novo:
        geno += " (de-novo)"
    if conf.mosaic:
        geno += " (mosaic)"
    if conf.comp_het:
        geno += " (comp-het)"
    s("       <td>" + geno + "</td>\n")
    s("       <td>" + conf.inheritance + "</td>\n")
    if conf.causal:
        s("       <td></td>\n")
    else:
        s("       <td>" + _exclusion_criteria(conf) + "</td>\n")
    s("       <td>" + conf.comments + "</td>\n")
    s("       <td>" + conf.comments2 + "</td>\n")
    s("       <td>" + ("ja" if conf.show_in_report() else "nein") + " ("
      + conf.report_type + ")</td>\n")
    s("     </tr>\n")


def _qt_number(v: float) -> str:
    """QString::number(double) — 'g', 6 significant digits."""
    return f"{v:.6g}"


GermlineReportGenerator.write_evaluation_sheet = _sheet_impl
GermlineReportGenerator._sheet_header_small = _sheet_header_small
GermlineReportGenerator._sheet_row_small = _sheet_row_small
GermlineReportGenerator._sheet_header_cnv = _sheet_header_cnv
GermlineReportGenerator._sheet_row_cnv = _sheet_row_cnv
GermlineReportGenerator._sheet_header_sv = _sheet_header_sv
GermlineReportGenerator._sheet_row_sv = _sheet_row_sv
GermlineReportGenerator._sheet_header_re = _sheet_header_re
GermlineReportGenerator._sheet_row_re = _sheet_row_re
