"""Somatic tumor-normal RTF/XML report generator.

Behavioral reference: ``cppNGSD/SomaticReportHelper.{h,cpp}`` (2158 LoC) and
``cppNGS/SomaticCnvInterpreter.{h,cpp}``; replayed byte-exact against
``cppNGSD-TEST/data_out/somatic_report_tumor_normal_{1,2}.{rtf,xml}``
(NGSD_Test.cpp:2804-2998).

The report is a German-language clinical RTF document: a summary table,
high/unclear-impact SNV+CNV tables, a CNV table, fusions, virus DNA,
pharmacogenetics, molecular-pathway summary, mutation signatures, QC metadata,
HLA genotypes and EBM billing information.  ``get_xml_data()`` re-renders the
same parts for the structured XML export (``SomaticXmlReportGenerator``).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from ..core.rtf import (RtfDocument, RtfParagraph, RtfPicture, RtfTable,
                        RtfTableRow, RtfText)
from ..core.geneset import GeneSet
from ..io.tsv import TsvFile
from .db import NGSD
from . import somatic_report as sr

# QCoreApplication::applicationName/Version analogue used in partMetaData
# ("Auswertungssoftware" row); overridable by tests/tools.
APPLICATION_NAME = "ngs-bits-tpu"
APPLICATION_VERSION = ""


def _ann_idx(vl, name: str) -> int:
    """annotationIndexByName(name, exact, error=false) -> index or -1."""
    try:
        return vl.annotation_index(name)
    except KeyError:
        return -1


def _to_double(v, default: float = 0.0) -> float:
    """QByteArray::toDouble() — 0.0 when unparsable (no ok flag checked)."""
    try:
        return float(v.strip() if isinstance(v, (bytes, str)) else v)
    except (TypeError, ValueError):
        return default


def _fnum(v: float, prec: int) -> bytes:
    """QByteArray::number(double, 'f', prec)."""
    if math.isnan(v):
        return b"nan"
    return (b"%.*f" % (prec, v))


def _gnum(v) -> bytes:
    """QByteArray::number(double) — 'g' format, 6 significant digits."""
    return f"{float(v):.6g}".encode()


def _inum(v) -> bytes:
    return b"%d" % int(v)


def _meta_bool(rc, key: str) -> bool:
    return bool(int(rc.meta.get(key) or 0))


def _meta_int(rc, key: str) -> int:
    return int(rc.meta.get(key) or 0)


def _meta_str(rc, key: str) -> str:
    v = rc.meta.get(key)
    return "" if v is None else str(v)


def _quality_list(rc) -> list[str]:
    """SomaticReportConfiguration::quality() — QStringList."""
    q = rc.meta.get("quality")
    if q is None:
        return []
    if isinstance(q, (list, tuple)):
        return [str(x) for x in q]
    return str(q).split(",") if str(q) else []


def _evaluation_date_str(rc) -> bytes:
    """evaluationDate().toString("dd.MM.yyyy")."""
    import datetime
    v = rc.meta.get("evaluation_date")
    if v is None:
        return b""
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.strftime("%d.%m.%Y").encode()
    s = str(v)
    for fmt in ("%Y-%m-%d", "%d.%m.%Y"):
        try:
            return datetime.datetime.strptime(s[:10], fmt).strftime("%d.%m.%Y").encode()
        except ValueError:
            continue
    return s.encode()


def trans(text):
    """SomaticReportHelper::trans (SomaticReportHelper.cpp:1521-1547) —
    en->de phrase table; returns input unchanged when unknown."""
    en2de = {
        "no abnormalities": "keine Auffälligkeiten",
        "tumor cell content too low": "Tumorzellgehalt niedrig",
        "quality of tumor DNA too low": "Qualität der Tumor-DNA zu gering",
        "DNA quantity too low": "DNA-Menge im Tumor zu gering",
        "heterogeneous sample": "Probe heterogen",
        "contamination": "Hinweise auf Fremd-DNA",
        "activating": "aktivierend",
        "test_dependent": "testabhängige Bedeutung",
        "ONCOGENIC": "onkogene Variante",
        "LIKELY_ONCOGENIC": "wahrsch. onkogene Variante",
        "BENIGN": "gutartige Variante",
        "LIKELY_BENIGN": "wahrsch. gutartige Variante",
        "UNCERTAIN_SIGNIFICANCE": "unklare Variante",
        "loss_of_function": "Funktionsverlust",
        "ambiguous": "unklare Bedeutung",
        "proof": "Hinweise auf eine HRD",
        "no proof": "Keine Hinweise auf eine HRD",
        "Breakpoint": "Translokation",
        "Duplication": "Duplikation",
    }
    is_bytes = isinstance(text, bytes)
    key = text.decode() if is_bytes else str(text)
    out = en2de.get(key, key)
    return out.encode() if is_bytes else out


def cnv_type_description(tumor_cn: int, add_cn: bool) -> bytes:
    """SomaticReportHelper::CnvTypeDescription (:416-441)."""
    if tumor_cn > 2:
        t = b"AMP"
        if add_cn:
            t += b" (" + _inum(tumor_cn) + b" Kopien)"
    elif tumor_cn < 2:
        t = b"DEL"
        if add_cn and tumor_cn == 0:
            t += b" (hom)"
        elif add_cn and tumor_cn == 1:
            t += b" (het)"
    elif tumor_cn == 2:
        t = b"LOH"
    else:
        t = b"n/a"
    return t


def include_in_report(copy_number: int, cnv_type: bytes, gene_role: dict | None) -> bool:
    """SomaticCnvInterpreter::includeInReport (SomaticCnvInterpreter.cpp:4-22)."""
    role = (gene_role or {}).get("role", "ambiguous")
    if copy_number < 2 and role == "loss_of_function":
        return True
    if copy_number == 0:
        return True
    if copy_number > 2 and role == "activating":
        return True
    if copy_number > 5 and role != "loss_of_function":
        return True
    if b"focal" in cnv_type:
        return True
    return False


@dataclass
class SomaticVirusInfo:
    """SomaticReportHelper.h:16-49."""
    chr: bytes = b""
    start: int = 0
    end: int = 0
    name: bytes = b""
    reads: int = 0
    coverage: float = 0.0
    mismatches: int = 0
    idendity: float = 0.0

    def virus_gene(self) -> bytes:
        parts = self.name.split(b"_")
        if len(parts) > 1:
            return self.name.replace(parts[0] + b"_", b"")
        return b""

    def virus_name(self) -> bytes:
        parts = self.name.split(b"_")
        return parts[0] if parts else b""


class SomaticHlaInfo:
    """hla_genotyper TSV (SomaticReportHelper.h:51-152)."""

    def __init__(self, hla_file: str):
        self.lines: list[dict] = []
        if not hla_file or not os.path.exists(hla_file):
            return
        tsv = TsvFile.from_file(hla_file)
        for values in tsv.rows:
            if len(values) != 11:
                raise ValueError(f"HLA file '{hla_file}' contained a line string with an "
                                 "unexpected number of columns! Column values: "
                                 + b",".join(values).decode())
            try:
                self.lines.append({
                    "bam_file": values[0], "sample": values[1], "ethnicity": values[2],
                    "gene": values[3], "allele1": values[4], "allele2": values[5],
                    "precision": float(values[6]), "passed": values[7] == b"Pass",
                    "depth_allele1": int(values[8]), "depth_allele2": int(values[9])})
            except ValueError:
                raise ValueError(f"HLA file '{hla_file}' contained a unexpected string in a "
                                 "number column (pval, a1_reads or a2_reads)!")

    def is_valid(self) -> bool:
        return len(self.lines) != 0

    def get_gene_allele(self, gene: bytes, allele1: bool) -> bytes:
        for line in self.lines:
            if line["gene"] == gene:
                return line["allele1"] if allele1 else line["allele2"]
        raise ValueError(f"Given Gene not found in HLA lines: {gene.decode()}")

    def get_gene_allele_depth(self, gene: bytes, allele1: bool) -> int:
        for line in self.lines:
            if line["gene"] == gene:
                return line["depth_allele1"] if allele1 else line["depth_allele2"]
        raise ValueError(f"Given Gene not found in HLA lines: {gene.decode()}")


def select_somatic_transcript(db: NGSD, transcripts):
    """SomaticReportHelper::selectSomaticTranscript (:369-405)."""
    from ..io.gsvar import VariantTranscript
    if not transcripts:
        return VariantTranscript()

    current_best_quality = -1
    best_transcript = None
    for tr in transcripts:
        gene_id = db.gene_id(tr.gene)
        if gene_id == -1:
            continue
        best, quality = db.best_transcript_for_variant(gene_id, transcripts)
        if best is None:
            continue
        best_name = best.name.encode() if isinstance(best.name, str) else best.name
        for t in transcripts:
            if t.id_without_version() == best_name and current_best_quality < quality:
                current_best_quality = quality
                best_transcript = t

    if current_best_quality != -1:
        return best_transcript
    return transcripts[0]


def check_germline_snv_file(germline_variants) -> bool:
    """SomaticReportHelper::checkGermlineSNVFile (:207-219)."""
    if len(germline_variants.variants) == 0:
        return False
    for an in ("gene", "coding_and_splicing", "classification", "dbSNP"):
        if _ann_idx(germline_variants, an) < 0:
            return False
    return True


def get_cnv_max_tumor_clonality(cnvs) -> float:
    """SomaticReportHelper::getCnvMaxTumorClonality (:544-563)."""
    i = cnvs.annotation_index_by_name(b"tumor_clonality", False)
    if i == -1:
        return math.nan
    best = -1.0
    for j in range(len(cnvs)):
        try:
            tmp = float(cnvs[j].annotations[i])
        except (TypeError, ValueError):
            continue
        if tmp > best:
            best = tmp
    return math.nan if best == -1 else best


def cnv_burden(cnvs) -> float:
    """Total CNV size / genome size in % (SomaticReportHelper.h:178-181)."""
    total = sum(cnvs[i].end - cnvs[i].start for i in range(len(cnvs)))
    return total / 3101788170.0 * 100


def add_colors(doc: RtfDocument):
    """SomaticReportHelper::addColors (:407-414)."""
    doc.add_color(188, 230, 138)
    doc.add_color(255, 0, 0)
    doc.add_color(255, 255, 0)
    doc.add_color(191, 191, 191)
    doc.add_color(240, 240, 240)


# QMultiMap<rs, (relevance, drugs)> of partPharmacoGenetics
# (SomaticReportHelper.cpp:751-776).  Qt's QMultiMap iterates uniqueKeys() in
# ascending key order and values(key) most-recently-inserted first, i.e. the
# per-key value lists below are REVERSED relative to the C++ initializer.
_PHARMACOGENETIC_SNPS: list[tuple[bytes, list[tuple[bytes, bytes]]]] = sorted([
    (b"rs1142345", [(b"Wirksamkeit", b"Cisplatin, Cyclophosphamide"),
                    ("Toxizität".encode(), b"Cisplatin")]),
    (b"rs12248560", [("Toxizität".encode(), b"Cyclophosphamid, Doxorubicin, Fluoruracil")]),
    (b"rs1800460", [("Toxizität".encode(), b"Cisplatin")]),
    (b"rs3745274", [(b"Dosierung", b"Cyclophosphamide, Doxorubicin")]),
    (b"rs3892097", [("Wirksamkeit, Toxizität".encode(), b"Tamoxifen")]),
    (b"rs35742686", [(b"Stoffwechsel", b"Tamoxifen")]),
    (b"rs3918290", [("Toxizität, Stoffwechsel".encode(),
                     b"Capecitabine, Fluoruracil, Pyrimidine analogues, Tegafur"),
                    (b"Wirksamkeit", b"Fluoruracil")]),
    (b"rs4148323", [(b"Sonstige", b"Irinotecan"),
                    (b"Sonstige", b"SN-38 (irinotecan metabolite)"),
                    (b"Dosierung", b"Irinotecan")]),
    (b"rs4149056", [("Toxizität".encode(),
                     b"Cyclophosphamid, Docetaxel, Doxorubicin, Epirubicin, Fluoruracil"),
                    ("Toxizität".encode(), b"Irinotecan")]),
    (b"rs4244285", [(b"Stoffwechsel", b"Nelfinavir"),
                    (b"Wirksamkeit", b"Cyclophosphamid, Doxorubicin"),
                    ("Toxizität".encode(), b"Cyclophosphamid, Doxorubicin")]),
    (b"rs55886062", [("Toxizität".encode(),
                      b"Capecitabine, Fluoruracil, Pyrimidine analogues, Tegafur")]),
    (b"rs56038477", [("Toxizität".encode(), b"Capecitabine, Fluoruracil")]),
    (b"rs67376798", [("Toxizität, Stoffwechsel".encode(),
                      b"Capecitabine, Fluoruracil, Pyrimidine analogues, Tegafur")]),
    (b"rs8175347", [(b"Stoffwechsel", b"Belinostat"),
                    (b"Dosierung", b"Irinotecan"),
                    (b"Sonstige", b"SN-38 (irinotecan metaboite)"),
                    ("Toxizität".encode(), b"irinotecan")]),
], key=lambda kv: kv[0])

# highlighted rs numbers (DPYD) in the pharmacogenetics table (:796)
_PHARMACO_HIGHLIGHT = {b"rs3918290", b"rs55886062", b"rs67376798", b"rs56038477"}


class SomaticReportHelper:
    """Creates the somatic tumor-normal RTF report
    (SomaticReportHelper.cpp:20-204)."""

    def __init__(self, build: str, variants, cnvs, svs, variants_germline,
                 settings: "sr.SomaticReportSettings", db: NGSD | None = None):
        self.build = build
        self.settings = settings
        self.germline_vl = variants_germline
        self.db = db if db is not None else NGSD(test_db=True)
        self.skipped_amp = GeneSet()
        self.validated_viruses: list[SomaticVirusInfo] = []
        self.ebm_genes = GeneSet()
        self.cnv_high_impact_indices: dict[int, set[bytes]] = {}

        # SNV annotation indices + filtered lists
        self.snv_index_coding_splicing = variants.annotation_index("coding_and_splicing")
        self.somatic_vl = sr.filter_variants(variants, settings)
        i_gene = self.somatic_vl.annotation_index("gene")
        self.somatic_vl.variants.sort(key=lambda v: v.annotations[i_gene])

        self.svs = sr.filter_svs(self.db, svs, settings)
        self.cnvs = sr.filter_cnvs(cnvs, settings)
        self.filtered_germline_vl = sr.filter_germline_variants(variants_germline, settings)

        # qcML data from NGSD
        self.tumor_qcml_data = self.db.get_qc_collection(
            self.db.processed_sample_id(settings.tumor_ps))
        self.normal_qcml_data = self.db.get_qc_collection(
            self.db.processed_sample_id(settings.normal_ps))

        # high significance genes: VICC classification
        important_genes = GeneSet()
        i_som_vicc = self.somatic_vl.annotation_index("NGSD_som_vicc_interpretation")
        for v in self.somatic_vl.variants:
            vicc = v.annotations[i_som_vicc]
            if vicc in (b"ONCOGENIC", b"LIKELY_ONCOGENIC"):
                important_genes.insert(select_somatic_transcript(
                    self.db, self.somatic_vl.transcript_annotations(
                        v, self.snv_index_coding_splicing)).gene)

        i_cnv_type = self.cnvs.annotation_index_by_name(b"cnv_type", True)

        # high significance genes: with reported CNV
        for i in range(len(self.cnvs)):
            cnv = self.cnvs[i]
            cn = cnv.copy_number(self.cnvs.annotation_headers)
            if cn in (2, 3):  # Skip LOHs and low cn amps
                continue
            cnv_type = cnv.annotations[i_cnv_type]
            for gene in cnv.genes:
                role = self.db.get_somatic_gene_role(gene)
                if role is None or not role["high_evidence"]:
                    continue
                if not include_in_report(cn, cnv_type, role):
                    continue
                important_genes.insert(gene)

        # germline SNV genes
        i_germl_gene = self.filtered_germline_vl.annotation_index("gene")
        i_germl_co_sp = self.filtered_germline_vl.annotation_index("coding_and_splicing")
        for v in self.filtered_germline_vl.variants:
            transcript = select_somatic_transcript(
                self.db, self.filtered_germline_vl.transcript_annotations(v, i_germl_co_sp))
            if transcript.gene != b"":
                important_genes.insert(transcript.gene)
            else:
                for gene in v.annotations[i_germl_gene].split(b","):
                    important_genes.insert(gene)

        # split somatic variants into high/low impact index sets
        self.somatic_vl_high_impact_indices: set[int] = set()
        self.somatic_vl_low_impact_indices: set[int] = set()
        for i, v in enumerate(self.somatic_vl.variants):
            gene = select_somatic_transcript(
                self.db, self.somatic_vl.transcript_annotations(
                    v, self.snv_index_coding_splicing)).gene
            if important_genes.contains(gene):
                self.somatic_vl_high_impact_indices.add(i)
            else:
                self.somatic_vl_low_impact_indices.add(i)

        # MSIsensor Pro QC value
        self.msi_unstable_percent = settings.msi_value(self.db)

        # virus data (coverage >= 50 only); parse failures ignored
        try:
            if settings.viral_file:
                tsv = TsvFile.from_file(settings.viral_file)
                i_name = tsv.column_index(b"name")
                i_reads = tsv.column_index(b"reads")
                i_cov = tsv.column_index(b"coverage")
                i_mm = tsv.column_index(b"mismatches")
                i_id = tsv.column_index(b"identity%")
                for parts in tsv.rows:
                    if not parts:
                        continue
                    tmp = SomaticVirusInfo(
                        chr=parts[0], start=int(parts[1]), end=int(parts[2]),
                        name=parts[i_name], reads=int(parts[i_reads]),
                        coverage=float(parts[i_cov]), mismatches=int(parts[i_mm]),
                        idendity=float(parts[i_id]))
                    if tmp.coverage < 50:
                        continue
                    self.validated_viruses.append(tmp)
        except Exception:
            pass  # nothing to do here (reference swallows too)

        # CNV annotation indices (non-throwing)
        self.cnv_index_cn_change = self.cnvs.annotation_index_by_name(b"CN_change", False)
        self.cnv_index_cnv_type = self.cnvs.annotation_index_by_name(b"cnv_type", False)
        self.cnv_index_tumor_clonality = self.cnvs.annotation_index_by_name(
            b"tumor_clonality", False)
        self.cnv_index_state = self.cnvs.annotation_index_by_name(b"state", False)
        self.cnv_index_cytoband = self.cnvs.annotation_index_by_name(b"cytoband", False)

        # processing system data
        sys_id = self.db.processing_system_id_from_processed_sample(settings.tumor_ps)
        self.processing_system_data = self.db.get_processing_system_data(sys_id)

        # disease details (histologic tumor fraction)
        tmp = [info for (dtype, info) in
               self.db.get_sample_disease_info(self.db.sample_id(settings.tumor_ps))
               if dtype == "tumor fraction"]
        self.histol_tumor_fraction = float(tmp[0]) if len(tmp) == 1 else math.nan

        # mutation burden from QC:2000053 ("var/Mb" legacy format handled)
        try:
            mb_string = self.tumor_qcml_data.value("QC:2000053", True).to_string()
            if "var/Mb" in mb_string:
                mb_string = (mb_string + "  ").split(" ")[1].replace("(", "")
            self.mutation_burden = float(mb_string)
        except Exception:
            self.mutation_burden = math.nan

        self.doc = RtfDocument()
        add_colors(self.doc)

    # ---- small accessors (testing functionality, SomaticReportHelper.h:198-211)

    def get_hist_tumor_content(self) -> float:
        return self.histol_tumor_fraction

    def get_tumor_mutation_burden(self) -> float:
        return self.mutation_burden

    def get_msi_value(self) -> float:
        return self.msi_unstable_percent

    def get_tumor_content_by_snvs(self) -> float:
        """Median tumor content by SNVs, QC:2000054 bounded to [0,100] (:565-576)."""
        try:
            v = float(self.tumor_qcml_data.value("QC:2000054", True).to_string())
            return max(0.0, min(v, 100.0))
        except Exception:
            return math.nan

    def get_tumor_content_bioinf(self) -> float:
        """(:2145-2157)."""
        rc = self.settings.report_config
        by_clonality = _meta_bool(rc, "tum_content_max_clonality")
        by_snv = _meta_bool(rc, "tum_content_max_af")
        if by_clonality and by_snv:
            return max(get_cnv_max_tumor_clonality(self.cnvs), self.get_tumor_content_by_snvs())
        if by_clonality:
            return get_cnv_max_tumor_clonality(self.cnvs)
        if by_snv:
            return self.get_tumor_content_by_snvs()
        return -1

    def cnv_description(self, cnv, role: dict | None, snv_tumor_af: float = -1) -> bytes:
        """CnvDescription (:443-485)."""
        cn = cnv.copy_number(self.cnvs.annotation_headers)
        role_name = (role or {}).get("role", "ambiguous")
        high_ev = bool((role or {}).get("high_evidence"))
        if role_name == "activating" and cn > 2:
            out = "onkogene Veränderung" if high_ev else "wahrsch. onkogene Veränderung"
        elif role_name == "loss_of_function" and cn < 2:
            out = "onkogene Veränderung" if high_ev else "wahrsch. onkogene Veränderung"
        else:
            out = "unklare Signifikanz der Veränderung"
        out = out.encode()

        if cn == 2:
            if snv_tumor_af == -1:
                out += b" " + RtfText(b"/ Verlust des Wildtypallels").highlight(3).rtf_code()
            cnv_type = cnv_type_description(cn, False)
            clonality = _to_double(cnv.annotations[self.cnv_index_tumor_clonality])
            if ((cnv_type == b"LOH" and clonality >= snv_tumor_af * 0.85)
                    or (cnv_type == b"DEL" and clonality >= self.get_tumor_content_bioinf() * 0.85)):
                out = RtfText(b"Verlust des Wildtypallels").highlight(3).rtf_code()

        if cn > 2:
            out += b"\n\\line\nm\xc3\xb6gl. \xc3\x9cberexpression".decode("utf-8").encode("utf-8")
        elif cn < 2:
            out += "\n\\line\nmögl. reduzierte Expression".encode()
        else:
            out += b"\n\\line\nunklare Bedeutung f\xc3\xbcr Expression".decode("utf-8").encode("utf-8")
        return out

    def cytoband(self, cnv) -> bytes:
        """(:487-498) — ISCN 2016 first+last cytoband."""
        out = b""
        if self.cnv_index_cytoband > -1:
            parts = sorted(cnv.annotations[self.cnv_index_cytoband].strip().split(b","))
            if len(parts) == 1 and parts[0]:
                out = parts[0]
            elif len(parts) > 1:
                out = parts[0] + parts[-1]
        return out

    def overlapping_cnv(self, cnv, gene: bytes, col_widths: list[int],
                        snv_tumor_af: float) -> RtfTableRow:
        """(:500-542)."""
        cn = cnv.copy_number(self.cnvs.annotation_headers)
        row = RtfTableRow()
        row.add_cell(col_widths[0], gene, RtfParagraph().set_italic(True))

        statement = RtfText(b"")
        if cn > 2:
            statement.append(b"AMP (" + _inum(cn) + b" Kopien)")
        elif cn < 2:
            if cn == 1:
                statement.append(b"DEL (het)")
            elif cn == 0:
                statement.append(b"DEL (hom)")
        else:
            statement.append(cnv.annotations[self.cnv_index_state])
        statement.set_font_size(18)
        statement.append(RtfText(cnv.chr.str_normalized(True).encode())
                         .set_font_size(14).rtf_code(), True)
        if self.cnv_index_cytoband > -1:
            statement.append(RtfText(b"; " + self.cytoband(cnv)).set_font_size(14).rtf_code())
        row.add_cell(col_widths[1], statement.rtf_code())

        cnv_type = cnv.annotations[self.cnv_index_cnv_type]
        if b"focal" not in cnv_type and b"cluster" not in cnv_type:
            cnv_type = b"non-focal"
        row.add_cell(col_widths[2], cnv_type)
        row.add_cell(col_widths[3],
                     _fnum(_to_double(cnv.annotations[self.cnv_index_tumor_clonality]), 2),
                     RtfParagraph().set_horizontal_alignment(b"c"))
        row.add_cell(col_widths[4],
                     self.cnv_description(cnv, self.db.get_somatic_gene_role(gene), snv_tumor_af))
        row.add_cell(col_widths[5], b", ".join(self.db.get_somatic_pathways(gene)))
        return row

    def prepare_transcript_type(self, transcript_type: bytes) -> bytes:
        """(:2124-2143) — drop 'intron' entries from multi-type lists."""
        if b"," not in transcript_type:
            return transcript_type
        clean = b""
        for t in transcript_type.split(b","):
            t = t.strip()
            if t != b"intron":
                clean += t + b", "
        return clean[:-2]

    def snv_row(self, snv, transcript, col_widths: list[int]) -> RtfTableRow:
        """(:1118-1155)."""
        i_som_rep_alt = _ann_idx(self.somatic_vl, "alt_var_alteration")
        i_som_rep_desc = _ann_idx(self.somatic_vl, "alt_var_description")
        i_tum_af = self.somatic_vl.annotation_index("tumor_af")
        i_vicc = self.somatic_vl.annotation_index("NGSD_som_vicc_interpretation")

        row = RtfTableRow()
        gene = transcript.gene
        row.add_cell(col_widths[0], transcript.gene, RtfParagraph().set_italic(True))

        # alternative alteration text from report config overrides hgvs
        if (i_som_rep_alt > -1 and i_som_rep_desc > -1
                and (snv.annotations[i_som_rep_alt] != b"" or snv.annotations[i_som_rep_desc] != b"")):
            row.add_cell(col_widths[1], snv.annotations[i_som_rep_alt] + b", "
                         + snv.annotations[i_som_rep_desc])
        else:
            alterations = []
            if transcript.hgvs_c:
                alterations.append(transcript.hgvs_c)
            if transcript.hgvs_p:
                alterations.append(transcript.hgvs_p)
            if not alterations:
                alterations.append(RtfText(b"???").highlight(3).rtf_code())
            row.add_cell(col_widths[1], [b", ".join(alterations),
                                         RtfText(transcript.id).set_font_size(14).rtf_code()])
        row.last().format().set_line_spacing(276)

        row.add_cell(col_widths[2], self.prepare_transcript_type(transcript.type))
        row.add_cell(col_widths[3], _fnum(_to_double(snv.annotations[i_tum_af]), 2),
                     RtfParagraph().set_horizontal_alignment(b"c"))
        var_description = trans(snv.annotations[i_vicc])
        row.add_cell(col_widths[4], var_description if var_description else b"nicht bewertet")
        row.add_cell(col_widths[5], b", ".join(self.db.get_somatic_pathways(gene)))
        return row

    def snv_table(self, indices: set[int], high_impact_table: bool = True) -> RtfTable:
        """SNVs + relevant germline SNPs + overlapping CNVs (:857-1116)."""
        headers = [b"Gen", b"Ver\xc3\xa4nderung".decode("utf-8").encode("utf-8"), b"Typ",
                   b"Anteil", b"Beschreibung", b"Molekularer Signalweg"]
        col_widths = [1000, 1950, 1400, 600, 2950, 2022]

        table = RtfTable()
        heading_text = ("Punktmutationen (SNVs), kleine Insertionen/Deletionen (INDELs) "
                        "und Kopienzahlvarianten (CNVs)").encode()
        table.add_row(RtfTableRow(heading_text, self.doc.max_width(),
                                  RtfParagraph().set_bold(True).set_horizontal_alignment(b"c"))
                      .set_background_color(4).set_header())
        table.add_row(RtfTableRow(headers, col_widths,
                                  RtfParagraph().set_bold(True).set_horizontal_alignment(b"c"))
                      .set_header())

        cna_already_included = GeneSet()
        snv_already_included: set[int] = set()
        indices_sorted = sorted(indices)

        if high_impact_table:
            # germline SNVs first
            i_germl_gene = self.filtered_germline_vl.annotation_index("gene")
            i_germl_co_sp = self.filtered_germline_vl.annotation_index("coding_and_splicing")
            i_germl_freq_in_tum = self.filtered_germline_vl.annotation_index("freq_in_tum")
            i_germl_hom_het = self.filtered_germline_vl.annotation_index(self.settings.normal_ps)

            for var in self.filtered_germline_vl.variants:
                row = RtfTableRow()
                transcript = select_somatic_transcript(
                    self.db, self.filtered_germline_vl.transcript_annotations(var, i_germl_co_sp))
                gene_txt = transcript.gene if transcript.gene != b"" \
                    else var.annotations[i_germl_gene]

                row.add_cell(col_widths[0], gene_txt + b"\\super#",
                             RtfParagraph().set_italic(True))
                row.add_cell(col_widths[1],
                             [transcript.hgvs_c + b", " + transcript.hgvs_p,
                              RtfText(transcript.id).set_font_size(14).rtf_code()])
                row.add_cell(col_widths[2], transcript.type.replace(b"_variant", b""))
                row.add_cell(col_widths[3],
                             _fnum(_to_double(var.annotations[i_germl_freq_in_tum]), 2),
                             RtfParagraph().set_horizontal_alignment(b"c"))

                germl_desc = b"pathogene Variante"
                if b"het" in var.annotations[i_germl_hom_het]:
                    germl_desc += b", in der Normalprobe heterozygot"
                elif b"hom" in var.annotations[i_germl_hom_het]:
                    germl_desc += b", in der Normalprobe homozygot"
                else:
                    germl_desc += b", nachgewiesen im Normalgewebe"
                row.add_cell(col_widths[4], germl_desc)
                row.add_cell(col_widths[5], b", ".join(self.db.get_somatic_pathways(gene_txt)))
                table.add_row(row)
                self.ebm_genes.insert(transcript.gene)

                # somatic SNVs in the same gene stay next to the germline entry
                for i in indices_sorted:
                    snv = self.somatic_vl.variants[i]
                    som_transcript = select_somatic_transcript(
                        self.db, self.somatic_vl.transcript_annotations(
                            snv, self.snv_index_coding_splicing))
                    som_transcript.type = som_transcript.type.replace(b"_variant", b"") \
                                                             .replace(b"&", b", ")
                    if transcript.gene == som_transcript.gene:
                        table.add_row(self.snv_row(snv, som_transcript, col_widths))
                        snv_already_included.add(i)
                        self.ebm_genes.insert(som_transcript.gene)

                # overlapping somatic CNVs of the germline variant
                for ci in range(len(self.cnvs)):
                    cnv = self.cnvs[ci]
                    if not (cnv.chr == var.chr and cnv.start <= var.end
                            and cnv.end >= var.start):
                        continue
                    if cna_already_included.contains(transcript.gene):
                        continue
                    cna_already_included.insert(transcript.gene)
                    self.cnv_high_impact_indices.setdefault(ci, set()).add(transcript.gene)
                    table.add_row(self.overlapping_cnv(
                        cnv, transcript.gene, col_widths,
                        _to_double(var.annotations[i_germl_freq_in_tum])))

        # somatic SNVs
        i_tum_af = self.somatic_vl.annotation_index("tumor_af")
        for i in indices_sorted:
            if i in snv_already_included:
                continue
            snv = self.somatic_vl.variants[i]
            transcript = select_somatic_transcript(
                self.db, self.somatic_vl.transcript_annotations(
                    snv, self.snv_index_coding_splicing))
            transcript.type = transcript.type.replace(b"_variant", b"").replace(b"&", b", ")
            table.add_row(self.snv_row(snv, transcript, col_widths))
            self.ebm_genes.insert(transcript.gene)

            # overlapping CNVs of the somatic SNV
            for ci in range(len(self.cnvs)):
                cnv = self.cnvs[ci]
                if not (cnv.chr == snv.chr and cnv.start <= snv.end and cnv.end >= snv.start):
                    continue
                if cna_already_included.contains(transcript.gene):
                    continue
                cna_already_included.insert(transcript.gene)
                if high_impact_table:
                    self.cnv_high_impact_indices.setdefault(ci, set()).add(transcript.gene)
                tumor_af = _to_double(snv.annotations[i_tum_af])
                table.add_row(self.overlapping_cnv(cnv, transcript.gene, col_widths, tumor_af))

        # move overlapping CNVs to the end of variants of the same gene
        i = 2
        while i < len(table) - 1:
            content1 = table[i][1].format().content
            if (b"AMP" in content1 or b"DEL" in content1 or b"LOH" in content1):
                if table[i][0].format().content == table[i + 1][0].format().content:
                    table.swap_rows(i, i + 1)
            i += 1

        # merge cells with the same gene name (clvmgf/clvmrg)
        for r in range(2, len(table)):
            if table[r - 1][0].format().content == table[r][0].format().content:
                if not table[r - 1][0].control_word:
                    table[r - 1][0].control_word = b"clvmgf"
                table[r][0].control_word = b"clvmrg"
                if not table[r - 1][5].control_word:
                    table[r - 1][5].control_word = b"clvmgf"
                table[r][5].control_word = b"clvmrg"

        # add CNV rows (high-impact table only)
        if high_impact_table:
            cnv_rows: list[RtfTableRow] = []
            i_cnv_type = self.cnvs.annotation_index_by_name(b"cnv_type", True)
            tr = self.settings.target_region_filter
            for ci in range(len(self.cnvs)):
                cnv = self.cnvs[ci]
                cn = cnv.copy_number(self.cnvs.annotation_headers)
                if cn == 2:  # skip LOHs
                    continue
                if tr is not None and not tr["regions"].overlaps_with(
                        cnv.chr, cnv.start, cnv.end):
                    continue
                cnv_type = cnv.annotations[i_cnv_type]
                genes = _geneset_of(tr["genes"]).intersect(
                    _geneset_of(self.db.genes_overlapping(cnv.chr, cnv.start, cnv.end)))
                for gene in genes:
                    gene = gene.encode() if isinstance(gene, str) else gene
                    gene_role = self.db.get_somatic_gene_role(gene)
                    if gene_role is None:
                        continue
                    if not include_in_report(cn, cnv_type, gene_role):
                        continue
                    if not gene_role["high_evidence"]:
                        continue
                    if cna_already_included.contains(gene):
                        continue
                    if cn == 3:  # low-cn amps go into a text hint instead
                        self.skipped_amp.insert(gene)
                        continue

                    row = RtfTableRow()
                    row.add_cell(col_widths[0], gene, RtfParagraph().set_italic(True))
                    cn_statement = RtfText(cnv_type_description(cn, True))
                    cn_statement.append(RtfText(cnv.chr.str_normalized(True).encode())
                                        .set_font_size(14).rtf_code(), True)
                    if self.cnv_index_cytoband > -1:
                        cn_statement.append(RtfText(b"; " + self.cytoband(cnv))
                                            .set_font_size(14).rtf_code())
                    row.add_cell(col_widths[1], cn_statement.rtf_code())

                    cnv_type2 = cnv.annotations[self.cnv_index_cnv_type]
                    if b"focal" not in cnv_type2 and b"cluster" not in cnv_type2:
                        cnv_type2 = b"non-focal"
                    row.add_cell(col_widths[2], cnv_type2)
                    row.add_cell(
                        col_widths[3],
                        _fnum(_to_double(cnv.annotations[self.cnv_index_tumor_clonality]), 2),
                        RtfParagraph().set_horizontal_alignment(b"c"))
                    row.add_cell(col_widths[4], self.cnv_description(cnv, gene_role))
                    row.add_cell(col_widths[5], b", ".join(self.db.get_somatic_pathways(gene)))
                    cnv_rows.append(row)

                    self.ebm_genes.insert(gene)
                    self.cnv_high_impact_indices.setdefault(ci, set()).add(gene)

            cnv_rows.sort(key=lambda r: r[0].format().content)
            for row in cnv_rows:
                table.add_row(row)
        table.set_unique_border(1, b"brdrhair", 4)

        # table legend
        def b14(t, bold=False, italic=False):
            x = RtfText(t if isinstance(t, bytes) else t.encode()).set_font_size(14)
            if bold:
                x.set_bold(True)
            if italic:
                x.set_italic(True)
            return x.rtf_code()

        desc = b""
        desc += b14("Veränderung: ", bold=True)
        desc += b"Kodierende Position, " + b14(b"SNV", bold=True) + b" Punktmutationen " \
            + b14(b"(single nucleotide variant), ", italic=True)
        desc += b14(b"INDELs", bold=True) + b" Insertionen/Deletionen, " \
            + b14(b"CNV", bold=True) + b" Kopienzahlvariante, "
        desc += b14(b"AMP", bold=True) + b" Amplifikation, " + b14(b"DEL", bold=True) \
            + b" Deletion "
        desc += b14(b"LOH", bold=True) + " Kopienneutraler Verlust der Heterozygotie, ".encode() \
            + b14(b"WT", bold=True) + b" Wildtypallel, "
        desc += b14(b"MUT", bold=True) + b" Mutiertes Allel; "
        desc += b14(b"Typ:", bold=True) + " Art der SNV oder Größe und Ausdehnung der CNV: ".encode() \
            + b14(b"focal", bold=True) + b" ( bis zu 3 Gene), "
        desc += b14(b"Cluster", bold=True) + b" (weniger als 25% des Chromosomenarms) " \
            + b14(b"non-focal", bold=True) + b" (Chromosomenanteil); "
        desc += b14(b"Anteil:", bold=True) + (" Anteil der Allele mit der gelisteten Variante "
                                              "(SNV, INDEL) bzw. Anteil der Zellen mit der "
                                              "entsprechenden Kopienzahlvariante (CNV) in der "
                                              ).encode()
        desc += b"untersuchten Probe; "
        desc += b14(b"Beschreibung: ", bold=True)
        desc += ("Informationen aus Datenbanken (z.B. COSMIC, Cancerhotspots, Cancer Genome "
                 "Interpreter, PubMed, OnkoKB, ClinVar, OMIM, VarSome, LOVD, HGMD) zu der "
                 "Variante und funktionelle Daten werden integriert und die Onkogenität der "
                 "Veränderung wird nach ").encode() \
            + b14(b"Variant Interpretation for Cancer Consortium", italic=True) \
            + b" (VICC)-Richtlinien bewertet. In dieser Tabelle sind nur "
        desc += b"onkogene" if high_impact_table else b"unklare"
        desc += b" Ver\xc3\xa4nderungen dargestellt.".decode("utf-8").encode("utf-8")
        if len(self.filtered_germline_vl.variants) > 0 and high_impact_table:
            desc += b"\n\\line\n{\\super#} auch in der Normalprobe nachgewiesen."
        table.add_row(RtfTableRow(desc, self.doc.max_width(),
                                  RtfParagraph().set_font_size(14)
                                  .set_horizontal_alignment(b"j")))
        return table

    # ---- report parts ----------------------------------------------------

    def part_summary(self) -> bytes:
        """General genetic characteristics table (:1549-1723)."""
        rc = self.settings.report_config
        t = RtfTable()
        t.add_row(RtfTableRow(
            b"Allgemeine genetische Charakteristika ("
            + RtfText((self.settings.tumor_ps + "-" + self.settings.normal_ps).encode())
            .set_font_size(16).set_bold(False).rtf_code() + b")",
            self.doc.max_width(),
            RtfParagraph().set_horizontal_alignment(b"c").set_bold(True))
            .set_background_color(4).set_borders(1, b"brdrhair", 4))

        tumor_content_bioinf = b""
        if _meta_bool(rc, "tum_content_max_clonality"):
            tumor_content_bioinf = _fnum(get_cnv_max_tumor_clonality(self.cnvs) * 100.0, 0) + b" %"
        if _meta_bool(rc, "tum_content_max_af"):
            if tumor_content_bioinf != b"":
                tumor_content_bioinf += b", "
            tumor_content_bioinf += _fnum(self.get_tumor_content_by_snvs(), 1) + b" %"
        if not _meta_bool(rc, "tum_content_max_clonality") and not _meta_bool(rc, "tum_content_max_af"):
            tumor_content_bioinf = b"nicht bestimmbar"
        if _meta_bool(rc, "tum_content_estimated"):
            tumor_content_bioinf = b"ca. " + _inum(_meta_int(rc, "tum_content_estimated_value")) + b" %"

        tumor_content_hist = b"nicht bestimmbar"
        if _meta_bool(rc, "tum_content_hist"):
            tumor_content_hist = _fnum(self.histol_tumor_fraction, 0) + b" %"
        t.add_row(RtfTableRow([b"Tumoranteil (hist./molekular)",
                               tumor_content_hist + b" / " + tumor_content_bioinf],
                              [2500, 7421]).set_borders(1, b"brdrhair", 4))

        mutation_burden_text = RtfText(b"")
        if _meta_bool(rc, "include_mutation_burden"):
            mutation_burden_text.set_content(_gnum(self.mutation_burden) + b" Var/Mbp")
            if _meta_str(rc, "tmb_ref_text") != "":
                mutation_burden_text.append(b";")
                mutation_burden_text.append(
                    RtfText(b"Vergleichswerte: " + _meta_str(rc, "tmb_ref_text").encode())
                    .set_font_size(14).rtf_code(), True)
        else:
            mutation_burden_text.set_content(b"nicht bestimmbar")
        t.add_row(RtfTableRow([b"Mutationslast", mutation_burden_text.rtf_code()],
                              [2500, 7421]).set_borders(1, b"brdrhair", 4))
        t.last()[0].set_border(1, 1, 1, 0, b"brdrhair")
        t.last().last().set_border(1, 1, 1, 0, b"brdrhair")

        # MSI status
        if _meta_bool(rc, "msi_status"):
            msi_text = (b"kein Hinweis auf eine MSI" if self.msi_unstable_percent <= 10
                        else b"Hinweise auf MSI")
            t.add_row(RtfTableRow([b"Mikrosatelliten", msi_text], [2500, 7421])
                      .set_borders(1, b"brdrhair", 4))
        else:
            t.add_row(RtfTableRow([b"Mikrosatelliten", b"nicht bestimmbar"], [2500, 7421])
                      .set_borders(1, b"brdrhair", 4))

        # fusion/SV status
        if len(self.svs) > 0:
            if len(self.svs) == 1:
                sv_text = b"Hinweise auf eine wahrscheinlich onkogene Strukturvariante"
            else:
                sv_text = b"Hinweise auf wahrscheinlich onkogene Strukturvarianten"
            t.add_row(RtfTableRow([b"Fusionen/Strukturvarianten", RtfText(sv_text).rtf_code()],
                                  [2500, 7421]).set_borders(1, b"brdrhair", 4))
        else:
            t.add_row(RtfTableRow([b"Fusionen/Strukturvarianten", b"nicht nachgewiesen"],
                                  [2500, 7421]).set_borders(1, b"brdrhair", 4))

        # virus DNA status
        virus_names: list[bytes] = []
        for virus in self.validated_viruses:
            if virus.virus_name() not in virus_names:
                virus_names.append(virus.virus_name())
        t.add_row(RtfTableRow(
            [b"Virus-DNA", (b"Hinweise auf " + b", ".join(virus_names) if virus_names
                            else b"nicht nachgewiesen")],
            [2500, 7421]).set_borders(1, b"brdrhair", 4))

        # CNV burden
        if _meta_bool(rc, "cnv_burden"):
            pct = cnv_burden(self.cnvs)
            if pct >= 0.01:
                text_cnv_burden = _fnum(pct, 0) + b" %"
            else:
                text_cnv_burden = (b"CNVs aufgrund des niedrigen Tumorgehaltes "
                                   b"nicht/eingeschr\xc3\xa4nkt bestimmbar"
                                   ).decode("utf-8").encode("utf-8")
            t.add_row(RtfTableRow([b"CNV-Last", text_cnv_burden], [2500, 7421], RtfParagraph())
                      .set_borders(1, b"brdrhair", 4))

        # HRD score
        hrd_statement = _meta_str(rc, "hrd_statement")
        if hrd_statement != "undeterminable":
            hrd_text = trans(hrd_statement).encode()
            hrd_score = (_meta_int(rc, "cnv_loh_count") + _meta_int(rc, "cnv_tai_count")
                         + _meta_int(rc, "cnv_lst_count"))
            hrd_text += RtfText(
                b"\n\\line\nHRD-Score chromosomale Ver\xc3\xa4nderungen: ".decode("utf-8").encode("utf-8")
                + _inum(hrd_score) + b" (HRD bei \\u8805; 42)").set_font_size(14).rtf_code()
            t.add_row(RtfTableRow([b"HRD-Score", hrd_text], [2500, 7421], RtfParagraph())
                      .set_borders(1, b"brdrhair", 4))
        else:
            t.add_row(RtfTableRow([b"HRD-Score", b"nicht bestimmbar"], [2500, 7421],
                                  RtfParagraph()).set_borders(1, b"brdrhair", 4))

        # quality comments incl. low-AF accreditation note
        quality_comments = _quality_list(rc)
        i_tum_af = self.somatic_vl.annotation_index("tumor_af")
        for v in self.somatic_vl.variants:
            if _to_double(v.annotations[i_tum_af]) < 0.05:
                quality_comments.append(
                    "Durch die Senkung des Detektionslimits auf 1% Allelfraktion konnten "
                    "somatische Varianten nachgewiesen werden. Die Detektion von Varianten "
                    "mit einer Allelfraktion von unter 5% ist nicht Teil des "
                    "Akkreditierungsumfangs.")
                break
        if quality_comments:
            translated = [trans(q) for q in quality_comments
                          if q != "no abnormalities" and q.strip() != ""]
            if translated:
                t.add_row(RtfTableRow([b"Anmerkungen", ", ".join(translated).encode()],
                                      [2500, 7421], RtfParagraph())
                          .set_borders(1, b"brdrhair", 4))

        def b14(txt, bold=False):
            x = RtfText(txt if isinstance(txt, bytes) else txt.encode()).set_font_size(14)
            if bold:
                x.set_bold(True)
            return x.rtf_code()

        desc = b""
        desc += b14("Tumoranteil", bold=True) + (
            " (hist.): Von der Pathologie mitgeteilt; (molekular): Die Berechnung des "
            "Tumoranteils beruht auf dem Anteil der nachgewiesenen SNVs oder CNVs. ").encode()
        desc += b14("Mutationslast:", bold=True) + (
            " Anzahl der Varianten in den kodierenden untersuchten Genen normiert auf eine "
            "Million Basenpaare; ").encode()
        desc += b14("Mikrosatelliten:", bold=True) + \
            " Bewertung der Mikrosatelliteninstabilität; ".encode()
        desc += b14("CNV-Last:", bold=True) + (
            " Anteil des Genoms, bei dem die Kopienzahl verändert ist. ").encode()
        desc += b14("HRD:", bold=True) + " Homologe Rekombinations-Defizienz.".encode()
        t.add_row(RtfTableRow(desc, self.doc.max_width(),
                              RtfParagraph().set_font_size(14).set_horizontal_alignment(b"j"))
                  .set_borders(0))
        return t.rtf_code()

    def part_relevant_variants(self) -> bytes:
        """Relevant somatic variants incl. HLA + limitations notes (:1768-1909)."""
        out: list[bytes] = []

        # hint in case of unclassified variants
        i_som_vicc = self.somatic_vl.annotation_index("NGSD_som_vicc_interpretation")
        unclassified_snvs = any(v.annotations[i_som_vicc].strip() == b""
                                for v in self.somatic_vl.variants)
        if unclassified_snvs:
            out.append(RtfParagraph((
                "In der Tumorprobe wurde eine hohe Zahl somatischer Veränderungen "
                "nachgewiesen. Eine Variantenbewertung erfolgte für bekannte Treiber. "
                "Weitere Varianten werden im Anhang gelistet. Auf Wunsch kann die Bewertung "
                "ausgewählter Varianten aus dieser Liste ergänzt werden. Bitte nehmen Sie "
                "hierfür bei Bedarf Kontakt mit uns auf.").encode())
                .set_font_size(18).set_indent(0, 0, 0).set_space_after(30).set_space_before(30)
                .set_horizontal_alignment(b"j").set_line_spacing(276).highlight(3).rtf_code())
            out.append(RtfParagraph(b"").set_font_size(18).set_indent(0, 0, 0)
                       .set_space_after(30).set_space_before(30)
                       .set_horizontal_alignment(b"j").set_line_spacing(276).rtf_code())

        out.append(RtfParagraph(b"Potentiell relevante somatische Ver\xc3\xa4nderungen:"
                                .decode("utf-8").encode("utf-8"))
                   .set_bold(True).set_indent(0, 0, 0).set_space_before(250).rtf_code())
        out.append(self.snv_table(self.somatic_vl_high_impact_indices, True).rtf_code())
        out.append(RtfParagraph(b"").rtf_code())

        if len(self.skipped_amp) > 0:
            text = ("Weiterhin wurden nicht-fokale Amplifikationen (3 Kopien) für die "
                    "folgenden relevanten Gene nachgewiesen: ").encode()
            genes = sorted(g if isinstance(g, bytes) else g.encode()
                           for g in self.skipped_amp)
            text += RtfText(b", ".join(genes)).set_font_size(18).set_italic(True).rtf_code()
            text += b"."
            out.append(RtfParagraph(text).set_font_size(18).set_indent(0, 0, 0)
                       .set_space_after(30).set_space_before(30)
                       .set_horizontal_alignment(b"j").set_line_spacing(276).rtf_code())
            out.append(RtfParagraph(b"").set_indent(0, 0, 0).set_space_after(30)
                       .set_space_before(30).set_line_spacing(276).set_font_size(18).rtf_code())

        if len(self.svs) > 0:
            idx_desc = self.svs.annotation_index_by_name(b"DESCRIPTION")
            sv_expl = RtfText(b"Es gibt Hinweise auf wahrscheinlich onkogene "
                              b"Strukturvarianten (s. Anlage):").set_bold(True).rtf_code()
            for i in range(len(self.svs)):
                sv_expl += b"\n\\line\n" + self.svs[i].annotations[idx_desc]
            out.append(RtfParagraph(sv_expl).set_font_size(18).set_indent(0, 0, 0)
                       .set_space_after(30).set_space_before(30)
                       .set_horizontal_alignment(b"j").set_line_spacing(276).rtf_code())
            out.append(RtfParagraph(b"").set_indent(0, 0, 0).set_space_after(30)
                       .set_space_before(30).set_line_spacing(276).set_font_size(18).rtf_code())

        # HLA note
        tumor_hla = SomaticHlaInfo(self.get_hla_filepath(self.settings.tumor_ps))
        normal_hla = SomaticHlaInfo(self.get_hla_filepath(self.settings.normal_ps))
        nb = b"nicht bestimmbar"
        normal_a1 = normal_hla.get_gene_allele(b"HLA-A", True) if normal_hla.is_valid() else nb
        normal_a2 = normal_hla.get_gene_allele(b"HLA-A", False) if normal_hla.is_valid() else nb
        tumor_a1 = tumor_hla.get_gene_allele(b"HLA-A", True) if tumor_hla.is_valid() else nb
        tumor_a2 = tumor_hla.get_gene_allele(b"HLA-A", False) if tumor_hla.is_valid() else nb
        target = b"HLA-A*02:01"
        if target in (normal_a1, normal_a2, tumor_a1, tumor_a2):
            desc = b""
            in_normal = target in (normal_a1, normal_a2)
            in_tumor = target in (tumor_a1, tumor_a2)
            if in_normal and in_tumor:
                desc += RtfText(b"Unsere Daten weisen auf das Vorliegen des Haplotyps "
                                b"HLA-A*02:01 in Tumor- und Normalprobe hin (s. Anlage)."
                                ).rtf_code()
            elif in_normal:
                desc += RtfText(b"Unsere Daten weisen auf das Vorliegen des Haplotyps "
                                b"HLA-A*02:01 in der Normalprobe hin, jedoch ist er in der "
                                b"Tumorprobe deletiert (s. Anlage).").rtf_code()
            elif in_tumor:
                desc += RtfText(b"Unsere Daten weisen auf das Vorliegen des Haplotyps "
                                b"HLA-A*02:01 in der Tumorprobe, jedoch nicht in der "
                                b"Normalprobe, hin (s. Anlage).").rtf_code()

            if tumor_hla.is_valid() and target in (tumor_hla.get_gene_allele(b"HLA-A", True),
                                                   tumor_hla.get_gene_allele(b"HLA-A", False)):
                cnv_type = b""
                for i in range(len(self.cnvs)):
                    cnv = self.cnvs[i]
                    if b"HLA-A" in list(cnv.genes):
                        cnv_type = cnv_type_description(
                            cnv.copy_number(self.cnvs.annotation_headers), True) \
                            .replace(b"(", b"").replace(b")", b"")
                        break
                if cnv_type != b"":
                    depth1 = float(tumor_hla.get_gene_allele_depth(b"HLA-A", True))
                    depth2 = float(tumor_hla.get_gene_allele_depth(b"HLA-A", False))
                    rel1 = depth1 / (depth1 + depth2)
                    rel2 = depth2 / (depth1 + depth2)
                    desc += RtfText(b" Es liegt eine Kopienzahlver\xc3\xa4nderung ("
                                    .decode("utf-8").encode("utf-8") + cnv_type
                                    + b") im HLA-A Genlokus der Tumorprobe vor. ").rtf_code()
                    desc += RtfText(
                        b"Das Allel A*02:01 ist im Tumorgewebe "
                        + RtfText(b"deletiert amplifiziert").highlight(3).rtf_code() + b". "
                        + RtfText(b"(" + tumor_a1 + b" Freq " + _fnum(rel1, 2) + b" | "
                                  + tumor_a2 + b" Freq " + _fnum(rel2, 2) + b") ")
                        .highlight(4).rtf_code()).rtf_code()
                    desc += RtfText(b"Ein Verlust des Allels A*02:01 im Tumorgewebe ist "
                                    b"nicht beurteilbar.").highlight(3).rtf_code()
            out.append(RtfParagraph(desc).set_font_size(18).set_indent(0, 0, 0)
                       .set_space_after(30).set_space_before(30)
                       .set_horizontal_alignment(b"j").set_line_spacing(276).rtf_code())
        else:
            out.append(RtfParagraph(
                b"Unsere Daten weisen " + RtfText(b"nicht").set_bold(True).rtf_code()
                + b" auf das Vorliegen des Haplotyps HLA-A*02:01 in Tumor und Normalgewebe "
                b"hin (s. Anlage).").set_font_size(18).set_indent(0, 0, 0)
                .set_space_after(30).set_space_before(30)
                .set_horizontal_alignment(b"j").set_line_spacing(276).rtf_code())

        out.append(RtfParagraph(b"").set_indent(0, 0, 0).set_space_after(30)
                   .set_space_before(30).set_line_spacing(276).set_font_size(18).rtf_code())

        limitations_expl = RtfText(b"Limitationen: ").set_bold(True).set_font_size(18).rtf_code()
        limitations = _meta_str(self.settings.report_config, "limitations")
        if not limitations:
            limitations_expl += (b"Die Probenqualit\xc3\xa4t zeigt keine Auff\xc3\xa4lligkeiten. "
                                 b"Methodisch bedingte Limitationen sind im Anhang erl\xc3\xa4utert."
                                 ).decode("utf-8").encode("utf-8")
        else:
            limitations_expl += limitations.replace("\n", "\n\\line\n").encode()
        out.append(RtfParagraph(limitations_expl).set_font_size(18).set_indent(0, 0, 0)
                   .set_space_after(30).set_space_before(30).set_line_spacing(276)
                   .set_horizontal_alignment(b"j").rtf_code())
        return b"\n".join(out)

    def part_unclear_variants(self) -> bytes:
        """(:1759-1765)."""
        out = RtfParagraph(b"Varianten unklarer Onkogenit\xc3\xa4t:".decode("utf-8").encode("utf-8")) \
            .set_bold(True).set_indent(0, 0, 0).set_space_before(250).rtf_code()
        out += self.snv_table(self.somatic_vl_low_impact_indices, False).rtf_code()
        return out

    def part_cnv_table(self) -> bytes:
        """Chromosomal aberrations table (:222-322)."""
        output = b""
        t = RtfTable()
        t.add_row(RtfTableRow(b"Chromosomale Aberrationen", self.doc.max_width(),
                              RtfParagraph().set_horizontal_alignment(b"c").set_bold(True)
                              .set_font_size(18)).set_background_color(4).set_header())
        t.add_row(RtfTableRow([b"Position", b"CNV", b"Typ", b"CN", b"Anteil", b"Gene"],
                              [1800, 900, 900, 400, 800, 5121],
                              RtfParagraph().set_horizontal_alignment(b"c").set_font_size(16)
                              .set_bold(True)).set_header())

        if len(self.cnvs) == 0:
            t.remove_row(1)
            limits = _meta_str(self.settings.report_config, "limitations")
            if ("Tumorgehalt niedrig" in limits or "niedrigem Anteil an Tumorzellen" in limits
                    or "geringen Tumorgehaltes" in limits):
                t.add_row(RtfTableRow(
                    b"CNV waren aufgrund des niedrigen Tumorgehaltes nicht bestimmbar.",
                    self.doc.max_width()))
            else:
                t.add_row(RtfTableRow(b"Es wurden keine CNVs gefunden.", self.doc.max_width()))
            t.set_unique_border(1, b"brdrhair", 4)
            return t.rtf_code()

        if self.cnv_index_tumor_clonality < 0:
            t.add_row(RtfTableRow(
                ("Die ClinCNV-Datei enthält keine Tumor Clonality. Bitte mit einer "
                 "aktuelleren Version von ClinCNV neu berechnen.").encode(),
                self.doc.max_width()))
            t.set_unique_border(1, b"brdrhair", 4)
            return t.rtf_code()

        tr = self.settings.target_region_filter
        for i in range(len(self.cnvs)):
            cnv = self.cnvs[i]
            if tr is not None and not tr["regions"].overlaps_with(cnv.chr, cnv.start, cnv.end):
                continue
            if len(list(cnv.genes)) == 0:
                continue
            genes = _geneset_of(tr["genes"]).intersect(
                self.db.genes_overlapping(cnv.chr, cnv.start, cnv.end)) if tr is not None \
                else GeneSet()
            genes = sorted(g if isinstance(g, bytes) else g.encode() for g in genes)
            if len(genes) == 0:
                continue

            row = RtfTableRow()
            coords = [RtfText(cnv.chr.str.encode() if isinstance(cnv.chr.str, str)
                              else cnv.chr.str).set_font_size(14).rtf_code(),
                      RtfText(_inum(1 if cnv.start == 0 else cnv.start) + b" - "
                              + _inum(cnv.end)).set_font_size(12).rtf_code()]
            row.add_cell(1800, coords)

            size_mb = (cnv.end - cnv.start) / 1000000.0
            var_length = b"<0.1 MB" if size_mb < 0.1 else _fnum(size_mb, 1) + b" MB"
            cnv_desc = [RtfText(cnv_type_description(
                cnv.copy_number(self.cnvs.annotation_headers), False))
                .set_font_size(14).rtf_code(),
                RtfText(b"(" + var_length + b")").set_font_size(12).rtf_code()]
            row.add_cell(900, cnv_desc, RtfParagraph().set_horizontal_alignment(b"c"))

            type_statement = cnv.annotations[self.cnv_index_cnv_type]
            type_statement = type_statement.replace(b"chromosome", b"chr")
            type_statement += b"\n\\line" + RtfText(self.cytoband(cnv)).set_font_size(12).rtf_code()
            row.add_cell(900, type_statement,
                         RtfParagraph().set_horizontal_alignment(b"c").set_font_size(14))

            row.add_cell(400, _inum(cnv.copy_number(self.cnvs.annotation_headers)),
                         RtfParagraph().set_font_size(14).set_horizontal_alignment(b"c"))
            row.add_cell(800, _fnum(_to_double(cnv.annotations[self.cnv_index_tumor_clonality]), 2),
                         RtfParagraph().set_horizontal_alignment(b"c").set_font_size(14))
            row.add_cell(5121, b", ".join(genes),
                         RtfParagraph().set_italic(True).set_font_size(14))
            t.add_row(row)
        t.set_unique_border(1, b"brdrhair", 4)
        output += t.rtf_code()

        def b14(txt, bold=False):
            x = RtfText(txt if isinstance(txt, bytes) else txt.encode()).set_font_size(14)
            if bold:
                x.set_bold(True)
            return x.rtf_code()

        desc = b14(b"CNV:", bold=True) + b14(" Kopienzahlvariante, ")
        desc += b14(b"AMP:", bold=True) + b14(" Amplifikation, ")
        desc += b14(b"DEL:", bold=True) + b14(" Deletion, ")
        desc += b14(b"LOH:", bold=True) + b14(" Kopienzahlneutraler Verlust der Heterozygotie, ")
        desc += b14(b"CN:", bold=True) + b14(" Copy Number, ")
        desc += b14(b"Anteil:", bold=True) + b14(
            " Anteil der Zellen mit der entsprechenden Kopienzahlvariante in der "
            "untersuchten Probe.")
        output += RtfParagraph(desc).set_horizontal_alignment(b"j").rtf_code()
        return output

    def part_fusions(self) -> bytes:
        """Structural variants table (:1725-1757)."""
        from ..io.bedpe import type_to_full_string
        t = RtfTable()
        t.add_row(RtfTableRow(b"Strukturvarianten", self.doc.max_width(),
                              RtfParagraph().set_bold(True).set_horizontal_alignment(b"c"))
                  .set_header().set_background_color(4))
        if len(self.svs) == 0:
            t.add_row(RtfTableRow(b"Nicht nachgewiesen", self.doc.max_width()))
            t.set_unique_border(1, b"brdrhair", 4)
            return t.rtf_code()

        t.add_row(RtfTableRow([b"Variante", b"Genomische Bruchpunkte", b"Beschreibung"],
                              [1700, 3000, 5221],
                              RtfParagraph().set_bold(True).set_horizontal_alignment(b"c")
                              .set_font_size(16)).set_header())
        idx_desc = self.svs.annotation_index_by_name(b"DESCRIPTION")
        idx_genes_a = self.svs.annotation_index_by_name(b"GENES_BREAKPOINT_A")
        idx_genes_b = self.svs.annotation_index_by_name(b"GENES_BREAKPOINT_B")
        idx_start = self.svs.annotation_index_by_name(b"START_POS_REPORT")
        idx_end = self.svs.annotation_index_by_name(b"END_POS_REPORT")
        for i in range(len(self.svs)):
            sv = self.svs[i]
            genes_a = sv.annotations[idx_genes_a] or b"intergenisch"
            genes_b = sv.annotations[idx_genes_b] or b"intergenisch"
            t.add_row(RtfTableRow(
                [trans(type_to_full_string(sv.type)),
                 genes_a + b"\n\\line\n"
                 + RtfText(sv.annotations[idx_start]).set_font_size(12).rtf_code(),
                 genes_b + b"\n\\line\n"
                 + RtfText(sv.annotations[idx_end]).set_font_size(12).rtf_code(),
                 b"Wahrscheinlich onkogen\n\\line\n" + sv.annotations[idx_desc]],
                [1700, 1500, 1500, 5221], RtfParagraph().set_font_size(16)))
        t.set_unique_border(1, b"brdrhair", 4)
        t.add_row(RtfTableRow(
            ("Die aufgeführte Bruchpunkte stellen aus den NGS Daten abgeleitete "
             "Näherungswerte und wenn vorhanden die Gennamen dar.").encode(),
            self.doc.max_width(), RtfParagraph().set_font_size(14)))
        return t.rtf_code()

    def part_virus_table(self) -> bytes:
        """(:701-734)."""
        t = RtfTable()
        t.add_row(RtfTableRow(b"Virale DNA", self.doc.max_width(),
                              RtfParagraph().set_bold(True).set_horizontal_alignment(b"c"))
                  .set_background_color(4))
        t.add_row(RtfTableRow([b"Virus", b"Gen", b"Genom", b"Region", b"Abdeckung", b"Bewertung"],
                              [1000, 1000, 2000, 1921, 2000, 2000],
                              RtfParagraph().set_bold(True)))
        for virus in self.validated_viruses:
            row = RtfTableRow()
            if virus.idendity >= 90:
                row.add_cell(1000, virus.virus_name())
            else:
                row.add_cell(1000, RtfText(virus.virus_name()).highlight(3).rtf_code())
            row.add_cell(1000, virus.virus_gene())
            row.add_cell(2000, virus.chr)
            row.add_cell(1921, _inum(virus.start) + b"-" + _inum(virus.end))
            row.add_cell(2000, _fnum(virus.coverage, 1))
            row.add_cell(2000, b"nachgewiesen*")
            t.add_row(row)
        t.set_unique_border(1, b"brdrhair", 4)
        t.add_row(RtfTableRow(
            ("*Wir empfehlen eine Bestätigung des nachgewiesenen Onkovirus mit einer "
             "validierten Methode, beispielsweise am Institut für Medizinische Virologie "
             "und Epidemiologie der Viruskrankheiten Tübingen.").encode(),
            self.doc.max_width(), RtfParagraph().set_space_before(50).set_font_size(14)))
        t.last().set_borders(0)
        return t.rtf_code()

    def part_igv_screenshot(self) -> bytes:
        """(:736-745)."""
        if not self.settings.igv_snapshot_png_hex_image:
            return b""
        snapshot = RtfPicture(self.settings.igv_snapshot_png_hex_image,
                              self.settings.igv_snapshot_width,
                              self.settings.igv_snapshot_height)
        snapshot.resize_to_width(self.doc.max_width())
        return snapshot.rtf_code()

    def part_pharmaco_genetics(self) -> bytes:
        """Pharmacogenetically relevant polymorphisms (:747-854)."""
        t = RtfTable()
        i_dbsnp = _ann_idx(self.germline_vl, "dbSNP")
        i_co_sp = _ann_idx(self.germline_vl, "coding_and_splicing")
        genotype_cols = self.germline_vl.sample_columns(True)
        i_genotype = genotype_cols[0] if genotype_cols else -1

        for snv in self.germline_vl.variants:
            for key, values in _PHARMACOGENETIC_SNPS:
                if key not in snv.annotations[i_dbsnp]:
                    continue
                for relevance, drugs in values:
                    row = RtfTableRow()
                    trans_ann = self.germline_vl.transcript_annotations(snv, i_co_sp)[0]
                    if key in _PHARMACO_HIGHLIGHT:
                        row.add_cell(1200, snv.annotations[i_dbsnp],
                                     RtfParagraph().set_font_size(14).highlight(3))
                    else:
                        row.add_cell(1200, snv.annotations[i_dbsnp],
                                     RtfParagraph().set_font_size(14))

                    if trans_ann.gene:
                        row.add_cell(800, trans_ann.gene,
                                     RtfParagraph().set_font_size(14).set_italic(True))
                    elif key == b"rs12248560":  # no VEP gene; CYP2C19 needed here
                        row.add_cell(800, b"CYP2C19",
                                     RtfParagraph().set_font_size(14).set_italic(True))
                    else:
                        row.add_cell(800, b"n/a",
                                     RtfParagraph().set_font_size(14).set_italic(True))

                    if trans_ann.hgvs_c and trans_ann.hgvs_p:
                        row.add_cell(1800, trans_ann.hgvs_c + b", " + trans_ann.hgvs_p,
                                     RtfParagraph().set_font_size(14))
                    else:  # genomic position if no AA change available
                        row.add_cell(1800, b"g." + _inum(snv.start) + snv.ref + b">" + snv.obs,
                                     RtfParagraph().set_font_size(14))

                    row.add_cell(800, snv.annotations[i_genotype],
                                 RtfParagraph().set_font_size(14))
                    row.add_cell(1300, relevance, RtfParagraph().set_font_size(14))
                    row.add_cell(4021, drugs, RtfParagraph().set_font_size(14))
                    t.add_row(row)

        if len(t) != 0:
            t.prepend_row(RtfTableRow(
                [b"RS-Nummer", b"Gen", b"Ver\xc3\xa4nderung".decode("utf-8").encode("utf-8"),
                 b"Genotyp", b"Relevanz", b"Assoziierte Stoffe"],
                [1200, 800, 1800, 800, 1300, 4021],
                RtfParagraph().set_bold(True).set_horizontal_alignment(b"c").set_font_size(16))
                .set_header())
            t.prepend_row(RtfTableRow(b"Pharmakogenetisch relevante Polymorphismen",
                                      self.doc.max_width(),
                                      RtfParagraph().set_bold(True)
                                      .set_horizontal_alignment(b"c"))
                          .set_background_color(4).set_header())
            t.set_unique_border(1, b"brdrhair", 4)
            t.add_row(RtfTableRow(
                b"N\xc3\xa4here Informationen erhalten Sie aus der Datenbank pharmGKB "
                b"(https://www.pharmgkb.org)".decode("utf-8").encode("utf-8"),
                self.doc.max_width(), RtfParagraph().set_font_size(14)))
        else:
            t.add_row(RtfTableRow(b"Nicht nachgewiesen", self.doc.max_width()))
            t.prepend_row(RtfTableRow(b"Pharmakogenetisch relevante Polymorphismen",
                                      self.doc.max_width(),
                                      RtfParagraph().set_bold(True)
                                      .set_horizontal_alignment(b"c"))
                          .set_background_color(4).set_header())
            t.set_unique_border(1, b"brdrhair", 4)
        return t.rtf_code()

    def part_meta_data(self) -> bytes:
        """General information / QC metadata (:578-699)."""
        out = RtfParagraph(b"Allgemeine Informationen").set_bold(True).rtf_code()
        w = [2000, 1480, 1480, 1480, 3481]
        m = RtfTable()

        def qc(coll, accession, suffix=b""):
            try:
                return coll.value(accession, True).to_string().encode() + suffix
            except Exception:
                return None

        m.add_row(RtfTableRow(
            [b"", RtfText(b"Tumor").set_font_size(14).set_underline(True).rtf_code(),
             RtfText(b"Normal").set_font_size(14).set_underline(True).rtf_code(), b"", b""],
            w, RtfParagraph().set_font_size(14)))
        m.add_row(RtfTableRow(
            [b"Proben-ID", self.settings.tumor_ps.encode(), self.settings.normal_ps.encode(),
             b"Prozessierungssystem:", str(self.processing_system_data["name"]).encode()],
            w, RtfParagraph().set_font_size(14)))

        panel_header = b""
        panel_desc = b""
        tr = self.settings.target_region_filter
        if tr is not None and tr["name"] != "":
            panel_header = b"Genpanel:"
            panel_size = _fnum(tr["regions"].base_count() / 1000000.0, 2)
            panel_desc = tr["name"].encode() + b"\n\\line\n(" + panel_size \
                + b" MB, Gennamen s. letzte Seite)"

        m.add_row(RtfTableRow(
            [b"Durchschnittliche Tiefe:", qc(self.tumor_qcml_data, "QC:2000025", b"x"),
             qc(self.normal_qcml_data, "QC:2000025", b"x"), panel_header, panel_desc], w))

        tum_depth_no_ol = qc(self.tumor_qcml_data, "QC:2000150", b"x")
        nor_depth_no_ol = qc(self.normal_qcml_data, "QC:2000150", b"x")
        if tum_depth_no_ol is None or nor_depth_no_ol is None:
            tum_depth_no_ol = nor_depth_no_ol = b"n/a"
        m.add_row(RtfTableRow(
            [b"Durchschnittliche Tiefe ohne Read \xc3\x9cberlapp:".decode("utf-8").encode("utf-8"),
             tum_depth_no_ol, nor_depth_no_ol, b"Auswertungsdatum:",
             _evaluation_date_str(self.settings.report_config)], w))
        m.add_row(RtfTableRow(
            [b"Durchschnittliche Insert size:", qc(self.tumor_qcml_data, "QC:2000023"),
             qc(self.normal_qcml_data, "QC:2000023"), b"Analysepipeline:",
             self.somatic_vl.pipeline().encode()], w))

        tum_panel_depth = qc(self.tumor_qcml_data, "QC:2000097", b"x")
        nor_panel_depth = qc(self.normal_qcml_data, "QC:2000097", b"x")
        if tum_panel_depth is None or nor_panel_depth is None:
            tum_panel_depth = nor_panel_depth = b"n/a"
        m.add_row(RtfTableRow(
            [b"Durchschnittliche Tiefe Genpanel:", tum_panel_depth, nor_panel_depth,
             b"Auswertungssoftware:",
             (APPLICATION_NAME + " " + APPLICATION_VERSION).encode()], w))

        tum_cov_60x = qc(self.tumor_qcml_data, "QC:2000099", b"%") or b"n/a"
        m.add_row(RtfTableRow([b"Coverage 60x:", tum_cov_60x, b"", b"", b""], w))

        tum_panel_cov_60x = qc(self.tumor_qcml_data, "QC:2000098", b"%") or b"n/a"

        oncotree_codes = [info.encode() for (_t, info) in self.db.get_sample_disease_info(
            self.db.sample_id(self.settings.tumor_ps), "Oncotree code")]
        icd10_label = b"ICD10:"
        icd10 = self.settings.icd10.encode()
        if oncotree_codes:
            icd10_label = b"ICD10, Oncotree:"
            icd10 = self.settings.icd10.encode() + b", " + b", ".join(oncotree_codes)
        m.add_row(RtfTableRow([b"Coverage Genpanel 60x:", tum_panel_cov_60x, b"",
                               icd10_label, icd10], w))

        nor_panel_cov_20x = qc(self.normal_qcml_data, "QC:2000091", b"%") or b"n/a"
        nor_cov_20x = qc(self.normal_qcml_data, "QC:2000027", b"%") or b"n/a"

        rc = self.settings.report_config
        msi_text = (b"n/a" if (math.isnan(self.msi_unstable_percent)
                               or not _meta_bool(rc, "msi_status"))
                    else _fnum(self.msi_unstable_percent, 2) + b"%")
        m.add_row(RtfTableRow([b"Coverage 20x:", b"", nor_cov_20x, b"MSI-Score:", msi_text], w))
        ploidy = float(rc.meta.get("ploidy") or 0)
        ploidy_text = b"n/a" if ploidy == 0 else _fnum(ploidy, 3)
        m.add_row(RtfTableRow([b"Coverage Genpanel 20x:", b"", nor_panel_cov_20x,
                               b"Tumor-Ploidie:", ploidy_text], w))

        m.add_row(RtfTableRow(
            ("In Regionen mit einer Abdeckung >60 können somatische Varianten mit einer "
             "Frequenz >10% im Tumorgewebe mit einer Sensitivität >95.0% und einem Positive "
             "Prediction Value PPW >99% bestimmt werden. Für mindestens 95% aller "
             "untersuchten Gene kann die Kopienzahl korrekt unter diesen Bedingungen "
             "bestimmt werden.").encode(), self.doc.max_width()))
        m.set_unique_font_size(14)
        return out + m.rtf_code()

    def get_hla_filepath(self, ps_name: str) -> str:
        """(:1157-1192) — local (non client-server) resolution only."""
        hla_file = self.db.processed_sample_path(
            self.db.processed_sample_id(ps_name), "HLA_GENOTYPER")
        if not hla_file:
            raise ValueError(f"hla file for the processed sample '{ps_name}' was not found!")
        return hla_file

    def hla_table(self, ps_tumor: str, ps_normal: str) -> RtfTable:
        """(:1195-1218)."""
        tumor_hla = SomaticHlaInfo(self.get_hla_filepath(ps_tumor))
        normal_hla = SomaticHlaInfo(self.get_hla_filepath(ps_normal))

        t = RtfTable()
        t.add_titel_row([b"HLA"], [self.doc.max_width()])
        t.add_header_row([b"Gene", b"Blut (" + ps_normal.encode() + b")",
                          b"Tumor (" + ps_tumor.encode() + b")"], [1522, 4200, 4200])
        nb = b"nicht bestimmbar"
        for gene in (b"HLA-A", b"HLA-B", b"HLA-C"):
            normal_a1 = normal_hla.get_gene_allele(gene, True) if normal_hla.is_valid() else nb
            normal_a2 = normal_hla.get_gene_allele(gene, False) if normal_hla.is_valid() else nb
            tumor_a1 = tumor_hla.get_gene_allele(gene, True) if tumor_hla.is_valid() else nb
            tumor_a2 = tumor_hla.get_gene_allele(gene, False) if tumor_hla.is_valid() else nb
            t.add_data_row([gene, normal_a1, normal_a2, tumor_a1, tumor_a2],
                           [1522, 2100, 2100, 2100, 2100])
        t.set_unique_border(1, b"brdrhair", 4)
        return t

    def part_pathways(self) -> bytes:
        """Molecular pathway summary (:1918-2122)."""
        i_som_rep_alt = _ann_idx(self.somatic_vl, "alt_var_alteration")
        pathways = self.db.get_somatic_pathways()

        t = RtfTable()
        t.add_row(RtfTableRow(b"Informationen zu molekularen Signalwegen",
                              self.doc.max_width(),
                              RtfParagraph().set_bold(True).set_horizontal_alignment(b"c"))
                  .set_background_color(4).set_header())

        germline_i_co_sp = self.filtered_germline_vl.annotation_index("coding_and_splicing")
        germline_i_class = self.filtered_germline_vl.annotation_index("classification")
        idx_genes_a = self.svs.annotation_index_by_name(b"GENES_BREAKPOINT_A")
        idx_genes_b = self.svs.annotation_index_by_name(b"GENES_BREAKPOINT_B")
        i_vicc = self.somatic_vl.annotation_index("NGSD_som_vicc_interpretation")

        for i in range(0, len(pathways), 4):
            headers: list[bytes] = []
            contents: list[bytes] = []
            for j in range(i, i + 4):
                if j >= len(pathways):
                    headers.append(b"")
                    contents.append(b"")
                    continue
                pathway = pathways[j]
                headers.append(pathway)
                entries: list[tuple[bytes, bytes, bool]] = []  # (gene, alteration, highlight)
                genes_pathway = self.db.get_somatic_pathway_genes(pathway)

                # germline variants
                for var in self.filtered_germline_vl.variants:
                    transcript = select_somatic_transcript(
                        self.db, self.filtered_germline_vl.transcript_annotations(
                            var, germline_i_co_sp))
                    if not genes_pathway.contains(transcript.gene):
                        continue
                    variant_text = b""
                    if transcript.hgvs_p.strip() and transcript.hgvs_p.strip() != b"p.?":
                        variant_text = transcript.hgvs_p
                    elif transcript.hgvs_c.strip():
                        variant_text = transcript.hgvs_c
                    highlight = var.annotations[germline_i_class] in (b"4", b"5")
                    entries.append((transcript.gene,
                                    variant_text or RtfText(b"???").highlight(3).rtf_code(),
                                    highlight))

                # somatic variants
                for var in self.somatic_vl.variants:
                    transcript = select_somatic_transcript(
                        self.db, self.somatic_vl.transcript_annotations(
                            var, self.snv_index_coding_splicing))
                    if not genes_pathway.contains(transcript.gene):
                        continue
                    variant_text = b""
                    if i_som_rep_alt > -1 and var.annotations[i_som_rep_alt].strip():
                        variant_text = var.annotations[i_som_rep_alt]
                    elif transcript.hgvs_p.strip():
                        variant_text = transcript.hgvs_p
                    elif transcript.hgvs_c.strip():
                        variant_text = transcript.hgvs_c
                    highlight = var.annotations[i_vicc] in (b"ONCOGENIC", b"LIKELY_ONCOGENIC")
                    entries.append((transcript.gene,
                                    variant_text or RtfText(b"???").highlight(3).rtf_code(),
                                    highlight))

                # CNVs (high-impact only)
                for k in range(len(self.cnvs)):
                    if k not in self.cnv_high_impact_indices:
                        continue
                    cnv = self.cnvs[k]
                    cn = cnv.copy_number(self.cnvs.annotation_headers)
                    genes_cnv = self.db.genes_overlapping(cnv.chr, cnv.start, cnv.end)
                    for gene in genes_cnv:
                        gene = gene if isinstance(gene, bytes) else gene.encode()
                        if not genes_pathway.contains(gene):
                            continue
                        if gene not in self.cnv_high_impact_indices[k]:
                            continue
                        entries.append((gene, cnv_type_description(cn, True), True))

                # SVs
                for li in range(len(self.svs)):
                    genes_a = self.svs[li].annotations[idx_genes_a]
                    genes_b = self.svs[li].annotations[idx_genes_b]
                    genes = genes_a.split(b",") + genes_b.split(b",")
                    for gene in genes:
                        if not genes_pathway.contains(gene.strip()):
                            continue
                        if genes_a == b"" and genes_b == b"":
                            gene_str = b"intergenisch"
                        elif genes_a == b"" and b"," not in genes_b:
                            gene_str = genes_b
                        elif b"," not in genes_a and genes_b == b"":
                            gene_str = genes_a
                        elif b"," not in genes_a and b"," not in genes_b:
                            gene_str = genes_a + b"-" + genes_b
                        elif b"," in genes_a and b"," not in genes_b:
                            gene_str = b"[" + genes_a + b"]-" + genes_b
                        elif b"," not in genes_a and b"," in genes_b:
                            gene_str = genes_a + b"-[" + genes_b + b"]"
                        else:
                            gene_str = b"[" + genes_a + b"]-[" + genes_b + b"]"
                        entries.append((gene_str, b"SV", True))

                rtf_text: list[bytes] = []
                for gene, alteration, highlight in entries:
                    text = RtfText(gene).set_font_size(18).rtf_code() + b" " \
                        + RtfText(alteration).set_font_size(16).rtf_code()
                    if not highlight:
                        text = RtfText(b"[ ").set_font_size(18).rtf_code() + text \
                            + RtfText(b" ]").set_font_size(18).rtf_code()
                    if alteration == b"SV" and b"[" in gene:
                        text = RtfText(gene).set_font_size(18).highlight(3).rtf_code() \
                            + b" " + RtfText(alteration).set_font_size(16).rtf_code()
                    rtf_text.append(text)
                contents.append(b"\\line\n".join(rtf_text))

            t.add_row(RtfTableRow(headers, [2480, 2480, 2480, 2480],
                                  RtfParagraph().set_horizontal_alignment(b"c")
                                  .set_bold(True).set_italic(True))
                      .set_borders(1, b"brdrhair", 4).set_background_color(5))
            t.add_row(RtfTableRow(contents, [2480, 2480, 2480, 2480],
                                  RtfParagraph().set_horizontal_alignment(b"c")
                                  .set_line_spacing(276))
                      .set_borders(1, b"brdrhair", 4))

        desc = RtfText(b"Beschreibung: ").set_font_size(14).set_bold(True).rtf_code()
        desc += ("Die nachgewiesenen potentiell relevanten somatischen Veränderungen und "
                 "die unklaren Varianten (in eckigen Klammern) wurden nach den wichtigsten "
                 "molekularen Signalwegen sortiert. Die Zugehörigkeit eines Gens zu einem "
                 "bestimmten Signalweg wurde durch das Molekulare Tumorboard Tübingen "
                 "festgestellt.").encode()
        t.add_row(RtfTableRow(desc, self.doc.max_width(),
                              RtfParagraph().set_font_size(14).set_horizontal_alignment(b"j")))
        return t.rtf_code()

    def part_billing_table(self) -> bytes:
        """EBM billing gene table (:324-367)."""
        t = RtfTable()
        t.add_row(RtfTableRow(
            b"Abrechnungsinformation gem\xc3\xa4\xc3\x9f einheitlicher Bewertungsma\xc3\x9fstab"
            .decode("utf-8").encode("utf-8"),
            self.doc.max_width(),
            RtfParagraph().set_bold(True).set_horizontal_alignment(b"c"))
            .set_background_color(4).set_header())
        third = self.doc.max_width() // 3
        t.add_row(RtfTableRow([b"Gen", b"OMIM", b"HGNC"], [third, third, third],
                              RtfParagraph().set_horizontal_alignment(b"c").set_font_size(16)
                              .set_bold(True)).set_header())

        # BedFile copy + merge (the reference copies the ROI by value)
        import copy as _copy
        tr = self.settings.target_region_filter
        target = _copy.deepcopy(tr["regions"]) if tr is not None else None
        if target is not None:
            target.merge()

        ebm_genes_target = self.db.genes_to_regions(self.ebm_genes, "ensembl", "gene")
        ebm_genes_target.sort()
        ebm_genes_target.merge()
        if target is not None:
            ebm_genes_target.intersect(target)
        size = ebm_genes_target.base_count()

        if size < 20000:  # fallback to hard-coded EBM gene list
            self.ebm_genes = GeneSet()
            for g in ("AKT1 ALK APC ARID1A ATM BRAF CCND1 CDK4 CDKN2A CREBBP CTNNB1 DICER1 "
                      "DNMT3A EGFR ERBB2 EZH2 FGFR1 FGFR2 FGFR3 GNA11 GNAQ GNAS IDH1 IDH2 "
                      "KIT KRAS MET MTOR MYC MYCN PIK3CA POLE PTEN RAF1 SMAD4 SMARCA4 "
                      "TGFBR2 TP53 VHL").split():
                self.ebm_genes.insert(g)
            size = 123670

        approved_genes = []
        for gene in self.ebm_genes:
            gene_s = gene.decode() if isinstance(gene, bytes) else str(gene)
            approved_genes.append(self.db.gene_to_approved(gene_s, True))
        for gene in approved_genes:
            omim_mims = [str(info["mim"]) for info in self.db.omim_info(gene)]
            hgnc_id = self.db.gene_hgnc_id(self.db.gene_id(gene))
            t.add_row(RtfTableRow([gene.encode(), ", ".join(omim_mims).encode(),
                                   str(hgnc_id).encode()], [third, third, third]))
        t.set_unique_border(1, b"brdrhair", 4)
        t.add_row(RtfTableRow(b"Basenpaare der abzurechnenden Gene: " + _inum(size),
                              self.doc.max_width(),
                              RtfParagraph().set_font_size(14)).set_borders(0))
        return t.rtf_code()

    def signature_table(self) -> RtfTable:
        """Mutation signature table (:1220-1272)."""
        from ..core.resources import RESOURCE_DIR
        descriptions: dict[bytes, bytes] = {}
        import gzip
        with gzip.open(RESOURCE_DIR / "signature_description.tsv.gz", "rb") as fh:
            for line in fh.read().split(b"\n"):
                line = line.strip()
                if not line or line.startswith(b"#"):
                    continue
                parts = line.split(b"\t")
                if len(parts) != 2:
                    raise ValueError("Signature description file has a line with more or "
                                     "less than 2 elements: " + line.decode())
                descriptions[parts[0]] = parts[1]

        t = RtfTable()
        t.add_row(RtfTableRow(b"Mutationssignaturen", self.doc.max_width(),
                              RtfParagraph().set_bold(True).set_horizontal_alignment(b"c"))
                  .set_background_color(4))
        t.add_row(RtfTableRow(
            [b"Signatur", b"Anteil [%]", b"Korrelation",
             b"Kosinus-\xc3\x84hnlichkeit".decode("utf-8").encode("utf-8"), b"Aetiologie"],
            [1500, 1500, 1500, 2000, 3422],
            RtfParagraph().set_bold(True).set_horizontal_alignment(b"c")))

        self.signature_table_helper(t, self.settings.sbs_signature, descriptions, b"SBS92")
        self.signature_table_helper(t, self.settings.id_signature, descriptions, b"ID83")
        self.signature_table_helper(t, self.settings.dbs_signature, descriptions, b"DBS78")
        self.signature_table_helper(t, self.settings.cnv_signature, descriptions, b"CNV48")
        t.set_unique_border(1, b"brdrhair", 4)

        def b14(txt, bold=False):
            x = RtfText(txt if isinstance(txt, bytes) else txt.encode()).set_font_size(14)
            if bold:
                x.set_bold(True)
            return x.rtf_code()

        desc = b14(b"Beschreibung: ", bold=True)
        desc += b14(b"SBS", bold=True) + b" single base substitution Signatur, "
        desc += b14(b"ID", bold=True) + b" small insertions and deletions Signatur, "
        desc += b14(b"DBS", bold=True) + b" doublet base substitution Signatur, "
        desc += b14(b"CN", bold=True) + b" copy number Signatur, "
        desc += b14(b"Anteil", bold=True) + (" prozentualer Anteil der Signatur an allen "
                                             "extrahierten Signaturen dieses Signaturtyps, "
                                             ).encode()
        desc += b14(b"Korrelation", bold=True) + (
            " statistisches Maß für die Plausibilität der extrahierten Mutationssignatur im "
            "Vergleich zu den beobachteten somatischen Veränderungen, ").encode()
        desc += b14("Kosinus-Ähnlichkeit:", bold=True) + (
            " Maß für die Ähnlichkeit zweier Vektoren der identifizierten "
            "Patienten-Signatur gegenüber den Referenzsignaturen, ").encode()
        desc += b14(b"Aetiologie: ", bold=True)
        desc += ("biologischer Prozess, der mit der vorliegenden Mutationssignatur assoziiert "
                 "wurde. Mutationssignaturen siehe PMID: 32025018, Kopienzahlsignaturen siehe "
                 "PMID: 35705804. ").encode()
        desc += (" Nähere Informationen erhalten Sie aus der Datenbank COSMIC "
                 "(https://cancer.sanger.ac.uk/signatures/).").encode()
        t.add_row(RtfTableRow(desc, self.doc.max_width(),
                              RtfParagraph().set_font_size(14).set_horizontal_alignment(b"j")))
        return t

    def signature_table_helper(self, table: RtfTable, file: str,
                               descriptions: dict[bytes, bytes], sig_type: bytes):
        """(:1274-1375)."""
        if not (file or "").strip():
            row = RtfTableRow()
            row.add_cell(self.doc.max_width(),
                         b"Die Mutationssignaturen des Typs " + sig_type
                         + b" konnten nicht berechnet werden.")
            table.add_row(row)
            return
        try:
            with open(file, "rb") as fh:
                lines = fh.read().split(b"\n")
            cell_widths = [1500, 1500, 1500, 2000, 3422]
            cos_similarity = b""
            correlation = b""
            signatures: list[tuple[bytes, bytes]] = []

            if lines and lines[0].startswith(b"##"):  # TSV format
                for line in lines:
                    line = line.strip()
                    if not line:
                        continue
                    if line.startswith(b"##Cosine Similarity:"):
                        cos_similarity = line[20:].strip()
                    if line.startswith(b"##Correlation:"):
                        correlation = line[14:].strip()
                    if line.startswith(b"#"):
                        continue
                    parts = line.split(b"\t")
                    if len(parts) != 3:
                        continue
                    signatures.append((parts[1].replace(b"Signature ", b""), parts[2]))
            else:  # CSV format
                if len(lines) < 2:
                    raise ValueError("CNV format: not two lines")
                parts = lines[1].split(b",")
                cos_similarity = parts[5]
                correlation = parts[6]
                # a single resulting signature carries no percentage
                if parts[0].strip() != parts[1].strip():
                    for entry in parts[1].split(b"&"):
                        entry = entry.replace(b"Signature ", b"").strip()
                        if not entry or b" " not in entry:
                            continue
                        sig_name = entry.split(b" ")[0]
                        sig_perc = entry.split(b" ")[1].replace(b"(", b"").replace(b"%)", b"")
                        signatures.append((sig_name, sig_perc))

            if not signatures:
                row = RtfTableRow()
                row.add_cell(self.doc.max_width(),
                             b"F\xc3\xbcr die Mutationssignaturen des Typs ".decode("utf-8").encode("utf-8")
                             + sig_type
                             + b" konnten keine COSMIC Signaturen identifiziert werden.")
                table.add_row(row)
            else:
                for sig_name, sig_perc in signatures:
                    row = RtfTableRow()
                    row.add_cell(cell_widths[0], sig_name)
                    row.add_cell(cell_widths[1], sig_perc.strip())
                    row.add_cell(cell_widths[2], correlation.strip())
                    row.add_cell(cell_widths[3], cos_similarity.strip())
                    row.add_cell(cell_widths[4], descriptions.get(sig_name, b""))
                    table.add_row(row)
        except Exception:
            row = RtfTableRow()
            row.add_cell(self.doc.max_width(),
                         b"Die Mutationssignaturen des Typs " + sig_type
                         + b" konnten nicht berechnet werden.")
            table.add_row(row)

    # ---- document assembly ----------------------------------------------

    def store_rtf(self, out_file: str):
        """(:1378-1480)."""
        doc = self.doc
        doc.add_part(self.part_summary())
        doc.add_part(RtfParagraph(b"").rtf_code())

        text = ("In der nachfolgenden Übersicht finden Sie alle Varianten und "
                "Kopienzahlveränderungen, die in unterschiedlichen Datenbanken als "
                "funktionell relevant eingestuft wurden. ").encode()
        text += ("Alle aufgelisteten somatischen Veränderungen sind, wenn nicht anderweitig "
                 "vermerkt, im Normalgewebe nicht nachweisbar.").encode()
        doc.add_part(RtfParagraph(text).set_font_size(18).set_indent(0, 0, 0)
                     .set_space_after(30).set_space_before(30)
                     .set_horizontal_alignment(b"j").set_line_spacing(276).rtf_code())
        doc.add_part(RtfParagraph(b"").set_font_size(18).set_indent(0, 0, 0)
                     .set_space_after(30).set_space_before(30)
                     .set_horizontal_alignment(b"j").set_line_spacing(276).rtf_code())

        doc.add_part(self.part_relevant_variants())
        doc.add_part(RtfParagraph(b"").set_indent(0, 0, 0).set_font_size(18)
                     .set_space_after(30).set_space_before(30).set_line_spacing(276).rtf_code())

        doc.new_page()
        doc.add_part(self.part_unclear_variants())
        doc.add_part(RtfParagraph(b"").rtf_code())
        doc.add_part(self.part_cnv_table())
        doc.add_part(RtfParagraph(b"").rtf_code())
        doc.add_part(self.part_fusions())
        doc.add_part(RtfParagraph(b"").rtf_code())

        if self.validated_viruses:
            doc.add_part(self.part_virus_table())
            doc.add_part(RtfParagraph(b"").rtf_code())

        doc.add_part(self.part_pharmaco_genetics())
        doc.add_part(RtfParagraph(b"").rtf_code())

        doc.new_page()
        doc.add_part(RtfParagraph(b"").rtf_code())
        doc.add_part(self.part_pathways())
        doc.add_part(RtfParagraph(b"").rtf_code())

        doc.add_part(RtfParagraph(b"").rtf_code())
        doc.add_part(self.signature_table().rtf_code())
        doc.add_part(RtfParagraph(b"").rtf_code())

        doc.add_part(self.part_meta_data())
        doc.add_part(RtfParagraph(b"").rtf_code())

        if self.settings.igv_snapshot_png_hex_image:
            doc.add_part(self.part_igv_screenshot())
            doc.add_part(RtfParagraph(b"").rtf_code())

        doc.add_part(RtfParagraph(b"").rtf_code())
        doc.add_part(self.hla_table(self.settings.tumor_ps, self.settings.normal_ps).rtf_code())
        doc.add_part(RtfParagraph(b"").rtf_code())

        doc.new_page()
        doc.add_part(RtfParagraph(b"").rtf_code())
        doc.add_part(self.part_billing_table())
        doc.add_part(RtfParagraph(b"").rtf_code())

        doc.save(out_file)

    def get_xml_data(self):
        """(:1491-1519)."""
        from .somatic_xml_report import SomaticXmlReportGeneratorData
        data = SomaticXmlReportGeneratorData(
            build=self.build, settings=self.settings, tumor_snvs=self.somatic_vl,
            germline_snvs=self.filtered_germline_vl, tumor_cnvs=self.cnvs)
        data.tumor_content_histology = self.histol_tumor_fraction / 100.0
        data.tumor_content_snvs = self.get_tumor_content_by_snvs() / 100.0
        data.tumor_content_clonality = get_cnv_max_tumor_clonality(self.cnvs)
        data.tumor_mutation_burden = self.mutation_burden
        data.msi_unstable_percent = self.msi_unstable_percent

        doc = RtfDocument()
        add_colors(doc)
        data.rtf_part_header = doc.header()
        data.rtf_part_footer = doc.footer()

        data.rtf_part_summary = self.part_summary()
        data.rtf_part_relevant_variants = self.part_relevant_variants()
        data.rtf_part_unclear_variants = self.part_unclear_variants()
        data.rtf_part_cnvs = self.part_cnv_table()
        data.rtf_part_svs = self.part_fusions()
        data.rtf_part_pharmacogenetics = self.part_pharmaco_genetics()
        data.rtf_part_general_info = self.part_meta_data()
        data.rtf_part_igv_screenshot = self.part_igv_screenshot()
        data.rtf_part_mtb_summary = self.part_pathways()
        data.rtf_part_hla_summary = self.hla_table(
            self.settings.tumor_ps, self.settings.normal_ps).rtf_code()
        return data

    def store_xml(self, file_name: str):
        """(:1482-1489)."""
        from . import somatic_xml_report as sxr
        data = self.get_xml_data()
        sxr.generate_xml(data, file_name, self.db, test=False)


def _geneset_of(genes) -> GeneSet:
    """Coerce a GeneSet/list/iterable of gene symbols into a GeneSet."""
    if isinstance(genes, GeneSet):
        return genes
    out = GeneSet()
    for g in genes or ():
        out.insert(g)
    return out
