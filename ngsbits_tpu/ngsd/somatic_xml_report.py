"""Somatic XML report generator (SomaticNgsReport v6).

Behavioral reference: ngs-bits cppNGSD/SomaticXmlReportGenerator.{h,cpp}
(data holder + check: :11-67, generateXML: :91-570, base64 report parts:
:572-582) and SomaticReportHelper::selectSomaticTranscript
(cppNGSD/SomaticReportHelper.cpp:369-405).  Output is byte-identical to the
reference's QXmlStreamWriter stream (golden:
cppNGSD-TEST/data_out/somatic_report.xml).
"""

from __future__ import annotations

import base64
import math
from dataclasses import dataclass, field

from ..core.qtxml import QtXmlStreamWriter
from ..io.gsvar import VariantTranscript
from .db import NGSD, NgsdError
from .somatic_vicc import get_somatic_vicc_data, vicc_score_as_string


def _valid(x) -> bool:
    return x is not None and not math.isnan(x)


@dataclass
class SomaticXmlReportGeneratorData:
    """SomaticXmlReportGenerator.h data holder."""
    build: str = "GRCh38"                     # genome build string ('GRCh37'/'GRCh38')
    settings: object = None                   # SomaticReportSettings
    tumor_snvs: object = None                 # filtered GSvarFile
    germline_snvs: object = None              # filtered GSvarFile
    tumor_cnvs: object = None                 # filtered CnvList
    tumor_content_histology: float = math.nan
    tumor_content_snvs: float = math.nan
    tumor_content_clonality: float = math.nan
    tumor_content_estimated: float = math.nan
    tumor_mutation_burden: float = math.nan
    msi_unstable_percent: float = math.nan
    rtf_part_header: bytes = b""
    rtf_part_footer: bytes = b""
    rtf_part_summary: bytes = b""
    rtf_part_relevant_variants: bytes = b""
    rtf_part_unclear_variants: bytes = b""
    rtf_part_cnvs: bytes = b""
    rtf_part_svs: bytes = b""
    rtf_part_pharmacogenetics: bytes = b""
    rtf_part_general_info: bytes = b""
    rtf_part_igv_screenshot: bytes = b""
    rtf_part_mtb_summary: bytes = b""
    rtf_part_hla_summary: bytes = b""

    def check(self):
        """SomaticXmlReportGeneratorData::check (:26-67)."""
        rc = self.settings.report_config
        messages = []
        if rc.meta.get("tum_content_max_af") and not _valid(self.tumor_content_snvs):
            messages.append("Tumor content by median SNV B-AF selected but value is not valid float")
        if rc.meta.get("tum_content_max_clonality") and not _valid(self.tumor_content_clonality):
            messages.append("Tumor content by maximum CNV clonality selected but value is not valid float")
        if rc.meta.get("tum_content_hist") and not _valid(self.tumor_content_histology):
            messages.append("Tumor content by histology selected but value is not valid float")
        if rc.meta.get("tum_content_estimated") and not _valid(self.tumor_content_estimated):
            messages.append("Tumor content by estimation is selected but value is not valid float")
        if rc.meta.get("include_mutation_burden") and not _valid(self.tumor_mutation_burden):
            messages.append("Tumor mutation burden is not a valid float")
        if rc.meta.get("msi_status") and not _valid(self.msi_unstable_percent):
            messages.append("MSI status selected but value is not valid float")
        if messages:
            raise NgsdError("Invalid data in SomaticXmlReportGeneratorData! Messages: "
                            + ",\n".join(messages))
        check_somatic_variant_annotation(self.tumor_snvs)


def check_somatic_variant_annotation(vl):
    """SomaticXmlReportGenerator::checkSomaticVariantAnnotation (:75-87)."""
    for anno in ("tumor_af", "tumor_dp", "normal_af", "normal_dp", "gene",
                 "ncg_oncogene", "ncg_tsg", "coding_and_splicing"):
        if anno not in vl.columns:
            raise NgsdError("Could not find all neccessary annotations in somatic SNV "
                            "file for XML generation in "
                            "SomaticXmlReportGenerator::checkSomaticVariantAnnotation")


def select_somatic_transcript(db: NGSD, transcripts: list[VariantTranscript]) -> VariantTranscript:
    """SomaticReportHelper::selectSomaticTranscript (SomaticReportHelper.cpp:369-405)."""
    if not transcripts:
        return VariantTranscript()
    current_best_quality = -1
    best_transcript = VariantTranscript()
    for trans in transcripts:
        gene_id = db.gene_id(trans.gene)
        if gene_id == -1:
            continue
        best, quality = db.best_transcript_for_variant(gene_id, transcripts)
        if best is None:
            continue
        for t in transcripts:
            if t.id_without_version().decode() == best.name and current_best_quality < quality:
                current_best_quality = quality
                best_transcript = t
    if current_best_quality != -1:
        return best_transcript
    return transcripts[0]


def _vicc_effect(db: NGSD, variant) -> str | None:
    """effect attribute: VICC score string, lower-cased (generateXML:335-338)."""
    vicc_id = db.get_somatic_vicc_id(variant)
    if vicc_id == -1:
        return None
    vid = db.variant_id(variant, throw_if_fails=False)
    data = get_somatic_vicc_data(db, int(vid))
    return vicc_score_as_string(data).lower()


def _write_gene_element(w, db, gene, *, is_tsg, is_oncogene, ncg_version):
    approved = db.gene_to_approved(gene.decode() if isinstance(gene, bytes) else gene)
    if not approved:
        return
    w.start_element("Gene")
    w.attribute("name", approved)
    w.attribute("id", db.gene_hgnc_id(db.gene_id(approved)))
    role = db.get_somatic_gene_role(approved)
    if role is not None:
        w.attribute("role", role["role"])
    if is_tsg:
        w.start_element("IsTumorSuppressor")
        w.attribute("source", "Network of Cancer Genes")
        w.attribute("source_version", ncg_version)
        w.end_element()
    if is_oncogene:
        w.start_element("IsOncoGene")
        w.attribute("source", "Network of Cancer Genes")
        w.attribute("source_version", ncg_version)
        w.end_element()
    w.end_element()


def generate_xml(data: SomaticXmlReportGeneratorData, out_path: str, db: NGSD,
                 test: bool = False, *, user_name: str = "ahmustm1",
                 app_name: str = "cppNGSD-TEST",
                 app_version: str = "0.1-cppNGSD-TEST-Version"):
    """SomaticXmlReportGenerator::generateXML (:91-570)."""
    sett = data.settings
    rc = sett.report_config
    tumor_ps_id = db.processed_sample_id(sett.tumor_ps)
    tumor_s_id = db.sample_id(sett.tumor_ps)
    normal_ps_id = db.processed_sample_id(sett.normal_ps)
    normal_s_id = db.sample_id(sett.normal_ps)

    w = QtXmlStreamWriter()
    w.start_document()
    w.start_element("SomaticNgsReport")
    w.attribute("version", "6")
    w.attribute("genome_build", data.build)

    w.start_element("ReportGeneration")
    if test:
        w.attribute("date", "2000-01-01")
    else:
        import datetime
        w.attribute("date", datetime.date.today().isoformat())
    w.attribute("user_name", user_name)
    w.attribute("software", app_name + " " + app_version)
    w.end_element()

    # PatientInfo
    w.start_element("PatientInfo")
    if test:
        w.attribute("sap_patient_identifier", "SAP_TEST_IDENTIFIER")
    _type_map = {"HPO term id": "HPO", "ICD10 code": "ICD10",
                 "Orpha number": "ORPHA", "Oncotree code": "ONCOTREE"}
    for dtype, dinfo in db.get_sample_disease_info(tumor_s_id):
        mapped = _type_map.get(dtype)
        if mapped is None:
            continue
        w.start_element("DiseaseInfo")
        w.attribute("type", mapped)
        w.attribute("identifier", dinfo)
        w.end_element()
    _type_map_germl = {"HPO term id": "HPO", "ICD10 code": "ICD10", "Orpha number": "ORPHA"}
    for dtype, dinfo in db.get_sample_disease_info(normal_s_id):
        mapped = _type_map_germl.get(dtype)
        if mapped is None:
            continue
        w.start_element("DiseaseInfoGermline")
        w.attribute("type", mapped)
        w.attribute("identifier", dinfo)
        w.end_element()
    w.end_element()

    # TumorSample
    w.start_element("TumorSample")
    w.attribute("name", sett.tumor_ps)
    t_ps_data = db.get_processed_sample_data(tumor_ps_id)
    w.attribute("processing_system", t_ps_data["processing_system"])
    w.attribute("processing_system_type", t_ps_data["processing_system_type"])
    w.attribute("sequencer", db.get_value(
        "SELECT d.type FROM device as d, sequencing_run as sr WHERE d.id = sr.device_id "
        "AND sr.name = ?", no_value_is_ok=False, params=(t_ps_data["run_name"],)))
    t_qc = db.get_qc_collection(tumor_ps_id)
    w.attribute("average_depth", t_qc.value("QC:2000025", True).to_string())
    t_s_data = db.get_sample_data(tumor_s_id)
    stype = t_s_data["type"]
    w.attribute("type", "DNA" if stype.startswith("DNA") else stype)
    w.attribute("is_ffpe", "true" if t_s_data["is_ffpe"] else "false")
    tissue = (t_s_data.get("tissue") or "").strip()
    if tissue and tissue != "n/a":
        w.attribute("tissue", tissue)
    if rc.meta.get("tum_content_hist"):
        w.attribute("tumor_content_histology", f"{data.tumor_content_histology:.3f}")
    if rc.meta.get("tum_content_estimated") and _valid(data.tumor_content_estimated):
        w.attribute("tumor_content_bioinformatic", f"{data.tumor_content_estimated:.3f}")
    elif rc.meta.get("tum_content_max_clonality") and _valid(data.tumor_content_clonality):
        w.attribute("tumor_content_bioinformatic", f"{data.tumor_content_clonality:.3f}")
    elif rc.meta.get("tum_content_max_af") and _valid(data.tumor_content_snvs):
        w.attribute("tumor_content_bioinformatic", f"{data.tumor_content_snvs:.3f}")
    if rc.meta.get("include_mutation_burden"):
        w.attribute("mutation_burden", f"{data.tumor_mutation_burden:.2f}")
    if rc.meta.get("msi_status"):
        w.attribute("microsatellite_instability", f"{data.msi_unstable_percent:.2f}")
    w.attribute("hrd_score_chromo", str(int(rc.meta.get("cnv_loh_count") or 0)
                                        + int(rc.meta.get("cnv_tai_count") or 0)
                                        + int(rc.meta.get("cnv_lst_count") or 0)))
    for term in t_qc:
        if term.type.name == "IMAGE":
            continue
        w.start_element("QcTerm")
        w.attribute("id", term.accession)
        w.attribute("name", term.name)
        w.attribute("def", term.description)
        w.attribute("value", term.to_string())
        w.end_element()
    w.end_element()

    # NormalSample
    w.start_element("NormalSample")
    w.attribute("name", sett.normal_ps)
    n_ps_data = db.get_processed_sample_data(normal_ps_id)
    w.attribute("processing_system", n_ps_data["processing_system"])
    w.attribute("processing_system_type", n_ps_data["processing_system_type"])
    w.attribute("sequencer", db.get_value(
        "SELECT d.type FROM device as d, sequencing_run as sr WHERE d.id = sr.device_id "
        "AND sr.name = ?", no_value_is_ok=False, params=(n_ps_data["run_name"],)))
    n_qc = db.get_qc_collection(normal_ps_id)
    w.attribute("average_depth", n_qc.value("QC:2000025", True).to_string())
    for term in n_qc:
        if term.type.name == "IMAGE":
            continue
        w.start_element("QcTerm")
        w.attribute("id", term.accession)
        w.attribute("name", term.name)
        w.attribute("def", term.description)
        w.attribute("value", term.to_string())
        w.end_element()
    w.end_element()

    # AnalysisPipeline
    w.start_element("AnalysisPipeline")
    w.attribute("name", "megSAP")
    w.attribute("version", data.tumor_snvs.pipeline().replace("megSAP", "").strip())
    w.attribute("url", "https://github.com/imgag/megSAP")
    w.attribute("comment", "Mapping: bwa mem, Indel Realignment: Abra2, "
                           "Variant Caller: Strelka2, CNV Caller: ClinCNV")
    w.end_element()

    # TargetRegion
    w.start_element("TargetRegion")
    trf = sett.target_region_filter
    if trf is None or not trf.get("regions"):
        sys_id = db.processing_system_id(t_ps_data["processing_system"])
        w.attribute("name", t_ps_data["processing_system"])
        regions, genes = None, []
        _ = sys_id
    else:
        w.attribute("name", trf["name"])
        regions, genes = trf["regions"], trf.get("genes") or []
    if regions is not None:
        for line in regions.lines:
            w.start_element("Region")
            w.attribute("chr", line.chr.str_normalized(True))
            w.attribute("start", str(line.start))
            w.attribute("end", str(line.end))
            w.end_element()
    for gene in genes:
        approved = db.gene_to_approved(gene.decode() if isinstance(gene, bytes) else gene)
        if not approved:
            continue
        w.start_element("Gene")
        w.attribute("name", approved)
        w.attribute("id", db.gene_hgnc_id(db.gene_id(approved)))
        w.end_element()
    w.end_element()

    # VariantList
    w.start_element("VariantList")
    snvs = data.tumor_snvs
    i_tumor_af = snvs.annotation_index("tumor_af")
    i_tumor_depth = snvs.annotation_index("tumor_dp")
    i_normal_af = snvs.annotation_index("normal_af")
    i_normal_depth = snvs.annotation_index("normal_dp")
    i_genes = snvs.annotation_index("gene")
    i_ncg_oncogene = snvs.annotation_index("ncg_oncogene")
    i_ncg_tsg = snvs.annotation_index("ncg_tsg")
    i_co_sp = snvs.annotation_index("coding_and_splicing")

    for snv in snvs.variants:
        w.start_element("Variant")
        w.attribute("chr", snv.chr.str_normalized(True))
        w.attribute("start", str(snv.start))
        w.attribute("end", str(snv.end))
        w.attribute("ref", snv.ref.decode())
        w.attribute("obs", snv.obs.decode())
        w.attribute("af_tumor", snv.annotations[i_tumor_af].decode())
        w.attribute("depth_tumor", snv.annotations[i_tumor_depth].decode())
        w.attribute("af_normal", snv.annotations[i_normal_af].decode())
        w.attribute("depth_normal", snv.annotations[i_normal_depth].decode())
        effect = _vicc_effect(db, snv)
        if effect is not None:
            w.attribute("effect", effect)
        gene_list = snv.annotations[i_genes].split(b",")
        oncogenes = snv.annotations[i_ncg_oncogene].split(b",")
        tsg = snv.annotations[i_ncg_tsg].split(b",")
        for j, gene in enumerate(gene_list):
            _write_gene_element(w, db, gene,
                                is_tsg=b"1" in tsg[j] if j < len(tsg) else False,
                                is_oncogene=b"1" in oncogenes[j] if j < len(oncogenes) else False,
                                ncg_version="7.1")
        trans_annos = snvs.transcript_annotations(snv, i_co_sp)
        selected = select_somatic_transcript(db, trans_annos)
        for trans in trans_annos:
            w.start_element("TranscriptInformation")
            w.attribute("transcript_id", trans.id.decode())
            w.attribute("gene", trans.gene.decode())
            w.attribute("type", trans.type.decode())
            w.attribute("hgvs_c", trans.hgvs_c.decode())
            w.attribute("hgvs_p", trans.hgvs_p.decode())
            w.attribute("exon", trans.exon.decode())
            w.attribute("variant_type", trans.type.decode())
            w.attribute("main_transcript",
                        "true" if selected.id == trans.id else "false")
            w.end_element()
        w.end_element()

    germl = data.germline_snvs
    i_germl_freq = germl.annotation_index("freq_in_tum")
    i_germl_depth = germl.annotation_index("depth_in_tum")
    i_germl_hom_het = germl.annotation_index(sett.normal_ps)
    i_germl_co_sp = germl.annotation_index("coding_and_splicing")
    relevant = getattr(sett, "relevant_transcripts", None) or {}
    for snv in germl.variants:
        w.start_element("Variant")
        w.attribute("chr", snv.chr.str_normalized(True))
        w.attribute("start", str(snv.start))
        w.attribute("end", str(snv.end))
        w.attribute("ref", snv.ref.decode())
        w.attribute("obs", snv.obs.decode())
        w.attribute("af_tumor", snv.annotations[i_germl_freq].decode())
        w.attribute("depth_tumor", snv.annotations[i_germl_depth].decode())
        w.attribute("af_normal",
                    "0.5" if b"het" in snv.annotations[i_germl_hom_het] else "1.0")
        effect = _vicc_effect(db, snv)
        if effect is not None:
            w.attribute("effect", effect)
        for trans in germl.transcript_annotations(snv, i_germl_co_sp):
            w.start_element("TranscriptInformation")
            w.attribute("transcript_id", trans.id.decode())
            w.attribute("gene", trans.gene.decode())
            w.attribute("type", trans.type.decode())
            w.attribute("hgvs_c", trans.hgvs_c.decode())
            w.attribute("hgvs_p", trans.hgvs_p.decode())
            w.attribute("exon", trans.exon.decode())
            w.attribute("variant_type", trans.type.decode())
            is_main = (trans.gene in relevant
                       and trans.id_without_version() in relevant[trans.gene])
            w.attribute("main_transcript", "true" if is_main else "false")
            w.end_element()
        w.end_element()
    w.end_element()

    # CnvList
    target_region_genes = set()
    if sett.target_region_filter is not None:
        target_region_genes = {g if isinstance(g, bytes) else g.encode()
                               for g in (sett.target_region_filter.get("genes") or [])}
    w.start_element("CnvList")
    cnvs = data.tumor_cnvs
    if len(cnvs) > 0:
        i_clonality = cnvs.annotation_index_by_name(b"tumor_clonality")
        i_state = cnvs.annotation_index_by_name(b"state")
        i_type = cnvs.annotation_index_by_name(b"cnv_type")
        i_cn_change = cnvs.annotation_index_by_name(b"tumor_CN_change")
        i_cn_minor = cnvs.annotation_index_by_name(b"minor_CN_allele")
        i_cn_major = cnvs.annotation_index_by_name(b"major_CN_allele")
        i_tsg = cnvs.annotation_index_by_name(b"ncg_tsg")
        i_oncogene = cnvs.annotation_index_by_name(b"ncg_oncogene")
        i_cytoband = cnvs.annotation_index_by_name(b"cytoband")
        for cnv in cnvs.variants:
            w.start_element("Cnv")
            w.attribute("chr", cnv.chr.str_normalized(True))
            w.attribute("start", str(cnv.start))
            w.attribute("end", str(cnv.end))
            cytobands = cnv.annotations[i_cytoband].split(b",")
            w.attribute("start_band", cytobands[0].decode())
            w.attribute("end_band", cytobands[-1].decode())
            w.attribute("af", cnv.annotations[i_clonality].decode())
            w.attribute("alteration", cnv.annotations[i_state].decode())
            w.attribute("type", cnv.annotations[i_type].decode())
            w.attribute("cn", cnv.annotations[i_cn_change].decode())
            w.attribute("cn_a", cnv.annotations[i_cn_minor].decode())
            w.attribute("cn_b", cnv.annotations[i_cn_major].decode())
            # genesToApproved returns a GeneSet — sorted, unique (:504)
            genes = sorted({a for g in cnv.genes
                            if (a := db.gene_to_approved(g.decode() if isinstance(g, bytes) else g))})
            tsg_set = {db.gene_to_approved(g.strip().decode(), True)
                       for g in cnv.annotations[i_tsg].split(b",") if g.strip()}
            onco_set = {db.gene_to_approved(g.strip().decode(), True)
                        for g in cnv.annotations[i_oncogene].split(b",") if g.strip()}
            for gene in genes:
                if gene.encode() not in target_region_genes:
                    continue
                _write_gene_element(w, db, gene, is_tsg=gene in tsg_set,
                                    is_oncogene=gene in onco_set, ncg_version="6.0")
            w.end_element()
    w.end_element()

    w.start_element("ReportDocument")
    w.attribute("format", "RTF")
    w.end_element()

    def report_part(name: str, rtf_part: bytes):
        # writeReportPartsElement (:572-582)
        w.start_element("ReportDocumentParts")
        w.attribute("name", name)
        w.attribute("format", "RTF")
        w.characters(base64.b64encode(
            data.rtf_part_header + rtf_part + data.rtf_part_footer).decode())
        w.end_element()

    report_part("summary", data.rtf_part_summary)
    report_part("relevant_variants", data.rtf_part_relevant_variants)
    report_part("unclear_variants", data.rtf_part_unclear_variants)
    report_part("cnvs", data.rtf_part_cnvs)
    report_part("svs", data.rtf_part_svs)
    report_part("pharmaco_genetics", data.rtf_part_pharmacogenetics)
    report_part("general_info", data.rtf_part_general_info)
    report_part("igv_screenshot", data.rtf_part_igv_screenshot)
    report_part("mtb_summary", data.rtf_part_mtb_summary)
    report_part("hla_summary", data.rtf_part_hla_summary)

    w.end_element()
    w.end_document()
    with open(out_path, "wb") as fh:
        fh.write(w.to_bytes())
