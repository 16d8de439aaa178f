"""Tumor-only RTF/XML report worker.

Behavioral reference: ngs-bits cppNGSD/TumorOnlyReportWorker.{h,cpp}
(ctor/checkAnnotation: :14-46, writeXML: :48-266, variantDescription/trans:
:268-301, exonNumber: :304-337, writeRtf: :339-505).  Goldens:
cppNGSD-TEST/data_out/tumor_only_report.{rtf,xml}.
"""

from __future__ import annotations

import datetime
import os

from ..core.qtxml import QtXmlStreamWriter
from ..core.rtf import (RtfDocument, RtfParagraph, RtfTable, RtfTableRow,
                        RtfText)
from .db import NGSD
from .somatic_xml_report import select_somatic_transcript


class TumorOnlyReportWorkerConfig:
    """TumorOnlyReportWorker.h config struct."""

    def __init__(self):
        self.filter_result = None          # FilterResult
        self.low_coverage_file = ""
        self.bam_file = ""
        self.include_coverage_per_gap = False
        self.include_exon_number_per_gap = False
        self.use_test_db = False
        self.build = "GRCh37"
        self.threads = 1
        self.sys = {}                      # {"name","type"}
        self.ps_data = {}                  # {"name","comments"}
        self.roi_name = ""
        self.roi_genes = []                # GeneSet-like sorted symbols
        self.roi_regions = None            # BedFile or None
        self.relevant_transcripts = {}     # {gene bytes: [transcript names bytes]}


_VICC_DE = {
    b"activating": b"aktivierend",
    b"likely_activating": b"wahrscheinlich aktivierend",
    b"inactivating": b"inaktivierend",
    b"likely_inactivating": b"wahrscheinlich inaktivierend",
    b"unclear": b"unklar",
    b"test_dependent": b"testabh\xc3\xa4ngig",  # UTF-8 'testabhängig'
}


class TumorOnlyReportWorker:
    """TumorOnlyReportWorker.cpp — RTF + XML tumor-only reports."""

    REQUIRED_ANNOTATIONS = ("coding_and_splicing", "tumor_af", "tumor_dp", "gene",
                            "variant_type", "ncg_oncogene", "ncg_tsg",
                            "classification", "NGSD_som_vicc_interpretation")

    def __init__(self, variants, config: TumorOnlyReportWorkerConfig, db: NGSD | None = None):
        self.config = config
        self.variants = variants
        self.db = db if db is not None else NGSD(test_db=config.use_test_db)
        self.i_co_sp = variants.annotation_index("coding_and_splicing")
        self.i_tum_af = variants.annotation_index("tumor_af")
        self.i_tum_dp = variants.annotation_index("tumor_dp")
        self.i_gene = variants.annotation_index("gene")
        self.i_ncg_oncogene = variants.annotation_index("ncg_oncogene")
        self.i_ncg_tsg = variants.annotation_index("ncg_tsg")
        self.i_germl_class = variants.annotation_index("classification")
        self.i_vicc_class = variants.annotation_index("NGSD_som_vicc_interpretation")
        self.doc = RtfDocument()
        self.doc.add_color(188, 230, 138)
        self.doc.add_color(255, 0, 0)
        self.doc.add_color(255, 255, 0)
        self.doc.add_color(161, 161, 161)
        self.doc.add_color(217, 217, 217)

    @staticmethod
    def check_annotation(variants):
        """TumorOnlyReportWorker::checkAnnotation (:38-46)."""
        for ann in TumorOnlyReportWorker.REQUIRED_ANNOTATIONS:
            if ann not in variants.columns:
                raise ValueError(f"Could not find column {ann} for tumor only report "
                                 "in variant list.")

    # ---- XML (:48-266) ----

    def write_xml(self, filename: str, test: bool = False):
        db, cfg = self.db, self.config
        w = QtXmlStreamWriter()
        w.start_document()
        w.start_element("DiagnosticNgsReport")
        w.attribute("version", "1")
        w.attribute("genome_build", cfg.build)

        w.start_element("ReportGeneration")
        w.attribute("date", "2022-01-30" if test else datetime.date.today().isoformat())
        w.attribute("user_name", "ahtest1" if test else os.environ.get("USER", ""))
        w.attribute("software", "cppNGSD-TEST-CASE" if test else "ngsbits-tpu")
        w.end_element()

        w.start_element("Sample")
        w.attribute("name", cfg.ps_data["name"])
        w.attribute("processing_system", cfg.sys["name"])
        w.attribute("processing_system_type", cfg.sys["type"])
        w.attribute("comments", cfg.ps_data.get("comments", ""))
        qc_data = db.get_qc_collection(db.processed_sample_id(cfg.ps_data["name"]))
        for term in qc_data:
            if term.type.name == "IMAGE":
                continue
            w.start_element("QcTerm")
            w.attribute("id", term.accession)
            w.attribute("name", term.name)
            w.attribute("def", term.description)
            w.attribute("value", term.to_string())
            w.end_element()
        w.end_element()

        w.start_element("AnalysisPipeline")
        w.attribute("name", "megSAP")
        w.attribute("version", self.variants.pipeline().replace("megSAP", "").strip())
        w.end_element()

        w.start_element("TargetRegion")
        w.attribute("name", cfg.roi_name)
        if cfg.roi_regions is not None:
            for line in cfg.roi_regions.lines:
                w.start_element("Region")
                w.attribute("chr", line.chr.str)
                w.attribute("start", str(line.start))
                w.attribute("end", str(line.end))
                w.end_element()

        # group gaps by gene (:110-125)
        gaps_by_gene: dict[bytes, list] = {}
        if os.path.exists(cfg.low_coverage_file):
            from ..core.intervals import BedFile
            low_cov = BedFile.from_file(cfg.low_coverage_file)
            low_cov.intersect(cfg.roi_regions)
            for line in low_cov.lines:
                # extend by 20 to annotate splicing regions as well
                for gene in db.genes_overlapping(line.chr, line.start, line.end, 20):
                    g = gene if isinstance(gene, bytes) else gene.encode()
                    gaps_by_gene.setdefault(g, []).append(line)

        for gene in cfg.roi_genes:
            g = gene.decode() if isinstance(gene, bytes) else gene
            gene_info = db.gene_info(g)
            if not gene_info["symbol"] or not gene_info["hgnc_id"]:
                continue
            g = gene_info["symbol"]
            w.start_element("Gene")
            w.attribute("name", g)
            w.attribute("id", gene_info["hgnc_id"])
            transcript = db.best_transcript(db.gene_id(g))
            w.attribute("bases", str(transcript.regions.base_count() if transcript else 0))
            for omim in db.omim_info(g):
                for pheno in omim["phenotypes"]:
                    w.start_element("Omim")
                    w.attribute("gene", omim["mim"])
                    w.attribute("phenotype", pheno["name"])
                    if pheno["accession"]:
                        w.attribute("phenotype_number", pheno["accession"])
                    w.end_element()
            for line in gaps_by_gene.get(g.encode(), []):
                w.start_element("Gap")
                w.attribute("chr", line.chr.str)
                w.attribute("start", str(line.start))
                w.attribute("end", str(line.end))
                w.end_element()
            w.end_element()
        w.end_element()

        w.start_element("VariantList")
        for i, var in enumerate(self.variants.variants):
            if not cfg.filter_result.flags[i]:
                continue
            w.start_element("Variant")
            w.attribute("chr", var.chr.str)
            w.attribute("start", str(var.start))
            w.attribute("end", str(var.end))
            w.attribute("ref", var.ref.decode())
            w.attribute("obs", var.obs.decode())
            w.attribute("allele_frequency", var.annotations[self.i_tum_af].decode())
            w.attribute("depth", var.annotations[self.i_tum_dp].decode())
            if var.annotations[self.i_germl_class]:
                w.attribute("germline_class", var.annotations[self.i_germl_class].decode())
            if var.annotations[self.i_vicc_class]:
                w.attribute("somatic_class", var.annotations[self.i_vicc_class].decode())
            genes = var.annotations[self.i_gene].split(b",")
            oncogenes = var.annotations[self.i_ncg_oncogene].split(b",")
            tsg = var.annotations[self.i_ncg_tsg].split(b",")
            for j, gene in enumerate(genes):
                gene_info = db.gene_info(gene.decode())
                if not gene_info["symbol"] or not gene_info["hgnc_id"]:
                    continue
                w.start_element("Gene")
                w.attribute("name", gene_info["symbol"])
                w.attribute("id", gene_info["hgnc_id"])
                if j < len(tsg) and b"1" in tsg[j]:
                    w.start_element("IsTumorSuppressor")
                    w.attribute("source", "Network of Cancer Genes")
                    w.attribute("source_version", "6.0")
                    w.end_element()
                if j < len(oncogenes) and b"1" in oncogenes[j]:
                    w.start_element("IsOncoGene")
                    w.attribute("source", "Network of Cancer Genes")
                    w.attribute("source_version", "6.0")
                    w.end_element()
                w.end_element()
            for trans in self.variants.transcript_annotations(var, self.i_co_sp):
                w.start_element("TranscriptInformation")
                w.attribute("transcript_id", trans.id.decode())
                w.attribute("gene", trans.gene.decode())
                w.attribute("type", trans.type.decode())
                w.attribute("hgvs_c", trans.hgvs_c.decode())
                w.attribute("hgvs_p", trans.hgvs_p.decode())
                w.attribute("exon", trans.exon.decode())
                w.attribute("variant_type", trans.type.decode())
                is_main = (trans.gene in cfg.relevant_transcripts
                           and trans.id_without_version() in cfg.relevant_transcripts[trans.gene])
                w.attribute("main_transcript", "true" if is_main else "false")
                w.end_element()
            w.end_element()
        w.end_element()

        w.start_element("ReportDocument")
        w.attribute("format", "RTF")
        w.end_element()

        # the reference calls writeEndDocument() twice (:259-261) — the second
        # emits one extra trailing newline
        w.end_document()
        w.end_document()
        with open(filename, "wb") as fh:
            fh.write(w.to_bytes())

    # ---- RTF (:339-505) ----

    def variant_description(self, var) -> bytes:
        """TumorOnlyReportWorker::variantDescription (:268-287)."""
        out = []
        if b"1" in var.annotations[self.i_ncg_tsg]:
            out.append(b"TSG")
        if b"1" in var.annotations[self.i_ncg_oncogene]:
            out.append(b"Onkogen")
        germl = var.annotations[self.i_germl_class]
        if germl in (b"4", b"5"):
            out.append(b"Keimbahn: Klasse " + germl)
        vicc = var.annotations[self.i_vicc_class]
        if vicc and vicc != b"n/a":
            out.append(b"Somatik: " + _VICC_DE.get(vicc, vicc))
        return b", \\line\n".join(out)

    def exon_number(self, gene: bytes, start: int, end: int) -> bytes:
        """TumorOnlyReportWorker::exonNumber (:304-337)."""
        db = self.db
        gene_id = db.gene_id(gene)
        if gene_id == -1:
            return b""
        gene = db.gene_symbol(gene_id).encode()
        transcripts = []
        try:
            for preferred in self.config.relevant_transcripts.get(gene, []):
                name = preferred.decode() if isinstance(preferred, bytes) else preferred
                transcripts.append(db.transcript(db.transcript_id(name)))
        except Exception:
            return b""
        out = []
        for trans in transcripts:
            exon_number = _transcript_exon_number(trans, start, end)
            if exon_number <= 0:
                continue
            out.append(trans.name.encode() + b" (exon %d/%d)"
                       % (exon_number, len(trans.regions.lines)))
        return b",\\line\n".join(out)

    def write_rtf(self, file_path: str):
        db, cfg, doc = self.db, self.config, self.doc

        snv_table = RtfTable()
        for i, var in enumerate(self.variants.variants):
            if not cfg.filter_result.flags[i]:
                continue
            row = RtfTableRow()
            trans = select_somatic_transcript(
                db, self.variants.transcript_annotations(var, self.i_co_sp))
            row.add_cell(1000, trans.gene, RtfParagraph().set_italic(True))
            row.add_cell(2900, [trans.hgvs_c + b", " + trans.hgvs_p,
                                RtfText(trans.id).set_font_size(14).rtf_code()])
            row.add_cell(1700, trans.type.replace(b"_variant", b"").replace(b"&", b", "))
            row.add_cell(900, b"%.2f" % float(var.annotations[self.i_tum_af]))
            row.add_cell(3138, self.variant_description(var))
            snv_table.add_row(row)

        snv_table.sort_by_col(0)
        snv_table.prepend_row(RtfTableRow(
            [b"Gen", b"Ver\xc3\xa4nderung", b"Typ", b"Anteil", b"Beschreibung"],
            [1000, 2900, 1700, 900, 3138],
            RtfParagraph().set_bold(True).set_horizontal_alignment(b"c")).set_header())
        snv_table.prepend_row(RtfTableRow(
            b"Punktmutationen (SNVS) und kleine Insertionen/Deletionen (INDELs)",
            self.doc_max_width(),
            RtfParagraph().set_bold(True).set_horizontal_alignment(b"c"))
            .set_background_color(5).set_header())
        snv_table.set_unique_border(1, b"brdrhair")
        doc.add_part(snv_table.rtf_code())
        doc.add_part(RtfParagraph(b"").rtf_code())

        qc_mapping = db.get_qc_collection(db.processed_sample_id(cfg.ps_data["name"]))
        metadata = RtfTable()
        metadata.add_row(RtfTableRow(
            [RtfText(b"Allgemeine Informationen").set_bold(True).set_font_size(16).rtf_code(),
             RtfText(b"Qualit\xc3\xa4tsparameter").set_bold(True).set_font_size(16).rtf_code()],
            [5000, 4638]))
        today = datetime.date.today().strftime("%d.%m.%Y").encode()
        metadata.add_row(RtfTableRow(
            [b"Datum:", today, b"Coverage 100x:",
             qc_mapping.value("QC:2000030", True).to_string().encode() + b"%"],
            [2250, 2750, 2319, 2319]))
        metadata.add_row(RtfTableRow(
            [b"Analysepipeline:", self.variants.pipeline().encode(), b"Coverage 500x:",
             qc_mapping.value("QC:2000032", True).to_string().encode() + b"%"],
            [2250, 2750, 2319, 2319]))
        metadata.add_row(RtfTableRow(
            [b"Auswertungssoftware:", b"cppNGSD-TEST-CASE", b"Durchschnittliche Tiefe",
             qc_mapping.value("QC:2000025", True).to_string().encode() + b"x"],
            [2250, 2750, 2319, 2319]))
        metadata.set_unique_font_size(16)
        doc.add_part(metadata.rtf_code())
        doc.add_part(RtfParagraph(b"").rtf_code())

        if cfg.roi_regions is not None and os.path.exists(cfg.low_coverage_file):
            doc.add_part(RtfParagraph(b"Statistik:").set_bold(True).set_space_after(45)
                         .set_space_before(45).set_font_size(16).rtf_code())
            table = RtfTable()
            table.add_row(RtfTableRow([b"Zielregion:", cfg.roi_name.encode()], [1700, 7938]))
            if cfg.roi_genes:
                genes_joined = b", ".join(
                    g if isinstance(g, bytes) else g.encode() for g in cfg.roi_genes)
                table.add_row(RtfTableRow(
                    [b"Zielregion Gene (%d):" % len(cfg.roi_genes), genes_joined],
                    [1700, 7938]))
            table.add_row(RtfTableRow(
                [b"Zielregion Region:", b"%d" % len(cfg.roi_regions.lines)], [1700, 7938]))
            table.add_row(RtfTableRow(
                [b"Zielregion Basen:", b"%d" % cfg.roi_regions.base_count()], [1700, 7938]))

            from ..core.intervals import BedFile
            low_cov = BedFile.from_file(cfg.low_coverage_file)
            low_cov.intersect(cfg.roi_regions)
            table.add_row(RtfTableRow(
                [b"L\xc3\xbccken Regionen:", b"%d" % len(low_cov.lines)], [1700, 7938]))
            table.add_row(RtfTableRow(
                [b"L\xc3\xbccken Basen:", b"%d (%s%%)" % (
                    low_cov.base_count(),
                    (b"%.2f" % (100.0 * low_cov.base_count() / cfg.roi_regions.base_count())))],
                [1700, 7938]))
            table.set_unique_font_size(16)
            doc.add_part(table.rtf_code())
            doc.add_part(RtfParagraph(b"").rtf_code())

            if cfg.include_coverage_per_gap:
                from ..qc.coverage import avg_coverage
                avg_coverage(low_cov, cfg.bam_file, 1, cfg.threads, 2)

            genes, exons = [], []
            block_summary: dict[bytes, list[bytes]] = {}
            for line in low_cov.lines:
                tmp_genes = [g if isinstance(g, bytes) else g.encode()
                             for g in db.genes_overlapping(line.chr, line.start, line.end)]
                genes.append(b", ".join(tmp_genes))
                if cfg.include_exon_number_per_gap:
                    tmp_exons = []
                    for tmp_gene in tmp_genes:
                        exon = self.exon_number(tmp_gene, line.start, line.end)
                        if exon != b"":
                            tmp_exons.append(exon.decode())
                            # BedLine::toString(true) (BedFile.h:117-122)
                            block_summary.setdefault(tmp_gene, []).append(
                                b"%s:%d-%d" % (line.chr.str_normalized(True).encode(),
                                               line.start, line.end))
                    exons.append(", ".join(tmp_exons).encode())

            detailed_gaps = RtfTable()
            for i, line in enumerate(low_cov.lines):
                row = RtfTableRow()
                if genes:
                    row.add_cell(2000, genes[i], RtfParagraph().set_italic(True))
                else:
                    row.add_cell(2000, b"NA")
                pos = (line.chr.str_normalized(True).encode() + b":"
                       + b"%d" % line.start + b"-" + b"%d" % line.end)
                if exons and exons[i]:
                    pos += RtfText(b"\\line\n" + exons[i]).set_font_size(14).rtf_code()
                row.add_cell(3500, pos)
                if cfg.include_coverage_per_gap:
                    row.add_cell(4138, line.annotations[-1] + b"x")
                detailed_gaps.add_row(row)
            detailed_gaps.sort_by_cols([0, 1])
            if len(low_cov.lines) > 0:
                detailed_gaps.prepend_row(RtfTableRow(
                    [b"Gen", b"L\xc3\xbccke"], [2000, 3500],
                    RtfParagraph().set_bold(True)).set_header())
                if cfg.include_coverage_per_gap:
                    detailed_gaps.first().add_cell(4138, b"Coverage",
                                                   RtfParagraph().set_bold(True))
            detailed_gaps.set_unique_font_size(16)
            doc.add_part(detailed_gaps.rtf_code())

            if block_summary:
                block_text = []
                for gene in sorted(block_summary):
                    # QMultiMap::values returns same-key values most-recently-
                    # inserted first (NGSD_Test golden pins this order)
                    block_text.append(
                        RtfText(gene).set_italic(True).set_font_size(16).rtf_code()
                        + b": " + b", ".join(reversed(block_summary[gene])))
                doc.add_part(RtfParagraph(b"").rtf_code())
                doc.add_part(RtfParagraph(b"; ".join(block_text))
                             .set_font_size(16).rtf_code())

        doc.save(file_path)

    def doc_max_width(self) -> int:
        """RtfDocument::maxWidth (RtfDocument.h:311-314)."""
        return self.doc.width - self.doc.margin_left - self.doc.margin_right


def _transcript_exon_number(trans, start: int, end: int) -> int:
    """Transcript::exonNumber (Transcript.cpp:169-185)."""
    matches = set()
    n = len(trans.regions.lines)
    for i, line in enumerate(trans.regions.lines):
        if line.start <= end and start <= line.end:
            matches.add(i + 1 if trans.strand == "+" else n - i)
    if len(matches) == 0:
        return -1
    if len(matches) > 1:
        return -2
    return next(iter(matches))
