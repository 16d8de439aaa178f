"""Somatic RNA report (RTF).

Behavioral reference: ngs-bits cppNGSD/SomaticRnaReport.cpp:1-1035 —
fusion/SV tables from the arriba TSV, SNV/CNV tables joined with RNA
expression (TPM, HPA reference, cohort mean, log2fc/p-value), pathway gene
expression, top-10 differential expression, German translation dictionary.

No reference goldens exist for this generator (no cppNGSD-TEST coverage);
parity is structural — same parts, layout widths and number formats.

The reference pulls live data from NGSD + BAM (VICC classification, gene
roles, RNA depth/AF per variant); here those inputs are injected via the
``SomaticRnaReportData`` fields so the generator itself stays testable
without a database or genome.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ..core.rtf import RtfDocument, RtfParagraph, RtfTable, RtfTableRow, RtfText

# SomaticRnaReport::trans (SomaticRnaReport.cpp:823-905)
TRANS_EN2DE = {
    "adipose tissue": "Fettgewebe", "adrenal gland": "Nebenniere",
    "appendix": "Blinddarm", "B-cells": "B-Zellen",
    "bone marrow": "Knochenmark", "breast": "Brust",
    "cerebral cortex": "Großhirnrinde", "cervix, uterine": "Gebärmutterhals",
    "colon": "Dickdarm", "dendritic cells": "dendritische Zellen",
    "duodenum": "Zwölffingerdarm", "endometrium": "Endometrium",
    "epididymis": "Nebenhoden", "esophagus": "Speiseröhre",
    "fallopian tube": "Eileiter", "gallbladder": "Gallenblase",
    "granulocytes": "Granulozyten", "heart muscle": "Herzmuskel",
    "kidney": "Niere", "liver": "Leber", "lung": "Lunge",
    "lymph node": "Lymphknoten", "monocytes": "Monozyten",
    "NK-cells": "NK-Zellen", "ovary": "Eierstock", "pancreas": "Pankreas",
    "parathyroid gland": "Nebenschilddrüse", "placenta": "Plazenta",
    "prostate": "Prostata", "rectum": "Rektum",
    "salivary gland": "Speicheldrüse", "seminal vesicle": "Bläschendrüse",
    "skeletal muscle": "Skelettmuskel", "skin": "Haut",
    "small intestine": "Dünndarm", "smooth muscle": "glatter Muskel",
    "spleen": "Milz", "stomach": "Magen", "T-cells": "T-Zellen",
    "testis": "Hoden", "thyroid gland": "Schilddrüse", "tonsil": "Tonsilien",
    "urinary bladder": "Harnblase", "activating": "aktivierend",
    "likely_activating": "möglicherweise aktivierend",
    "inactivating": "inaktivierend",
    "likely_inactivating": "möglicherweise inaktivierend",
    "unclear": "unklare Bedeutung",
    "test_dependent": "testabhängige Bedeutung",
    "translocation": "Translokation",
    "translocation/5'-5'": "Translokation/5'-5'", "inversion": "Inversion",
    "inversion/3'-3'": "Inversion/3'-3'", "inversion/5'-5'": "Inversion/5'-5'",
    "duplication": "Duplikation", "duplication/5'-5'": "Duplikation/5'-5'",
    "deletion/read-through": "Deletion/Read-through",
    "deletion/read-through/3'-3'": "Deletion/Read-through/3'-3'",
    "deletion": "Deletion", "FGFR signaling pathway": "FGFR Signalweg",
    "immune response": "Immunantwort", "promoter activity": "Promotoraktivität",
    "RAS signaling pathway": "RAS Signalweg",
    "RTK signaling pathway": "RTK Signalweg",
    "TNF signaling pathway": "TNF Signalweg", "DNA repair": "DNA-Reparatur",
    "DNA replication": "DNA-Replikation", "epigenetics": "Epigenetik",
    "CDK4/6 signaling pathway": "CDK4/6 Signalweg",
    "mTOR signaling pathway": "mTOR Signalweg",
}


def trans(orig_entry: str, font_size: int = -1) -> bytes:
    """SomaticRnaReport::trans — highlighted italic original if unknown."""
    if orig_entry not in TRANS_EN2DE:
        t = RtfText(orig_entry.encode()).highlight(3).set_italic(True)
        if font_size != -1:
            t.set_font_size(font_size)
        return t.rtf_code()
    return TRANS_EN2DE[orig_entry].encode()


def format_digits(v: float, digits: int = 2) -> bytes:
    """SomaticRnaReport::formatDigits."""
    if v is None or math.isnan(v) or math.isinf(v):
        return b"n/a"
    return f"{v:.{digits}f}".encode()


def rank(tpm: float, mean_tpm: float, gene_role: str) -> int:
    """SomaticRnaReport::rank (SomaticRnaReport.cpp:235-251) — 1 = expression
    change fits the gene role, 2 = unremarkable, 3 = not assessable."""
    def invalid(v):
        return v is None or math.isnan(v) or math.isinf(v)

    if invalid(tpm) or invalid(mean_tpm) or tpm < 10:
        return 3
    ratio = tpm / mean_tpm
    if gene_role == "loss_of_function" and ratio <= 0.8:
        return 1
    if gene_role == "activating" and ratio >= 1.5:
        return 1
    return 2


@dataclass
class ArribaSv:
    """SomaticRnaReport::arriba_sv (SomaticRnaReport.h:53-66)."""
    gene_left: bytes = b""
    gene_right: bytes = b""
    transcript_left: bytes = b""
    transcript_right: bytes = b""
    breakpoint_left: bytes = b""
    breakpoint_right: bytes = b""
    type: bytes = b""
    reading_frame: bytes = b""


@dataclass
class ExpressionData:
    """SomaticRnaReport::ExpressionData (SomaticRnaReport.h:88-110)."""
    symbol: bytes = b""
    pathway: bytes = b""
    role: str = ""          # activating / loss_of_function / ambiguous / ""
    tumor_tpm: float = float("nan")
    hpa_ref_tpm: float = float("nan")
    cohort_mean_tpm: float = float("nan")
    log2fc: float = float("nan")
    pvalue: float = float("nan")


@dataclass
class RnaSnvRow:
    """Pre-joined SNV line: the reference derives these live from NGSD VICC
    data + transcript selection + RNA BAM depth (partSnvTable)."""
    gene: bytes = b""
    hgvs_c: bytes = b""
    hgvs_p: bytes = b""
    transcript_id: bytes = b""
    type: bytes = b""
    tumor_af: float = 0.0
    rna_depth: int = 0
    rna_af: float = float("nan")
    vicc_result: str = "ONCOGENIC"  # or LIKELY_ONCOGENIC / UNCERTAIN_SIGNIFICANCE


@dataclass
class RnaCnvRow:
    gene: bytes = b""
    chr: bytes = b""
    cnv_type: bytes = b""
    copy_number: int = 2
    tumor_clonality: float = 0.0
    role: str = ""


@dataclass
class SomaticRnaReportData:
    """SomaticRnaReportData (SomaticRnaReport.h:11-33) + injected NGSD joins."""
    rna_ps_name: str = ""
    tumor_ps: str = ""
    normal_ps: str = ""
    rna_hpa_ref_tissue: str = ""
    cohort_size: int = 0
    expression_correlation: float = float("nan")
    icd10: str = ""
    phenotype: str = ""
    evaluation_date: str = ""  # ISO
    pipeline: str = "n/a"
    svs: list = field(default_factory=list)            # ArribaSv
    snv_rows: list = field(default_factory=list)       # RnaSnvRow
    cnv_rows: list = field(default_factory=list)       # RnaCnvRow
    pathways: list = field(default_factory=list)       # ExpressionData
    expression_per_gene: dict = field(default_factory=dict)  # symbol -> ExpressionData
    high_confidence_expression: list = field(default_factory=list)


def load_arriba_fusions(filename: str) -> list:
    """Fusion TSV loader (SomaticRnaReport ctor, SomaticRnaReport.cpp:44-63)."""
    out = []
    with open(filename, "rb") as fh:
        header = None
        for raw in fh:
            line = raw.rstrip(b"\r\n")
            if not line:
                continue
            if line.startswith(b"#"):
                header = line[1:].split(b"\t")
                continue
            if header is None:
                header = line.split(b"\t")
                continue
            parts = line.split(b"\t")
            idx = {name.decode(): i for i, name in enumerate(header)}
            out.append(ArribaSv(
                gene_left=parts[idx["gene1"]], gene_right=parts[idx["gene2"]],
                transcript_left=parts[idx["transcript_id1"]],
                transcript_right=parts[idx["transcript_id2"]],
                breakpoint_left=parts[idx["breakpoint1"]],
                breakpoint_right=parts[idx["breakpoint2"]],
                type=parts[idx["type"]],
                reading_frame=parts[idx["reading_frame"]]))
    return out


class SomaticRnaReport:
    def __init__(self, data: SomaticRnaReportData):
        self.data = data
        self.doc = RtfDocument()

    def expression_change(self, d: ExpressionData) -> bytes:
        """SomaticRnaReport::expressionChange."""
        if d.pvalue < 0.05:
            return format_digits(2.0 ** d.log2fc, 1) + b"\\super*"
        if d.tumor_tpm > 10 and self.data.cohort_size > 5:
            return format_digits(2.0 ** d.log2fc, 1)
        return b"-"

    # ---- parts ----
    def part_fusions(self) -> RtfTable:
        """SomaticRnaReport::partFusions."""
        table = RtfTable()
        table.add_row(RtfTableRow(
            b"Fusionen", self.doc.max_width(),
            RtfParagraph().set_horizontal_alignment(b"c").set_bold(True).set_font_size(16))
            .set_header().set_background_color(1))
        table.add_row(RtfTableRow(
            [b"Strukturvariante", b"Transkript links", b"Bruchpunkt Gen 1",
             b"Transkript rechts", b"Bruchpunkt Gen 2", b"Typ", b"Leseraster"],
            [1600, 1400, 1400, 1400, 1400, 1700, 1021],
            RtfParagraph().set_bold(True).set_horizontal_alignment(b"c").set_font_size(16))
            .set_header())
        for sv in self.data.svs:
            row = RtfTableRow()
            row.add_cell(1600, sv.gene_left + b"::" + sv.gene_right,
                         RtfParagraph().set_italic(True).set_font_size(16))
            row.add_cell(1400, sv.transcript_left, RtfParagraph().set_font_size(16))
            row.add_cell(1400, sv.breakpoint_left, RtfParagraph().set_font_size(16))
            row.add_cell(1400, sv.transcript_right, RtfParagraph().set_font_size(16))
            row.add_cell(1400, sv.breakpoint_right, RtfParagraph().set_font_size(16))
            row.add_cell(1700, trans(sv.type.decode()), RtfParagraph().set_font_size(16))
            row.add_cell(1021, sv.reading_frame, RtfParagraph().set_font_size(16))
            table.add_row(row)
        table.set_unique_border(1, b"brdrhair", 2)
        return table

    def part_svs(self) -> RtfTable:
        """SomaticRnaReport::partSVs — deletions and intra-gene duplications."""
        table = RtfTable()
        table.add_row(RtfTableRow(
            b"Strukturvarianten", self.doc.max_width(),
            RtfParagraph().set_horizontal_alignment(b"c").set_bold(True).set_font_size(16))
            .set_header().set_background_color(1))
        table.add_row(RtfTableRow(
            [b"Gen", b"Transkript", b"Bruchpunkt 1", b"Bruchpunkt 2",
             b"Beschreibung"], [1600, 1800, 1400, 1800, 3321],
            RtfParagraph().set_bold(True).set_horizontal_alignment(b"c").set_font_size(16))
            .set_header())
        for sv in self.data.svs:
            if not (b"duplication" in sv.type and sv.gene_left == sv.gene_right) \
                    and b"deletion" not in sv.type:
                continue
            row = RtfTableRow()
            row.add_cell(1600, sv.gene_right,
                         RtfParagraph().set_italic(True).set_font_size(16))
            row.add_cell(1800, sv.transcript_right, RtfParagraph().set_font_size(16))
            row.add_cell(1400, sv.breakpoint_left, RtfParagraph().set_font_size(16))
            row.add_cell(1800, sv.breakpoint_right, RtfParagraph().set_font_size(16))
            row.add_cell(3321, trans(sv.type.decode()), RtfParagraph().set_font_size(16))
            table.add_row(row)
        if len(table) == 2:
            return RtfTable()
        table.set_unique_border(1, b"brdrhair", 2)
        return table

    def _snv_like_table(self, vicc_filter) -> RtfTable:
        """Shared SNV-table body (partSnvTable / uncertainSnvTable)."""
        table = RtfTable()
        for row_data in self.data.snv_rows:
            if not vicc_filter(row_data.vicc_result):
                continue
            d = self.data.expression_per_gene.get(row_data.gene, ExpressionData())
            row = RtfTableRow()
            row.add_cell(800, row_data.gene,
                         RtfParagraph().set_italic(True).set_bold(True).set_font_size(16))
            if not row_data.hgvs_c and not row_data.hgvs_p:
                row.add_cell(1900, [RtfText(b"???").set_font_size(16).highlight(3).rtf_code(),
                                    RtfText(row_data.transcript_id).set_font_size(14).rtf_code()])
            else:
                row.add_cell(1900, [RtfText(row_data.hgvs_c + b", " + row_data.hgvs_p)
                                    .set_font_size(16).rtf_code(),
                                    RtfText(row_data.transcript_id).set_font_size(14).rtf_code()])
            row.add_cell(1300, row_data.type.replace(b"_variant", b""),
                         RtfParagraph().set_font_size(16))
            centered = lambda: RtfParagraph().set_font_size(16).set_horizontal_alignment(b"c")
            row.add_cell(700, format_digits(row_data.tumor_af, 2), centered())
            if row_data.rna_depth > 4:
                row.add_cell(700, format_digits(row_data.rna_af, 2), centered())
            else:
                row.add_cell(700, b"n/a", centered())
            row.add_cell(1200, format_digits(d.tumor_tpm), centered())
            row.add_cell(1200, format_digits(d.hpa_ref_tpm)
                         if not math.isnan(d.hpa_ref_tpm) else b"-", centered())
            row.add_cell(1000, format_digits(d.cohort_mean_tpm), centered())
            row.add_cell(1121, self.expression_change(d), centered())
            for i in range(4, len(row)):
                row[i].set_background_color(4)
            table.add_row(row)
        table.sort_by_col(0)
        return table

    def part_snv_table(self) -> RtfTable:
        """SomaticRnaReport::partSnvTable — (likely) oncogenic variants."""
        table = self._snv_like_table(
            lambda r: r in ("ONCOGENIC", "LIKELY_ONCOGENIC"))
        header = RtfTableRow(
            [b"Gen", "Veränderung".encode(), b"Typ", b"Anteil", b"Anteil",
             b"Tumorprobe TPM", b"Normalprobe TPM",
             b"Tumortyp\n\\line\nMW-TPM", "Veränderung\n\\line\n(x-fach)".encode()],
            [800, 1900, 1300, 700, 700, 1200, 1200, 1000, 1121],
            RtfParagraph().set_font_size(16).set_bold(True).set_horizontal_alignment(b"c")) \
            .set_header().set_borders(1, b"brdrhair", 2)
        for i in range(4, len(header)):
            header[i].set_background_color(4)
        table.prepend_row(header)
        sub_header = RtfTableRow(
            [b"DNA", b"RNA"], [4700, 5221],
            RtfParagraph().set_font_size(16).set_horizontal_alignment(b"c").set_bold(True)) \
            .set_borders(1, b"brdrhair", 2)
        sub_header[1].set_background_color(4)
        table.prepend_row(sub_header)
        table.prepend_row(RtfTableRow(
            b"Punktmutationen (SNVs) und kleine Insertionen/Deletionen (INDELs) ("
            + self.data.rna_ps_name.encode() + b"-" + self.data.tumor_ps.encode()
            + b"-" + self.data.normal_ps.encode() + b")",
            self.doc.max_width(),
            RtfParagraph().set_horizontal_alignment(b"c").set_bold(True).set_font_size(16))
            .set_header().set_background_color(1).set_borders(1, b"brdrhair", 2))
        table.set_unique_border(1, b"brdrhair", 2)
        return table

    def uncertain_snv_table(self) -> RtfTable:
        """SomaticRnaReport::uncertainSnvTable — VUS variants."""
        table = self._snv_like_table(lambda r: r == "UNCERTAIN_SIGNIFICANCE")
        header = RtfTableRow(
            [b"Gen", "Veränderung".encode(), b"Typ", b"Anteil", b"Anteil",
             b"Tumorprobe TPM", b"Normalprobe TPM",
             b"Tumortyp\n\\line\nMW-TPM", "Veränderung\n\\line\n(x-fach)".encode()],
            [800, 1900, 1300, 700, 700, 1200, 1200, 1000, 1121],
            RtfParagraph().set_font_size(16).set_bold(True).set_horizontal_alignment(b"c")) \
            .set_header().set_borders(1, b"brdrhair", 2)
        for i in range(4, len(header)):
            header[i].set_background_color(4)
        table.prepend_row(header)
        table.set_unique_border(1, b"brdrhair", 2)
        return table

    def part_cnv_table(self) -> RtfTable:
        """SomaticRnaReport::partCnvTable."""
        from .somatic_report_helper import cnv_type_description

        table = RtfTable()
        for cnv in self.data.cnv_rows:
            d = self.data.expression_per_gene.get(cnv.gene, ExpressionData())
            centered = lambda: RtfParagraph().set_font_size(16).set_horizontal_alignment(b"c")
            row = RtfTableRow()
            row.add_cell(800, cnv.gene,
                         RtfParagraph().set_bold(True).set_italic(True).set_font_size(16))
            row.add_cell(1900, cnv.chr + b" (" + cnv.cnv_type.strip() + b")",
                         RtfParagraph().set_font_size(16))
            row.add_cell(1300, cnv_type_description(cnv.copy_number, True),
                         RtfParagraph().set_font_size(16))
            row.add_cell(700, f"{cnv.tumor_clonality:.2f}".encode(), centered())
            row.add_cell(1100, format_digits(d.tumor_tpm), centered())
            row.add_cell(1000, format_digits(d.hpa_ref_tpm)
                         if not math.isnan(d.hpa_ref_tpm) else b"-", centered())
            row.add_cell(1000, str(rank(d.tumor_tpm, d.hpa_ref_tpm,
                                        cnv.role)).encode(), centered())
            row.add_cell(1000, format_digits(d.cohort_mean_tpm), centered())
            if d.tumor_tpm > 10 and d.cohort_mean_tpm > 10:
                row.add_cell(1121, self.expression_change(d), centered())
            else:
                row.add_cell(1121, b"-", centered())
            for i in range(4, len(row)):
                row[i].set_background_color(4)
            table.add_row(row)

        table.sort_by_cols([6, 0])

        header = RtfTableRow(
            [b"Gen", b"Position", b"CNV", b"Anteil", b"Tumorprobe TPM",
             b"Normalprobe TPM", b"Bewertung", b"Tumortyp\n\\line\nMW-TPM",
             "Veränderung\n\\line\n(x-fach)".encode()],
            [800, 1900, 1300, 700, 1100, 1000, 1000, 1000, 1121],
            RtfParagraph().set_font_size(16).set_bold(True).set_horizontal_alignment(b"c")) \
            .set_header()
        for i in range(4, len(header)):
            header[i].set_background_color(4)
        table.prepend_row(header)
        subheader = RtfTableRow(
            [b"DNA", b"RNA"], [4700, 5221],
            RtfParagraph().set_font_size(16).set_bold(True).set_horizontal_alignment(b"c")) \
            .set_header()
        subheader[1].set_background_color(4)
        table.prepend_row(subheader)
        table.prepend_row(RtfTableRow(
            "Kopienzahlveränderungen (CNVs)".encode(), self.doc.max_width(),
            RtfParagraph().set_horizontal_alignment(b"c").set_bold(True).set_font_size(16))
            .set_header().set_background_color(1).set_borders(1, b"brdrhair", 2))
        table.set_unique_border(1, b"brdrhair", 2)
        return table

    def part_gene_expression(self) -> RtfTable:
        """SomaticRnaReport::partGeneExpression — pathway panel."""
        table = RtfTable()
        table.add_row(RtfTableRow(
            b"Expression ausgew\xc3\xa4hlter Gene".decode("utf-8").encode("utf-8"), 9921,
            RtfParagraph().set_bold(True).set_horizontal_alignment(b"c"))
            .set_header().set_background_color(1).set_borders(1, b"brdrhair", 2))
        header = RtfTableRow(
            [b"Gen", "Pathogenität".encode(), b"Signalweg", b"Tumorprobe TPM",
             b"Normalprobe TPM", b"Bewertung", b"Tumortyp\n\\line\nMW-TPM",
             "Veränderung\n\\line\n(x-fach)".encode()],
            [1237, 1237, 1958, 1137, 1137, 937, 1137, 1141],
            RtfParagraph().set_horizontal_alignment(b"c").set_bold(True)) \
            .set_header().set_borders(1, b"brdrhair", 2)
        for i in range(2, len(header)):
            header[i].set_background_color(4)
        table.add_row(header)

        for d in sorted(self.data.pathways, key=lambda x: x.symbol):
            centered = lambda: RtfParagraph().set_horizontal_alignment(b"c")
            row = RtfTableRow()
            row.add_cell(1237, d.symbol)
            pathogenicity = b"-"
            if d.role == "activating":
                pathogenicity = b"GoF"
            elif d.role == "loss_of_function":
                pathogenicity = b"LoF"
            row.add_cell(1237, pathogenicity)
            row.add_cell(1958, d.pathway)
            row.add_cell(1137, format_digits(d.tumor_tpm), centered())
            row.add_cell(1137, format_digits(d.hpa_ref_tpm)
                         if not math.isnan(d.hpa_ref_tpm) else b"-", centered())
            row.add_cell(937, str(rank(d.tumor_tpm, d.hpa_ref_tpm, d.role)).encode(),
                         centered())
            row.add_cell(1137, format_digits(d.cohort_mean_tpm), centered())
            if d.tumor_tpm > 10 and d.cohort_mean_tpm > 10:
                row.add_cell(1141, self.expression_change(d), centered())
            else:
                row.add_cell(1141, b"-", centered())
            row.set_borders(1, b"brdrhair", 2)
            for i in range(2, len(row)):
                row[i].set_background_color(4)
            table.add_row(row)
        table.set_unique_font_size(16)
        return table

    def part_top10_expression(self) -> bytes:
        """SomaticRnaReport::partTop10Expression."""
        activating = [d for d in self.data.high_confidence_expression
                      if d.role == "activating" and d.tumor_tpm >= 10
                      and d.cohort_mean_tpm > 10]
        lof = [d for d in self.data.high_confidence_expression
               if d.role == "loss_of_function" and d.tumor_tpm >= 10
               and d.cohort_mean_tpm > 10]
        activating.sort(key=lambda d: -d.log2fc)
        activating.sort(key=lambda d: rank(d.tumor_tpm, d.hpa_ref_tpm, d.role))
        lof.sort(key=lambda d: d.log2fc)
        lof.sort(key=lambda d: rank(d.tumor_tpm, d.hpa_ref_tpm, d.role))
        reported = activating[:10] + lof[:10]

        table = RtfTable()
        table.add_row(RtfTableRow(
            "Top 10 Gene mit veränderter Expression".encode(), 9921,
            RtfParagraph().set_font_size(16).set_bold(True).set_horizontal_alignment(b"c"))
            .set_header().set_background_color(1).set_borders(1, b"brdrhair", 2))
        header = RtfTableRow(
            [b"Gen", "Pathogenität".encode(), b"Tumorprobe TPM",
             b"Normalprobe TPM", b"Bewertung", b"Tumortyp MW-TPM",
             "Veränderung (x-fach)".encode()],
            [1488, 1488, 1388, 1388, 1188, 1488, 1492],
            RtfParagraph().set_horizontal_alignment(b"c").set_font_size(16).set_bold(True)) \
            .set_header().set_borders(1, b"brdrhair", 2)
        for i in range(2, len(header)):
            header[i].set_background_color(4)
        table.add_row(header)

        for d in reported:
            centered = lambda: RtfParagraph().set_font_size(16).set_horizontal_alignment(b"c")
            row = RtfTableRow()
            row.add_cell(1488, d.symbol,
                         RtfParagraph().set_italic(True).set_font_size(16)
                         .set_horizontal_alignment(b"c"))
            mode = b"n/a"
            if d.role == "activating":
                mode = b"GoF"
            elif d.role == "loss_of_function":
                mode = b"LoF"
            row.add_cell(1488, mode, centered())
            row.add_cell(1388, format_digits(d.tumor_tpm), centered())
            row.add_cell(1388, format_digits(d.hpa_ref_tpm)
                         if not math.isnan(d.hpa_ref_tpm) else b"-", centered())
            row.add_cell(1188, str(rank(d.tumor_tpm, d.hpa_ref_tpm, d.role)).encode(),
                         centered())
            row.add_cell(1488, format_digits(d.cohort_mean_tpm), centered())
            row.add_cell(1492, format_digits(2.0 ** d.log2fc, 1), centered())
            for i in range(2, len(row)):
                row[i].set_background_color(4)
            row.set_borders(1, b"brdrhair", 2)
            table.add_row(row)

        if len(table) == 2:
            return RtfParagraph(b"").rtf_code()
        intro = RtfParagraph(
            b"Top 10 Genlisten mit signifikant ver\xc3\xa4nderter Expression"
            .decode("utf-8").encode("utf-8")) \
            .set_font_size(18).set_bold(True).rtf_code()
        return intro + b"\n" + table.rtf_code()

    def part_general_info(self, qc: dict | None = None) -> RtfTable:
        """SomaticRnaReport::partGeneralInfo — qc maps QC accession->string."""
        qc = qc or {}
        table = RtfTable()
        small = lambda: RtfParagraph().set_font_size(14)
        table.add_row(RtfTableRow(
            [b"Allgemeine Informationen", b"Qualit\xc3\xa4tsparameter"
             .decode("utf-8").encode("utf-8")],
            [5061, 4861], RtfParagraph().set_font_size(18).set_bold(True)).set_header())

        def date_german(iso):
            if not iso:
                return b""
            y, m, d = iso.split("-")
            return f"{d}.{m}.{y}".encode()

        widths = [2000, 3061, 2500, 2361]
        table.add_row(RtfTableRow(
            [b"Auswertungsdatum:", date_german(self.data.evaluation_date),
             b"Analysepipeline:", self.data.pipeline.encode()], widths, small()))
        table.add_row(RtfTableRow(
            [b"Proben-ID (Tumor-RNA):", self.data.rna_ps_name.encode(),
             b"Anzahl Reads ", qc.get("QC:2000005", "").encode()], widths, small()))
        table.add_row(RtfTableRow(
            [b"ICD10:", self.data.icd10.encode(),
             b"Target Region Read Depth:",
             qc.get("QC:2000025", "").encode() + b"x"], widths, small()))
        table.add_row(RtfTableRow(
            [b"Tumortyp:", self.data.phenotype.encode(),
             b"House Keeping Genes 10x Percentage:",
             qc.get("QC:2000102", "").encode() + b"%"], widths, small()))
        table.add_row(RtfTableRow(
            [b"Korrelation der Expression mit der Tumorentit\xc3\xa4t:"
             .decode("utf-8").encode("utf-8"),
             format_digits(self.data.expression_correlation, 2)
             + b" (n=" + str(self.data.cohort_size).encode() + b")", b"", b""],
            widths, small()))
        return table

    # ---- top-level ----
    def write_rtf(self, out_file: str, qc: dict | None = None):
        """SomaticRnaReport::writeRtf (SomaticRnaReport.cpp:914-1030)."""
        self.doc.default_font_size = 16
        self.doc.add_color(191, 191, 191)
        self.doc.add_color(161, 161, 161)
        self.doc.add_color(255, 255, 0)
        self.doc.add_color(242, 242, 242)
        self.doc.add_color(255, 0, 0)

        has_oncogenic = any(r.vicc_result in ("ONCOGENIC", "LIKELY_ONCOGENIC")
                            for r in self.data.snv_rows)
        if has_oncogenic:
            self.doc.add_part(RtfParagraph(
                b"Potentiell relevante somatische Ver\xc3\xa4nderungen:"
                .decode("utf-8").encode("utf-8"))
                .set_font_size(18).set_bold(True).rtf_code())
            self.doc.add_part(self.part_snv_table().rtf_code())
        else:
            self.doc.add_part(RtfParagraph(b"Es wurden keine SNVs detektiert.").rtf_code())
        self.doc.add_part(RtfParagraph(b"").rtf_code())

        if self.data.cnv_rows:
            self.doc.add_part(self.part_cnv_table().rtf_code())
        self.doc.add_part(RtfParagraph(b"").rtf_code())
        self.doc.new_page()

        if self.data.svs:
            self.doc.add_part(RtfParagraph(b"Strukturvarianten:")
                              .set_font_size(18).set_bold(True).rtf_code())
            self.doc.add_part(self.part_fusions().rtf_code())
            self.doc.add_part(RtfParagraph(b"").rtf_code())
            svs_part = self.part_svs()
            if len(svs_part):
                self.doc.add_part(svs_part.rtf_code())
                self.doc.add_part(RtfParagraph(b"").rtf_code())
        else:
            self.doc.add_part(RtfParagraph(
                b"Es wurden keine Strukturvarianten detektiert.").rtf_code())
            self.doc.add_part(RtfParagraph(
                b"Es wurden keine Fusionen detektiert.").rtf_code())

        self.doc.add_part(self.part_gene_expression().rtf_code())
        self.doc.new_page()
        self.doc.add_part(self.part_top10_expression())
        self.doc.add_part(RtfParagraph(b"").rtf_code())
        self.doc.new_page()

        self.doc.add_part(RtfParagraph(
            b"Expression der Gene mit unklaren Varianten")
            .set_font_size(18).set_bold(True).rtf_code())
        self.doc.add_part(self.uncertain_snv_table().rtf_code())
        self.doc.add_part(RtfParagraph(b"").rtf_code())
        self.doc.new_page()

        self.doc.add_part(self.part_general_info(qc).rtf_code())
        self.doc.save(out_file)
