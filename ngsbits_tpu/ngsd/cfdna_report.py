"""Somatic cfDNA disease-course report (RTF).

Behavioral reference: ngs-bits cppNGSD/SomaticcfDNAReport.cpp:1-457 —
result table (max/mean AF + MRD verdict), patient-specific SNV table over the
latest <=3 cfDNA samples, QC table and general info; German labels, hair
borders, font size 16.

No reference goldens exist for this generator (no cppNGSD-TEST coverage), so
parity is structural: same parts, same layout constants, same number
formatting (QByteArray::number 'f'/'e' analogues).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from ..core.rtf import RtfDocument, RtfParagraph, RtfTable, RtfTableRow, RtfText


@dataclass
class CfdnaEntry:
    """CfdnaDiseaseCourseTableCfdnaEntry (NGSD.h:619-625)."""
    multi_af: float = float("nan")
    multi_alt: int = 0
    multi_ref: int = 0
    p_value: float = 0.0


@dataclass
class CfdnaLine:
    """CfdnaDiseaseCourseTableLine (NGSD.h:626-630).

    tumor_vcf_line: object with .chr/.start/.ref/.alt(i)/.id/.info(key)
    (VcfLineView-compatible). coding_anno: optional precomputed
    (gene, change_string, type_string) — the reference computes this live
    from NGSD transcripts + VariantHgvsAnnotator; callers without a genome
    inject it.
    """
    tumor_vcf_line: object = None
    cfdna_columns: list = field(default_factory=list)
    coding_anno: tuple | None = None


@dataclass
class PSInfo:
    """CfdnaDiseaseCourseTable::PSInfo (NGSD.h:631-649)."""
    name: str = ""
    ps_id: str = ""
    received_date: str = ""   # ISO yyyy-mm-dd or ""
    sampling_date: str = ""   # ISO yyyy-mm-dd or ""
    order_date: str = ""

    def sort_key(self):
        return self.sampling_date if self.sampling_date else self.received_date


@dataclass
class CfdnaDiseaseCourseTable:
    """CfdnaDiseaseCourseTable (NGSD.h:617-661)."""
    tumor_sample: PSInfo = field(default_factory=PSInfo)
    cfdna_samples: list = field(default_factory=list)
    lines: list = field(default_factory=list)
    # one {column -> [values]} mapping per cfDNA sample (TsvFile analogue)
    mrd_tables: list = field(default_factory=list)


def _fnum(v: float, digits: int) -> bytes:
    return f"{v:.{digits}f}".encode()


def format_digits(v: float, digits: int) -> bytes:
    """SomaticcfDnaReport::formatDigits — 'n/a' for nan/inf."""
    if v is None or math.isnan(v) or math.isinf(v):
        return b"n/a"
    return _fnum(v, digits)


def _iso_to_german(date: str) -> bytes:
    """yyyy-mm-dd -> dd.MM.yyyy."""
    if not date:
        return b""
    y, m, d = date.split("-")
    return f"{d}.{m}.{y}".encode()


def clean_consequence_string(consequence: bytes) -> bytes:
    """SomaticcfDnaReport::cleanConsequenceString (SomaticcfDNAReport.cpp)."""
    consequence = consequence.replace(b"_variant", b"")
    consequence = consequence.replace(b"coding_sequence&", b"")
    consequence = consequence.replace(b"&protein_altering", b"")
    consequence = consequence.replace(b"&", b", ")
    return consequence


class SomaticcfDnaReport:
    def __init__(self, data: CfdnaDiseaseCourseTable, db=None):
        self.data = data
        self.db = db
        self.doc = RtfDocument()

    # ---- data helpers ----
    def _report_lines(self):
        """Lines minus ID SNPs (variant id containing 'ID')."""
        out = []
        for line in self.data.lines:
            vid = line.tumor_vcf_line.id
            if isinstance(vid, str):
                vid = vid.encode()
            if b"ID" in vid:
                continue
            out.append(line)
        return out

    def get_max_af(self, cfdna_idx: int) -> float:
        """SomaticcfDnaReport::getMaxAf."""
        best = -1.0
        for line in self._report_lines():
            af = line.cfdna_columns[cfdna_idx].multi_af
            if af > best:
                best = af
        return best

    def get_mean_af(self, cfdna_idx: int) -> bytes:
        """SomaticcfDnaReport::getMeanAf."""
        total = count = 0.0
        for line in self._report_lines():
            total += line.cfdna_columns[cfdna_idx].multi_af
            count += 1
        return format_digits(total / count if count else float("nan"), 3)

    def get_mrd_table_value(self, type_: str, cfdna_idx: int) -> bytes:
        """SomaticcfDnaReport::getMrdTableValue."""
        col = {"MRD log10": "MRD_log10", "MRD p-value": "MRD_pval",
               "Depth": "SUM_DP", "Alt": "SUM_ALT", "Mean AF": "Mean_AF",
               "Median AF": "Median_AF"}.get(type_)
        if col is None:
            raise ValueError("Unknown type when getting MRD table value. This "
                             "should not happen. Please inform the "
                             "bioinformatics team.")
        data = self.data.mrd_tables[cfdna_idx][col]
        if len(data) != 1:
            raise ValueError(f"Tsv file with MRD values for cfDNA "
                             f"{self.data.cfdna_samples[cfdna_idx].name} has "
                             "mutiple lines. Only one expected!")
        return str(data[0]).encode()

    # ---- report parts ----
    def part_result_table(self) -> RtfTable:
        """SomaticcfDnaReport::partResultTable."""
        table = RtfTable()
        for i, sample in enumerate(self.data.cfdna_samples):
            row = RtfTableRow()
            centered = lambda: RtfParagraph().set_horizontal_alignment(b"c").set_font_size(16)
            row.add_cell(3321, sample.name.encode(), centered())
            row.add_cell(1650, _iso_to_german(sample.sampling_date), centered())

            max_af = self.get_max_af(i)
            if 0 < max_af < 0.001:
                row.add_cell(1650, b"< 0.001", centered())
            else:
                row.add_cell(1650, format_digits(max_af, 3), centered())
            row.add_cell(1650, self.get_mean_af(i), centered())

            p_value = float(self.get_mrd_table_value("MRD p-value", i))
            p_final = b"<0.01" if p_value < 0.01 else _fnum(p_value, 2)
            verdict = b"ja (p=" + p_final + b")" if p_value < 0.05 \
                else b"nein (p=" + p_final + b")"
            row.add_cell(1650, verdict, centered())
            table.add_row(row)

        table.set_unique_border(1, b"brdrhair", 2)
        header = RtfTableRow(
            [b"Probe", b"Datum", b"Max. AF*", b"Mittelwert AF*", b"Tumornachweis"],
            [3321, 1650, 1650, 1650, 1650],
            RtfParagraph().set_font_size(16).set_bold(True).set_horizontal_alignment(b"c"))
        table.prepend_row(header.set_header().set_borders(1, b"brdrhair", 2))
        table.prepend_row(RtfTableRow(
            b"Proben\xc3\xbcbersicht".decode("utf-8").encode("utf-8"),
            self.doc.max_width(),
            RtfParagraph().set_horizontal_alignment(b"c").set_bold(True).set_font_size(16))
            .set_header().set_background_color(1).set_borders(1, b"brdrhair", 2))
        return table

    def _coding_anno(self, line) -> tuple:
        """(gene, change_string, type_string) — precomputed or live via NGSD
        transcripts + HGVS annotation (getPreferedCodingAndSplicing)."""
        if line.coding_anno is not None:
            return line.coding_anno
        variant = line.tumor_vcf_line
        chr_str = variant.chr.str_normalized(False) \
            if hasattr(variant.chr, "str_normalized") else str(variant.chr)
        change = (f"{chr_str}:g.{variant.start}".encode()
                  + variant.ref + b">" + variant.alt(0))
        return (b"", change, b"intergenic")

    def part_snv_table(self, cfdna_idx_start: int, cfdna_idx_end: int) -> RtfTable:
        """SomaticcfDnaReport::partSnvTable."""
        table = RtfTable()
        cfdna_idx_end = min(cfdna_idx_end, len(self.data.cfdna_samples))
        cfdna_count = cfdna_idx_end - cfdna_idx_start
        cfdna_width = 5200 // cfdna_count
        centered = lambda: RtfParagraph().set_horizontal_alignment(b"c").set_font_size(16)

        for line in self._report_lines():
            variant = line.tumor_vcf_line
            gene, change_string, type_string = self._coding_anno(line)

            row = RtfTableRow()
            tumor_af = _fnum(float(variant.info("tumor_af") or 0.0), 2)
            row.add_cell(821, gene, centered())
            row.add_cell(1900, change_string, centered())
            row.add_cell(1300, clean_consequence_string(type_string), centered())
            row.add_cell(700, tumor_af, centered())

            for c in range(cfdna_idx_start, cfdna_idx_end):
                entry = line.cfdna_columns[c]
                af = entry.multi_af
                alt_count = entry.multi_alt
                depth = entry.multi_ref + alt_count
                if math.isnan(af):
                    row.add_cell(cfdna_width, b"not found",
                                 RtfParagraph().highlight(3))
                else:
                    if af == 0:
                        serum = b"0"
                    elif af < 0.001:
                        serum = b"< 0.001"
                    else:
                        serum = _fnum(af, 3)
                    row.add_cell(cfdna_width,
                                 serum + b" (" + str(alt_count).encode() + b"/"
                                 + str(depth).encode() + b")", centered())
            table.add_row(row)

        table.set_unique_border(1, b"brdrhair", 2)
        table.sort_by_col(0)

        header = RtfTableRow(
            [b"Gen", "Veränderung".encode(), b"Typ", b"Anteil Tumor"],
            [821, 1900, 1300, 700],
            RtfParagraph().set_font_size(16).set_bold(True).set_horizontal_alignment(b"c"))
        for i in range(cfdna_idx_start, cfdna_idx_end):
            sample = self.data.cfdna_samples[i]
            date = _iso_to_german(sample.sampling_date)
            header.add_cell(
                cfdna_width,
                b"Anteil Plasma\n\\line\n" + sample.name.encode()
                + b"\n\\line\n(" + date + b")",
                RtfParagraph().set_font_size(16).set_bold(True).set_horizontal_alignment(b"c"))
        table.prepend_row(header.set_header().set_borders(1, b"brdrhair", 2))
        table.prepend_row(RtfTableRow(
            b"Punktmutationen (SNVs) und kleine Insertionen/Deletionen (INDELs)",
            self.doc.max_width(),
            RtfParagraph().set_horizontal_alignment(b"c").set_bold(True).set_font_size(16))
            .set_header().set_background_color(1).set_borders(1, b"brdrhair", 2))
        return table

    def part_snv_explanation(self) -> RtfParagraph:
        """SomaticcfDnaReport::partSnvExplanation."""
        def bold(text: bytes) -> bytes:
            return RtfText(text).set_bold(True).set_font_size(16).rtf_code()

        out = b""
        out += bold(b"COV:")
        out += b" Anzahl der Reads an der untersuchten genomischen Position, "
        out += bold(b"SNV:")
        out += b" Punktmutationen (Single Nucleotide Variant), "
        out += bold(b"INDEL:")
        out += b" Insertionen/Deletionen, "
        out += bold("Veränderung:".encode()) + b" Kodierende Position und Auswirkung auf das Protein, "
        out += (bold(b"Anteil Tumor:") + b" Allelfrequenze der gelisteten Variante "
                b"(SNV, INDEL) in der Tumorprobe "
                + self.data.tumor_sample.name.encode() + b", ")
        out += (bold(b"Anteil Plasma:") + b" Anteil der Allele mit der gelisteten "
                b"Variante (SNV, INDEL) in den untersuchten Proben. In Klammern "
                b"die Anzahl der Reads mit mind. einem Duplikat mit Variante / "
                b"gesamte Anzahl der Reads mit mind. einem Duplikat, ")
        out += bold(b"n.d.") + b" nicht detektiert, " + bold(b"n/a:") + b" nicht analysiert.\n\\line\n"
        return RtfParagraph(out).set_font_size(16).set_horizontal_alignment(b"j")

    def part_general_genetic_table(self) -> RtfTable:
        """SomaticcfDnaReport::partGeneralGeneticTable — QC per cfDNA sample
        (depth QC:2000025, 1-duplicate depth QC:2000071, error rate QC:2000086)."""
        table = RtfTable()
        table.add_row(RtfTableRow(
            b"Qualit\xc3\xa4tsparameter".decode("utf-8").encode("utf-8"),
            self.doc.max_width(),
            RtfParagraph().set_horizontal_alignment(b"c").set_bold(True).set_font_size(16))
            .set_header().set_background_color(1).set_borders(1, b"brdrhair", 2))
        header = RtfTableRow(
            [b"Probe", b"Durchschnittliche Tiefe:",
             b"Durchschnittliche Tiefe:\n\\line\n"
             + RtfText(b"(min. 1 Duplikat)").set_font_size(14).rtf_code(),
             b"Fehlerrate:\n\\line\n"
             + RtfText(b"(min. 1 Duplikat)").set_font_size(14).rtf_code()],
            [2121, 2600, 2600, 2600],
            RtfParagraph().set_font_size(16).set_bold(True).set_horizontal_alignment(b"c"))
        table.add_row(header.set_header().set_borders(1, b"brdrhair", 2))

        for sample in self.data.cfdna_samples:
            qc = self.db.get_qc_data(sample.ps_id)
            d_depth = float(qc.value("QC:2000071", True).value)
            error = float(qc.value("QC:2000086", True).value)
            depth = float(qc.value("QC:2000025", True).value)
            mantissa, _, exponent = f"{error:.2e}".partition("e")
            error_str = (mantissa.encode() + b"x10{\\super "
                         + str(int(exponent)).encode() + b"}")
            table.add_row(RtfTableRow(
                [sample.name.encode(), format_digits(depth, 0),
                 format_digits(d_depth, 0), error_str],
                [2121, 2600, 2600, 2600],
                RtfParagraph().set_font_size(16).set_horizontal_alignment(b"c")))

        table.set_unique_border(1, b"brdrhair", 2)
        return table

    def part_general_info(self) -> RtfTable:
        """SomaticcfDnaReport::partGeneralInfo."""
        table = RtfTable()
        ids = [s.name.encode() for s in self.data.cfdna_samples]
        systems = sorted({self.db.get_processed_sample_data(s.ps_id).processing_system
                          for s in self.data.cfdna_samples}) if self.db else []
        small = lambda: RtfParagraph().set_font_size(14)
        table.add_row(RtfTableRow(
            [b"Tumor-ID: ", self.data.tumor_sample.name.encode()],
            [2000, 7921], small()))
        table.add_row(RtfTableRow(
            [b"Plasma-ID(s): ", b", ".join(ids)], [2000, 7921], small()))
        table.add_row(RtfTableRow(
            [b"Prozessierungssystem:",
             b"Patientenspezifisches Panel "
             + ", ".join(systems).encode()], [2000, 7921], small()))
        return table

    # ---- top-level ----
    def write_rtf(self, out_file: str):
        """SomaticcfDnaReport::writeRtf (SomaticcfDNAReport.cpp:21-57)."""
        self.doc.default_font_size = 16
        self.doc.add_color(191, 191, 191)
        self.doc.add_color(161, 161, 161)
        self.doc.add_color(255, 255, 0)
        self.doc.add_color(242, 242, 242)
        self.doc.add_color(255, 0, 0)

        self.doc.add_part(self.part_result_table().rtf_code())
        self.doc.add_part(RtfParagraph(
            b"*AF: Allelfrequenz, Anteil mutierte Fragmente")
            .set_font_size(16).set_horizontal_alignment(b"j").rtf_code())
        self.doc.add_part(RtfParagraph(b"").rtf_code())

        n = len(self.data.cfdna_samples)
        start = 0 if n <= 3 else n - 3
        self.doc.add_part(RtfParagraph(
            b"Patientenspezifische somatische Variante(n):")
            .set_font_size(18).set_bold(True).rtf_code())
        self.doc.add_part(self.part_snv_table(start, n).rtf_code())
        self.doc.add_part(self.part_snv_explanation().rtf_code())
        self.doc.add_part(RtfParagraph(b"").rtf_code())

        if self.db is not None:
            self.doc.add_part(self.part_general_genetic_table().rtf_code())
            self.doc.add_part(RtfParagraph(b"").rtf_code())
            self.doc.add_part(RtfParagraph(b"Technischer Report")
                              .set_font_size(18).set_bold(True).rtf_code())
            self.doc.add_part(self.part_general_info().rtf_code())

        self.doc.save(out_file)
