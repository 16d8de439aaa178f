"""Gene/sequence panel renderer (headless).

Behavioral reference: cppVISUAL/GenePanel.{h,cpp} — shows the reference
sequence (per-base colors, letters when zoomed in), optional 3-frame
translation rows, and packed transcript rows (coding exons 12px, UTR exons
8px, center line, gene label). This implementation renders into a numpy
raster and returns PNG bytes; hit-testing replaces Qt tooltips/mouse events:
``transcript_at(x, y)`` and ``coordinate_at(x)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..core.intervals import BedLine
from ..core.transcripts import translate_codon
from .raster import FONT_H, FONT_W, Raster, text_width

# base colors (GenePanel::baseColor, GenePanel.cpp:240-249)
BASE_COLORS = {
    "A": (0, 150, 0),
    "C": (0, 0, 255),
    "G": (209, 113, 5),
    "T": (255, 0, 0),
    "N": (128, 128, 128),
}
BLACK = (0, 0, 0)
WHITE = (255, 255, 255)
COLOR_IMPORTANT = (130, 0, 50)   # preferred/MANE/canonical (GenePanel.cpp:155)
COLOR_OTHER = (0, 0, 178)        # remaining transcripts (GenePanel.cpp:167)

_COMPLEMENT = str.maketrans("ACGTNacgtn", "TGCANtgcan")


def base_color(b: str) -> tuple:
    return BASE_COLORS.get(b.upper(), BLACK)


def aa_color(start_index: int, aa: str) -> tuple:
    """GenePanel::aaColor (GenePanel.cpp:251-259)."""
    if aa == "*":
        return (255, 0, 0)
    if aa == "M":
        return (0, 255, 0)
    return (128, 128, 128) if start_index % 2 == 0 else (170, 170, 170)


@dataclass
class GenePanelSettings:
    """GenePanel.h:12-18."""
    strand_forward: bool = True
    show_translation: bool = False
    show_only_primary: bool = True
    label_width: int = 165


@dataclass
class TranscriptPosition:
    """Placed transcript (row packing + bounding rect for hit tests)."""
    trans: object
    row: int
    x: float
    y: float
    w: float
    h: float

    def contains(self, px: float, py: float) -> bool:
        return self.x <= px <= self.x + self.w and self.y <= py <= self.y + self.h


@dataclass
class GenePanel:
    """Headless GenePanel: render(region, width, height) -> PNG bytes."""
    genome_data: object = None
    settings: GenePanelSettings = field(default_factory=GenePanelSettings)

    def __post_init__(self):
        self.trans_positions: list[TranscriptPosition] = []
        self._region: BedLine | None = None
        self._pixels_per_base = 0.0

    def set_genome_data(self, genome_data):
        self.genome_data = genome_data

    # ---- coordinate mapping (GenePanel.cpp:261-287) ----
    def _base_start_x(self, pos: int, width: int, restrict: bool) -> float:
        x = self.settings.label_width + 2 + (pos - self._region.start) * self._pixels_per_base
        if restrict:
            x = min(max(x, self.settings.label_width + 2.0), width - 2.0)
        return x

    def _base_end_x(self, pos: int, width: int, restrict: bool) -> float:
        x = self.settings.label_width + 2 + (pos + 1 - self._region.start) * self._pixels_per_base
        if restrict:
            x = min(max(x, self.settings.label_width + 2.0), width - 2.0)
        return x

    def coordinate_at(self, x: float) -> str:
        """Genomic coordinate under pixel x (mouseMoveEvent analogue,
        GenePanel.cpp:172-190); empty string outside the content area."""
        if self._region is None:
            return ""
        import math
        if x > self.settings.label_width + 2 and x < self._width - 2:
            coord = self._region.start + int(
                math.floor((x - self.settings.label_width - 2) / self._pixels_per_base))
            return f"{self._region.chr.str_normalized(True)}:{coord}"
        return ""

    def transcript_at(self, x: float, y: float):
        """(transcript, tooltip_text) under the pixel, or None (the QToolTip
        analogue, GenePanel.cpp:192-217)."""
        for tp in self.trans_positions:
            if tp.contains(x, y):
                text = f"{tp.trans.gene} ({tp.trans.name})"
                tags = ", ".join(tp.trans.flags(False)).strip()
                if tags:
                    text += f" Tags: {tags}"
                return tp.trans, text
        return None

    # ---- rendering (GenePanel::paintEvent, GenePanel.cpp:60-170) ----
    def render_raster(self, region: BedLine, width: int = 1000,
                      height: int = 400) -> Raster:
        if self.genome_data is None:
            raise RuntimeError("Genome data not set!")
        self._region = region
        self._width = width
        s = self.settings
        r = Raster(width, height)
        char_w, char_h = FONT_W, FONT_H
        self._pixels_per_base = (width - s.label_width - 4) / region.length()
        ppb = self._pixels_per_base
        y_content = 2

        # label region
        r.vline(s.label_width, 0, height, BLACK)
        r.text(2, 2, "Gene", BLACK)
        r.text(s.label_width - 4 - char_w, 2, ">" if s.strand_forward else "<", BLACK)

        # sequence row (>=1 pixel per base, GenePanel.cpp:82-106)
        if ppb >= 1:
            seq = self.genome_data.genome.seq(
                region.chr, region.start, region.length()).decode()
            if not s.strand_forward:
                seq = seq.translate(_COMPLEMENT)
            for i, ch in enumerate(seq):
                color = base_color(ch)
                x = s.label_width + 2 + i * ppb
                if ppb >= char_w:  # letters
                    r.text(x + ppb / 2 - char_w / 2, y_content, ch, color)
                else:              # colored line
                    r.fill_rect(x, y_content, ppb, char_h, color)
            y_content += char_h

            # 3-frame translation rows (GenePanel.cpp:109-137)
            if s.show_translation:
                for offset in range(3):
                    for i in range(offset, len(seq), 3):
                        triplet = seq[i:i + 3]
                        if len(triplet) < 3 or "N" in triplet.upper():
                            continue
                        if not s.strand_forward:
                            triplet = triplet[::-1]
                        aa = translate_codon(triplet.upper(),
                                             region.chr.is_m())
                        x = s.label_width + 2 + i * ppb
                        r.fill_rect(x, y_content, 3 * ppb, char_h,
                                    aa_color(i, aa))
                        if ppb * 3 >= char_w:
                            r.text_centered(x + 1.5 * ppb, y_content, aa, WHITE)
                    y_content += char_h

        # transcripts: important ones on top (GenePanel.cpp:140-170)
        y_content += 2
        self.trans_positions = []
        indices = self.genome_data.matching_transcript_indices(
            region.chr, region.start, region.end)
        rest = []
        for i in indices:
            trans = self.genome_data.transcripts[i]
            if s.show_only_primary and not trans.is_gencode_primary:
                continue
            if (trans.is_preferred or trans.is_mane_plus_clinical
                    or trans.is_mane_select or trans.is_ensembl_canonical):
                self._draw_transcript(r, trans, y_content, COLOR_IMPORTANT)
            else:
                rest.append(i)
        for i in rest:
            self._draw_transcript(r, self.genome_data.transcripts[i],
                                  y_content, COLOR_OTHER)
        return r

    def render(self, region: BedLine, width: int = 1000,
               height: int = 400) -> bytes:
        return self.render_raster(region, width, height).to_png()

    def _draw_transcript(self, r: Raster, trans, y_content: int, color):
        """GenePanel::drawTranscript (GenePanel.cpp:289-333)."""
        char_w, char_h = FONT_W, FONT_H
        w = r.width
        x_start = self._base_start_x(trans.start(), w, True)
        x_end = self._base_end_x(trans.end(), w, True)
        trans_height = 2 + 12 + 2 + char_h + 2
        y = self._transcript_y(x_start, x_end, y_content, trans_height, trans)

        # gene label (only when it fits inside the transcript width)
        if len(trans.gene) * char_w < x_end - x_start:
            r.text_centered((x_start + x_end) / 2, y + 2 + 12 + 2,
                            trans.gene, BLACK)

        # center line
        r.hline(x_start + 1.0, x_end - 1.0, y + 2 + 6, color)

        # all exons (8 px)
        for exon in trans.regions.lines:
            ex0 = self._base_start_x(exon.start, w, True)
            ex1 = self._base_end_x(exon.end, w, True)
            r.fill_rect(ex0, y + 2 + 2, ex1 - ex0, 8, color)

        # coding exons (12 px)
        for exon in trans.coding_regions().lines:
            ex0 = self._base_start_x(exon.start, w, True)
            ex1 = self._base_end_x(exon.end, w, True)
            r.fill_rect(ex0, y + 2, ex1 - ex0, 12, color)

    def _transcript_y(self, x_start: float, x_end: float, y_content: int,
                      trans_height: int, trans) -> int:
        """First row with no x-overlap (GenePanel::transcriptY,
        GenePanel.cpp:335-363)."""
        row = -1
        overlap = True
        while overlap:
            row += 1
            overlap = any(
                tp.row == row and x_start <= tp.x + tp.w and x_end >= tp.x
                for tp in self.trans_positions)
        y_start = y_content + trans_height * row
        self.trans_positions.append(TranscriptPosition(
            trans, row, x_start, y_start, x_end - x_start, trans_height))
        return y_start
