"""Headless genome browser (IGV-like region navigation + rendering).

Behavioral reference: cppVISUAL/GenomeVisualizationWidget.{h,cpp} — region
state with minimum-window extension and chromosome clamping, chromosome /
region / gene / transcript search, zoom in (-25% each side) and out (+50%
each side), region-changed notification. The Qt widget plumbing becomes a
plain class with an optional callback; rendering delegates to GenePanel.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..core.chromosome import Chromosome
from ..core.intervals import BedFile, BedLine
from .gene_panel import GenePanel, GenePanelSettings


@dataclass
class GenomeVisualizationSettings:
    """GenomeVisualizationWidget.h:14-18."""
    min_window_size: int = 40
    transcript_padding: int = 2000


_REGION_RE = re.compile(r"^\s*([\w.]+)\s*[: ]\s*([\d,]+)\s*[-_ ]\s*([\d,]+)\s*$")


def parse_region(text: str) -> BedLine | None:
    """BedLine::fromString analogue: 'chr1:100-200' (commas tolerated)."""
    m = _REGION_RE.match(text)
    if not m:
        return None
    chr_ = Chromosome(m.group(1))
    if not chr_.is_valid():
        return None
    start = int(m.group(2).replace(",", ""))
    end = int(m.group(3).replace(",", ""))
    line = BedLine(chr_, start, end)
    return line if line.is_valid() else None


@dataclass
class GenomeBrowser:
    """Headless GenomeVisualizationWidget."""
    genome_data: object
    settings: GenomeVisualizationSettings = field(
        default_factory=GenomeVisualizationSettings)
    panel_settings: GenePanelSettings = field(default_factory=GenePanelSettings)
    on_region_changed: object = None   # callback(BedLine)

    def __post_init__(self):
        self.panel = GenePanel(self.genome_data, self.panel_settings)
        self.current_region: BedLine | None = None
        self.valid_chrs = [c.str_normalized(True)
                           for c in self.genome_data.genome.chromosomes()]
        # gene/transcript lookup over ENSEMBL transcripts
        # (GenomeVisualizationWidget.cpp:40-50)
        self.gene_to_trans_indices: dict[str, list[int]] = {}
        self.trans_to_index: dict[str, int] = {}
        for i, t in enumerate(self.genome_data.transcripts):
            if t.source.lower() != "ensembl":
                continue
            self.gene_to_trans_indices.setdefault(t.gene, []).append(i)
            self.trans_to_index[t.name] = i

    # ---- region state (GenomeVisualizationWidget.cpp:56-94) ----
    def set_region(self, chr_: Chromosome | str, start: int, end: int) -> BedLine:
        chr_ = Chromosome(chr_) if not isinstance(chr_, Chromosome) else chr_
        size = end - start + 1
        if size < self.settings.min_window_size:
            missing = self.settings.min_window_size - size
            start -= missing // 2
            end += missing // 2
            if missing % 2 != 0:
                start -= 1
                end += 1
            size = end - start + 1
        chr_len = self.genome_data.genome.length_of(chr_)
        if start < 1:
            start = 1
            end = start + size - 1
        if end > chr_len:
            end = chr_len
            start = end - size + 1
            if start < 1:
                start = 1
        new_reg = BedLine(chr_, start, end)
        if (self.current_region is not None
                and self.current_region.chr == new_reg.chr
                and self.current_region.start == new_reg.start
                and self.current_region.end == new_reg.end):
            return self.current_region
        self.current_region = new_reg
        if self.on_region_changed is not None:
            self.on_region_changed(new_reg)
        return new_reg

    def set_chromosome_region(self, chr_: Chromosome | str) -> BedLine:
        c = Chromosome(chr_) if not isinstance(chr_, Chromosome) else chr_
        if not c.is_valid():
            raise ValueError(
                f"Could not convert chromosome string '{chr_}' to valid chromosome!")
        return self.set_region(c, 1, self.genome_data.genome.length_of(c))

    # ---- search (GenomeVisualizationWidget.cpp:105-151) ----
    def search(self, text: str) -> BedLine:
        text = text.strip()
        # chromosome
        if (text in self.valid_chrs
                or (not text.startswith("chr") and f"chr{text}" in self.valid_chrs)):
            return self.set_chromosome_region(text)
        # chromosomal region
        region = parse_region(text)
        if region is not None:
            return self.set_region(region.chr, region.start, region.end)
        # gene
        if text in self.gene_to_trans_indices:
            roi = BedFile()
            for index in self.gene_to_trans_indices[text]:
                t = self.genome_data.transcripts[index]
                roi.append(BedLine(t.chr, t.start(), t.end()))
            roi.extend(self.settings.transcript_padding)
            roi.merge()
            first = roi.lines[0]
            return self.set_region(first.chr, first.start, first.end)
        # transcript
        if text in self.trans_to_index:
            t = self.genome_data.transcripts[self.trans_to_index[text]]
            pad = self.settings.transcript_padding
            return self.set_region(t.chr, t.start() - pad, t.end() + pad)
        raise ValueError(f"Could not find locus or feature: {text}")

    # ---- zoom (GenomeVisualizationWidget.cpp:153-163) ----
    def zoom_in(self) -> BedLine:
        reg = self.current_region
        size = reg.length()
        return self.set_region(reg.chr, reg.start + size // 4, reg.end - size // 4)

    def zoom_out(self) -> BedLine:
        reg = self.current_region
        size = reg.length()
        return self.set_region(reg.chr, reg.start - size // 2, reg.end + size // 2)

    # ---- rendering ----
    def render(self, width: int = 1000, height: int = 400) -> bytes:
        if self.current_region is None:
            raise RuntimeError("No region set")
        return self.panel.render(self.current_region, width, height)
