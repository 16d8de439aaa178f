"""Headless cppVISUAL layer: GenomeData / GenePanel / GenomeBrowser.

Reference behavior: /root/reference/src/cppVISUAL (GenePanel.cpp paint
logic, GenomeVisualizationWidget.cpp region/search/zoom semantics).
"""

import numpy as np
import pytest

from ngsbits_tpu.core.chromosome import Chromosome
from ngsbits_tpu.core.intervals import BedFile, BedLine
from ngsbits_tpu.core.transcripts import Transcript
from ngsbits_tpu.visual import (GenePanel, GenePanelSettings, GenomeBrowser,
                                GenomeData, parse_region)
from ngsbits_tpu.visual.gene_panel import (BASE_COLORS, COLOR_IMPORTANT,
                                           COLOR_OTHER)


@pytest.fixture
def genome(tmp_path):
    # chr1: 300 bp with a known sequence
    seq = ("ACGTN" * 60).encode()
    fa = tmp_path / "g.fa"
    with open(fa, "wb") as fh:
        fh.write(b">chr1\n")
        for i in range(0, len(seq), 60):
            fh.write(seq[i:i + 60] + b"\n")
    # offset of first base: len(">chr1\n") = 6
    with open(str(fa) + ".fai", "w") as fh:
        fh.write(f"chr1\t{len(seq)}\t6\t60\t61\n")
    gd = GenomeData(str(fa))

    def trans(name, gene, start, end, primary=True, mane=False, cstart=0, cend=0):
        regions = BedFile()
        regions.append(BedLine(Chromosome("chr1"), start, end))
        return Transcript(name=name, gene=gene, source="ensembl",
                          chr=Chromosome("chr1"), regions=regions,
                          is_gencode_primary=primary, is_mane_select=mane,
                          coding_start=cstart, coding_end=cend)

    gd.set_transcripts([
        trans("ENST1", "GENA", 50, 150, mane=True, cstart=60, cend=140),
        trans("ENST2", "GENA", 40, 160),
        trans("ENST3", "GENB", 200, 280, primary=False),
    ])
    return gd


def test_genome_data_index(genome):
    idx = genome.matching_transcript_indices(Chromosome("chr1"), 100, 120)
    assert idx == [0, 1]
    idx = genome.matching_transcript_indices(Chromosome("chr1"), 1, 300)
    assert idx == [0, 1, 2]
    assert genome.matching_transcript_indices(Chromosome("chr2"), 1, 300) == []


def test_panel_renders_png(genome):
    panel = GenePanel(genome)
    png = panel.render(BedLine(Chromosome("chr1"), 40, 170), width=800, height=300)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # hit-test: MANE transcript is placed and findable
    assert panel.trans_positions, "no transcripts placed"
    tp = panel.trans_positions[0]
    hit = panel.transcript_at(tp.x + tp.w / 2, tp.y + 1)
    assert hit is not None
    trans, tooltip = hit
    assert trans.name == "ENST1"
    assert "MANE select" in tooltip


def test_panel_base_colors_when_zoomed(genome):
    # 40-base window over 800-165-4 px -> ~15.8 px/base >= char width: letters
    panel = GenePanel(genome)
    r = panel.render_raster(BedLine(Chromosome("chr1"), 1, 40), width=800, height=200)
    img = r.img
    # base row occupies y in [2, 10); first base is 'A' -> green letter pixels
    label_w = panel.settings.label_width
    strip = img[2:10, label_w + 2:label_w + 2 + 16]
    assert (strip == np.array(BASE_COLORS["A"], np.uint8)).all(axis=-1).any()


def test_panel_important_vs_other_colors(genome):
    panel = GenePanel(genome, GenePanelSettings(show_only_primary=True))
    r = panel.render_raster(BedLine(Chromosome("chr1"), 30, 170), width=900, height=300)
    img = r.img
    has_imp = (img == np.array(COLOR_IMPORTANT, np.uint8)).all(axis=-1).any()
    has_other = (img == np.array(COLOR_OTHER, np.uint8)).all(axis=-1).any()
    assert has_imp and has_other
    # rows must not overlap: ENST1/ENST2 overlap in x -> distinct rows
    rows = {tp.trans.name: tp.row for tp in panel.trans_positions}
    assert rows["ENST1"] != rows["ENST2"]


def test_panel_show_only_primary_filter(genome):
    panel = GenePanel(genome, GenePanelSettings(show_only_primary=True))
    panel.render(BedLine(Chromosome("chr1"), 180, 300), width=800, height=200)
    assert not panel.trans_positions  # ENST3 is not GENCODE primary
    panel2 = GenePanel(genome, GenePanelSettings(show_only_primary=False))
    panel2.render(BedLine(Chromosome("chr1"), 180, 300), width=800, height=200)
    assert [tp.trans.name for tp in panel2.trans_positions] == ["ENST3"]


def test_panel_translation_rows(genome):
    panel = GenePanel(genome, GenePanelSettings(show_translation=True))
    png = panel.render(BedLine(Chromosome("chr1"), 1, 40), width=900, height=300)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"


def test_coordinate_at(genome):
    panel = GenePanel(genome)
    panel.render(BedLine(Chromosome("chr1"), 101, 140), width=800, height=200)
    label_w = panel.settings.label_width
    assert panel.coordinate_at(label_w + 3) == "chr1:101"
    assert panel.coordinate_at(5) == ""     # inside label area
    assert panel.coordinate_at(799) == ""   # outside content area


def test_browser_min_window_and_clamping(genome):
    b = GenomeBrowser(genome)
    # min window extension (min_window_size=40)
    reg = b.set_region("chr1", 100, 109)
    assert reg.length() == 40
    assert (reg.start, reg.end) == (85, 124)
    # clamp to chromosome start
    reg = b.set_region("chr1", -10, 25)
    assert reg.start == 1
    # clamp to chromosome end (chr1 is 300 bp)
    reg = b.set_region("chr1", 290, 400)
    assert reg.end == 300


def test_browser_search(genome):
    events = []
    b = GenomeBrowser(genome, on_region_changed=events.append)
    # chromosome
    reg = b.search("chr1")
    assert (reg.start, reg.end) == (1, 300)
    # region string
    reg = b.search("chr1:100-200")
    assert (reg.start, reg.end) == (100, 200)
    # region string without chr prefix, with commas
    reg = b.search("1:1,00-2,10")
    assert (reg.start, reg.end) == (100, 210)
    # gene: union of ENST1/ENST2 spans (40-160) + 2000 padding, clamped
    reg = b.search("GENA")
    assert (reg.start, reg.end) == (1, 300)
    # transcript: span + padding, clamped
    reg = b.search("ENST3")
    assert (reg.start, reg.end) == (1, 300)
    with pytest.raises(ValueError, match="Could not find locus"):
        b.search("NOPE42")
    assert len(events) >= 4


def test_browser_zoom(genome):
    b = GenomeBrowser(genome)
    b.set_region("chr1", 101, 200)   # size 100
    reg = b.zoom_in()
    assert (reg.start, reg.end) == (126, 175)
    reg = b.zoom_out()               # size 50 -> +25 each side
    assert (reg.start, reg.end) == (101, 200)
    # zooming out past chromosome bounds clamps
    b.set_region("chr1", 1, 300)
    reg = b.zoom_out()
    assert (reg.start, reg.end) == (1, 300)


def test_parse_region():
    assert parse_region("chr1:5-10").start == 5
    assert parse_region("not a region") is None
    assert parse_region("chrQ_weird:5-x") is None
