"""Headless genome visualization (the cppVISUAL layer, Qt-free).

Behavioral reference: /root/reference/src/cppVISUAL — GenomeData,
GenePanel (sequence + translation + packed transcript rows) and
GenomeVisualizationWidget (region navigation, search, zoom). Rendering
targets a numpy raster + the in-repo PNG encoder instead of QPainter;
mouse/tooltip interactivity becomes hit-test methods.
"""

from .browser import GenomeBrowser, GenomeVisualizationSettings, parse_region
from .gene_panel import GenePanel, GenePanelSettings
from .genome_data import GenomeData
from .raster import Raster

__all__ = [
    "GenomeBrowser", "GenomeVisualizationSettings", "parse_region",
    "GenePanel", "GenePanelSettings", "GenomeData", "Raster",
]
