"""Annotation-based filtering tools for GSvar/BEDPE/CNV lists.

Behavioral reference: ngs-bits src/VariantFilterAnnotations/main.cpp,
src/SvFilterAnnotations/main.cpp, src/CnvFilterAnnotations/main.cpp over the
FilterCascade engine (cppNGS/FilterCascade.cpp).
"""

from __future__ import annotations

from ..filters import FilterCascade
from ..io.bedpe import BedpeFile
from ..io.cnv import CnvList
from ..io.gsvar import GSvarFile
from .toolbase import ToolBase


class VariantFilterAnnotationsTool(ToolBase):
    name = "VariantFilterAnnotations"
    description = "Filter a variant list in GSvar format based on variant annotations."

    def setup(self):
        self.add_infile("filters", "Filter definition file.")
        self.add_infile("in", "Input variant list in GSvar format.", optional=True)
        self.add_outfile("out", "Output variant list in GSvar format.", optional=True)

    def main(self):
        variants = GSvarFile.from_file(self.get("in"))
        cascade = FilterCascade.from_file(self.get("filters"))
        result = cascade.apply(variants, "snv")
        variants.variants = [v for v, f in zip(variants.variants, result.flags) if f]
        variants.store(self.get("out"))


class SvFilterAnnotationsTool(ToolBase):
    name = "SvFilterAnnotations"
    description = "Filter a structural variant list in BEDPE format based on variant annotations."

    def setup(self):
        self.add_infile("in", "Input structural variant list in BEDPE format.")
        self.add_outfile("out", "Output structural variant list in BEDPE format.")
        self.add_infile("filters", "Filter definition file.")

    def main(self):
        svs = BedpeFile.from_file(self.get("in"))
        cascade = FilterCascade.from_file(self.get("filters"))
        result = cascade.apply(svs, "sv")
        svs.lines = [l for l, f in zip(svs.lines, result.flags) if f]
        svs.store(self.get("out"))


class CnvFilterAnnotationsTool(ToolBase):
    name = "CnvFilterAnnotations"
    description = "Filter a copy-number variant list in TSV format based on variant annotations."

    def setup(self):
        self.add_infile("in", "Input CNV list in TSV format.")
        self.add_outfile("out", "Output CNV list in TSV format.")
        self.add_infile("filters", "Filter definition file.")

    def main(self):
        cnvs = CnvList.from_file(self.get("in"))
        cascade = FilterCascade.from_file(self.get("filters"))
        result = cascade.apply(cnvs, "cnv")
        cnvs.variants = [v for v, f in zip(cnvs.variants, result.flags) if f]
        cnvs.store(self.get("out"))


TOOLS = {
    "VariantFilterAnnotations": VariantFilterAnnotationsTool,
    "SvFilterAnnotations": SvFilterAnnotationsTool,
    "CnvFilterAnnotations": CnvFilterAnnotationsTool,
}
