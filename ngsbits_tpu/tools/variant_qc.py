"""VariantQC — QC metrics on variant lists.

Behavioral reference: ngs-bits src/VariantQC/main.cpp.
"""

from __future__ import annotations

import sys

from ..core.intervals import BedFile
from ..io.vcf import VcfFile
from ..qc import variant_stats
from .toolbase import ToolBase


class VariantQCTool(ToolBase):
    name = "VariantQC"
    description = "Calculates QC metrics on variant lists."

    def setup(self):
        self.add_infile("in", "Input variant list in VCF format.")
        self.add_flag("ignore_filter", "Ignore filter entries, i.e. consider variants that did not pass filters.")
        self.add_outfile("out", "Output qcML file. If unset, writes to STDOUT.", optional=True)
        self.add_flag("txt", "Writes TXT format instead of qcML.")
        self.add_flag("long_read", "Adds LongRead specific QC values (e.g. phasing information)")
        self.add_outfile("phasing_bed", "Output BED file containing phasing blocks with id. (requires parameter '-longread')", optional=True)

    def main(self):
        vl = VcfFile.from_file(self.get("in"))
        metrics = variant_stats.variant_list(vl, not self.get_flag("ignore_filter"))

        if self.get_flag("long_read"):
            blocks = BedFile()
            phasing_metrics = variant_stats.phasing(vl, not self.get_flag("ignore_filter"), blocks)
            metrics.insert(phasing_metrics)
            if self.get("phasing_bed"):
                blocks.store(self.get("phasing_bed"))

        out = self.get("out")
        if self.get_flag("txt"):
            text = "".join(l + "\n" for l in metrics.to_string_list())
            if out:
                with open(out, "w") as fh:
                    fh.write(text)
            else:
                sys.stdout.write(text)
        else:
            metrics.store_to_qcml(out if out else None, [self.get("in")], "")


TOOLS = {"VariantQC": VariantQCTool}
