"""SamplePath — print the folder/file path of a processed sample.

Behavioral reference: ngs-bits src/SamplePath/main.cpp +
NGSD::processedSamplePath (cppNGSD/NGSD.cpp).
"""

from __future__ import annotations

import sys

from ..ngsd import NGSD
from .toolbase import ToolBase

_VALID_TYPES = ("SAMPLE_FOLDER", "BAM", "VCF", "GSVAR", "COPY_NUMBER_CALLS", "STRUCTURAL_VARIANTS")


class SamplePathTool(ToolBase):
    name = "SamplePath"
    description = "Prints the folder of a processed sample."

    def setup(self):
        self.add_string("ps", "Processed sample name.")
        self.add_enum("type", "Path type to print.", optional=True, valid=_VALID_TYPES,
                      default="SAMPLE_FOLDER")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        ps_id = db.processed_sample_id(self.get_string("ps"))
        sys.stdout.write(db.processed_sample_path(ps_id, self.get_enum("type")) + "\n")
        db.close()


TOOLS = {
    "SamplePath": SamplePathTool,
}
