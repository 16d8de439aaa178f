"""NGSD administration and import tools.

Behavioral reference: ngs-bits src/NGSDInit/main.cpp, src/NGSDImportQC/...
(each tool's docstring cites its own reference file).
"""

from __future__ import annotations

import sys

from ..ngsd import NGSD, NgsdError
from .toolbase import ToolBase, ToolError


class NGSDInitTool(ToolBase):
    """Behavioral reference: src/NGSDInit/main.cpp."""

    name = "NGSDInit"
    description = "Sets up the NDSD database (creates tables and adds minimal data)."

    def setup(self):
        self.add_infile("add", "Additional SQL script to execute after database initialization.", optional=True)
        self.add_string("force", "Database password needed to re-initialize the production database.", optional=True, default="")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        db.init()
        add = self.get_infile("add")
        if add:
            db.run_mysql_file(add)
        db.close()
        sys.stdout.write("Database initialization succesfully.\n")
        sys.stdout.write("You are now able to login with user name 'admin' and password 'admin' via GSvar.\n")
        sys.stdout.write("**Please change the password on first login!**\n")


class NGSDImportQCTool(ToolBase):
    """Behavioral reference: src/NGSDImportQC/main.cpp + NGSD::updateQC."""

    name = "NGSDImportQC"
    description = "Imports QC terms into the NGSD."

    def setup(self):
        self.add_infile("obo", "HPO ontology file from 'https://raw.githubusercontent.com/imgag/ngs-bits/master/src/cppNGS/Resources/qcML.obo'.")
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_flag("debug", "Enable debug output.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        db.update_qc(self.get_infile("obo"), self.get_flag("debug"))
        db.close()


TOOLS = {
    "NGSDInit": NGSDInitTool,
    "NGSDImportQC": NGSDImportQCTool,
}
