"""More NGSD import tools: NGSDImportOncotree, NGSDImportCSpec,
NGSDImportClinvarAccessions.

Behavioral reference: ngs-bits src/NGSDImportOncotree/main.cpp,
src/NGSDImportCSpec/main.cpp, src/NGSDImportClinvarAccessions/main.cpp.
"""

from __future__ import annotations

import datetime
import json
import os
import sys

from ..ngsd import NGSD
from .toolbase import ToolBase, ToolError


class NGSDImportOncotreeTool(ToolBase):
    name = "NGSDImportOncotree"
    description = "Imports Oncotree terms and their relations into the NGSD."

    def setup(self):
        self.add_infile("tree", "Oncotree JSON file from 'https://raw.githubusercontent.com/cBioPortal/oncotree/refs/heads/master/trees/oncotree_2025_10_03.json'.")
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_flag("force", "If set, overwrites old data.")
        self.add_flag("debug", "Enables debug output")

    def main(self):
        db = NGSD(self.get_flag("test"))
        if (not db.table_empty("oncotree_term") or not db.table_empty("oncotree_parent")
                or not db.table_empty("oncotree_obsolete")):
            if self.get_flag("force"):
                for t in ("oncotree_parent", "oncotree_obsolete", "oncotree_term"):
                    db.clear_table(t)
            else:
                raise ToolError("Tables already contain data! Use '-force' to overwrite old data!")

        with open(self.get_infile("tree")) as fh:
            doc = json.load(fh)
        root = doc["TISSUE"]

        # depth-first walk like the reference (children sorted by key — Qt's
        # QJsonObject iterates keys alphabetically)
        codes = []

        def walk(node):
            codes.append(node)
            children = node.get("children", {})
            for key in sorted(children):
                walk(children[key])

        walk(root)

        c_parent = c_obsolete = 0
        for node in codes:
            refs = node.get("externalReferences", {})
            db.execute("INSERT INTO oncotree_term (oncotree_code, name, color, level, UMLS, NCI) VALUES (?, ?, ?, ?, ?, ?)",
                       (node.get("code", ""), node.get("name", ""), node.get("color") or "",
                        node.get("level", -1), ", ".join(refs.get("UMLS", [])),
                        ", ".join(refs.get("NCI", []))))
            code_id = db.get_value("SELECT id from oncotree_term WHERE oncotree_code=?",
                                   params=(node.get("code", ""),))
            parent_code = node.get("parent") or ""
            if parent_code:
                parent_id = db.get_value("SELECT id from oncotree_term WHERE oncotree_code=?",
                                         params=(parent_code,)) or 0
                db.execute("INSERT INTO oncotree_parent (parent, child) VALUES (?, ?)",
                           (parent_id, code_id))
                c_parent += 1
            for reason in ("history", "precursors", "revocations"):
                for c in node.get(reason, []):
                    db.execute("INSERT INTO oncotree_obsolete (oncotree_code, reason, replaced_by) VALUES (?, ?, ?)",
                               (c, reason, code_id))
                    c_obsolete += 1
        db.commit()
        sys.stdout.write(f"Imported {len(codes)}  Oncotree terms.\n")
        sys.stdout.write(f"Imported {c_parent}  Oncotree parent-child relations.\n")
        sys.stdout.write(f"Imported {c_obsolete} obsolete Oncotree terms.\n")

        version = os.path.basename(self.get_infile("tree"))
        tmp = version.replace("oncotree_", "").replace(".json", "").replace("_", "-")
        try:
            datetime.date.fromisoformat(tmp)
            version = tmp
        except ValueError:
            pass
        db.set_database_info("oncotree", version)
        db.close()


class NGSDImportCSpecTool(ToolBase):
    name = "NGSDImportCSpec"
    description = "Import genes with special interpretation guidelines from CSpect."

    def setup(self):
        self.add_infile("in", "CSpect data JSON downloaded from 'https://cspec.genome.network/cspec/SequenceVariantInterpretation/id?detail=high&fields=ld.RuleSet,ldFor.Organization,entContent.states,entContent.legacyFullySuperseded,entContent.legacyReplaced,entId,ldhId,entContent.title&pgSize=1000'")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        if not db.table_empty("cspec_data"):
            db.clear_table("cspec_data")
        with open(self.get_infile("in")) as fh:
            doc = json.load(fh)
        data = doc.get("data", [])
        genes = set()
        skipped = set()
        for entry in data:
            rulesets = entry.get("ld", {}).get("RuleSet", [])
            for j, ruleset in enumerate(rulesets):
                genes_array = ruleset.get("entContent", {}).get("genes", [])
                for _k in range(len(genes_array)):
                    # bug-compatible: the reference indexes genes_array with
                    # the ruleset index j (NGSDImportCSpec/main.cpp:54)
                    gene = genes_array[j].get("gene", "") if j < len(genes_array) else ""
                    approved = db.gene_to_approved(gene)
                    if not approved:
                        skipped.add(gene)
                        continue
                    genes.add(approved)
        for gene in sorted(genes):
            db.execute("INSERT INTO cspec_data (gene) VALUES (?)", (gene,))
        db.commit()
        sys.stdout.write(f"Parsed rulesets: {len(data)}\n")
        sys.stdout.write(f"Imported genes: {len(genes)}\n")
        sys.stdout.write(f"Skipped genes (not convertable to approved symbol): {len(skipped)}\n")
        version = doc.get("metadata", {}).get("rendered", {}).get("when", "")[:10]
        db.set_database_info("CSpec", version)
        db.close()


TOOLS = {
    "NGSDImportOncotree": NGSDImportOncotreeTool,
    "NGSDImportCSpec": NGSDImportCSpecTool,
}
