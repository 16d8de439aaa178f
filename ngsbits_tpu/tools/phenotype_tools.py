"""Phenotype (HPO) lookup tools.

Behavioral reference: ngs-bits src/PhenotypesToGenes/main.cpp and
src/PhenotypeSubtree/main.cpp.
"""

from __future__ import annotations

import sys

from ngsbits_tpu.utils.stdio import stdin_binary

from ..ngsd import NGSD
from .toolbase import ToolBase, ToolError

VALID_SOURCES = ("HPO", "OMIM", "ClinVar", "G2P", "HGMD", "GenCC")
VALID_EVIDENCES = ("n/a", "against", "low", "medium", "high")


def _source_from_string(s: str) -> str:
    for v in VALID_SOURCES:
        if s.lower() == v.lower():
            return v
    raise ToolError(f"Cannot convert string '{s}' to PhenotypeSource!")


def _evidence_from_string(e: str) -> str:
    e = e.lower().strip()
    if e not in VALID_EVIDENCES:
        raise ToolError(f"Cannot convert string '{e}' to PhenotypeEvidenceLevel!")
    return e


class PhenotypesToGenesTool(ToolBase):
    name = "PhenotypesToGenes"
    description = "Converts a phenotype list to a list of matching genes."

    def setup(self):
        self.add_string("in", "Input file, containing one HPO term identifier per line, e.g. HP:0002066. Text after the identifier is ignored. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output TSV file with genes (column 1) and matched phenotypes (column 2). If unset, writes to STDOUT.", optional=True)
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_flag("ignore_invalid", "Ignores invalid HPO identifiers instead of throwing an error.")
        self.add_flag("ignore_non_phenotype", "Ignores HPO identifiers that are sub-terms of 'Mode of inheritance' or 'Frequency'")
        self.add_string("source", "Comma-separated list of phenotype-gene source databases.", optional=True, default="HPO,OMIM,ClinVar,G2P,HGMD,GenCC")
        self.add_string("evidence", "Comma-separated list of phenotype-gene evidence levels.", optional=True, default="n/a,low,medium,high")

    def main(self):
        db = NGSD(self.get_flag("test"))
        in_path = self.get_string("in")
        ignore_invalid = self.get_flag("ignore_invalid")
        ignore_non_pheno = self.get_flag("ignore_non_phenotype")

        hpo_ids = []
        fh = open(in_path, "rb") if in_path else stdin_binary()
        for raw in fh:
            line = raw.decode().strip()
            if not line or line.startswith("#"):
                continue
            hpo_ids.append(line[:10])
        if in_path:
            fh.close()
        hpo_ids = sorted(set(hpo_ids))

        sources = {_source_from_string(s.strip())
                   for s in self.get_string("source").split(",") if s.strip()}
        evidences = {_evidence_from_string(e)
                     for e in self.get_string("evidence").split(",") if e.strip()}

        genes2phenotypes: dict[str, list[str]] = {}
        for hpo_id in hpo_ids:
            tid = db.phenotype_id_by_accession(hpo_id, False)
            if tid == -1:
                if ignore_invalid:
                    continue
                raise ToolError(f"Cannot find HPO phenotype with accession '{hpo_id}' in NGSD!")
            genes = db.phenotype_to_genes_by_source_and_evidence(
                tid, sources, evidences, True, ignore_non_pheno)
            for gene in genes:
                genes2phenotypes.setdefault(gene, []).append(db.phenotype_accession(tid))

        out_path = self.get_outfile("out")
        out = open(out_path, "w") if out_path else sys.stdout
        for gene in sorted(genes2phenotypes):
            out.write(f"{gene}\t" + ", ".join(genes2phenotypes[gene]) + "\n")
        if out_path:
            out.close()
        db.close()


class PhenotypeSubtreeTool(ToolBase):
    name = "PhenotypeSubtree"
    description = "Returns all sub-phenotype of a given phenotype."

    def setup(self):
        self.add_string("in", "HPO phenotype identifier, e.g. HP:0002066.")
        self.add_outfile("out", "Output TSV file with phenotypes identifiers (column 1) and names (column 2). If unset, writes to STDOUT.", optional=True)
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        children = db.phenotype_child_terms(db.phenotype_id_by_accession(self.get_string("in")), True)
        out_path = self.get_outfile("out")
        out = open(out_path, "w") if out_path else sys.stdout
        for tid in children:
            out.write(f"{db.phenotype_accession(tid)}\t{db.phenotype_name(tid)}\n")
        if out_path:
            out.close()
        db.close()


TOOLS = {
    "PhenotypesToGenes": PhenotypesToGenesTool,
    "PhenotypeSubtree": PhenotypeSubtreeTool,
}
