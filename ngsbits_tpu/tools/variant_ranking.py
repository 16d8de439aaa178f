"""VariantRanking — rank GSvar variants by clinical relevance.

Behavioral reference: ngs-bits src/VariantRanking/main.cpp +
cppNGS/VariantScores.cpp (see core/variant_scores.py).
"""

from __future__ import annotations

import sys

from ..core import variant_scores
from ..io.gsvar import GSvarFile
from ..ngsd import NGSD
from .toolbase import ToolBase, ToolError


class VariantRankingTool(ToolBase):
    name = "VariantRanking"
    description = "Annotates the variant list with variant ranking information."

    def setup(self):
        self.add_infile("in", "Input variant list in GSvar format.")
        self.add_string("hpo_ids", "Comma-separated list of HPO identifiers.")
        self.add_outfile("out", "Output variant list in GSvar format with rank/score columns.")
        self.add_enum("algorithm", "Algorithm used for ranking.", valid=tuple(variant_scores.ALGORITHMS))
        self.add_flag("add_explanation", "Add a third output column with an explanation how that score was calculated.")
        self.add_flag("use_blacklist", "Use variant blacklist from settings.ini file.")
        self.add_flag("skip_ngsd_classifications", "Do not use variant classifications from NGSD.")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        hpo_ids = self.get_string("hpo_ids").split(",")
        algorithm = self.get_enum("algorithm")
        add_explanation = self.get_flag("add_explanation")
        db = NGSD(self.get_flag("test"))

        gs = GSvarFile.from_file(self.get_infile("in"))

        gene2region_cache: dict[str, object] = {}
        phenotype_rois = {}
        for hpo_id in hpo_ids:
            hpo_id = hpo_id.strip()
            if not hpo_id:
                continue
            term_id = db.phenotype_id_by_accession(hpo_id, False)
            if term_id == -1:
                sys.stderr.write(f"No HPO phenotype with accession '{hpo_id}' found in NGSD!\n")
                continue
            from ..core.intervals import BedFile
            roi = BedFile()
            for gene in db.phenotype_to_genes(term_id, True):
                if gene not in gene2region_cache:
                    gene2region_cache[gene] = db.gene_to_regions(gene, "ensembl", "gene", True)
                roi.add(gene2region_cache[gene])
            if len(roi):
                roi.extend(5000)
            roi.lines.sort(key=lambda l: l.sort_key())
            roi.merge()
            phenotype_rois[hpo_id] = roi

        params = variant_scores.Parameters()
        params.use_blacklist = self.get_flag("use_blacklist")
        params.use_ngsd_classifications = not self.get_flag("skip_ngsd_classifications")
        result = variant_scores.score(algorithm, gs, phenotype_rois, params)
        variant_scores.annotate(gs, result, add_explanation)
        gs.store(self.get_outfile("out"))
        db.close()


TOOLS = {
    "VariantRanking": VariantRankingTool,
}
