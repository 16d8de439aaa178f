"""RNA expression tools: NGSDImportExpressionData, NGSDAnnotateGeneExpression,
NGSDAnnotateRNA, NGSDExtractRNACohort.

Behavioral reference: ngs-bits src/NGSDImportExpressionData/main.cpp +
NGSD::importGeneExpressionData/importExonExpressionData (NGSD.cpp:2065-2290),
src/NGSDAnnotateGeneExpression/main.cpp, src/NGSDAnnotateRNA/main.cpp,
src/NGSDExtractRNACohort/main.cpp.
"""

from __future__ import annotations

import sys

from ..core.chromosome import Chromosome
from ..io.tsv import TsvFile
from ..ngsd import NGSD, NgsdError
from .toolbase import ToolBase, ToolError


def _ensembl_gene_mapping(db) -> dict[str, str]:
    return {e: s for e, s in db.get_rows(
        "SELECT ensembl_id, symbol FROM gene WHERE ensembl_id IS NOT NULL")}


def _gene_expression_id(db, gene2id: dict, gene_symbol: str) -> int:
    if gene_symbol in gene2id:
        return gene2id[gene_symbol]
    if db.gene_to_approved_id(gene_symbol) == -1:
        raise ToolError(f"'{gene_symbol}' is not an approved gene name and cannot be added to the NGSD table!")
    db.execute("INSERT INTO expression_gene (symbol) VALUES (?)", (gene_symbol,))
    gene2id[gene_symbol] = db.last_insert_id()
    return gene2id[gene_symbol]


class NGSDImportExpressionDataTool(ToolBase):
    name = "NGSDImportExpressionData"
    description = "Imports expression data into the NGSD."

    def setup(self):
        self.add_infile("expression", "TSV file containing expression values.")
        self.add_string("ps", "Processed sample name of the expression data.")
        self.add_enum("mode", "Determines which kind of expression data should be imported.",
                      optional=True, valid=("genes", "exons"), default="genes")
        self.add_flag("force", "Import data even if already imported and overwrite data in the NGSD.")
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_flag("debug", "Enable debug output.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        ps = self.get_string("ps")
        path = self.get_infile("expression")
        force = self.get_flag("force")
        if self.get_enum("mode") == "genes":
            self._import_genes(db, path, ps, force)
        else:
            self._import_exons(db, path, ps, force)
        db.close()

    def _import_genes(self, db, path, ps, force):
        ps_id = db.processed_sample_id(ps)
        n_prev = db.get_value("SELECT COUNT(id) FROM expression WHERE processed_sample_id=?",
                              params=(ps_id,))
        if not force and n_prev > 0:
            raise ToolError(f"Expression values for sample '{ps}' already imported and method called without '-force' parameter: Cannot import data!")
        if n_prev > 0:
            db.execute("DELETE FROM expression WHERE processed_sample_id=?", (ps_id,))
        mapping = _ensembl_gene_mapping(db)
        gene2id = dict(db.get_rows("SELECT symbol, id FROM expression_gene"))
        tsv = TsvFile.from_file(path)
        i_ensg = tsv.column_index(b"gene_id")
        i_tpm = tsv.column_index(b"tpm")
        i_raw = tsv.column_index(b"raw")
        n_imported = n_skipped = 0
        for row in tsv.rows:
            ensg = row[i_ensg].decode()
            tpm = float(row[i_tpm])
            raw = int(row[i_raw])
            if ensg not in mapping:
                n_skipped += 1
                continue
            symbol_id = _gene_expression_id(db, gene2id, mapping[ensg])
            db.execute("INSERT INTO expression (processed_sample_id, symbol_id, tpm, raw) VALUES (?, ?, ?, ?)",
                       (ps_id, symbol_id, tpm, raw))
            n_imported += 1
        db.commit()
        sys.stdout.write(f"{n_imported} expression values imported into the NGSD.\n")
        sys.stdout.write(f"{n_skipped} expression values skipped.\n")

    def _import_exons(self, db, path, ps, force):
        ps_id = db.processed_sample_id(ps)
        n_prev = db.get_value("SELECT COUNT(id) FROM expression_exon WHERE processed_sample_id=?",
                              params=(ps_id,))
        if not force and n_prev > 0:
            raise ToolError(f"Expression values for sample '{ps}' already imported and method called without '-force' parameter: Cannot import data!")
        if n_prev > 0:
            db.execute("DELETE FROM expression_exon WHERE processed_sample_id=?", (ps_id,))
        valid_exons = set()
        for chrom, start, end in db.get_rows(
                "SELECT DISTINCT gt.chromosome, ge.start, ge.end FROM gene_exon ge "
                "INNER JOIN gene_transcript gt ON ge.transcript_id = gt.id"):
            valid_exons.add(f"chr{chrom}:{start}-{end}")
        tsv = TsvFile.from_file(path)
        i_exon = tsv.column_index(b"exon")
        i_raw = tsv.column_index(b"raw")
        i_rpb = tsv.column_index(b"rpb")
        i_srpb = tsv.column_index(b"srpb")
        imported = set()
        n_imported = n_skipped = n_dup = 0
        for row in tsv.rows:
            raw_region = row[i_exon].decode().replace(",", "")
            region_parts = raw_region.split(":")
            chrom = region_parts[0]
            start, end = region_parts[1].split("-")
            key = f"{Chromosome(chrom).str_normalized(True)}:{start}-{end}"
            if key in imported:
                n_dup += 1
                continue
            raw = int(row[i_raw])
            rpb = float(row[i_rpb])
            srpb = float(row[i_srpb])
            if key not in valid_exons:
                n_skipped += 1
                continue
            db.execute("INSERT INTO expression_exon (processed_sample_id, chr, start, end, raw, rpb, srpb) VALUES (?, ?, ?, ?, ?, ?, ?)",
                       (ps_id, Chromosome(chrom).str_normalized(True), int(start), int(end), raw, rpb, srpb))
            n_imported += 1
            imported.add(key)
        db.commit()
        sys.stdout.write(f"{n_imported} expression values imported into the NGSD.\n")
        sys.stdout.write(f"{n_skipped} expression values skipped.\n")


def _qt_num(v: float) -> str:
    return f"{v:.6g}"


class NGSDAnnotateGeneExpressionTool(ToolBase):
    """Behavioral reference: src/NGSDAnnotateGeneExpression/main.cpp."""

    name = "NGSDAnnotateGeneExpression"
    description = "Annotates a GSvar file with RNA expression data."

    def setup(self):
        self.add_infile("in", "Input GSvar file of DNA sample.")
        self.add_outfile("out", "Output GSvar file.")
        self.add_string("rna_ps", "Processed sample name of the associated .")
        self.add_enum("cohort_strategy", "Determines which samples are used as reference cohort.",
                      optional=True, valid=("RNA_COHORT_GERMLINE", "RNA_COHORT_GERMLINE_PROJECT", "RNA_COHORT_SOMATIC"),
                      default="RNA_COHORT_GERMLINE")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        import math

        from ..io.gsvar import GSvarFile
        db = NGSD(self.get_flag("test"))
        ps_id = db.processed_sample_id(self.get_string("rna_ps"))
        expression = db.get_gene_expression_values_of_sample(ps_id, True)
        ps_data = db.get_processed_sample_data(ps_id)
        s_id = db.sample_id(self.get_string("rna_ps"))
        s_data = db.get_sample_data(s_id)
        sys_id = db.processing_system_id(ps_data["processing_system"])
        cohort = db.get_rna_cohort(sys_id, s_data["tissue"], ps_data["project_name"],
                                   ps_id, self.get_enum("cohort_strategy"))
        stats = db.calculate_gene_expression_statistics(cohort)

        gs = GSvarFile.from_file(self.get_infile("in"))
        idx_genes = gs.annotation_index("gene")
        for cname, desc in (("tpm", "Gene expression strength in transcripts-per-million."),
                            ("expr_log2fc", "Relative gene expression as log2 FC (log2 tpm)."),
                            ("expr_zscore", "Relative gene expression as z-score (log2 tpm)")):
            if cname not in gs.columns:
                gs.columns.append(cname)
                gs.add_description(cname, desc)
                for v in gs.variants:
                    v.annotations.append(b"")
        idx_tpm = gs.annotation_index("tpm")
        idx_log2fc = gs.annotation_index("expr_log2fc")
        idx_zscore = gs.annotation_index("expr_zscore")

        for v in gs.variants:
            genes = v.annotations[idx_genes].split(b",")
            tpm_list, log2fc_list, zscore_list = [], [], []
            for gene in genes:
                gid = db.gene_to_approved_id(gene.decode())
                if gid < 0:
                    tpm_list.append(b"")
                    log2fc_list.append(b"")
                    zscore_list.append(b"")
                else:
                    symbol = db.gene_symbol(gid)
                    tpm = expression.get(symbol, 0.0)
                    log2p1 = math.log2(tpm + 1)
                    mean, mean_log2, std_log2 = stats.get(symbol, (0.0, 0.0, 0.0))
                    log2fc = log2p1 - math.log2(mean + 1)
                    try:
                        zscore = (log2p1 - mean_log2) / std_log2
                    except ZeroDivisionError:
                        zscore = float("inf") if log2p1 > mean_log2 else (float("-inf") if log2p1 < mean_log2 else float("nan"))
                    tpm_list.append(_qt_num(tpm).encode())
                    log2fc_list.append(_qt_num(log2fc).encode())
                    zscore_list.append(_qt_num(zscore).encode())
            v.annotations[idx_tpm] = b",".join(tpm_list)
            v.annotations[idx_log2fc] = b",".join(log2fc_list)
            v.annotations[idx_zscore] = b",".join(zscore_list)
        gs.store(self.get_outfile("out"))
        db.close()


TOOLS = {
    "NGSDImportExpressionData": NGSDImportExpressionDataTool,
    "NGSDAnnotateGeneExpression": NGSDAnnotateGeneExpressionTool,
}
