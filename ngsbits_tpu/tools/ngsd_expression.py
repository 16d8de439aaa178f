"""RNA expression tools: NGSDImportExpressionData, NGSDAnnotateGeneExpression,
NGSDAnnotateRNA, NGSDExtractRNACohort.

Behavioral reference: ngs-bits src/NGSDImportExpressionData/main.cpp +
NGSD::importGeneExpressionData/importExonExpressionData (NGSD.cpp:2065-2290),
src/NGSDAnnotateGeneExpression/main.cpp, src/NGSDAnnotateRNA/main.cpp,
src/NGSDExtractRNACohort/main.cpp.
"""

from __future__ import annotations

import sys

from ngsbits_tpu.utils.stdio import stdout_binary

import numpy as np

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
            # MySQL column `expression.tpm` is FLOAT (32-bit) — round-trip
            # through float32 to match the reference's stored precision
            tpm = float(np.float32(row[i_tpm]))
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
            # `expression_exon.rpb`/`srpb` are MySQL FLOAT (32-bit) columns
            rpb = float(np.float32(row[i_rpb]))
            srpb = float(np.float32(row[i_srpb]))
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


def _exon_stats(db, cohort: set) -> dict:
    """NGSD::calculateExonExpressionStatistics."""
    if not cohort:
        return {}
    ids = ", ".join(str(i) for i in cohort)
    out = {}
    for chrom, start, end, mean, mean_log2, std_log2 in db.get_rows(
            "SELECT e.chr, e.start, e.end, AVG(e.srpb), AVG(LOG2(e.srpb+1)), STD(LOG2(e.srpb+1)) "
            f"FROM expression_exon e WHERE e.processed_sample_id IN ({ids}) "
            "GROUP BY e.chr, e.start, e.end ORDER BY e.chr ASC, e.start ASC, e.end ASC"):
        out[f"{chrom}:{start}-{end}"] = (float(mean), float(mean_log2),
                                         float(std_log2) if std_log2 is not None else 0.0)
    return out


def _exon_transcript_mapping(db) -> dict:
    out: dict[str, list[str]] = {}
    for chrom, start, end, name in db.get_rows(
            "SELECT gt.chromosome, ge.start, ge.end, gt.name FROM gene_exon ge "
            "INNER JOIN gene_transcript gt ON ge.transcript_id=gt.id"):
        out.setdefault(f"chr{chrom}:{start}-{end}", []).append(name)
    return out


def _calculate_ranks(values: list[float]) -> list[float]:
    srt = sorted(values, reverse=True)
    return [srt.index(v) + 1 for v in values]


class NGSDAnnotateRNATool(ToolBase):
    """Behavioral reference: src/NGSDAnnotateRNA/main.cpp."""

    name = "NGSDAnnotateRNA"
    description = "Annotates a RNA expression TSV file with cohort information."

    def setup(self):
        self.add_string("ps", "Processed sample name of the input file.")
        self.add_infile("in", "Input TSV file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output TSV file. If unset, writes to STDOUT.", optional=True)
        self.add_enum("mode", "Determines if genes or exons should be annotated.",
                      optional=True, valid=("genes", "exons"), default="genes")
        self.add_enum("cohort_strategy", "Determines which samples are used as reference cohort.",
                      optional=True, valid=("RNA_COHORT_GERMLINE", "RNA_COHORT_GERMLINE_PROJECT", "RNA_COHORT_SOMATIC"),
                      default="RNA_COHORT_GERMLINE")
        self.add_outfile("corr", "File path to output file containing the spearman correlation to cohort mean.", optional=True)
        self.add_infile("hpa_file", "TSV file containing the Human Protein Atlas (https://www.proteinatlas.org) to annotate gene expression", optional=True)
        self.add_infile("cohort_data", "TSV file containing the a column with the TPM/SBRP for the full cohort - overwrites 'cohort_strategy'", optional=True)
        self.add_flag("update_genes", "Update annotated gene names with approved gene names from the NGSD")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        import math
        mode = self.get_enum("mode")
        cohort_strategy = self.get_enum("cohort_strategy")
        corr_path = self.get_outfile("corr")
        hpa_path = self.get_infile("hpa_file")
        cohort_data = self.get_infile("cohort_data")
        update_genes = self.get_flag("update_genes")
        ps_name = self.get_string("ps")
        db = NGSD(self.get_flag("test"))

        ps_id = db.processed_sample_id(ps_name)
        ps_data = db.get_processed_sample_data(ps_id)
        s_id = db.sample_id(ps_name)
        s_data = db.get_sample_data(s_id)
        sys_id = db.processing_system_id(ps_data["processing_system"])

        ensg2gene = _ensembl_gene_mapping(db)
        expression_stats = {}
        exon_transcripts = {}
        cohort = set()
        if not cohort_data:
            cohort = db.get_rna_cohort(sys_id, s_data["tissue"], ps_data["project_name"],
                                       ps_id, cohort_strategy, mode)
        else:
            tsv_c = TsvFile.from_file(cohort_data)
            for col in tsv_c.header:
                col = col.decode()
                if col.endswith("_tpm") and ps_name not in col:
                    cohort.add(int(db.processed_sample_id(col[:-4])))
        cohort.discard(int(ps_id))

        if cohort:
            if cohort_data:
                expression_stats = self._stats_from_file(cohort_data, ps_name, ensg2gene,
                                                         mode == "exons")
                if mode == "exons":
                    exon_transcripts = _exon_transcript_mapping(db)
            elif mode == "genes":
                expression_stats = db.calculate_gene_expression_statistics(cohort)
            else:
                expression_stats = _exon_stats(db, cohort)
                exon_transcripts = _exon_transcript_mapping(db)

        hpa_data = {}
        hpa_annotation = False
        if hpa_path:
            if mode != "genes":
                raise ToolError("HPA annotation only supported for gene expression!")
            if cohort_strategy != "RNA_COHORT_SOMATIC":
                raise ToolError("HPA annotation only supported for somatic samples!")
            tissue = ""
            sdi = db.get_sample_disease_info(s_id, "RNA reference tissue")
            if len(sdi) > 1:
                raise ToolError(f"Multiple HPA reference tissues set for sample '{ps_name}'! Cannot perform annotation.")
            if len(sdi) == 1:
                tissue = sdi[0][1]
            for same_id in db.same_samples(int(s_id), "SAME_SAMPLE"):
                sdi = db.get_sample_disease_info(same_id, "RNA reference tissue")
                if len(sdi) > 1:
                    raise ToolError("Multiple HPA reference tissues set for related 'same sample'! Cannot perform annotation.")
                if len(sdi) == 1:
                    if not tissue:
                        tissue = sdi[0][1]
                    elif tissue != sdi[0][1]:
                        raise ToolError("Differing HPA reference tissue set for related 'same sample'! Cannot perform annotation.")
            if not tissue:
                raise ToolError(f"No HPA reference tissue set for sample '{ps_name}' or 'same sample' relations!")
            # the HPA file header has no leading '#' — parse it directly
            # (main.cpp reads the first line itself)
            with open(hpa_path, "rb") as fh:
                hpa_header = fh.readline().replace(b"\n", b"").replace(b"\r", b"").split(b"\t")
                for col in ("Gene", "Tissue", "nTPM"):
                    if col.encode() not in hpa_header:
                        raise ToolError(f"Column '{col}' missing in HPA file!")
                i_g = hpa_header.index(b"Gene")
                i_t = hpa_header.index(b"Tissue")
                i_v = hpa_header.index(b"nTPM")
                for line in fh:
                    row = line.split(b"\t")
                    if row[i_t].strip().decode() == tissue:
                        hpa_data[row[i_g].strip().decode()] = float(row[i_v])
            if not hpa_data:
                raise ToolError(f"No HPA gene expression found for HPA reference tissue '{tissue}'! Please check if it is a valid HPA tissue.")
            hpa_annotation = True

        tsv = TsvFile.from_file(self.get_infile("in") or "-")
        buf = list(tsv.comments)
        buf.append(b"##cohort_strategy:" + cohort_strategy.encode())
        buf.append(b"##cohort_size:" + str(len(cohort)).encode())
        corr_line_nr = -1
        if corr_path and cohort:
            buf.append(b"##correlation: placeholder")
            corr_line_nr = len(buf) - 1

        header = list(tsv.header)
        db_header = ([b"transcript_id"] if mode == "exons" else []) + [b"cohort_mean", b"log2fc", b"zscore", b"pval"]
        hpa_header = [b"hpa_tissue_tpm", b"hpa_tissue_log2tpm", b"hpa_sample_log2tpm", b"hpa_log2fc"] if hpa_annotation else []
        col_idx = {}
        n_extra = 0
        for cname in db_header + hpa_header:
            if cname in header:
                col_idx[cname] = header.index(cname)
            else:
                header.append(cname)
                n_extra += 1
                col_idx[cname] = len(header) - 1
        buf.append(b"#" + b"\t".join(header))

        if mode == "genes":
            i_value = tsv.column_index(b"tpm")
            i_exon = -1
        else:
            i_value = tsv.column_index(b"srpb")
            i_exon = tsv.column_index(b"exon")
        i_gene_id = tsv.column_index(b"gene_id")
        i_gene_name = tsv.column_index(b"gene_name") if update_genes else -1
        i_tpm = tsv.column_index(b"tpm") if hpa_annotation else -1

        expr_values = []
        mean_values = []
        for row in tsv.rows:
            row = list(row) + [b""] * n_extra
            if mode == "genes":
                ensg = row[i_gene_id].strip().decode()
                key = ensg2gene.get(ensg, "")
            else:
                region = row[i_exon].decode().replace(",", "")
                parts = region.split(":")
                se = parts[1].split("-")
                key = f"{Chromosome(parts[0]).str_normalized(True)}:{se[0]}-{se[1]}"
            if key and key in expression_stats:
                mean, mean_log2, std_log2 = expression_stats[key]
                expr_value = float(row[i_value])
                log2p1 = math.log2(expr_value + 1)
                if mode == "exons":
                    tids = sorted(exon_transcripts.get(key, []))
                    row[col_idx[b"transcript_id"]] = ",".join(tids).encode()
                row[col_idx[b"cohort_mean"]] = _qt_num(mean).encode()
                log2fc = log2p1 - math.log2(mean + 1)
                row[col_idx[b"log2fc"]] = _qt_num(log2fc).encode()
                zscore = (log2p1 - mean_log2) / std_log2 if std_log2 != 0 else float("nan")
                row[col_idx[b"zscore"]] = _qt_num(zscore).encode()
                pvalue = 1 + math.erf(-abs(zscore) / math.sqrt(2)) if zscore == zscore else float("nan")
                row[col_idx[b"pval"]] = _qt_num(pvalue).encode()
                if expr_value > 0 and mean > 0:
                    expr_values.append(expr_value)
                    mean_values.append(mean)
            if hpa_annotation:
                ensg = row[i_gene_id].strip().decode()
                sample_tpm = float(row[i_tpm])
                sample_log2tpm = math.log2(sample_tpm + 1)
                row[col_idx[b"hpa_sample_log2tpm"]] = _qt_num(sample_log2tpm).encode()
                if ensg in hpa_data:
                    tissue_tpm = hpa_data[ensg]
                    tissue_log2 = math.log2(tissue_tpm + 1)
                    row[col_idx[b"hpa_tissue_tpm"]] = _qt_num(tissue_tpm).encode()
                    row[col_idx[b"hpa_tissue_log2tpm"]] = _qt_num(tissue_log2).encode()
                    row[col_idx[b"hpa_log2fc"]] = _qt_num(sample_log2tpm - tissue_log2).encode()
            if update_genes:
                old_name = row[i_gene_name].strip().decode()
                if old_name:
                    ensg = row[i_gene_id].strip().decode()
                    if ensg in ensg2gene:
                        row[i_gene_name] = ensg2gene[ensg].encode()
                    else:
                        row[i_gene_name] = db.gene_to_approved(old_name, True).encode()
            buf.append(b"\t".join(row))

        if corr_path and cohort:
            from ..core.basicstats import correlation
            rank_sample = _calculate_ranks(expr_values)
            rank_means = _calculate_ranks(mean_values)
            corr = correlation(rank_sample, rank_means)
            with open(corr_path, "w") as fh:
                fh.write(f"{_qt_num(corr)}\n")
            buf[corr_line_nr] = b"##correlation: " + _qt_num(corr).encode()

        out_path = self.get_outfile("out")
        data = b"".join(l + b"\n" for l in buf)
        if out_path:
            with open(out_path, "wb") as fh:
                fh.write(data)
        else:
            stdout_binary().write(data)
        db.close()

    @staticmethod
    def _stats_from_file(cohort_file, ps_name, ensg2gene, exons=False):
        import math
        tsv = TsvFile.from_file(cohort_file)
        tpm_idx = [i for i, h in enumerate(tsv.header)
                   if h.endswith(b"_tpm") and ps_name.encode() not in h]
        out = {}
        for row in tsv.rows:
            ident = row[0].decode()
            tpms = [float(row[i]) for i in tpm_idx]
            n = len(tpms)
            mean = sum(tpms) / n
            logs = [math.log2(v + 1) for v in tpms]
            mean_log2 = sum(logs) / n
            stddev_log2 = math.sqrt(sum(l * l for l in logs) / n - mean_log2 * mean_log2)
            if not exons:
                out[ensg2gene.get(ident, "")] = (mean, mean_log2, stddev_log2)
        return out


class NGSDExtractRNACohortTool(ToolBase):
    """Behavioral reference: src/NGSDExtractRNACohort/main.cpp."""

    name = "NGSDExtractRNACohort"
    description = "Creates a table with gene expression values for a given set of genes and cohort"

    def setup(self):
        self.add_string("ps", "Processed sample name on which the cohort is calculated.")
        self.add_infile("genes", "Text file containing gene names which should be included in the table. (1 gene per line.)", optional=True)
        self.add_infile("sample_expression", "TSV file containing gene expression for processed sample (required if processed sample data hasn't been imported to the database yet)", optional=True)
        self.add_outfile("out", "Output TSV file. If unset, writes to STDOUT.", optional=True)
        self.add_enum("cohort_strategy", "Determines which samples are used as reference cohort.",
                      optional=True, valid=("RNA_COHORT_GERMLINE", "RNA_COHORT_GERMLINE_PROJECT", "RNA_COHORT_SOMATIC"),
                      default="RNA_COHORT_GERMLINE")
        self.add_flag("only_samples", "Return only the samples belonging to the cohort - one sample per line")
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_string("allowed_systems", "Processing systems allowed to be in cohort as comma seperated list of short names  - default: only the same as the processed sample", optional=True, default="")

    def main(self):
        from ..core.geneset import GeneSet
        ps_name = self.get_string("ps")
        gene_file = self.get_infile("genes")
        only_samples = self.get_flag("only_samples")
        if not only_samples and not gene_file:
            raise ToolError("No genes are given and flag only_samples not active: please provide genes for expression export or set flag to only get the cohort samples.")
        expression_file = self.get_infile("sample_expression")
        cohort_strategy = self.get_enum("cohort_strategy")
        db = NGSD(self.get_flag("test"))

        ps_id = db.processed_sample_id(ps_name)
        ps_data = db.get_processed_sample_data(ps_id)
        s_id = db.sample_id(ps_name)
        s_data = db.get_sample_data(s_id)
        sys_id = db.processing_system_id(ps_data["processing_system"])

        cohort = list(db.get_rna_cohort(sys_id, s_data["tissue"], ps_data["project_name"],
                                        ps_id, cohort_strategy, "genes"))
        for system in self.get_string("allowed_systems").split(","):
            if not system:
                continue
            added_sys = db.processing_system_id(system)
            if added_sys == sys_id:
                continue
            cohort += list(db.get_rna_cohort(added_sys, s_data["tissue"], ps_data["project_name"],
                                             ps_id, cohort_strategy, "genes"))
        cohort.sort(reverse=True)

        out_path = self.get_outfile("out")
        out = open(out_path, "w") if out_path else sys.stdout
        if only_samples:
            for pid in cohort:
                out.write(db.processed_sample_name(pid) + "\n")
            if out_path:
                out.close()
            db.close()
            return

        if not cohort:
            raise ToolError("No matching samples for cohort found. Cannot create statistics.")

        genes = GeneSet.create_from_file(gene_file)
        sample_expression = {}
        if expression_file:
            tsv = TsvFile.from_file(expression_file)
            i_g = tsv.column_index(b"gene_id")
            i_t = tsv.column_index(b"tpm")
            for row in tsv.rows:
                sample_expression[row[i_g].strip().decode()] = float(row[i_t])
            cohort = [c for c in cohort if c != int(ps_id)]

        gene2ensg = {s: e for e, s in _ensembl_gene_mapping(db).items()}
        gene2id = dict(db.get_rows("SELECT symbol, id FROM expression_gene"))

        out.write(f"##cohort_strategy={cohort_strategy}\n")
        ps_names = [db.processed_sample_name(pid) for pid in cohort]
        out.write("#gene_id\t")
        if expression_file:
            out.write(ps_name + "\t")
        out.write("\t".join(ps_names) + "\n")
        for gene in genes:
            approved = db.gene_to_approved(gene)
            if not approved:
                raise NgsdError(f"Can't convert gene '{gene}' to approved symbol!")
            symbol_id = gene2id.get(approved)
            values = []
            for pid in cohort:
                v = db.get_value("SELECT ev.tpm FROM expression ev WHERE ev.symbol_id=? AND ev.processed_sample_id=?",
                                 params=(symbol_id, pid)) if symbol_id is not None else None
                values.append("" if v is None else _qt_num(float(v)))
            out.write(gene2ensg.get(gene, ""))
            if expression_file:
                out.write("\t" + _qt_num(sample_expression.get(gene2ensg.get(gene, ""), 0.0)))
            out.write("\t" + "\t".join(values) + "\n")
        if out_path:
            out.close()
        db.close()


TOOLS = {
    "NGSDImportExpressionData": NGSDImportExpressionDataTool,
    "NGSDAnnotateGeneExpression": NGSDAnnotateGeneExpressionTool,
    "NGSDAnnotateRNA": NGSDAnnotateRNATool,
    "NGSDExtractRNACohort": NGSDExtractRNACohortTool,
}
