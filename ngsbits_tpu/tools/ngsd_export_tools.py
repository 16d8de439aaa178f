"""NGSD export tools: NGSDExportGff, NGSDExportIgvGeneTrack,
NGSDExportSpliceAI, NGSDExportGenes.

Behavioral reference: ngs-bits src/NGSDExportGff/main.cpp,
src/NGSDExportIgvGeneTrack/main.cpp, src/NGSDExportSpliceAI/main.cpp,
src/NGSDExportGenes/main.cpp.
"""

from __future__ import annotations

import gzip
import math
import os
import sys

from ..ngsd import NGSD
from .toolbase import ToolBase, ToolError

_RES_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "resources")


def _c_mod(a: int, b: int) -> int:
    """C++ % (truncated toward zero)."""
    return int(math.fmod(a, b))


def transcript_matches(build: str = "hg38") -> dict[str, list[str]]:
    """NGSHelper::transcriptMatches — ENST<->RefSeq/CCDS name matches from the
    shipped resource (empty mapping when the resource is absent)."""
    out: dict[str, list[str]] = {}
    path = os.path.join(_RES_DIR, f"{build}_ensembl_transcript_matches.tsv.gz")
    if not os.path.exists(path):
        return out
    with gzip.open(path, "rt") as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            parts = line.rstrip("\r\n").split("\t")
            if len(parts) >= 2:
                out.setdefault(parts[0], []).append(parts[1])
                out.setdefault(parts[1], []).append(parts[0])
    return out


class NGSDExportGffTool(ToolBase):
    name = "NGSDExportGff"
    description = "Writes all transcripts and exons of all genes to a gff3 file."

    def setup(self):
        self.add_outfile("out", "The output GFF file.")
        self.add_flag("genes", "Add gene lines to group transcripts of the same gene.")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        genes_flag = self.get_flag("genes")
        db = NGSD(self.get_flag("test"))
        out = open(self.get_outfile("out"), "w")
        out.write("##gff-version 3\n")

        # gene info with min/max exon positions over ensembl transcripts
        genes: dict[str, dict] = {}
        for row in db.get_rows(
                "SELECT id, symbol, hgnc_id, ensembl_id, type, name, "
                "(SELECT MIN(start) FROM gene_exon ge, gene_transcript gt "
                " WHERE ge.transcript_id=gt.id AND gt.gene_id=gene.id AND gt.source='ensembl') start, "
                "(SELECT MAX(end) FROM gene_exon ge, gene_transcript gt "
                " WHERE ge.transcript_id=gt.id AND gt.gene_id=gene.id AND gt.source='ensembl') end "
                "FROM gene"):
            genes[row[3] or ""] = {"id": row[0], "symbol": row[1], "hgnc_id": str(row[2]),
                                   "ensembl_id": row[3] or "", "type": row[4], "name": row[5],
                                   "start": "" if row[6] is None else str(row[6]),
                                   "end": "" if row[7] is None else str(row[7])}

        def w(chrom, linetype, start, end, strand, info, phase):
            out.write(f"{chrom}\tNGSD\t{linetype}\t{start}\t{end}\t.\t{strand}\t{phase}\t{info}\n")

        last_gene_id = "-1"
        for trans in db._transcript_cache()[0]:
            gene_id = trans.gene_id
            chrom = trans.chr.str_normalized(True)
            strand = trans.strand
            if strand == "+":
                phase = str(_c_mod(trans.coding_start - trans.start(), 3))
            else:
                phase = str(3 - _c_mod(trans.end() - trans.coding_start, 3))
            if genes_flag and not gene_id:
                continue
            gene = genes.get(gene_id, {"symbol": "", "hgnc_id": "", "ensembl_id": "",
                                       "type": "", "name": "", "start": "", "end": ""})
            if genes_flag and gene_id != last_gene_id:
                gid = f"gene:{trans.gene_id}"
                info = ";".join([f"ID={gid}", f"Name={gene['symbol']}", f"hgnc_id={gene['hgnc_id']}",
                                 f"gene_id={gene['ensembl_id']}", f"type={gene['type']}",
                                 f"description={gene['name']}"])
                w(chrom, "gene", gene["start"], gene["end"], strand, info, ".")
            last_gene_id = gene_id

            tid = f"transcript:{trans.name}"
            parts = [f"ID={tid}", f"Name={gene['symbol']}"]
            if genes_flag:
                parts.append(f"Parent=gene:{trans.gene_id}")
            parts += [f"transcript_id={trans.name}",
                      f"biotype={trans.biotype.replace(' ', '_')}",
                      f"is_gencode_basic={1 if trans.is_gencode_basic else 0}",
                      f"is_gencode_primary={1 if trans.is_gencode_primary else 0}",
                      f"is_ensembl_canonical={1 if trans.is_ensembl_canonical else 0}",
                      f"is_mane_select={1 if trans.is_mane_select else 0}",
                      f"is_mane_plus_clinical={1 if trans.is_mane_plus_clinical else 0}"]
            w(chrom, "RNA", trans.start(), trans.end(), strand, ";".join(parts), ".")

            coding = trans.coding_regions()
            if len(coding):
                for reg in trans.utr_3prime().lines:
                    w(reg.chr.str_normalized(True), "three_prime_UTR", reg.start, reg.end,
                      strand, f"Parent={tid}", ".")
                cds_offset = 0
                n = len(coding)
                for i in range(n):
                    reg = coding.lines[(n - 1) - i] if strand == "-" else coding.lines[i]
                    phase = str((3 - cds_offset) % 3)
                    cds_offset = (cds_offset + reg.length()) % 3
                    w(reg.chr.str_normalized(True), "CDS", reg.start, reg.end,
                      strand, f"Parent={tid}", phase)
                for reg in trans.utr_5prime().lines:
                    w(reg.chr.str_normalized(True), "five_prime_UTR", reg.start, reg.end,
                      strand, f"Parent={tid}", ".")
            else:
                for reg in trans.regions.lines:
                    w(reg.chr.str_normalized(True), "exon", reg.start, reg.end,
                      strand, f"Parent={tid}", ".")
        out.close()
        db.close()


class NGSDExportIgvGeneTrackTool(ToolBase):
    name = "NGSDExportIgvGeneTrack"
    description = "Writes all transcripts and exons of all genes to a IGV-readable text file."

    def setup(self):
        self.add_outfile("out", "The output text file.")
        self.add_outfile("out_mane", "The optional output text file for MANE transcripts.", optional=True)
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        out = open(self.get_outfile("out"), "w")
        mane_path = self.get_outfile("out_mane")
        out_mane = open(mane_path, "w") if mane_path else None
        matches = transcript_matches("hg38")

        for trans in db._transcript_cache()[0]:
            name = trans.name
            if name in matches:
                name += ", " + ", ".join(matches[name])
            strand = trans.strand
            if strand == "+":
                cds_start = str(trans.coding_start - 1) if trans.coding_start > 0 else str(trans.end())
                cds_end = str(trans.coding_end) if trans.coding_end > 0 else str(trans.end())
            else:
                cds_end = str(trans.coding_start) if trans.coding_start > 0 else str(trans.end())
                cds_start = str(trans.coding_end - 1) if trans.coding_end > 0 else str(trans.end())

            coding = trans.coding_regions()
            cds_status = "none"
            exon_ranges: list[list[int]] = []
            if len(coding):
                for reg in trans.utr_3prime().lines:
                    exon_ranges.append([reg.start, reg.end, -1])
                cds_offset = 0
                n = len(coding)
                for i in range(n):
                    reg = coding.lines[(n - 1) - i] if strand == "-" else coding.lines[i]
                    phase = cds_offset
                    cds_offset = (cds_offset + reg.length()) % 3
                    cds_status = "cmpl"
                    exon_ranges.append([reg.start, reg.end, phase])
                for reg in trans.utr_5prime().lines:
                    exon_ranges.append([reg.start, reg.end, -1])
            else:
                for reg in trans.regions.lines:
                    exon_ranges.append([reg.start, reg.end, -1])

            exon_ranges.sort(key=lambda e: e[0])
            merged: list[list[int]] = []
            for exon in exon_ranges:
                if merged and merged[-1][1] == exon[0] - 1:
                    merged[-1][1] = exon[1]
                    merged[-1][2] = max(merged[-1][2], exon[2])
                    continue
                merged.append([exon[0] - 1, exon[1], exon[2]])

            line = "\t".join([
                "0", name, trans.chr.str_normalized(True), strand,
                str(trans.start() - 1), str(trans.end()), cds_start, cds_end,
                str(len(merged)),
                "".join(f"{e[0]}," for e in merged),
                "".join(f"{e[1]}," for e in merged),
                "0", trans.gene, cds_status, cds_status,
                "".join(f"{e[2]}," for e in merged)])
            out.write(line + "\n")
            if out_mane is not None and (trans.is_mane_plus_clinical or trans.is_mane_select):
                out_mane.write(line + "\n")
        out.close()
        if out_mane is not None:
            out_mane.close()
        db.close()


class NGSDExportSpliceAITool(ToolBase):
    name = "NGSDExportSpliceAI"
    description = "Exports gene transcripts from NGSD in SpliceAI format."

    def setup(self):
        self.add_outfile("out", "The output text file.")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        genes_done = set()
        transcripts = []
        for t in db._transcript_cache()[0]:
            if t.is_preferred or t.is_mane_select or t.is_mane_plus_clinical:
                transcripts.append(t)
                genes_done.add(t.gene)
        for query in ("SELECT symbol from gene WHERE type='protein-coding gene'",
                      "SELECT DISTINCT g.gene FROM omim_gene g, omim_phenotype p WHERE g.id=p.omim_gene_id"):
            for gene in db.get_values(query):
                if gene in genes_done:
                    continue
                gid = db.gene_to_approved_id(gene)
                t = db.best_transcript(gid) if gid != -1 else None
                if t is None:
                    continue
                transcripts.append(t)
                genes_done.add(t.gene)
        transcripts.sort(key=lambda t: (t.chr.num, t.start(), t.end(), t.name))

        with open(self.get_outfile("out"), "w") as out:
            out.write("#NAME\tCHROM\tSTRAND\tTX_START\tTX_END\tEXON_START\tEXON_END\n")
            for t in transcripts:
                starts = "".join(f"{l.start - 1}," for l in t.regions.lines)
                ends = "".join(f"{l.end}," for l in t.regions.lines)
                out.write(f"{t.gene}_{t.name}\t{t.chr.str_normalized(True)}\t{t.strand}\t"
                          f"{t.start() - 1}\t{t.end()}\t{starts}\t{ends}\n")
        sys.stdout.write(f"Exported genes: {len(genes_done)}\n")
        sys.stdout.write(f"Exported transcripts: {len(transcripts)}\n")
        db.close()


class NGSDExportGenesTool(ToolBase):
    name = "NGSDExportGenes"
    description = "Lists genes from NGSD."

    def setup(self):
        self.add_outfile("out", "The output TSV file. If unset, writes to STDOUT.", optional=True)
        self.add_flag("add_disease_info", "Annotate with disease information from HPO, OrphaNet and OMIM (slow).")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        add_disease = self.get_flag("add_disease_info")
        out_path = self.get_outfile("out")
        out = open(out_path, "w") if out_path else sys.stdout
        header = ["#symbol", "HGNC id", "type", "name", "transcripts coding (ensembl)",
                  "transcripts non-coding (ensembl)", "gnomAD oe (syn)", "gnomAD oe (mis)",
                  "gnomAD oe (lof)", "gnomAD pLI", "inheritance",
                  "imprinting_expressed_allele", "pseudogenes"]
        if add_disease:
            header += ["HPO terms", "OMIM phenotypes", "OrphaNet diseases"]
        out.write("\t".join(header) + "\n")

        for row in db.get_rows(
                "SELECT g.symbol, g.hgnc_id, g.type, g.name, "
                "(SELECT COUNT(*) FROM gene_transcript gt WHERE gene_id=g.id AND gt.source='ensembl' AND gt.start_coding IS NOT NULL) trans, "
                "(SELECT COUNT(*) FROM gene_transcript gt WHERE gene_id=g.id AND gt.source='ensembl' AND gt.start_coding IS NULL) trans_nc "
                "FROM gene g ORDER BY g.symbol ASC"):
            symbol, hgnc_id, type_, name, trans, trans_nc = row
            gi = db.gene_info(symbol)
            imprint = ""
            if gi["imprinting_expressed_allele"] or gi["imprinting_confidence"]:
                imprint = f"{gi['imprinting_expressed_allele']} ({gi['imprinting_confidence']})"
            fields = [symbol, f"HGNC:{hgnc_id}", type_, name, str(trans), str(trans_nc),
                      gi["oe_syn"].replace("n/a", ""), gi["oe_mis"].replace("n/a", ""),
                      gi["oe_lof"].replace("n/a", ""), gi["pli"].replace("n/a", ""),
                      gi["inheritance"].replace("n/a", ""), imprint,
                      ", ".join(gi["pseudogenes"])]
            if add_disease:
                hpos = [f"{acc} - {nm}" for acc, nm in db.phenotypes_of_gene(symbol)]
                fields.append("; ".join(hpos))
                omim_phenos = []
                for info in db.omim_info(symbol):
                    omim_phenos += [p["name"] for p in info["phenotypes"]]
                fields.append("; ".join(omim_phenos))
                orpha = [f"{ident} - {nm}" for ident, nm in db.get_rows(
                    "SELECT dt.identifier, dt.name FROM disease_term dt, disease_gene dg "
                    "WHERE dg.disease_term_id=dt.id AND dt.source='OrphaNet' AND dg.gene=?",
                    params=(symbol,))]
                fields.append("; ".join(orpha))
            out.write("\t".join(fields) + "\n")
        if out_path:
            out.close()
        db.close()


TOOLS = {
    "NGSDExportGff": NGSDExportGffTool,
    "NGSDExportGenes": NGSDExportGenesTool,
    "NGSDExportIgvGeneTrack": NGSDExportIgvGeneTrackTool,
    "NGSDExportSpliceAI": NGSDExportSpliceAITool,
}
