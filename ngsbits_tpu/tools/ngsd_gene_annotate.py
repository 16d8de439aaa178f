"""NGSD-backed gene annotation tools: BedAnnotateGenes, BedGeneOverlap,
CnvGeneAnnotation.

Behavioral reference: ngs-bits src/BedAnnotateGenes/main.cpp,
src/BedGeneOverlap/main.cpp, src/CnvGeneAnnotation/main.cpp.
"""

from __future__ import annotations

import sys

from ..core.chromosome import Chromosome
from ..core.geneset import GeneSet
from ..core.intervals import BedFile, BedLine, ChromosomalIndex
from ..io.tsv import TsvFile
from ..ngsd import NGSD
from .toolbase import ToolBase, ToolError


class BedAnnotateGenesTool(ToolBase):
    name = "BedAnnotateGenes"
    description = "Annotates BED file regions with gene names."

    def setup(self):
        self.add_infile("in", "Input BED file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output BED file. If unset, writes to STDOUT.", optional=True)
        self.add_int("extend", "The number of bases to extend the gene regions before annotation.", optional=True, default=0)
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_flag("clear", "Clear all annotations present in the input file.")

    def main(self):
        extend = self.get_int("extend")
        db = NGSD(self.get_flag("test"))
        f = BedFile.from_file(self.get_infile("in") or "-")
        if self.get_flag("clear"):
            f.clear_annotations()
        for line in f.lines:
            genes = db.genes_overlapping(line.chr, line.start, line.end, extend)
            line.annotations.append(genes.join(", ").encode())
        f.store(self.get_outfile("out") or None)
        db.close()


class BedGeneOverlapTool(ToolBase):
    name = "BedGeneOverlap"
    description = "Calculates how much of each overlapping gene is covered."

    def setup(self):
        self.add_infile("in", "Input BED file. If unset, reads from STDIN.", optional=True)
        self.add_enum("source", "Transcript source database.", valid=("ccds", "ensembl"))
        self.add_outfile("out", "Output TSV file. If unset, writes to STDOUT.", optional=True)
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        source = self.get_enum("source")
        in_file = BedFile.from_file(self.get_infile("in") or "-")
        in_file.merge()

        genes = GeneSet()
        for l in in_file.lines:
            genes.insert_all(db.genes_overlapping(l.chr, l.start, l.end, 0))

        output = ["#gene\tsize\toverlap\tpercentage"]
        reg_unassigned = BedFile()
        reg_unassigned.lines = [BedLine(l.chr, l.start, l.end, list(l.annotations))
                                for l in in_file.lines]
        for gene in genes:
            gs = GeneSet()
            gs.insert(gene)
            reg_gene = db.genes_to_regions(gs, source, "exon", False, False, sys.stderr)
            reg_gene.merge()
            bases_gene = reg_gene.base_count()
            reg_gene.intersect(in_file)
            bases_covered = reg_gene.base_count()
            output.append(f"{gene}\t{bases_gene}\t{bases_covered}\t{100.0 * bases_covered / bases_gene:.2f}")
            reg_gene.sort()
            reg_unassigned.subtract(reg_gene)
        output.append(f"none\tn/a\t{reg_unassigned.base_count()}\tn/a")

        out_path = self.get_outfile("out")
        text = "".join(l + "\n" for l in output)
        if out_path:
            with open(out_path, "w") as fh:
                fh.write(text)
        else:
            sys.stdout.write(text)
        db.close()


class CnvGeneAnnotationTool(ToolBase):
    name = "CnvGeneAnnotation"
    description = "Annotates TSV file containing CNVs with gene information from NGSD."

    def setup(self):
        self.add_infile("in", "Input TSV file containing the CNVs.")
        self.add_outfile("out", "Output TSV file containing the annotated CNVs.")
        self.add_flag("add_simple_gene_names", "Adds an additional column containing only the list of gene names.")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def _relevant_transcripts(self, db, gene_name):
        gid = db.gene_to_approved_id(gene_name)
        return [t for t in db.transcripts(gid, "ensembl", False)
                if t.is_preferred or t.is_mane_select or t.is_mane_plus_clinical
                or t.is_gencode_primary]

    def main(self):
        add_simple = self.get_flag("add_simple_gene_names")
        db = NGSD(self.get_flag("test"))

        gene_regions = BedFile()
        for gene_name in sorted(db.approved_gene_names()):
            for t in self._relevant_transcripts(db, gene_name):
                gene_regions.append(BedLine(t.chr, t.start(), t.end(), [gene_name.encode()]))
        gene_regions.extend(5000)
        gene_regions.sort()
        index = ChromosomalIndex(gene_regions)
        sys.stdout.write("caching gene start/end finished\n")
        sys.stdout.write("annotating CNV file...\n")

        tsv = TsvFile.from_file(self.get_infile("in"))
        out_buffer = list(tsv.comments)
        header = list(tsv.header)
        i_genes = header.index(b"genes") if b"genes" in header else -1
        i_gene_info = header.index(b"gene_info") if b"gene_info" in header else -1
        if i_genes < 0 and add_simple:
            header.append(b"genes")
        if i_gene_info < 0:
            header.append(b"gene_info")
        out_buffer.append(b"#" + b"\t".join(header))

        i_chr = tsv.column_index(b"chr")
        i_start = tsv.column_index(b"start")
        i_end = tsv.column_index(b"end")

        exon_regions: dict[str, BedFile] = {}
        for row in tsv.rows:
            row = list(row)
            chr_ = Chromosome(row[i_chr])
            start = int(row[i_start])
            end = int(row[i_end])
            matching_genes = GeneSet()
            covered: dict[str, str] = {}
            for mi in index.matching_indices(chr_, start, end):
                locus = gene_regions.lines[int(mi)]
                gene_name = locus.annotations[0].decode()
                if start <= locus.start + 5000 and end >= locus.end - 5000:
                    overlap = "complete"
                else:
                    if gene_name not in exon_regions:
                        regions = BedFile()
                        for t in self._relevant_transcripts(db, gene_name):
                            regions.add(t.regions)
                        regions.extend(20)
                        regions.merge()
                        exon_regions[gene_name] = regions
                    if exon_regions[gene_name].overlaps_with(chr_, start, end):
                        overlap = "exonic/splicing"
                    else:
                        overlap = "intronic/intergenic"
                if gene_name in covered:
                    old = covered[gene_name]
                    if overlap != old:
                        if old == "complete" or overlap == "complete":
                            covered[gene_name] = "complete"
                        elif old == "exonic/splicing" or overlap == "exonic/splicing":
                            covered[gene_name] = "exonic/splicing"
                else:
                    covered[gene_name] = overlap
                matching_genes.insert(gene_name)

            gene_info = []
            for gene in matching_genes:
                oe_lof = db.gene_info(gene)["oe_lof"]
                gene_info.append(f"{gene} (oe_lof={oe_lof} region={covered[gene]})")
            if add_simple:
                names = matching_genes.join(",").encode()
                if i_genes < 0:
                    row.append(names)
                else:
                    row[i_genes] = names
            info = ",".join(gene_info).encode()
            if i_gene_info < 0:
                row.append(info)
            else:
                row[i_gene_info] = info
            out_buffer.append(b"\t".join(row))

        sys.stdout.write("Writing output file...\n")
        with open(self.get_outfile("out"), "wb") as fh:
            fh.write(b"".join(l + b"\n" for l in out_buffer))
        sys.stdout.write("annotation done.\n")
        db.close()


TOOLS = {
    "BedAnnotateGenes": BedAnnotateGenesTool,
    "BedGeneOverlap": BedGeneOverlapTool,
    "CnvGeneAnnotation": CnvGeneAnnotationTool,
}
