"""NGSD pathogenic-variant annotation for SV/CNV lists.

Behavioral reference: ngs-bits src/NGSDAnnotateSV/main.cpp and
src/NGSDAnnotateCNV/main.cpp.
"""

from __future__ import annotations

import sys

from ..core.chromosome import Chromosome
from ..io.bedpe import BedpeFile
from ..io.tsv import TsvFile
from ..ngsd import NGSD
from .toolbase import ToolBase, ToolError


class NGSDAnnotateSVTool(ToolBase):
    name = "NGSDAnnotateSV"
    description = "Annotates structural variants in a BEDPE file with pathogenic-SV counts from NGSD."

    def setup(self):
        self.add_infile("in", "BEDPE file containing structural variants.")
        self.add_outfile("out", "Output BEDPE file containing annotated structural variants.")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        svs = BedpeFile.from_file(self.get_infile("in"))
        buf = list(svs.headers)
        header = list(svs.annotation_headers)
        i_path = header.index(b"NGSD_PATHOGENIC_SVS") if b"NGSD_PATHOGENIC_SVS" in header else -1
        extra = 0
        if i_path < 0:
            header.append(b"NGSD_PATHOGENIC_SVS")
            i_path = len(header) - 1
            extra = 1
        buf.append(b"#CHROM_A\tSTART_A\tEND_A\tCHROM_B\tSTART_B\tEND_B\t" + b"\t".join(header))

        select = "SELECT rc.class FROM `report_configuration_sv` rc, "
        for sv in svs.lines:
            annos = list(sv.annotations) + [b""] * extra
            if sv.chr1.is_non_special() and sv.chr2.is_non_special():
                c4 = c5 = 0
                if sv.type == b"BND":
                    rows = db.get_rows(
                        select + "sv_translocation sv WHERE (rc.class='4' OR rc.class='5') "
                        "AND rc.sv_translocation_id=sv.id AND sv.chr1 = ? AND sv.start1 <= ? AND ? <= sv.end1 "
                        "AND sv.chr2 = ? AND sv.start2 <= ? AND ? <= sv.end2",
                        params=(sv.chr1.str_normalized(True), sv.end1, sv.start1,
                                sv.chr2.str_normalized(True), sv.end2, sv.start2))
                elif sv.type == b"INS":
                    min_pos = min(sv.start1, sv.start2)
                    max_pos = max(sv.end1, sv.end2)
                    rows = db.get_rows(
                        select + "sv_insertion sv WHERE (rc.class='4' OR rc.class='5') "
                        "AND rc.sv_insertion_id=sv.id AND sv.chr = ? AND sv.pos <= ? AND ? <= (sv.pos + sv.ci_upper)",
                        params=(sv.chr1.str_normalized(True), max_pos, min_pos))
                else:
                    table = {b"DEL": "sv_deletion", b"DUP": "sv_duplication",
                             b"INV": "sv_inversion"}.get(sv.type)
                    if table is None:
                        raise ToolError("Invalid SV type in BEDPE line.")
                    col = table.split("_")[1]
                    rows = db.get_rows(
                        select + f"{table} sv WHERE (rc.class='4' OR rc.class='5') "
                        f"AND rc.sv_{col}_id=sv.id AND sv.chr = ? AND sv.start_min <= ? "
                        "AND ? <= sv.start_max AND sv.end_min <= ? AND ? <= sv.end_max",
                        params=(sv.chr1.str_normalized(True), sv.end1, sv.start1,
                                sv.end2, sv.start2))
                for cls, in rows:
                    if int(cls) == 4:
                        c4 += 1
                    else:
                        c5 += 1
                if c4 or c5:
                    annos[i_path] = f"{c4}x class4 /{c5}x class5".encode()
            sv.annotations = annos
            buf.append(sv.to_tsv())

        sys.stdout.write("writing annotated SVs to file...\n")
        with open(self.get_outfile("out"), "wb") as fh:
            fh.write(b"".join(l + b"\n" for l in buf))
        db.close()


class NGSDAnnotateCNVTool(ToolBase):
    name = "NGSDAnnotateCNV"
    description = "Annotates a CNV file with overlaping pathogenic CNVs from NGSD."

    def setup(self):
        self.add_infile("in", "TSV file containing CNV.")
        self.add_outfile("out", "TSV output file.")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        sys.stdout.write("annotate TSV file...\n")
        tsv = TsvFile.from_file(self.get_infile("in"))
        buf = list(tsv.comments)
        header = list(tsv.header)
        i_path = header.index(b"ngsd_pathogenic_cnvs") if b"ngsd_pathogenic_cnvs" in header else -1
        if i_path < 0:
            header.append(b"ngsd_pathogenic_cnvs")
        buf.append(b"#" + b"\t".join(header))
        i_chr = tsv.column_index(b"chr")
        i_start = tsv.column_index(b"start")
        i_end = tsv.column_index(b"end")

        for row in tsv.rows:
            row = list(row)
            chr_ = Chromosome(row[i_chr])
            start = int(row[i_start])
            end = int(row[i_end])
            cnv_length = end - start
            found = []
            for cls, p_start, p_end in db.get_rows(
                    "SELECT rcc.class, cnv.start, cnv.end FROM cnv "
                    "INNER JOIN report_configuration_cnv rcc ON cnv.id = rcc.cnv_id "
                    "WHERE rcc.class IN ('4', '5') AND cnv.chr = ? AND cnv.start <= ? AND ? <= cnv.end",
                    params=(chr_.str_normalized(True), end, start)):
                cls = int(cls)
                p_len = p_end - p_start
                intersection = min(p_end, end) - max(p_start, start)
                p_overlap = intersection / p_len
                c_overlap = intersection / cnv_length
                if p_start >= start and p_end <= end:
                    annotate = True
                elif p_overlap >= 0.3 and c_overlap >= 0.3:
                    annotate = True
                elif start >= p_start and end <= p_end and p_overlap >= 0.3:
                    annotate = True
                else:
                    annotate = False
                found.append((cls, p_overlap, annotate))
            found.sort(key=lambda t: (-t[0], -t[1]))
            entries = [f"{cls}/{ov:.3f}" for cls, ov, annotate in found if annotate]
            value = " ".join(entries).encode()
            if i_path < 0:
                row.append(value)
            else:
                row[i_path] = value
            buf.append(b"\t".join(row))

        sys.stdout.write("Writing output file...\n")
        with open(self.get_outfile("out"), "wb") as fh:
            fh.write(b"".join(l + b"\n" for l in buf))
        sys.stdout.write("annotation complete.\n")
        db.close()


class BedpeGeneAnnotationTool(ToolBase):
    """Behavioral reference: src/BedpeGeneAnnotation/main.cpp."""

    name = "BedpeGeneAnnotation"
    description = "Annotates a BEDPE file with gene information from the NGSD."

    def setup(self):
        self.add_infile("in", "Input BEDPE file containing the SVs.")
        self.add_outfile("out", "Output BEDPE file containing the annotated SVs.")
        self.add_flag("add_simple_gene_names", "Adds an additional column containing only the list of gene names.")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        from ..core.geneset import GeneSet
        from ..core.intervals import BedFile, BedLine, ChromosomalIndex
        add_simple = self.get_flag("add_simple_gene_names")
        db = NGSD(self.get_flag("test"))

        def relevant_transcripts(gene_name):
            gid = db.gene_to_approved_id(gene_name)
            return [t for t in db.transcripts(gid, "ensembl", False)
                    if t.is_preferred or t.is_mane_select or t.is_mane_plus_clinical
                    or t.is_gencode_primary]

        gene_regions = BedFile()
        for gene_name in sorted(db.approved_gene_names()):
            for t in relevant_transcripts(gene_name):
                gene_regions.append(BedLine(t.chr, t.start(), t.end(), [gene_name.encode()]))
        gene_regions.extend(5000)
        gene_regions.sort()
        index = ChromosomalIndex(gene_regions)
        sys.stdout.write("caching gene start/end finished\n")

        gene_oe_lof = {}
        for gene_name in db.approved_gene_names():
            v = db.get_value("SELECT gnomad_oe_lof FROM geneinfo_germline WHERE symbol=?",
                             params=(gene_name,))
            gene_oe_lof[gene_name] = f"{float(v):.2f}" if v is not None else "n/a"
        sys.stdout.write("caching gnomAD o/e finished\n")

        f = BedpeFile.from_file(self.get_infile("in"))
        header = list(f.annotation_headers)
        i_gene = header.index(b"GENES") if b"GENES" in header else -1
        if add_simple and i_gene < 0:
            header.append(b"GENES")
        i_gene_bp = header.index(b"GENES_BREAKPOINTS") if b"GENES_BREAKPOINTS" in header else -1
        if add_simple and i_gene_bp < 0:
            header.append(b"GENES_BREAKPOINTS")
        i_gene_info = header.index(b"GENE_INFO") if b"GENE_INFO" in header else -1
        if i_gene_info < 0:
            header.append(b"GENE_INFO")
        buf = list(f.headers)
        buf.append(b"#CHROM_A\tSTART_A\tEND_A\tCHROM_B\tSTART_B\tEND_B\t" + b"\t".join(header))

        exon_regions: dict[str, BedFile] = {}
        for line in f.lines:
            matching = GeneSet()
            matching_bp = GeneSet()
            covered: dict[str, str] = {}
            for sv_region in line.affected_region().lines:
                for mi in index.matching_indices(sv_region.chr, sv_region.start, sv_region.end):
                    locus = gene_regions.lines[int(mi)]
                    gene_name = locus.annotations[0].decode()
                    matching.insert(gene_name)
                    if sv_region.start <= locus.start + 5000 and sv_region.end >= locus.end - 5000:
                        overlap = "complete"
                    else:
                        if gene_name not in exon_regions:
                            regions = BedFile()
                            for t in relevant_transcripts(gene_name):
                                regions.add(t.regions)
                            regions.extend(20)
                            regions.merge()
                            exon_regions[gene_name] = regions
                        if exon_regions[gene_name].overlaps_with(sv_region.chr, sv_region.start, sv_region.end):
                            overlap = "exonic/splicing"
                        else:
                            overlap = "intronic/intergenic"
                    old = covered.get(gene_name)
                    if old is not None:
                        if overlap != old:
                            if old == "complete" or overlap == "complete":
                                covered[gene_name] = "complete"
                            elif old == "exonic/splicing" or overlap == "exonic/splicing":
                                covered[gene_name] = "exonic/splicing"
                    else:
                        covered[gene_name] = overlap
                    if (locus.overlaps(None, sv_region.start, sv_region.start)
                            or locus.overlaps(None, sv_region.end, sv_region.end)):
                        matching_bp.insert(gene_name)

            annos = list(line.annotations)
            if add_simple:
                if i_gene >= 0:
                    annos[i_gene] = matching.join(",").encode()
                else:
                    annos.append(matching.join(",").encode())
            if add_simple:
                if i_gene_bp >= 0:
                    annos[i_gene_bp] = matching_bp.join(",").encode()
                else:
                    annos.append(matching_bp.join(",").encode())
            gene_info = ",".join(
                f"{g} (oe_lof={gene_oe_lof.get(g, 'n/a')} region={covered[g]})" for g in matching)
            if i_gene_info >= 0:
                annos[i_gene_info] = gene_info.encode()
            else:
                annos.append(gene_info.encode())
            line.annotations = annos
            buf.append(line.to_tsv())

        with open(self.get_outfile("out"), "wb") as fh:
            fh.write(b"".join(l + b"\n" for l in buf))
        sys.stdout.write("annotation complete.\n")
        db.close()


TOOLS = {
    "NGSDAnnotateSV": NGSDAnnotateSVTool,
    "NGSDAnnotateCNV": NGSDAnnotateCNVTool,
    "BedpeGeneAnnotation": BedpeGeneAnnotationTool,
}
