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


TOOLS = {
    "NGSDAnnotateSV": NGSDAnnotateSVTool,
    "NGSDAnnotateCNV": NGSDAnnotateCNVTool,
}
