"""TranscriptComparison — match Ensembl transcripts to RefSeq/CCDS.

Behavioral reference: ngs-bits src/TranscriptComparison/main.cpp.
"""

from __future__ import annotations

import sys

from ..core.intervals import BedFile
from ..core.transcripts import load_gff3
from ..ngsd import NGSD
from .toolbase import ToolBase, ToolError


def _copy_regions(bed: BedFile) -> BedFile:
    from ..core.intervals import BedLine
    out = BedFile()
    for l in bed.lines:
        out.append(BedLine(l.chr, l.start, l.end))
    return out


class TranscriptComparisonTool(ToolBase):
    name = "TranscriptComparison"
    description = "Compares transcripts from Ensembl and RefSeq/CCDS."

    def setup(self):
        self.add_infile("ensembl", "Ensembl GFF file.")
        self.add_infile("refseq", "RefSeq GFF file.")
        self.add_outfile("out", "Output TSV file with matches.", optional=True)
        self.add_float("min_ol", "Minimum overall/CDS overlap percentage for printing out a relation if there is no perfect match (disabled by default).", optional=True, default=100.0)
        self.add_flag("test", "Uses the test database instead of on the production database.")

    @staticmethod
    def _match_line(ensembl, refseq_ccds, gene, is_coding, ol, ol_cds, ol_utr, comment) -> str:
        ol_cds_str = "n/a" if ol_cds == -1 else f"{ol_cds:.2f}"
        ol_utr_str = "n/a" if ol_utr == -1 else f"{ol_utr:.2f}"
        coding = "coding" if is_coding else "non-coding"
        return f"{ensembl}\t{refseq_ccds}\t{gene}\t{coding}\t{ol:.2f}\t{ol_cds_str}\t{ol_utr_str}\t{comment}\n"

    def _print_matches(self, out, matches, is_coding, min_ol) -> int:
        written = 0
        if is_coding:
            matches.sort(key=lambda m: (-m["ol_cds"], -m["ol_utr"]))
            for m in matches:
                if m["ol_cds"] >= 100.0 and m["ol_utr"] >= 100.0:
                    out.write(self._match_line(m["ensembl"], m["refseq"], m["gene"], True,
                                               m["ol"], m["ol_cds"], m["ol_utr"], "perfect match"))
                    written += 1
            if written:
                return written
            first_utr = -1.0
            for m in matches:
                if m["ol_cds"] >= 100.0:
                    if first_utr < 0:
                        first_utr = m["ol_utr"]
                    if m["ol_utr"] < first_utr:
                        continue
                    out.write(self._match_line(m["ensembl"], m["refseq"], m["gene"], True,
                                               m["ol"], m["ol_cds"], m["ol_utr"],
                                               "perfect CDS match, but UTR differences"))
                    written += 1
            if written:
                return written
            for m in matches:
                if m["ol_cds"] >= min_ol:
                    out.write(self._match_line(m["ensembl"], m["refseq"], m["gene"], True,
                                               m["ol"], m["ol_cds"], m["ol_utr"],
                                               f"above {min_ol:.2f}% CDS overlap"))
                    written += 1
        else:
            matches.sort(key=lambda m: -m["ol"])
            for m in matches:
                if m["ol"] >= 100.0:
                    out.write(self._match_line(m["ensembl"], m["refseq"], m["gene"], False,
                                               m["ol"], m["ol_cds"], m["ol_utr"], "perfect match"))
                    written += 1
            if written:
                return written
            for m in matches:
                if m["ol"] >= min_ol:
                    out.write(self._match_line(m["ensembl"], m["refseq"], m["gene"], False,
                                               m["ol"], m["ol_cds"], m["ol_utr"],
                                               f"above {min_ol:.2f}% overlap"))
                    written += 1
        return written

    def main(self):
        min_ol = self.get_float("min_ol")
        stream = sys.stdout

        stream.write("### loading Ensembl transcripts from GFF ###\n")
        trans_e = load_gff3(self.get_infile("ensembl"), source="ensembl").transcripts
        stream.write("### loading RefSeq transcripts from GFF ###\n")
        trans_r = load_gff3(self.get_infile("refseq"), source="refseq").transcripts

        stream.write("### loading CCDS transcripts from NGSD ###\n")
        db = NGSD(self.get_flag("test"))
        trans_c = [t for t in db._transcript_cache()[0] if t.source == "ccds"]
        stream.write(f"loaded CCDS transcripts: {len(trans_c)}\n")

        def by_chr(transcripts):
            out = {}
            for t in transcripts:
                out.setdefault(t.chr.num, []).append(t)
            return out

        r_by_chr = by_chr(trans_r)
        c_by_chr = by_chr(trans_c)

        out_path = self.get_outfile("out")
        out = open(out_path, "w") if out_path else sys.stdout
        out.write(f"##Ensembl file: {self.get_infile('ensembl')}\n")
        out.write(f"##RefSeq file: {self.get_infile('refseq')}\n")
        out.write("#Ensembl ID\tRefSeq ID\tgene\ttype\toverlap\toverlap_cds\toverlap_utr\tmatch details\n")

        written_overall = 0
        transcripts_matched = set()
        genes = set()
        genes_matched = set()
        matched_ccds = 0
        trans_e.sort(key=lambda t: (t.chr.num, t.start(), t.end(), t.name))
        for t_e in trans_e:
            matches = []
            for t_r in r_by_chr.get(t_e.chr.num, []):
                if t_r.start() > t_e.end() or t_r.end() < t_e.start():
                    continue
                if t_e.strand != t_r.strand:
                    continue
                if t_e.is_coding() != t_r.is_coding():
                    continue
                if not t_r.name:
                    continue
                genes.add(t_e.gene)
                region = _copy_regions(t_e.regions)
                bases_ens = region.base_count()
                region.intersect(t_r.regions)
                bases_ref = t_r.regions.base_count()
                ol = 100.0 * region.base_count() / max(bases_ens, bases_ref)
                ol_cds = -1.0
                ol_utr = -1.0
                if t_e.is_coding():
                    region = t_e.coding_regions()
                    bases_ens = region.base_count()
                    region.intersect(t_r.coding_regions())
                    bases_ref = t_r.coding_regions().base_count()
                    ol_cds = 100.0 * region.base_count() / max(bases_ens, bases_ref)
                    region = t_e.utr_3prime()
                    region.add(t_e.utr_5prime())
                    region.lines.sort(key=lambda l: l.sort_key())
                    bases_ens = region.base_count()
                    region2 = t_r.utr_3prime()
                    region2.add(t_r.utr_5prime())
                    region2.lines.sort(key=lambda l: l.sort_key())
                    bases_ref = region2.base_count()
                    region.intersect(region2)
                    max_bases = max(bases_ens, bases_ref)
                    ol_utr = 100.0 if max_bases == 0 else 100.0 * region.base_count() / max_bases
                matches.append({"ensembl": t_e.name, "refseq": t_r.name, "gene": t_e.gene,
                                "ol": ol, "ol_cds": ol_cds, "ol_utr": ol_utr})
            written = self._print_matches(out, matches, t_e.is_coding(), min_ol)
            written_overall += written
            if written > 0:
                transcripts_matched.add(t_e.name)
                genes_matched.add(t_e.gene)

            if not t_e.is_coding():
                continue
            for t_c in c_by_chr.get(t_e.chr.num, []):
                if t_c.start() > t_e.end() or t_c.end() < t_e.start():
                    continue
                if t_e.strand != t_c.strand:
                    continue
                region = t_e.coding_regions()
                bases_ens = region.base_count()
                region.intersect(t_c.coding_regions())
                bases_ref = t_c.coding_regions().base_count()
                ol = 100.0 * region.base_count() / max(bases_ens, bases_ref)
                if ol >= 100.0:
                    out.write(self._match_line(t_e.name, t_c.name, t_e.gene, True,
                                               ol, ol, -1.0, "perfect CDS match"))
                    matched_ccds += 1

        if out_path:
            out.close()
        stream.write(f"Overall Ensembl-RefSeq transcript matches written: {written_overall}\n")
        stream.write(f"Ensembl transcripts with RefSeq match: {len(transcripts_matched)}\n")
        stream.write(f"Ensembl transcripts without RefSeq match: {len(trans_e) - len(transcripts_matched)}\n")
        stream.write(f"Ensembl genes with RefSeq match: {len(genes_matched)}\n")
        stream.write(f"Ensembl genes without RefSeq match: {len(genes) - len(genes_matched)}\n")
        stream.write(f"Overall Ensembl-CCDS transcript matches written: {matched_ccds}\n")
        db.close()


TOOLS = {
    "TranscriptComparison": TranscriptComparisonTool,
}
