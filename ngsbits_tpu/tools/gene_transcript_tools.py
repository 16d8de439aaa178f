"""Gene/transcript lookup tools backed by the NGSD.

Behavioral reference: ngs-bits src/GenesToBed/main.cpp,
src/GenesToTranscripts/main.cpp, src/TranscriptsToBed/main.cpp,
src/TranscriptToProtein/main.cpp.
"""

from __future__ import annotations

import sys

from ngsbits_tpu.utils.stdio import stdin_binary

from ..core.geneset import GeneSet
from ..core.intervals import BedFile
from ..ngsd import NGSD, NgsdError
from .toolbase import ToolBase, ToolError


class GenesToBedTool(ToolBase):
    name = "GenesToBed"
    description = "Converts a text file with gene names to a BED file."

    def setup(self):
        self.add_infile("in", "Input TXT file with one gene symbol per line. If unset, reads from STDIN.", optional=True)
        self.add_enum("source", "Transcript source database.", valid=("ccds", "ensembl"))
        self.add_enum("mode", "Mode: gene = start/end of all transcripts, exon = start/end of all exons of all transcripts.", valid=("gene", "exon"))
        self.add_outfile("out", "Output BED file. If unset, writes to STDOUT.", optional=True)
        self.add_flag("fallback", "Allow fallback to all source databases, if no transcript for a gene is defined in the selected source database.")
        self.add_flag("anno", "Annotate transcript identifier in addition to gene name.")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        genes = GeneSet.create_from_file(self.get_infile("in") or "")
        db = NGSD(self.get_flag("test"))
        output = db.genes_to_regions(genes, self.get_enum("source"), self.get_enum("mode"),
                                     self.get_flag("fallback"), self.get_flag("anno"),
                                     messages=sys.stderr)
        output.store(self.get_outfile("out") or None)
        db.close()


class GenesToTranscriptsTool(ToolBase):
    name = "GenesToTranscripts"
    description = "Converts a text file with gene names to transcripts TSV."

    def setup(self):
        self.add_infile("in", "Input TXT file with one gene symbol per line. If unset, reads from STDIN.", optional=True)
        self.add_enum("mode", "Mode: all = all transcripts, best = best transcript, relevant = all relevant transcripts, mane_select = only MANE select transcripts.",
                      valid=("all", "best", "relevant", "mane_select"))
        self.add_flag("version", "Append transcript version to transcript name.")
        self.add_outfile("out", "Output TSV file. If unset, writes to STDOUT.", optional=True)
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        mode = self.get_enum("mode")
        version = self.get_flag("version")
        db = NGSD(self.get_flag("test"))
        out_path = self.get_outfile("out")
        out = open(out_path, "w") if out_path else sys.stdout
        out.write("#gene\ttranscript\tbiotype\texons\tflags\n")
        in_path = self.get_infile("in")
        fh = open(in_path, "rb") if in_path else stdin_binary()
        for raw in fh:
            gene = raw.decode().strip()
            if not gene or gene.startswith("#"):
                continue
            gene_id = db.gene_to_approved_id(gene)
            if gene_id == -1:
                sys.stderr.write(f"Gene symbol {gene} not found in NGSD!\n")
                continue
            if mode == "best":
                best = db.best_transcript(gene_id)
                transcripts = [best] if best is not None else []
            elif mode == "relevant":
                transcripts = db.relevant_transcripts(gene_id)
            elif mode == "mane_select":
                transcripts = [t for t in db.transcripts(gene_id, "ensembl", False)
                               if t.is_mane_select]
            else:
                transcripts = db.transcripts(gene_id, "ensembl", False)
            for t in transcripts:
                name = t.name_with_version() if version else t.name
                out.write(f"{gene}\t{name}\t{t.biotype}\t{len(t.regions)}\t"
                          + ", ".join(t.flags(False)) + "\n")
            if not transcripts:
                sys.stderr.write(f"No transcript found for gene {gene}!\n")
        if in_path:
            fh.close()
        if out_path:
            out.close()
        db.close()


class TranscriptsToBedTool(ToolBase):
    name = "TranscriptsToBed"
    description = "Converts a text file with transcript names to a BED file."

    def setup(self):
        self.add_infile("in", "Input TXT file with one transcript name per line. If unset, reads from STDIN.", optional=True)
        self.add_enum("mode", "Mode: gene = start/end of the transcript, exon = start/end of all exons of the transcript.", valid=("gene", "exon"))
        self.add_outfile("out", "Output BED file. If unset, writes to STDOUT.", optional=True)
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        mode = self.get_enum("mode")
        output = BedFile()
        in_path = self.get_infile("in")
        fh = open(in_path, "rb") if in_path else stdin_binary()
        for raw in fh:
            name = raw.decode().strip()
            if not name or name.startswith("#"):
                continue
            try:
                output.add(db.transcript_to_regions(name, mode))
            except NgsdError as e:
                sys.stderr.write(str(e) + "\n")
        if in_path:
            fh.close()
        output.store(self.get_outfile("out") or None)
        db.close()


class TranscriptToProteinTool(ToolBase):
    """Behavioral reference: src/TranscriptToProtein/main.cpp."""

    name = "TranscriptToProtein"
    description = "Computes the protein sequence for each transcript name given."

    def setup(self):
        self.add_outfile("out", "Output TSV file.")
        self.add_infile("in", "Input file. If unset, reads from STDIN. Expects one transcript ID (ENSEMBLE or REFSEQ) per line.", optional=True)
        self.add_infile("ref", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_enum("build", "Genome build", optional=True, valid=("hg19", "hg38"), default="hg38")

    def main(self):
        from ..io.fasta import FastaFileIndex
        ref_file = self.get_infile("ref")
        if not ref_file:
            raise ToolError("Reference genome FASTA unset in both command-line and settings.ini file!")
        ref_index = FastaFileIndex(ref_file)
        if self.get_enum("build") == "hg19":
            sys.stderr.write("Warning: When using the hg19 build, it is neccessary to also use a NGSD instance containing hg19 data and a hg19 reference genome.\n")
        db = NGSD(self.get_flag("test"))
        in_path = self.get_infile("in")
        fh = open(in_path, "rb") if in_path else stdin_binary()
        out = open(self.get_outfile("out"), "w")
        for raw in fh:
            line = raw.rstrip(b"\r\n").decode()
            if not line.strip() or line.startswith("#"):
                continue
            tid = db.transcript_id(line, False)
            if tid == -1:
                sys.stderr.write(f"{line}\t Skipped: no matching transcript found in NGSD\n")
                continue
            t = db.transcript(tid)
            if t.biotype != "protein coding":
                sys.stderr.write(f"{line}\t Skipped: Transcript is not protein coding\n")
                continue
            try:
                protein = t.protein_sequence(ref_index, False, True)
            except Exception as e:
                sys.stderr.write(f"{line}\t Skipped: Error converting dna sequence to protein sequence: {e}\n")
                continue
            out.write(f"{line}\t{protein}\n")
        out.close()
        if in_path:
            fh.close()
        db.close()


TOOLS = {
    "GenesToBed": GenesToBedTool,
    "GenesToTranscripts": GenesToTranscriptsTool,
    "TranscriptsToBed": TranscriptsToBedTool,
    "TranscriptToProtein": TranscriptToProteinTool,
}
