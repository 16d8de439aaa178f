"""HgvsToVcf — transform transcript + HGVS.c changes into VCF.

Behavioral reference: ngs-bits src/HgvsToVcf/main.cpp +
Transcript::hgvsToVariant (cppNGS/Transcript.cpp, see core/transcripts.py).
"""

from __future__ import annotations

import datetime
import sys

from ..core.transcripts import hgvs_to_variant
from ..io.fasta import FastaFileIndex
from ..ngsd import NGSD
from .ngsd_export_annotation import _to_vcf
from .ngsd_export_tools import transcript_matches
from .toolbase import ToolBase, ToolError


class HgvsToVcfTool(ToolBase):
    name = "HgvsToVcf"
    description = "Transforms a TSV file with transcript ID and HGVS.c change into a VCF file."

    def setup(self):
        self.add_outfile("out", "Output VCF file.")
        self.add_infile("in", "Input TSV file. If unset, reads from STDIN.", optional=True)
        self.add_infile("ref", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)
        self.add_string("input_info_field", "The input transcript ID and HGVS.c change are added to the VCF output using this INFO field name.", optional=True, default="HGVSc")
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_enum("build", "Genome build", optional=True, valid=("hg19", "hg38"), default="hg38")
        self.add_int("max_seq", "If set, skips variants with ref/alt sequence longer than this cutoff.", optional=True, default=-1)

    def main(self):
        in_path = self.get_infile("in")
        ref_file = self.get_infile("ref")
        if not ref_file:
            raise ToolError("Reference genome FASTA unset in both command-line and settings.ini file!")
        max_seq = self.get_int("max_seq")
        genome = FastaFileIndex(ref_file)
        info_field = self.get_string("input_info_field")

        if self.get_enum("build") == "hg19":
            sys.stderr.write("Warning: When using the hg19 build, it is neccessary to also use a NGSD "
                             "instance containing hg19 data and a hg19 reference genome.\n")
        matches = transcript_matches(self.get_enum("build"))

        db = NGSD(self.get_flag("test"))
        fh = open(in_path) if in_path else sys.stdin
        out = open(self.get_outfile("out"), "w")

        tsv_headers = ["", ""]
        header_written = False
        name2transcript: dict[str, object] = {}
        for raw in fh:
            line = raw.rstrip("\r\n")
            if not line.strip():
                continue
            if line.startswith("##"):
                continue
            if line.startswith("#"):
                tsv_headers = line.split("\t")
                if len(tsv_headers) < 2:
                    raise ToolError(f"Input TSV header line has less than two parts: {line}")
                for h in tsv_headers[2:]:
                    if ";" in h or "=" in h:
                        raise ToolError(f"TSV header is no valid VCF info key: {h}")
                continue
            if not header_written:
                self._write_vcf_header(out, tsv_headers, ref_file, info_field, in_path)
                header_written = True
            self._parse_line(line, db, out, tsv_headers, genome, matches, max_seq,
                             info_field, name2transcript)
        if in_path:
            fh.close()
        out.close()
        db.close()

    @staticmethod
    def _write_vcf_header(out, tsv_headers, ref_file, info_field, in_path):
        out.write("##fileformat=VCFv4.2\n")
        out.write("##fileDate=" + datetime.date.today().strftime("%Y%m%d") + "\n")
        out.write("##source=ngs-bits:HgvsToVcf\n")
        out.write(f"##reference={ref_file}\n")
        out.write(f'##INFO=<ID={info_field},Number=1,Type=String,Description="Input transcript name and HGVS.c change.">\n')
        if len(tsv_headers) > 2:
            src = in_path or "STDIN"
            for h in tsv_headers[2:]:
                out.write(f"##INFO=<ID={h},Number=.,Type=String,Description=Column of HGVS TSV file: {src}>\n")
        out.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")

    def _parse_line(self, line, db, out, tsv_headers, genome, matches, max_seq,
                    info_field, name2transcript):
        parts = line.split("\t")
        if len(parts) != len(tsv_headers):
            raise ToolError(f"Input TSV content line has {len(parts)} fields, but {len(tsv_headers)} "
                            f"are expected from header: {line}")
        transcript_name = parts[0]
        hgvs_c = parts[1]
        try:
            if "." in transcript_name:
                transcript_name = transcript_name.split(".")[0]
            if transcript_name in name2transcript:
                transcript = name2transcript[transcript_name]
                if transcript is None:
                    raise ValueError(f"Transcript {transcript_name} not found in NGSD")
            else:
                trans_id = db.transcript_id(transcript_name, False)
                if trans_id == -1:
                    for match in matches.get(transcript_name, []):
                        if match.startswith("ENST"):
                            match_id = db.transcript_id(match, False)
                            if match_id != -1:
                                trans_id = match_id
                if trans_id == -1:
                    name2transcript[transcript_name] = None
                    raise ValueError(f"Transcript {transcript_name} not found in NGSD")
                transcript = db.transcript(trans_id)
                name2transcript[transcript_name] = transcript

            chr_, start, end, ref, obs = hgvs_to_variant(transcript, hgvs_c, genome)

            # check the variant is valid (ref bases match genome)
            if ref != b"-" and genome.seq(chr_, start, len(ref)) != ref:
                raise ValueError(f"Reference sequence mismatch for variant {chr_.str_normalized(True)}:{start}")

            if max_seq > 0 and (len(obs) > max_seq or len(ref) > max_seq):
                return
            pos, vcf_ref, vcf_obs = _to_vcf(genome, chr_, start, ref.decode(), obs.decode())
            info = [f"{info_field}={parts[0]}:{parts[1]}"]
            for i in range(2, len(parts)):
                info.append(f"{tsv_headers[i]}={parts[i]}")
            out.write(f"{chr_.str_normalized(True)}\t{pos}\t.\t{vcf_ref}\t{vcf_obs}\t.\t.\t" + ";".join(info) + "\n")
        except Exception as e:
            sys.stderr.write(f"Warning: {transcript_name}:{hgvs_c} skipped: couldn't transform it to valid VCF: {e}\n")


TOOLS = {
    "HgvsToVcf": HgvsToVcfTool,
}
