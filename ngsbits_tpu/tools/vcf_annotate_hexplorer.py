"""VcfAnnotateHexplorer — HEXplorer/HBond splice scores for VCF variants.

Behavioral reference: ngs-bits src/VcfAnnotateHexplorer/main.cpp
(HEXplorer: Erkelenz et al., NAR 2014; scores computed in float32).
"""

from __future__ import annotations

import gzip
import os
import re
import sys

from ngsbits_tpu.utils.stdio import stdin_binary

import numpy as np

from ..core.chromosome import Chromosome
from ..core.transcripts import reverse_complement
from ..io.fasta import FastaFileIndex
from .toolbase import ToolBase, ToolError

_RESOURCES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "resources")

_HEADERS_HEXPLORER = [
    b'##INFO=<ID=hexplorer_delta,Number=1,Type=Float,Description="This is the HEXplorer delta score (HZEI mutant - HZEI wildtype). HZEI scores were normalized by the total number of nucleotide positions which contribute to the score.">\n',
    b'##INFO=<ID=hexplorer_mut,Number=1,Type=Float,Description="This is the HEXplorer score for the mutant sequence. HZEI scores were normalized by the total number of nucleotide positions which contribute to the score.">\n',
    b'##INFO=<ID=hexplorer_wt,Number=1,Type=Float,Description="This is the HEXplorer score for the reference sequence. HZEI scores were normalized by the total number of nucleotide positions which contribute to the score.">\n',
    b'##INFO=<ID=hexplorer_delta_rev,Number=1,Type=Float,Description="This is the HEXplorer delta score for the reverse complement of the original sequence (HZEI mutant rev - HZEI wildtype rev). HZEI scores were normalized by the total number of nucleotide positions which contribute to the score.">\n',
    b'##INFO=<ID=hexplorer_mut_rev,Number=1,Type=Float,Description="This is the HEXplorer score for the reverse complement of the mutant sequence. HZEI scores were normalized by the total number of nucleotide positions which contribute to the score.">\n',
    b'##INFO=<ID=hexplorer_wt_rev,Number=1,Type=Float,Description="This is the HEXplorer score for the reverse complement of the reference sequence. HZEI scores were normalized by the total number of nucleotide positions which contribute to the score.">\n',
]
_HEADERS_HBOND = [
    b'##INFO=<ID=max_hbond_delta,Number=1,Type=Float,Description="This is the HBond delta score (max HBond mutant - max HBond wildtype).">\n',
    b'##INFO=<ID=max_hbond_mut,Number=1,Type=Float,Description="This is the max HBond score for the mutant sequence.">\n',
    b'##INFO=<ID=max_hbond_wt,Number=1,Type=Float,Description="This is the max HBond score for the reference sequence.">\n',
    b'##INFO=<ID=max_hbond_delta_rev,Number=1,Type=Float,Description="This is the max HBond delta score for the reverse complement of the original sequence (HZEI mutant rev - HZEI wildtype rev).">\n',
    b'##INFO=<ID=max_hbond_mut_rev,Number=1,Type=Float,Description="This is the max HBond score for the reverse complement of the mutant sequence.">\n',
    b'##INFO=<ID=max_hbond_wt_rev,Number=1,Type=Float,Description="This is the max HBond score for the reverse complement of the reference sequence.">\n',
]

_VALID_RE = re.compile(rb"^[ACGTacgt]*$")
_HBOND_RE = re.compile(rb"(?=(.{3}GT.{6}))")


def load_hexplorer_zscores() -> dict:
    out = {}
    with gzip.open(os.path.join(_RESOURCES, "HEXplorer_Z_scores.csv.gz"), "rb") as fh:
        for line in fh:
            if line.startswith(b"#"):
                continue
            parts = line.rstrip(b"\n").split(b";")
            if len(parts) == 2:
                out[parts[0]] = np.float32(parts[1])
    return out


def load_hbond_scores() -> dict:
    out = {}
    with gzip.open(os.path.join(_RESOURCES, "H_Bond_score_table.csv.gz"), "rb") as fh:
        for line in fh:
            if line.startswith(b"#"):
                continue
            parts = line.rstrip(b"\n").split(b";")
            if len(parts) == 2:
                out[parts[0]] = np.float32(parts[1])
    return out


class VcfAnnotateHexplorerTool(ToolBase):
    name = "VcfAnnotateHexplorer"
    description = "Annotates a VCF with Hexplorer and HBond scores."

    def setup(self):
        self.add_outfile("out", "Output VCF file containing HEXplorer and HBOND scores in the INFO column.")
        self.add_infile("in", "Input VCF file. If unset, reads from STDIN.", optional=True)
        self.add_infile("ref", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)

    def hzei_for_sequence(self, seq: bytes) -> np.float32:
        total = np.float32(0)
        for i in range(5, len(seq) - 5):
            undecamer = seq[i - 5:i + 6]
            z = np.float32(0)
            for k in range(6):
                z = np.float32(z + self.zscores.get(undecamer[k:k + 6], np.float32(0)))
            total = np.float32(total + np.float32(z / np.float32(6)))
        return np.float32(total / np.float32(len(seq) - 10))

    def max_hbond(self, seq: bytes) -> np.float32:
        # QRegularExpression::globalMatch finds non-overlapping matches;
        # replicate that (not the lookahead all-positions variant)
        result = np.float32(0)
        i = 0
        while True:
            m = re.compile(rb".{3}GT.{6}").search(seq, i)
            if not m:
                break
            result = max(result, self.hbond.get(m.group(0), np.float32(0)))
            i = m.end()
        return result

    def main(self):
        ref_file = self.get_infile("ref")
        if not ref_file:
            raise ToolError("Reference genome FASTA unset in both command-line and settings.ini file!")
        reference = FastaFileIndex(ref_file)
        self.zscores = load_hexplorer_zscores()
        self.hbond = load_hbond_scores()

        in_path = self.get_infile("in")
        fh = open(in_path, "rb") if in_path else stdin_binary()
        out = open(self.get_outfile("out"), "wb")

        new_info_head_added = False
        add_hexplorer = True
        add_hbond = True
        for raw in fh:
            line = raw
            if not line.strip():
                continue
            if line.startswith(b"##"):
                out.write(line)
                if add_hexplorer and b"hexplorer" in line:
                    sys.stderr.write("WARNING: found hexplorer info header. Will skip calculation of hexplorer scores\n")
                    add_hexplorer = False
                if add_hbond and b"max_hbond" in line:
                    sys.stderr.write("WARNING: found hbond score info header. Will skip calculation of hbond scores\n")
                    add_hbond = False
                continue
            if not new_info_head_added:
                if add_hexplorer:
                    for h in _HEADERS_HEXPLORER:
                        out.write(h)
                if add_hbond:
                    for h in _HEADERS_HBOND:
                        out.write(h)
                new_info_head_added = True
            if line.startswith(b"#"):
                out.write(line)
                continue
            line = line.strip()
            parts = line.split(b"\t")
            if len(parts) < 8:
                raise ToolError("VCF with too few columns: " + line.decode())
            chrom = Chromosome(parts[0])
            start = int(parts[1])
            ref = parts[3].upper()
            alt = parts[4].upper()
            info = parts[7]
            if b"," in alt or alt.startswith(b"<"):
                out.write(line + b"\n")
                continue
            wt_end = start + len(ref)
            wt_seq = reference.seq(chrom, start - 10, wt_end - start + 20)
            mut_end = start + len(alt)
            mut_seq = (reference.seq(chrom, start - 10, 10) + alt
                       + reference.seq(chrom, mut_end, 10))
            if not (_VALID_RE.match(wt_seq) and _VALID_RE.match(mut_seq)):
                sys.stderr.write(f"Skipping variant because it contains non ACGT letters: "
                                 f"{chrom.str}:{start} {ref.decode()}>{alt.decode()}\n")
                out.write(b"\t".join(parts) + b"\n")
                continue

            def collect(old, prefix, value):
                entry = prefix + value
                if old == b"." or not old.strip():
                    return entry
                return old + b";" + entry

            if add_hexplorer:
                hzei_wt = self.hzei_for_sequence(wt_seq)
                hzei_mut = self.hzei_for_sequence(mut_seq)
                hzei_wt_rev = self.hzei_for_sequence(reverse_complement(wt_seq))
                hzei_mut_rev = self.hzei_for_sequence(reverse_complement(mut_seq))
                info = collect(info, b"hexplorer_delta=", _f2(hzei_mut - hzei_wt))
                info = collect(info, b"hexplorer_mut=", _f2(hzei_mut))
                info = collect(info, b"hexplorer_wt=", _f2(hzei_wt))
                info = collect(info, b"hexplorer_delta_rev=", _f2(hzei_mut_rev - hzei_wt_rev))
                info = collect(info, b"hexplorer_mut_rev=", _f2(hzei_mut_rev))
                info = collect(info, b"hexplorer_wt_rev=", _f2(hzei_wt_rev))
            if add_hbond:
                hb_wt = self.max_hbond(wt_seq)
                hb_mut = self.max_hbond(mut_seq)
                hb_wt_rev = self.max_hbond(reverse_complement(wt_seq))
                hb_mut_rev = self.max_hbond(reverse_complement(mut_seq))
                if hb_mut > 0 or hb_wt > 0:
                    info = collect(info, b"max_hbond_delta=", _f2(hb_mut - hb_wt))
                if hb_mut > 0:
                    info = collect(info, b"max_hbond_mut=", _f2(hb_mut))
                if hb_wt > 0:
                    info = collect(info, b"max_hbond_wt=", _f2(hb_wt))
                if hb_mut_rev > 0 or hb_wt_rev > 0:
                    info = collect(info, b"max_hbond_delta_rev=", _f2(hb_mut_rev - hb_wt_rev))
                if hb_mut_rev > 0:
                    info = collect(info, b"max_hbond_mut_rev=", _f2(hb_mut_rev))
                if hb_wt_rev > 0:
                    info = collect(info, b"max_hbond_wt_rev=", _f2(hb_wt_rev))
            parts[7] = info
            out.write(b"\t".join(parts) + b"\n")
        if in_path:
            fh.close()
        out.close()


def _f2(v) -> bytes:
    return f"{float(v):.2f}".encode()


TOOLS = {
    "VcfAnnotateHexplorer": VcfAnnotateHexplorerTool,
}
