"""VcfAnnotateMaxEntScan — MaxEntScan splice-site scores for VCF variants.

Behavioral reference: ngs-bits src/VcfAnnotateMaxEntScan/{main.cpp,
ChunkProcessor.cpp} (itself a reimplementation of the VEP MaxEntScan
plugin). Scores are computed in float32 like the reference.
"""

from __future__ import annotations

import gzip
import os
import sys

from ngsbits_tpu.utils.stdio import stdin_binary, stdout_binary

import numpy as np

from ..core.chromosome import Chromosome
from ..core.intervals import BedFile, BedLine, ChromosomalIndex
from ..core.transcripts import load_gff3, reverse_complement
from ..io.fasta import FastaFileIndex
from .toolbase import ToolBase, ToolError

_RESOURCES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "resources")

_BGD = {65: np.float32(0.27), 67: np.float32(0.23), 71: np.float32(0.23), 84: np.float32(0.27)}
_CONS15 = {65: np.float32(0.004), 67: np.float32(0.0032), 71: np.float32(0.9896), 84: np.float32(0.0032)}
_CONS25 = {65: np.float32(0.0034), 67: np.float32(0.0039), 71: np.float32(0.0042), 84: np.float32(0.9884)}
_CONS13 = {65: np.float32(0.9903), 67: np.float32(0.0032), 71: np.float32(0.0034), 84: np.float32(0.0030)}
_CONS23 = {65: np.float32(0.0027), 67: np.float32(0.0037), 71: np.float32(0.9905), 84: np.float32(0.0030)}

_BASE2INT = {65: 0, 67: 1, 71: 2, 84: 3}
_ACGT = frozenset(b"ACGT")


def _hashseq(seq: bytes) -> int:
    result = 0
    n = len(seq)
    for i, b in enumerate(seq):
        result += _BASE2INT[b] * (4 ** (n - i - 1))
    return result


def load_score5_matrix() -> dict:
    out = {}
    with gzip.open(os.path.join(_RESOURCES, "mes_score5_matrix.tsv.gz"), "rb") as fh:
        for line in fh:
            parts = line.rstrip(b"\n").split(b"\t")
            if len(parts) == 2:
                out[parts[0]] = np.float32(parts[1])
    return out


def load_score3_matrix() -> dict:
    out: dict[int, dict[int, np.float32]] = {}
    with gzip.open(os.path.join(_RESOURCES, "mes_score3_matrix.tsv.gz"), "rb") as fh:
        for line in fh:
            parts = line.rstrip(b"\n").split(b"\t")
            if len(parts) == 3:
                out.setdefault(int(parts[0]), {})[int(parts[1])] = np.float32(parts[2])
    return out


class MaxEntScanScorer:
    def __init__(self):
        self.score5_rest = load_score5_matrix()
        self.score3_rest = load_score3_matrix()
        self._cache: dict[bytes, np.float32] = {}

    def score5(self, seq: bytes) -> np.float32:
        if seq in self._cache:
            return self._cache[seq]
        consensus = (_CONS15[seq[3]] * _CONS25[seq[4]]) / (_BGD[seq[3]] * _BGD[seq[4]])
        rest = self.score5_rest[seq[:3] + seq[5:]]
        score = np.float32(np.log2(np.float32(consensus * rest)))
        self._cache[seq] = score
        return score

    def score3(self, seq: bytes) -> np.float32:
        if seq in self._cache:
            return self._cache[seq]
        consensus = (_CONS13[seq[18]] * _CONS23[seq[19]]) / (_BGD[seq[18]] * _BGD[seq[19]])
        rest_seq = seq[:18] + seq[20:]
        m = self.score3_rest
        rest = np.float32(1)
        rest = np.float32(rest * m[0][_hashseq(rest_seq[0:7])])
        rest = np.float32(rest * m[1][_hashseq(rest_seq[7:14])])
        rest = np.float32(rest * m[2][_hashseq(rest_seq[14:21])])
        rest = np.float32(rest * m[3][_hashseq(rest_seq[4:11])])
        rest = np.float32(rest * m[4][_hashseq(rest_seq[11:18])])
        rest = np.float32(rest / m[5][_hashseq(rest_seq[4:7])])
        rest = np.float32(rest / m[6][_hashseq(rest_seq[7:11])])
        rest = np.float32(rest / m[7][_hashseq(rest_seq[11:14])])
        rest = np.float32(rest / m[8][_hashseq(rest_seq[14:18])])
        score = np.float32(np.log2(np.float32(consensus * rest)))
        self._cache[seq] = score
        return score

    def max_score(self, context: bytes, window: int, scorefunc) -> tuple:
        maxscore = np.float32(-2147483647.0)
        frame = -1
        for i in range(0, len(context) - window + 1):
            s = scorefunc(context[i:i + window])
            if s > maxscore:
                maxscore = s
                frame = i
        return maxscore, frame


class VcfAnnotateMaxEntScanTool(ToolBase):
    name = "VcfAnnotateMaxEntScan"
    description = "Annotates a VCF file with MaxEntScan scores."

    def setup(self):
        self.add_infile("gff", "Ensembl-style GFF file with transcripts, e.g. from https://ftp.ensembl.org/pub/release-115/gff3/homo_sapiens/Homo_sapiens.GRCh38.115.gff3.gz.")
        self.add_outfile("out", "Output VCF file containing the MaxEntScan scores in the INFO column. If unset, writes to STDOUT.", optional=True)
        self.add_infile("in", "Input VCF file. If unset, reads from STDIN.", optional=True)
        self.add_flag("swa", "Enables sliding window approach, i.e. predictions of de-novo acceptor/donor sites.")
        self.add_flag("all", "If set, all transcripts are used for annotation (the default is to skip transcripts not labeled with the 'GENCODE basic' tag).")
        self.add_string("tag", "Info entry name used for native splice site scores.", optional=True, default="MES")
        self.add_string("tag_swa", "Info entry name used for SWA scores.", optional=True, default="MES_SWA")
        self.add_int("decimals", "Number of decimals of output scores.", optional=True, default=2)
        self.add_float("min_score", "Minimum score to report.", optional=True, default=-1000.0)
        self.add_int("threads", "The number of threads used to process VCF line chunk.", optional=True, default=1)
        self.add_int("block_size", "Number of VCF lines processed in one chunk.", optional=True, default=10000)
        self.add_int("prefetch", "Maximum number of chunks that may be pre-fetched into memory.", optional=True, default=64)
        self.add_infile("ref", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)
        self.add_flag("debug", "Enables debug output (use only with one thread).")

    def main(self):
        ref_file = self.get_infile("ref")
        if not ref_file:
            raise ToolError("Reference genome FASTA unset in both command-line and settings.ini file!")
        self.reference = FastaFileIndex(ref_file)
        self.scorer = MaxEntScanScorer()
        self.tag = self.get_string("tag").encode()
        self.tag_swa = self.get_string("tag_swa").encode()
        self.decimals = self.get_int("decimals")
        self.min_score = self.get_float("min_score")
        self.swa = self.get_flag("swa")

        data = load_gff3(self.get_infile("gff"), include_all=self.get_flag("all"))
        transcripts = sorted(
            data.transcripts,
            key=lambda t: (t.chr.num if t.chr.num is not None else 1 << 30, t.start(), t.end(), t.name))
        spans = BedFile()
        for t in transcripts:
            spans.append(BedLine(t.chr, t.start(), t.end()))
        index = ChromosomalIndex(spans) if len(spans) else None
        self.transcripts = transcripts
        self.index = index

        header_lines = [b"##INFO=<ID=" + self.tag + b',Number=1,Type=String,Description="The MaxEntScan scores. FORMAT: A | separated list of maxentscan_ref&maxentscan_alt&transcript_name items.">\n']
        if self.swa:
            header_lines.append(b"##INFO=<ID=" + self.tag_swa + b',Number=1,Type=String,Description="The MaxEntScan SWA scores. FORMAT: A | separated list of maxentscan_ref_donor&maxentscan_alt_donor&maxentscan_donor_comp&maxentscan_ref_acceptor&maxentscan_alt_acceptor&maxentscan_acceptor_comp&transcript_name items.">\n')

        in_path = self.get_infile("in")
        out_path = self.get_outfile("out")
        fh = open(in_path, "rb") if in_path else stdin_binary()
        out = open(out_path, "wb") if out_path else stdout_binary()
        body = []
        for raw in fh:
            line = raw
            if not line.strip():
                continue
            if line.startswith(b"#"):
                if line.startswith(b"#CHROM"):
                    for h in header_lines:
                        out.write(h)
                out.write(line if line.endswith(b"\n") else line + b"\n")
                continue
            body.append(line.strip())
        from ..utils.chunkpool import process_chunks

        def annotate_chunk(chunk, _st):
            return [self._annotate_line(l) for l in chunk]

        for piece in process_chunks(body, annotate_chunk, None,
                                    self.get_int("threads"),
                                    self.get_int("block_size")):
            out.write(piece)
        if in_path:
            fh.close()
        if out_path:
            out.close()

    def _fmt(self, score) -> bytes:
        val = float(score)
        if val < self.min_score:
            val = self.min_score
        return f"{val:.{self.decimals}f}".encode()

    def _get_seqs(self, chrom, start, ref, obs, slice_start, length, minus):
        ref_seq = self.reference.seq(chrom, slice_start, length + len(ref) - 1)
        if not ref_seq or any(c not in _ACGT for c in ref_seq):
            return None, None
        k = start - slice_start
        alt_seq = ref_seq[:k] + obs + ref_seq[k + len(ref):]
        if minus:
            return reverse_complement(ref_seq), reverse_complement(alt_seq)
        return ref_seq, alt_seq

    def _matching_transcripts(self, chrom, start, end):
        if self.index is None:
            return []
        return [self.transcripts[i] for i in self.index.matching_indices(chrom, start, end)]

    def _run_mes(self, chrom, start, end, ref, obs) -> list[bytes]:
        out = []
        for t in self._matching_transcripts(chrom, start, end):
            minus = t.strand != "+"
            coding = t.coding_regions().lines
            n = len(coding)
            for i, cr in enumerate(coding):
                overlaps_three = overlaps_five = False
                slice3 = slice5 = 0
                if not minus:
                    if i != 0:
                        slice3 = cr.start - 20
                        overlaps_three = start <= cr.start + 2 and slice3 <= end
                    if i != n - 1:
                        slice5 = cr.end - 2
                        overlaps_five = start <= cr.end + 6 and slice5 <= end
                else:
                    if i != n - 1:
                        slice3 = cr.end - 2
                        overlaps_three = start <= cr.end + 20 and slice3 <= end
                    if i != 0:
                        slice5 = cr.start - 6
                        overlaps_five = start <= cr.start + 2 and slice5 <= end
                if overlaps_three:
                    ref_seq, alt_seq = self._get_seqs(chrom, start, ref, obs, slice3, 23, minus)
                    if ref_seq is not None:
                        out.append(self._fmt(self.scorer.score3(ref_seq)) + b"&"
                                   + self._fmt(self.scorer.score3(alt_seq)) + b"&" + t.name.encode())
                if overlaps_five:
                    ref_seq, alt_seq = self._get_seqs(chrom, start, ref, obs, slice5, 9, minus)
                    if ref_seq is not None:
                        out.append(self._fmt(self.scorer.score5(ref_seq)) + b"&"
                                   + self._fmt(self.scorer.score5(alt_seq)) + b"&" + t.name.encode())
        return out

    def _run_swa(self, chrom, start, end, ref, obs) -> list[bytes]:
        out = []
        for t in self._matching_transcripts(chrom, start, end):
            minus = t.strand != "+"
            ref_donor = alt_donor = comp_donor = b""
            ref_ctx, alt_ctx = self._get_seqs(chrom, start, ref, obs, start - 8, 17, minus)
            if ref_ctx is not None:
                max_ref = self.scorer.max_score(ref_ctx, 9, self.scorer.score5)
                max_alt = self.scorer.max_score(alt_ctx, 9, self.scorer.score5)
                if len(ref) == len(obs):
                    comp = self.scorer.score5(ref_ctx[max_alt[1]:max_alt[1] + 9])
                else:
                    comp = max_ref[0]
                ref_donor = self._fmt(max_ref[0])
                alt_donor = self._fmt(max_alt[0])
                comp_donor = self._fmt(comp)
            ref_acceptor = alt_acceptor = comp_acceptor = b""
            ref_ctx, alt_ctx = self._get_seqs(chrom, start, ref, obs, start - 22, 45, minus)
            if ref_ctx is not None:
                max_ref = self.scorer.max_score(ref_ctx, 23, self.scorer.score3)
                max_alt = self.scorer.max_score(alt_ctx, 23, self.scorer.score3)
                if len(ref) == len(obs):
                    comp = self.scorer.score3(ref_ctx[max_alt[1]:max_alt[1] + 23])
                else:
                    comp = max_ref[0]
                ref_acceptor = self._fmt(max_ref[0])
                alt_acceptor = self._fmt(max_alt[0])
                comp_acceptor = self._fmt(comp)
            out.append(b"&".join([ref_donor, alt_donor, comp_donor,
                                  ref_acceptor, alt_acceptor, comp_acceptor, t.name.encode()]))
        return out

    def _annotate_line(self, line: bytes) -> bytes:
        parts = line.split(b"\t")
        if len(parts) < 8:
            raise ToolError("VCF with too few columns: " + line.decode())
        chrom = Chromosome(parts[0])
        ref = parts[3].upper()
        obs = parts[4].upper()
        start = int(parts[1])
        end = start + len(ref) - 1
        parts[3] = ref
        parts[4] = obs

        valid = (chrom.is_valid() and all(c in _ACGT for c in ref)
                 and all(c in _ACGT for c in obs) and len(ref) > 0 and len(obs) > 0)
        if not valid:
            return b"\t".join(parts) + b"\n"

        info = parts[7]
        if len(ref) == 1 and len(obs) == 1:
            mes = self._run_mes(chrom, start, end, ref, obs)
            if mes:
                anno = self.tag + b"=" + b"|".join(mes)
                info = anno if info == b"." else info + b";" + anno
        if self.swa:
            swa = self._run_swa(chrom, start, end, ref, obs)
            if swa:
                anno = self.tag_swa + b"=" + b"|".join(swa)
                info = anno if info == b"." else info + b";" + anno
        parts[7] = info
        return b"\t".join(parts) + b"\n"


TOOLS = {
    "VcfAnnotateMaxEntScan": VcfAnnotateMaxEntScanTool,
}
