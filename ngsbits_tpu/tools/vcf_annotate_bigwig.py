"""VcfAnnotateFromBigWig.

Behavioral reference: ngs-bits src/VcfAnnotateFromBigWig/{main.cpp,
ChunkProcessor.cpp} — per-variant BigWig lookup with max/min/avg/none modes;
insertions are not annotated; SNV-with-same-first-base uses [start+1, end].
"""

from __future__ import annotations

import gzip
import os
import sys

from ngsbits_tpu.utils.stdio import stdin_binary, stdout_binary

from ..core.chromosome import Chromosome
from ..io.bigwig import BigWigReader
from .toolbase import ToolBase, ToolError


def _qt_float(v: float) -> str:
    return f"{v:.6g}"


class VcfAnnotateFromBigWigTool(ToolBase):
    name = "VcfAnnotateFromBigWig"
    description = "Annotates the INFO column of a VCF with data from a bigWig file."

    def setup(self):
        self.add_infile("in", "Input VCF file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output VCF or VCF or VCF.GZ file. If unset, writes to STDOUT.", optional=True)
        self.add_infile("bw", "BigWig file containen the data to be used in the annotation.")
        self.add_string("name", "Name of the new INFO column.")
        self.add_enum("mode", "Annotate mode: How the annotation is chosen when multiple bases are affected.",
                      valid=("max", "min", "avg", "none"))
        self.add_int("threads", "The number of threads used to read, process and write files.", optional=True, default=1)
        self.add_int("block_size", "Number of lines processed in one chunk.", optional=True, default=5000)
        self.add_int("prefetch", "Maximum number of blocks that may be pre-fetched into memory.", optional=True, default=64)
        self.add_int("debug", "Enables debug output at the given interval in milliseconds (disabled by default, cannot be combined with writing to STDOUT).", optional=True, default=-1)

    def _interpret(self, intervals, start, end, mode):
        if not intervals:
            return None
        if len(intervals) == 1:
            return intervals[0][2]
        if mode == "max":
            return max(i[2] for i in intervals)
        if mode == "min":
            return min(i[2] for i in intervals)
        if mode == "avg":
            values = []
            for ivs, ive, val in intervals:
                if ive - ivs == 1:
                    values.append(val)
                    continue
                for i in range(ivs, ive):
                    if start <= i < end:
                        values.append(val)
                    if i >= end:
                        break
            return sum(values) / len(values) if values else None
        if mode == "none":
            return None
        raise ToolError(f"Unknown Modus.{mode}")

    def main(self):
        bw_path = self.get_infile("bw")
        name = self.get_string("name")
        mode = self.get_enum("mode")
        reader = BigWigReader(bw_path)

        in_path = self.get_infile("in")
        if in_path:
            with open(in_path, "rb") as fh:
                data = fh.read()
            if data[:2] == b"\x1f\x8b":
                data = gzip.decompress(data)
        else:
            data = stdin_binary().read()

        out_lines = []
        body = []
        for raw in data.split(b"\n"):
            line = raw.rstrip(b"\r")
            if not line.strip():
                continue
            if line.startswith(b"#"):
                if line.startswith(b"#CHROM"):
                    out_lines.append(
                        b"##INFO=<ID=" + name.encode() + b',Number=1,Type=Float,Description="Annotation from '
                        + os.path.basename(bw_path).encode() + b" (mode " + mode.encode() + b')">')
                out_lines.append(line)
                continue
            body.append(line)

        def annotate_line(line):
            parts = line.split(b"\t")
            if len(parts) < 8:
                raise ToolError(f"VCF line with too few columns: {line.decode()}")
            chr_ = Chromosome(parts[0]).str_normalized(True)
            start = int(parts[1])
            ref = parts[3]
            alt = parts[4].split(b",")[0]
            end = start + len(ref)
            value = None
            if reader.contains_chromosome(chr_) and len(alt) <= len(ref):
                offset = -1
                if ref[:1] == alt[:1]:
                    intervals = reader.get_overlapping_intervals(chr_, start + 1, end, offset)
                else:
                    intervals = reader.get_overlapping_intervals(chr_, start, end, offset)
                value = self._interpret(intervals, start + offset, end + offset, mode)
            if value is None:
                return line
            info = parts[7]
            if info == b".":
                info = b""
            if info:
                info += b";"
            info += name.encode() + b"=" + _qt_float(value).encode()
            parts[7] = info
            return b"\t".join(parts)

        # chunk-parallel (ChunkProcessor pattern), ordered output
        from ..utils.chunkpool import process_chunks
        out_lines.extend(process_chunks(
            body, lambda chunk, _st: [annotate_line(l) for l in chunk], None,
            self.get_int("threads"), self.get_int("block_size")))
        data_out = b"".join(l + b"\n" for l in out_lines)
        out_path = self.get_outfile("out")
        if not out_path:
            stdout_binary().write(data_out)
        elif out_path.endswith(".gz"):
            from ..io.bgzf import bgzf_compress
            with open(out_path, "wb") as fh:
                fh.write(bgzf_compress(data_out))
        else:
            with open(out_path, "wb") as fh:
                fh.write(data_out)
        reader.close()


TOOLS = {
    "VcfAnnotateFromBigWig": VcfAnnotateFromBigWigTool,
}
