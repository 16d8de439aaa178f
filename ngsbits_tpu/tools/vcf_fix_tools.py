"""Streaming VCF utility/fix tools.

Behavioral reference: ngs-bits src/VcfSplit, src/VcfReplaceSamples,
src/SnifflesVcfFix, src/MantaVcfFix main.cpp files.
"""

from __future__ import annotations

import gzip
import sys

from ngsbits_tpu.utils.stdio import stdin_binary, stdout_binary

from .toolbase import ToolBase, ToolError

# VCF fixed-column indices (VcfFile.h enum)
CHROM, POS, ID, REF, ALT, QUAL, FILTER, INFO, FORMAT = range(9)


def _read_lines(path):
    if path in ("", "-", None):
        data = stdin_binary().read()
    elif str(path).endswith(".gz"):
        data = gzip.decompress(open(path, "rb").read())
    else:
        data = open(path, "rb").read()
    return data.split(b"\n")


def _open_out(path):
    if path in ("", "-", None):
        return stdout_binary()
    return open(path, "wb")


class VcfSplitTool(ToolBase):
    name = "VcfSplit"
    description = "Splits a VCF into several chunks"

    def setup(self):
        self.add_int("lines", "Number of variant lines per chunk.")
        self.add_string("out", "Output VCF base name. Suffixed with chunk number and extension, e.g. '0001.vcf'")
        self.add_infile("in", "Input VCF file. If unset, reads from STDIN.", optional=True)

    def _store(self, header_lines, variant_lines, out, chunk_index):
        filename = f"{out}{chunk_index:04d}.vcf"
        with open(filename, "wb") as fh:
            for line in header_lines:
                fh.write(line)
            for line in variant_lines:
                fh.write(line)

    def main(self):
        out = self.get("out")
        lines = self.get_int("lines")
        path = self.get("in")
        if path in ("", "-", None):
            data = stdin_binary().read()
        elif str(path).endswith(".gz"):
            data = gzip.decompress(open(path, "rb").read())
        else:
            data = open(path, "rb").read()
        header = True
        header_lines = []
        variant_lines = []
        chunk_index = 1
        # keep original line endings: the reference streams lines as-read,
        # so a missing final newline in the input is preserved in the chunk
        for line in data.splitlines(keepends=True):
            raw = line.rstrip(b"\r\n")
            if not raw.strip():
                continue
            if header and raw.startswith(b"#"):
                header_lines.append(line)
                continue
            header = False
            variant_lines.append(line)
            if len(variant_lines) >= lines:
                self._store(header_lines, variant_lines, out, chunk_index)
                variant_lines = []
                chunk_index += 1
        self._store(header_lines, variant_lines, out, chunk_index)


class VcfReplaceSamplesTool(ToolBase):
    name = "VcfReplaceSamples"
    description = "Replaces sample identifiers in the VCF header."
    extended_description = ["Note: the sample ID matching is performed case-sensitive."]

    MARKERS = (b"##SAMPLE=", b"#CHROM\t", b"##DRAGENCommandLine=",
               b"##GATKCommandLine=", b"##cmdline=", b"##commandline=")

    def setup(self):
        self.add_string("ids", "Comma-separated list of sample ID pairs in the format 'old1=new1,old2=new2,...'.")
        self.add_infile("in", "Input variant list in VCF or VCF.GZ format. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output variant list in VCF format. If unset, writes to STDOUT.", optional=True)
        self.add_int("compression_level", "Output VCF compression level from 1 (fastest) to 9 (best compression). If unset, an unzipped VCF is written.", optional=True, default=0)

    def main(self):
        in_ = self.get("in")
        out = self.get("out")
        if in_ and in_ == out:
            raise ToolError("Parameters 'in' and 'out' cannot be the same file!")
        ids = []
        for entry in self.get("ids").split(","):
            pos = entry.find("=")
            if pos == -1:
                raise ToolError(f"Parameter 'ids' contains entry without '=': {entry}")
            ids.append((entry[:pos].strip().encode(), entry[pos + 1:].strip().encode()))

        raw_lines = _read_lines(in_)
        out_lines = []
        for i, line in enumerate(raw_lines):
            if i == len(raw_lines) - 1 and line == b"":
                break
            for marker in self.MARKERS:
                if line.startswith(marker):
                    for old, new in ids:
                        line = line.replace(old, new)
                    break
            out_lines.append(line + b"\n")
        data = b"".join(out_lines)
        level = self.get_int("compression_level")
        to_file = out not in ("", "-", None)
        # same semantics as vcf_store: compress when a level is given or the
        # name says .gz; stdout always gets plain text
        if to_file and (level > 0 or str(out).endswith(".gz")):
            from ..io.bgzf import bgzf_compress
            data = bgzf_compress(data, level=max(level, 1))
        out_fh = _open_out(out)
        out_fh.write(data)
        if out_fh is not stdout_binary():
            out_fh.close()


class SnifflesVcfFixTool(ToolBase):
    name = "SnifflesVcfFix"
    description = "Fixes VCF file from Sniffles SV Caller."
    extended_description = ["Converts lowEvidence variants into het variants."]

    def setup(self):
        self.add_infile("in", "Input VCF file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output VCF list. If unset, writes to STDOUT.", optional=True)

    def main(self):
        in_ = self.get("in")
        out = self.get("out")
        if in_ and in_ == out:
            raise ToolError("Input and output files must be different when streaming!")
        out_fh = _open_out(out)
        column_count = 0
        for raw in _read_lines(in_):
            if not raw.strip():
                continue
            parts = [p.strip() for p in raw.split(b"\t")]
            if raw.startswith(b"#"):
                if not raw.startswith(b"##"):
                    column_count = len(parts)
                    out_fh.write(b'##FILTER=<ID=LOW_EVIDENCE,Description="Low evidence variants.">\n')
                out_fh.write(raw + b"\n")
                continue
            if column_count > 10:
                raise ToolError("Multi sample VCF not supported!")

            format_headers = parts[FORMAT].split(b":")
            format_values = parts[FORMAT + 1].split(b":")
            if b"GT" in format_headers:
                gi = format_headers.index(b"GT")
                if format_values[gi] == b"0/0":
                    format_values[gi] = b"0/1"
                    parts[FORMAT + 1] = b":".join(format_values)
                    if parts[FILTER] == b"PASS":
                        parts[FILTER] = b"LOW_EVIDENCE"
                    else:
                        parts[FILTER] += b";LOW_EVIDENCE"

            if b"RNAMES=" in parts[INFO]:
                info_values = parts[INFO].split(b";")
                for i, iv in enumerate(info_values):
                    if iv.startswith(b"RNAMES="):
                        read_names = sorted(iv.split(b"=")[1].split(b","))
                        info_values[i] = b"RNAMES=" + b",".join(read_names)
                        break
                parts[INFO] = b";".join(info_values)

            out_fh.write(b"\t".join(parts) + b"\n")
        if out_fh is not stdout_binary():
            out_fh.close()


class MantaVcfFixTool(ToolBase):
    name = "MantaVcfFix"
    description = "Fixes issues in VCF of Manta SV calls."
    extended_description = [
        "Removes invalid VCF lines containing empty REF entries.",
        "Removes duplicate SV calls from Manta VCFs.",
    ]

    def setup(self):
        self.add_infile("in", "Input VCF file.")
        self.add_outfile("out", "Output VCF file.")
        self.add_flag("debug", "Print verbose output to STDERR.")

    def main(self):
        debug = self.get_flag("debug")
        out_fh = _open_out(self.get("out"))
        id_buffer_mapping: dict[bytes, int] = {}
        output_buffer: list[bytes] = []

        for raw in _read_lines(self.get("in")):
            if not raw.strip():
                continue
            if raw.startswith(b"#"):
                out_fh.write(raw + b"\n")
                continue
            parts = [p.strip() for p in raw.split(b"\t")]

            if not parts[REF]:
                if debug:
                    sys.stderr.write(f"Removed SV with empty REF column at "
                                     f"{parts[CHROM].decode()}_{parts[POS].decode()}\n")
                continue

            manta_id = parts[ID].split(b":")
            if manta_id[0].startswith(b"Manta"):
                manta_id[4] = b"X"
            else:  # DRAGEN VCF
                manta_id[5] = b"X"

            sv_length = b""
            if b"SVTYPE=INS" not in parts[INFO]:
                for info_kv in parts[INFO].split(b";"):
                    if info_kv.startswith(b"SVLEN="):
                        sv_length = info_kv.split(b"=")[1].strip()
                        break

            prefix = (parts[CHROM] + b"_" + parts[POS] + b"_" + b":".join(manta_id)
                      + (b"" if not sv_length else b"_SVLEN=" + sv_length))

            if prefix in id_buffer_mapping:
                buffer_pos = id_buffer_mapping[prefix]
                cached_parts = [p.strip() for p in output_buffer[buffer_pos].split(b"\t")]
                qual_current = int(parts[QUAL]) if parts[QUAL] != b"." else -1
                qual_cache = int(cached_parts[QUAL]) if cached_parts[QUAL] != b"." else -1
                if qual_current > qual_cache:
                    output_buffer[buffer_pos] = b"\t".join(parts) + b"\n"
                    if debug:
                        sys.stderr.write(f"Replaced duplicate variant at "
                                         f"{parts[CHROM].decode()}_{parts[POS].decode()}\n")
                elif debug:
                    sys.stderr.write(f"Skip duplicate variant at "
                                     f"{parts[CHROM].decode()}_{parts[POS].decode()}\n")
            else:
                if b"SVTYPE=BND" not in parts[INFO]:
                    id_buffer_mapping[prefix] = len(output_buffer)
                output_buffer.append(b"\t".join(parts) + b"\n")

        for line in output_buffer:
            out_fh.write(line)
        if out_fh is not stdout_binary():
            out_fh.close()


TOOLS = {
    "VcfSplit": VcfSplitTool,
    "VcfReplaceSamples": VcfReplaceSamplesTool,
    "SnifflesVcfFix": SnifflesVcfFixTool,
    "MantaVcfFix": MantaVcfFixTool,
}
