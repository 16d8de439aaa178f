"""VcfToBedpe — convert SV VCF (Manta/Delly/Sniffles/cuteSV/dipdiff) to BEDPE.

Behavioral reference: ngs-bits src/VcfToBedpe/VcfToBedpe.cpp + main.cpp.
Replicated quirks: the CIEND check tests the parsed VALUES, not the parse
success (VcfToBedpe.cpp:178-180); mate pairs are emitted in QMap (sorted-key)
order; 'SVTYPE contains MantaBND' routes to the single-Manta-BND path.
"""

from __future__ import annotations

import gzip
import math
import sys

from ngsbits_tpu.utils.stdio import stdout_binary
import time

from ..core.chromosome import Chromosome
from ..io.bedpe import BedpeFile
from .toolbase import ToolBase, ToolError


def _parse_info(field: bytes) -> dict[bytes, bytes]:
    out = {}
    for part in field.split(b";"):
        data = part.split(b"=")
        if len(data) != 2:
            continue
        out[data[0]] = data[1]
    return out


def _qt_int(raw: bytes) -> int:
    """QByteArray::toInt(): 0 on parse failure."""
    try:
        return int(raw)
    except ValueError:
        return 0


def _to_int(raw: bytes):
    try:
        return int(raw), True
    except ValueError:
        return 0, False


def _new_info_after_key(info_old: bytes, key_before: bytes, key: bytes,
                        data: bytes) -> bytes:
    parts = info_old.split(b";")
    if len(parts) <= 1:
        return info_old
    idx = -1
    for i, p in enumerate(parts):
        tmp = p.split(b"=")
        if len(tmp) != 2:
            continue
        if key_before in tmp[0]:
            idx = i
            break
    if idx == -1:
        return info_old
    parts.insert(idx + 1, key + b"=" + data)
    return b";".join(parts)


class _VcfLine:
    __slots__ = ("chr", "pos", "id", "ref", "alt", "qual", "filter", "info",
                 "format", "samples")

    def __init__(self, raw=None):
        if raw is None:
            self.chr = self.pos = self.id = self.ref = self.alt = b"."
            self.qual = self.filter = self.info = self.format = b"."
            self.samples = []
            return
        parts = raw.split(b"\t")
        if len(parts) < 9:
            raise ToolError("Could not parse vcf line containing less than 9 "
                            "columns (line:" + raw.strip().decode() + ")!")
        (self.chr, self.pos, self.id, self.ref, self.alt, self.qual,
         self.filter, self.info, self.format) = parts[:9]
        self.samples = parts[9:]


_BND_ALT_PREFIXES = tuple(
    p.encode() for p in ("]", "[", "N[", "N]", "A[", "A]", "C[", "C]",
                         "G[", "G]", "T[", "T]"))


class _OutLine:
    def __init__(self):
        self.CHROM_A = b"."
        self.START_A = -1
        self.END_A = -1
        self.CHROM_B = b"."
        self.START_B = -1
        self.END_B = -1
        self.ID = b"."
        self.QUAL = b"."
        self.STRAND_A = b"."
        self.STRAND_B = b"."
        self.TYPE = b"."
        self.FILTER = b"."
        self.NAME_A = b"."
        self.REF_A = b"."
        self.ALT_A = b"."
        self.NAME_B = b"."
        self.REF_B = b"."
        self.ALT_B = b"."
        self.INFO_A = b"."
        self.INFO_B = b"."
        self.FORMAT_DESC = b"."
        self.samples = []

    def to_text(self) -> bytes:
        def pos(v):
            return b"." if v < 0 else str(v).encode()

        out = [self.CHROM_A, pos(self.START_A), pos(self.END_A),
               self.CHROM_B, pos(self.START_B), pos(self.END_B),
               self.ID, self.QUAL, self.STRAND_A, self.STRAND_B, self.TYPE,
               self.FILTER, self.NAME_A, self.REF_A, self.ALT_A,
               self.NAME_B, self.REF_B, self.ALT_B, self.INFO_A, self.INFO_B,
               self.FORMAT_DESC] + list(self.samples)
        return b"\t".join(out)

    def add_coordinates_a(self, line_in: _VcfLine):
        self.CHROM_A = line_in.chr
        info = _parse_info(line_in.info)
        self.START_A = _qt_int(line_in.pos)
        self.END_A = _qt_int(line_in.pos)
        if info.get(b"CIPOS", b""):
            vals = info[b"CIPOS"].split(b",")
            conf_start, ok_start = _to_int(vals[0])
            conf_end, ok_end = _to_int(vals[1])
            if ok_start and ok_end:
                self.START_A += conf_start
                self.END_A += conf_end
        elif info.get(b"STDEV_POS", b""):
            if not info.get(b"SUPPORT", b""):
                raise ToolError("INFO field 'SUPPORT' required to calculate "
                                "the confidence interval!")
            n = _qt_int(info[b"SUPPORT"])
            stdev = float(info[b"STDEV_POS"])
            offset = math.ceil(1.96 * (stdev / math.sqrt(n)))
            self.START_A = max(0, self.START_A - offset)
            self.END_A += offset

    def add_coordinates_b(self, line_in: _VcfLine):
        info = _parse_info(line_in.info)
        self.CHROM_B = info.get(b"CHR2", b"")
        if info.get(b"END", b".") != b".":
            self.START_B = _qt_int(info[b"END"])
            self.END_B = self.START_B
        else:
            if (info.get(b"SVTYPE", b"") == b"BND"
                    and line_in.alt.startswith(_BND_ALT_PREFIXES)):
                str_length = len(line_in.alt) - 3
                if line_in.alt.startswith(b"N"):
                    pos_b = line_in.alt[2:2 + str_length].split(b":")
                else:
                    pos_b = line_in.alt[1:1 + str_length].split(b":")
                self.START_B = _qt_int(pos_b[1])
                self.END_B = self.START_B
                if not self.CHROM_B:
                    self.CHROM_B = Chromosome(pos_b[0]).str_normalized(True).encode()
            else:
                raise ToolError('Neither entry "END" found in INFO field '
                                "(neccessary for simple breakpoints), nor proper "
                                'genomic coordinate in "ALT" column (neccessary '
                                "for normal breakpoints)!")
        if info.get(b"CIEND", b""):
            vals = info[b"CIEND"].split(b",")
            conf_start, _ok1 = _to_int(vals[0])
            conf_end, _ok2 = _to_int(vals[1])
            # reference checks the VALUES here, not the parse flags
            if conf_start and conf_end:
                self.START_B += conf_start
                self.END_B += conf_end
        elif info.get(b"STDEV_LEN", b""):
            if not info.get(b"SUPPORT", b""):
                raise ToolError("INFO field 'SUPPORT' required to calculate "
                                "the confidence interval!")
            n = _qt_int(info[b"SUPPORT"])
            stdev = float(info[b"STDEV_LEN"])
            offset = math.ceil(1.96 * (stdev / math.sqrt(n)))
            self.START_B = max(0, self.START_B - offset)
            self.END_B += offset


class _Converter:
    def __init__(self, filename: str):
        if str(filename).endswith(".gz"):
            data = gzip.decompress(open(filename, "rb").read())
        else:
            data = open(filename, "rb").read()
        self.lines = data.split(b"\n")
        self.out_headers: list[bytes] = []
        self.samples: list[bytes] = []
        self.body_start = 0
        for i, raw in enumerate(self.lines):
            line = raw.rstrip(b"\r")
            if line.startswith(b"#"):
                if line.startswith(b"##"):
                    if line.startswith(b"##fileformat="):
                        line = b"##fileformat=BEDPE"
                    elif line.startswith(b"##fileDate"):
                        line = b"##fileDate=" + time.strftime("%Y%m%d").encode()
                    self.out_headers.append(line)
                    continue
                parts = line.split(b"\t")
                if len(parts) < 10:
                    raise ToolError("VCF with too few columns in header line")
                self.samples = parts[9:]
                self.body_start = i + 1
                break
        # insert POS info header after the line containing SVTYPE
        for i, h in enumerate(self.out_headers):
            if b"SVTYPE" in h:
                self.out_headers.insert(
                    i + 1,
                    b'##INFO=<ID=POS,Number=1,Type=Integer,Description='
                    b'"Position of the variant described in the original VCF file.">')
                break

    def convert_single(self, line_in: _VcfLine, single_manta_bnd=False) -> _OutLine:
        info = _parse_info(line_in.info)
        res = _OutLine()
        res.add_coordinates_a(line_in)
        if not single_manta_bnd:
            res.add_coordinates_b(line_in)
        if not res.CHROM_B and not single_manta_bnd:
            res.CHROM_B = res.CHROM_A
        res.ID = line_in.id
        res.FILTER = line_in.filter
        res.TYPE = info.get(b"SVTYPE", b"")
        res.QUAL = line_in.qual
        strands = info.get(b"STRANDS", b"")
        if len(strands) == 2:
            res.STRAND_A = strands[0:1]
            res.STRAND_B = strands[1:2]
        res.NAME_A = line_in.id
        res.REF_A = line_in.ref
        res.ALT_A = line_in.alt
        res.INFO_A = _new_info_after_key(line_in.info, b"SVTYPE", b"POS", line_in.pos)
        if single_manta_bnd:
            res.NAME_B = res.REF_B = res.ALT_B = res.INFO_B = b"MISSING"
        res.FORMAT_DESC = line_in.format
        if len(line_in.samples) != len(self.samples):
            raise ToolError("Number of sample annotation differs in line "
                            + res.ID.decode() + " and bedpe header!")
        res.samples = list(line_in.samples)
        return res

    def convert_complex(self, line_a: _VcfLine, line_b: _VcfLine,
                        mate_missing=False) -> _OutLine:
        out = _OutLine()
        out.add_coordinates_a(line_a)
        out.ALT_A = line_a.alt
        out.NAME_A = line_a.id
        out.INFO_A = line_a.info
        out.REF_A = line_a.ref
        out.ID = line_a.id

        if line_b.pos != b".":
            out.START_B = _qt_int(line_b.pos)
            out.END_B = out.START_B
            info_b = _parse_info(line_b.info)
            if b"CIPOS" in info_b:
                vals = info_b[b"CIPOS"].split(b",")
                conf_start, ok_start = _to_int(vals[0])
                conf_end, ok_end = _to_int(vals[1])
                if ok_start and ok_end:
                    out.START_B += conf_start
                    out.END_B += conf_end

        if not mate_missing:
            out.CHROM_B = line_b.chr
            out.NAME_B = line_b.id
            out.REF_B = line_b.ref
            out.ALT_B = line_b.alt
            out.INFO_B = line_b.info
        else:
            out.NAME_B = out.REF_B = out.ALT_B = out.INFO_B = b"NOT_FOUND"

        out.QUAL = line_a.qual if (line_a.qual == line_b.qual or mate_missing) else b"AMBIGUOUS"
        out.FILTER = line_a.filter if (line_a.filter == line_b.filter or mate_missing) else b"AMBIGUOUS"
        out.FORMAT_DESC = line_a.format if (line_a.format == line_b.format or mate_missing) else b"AMBIGUOUS"
        if line_a.samples == line_b.samples or mate_missing:
            out.samples = list(line_a.samples)
        else:
            for s1, s2 in zip(line_a.samples, line_b.samples):
                parts1 = s1.split(b":")
                parts2 = s2.split(b":")
                for j in range(len(parts1)):
                    if j < len(parts2) and parts1[j] != parts2[j]:
                        parts1[j] = b"AMBIGUOUS"
                out.samples.append(b":".join(parts1))
        out.TYPE = b"BND"
        return out

    def convert(self, out_file: str):
        out_lines = list(self.out_headers)
        heading = (b"#CHROM_A\tSTART_A\tEND_A\tCHROM_B\tSTART_B\tEND_B\tID\tQUAL"
                   b"\tSTRAND_A\tSTRAND_B\tTYPE\tFILTER\tNAME_A\tREF_A\tALT_A"
                   b"\tNAME_B\tREF_B\tALT_B\tINFO_A\tINFO_B\tFORMAT")
        for s in self.samples:
            heading += b"\t" + s
        out_lines.append(heading)

        complex_lines: dict[bytes, _VcfLine] = {}
        for raw in self.lines[self.body_start:]:
            raw_line = raw.strip()
            if not raw_line or raw_line.startswith(b"#"):
                continue
            line_in = _VcfLine(raw_line)
            line_info = _parse_info(line_in.info)
            if b"MATEID" not in line_info or line_info.get(b"SVTYPE", b"") != b"BND":
                if b"MantaBND" in line_info.get(b"SVTYPE", b""):
                    out_lines.append(self.convert_single(line_in, True).to_text())
                else:
                    out_lines.append(self.convert_single(line_in).to_text())
            else:
                complex_lines[line_in.id] = line_in

        parsed_ids = set()
        for key in sorted(complex_lines):  # QMap iterates keys sorted
            line_a = complex_lines[key]
            info_a = _parse_info(line_a.info)
            mate_id = info_a.get(b"MATEID", b"")
            if not mate_id:
                raise ToolError("Could not find mate ID in line info of "
                                "breakpoint ID " + key.decode())
            if key in parsed_ids or mate_id in parsed_ids:
                continue
            if mate_id not in complex_lines:
                out_lines.append(self.convert_complex(line_a, _VcfLine(), True).to_text())
            else:
                out_lines.append(self.convert_complex(
                    line_a, complex_lines[mate_id], False).to_text())
            parsed_ids.add(key)
            parsed_ids.add(mate_id)

        data = b"".join(l + b"\n" for l in out_lines)
        if out_file:
            with open(out_file, "wb") as fh:
                fh.write(data)
        else:
            stdout_binary().write(data)


class VcfToBedpeTool(ToolBase):
    name = "VcfToBedpe"
    description = "Converts a VCF file containing structural variants to BEDPE format."
    extended_description = ["Input can be MANTA oder DELLY VCF files."]

    def setup(self):
        self.add_infile("in", "Input structural variant list in VCF or VCF.GZ format.")
        self.add_outfile("out", "Output structural variant list in BEDPE format.")
        self.add_flag("no_sort", "Do not sort results")

    def main(self):
        conv = _Converter(self.get("in"))
        out = self.get("out")
        conv.convert(out)
        if not self.get_flag("no_sort"):
            f = BedpeFile.from_file(out)
            f.sort()
            f.store(out)


TOOLS = {"VcfToBedpe": VcfToBedpeTool}
