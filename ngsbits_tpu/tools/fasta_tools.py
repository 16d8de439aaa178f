"""FASTA utility tools.

Behavioral reference: ngs-bits src/FastaInfo/main.cpp, src/FastaMask/main.cpp.
"""

from __future__ import annotations

import sys

from ngsbits_tpu.utils.stdio import stdin_binary

import numpy as np

from ..core.chromosome import Chromosome
from ..core.intervals import BedFile, BedLine, ChromosomalIndex
from .toolbase import ToolBase, ToolError


def _read_lines(path):
    if path in ("", "-", None):
        data = stdin_binary().read()
    else:
        with open(path, "rb") as fh:
            data = fh.read()
    return data.split(b"\n")


class FastaInfoTool(ToolBase):
    name = "FastaInfo"
    description = "Basic info on a FASTA file containing DNA sequences."

    def setup(self):
        self.add_infile("in", "Input FASTA file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output file. If unset, writes to STDOUT.", optional=True)
        self.add_outfile("write_n", "Write BED file with N base coordinates", optional=True)
        self.add_outfile("write_other", "Write BED file with other base coordinates", optional=True)

    def main(self):
        write_n = self.get("write_n")
        write_other = self.get("write_other")
        counts: dict[bytes, list] = {}
        order: list[bytes] = []
        bed_n = BedFile()
        bed_other = BedFile()
        current = b""
        pos = 0
        for raw in _read_lines(self.get("in")):
            line = raw.strip()
            if not line:
                continue
            if line.startswith(b">"):
                current = line[1:]
                sp = current.find(b" ")
                if sp != -1:
                    current = current[:sp]
                order.append(current)
                counts[current] = [0, 0, 0]  # acgt, n, other
                pos = 0
                continue
            c = counts[current]
            arr = np.frombuffer(line.upper(), dtype=np.uint8)
            is_acgt = np.isin(arr, np.frombuffer(b"ACGT", dtype=np.uint8))
            is_n = arr == ord("N")
            c[0] += int(is_acgt.sum())
            c[1] += int(is_n.sum())
            c[2] += int((~is_acgt & ~is_n).sum())
            if write_n:
                for p in np.flatnonzero(is_n):
                    bp = pos + int(p) + 1
                    if (len(bed_n) and bed_n.lines[-1].chr.str == current.decode()
                            and bed_n.lines[-1].end == bp - 1):
                        bed_n.lines[-1].end = bp
                    else:
                        bed_n.append(BedLine(Chromosome(current), bp, bp))
            if write_other:
                for p in np.flatnonzero(~is_acgt & ~is_n):
                    bp = pos + int(p) + 1
                    if (len(bed_other) and bed_other.lines[-1].chr.str == current.decode()
                            and bed_other.lines[-1].end == bp - 1):
                        bed_other.lines[-1].end = bp
                    else:
                        bed_other.append(BedLine(Chromosome(current), bp, bp))
            pos += len(line)

        lines = ["== general info ==",
                 f"sequences : {len(counts)}",
                 f"characters: {sum(sum(c) for c in counts.values())}",
                 "",
                 "== characters per sequence =="]
        for seq in order:
            c = counts[seq]
            lines.append(f"{seq.decode()}: {sum(c)} (ACGT:{c[0]} N:{c[1]} other:{c[2]})")
        text = "".join(l + "\n" for l in lines)
        out = self.get("out")
        if out:
            with open(out, "w") as fh:
                fh.write(text)
        else:
            sys.stdout.write(text)
        if write_n:
            bed_n.merge()
            bed_n.store(write_n)
        if write_other:
            bed_other.merge()
            bed_other.store(write_other)


class FastaMaskTool(ToolBase):
    name = "FastaMask"
    description = "Mask regions in a FASTA file with N bases."

    def setup(self):
        self.add_infile("in", "Input FASTA file.")
        self.add_infile("reg", "Input BED file with regions to mask.")
        self.add_outfile("out", "Output file.")

    def main(self):
        if self.get("in") == self.get("out"):
            raise ToolError("'in' and 'out' cannot be the same file!")
        reg = BedFile.from_file(self.get("reg"))
        reg.merge()
        idx = ChromosomalIndex(reg)
        out_parts = []
        current = None
        pos = 1
        for raw in _read_lines(self.get("in")):
            line = raw.rstrip(b"\r")
            if not line:
                continue
            if line.startswith(b">"):
                chr_ = line[1:].strip()
                sp = chr_.find(b" ")
                if sp != -1:
                    chr_ = chr_[:sp]
                current = Chromosome(chr_)
                pos = 1
                out_parts.append(line)
                continue
            matches = idx.matching_indices(current, pos, pos + len(line) - 1)
            if len(matches):
                arr = bytearray(line)
                for mi in matches:
                    r = reg.lines[int(mi)]
                    s = max(r.start, pos) - pos
                    e = min(r.end, pos + len(line) - 1) - pos
                    for k in range(s, e + 1):
                        arr[k] = ord("N")
                line = bytes(arr)
            pos += len(line)
            out_parts.append(line)
        with open(self.get("out"), "wb") as fh:
            fh.write(b"\n".join(out_parts) + b"\n")


class FastaFromBamTool(ToolBase):
    """Behavioral reference: ngs-bits src/FastaFromBam/main.cpp."""

    name = "FastaFromBam"
    description = "Download the reference genome FASTA file for a BAM/CRAM file."

    def setup(self):
        self.add_infile("in", "Input BAM/CRAM file.")
        self.add_outfile("out", "Output reference genome FASTA file.")
        self.add_infile("ref", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)

    def main(self):
        from ..io.bam import BamReader

        reader = BamReader(self.get("in"))
        try:
            header_lines = reader.header_text.encode().split(b"\n")
        finally:
            reader.close()
        with open(self.get("out"), "wb") as out:
            for raw in header_lines:
                line = raw.strip()
                if not line.startswith(b"@SQ"):
                    continue
                sys.stdout.write(line.decode() + "\n")
                name = md5 = ""
                for part in line.split(b"\t"):
                    part = part.strip()
                    if part.startswith(b"SN:"):
                        name = part[3:].decode()
                    if part.startswith(b"M5:"):
                        md5 = part[3:].decode()
                if not name:
                    raise ToolError("Invalid @SQ line without name found: " + line.decode())
                if not md5:
                    sys.stdout.write(f"Skipped chromosome '{name}': @SQ line contains no M5 entry\n")
                    continue
                url = "https://www.ebi.ac.uk/ena/cram/md5/" + md5
                try:
                    import urllib.request

                    with urllib.request.urlopen(url, timeout=30) as resp:
                        body = resp.read()
                    out.write(b">" + name.encode() + b"\n")
                    out.write(body)
                    out.write(b"\n")
                    out.flush()
                except Exception:
                    sys.stdout.write(f"Skipped chromosome '{name}': could not download {url}\n")


class FastaChecksumUpdateTool(ToolBase):
    name = "FastaChecksumUpdate"
    description = "Fixes MD5 checksums in FASTA sequence headers."

    def setup(self):
        self.add_infile("in", "Input FASTA file.")
        self.add_outfile("out", "Output file.")
        self.add_flag("debug", "Write debug statements")

    def main(self):
        # FastaChecksumUpdate/main.cpp:27-108: stream through, write corrected
        # checksum back at the remembered M5: offset when it mismatches.
        import hashlib
        if self.get_infile("in") == self.get_outfile("out"):
            raise ToolError("'in' and 'out' cannot be the same file!")
        debug = self.get_flag("debug")
        md5 = None
        md5_pos = -1
        stored = b""
        with open(self.get_infile("in"), "rb") as fin, \
                open(self.get_outfile("out"), "wb+") as fout:
            def flush_previous():
                nonlocal md5_pos
                if md5_pos == -1:
                    return
                checksum = md5.hexdigest().encode()
                if debug:
                    sys.stdout.write(f"original checksum: {stored.decode()}\n")
                    sys.stdout.write(f"calculated checksum: {checksum.decode()}\n")
                if checksum != stored:
                    if debug:
                        sys.stdout.write("checksum mismatch! Rewriting.\n")
                    fout.seek(md5_pos)
                    fout.write(checksum)
                    fout.seek(0, 2)
                md5_pos = -1

            for raw in fin:
                line = raw.strip()
                if not line:
                    continue
                if line.startswith(b">"):
                    flush_previous()
                    md5 = hashlib.md5()
                    header = line[1:].strip()
                    # writeHeader: word-wise copy, remembering the M5: offset
                    fout.write(b">")
                    words = header.split(b" ")
                    for i, w in enumerate(words):
                        if len(w) > 3 and w[:3] == b"M5:":
                            md5_pos = fout.tell() + 3
                            stored = w[3:]
                        fout.write(w)
                        fout.write(b"\n" if i == len(words) - 1 else b" ")
                else:
                    md5.update(line)
                    fout.write(line)
                    fout.write(b"\n")
            flush_previous()


TOOLS = {
    "FastaInfo": FastaInfoTool,
    "FastaMask": FastaMaskTool,
    "FastaFromBam": FastaFromBamTool,
    "FastaChecksumUpdate": FastaChecksumUpdateTool,
}
