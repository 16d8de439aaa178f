"""FASTQ utility tools.

Behavioral reference: ngs-bits src/Fastq*/main.cpp (thin FastqFileStream
pipelines).
"""

from __future__ import annotations

import sys

import numpy as np

from ..io.fastq import FastqEntry, FastqEntryWriter, iter_entries
from .toolbase import ToolBase, ToolError


def _write_text(tool, lines, out_key="out"):
    text = "".join(l + "\n" for l in lines)
    out = tool.get(out_key)
    if out:
        with open(out, "w") as fh:
            fh.write(text)
    else:
        sys.stdout.write(text)


class FastqListTool(ToolBase):
    name = "FastqList"
    description = "List read IDs and base count."

    def setup(self):
        self.add_infile("in", "Input FASTQ file (gzipped or plain).")
        self.add_outfile("out", "Output TSV file. If unset, writes to STDOUT.", optional=True)

    def main(self):
        lines = ["#id\tbases"]
        for e in iter_entries(self.get("in")):
            lines.append(f"{e.read_id().decode()}\t{len(e.bases)}")
        _write_text(self, lines)


class FastqExtractTool(ToolBase):
    name = "FastqExtract"
    description = "Extracts reads from a FASTQ file according to an ID list. Trims the reads if lengths are given."

    def setup(self):
        self.add_infile("in", "Input FASTQ file (gzipped or plain).")
        self.add_infile("ids", "Input TSV file containing IDs (without the '@') in the first column and optional length in the second column.")
        self.add_outfile("out", "Output FASTQ file.")
        self.add_flag("v", "Invert match: keep non-matching reads.")
        self.add_int("compression_level", "Output FASTQ compression level from 1 (fastest) to 9 (best compression).", optional=True, default=1)
        self.add_flag("long_read", "Support long reads (> 1kb).")

    def main(self):
        invert = self.get_flag("v")
        ids: dict[bytes, int] = {}
        with open(self.get("ids"), "rb") as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith(b"#"):
                    continue
                parts = line.split(b"\t")
                ids[parts[0]] = int(parts[1]) if len(parts) > 1 else -1
        w = FastqEntryWriter(self.get("out"), self.get_int("compression_level"))
        for e in iter_entries(self.get("in"), validate=True, long_read=self.get_flag("long_read")):
            length = ids.get(e.read_id(), -2)
            if length == -2:
                if not invert:
                    continue
                w.write(e)
            elif length == -1:
                if invert:
                    continue
                w.write(e)
            else:
                if invert:
                    continue
                e.bases = e.bases[:length]
                e.quals = e.quals[:length]
                w.write(e)
        w.close()


class FastqConcatTool(ToolBase):
    name = "FastqConcat"
    description = "Concatinates several FASTQ files into one output FASTQ file."

    def setup(self):
        self.add_infile_list("in", "Input (gzipped) FASTQ files.")
        self.add_outfile("out", "Output gzipped FASTQ file.")
        self.add_int("compression_level", "Output FASTQ compression level from 1 (fastest) to 9 (best compression).", optional=True, default=1)
        self.add_flag("long_read", "Support long reads (> 1kb).")

    def main(self):
        w = FastqEntryWriter(self.get("out"), self.get_int("compression_level"))
        for f in self.get_infile_list("in"):
            for e in iter_entries(f, validate=False, long_read=self.get_flag("long_read")):
                w.write(e)
        w.close()


class FastqToFastaTool(ToolBase):
    name = "FastqToFasta"
    description = "Converts a FASTQ file to FASTA format."

    def setup(self):
        self.add_infile("in", "Input gzipped FASTQ file.")
        self.add_outfile("out", "Output FASTA file. If unset, writes to STDOUT.", optional=True)

    def main(self):
        lines = []
        for e in iter_entries(self.get("in"), validate=False):
            lines.append(">" + e.header[1:].decode())
            lines.append(e.bases.decode())
        _write_text(self, lines)


class FastqFormatTool(ToolBase):
    name = "FastqFormat"
    description = "Determines the FastQ quality encoding format."

    def setup(self):
        self.add_infile("in", "Input FASTQ file (gzipped or plain).")
        self.add_outfile("out", "Output text file. If unset, writes to STDOUT.", optional=True)
        self.add_int("reads", "The number of reads to parse.", optional=True, default=10000)

    def main(self):
        reads = self.get_int("reads")
        qmin, qmax = 127, 32
        n = 0
        for e in iter_entries(self.get("in"), validate=False):
            if n >= reads:
                break
            n += 1
            for c in e.quals:
                if c < 33 or c > 104:
                    raise ToolError(f"{n}. Read contains illegal quality value: {chr(c)} ({c})")
                qmin = min(qmin, c)
                qmax = max(qmax, c)
        lines = [f"Minimum ASCII character: {chr(qmin)} ({qmin})",
                 f"Maximum ASCII character: {chr(qmax)} ({qmax})"]
        if qmin >= 33 and qmax <= 75:
            lines.append("Format: Sanger/Illumina1.8")
        elif qmin >= 64 and qmax <= 104:
            lines.append("Format: Illumina1.5")
        else:
            lines.append("Format: Unknown")
        _write_text(self, lines)


class FastqTrimTool(ToolBase):
    name = "FastqTrim"
    description = "Trims start/end bases from all reads in a FASTQ file."

    def setup(self):
        self.add_infile("in", "Input gzipped FASTQ file.")
        self.add_outfile("out", "Output gzipped FASTQ file.")
        self.add_int("start", "Trim this number of bases from the start of the read.", optional=True, default=0)
        self.add_int("end", "Trim this number of bases from the end of the read.", optional=True, default=0)
        self.add_int("len", "Restrict read length to this value (after trimming from start/end).", optional=True, default=0)
        self.add_int("max_len", "Only trim reads smaller than the given length. Used e.g. to remove UMIs at the read end from read-throughs.", optional=True, default=0)
        self.add_int("compression_level", "Output FASTQ compression level from 1 (fastest) to 9 (best compression).", optional=True, default=1)
        self.add_flag("long_read", "Support long reads (> 1kb).")

    def main(self):
        start = self.get_int("start")
        end = self.get_int("end")
        maxlen = self.get_int("len")
        max_len_gate = self.get_int("max_len")
        w = FastqEntryWriter(self.get("out"), self.get_int("compression_level"))
        for e in iter_entries(self.get("in"), validate=False, long_read=self.get_flag("long_read")):
            if max_len_gate > 0 and len(e.bases) >= max_len_gate:
                w.write(e)
                continue
            if start > 0 or end > 0:
                n = len(e.bases)
                if n <= start + end:
                    continue
                e.bases = e.bases[start:n - end]
                e.quals = e.quals[start:n - end]
            if maxlen > 0 and len(e.bases) > maxlen:
                e.bases = e.bases[:maxlen]
                e.quals = e.quals[:maxlen]
            w.write(e)
        w.close()


class FastqConvertTool(ToolBase):
    name = "FastqConvert"
    description = "Converts the quality scores from Illumina 1.5 offset to Sanger/Illumina 1.8 offset."

    def setup(self):
        self.add_infile("in", "Input gzipped FASTQ file.")
        self.add_outfile("out", "Output gzipped FASTQ file.")
        self.add_int("compression_level", "Output FASTQ compression level from 1 (fastest) to 9 (best compression).", optional=True, default=1)

    def main(self):
        w = FastqEntryWriter(self.get("out"), self.get_int("compression_level"))
        for e in iter_entries(self.get("in"), validate=False):
            e.quals = bytes(c - 31 for c in e.quals)
            w.write(e)
        w.close()


class FastqDownsampleTool(ToolBase):
    name = "FastqDownsample"
    description = "Downsamples paired-end FASTQ files."

    def setup(self):
        self.add_infile("in1", "Forward input gzipped FASTQ file(s).")
        self.add_infile("in2", "Reverse input gzipped FASTQ file(s).")
        self.add_float("percentage", "Percentage of reads to keep.")
        self.add_outfile("out1", "Forward output gzipped FASTQ file.")
        self.add_outfile("out2", "Reverse output gzipped FASTQ file.")
        self.add_flag("test", "Test mode: fix random number generator seed and write kept read names to STDOUT.")
        self.add_int("compression_level", "Output FASTQ compression level from 1 (fastest) to 9 (best compression).", optional=True, default=1)

    def main(self):
        perc = self.get_float("percentage")
        test = self.get_flag("test")
        rng = np.random.default_rng(1 if test else None)
        level = self.get_int("compression_level")
        w1 = FastqEntryWriter(self.get("out1"), level)
        w2 = FastqEntryWriter(self.get("out2"), level)
        it2 = iter_entries(self.get("in2"), validate=False)
        for e1 in iter_entries(self.get("in1"), validate=False):
            e2 = next(it2, None)
            if e2 is None:
                raise ToolError("Differing number of reads in input files!")
            if rng.random() * 100.0 < perc:
                w1.write(e1)
                w2.write(e2)
                if test:
                    sys.stdout.write(e1.read_id().decode() + "\n")
        w1.close()
        w2.close()


class FastqExtractBarcodeTool(ToolBase):
    name = "FastqExtractBarcode"
    description = "Cuts bases from the beginning of reads and stores them in an additional fastq."

    def setup(self):
        self.add_infile("in", "input fastq file1.")
        self.add_string("out_main", "output filename for main fastq.")
        self.add_string("out_index", "output filename for index fastq.", optional=True, default="index.fastq.gz")
        self.add_int("cut", "number of bases from the beginning of reads to use as barcodes.", optional=True, default=0)
        self.add_int("compression_level", "Output FASTQ compression level from 1 (fastest) to 9 (best compression).", optional=True, default=1)

    def main(self):
        cut = self.get_int("cut")
        level = self.get_int("compression_level")
        wm = FastqEntryWriter(self.get("out_main"), level)
        wi = FastqEntryWriter(self.get("out_index"), level)
        for e in iter_entries(self.get("in"), validate=False):
            barcode = FastqEntry(e.header, e.bases[:cut], e.header2, e.quals[:cut])
            main = FastqEntry(e.header, e.bases[cut:], e.header2, e.quals[cut:])
            wm.write(main)
            wi.write(barcode)
        wm.close()
        wi.close()


class FastqExtractUMITool(ToolBase):
    name = "FastqExtractUMI"
    description = "Cuts UMI bases from the beginning of reads and adds them to read headers."

    def setup(self):
        self.add_infile("in1", "Input FASTQ file 1.")
        self.add_infile("in2", "Input FASTQ file 2.")
        self.add_outfile("out1", "Output filename for read 1 FASTQ.")
        self.add_outfile("out2", "Output filename for read 2 FASTQ.")
        self.add_int("cut1", "Number of bases from the head of read 1 to use as UMI.", optional=True, default=0)
        self.add_int("cut2", "Number of bases from the head of read 2 to use as UMI.", optional=True, default=0)
        self.add_int("compression_level", "Output FASTQ compression level from 1 (fastest) to 9 (best compression).", optional=True, default=1)

    def main(self):
        cut1 = self.get_int("cut1")
        cut2 = self.get_int("cut2")
        level = self.get_int("compression_level")
        w1 = FastqEntryWriter(self.get("out1"), level)
        w2 = FastqEntryWriter(self.get("out2"), level)
        it2 = iter_entries(self.get("in2"), validate=False)
        for e1 in iter_entries(self.get("in1"), validate=False):
            e2 = next(it2, None)
            if e2 is None:
                break
            bh = b":" + str(cut1).encode() + b"," + str(cut2).encode() + b":" + e1.bases[:cut1] + b"," + e2.bases[:cut2]
            for e, cut in ((e1, cut1), (e2, cut2)):
                parts = e.header.split(b" ")
                parts[0] += bh
                e.header = b" ".join(parts)
                e.bases = e.bases[cut:]
                e.quals = e.quals[cut:]
            w1.write(e1)
            w2.write(e2)
        w1.close()
        w2.close()


class FastqAddBarcodeTool(ToolBase):
    name = "FastqAddBarcode"
    description = "Adds barcodes from separate FASTQ file to read headers."

    def setup(self):
        self.add_infile_list("in1", "Input FASTQ file 1.")
        self.add_infile_list("in2", "Input FASTQ file 2.")
        self.add_infile_list("in_barcode", "Input barcode file.")
        self.add_outfile("out1", "Output filename for read 1 FASTQ.")
        self.add_outfile("out2", "Output filename for read 2 FASTQ.")
        self.add_int("compression_level", "Output FASTQ compression level from 1 (fastest) to 9 (best compression).", optional=True, default=1)

    def main(self):
        level = self.get_int("compression_level")
        w1 = FastqEntryWriter(self.get("out1"), level)
        w2 = FastqEntryWriter(self.get("out2"), level)
        in1 = self.get_infile_list("in1")
        in2 = self.get_infile_list("in2")
        inb = self.get_infile_list("in_barcode")
        for f1, f2, fb in zip(in1, in2, inb):
            it2 = iter_entries(f2, validate=False)
            itb = iter_entries(fb, validate=False)
            for e1 in iter_entries(f1, validate=False):
                e2 = next(it2, None)
                e3 = next(itb, None)
                if e2 is None or e3 is None:
                    break
                bh = b":" + str(len(e3.bases)).encode() + b",0:" + e3.bases + b","
                for e in (e1, e2):
                    parts = e.header.split(b" ")
                    parts[0] += bh
                    e.header = b" ".join(parts)
                w1.write(e1)
                w2.write(e2)
        w1.close()
        w2.close()


class FastqMidParserTool(ToolBase):
    name = "FastqMidParser"
    description = "Counts the number of occurances of each MID in a FASTQ file."

    def setup(self):
        self.add_infile("in", "Input gzipped FASTQ file.")
        self.add_outfile("out", "Output TXT file. If unset, writes to STDOUT.", optional=True)
        self.add_int("lines", "The number of FASTQ entries in the input file to parse. 0 is unlimited.", optional=True, default=1000)
        self.add_int("mids", "The number of top-ranking MIDs to print. 0 is unlimited.", optional=True, default=20)
        self.add_infile("sheet", "Optional sample sheet CSV file as provided to CASAVA. If given, the closest match in the sample sheet is printed after each MID.", optional=True)

    def main(self):
        max_lines = self.get_int("lines")
        max_mids = self.get_int("mids")
        sheet = []
        if self.get("sheet"):
            with open(self.get("sheet")) as fh:
                for raw in fh:
                    raw = raw.strip()
                    if not raw:
                        continue
                    parts = raw.split(",")
                    if len(parts) > 4 and parts[2] != "SampleID":
                        sheet.append((parts[2], parts[4]))

        counts: dict[str, int] = {}
        i = 0
        for e in iter_entries(self.get("in"), validate=False):
            parts = e.header.split(b":")
            if len(parts) < 10:
                raise ToolError(f"Line {i} of file {self.get('in')} does not contain 10 :-separated parts!")
            mid = parts[9].decode()
            counts[mid] = counts.get(mid, 0) + 1
            i += 1
            if max_lines != 0 and i >= max_lines:
                break

        lines = []
        j = 0
        values = sorted(set(counts.values()), reverse=True)
        stop = False
        for value in values:
            if stop:
                break
            for key in sorted(k for k, v in counts.items() if v == value):
                if not sheet:
                    lines.append(f"{key}\t{value}")
                else:
                    best = None
                    best_diff = list(range(len(key)))
                    best_diff = ["x"] * len(key)
                    for name, smid in sheet:
                        different = [str(k) for k in range(len(smid)) if k >= len(key) or smid[k] != key[k]]
                        if len(different) < len(best_diff):
                            best = (name, smid)
                            best_diff = different
                    name, smid = best if best else ("", "")
                    lines.append(f"{key}\t{value}\t(nearest={smid} name={name} dist={len(best_diff)} diff_indices={','.join(best_diff)})")
                j += 1
                if max_mids != 0 and j >= max_mids:
                    stop = True
                    break
        _write_text(self, lines)


class FastqCheckUMITool(ToolBase):
    name = "FastqCheckUMI"
    description = "Returns the UMI info of a FastQ file on STDOUT."

    def setup(self):
        self.add_infile("in", "Input FASTQ file.")
        self.add_outfile("out", "Output file containing the result string. If unset, writes to STDOUT.", optional=True)
        self.add_int("lines", "Number of lines which should be checked.", optional=True, default=10)

    def main(self):
        max_lines = self.get_int("lines")
        if max_lines < 1:
            raise ToolError("Number of lines has to be greater than zero!")
        info = set()
        n = 0
        for e in iter_entries(self.get("in"), validate=False):
            if n >= max_lines:
                break
            n += 1
            barcodes = e.header.split(b" ")[0].split(b":")[-1].split(b",")
            lengths = []
            valid = True
            for bc in barcodes:
                bc = bc.strip().upper()
                if all(c in b"ATCGN" for c in bc):
                    lengths.append(len(bc))
                else:
                    valid = False
                    break
            if valid:
                info.add("UMI: true\tlength: " + ",".join(str(l) for l in lengths))
            else:
                info.add("UMI: false\tlength: n/a")
        if len(info) > 1:
            raise ToolError("ERROR: FastQ reads contain multiple UMI types!\n\t" + "\n\t".join(sorted(info)))
        _write_text(self, [sorted(info)[0]])


TOOLS = {
    "FastqList": FastqListTool,
    "FastqExtract": FastqExtractTool,
    "FastqConcat": FastqConcatTool,
    "FastqToFasta": FastqToFastaTool,
    "FastqFormat": FastqFormatTool,
    "FastqTrim": FastqTrimTool,
    "FastqConvert": FastqConvertTool,
    "FastqDownsample": FastqDownsampleTool,
    "FastqExtractBarcode": FastqExtractBarcodeTool,
    "FastqExtractUMI": FastqExtractUMITool,
    "FastqAddBarcode": FastqAddBarcodeTool,
    "FastqMidParser": FastqMidParserTool,
    "FastqCheckUMI": FastqCheckUMITool,
}
