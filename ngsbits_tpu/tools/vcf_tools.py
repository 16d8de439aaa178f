"""VCF utility tools.

Behavioral reference: ngs-bits src/Vcf*/main.cpp (streaming line tools and
VcfFile-based tools).
"""

from __future__ import annotations

import gzip
import sys

from ..io.vcf import VcfFile, vcf_sort, vcf_store, vcf_store_as_tsv
from .toolbase import ToolBase, ToolError


def _open_lines(path: str):
    """Yield lines (without trailing newline/CR) from plain or gzipped file/stdin."""
    if path in ("", "-", None):
        data = sys.stdin.buffer.read()
    else:
        with open(path, "rb") as fh:
            data = fh.read()
        if data[:2] == b"\x1f\x8b":
            data = gzip.decompress(data)
    for line in data.split(b"\n"):
        yield line.rstrip(b"\r")


class _TextOut:
    def __init__(self, path: str | None):
        self.path = path
        self.parts = []

    def write(self, b: bytes):
        self.parts.append(b)

    def close(self):
        data = b"".join(self.parts)
        if self.path in ("", "-", None):
            sys.stdout.buffer.write(data)
        else:
            with open(self.path, "wb") as fh:
                fh.write(data)


class VcfSortTool(ToolBase):
    name = "VcfSort"
    description = "Sorts variant lists according to chromosomal position."

    def setup(self):
        self.add_infile("in", "Input variant list in VCF format.")
        self.add_outfile("out", "Output variant list in VCF or VCF.GZ format.")
        self.add_int("compression_level", "Output VCF compression level from 1 (fastest) to 9 (best compression). If unset, an unzipped VCF is written.", optional=True, default=0)
        self.add_flag("remove_unused_contigs", "Remove comment lines of contigs, i.e. chromosomes, that are not used in the output VCF.")
        self.add_flag("split_chrs", "Mode with reduced memory consumption for large files. Sorts only one chromosome at a time into a tmp file and merges all tmp files at the end.")
        self.add_flag("debug", "Enable debug output to STDOUT.")

    def main(self):
        vl = VcfFile.from_file(self.get("in"))
        vcf_sort(vl)
        vcf_store(vl, self.get("out"), self.get_int("compression_level"),
                  self.get_flag("remove_unused_contigs"))


class VcfToTsvTool(ToolBase):
    name = "VcfToTsv"
    description = "Converts a VCF file to a tab-separated text file."

    def setup(self):
        self.add_infile("in", "Input variant list in VCF or VCF.GZ format. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output variant list in TSV format. If unset, writes to STDOUT.", optional=True)

    def main(self):
        vl = VcfFile.from_file(self.get("in"))
        vcf_store_as_tsv(vl, self.get("out"))


class VcfToBedTool(ToolBase):
    name = "VcfToBed"
    description = "Converts a VCF file to a BED file."

    def setup(self):
        self.add_infile("in", "Input variant list in VCF format.", optional=True)
        self.add_outfile("out", "Output region in BED format.", optional=True)
        self.add_flag("add_chr", "Add 'chr' to chromosome names if missing.")

    def main(self):
        add_chr = self.get_flag("add_chr")
        out = _TextOut(self.get("out"))
        for line in _open_lines(self.get("in")):
            if not line.strip() or line.startswith(b"#"):
                continue
            parts = line.split(b"\t")
            if len(parts) < 8:
                raise ToolError(f"VCF line with less than 8 fields found: '{line.decode(errors='replace').strip()}'")
            chr_ = parts[0]
            if add_chr and not chr_.lower().startswith(b"chr"):
                chr_ = b"chr" + chr_
            pos = int(parts[1])
            ref = parts[3]
            out.write(chr_ + b"\t" + str(pos - 1).encode() + b"\t"
                      + str(pos + len(ref) - 1).encode() + b"\n")
        out.close()


class VcfExtractSamplesTool(ToolBase):
    name = "VcfExtractSamples"
    description = "Extract one or several samples from a VCF file. Can also be used to re-order sample columns."

    def setup(self):
        self.add_infile("in", "Input VCF file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output VCF list. If unset, writes to STDOUT.", optional=True)
        self.add_string("samples", "Comma-separated list of samples to extract (in the given order).")

    def main(self):
        samples = [s.encode() for s in self.get("samples").split(",")]
        out = _TextOut(self.get("out"))
        column_indices = list(range(9))  # up to FORMAT
        for line in _open_lines(self.get("in")):
            if not line.strip():
                continue
            if line.startswith(b"#"):
                if line.startswith(b"#CHROM"):
                    parts = line.strip().split(b"\t")
                    for sample in samples:
                        try:
                            index = parts.index(sample, 9)
                        except ValueError:
                            valid = b"', '".join(parts[9:])
                            raise ToolError(f"Cannot find sample '{sample.decode()}' in VCF header. Valid sample names are: '{valid.decode()}'")
                        column_indices.append(index)
                    out.write(b"\t".join(parts[c] for c in column_indices) + b"\n")
                else:
                    out.write(line + b"\n")
                continue
            parts = line.strip().split(b"\t")
            out.write(b"\t".join(parts[c] for c in column_indices) + b"\n")
        out.close()


def _header_id(line: bytes) -> bytes:
    start = line.find(b"ID=") + 3
    end = line.find(b",", start)
    return line[start:end]


class VcfStripTool(ToolBase):
    name = "VcfStrip"
    description = "Removes unwanted information from a VCF file."

    def setup(self):
        self.add_infile("in", "Input VCF file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output VCF file. If unset, writes to STDOUT.", optional=True)
        self.add_string("info", "Comma-separated list of INFO entries to keep. If unset, all INFO entries are kept.", optional=True, default="")
        self.add_string("format", "Comma-separated list of FORMAT entries to keep. If unset, all FORMAT entries are kept", optional=True, default="")
        self.add_flag("clear_info", "Remove all INFO fields")

    def main(self):
        clear_info = self.get_flag("clear_info")
        infos_keep = {s.encode() for s in self.get("info").split(",") if s}
        formats_keep = {s.encode() for s in self.get("format").split(",") if s}
        out = _TextOut(self.get("out"))
        for line in _open_lines(self.get("in")):
            if not line:
                continue
            if line.startswith(b"#"):
                line_id = _header_id(line)
                if line.startswith(b"##INFO"):
                    if infos_keep:
                        if line_id not in infos_keep:
                            continue
                    elif clear_info:
                        continue
                    else:
                        out.write(line + b"\n")
                        continue
                elif line.startswith(b"##FORMAT") and (line_id not in formats_keep and formats_keep):
                    continue
                out.write(line + b"\n")
                continue

            parts = line.split(b"\t")
            if len(parts) < 8:
                raise ToolError(f"VCF with too few columns: {line.decode(errors='replace')}")
            # INFO
            if clear_info and not infos_keep:
                parts[7] = b"."
            elif infos_keep:
                kept = []
                for entry in parts[7].split(b";"):
                    key = entry.split(b"=", 1)[0]
                    if key in infos_keep:
                        kept.append(entry)
                parts[7] = b";".join(kept) if kept else b"."
            # FORMAT + samples
            if formats_keep and len(parts) > 8:
                fkeys = parts[8].split(b":")
                keep_idx = [i for i, k in enumerate(fkeys) if k in formats_keep]
                parts[8] = b":".join(fkeys[i] for i in keep_idx)
                for si in range(9, len(parts)):
                    vals = parts[si].split(b":")
                    parts[si] = b":".join(vals[i] for i in keep_idx if i < len(vals))
            out.write(b"\t".join(parts) + b"\n")
        out.close()


class VcfAddTool(ToolBase):
    name = "VcfAdd"
    description = "Merges several VCF files into one VCF by appending one to the other."

    def setup(self):
        self.add_infile_list("in", "Input files to merge in VCF or VCG.GZ format.")
        self.add_outfile("out", "Output VCF file with all variants.", optional=True)
        self.add_string("filter", "Tag variants from all but the first input file with this filter entry.", optional=True, default="")
        self.add_string("filter_desc", "Description used in the filter header - use underscore instead of spaces.", optional=True, default="")
        self.add_flag("skip_duplicates", "Skip variants if they occur more than once.")

    def main(self):
        filt = self.get("filter").encode()
        filter_desc = self.get("filter_desc").encode().replace(b"_", b" ")
        filter_used = bool(filt)
        skip_dup = self.get_flag("skip_duplicates")
        out = _TextOut(self.get("out"))
        column_count = -1
        filters_defined = set()
        vars_seen = set()
        is_first = True
        for in_path in self.get_infile_list("in"):
            for line in _open_lines(in_path):
                if not line:
                    continue
                if line.startswith(b"#"):
                    if is_first:
                        if line.startswith(b"##FILTER=<ID="):
                            filters_defined.add(line[13:].split(b",", 1)[0])
                        if not line.startswith(b"##"):
                            column_count = len(line.split(b"\t"))
                            if filter_used and filt not in filters_defined:
                                out.write(b"##FILTER=<ID=" + filt + b',Description="' + filter_desc + b'">\n')
                        out.write(line + b"\n")
                    elif not line.startswith(b"##"):
                        if len(line.split(b"\t")) != column_count:
                            raise ToolError("VCF files with differing column count cannot be combined!")
                    continue
                parts = line.split(b"\t")
                if skip_dup:
                    tag = parts[0] + b"\t" + parts[1] + b"\t" + parts[3] + b"\t" + parts[4]
                    if tag in vars_seen:
                        continue
                    vars_seen.add(tag)
                if not is_first and filter_used:
                    fs = parts[6]
                    parts[6] = filt if fs in (b"PASS", b".") else fs + b";" + filt
                    line = b"\t".join(parts)
                out.write(line + b"\n")
            is_first = False
        out.close()


class VcfSubtractTool(ToolBase):
    name = "VcfSubtract"
    description = "Substracts the variants in a VCF from a second VCF."

    def setup(self):
        self.add_infile("in2", "Variants in VCF format that are remove from 'in'")
        self.add_infile("in", "Input VCF file from which the variants of 'in2' are substracted.", optional=True)
        self.add_outfile("out", "Output VCF file with variants from 'in2' removed from 'in'.", optional=True)

    def main(self):
        def key(line):
            parts = line.split(b"\t")
            return parts[0] + b":" + parts[1] + b" " + parts[3] + b">" + parts[4]

        blacklist = set()
        for line in _open_lines(self.get("in2")):
            if not line or line.startswith(b"#"):
                continue
            blacklist.add(key(line))
        removed = 0
        out = _TextOut(self.get("out"))
        for line in _open_lines(self.get("in")):
            if not line:
                continue
            if line.startswith(b"#"):
                out.write(line + b"\n")
                continue
            if key(line) in blacklist:
                removed += 1
                continue
            out.write(line + b"\n")
        out.close()
        print(f"Variants from in removed: {removed}")


class VcfStreamSortTool(ToolBase):
    name = "VcfStreamSort"
    description = "Sort entries of a VCF file according to genomic position using a stream. Variants must be grouped by chromosome!"

    def setup(self):
        self.add_infile("in", "Input VCF file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output VCF list. If unset, writes to STDOUT.", optional=True)
        self.add_int("n", "Number of variants to cache for sorting.", optional=True, default=10000)

    def main(self):
        n = self.get_int("n")
        out = _TextOut(self.get("out"))
        cache: dict = {}
        last_chr = None
        chr_done = set()
        last_pos_written = -1

        def flush_all():
            nonlocal cache
            for k in sorted(cache.keys()):
                out.write(cache[k])
            cache = {}

        for line in _open_lines(self.get("in")):
            if not line.strip():
                continue
            if line.startswith(b"#"):
                out.write(line + b"\n")
                continue
            parts = line.split(b"\t")
            if len(parts) < 8:
                raise ToolError(f"VCF line with less than 8 fields found: '{line.decode(errors='replace').strip()}'")
            chr_ = parts[0]
            pos = int(parts[1])
            if chr_ != last_chr:
                flush_all()
                last_pos_written = -1
                if chr_ in chr_done:
                    raise ToolError(f"Variants in input are not grouped according to chromosome. Found chromosome '{chr_.decode()}' twice!")
                chr_done.add(chr_)
                last_chr = chr_
            if pos < last_pos_written:
                raise ToolError(f"Variant '{chr_.decode()}:{pos}' out of order - cache too small?!")
            cache[(pos, parts[3], parts[4], parts[7])] = line + b"\n"
            if len(cache) > n:
                # write half the cache
                keys = sorted(cache.keys())
                for k in keys[:len(keys) // 2]:
                    out.write(cache.pop(k))
                    last_pos_written = k[0]
        flush_all()
        out.close()


class VcfBreakMultiTool(ToolBase):
    name = "VcfBreakMulti"
    description = "Breaks multi-allelic variants into several lines, making sure that allele-specific INFO/SAMPLE fields are still valid."

    def setup(self):
        self.add_infile("in", "Input VCF file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output VCF list. If unset, writes to STDOUT.", optional=True)
        self.add_flag("no_errors", "Ignore VCF format errors if possible.")
        self.add_flag("verbose", "Writes ignored VCF format errors to stderr.")

    def main(self):
        # behavioral reference: src/VcfBreakMulti/main.cpp (A/R/G INFO+FORMAT
        # splitting, substring-count GT mapping, phased GT handling)
        no_errors = self.get_flag("no_errors")
        verbose = self.get_flag("verbose")
        out = _TextOut(self.get("out"))
        info2type: dict[bytes, bytes] = {}
        format2type: dict[bytes, bytes] = {}
        ignored_info: dict[bytes, int] = {}
        ignored_format: dict[bytes, int] = {}

        def gidx(i, j):
            return j * (j + 1) // 2 + i

        for line in _open_lines(self.get("in")):
            if not line.strip():
                continue
            if line.startswith(b"#"):
                if line.startswith(b"##INFO"):
                    if b"Number=R" in line:
                        info2type[_header_id(line)] = b"R"
                    elif b"Number=A" in line:
                        info2type[_header_id(line)] = b"A"
                    elif b"Number=G" in line:
                        info2type[_header_id(line)] = b"G"
                elif line.startswith(b"##FORMAT"):
                    if b"Number=R" in line:
                        format2type[_header_id(line)] = b"R"
                    elif b"Number=A" in line:
                        format2type[_header_id(line)] = b"A"
                    elif b"Number=G" in line:
                        format2type[_header_id(line)] = b"G"
                out.write(line + b"\n")
                continue

            parts0 = line.split(b"\t")
            if len(parts0) > 4 and b"," not in parts0[4]:
                out.write(line + b"\n")
                continue
            parts = line.strip().split(b"\t")
            if len(parts) < 8:
                raise ToolError(f"VCF with too few columns: {line.decode(errors='replace')}")
            alts = parts[4].split(b",")
            n_alt = len(alts)
            infos = parts[7].split(b";")
            has_samples = len(parts) > 8
            fmt = parts[8].split(b":") if has_samples else []

            new_infos = [b"" for _ in alts]
            for entry in infos:
                eparts = entry.split(b"=")
                name = eparts[0]
                if name in info2type:
                    typ = info2type[name]
                    vals = eparts[1].split(b",")
                    if typ in (b"A", b"R"):
                        expected = n_alt + (1 if typ == b"R" else 0)
                    else:
                        expected = (n_alt + 1) * (n_alt + 2) // 2
                    if len(vals) != expected:
                        if no_errors:
                            for j in range(n_alt):
                                if new_infos[j]:
                                    new_infos[j] += b";"
                                new_infos[j] += entry
                            if verbose:
                                ignored_info[name] = ignored_info.get(name, 0) + 1
                        else:
                            raise ToolError(
                                f"VCF INFO field '{name.decode()}' has wrong number of elements "
                                f"(expected {expected}, got {len(vals)}): {line.decode(errors='replace')}")
                    else:
                        for j in range(n_alt):
                            if new_infos[j]:
                                new_infos[j] += b";"
                            if typ == b"R":
                                new_infos[j] += name + b"=" + vals[0] + b"," + vals[j + 1]
                            elif typ == b"G":
                                new_infos[j] += (name + b"=" + vals[0] + b","
                                                 + vals[gidx(0, j + 1)] + b","
                                                 + vals[gidx(j + 1, j + 1)])
                            else:
                                new_infos[j] += name + b"=" + vals[j]
                else:
                    for j in range(n_alt):
                        if new_infos[j]:
                            new_infos[j] += b";"
                        new_infos[j] += entry

            new_samples = [[b"" for _ in range(len(parts) - 9)] for _ in alts]
            if has_samples:
                ftypes = [format2type.get(k, b"O") for k in fmt]
                for i in range(len(parts) - 9):
                    col = 9 + i
                    if parts[col] == b".":
                        continue
                    svals = parts[col].split(b":")
                    for j in range(len(svals)):
                        if j == 0 and fmt[0] == b"GT":
                            gt = svals[0]
                            if b"," in gt:
                                raise ToolError(f"VCF contains invalid GT entry for sample #{i+1}")
                            n_geno = len(gt.replace(b"|", b"/").split(b"/"))
                            if n_geno not in (1, 2):
                                raise ToolError(f"VCF contains invalid GT entry for sample #{i+1}")
                            phased = b"|" in gt
                            for a in range(n_alt):
                                ac = gt.count(str(a + 1).encode())
                                wt = gt.count(b"0")
                                if ac == 0 and wt == 2:
                                    g = b"0|0" if phased else b"0/0"
                                elif ac == 0 and wt == 1:
                                    if phased:
                                        g = b"0|." if gt.startswith(b"0") else b".|0"
                                    else:
                                        g = b"./0"
                                elif ac == 0 and wt == 0:
                                    g = b".|." if phased else b"./."
                                elif ac == 1 and wt == 1:
                                    if phased:
                                        g = b"0|1" if gt.startswith(b"0") else b"1|0"
                                    else:
                                        g = b"0/1"
                                elif ac == 1 and wt == 0:
                                    if phased:
                                        g = b"1|." if gt.startswith(str(a + 1).encode()) else b".|1"
                                    else:
                                        g = b"./1"
                                else:
                                    g = b"1|1" if phased else b"1/1"
                                new_samples[a][i] = g
                        elif svals[j] == b".":
                            for a in range(n_alt):
                                if new_samples[a][i]:
                                    new_samples[a][i] += b":"
                                new_samples[a][i] += svals[j]
                        elif ftypes[j] in (b"R", b"A", b"G"):
                            vv = svals[j].split(b",")
                            typ = ftypes[j]
                            if typ in (b"A", b"R"):
                                expected = n_alt + (1 if typ == b"R" else 0)
                            else:
                                expected = (n_alt + 1) * (n_alt + 2) // 2
                            if len(vv) != expected:
                                if no_errors:
                                    for a in range(n_alt):
                                        if new_samples[a][i]:
                                            new_samples[a][i] += b":"
                                        new_samples[a][i] += svals[j]
                                    if verbose:
                                        ignored_format[fmt[j]] = ignored_format.get(fmt[j], 0) + 1
                                else:
                                    raise ToolError(
                                        f"VCF contains invalid element count in format entry "
                                        f"{fmt[j].decode()} for sample #{i+1} (expected {expected}, "
                                        f"got {len(vv)}): {line.decode(errors='replace')}")
                            else:
                                for a in range(n_alt):
                                    if new_samples[a][i]:
                                        new_samples[a][i] += b":"
                                    if typ == b"R":
                                        new_samples[a][i] += vv[0] + b"," + vv[a + 1]
                                    elif typ == b"G":
                                        new_samples[a][i] += (vv[0] + b"," + vv[gidx(0, a + 1)]
                                                              + b"," + vv[gidx(a + 1, a + 1)])
                                    else:
                                        new_samples[a][i] += vv[a]
                        else:
                            for a in range(n_alt):
                                if new_samples[a][i]:
                                    new_samples[a][i] += b":"
                                new_samples[a][i] += svals[j]

            for a in range(n_alt):
                parts[4] = alts[a]
                parts[7] = new_infos[a]
                if has_samples:
                    for i in range(len(parts) - 9):
                        if parts[9 + i] != b"." or new_samples[a][i]:
                            if new_samples[a][i]:
                                parts[9 + i] = new_samples[a][i]
                out.write(b"\t".join(parts) + b"\n")
        out.close()

        if no_errors and verbose:
            for k, v in ignored_info.items():
                sys.stderr.write(f"Ignored invalid value count of INFO field '{k.decode()}' {v} times\n")
            for k, v in ignored_format.items():
                sys.stderr.write(f"Ignored invalid value count of FORMAT field '{k.decode()}' {v} times\n")


TOOLS = {
    "VcfSort": VcfSortTool,
    "VcfToTsv": VcfToTsvTool,
    "VcfToBed": VcfToBedTool,
    "VcfExtractSamples": VcfExtractSamplesTool,
    "VcfStrip": VcfStripTool,
    "VcfAdd": VcfAddTool,
    "VcfSubtract": VcfSubtractTool,
    "VcfStreamSort": VcfStreamSortTool,
    "VcfBreakMulti": VcfBreakMultiTool,
}
