"""VCF utility tools.

Behavioral reference: ngs-bits src/Vcf*/main.cpp (streaming line tools and
VcfFile-based tools).
"""

from __future__ import annotations

import gzip
import sys

from ngsbits_tpu.utils.stdio import stdin_binary, stdout_binary

from ..io.vcf import VcfFile, vcf_sort, vcf_store, vcf_store_as_tsv
from .toolbase import ToolBase, ToolError


def _open_lines(path: str):
    """Yield lines (without trailing newline/CR) from plain or gzipped file/stdin."""
    if path in ("", "-", None):
        data = stdin_binary().read()
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
            stdout_binary().write(data)
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
        if self.get_flag("split_chrs"):
            self._sort_split_chrs()
            return
        vl = VcfFile.from_file(self.get("in"))
        vcf_sort(vl)
        vcf_store(vl, self.get("out"), self.get_int("compression_level"),
                  self.get_flag("remove_unused_contigs"))

    def _sort_split_chrs(self):
        """Reduced-memory mode: bucket body lines per chromosome on disk,
        sort one chromosome at a time, concatenate in chromosome order
        (VcfSort -split_chrs). Output bytes match the in-memory sort."""
        import gzip as _gzip
        import os
        import tempfile

        from ..core.chromosome import Chromosome

        path = self.get("in")
        opener = _gzip.open if str(path).endswith(".gz") else open
        header_raw = []
        buckets: dict[int, object] = {}
        chrom_of: dict[int, set] = {}
        with tempfile.TemporaryDirectory() as td:
            with opener(path, "rb") as fh:
                for raw in fh:
                    line = raw.rstrip(b"\r\n")
                    if not line.strip():
                        continue
                    if line.startswith(b"#"):
                        header_raw.append(line)
                        continue
                    raw_chr = line.split(b"\t", 1)[0]
                    c = Chromosome(raw_chr)
                    b = buckets.get(c.num)
                    if b is None:
                        b = buckets[c.num] = open(
                            os.path.join(td, f"c{len(buckets)}.vcf"), "w+b")
                        chrom_of[c.num] = set()
                    # all raw spellings per bucket: the non-split path keeps
                    # a ##contig line for every spelling seen in the data
                    chrom_of[c.num].add(raw_chr)
                    b.write(line + b"\n")
            header_blob = b"\n".join(header_raw) + b"\n"

            # sort one chromosome at a time, streaming each part to the
            # output so peak memory stays bounded by the largest chromosome
            body_parts = []    # per-chrom tmp output paths, chromosome order
            final_header = None
            for pi, num in enumerate(sorted(buckets)):
                b = buckets[num]
                b.flush()
                tmp_in = os.path.join(td, "part_in.vcf")
                with open(tmp_in, "wb") as fh:
                    fh.write(header_blob)
                    b.seek(0)
                    fh.write(b.read())
                b.close()
                vl = VcfFile.from_file(tmp_in)
                vcf_sort(vl)
                tmp_out = os.path.join(td, f"part_out_{pi}.vcf")
                vcf_store(vl, tmp_out, 0, False)
                del vl
                body_parts.append(tmp_out)
                if final_header is None:
                    hdr = []
                    with open(tmp_out, "rb") as fh:
                        for raw in fh:
                            if not raw.startswith(b"#"):
                                break
                            hdr.append(raw)
                    final_header = hdr

            if final_header is None:   # header-only input
                vl = VcfFile.from_file(path)
                vcf_store(vl, self.get("out"),
                          self.get_int("compression_level"),
                          self.get_flag("remove_unused_contigs"))
                return
            if self.get_flag("remove_unused_contigs"):
                used = set()
                for n in buckets:
                    used |= chrom_of[n]
                final_header = [
                    h for h in final_header
                    if not h.startswith(b"##contig=<ID=")
                    or h.split(b"##contig=<ID=", 1)[1].split(b",", 1)[0]
                       .split(b">", 1)[0] in used]

            out = self.get("out")
            level = self.get_int("compression_level")
            gz = out not in ("", "-", None) and (level > 0
                                                 or str(out).endswith(".gz"))
            from ..io.bgzf import _EOF_BLOCK, bgzf_compress
            sink = (open(out, "wb") if out not in ("", "-", None)
                    else stdout_binary())

            def emit(part: bytes):
                if gz:
                    sink.write(bgzf_compress(part, level=max(level, 1),
                                             eof=False))
                else:
                    sink.write(part)

            emit(b"".join(final_header))
            for tmp_out in body_parts:
                body = bytearray()
                with open(tmp_out, "rb") as fh:
                    for raw in fh:
                        if not raw.startswith(b"#"):
                            body += raw
                emit(bytes(body))
            if gz:
                sink.write(_EOF_BLOCK)
            if out not in ("", "-", None):
                sink.close()


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


_OP_NUMERIC = (">", ">=", "=", "!=", "<=", "<")
_OP_STRING = ("is", "not", "contains")
_VARIANT_TYPES = ("snp", "indel", "multi-allelic", "other")


class _FilterDef:
    """FilterDefinition (VcfFilter/main.cpp:12-43)."""

    def __init__(self, field: str, op: str, value: str):
        self.field = field.encode()
        self.op = op
        self.value = value.encode()
        if op not in _OP_NUMERIC + _OP_STRING:
            raise ToolError(f"Invalid filter definition '{field} {op} {value}'.")
        if op in _OP_NUMERIC:
            try:
                float(value)
            except ValueError:
                raise ToolError(f"Invalid filter definition '{field} {op} {value}'.")

    def satisfied(self, value: bytes, line: bytes) -> bool:
        op = self.op
        if op in _OP_NUMERIC:
            try:
                v = float(value)
            except ValueError:
                raise ToolError(
                    f"Cannot convert value '{value.decode(errors='replace')}' to number "
                    f"for filter '{self.field.decode()}' in line: {line.decode(errors='replace')}")
            c = float(self.value)
            return {"<": v < c, "<=": v <= c, "=": v == c, "!=": v != c,
                    ">=": v >= c, ">": v > c}[op]
        if op == "is":
            return self.value == value
        if op == "not":
            return self.value != value
        return self.value in value  # contains


def _parse_filter_defs(expr: str) -> list:
    import re as _re
    out = []
    for part in expr.split(";"):
        part = part.strip()
        if not part:
            continue
        m = _re.match(r"(\S+)\s+(\S+)\s+(\S+)", part)
        if not m:
            raise ToolError(f"Invalid filter definition '{part}'")
        out.append(_FilterDef(*m.groups()))
    return out


class VcfFilterTool(ToolBase):
    """VcfFilter (VcfFilter/main.cpp): streaming VCF filtering."""

    name = "VcfFilter"
    description = "Filters a VCF based on the given criteria."

    def setup(self):
        self.add_infile("in", "Input VCF file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output VCF list. If unset, writes to STDOUT.", optional=True)
        self.add_string("reg", "Region of interest in BED format, or comma-separated list of regions.", optional=True)
        self.add_flag("remove_invalid", "Removes invalid variants, i.e. invalid position of ref/alt.")
        self.add_flag("remove_non_ref", "Remove '<NON_REF>' entries (used in gVCF files).")
        self.add_string("variant_type", "Filters by variant type ('" + "','".join(_VARIANT_TYPES) + "').", optional=True)
        self.add_string("id", "Filter by ID column (regular expression).", optional=True)
        self.add_float("qual", "Filter by QUAL column (minimum).", optional=True, default=0.0)
        self.add_string("filter", "Filter by FILTER column - keep matches (regular expression).", optional=True)
        self.add_string("filter_exclude", "Filter by FILTER column - exclude matches (regular expression).", optional=True)
        self.add_flag("filter_clear", "Remove filter entries of all variants, i.e. sets filter to PASS.")
        self.add_flag("filter_empty", "Removes entries with non-empty FILTER column.")
        self.add_string("info", "Filter by INFO column entries - ';'-separated, e.g. 'DP > 5;AO > 2'.", optional=True)
        self.add_string("info_flags", "Filter by INFO flag(s) - keep matches (comma-separated list).", optional=True)
        self.add_string("info_flags_exclude", "Filter by INFO flag(s) - exclude matches (comma-separated list).", optional=True)
        self.add_string("sample", "Filter by sample-specific entries, e.g. 'GT is 1/1'.", optional=True)
        self.add_flag("sample_one_match", "A line passes if one sample passes all filters (default: all samples).")
        self.add_flag("no_special_chr", "Removes variants on special chromosomes.")
        self.add_infile("ref", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)

    def main(self):
        import re as _re
        from ..core.chromosome import Chromosome
        from ..core.intervals import BedFile, BedLine, ChromosomalIndex

        reg = self.get("reg")
        roi_index = None
        if reg:
            import os
            roi = BedFile()
            if os.path.exists(reg):
                roi = BedFile.from_file(reg)
            else:
                for region in reg.split(","):
                    m = _re.match(r"^(.+):(\d+)-(\d+)$", region.replace(",", ""))
                    if not m:
                        raise ToolError(f"Invalid region '{region}' given in parameter 'reg'!")
                    roi.append(BedLine(Chromosome(m.group(1)), int(m.group(2)), int(m.group(3))))
            roi.merge()
            roi_index = ChromosomalIndex(roi)

        quality = self.get_float("qual")
        filter_empty = self.get_flag("filter_empty")
        remove_invalid = self.get_flag("remove_invalid")
        sample_one_match = self.get_flag("sample_one_match")
        no_special_chr = self.get_flag("no_special_chr")
        remove_non_ref = self.get_flag("remove_non_ref")
        filter_clear = self.get_flag("filter_clear")
        filter_re = _re.compile(self.get("filter").encode()) if self.get("filter") else None
        filter_ex_re = _re.compile(self.get("filter_exclude").encode()) if self.get("filter_exclude") else None
        id_re = _re.compile(self.get("id").encode()) if self.get("id") else None
        variant_type = self.get("variant_type")
        if variant_type and variant_type not in _VARIANT_TYPES:
            raise ToolError(f"Variant type {variant_type} is not a supported variant type!")
        info_filters = _parse_filter_defs(self.get("info") or "")
        sample_filters = _parse_filter_defs(self.get("sample") or "")
        flags_keep = {f.encode() for f in (self.get("info_flags") or "").split(",") if f}
        flags_exclude = {f.encode() for f in (self.get("info_flags_exclude") or "").split(",") if f}

        reference = None
        if remove_invalid:
            from ..io.fasta import FastaFileIndex
            ref_file = self.get_ref()
            if not ref_file:
                raise ToolError("Reference genome FASTA unset in both command-line and settings.ini file!")
            reference = FastaFileIndex(ref_file)

        out = _TextOut(self.get("out"))
        column_count = 0
        for line in _open_lines(self.get("in")):
            if not line.strip():
                continue
            parts = [p.strip() for p in line.split(b"\t")]
            if line.startswith(b"#"):
                if not line.startswith(b"##"):
                    column_count = len(parts)
                if filter_clear and line.startswith(b"##FILTER="):
                    continue
                out.write(line + b"\n")
                continue

            if roi_index is not None:
                pos = int(parts[1])
                if roi_index.matching_index(Chromosome(parts[0].decode()), pos,
                                            pos + len(parts[3]) - 1) == -1:
                    continue
            if no_special_chr and not Chromosome(parts[0].decode()).is_non_special():
                continue
            if variant_type:
                ref_c, alt_c = parts[3], parts[4]
                if len(ref_c) == 1 and len(alt_c) == 1:
                    vtype = "snp"
                elif b"," in alt_c:
                    vtype = "multi-allelic"
                elif alt_c.startswith(b"<"):
                    vtype = "other"
                elif len(ref_c) > 1 or len(alt_c) > 1:
                    vtype = "indel"
                else:
                    raise ToolError(f"Unsupported variant type '{alt_c.decode()}' in line {line.decode(errors='replace')}")
                if vtype != variant_type:
                    continue
            if remove_invalid:
                chrom = Chromosome(parts[0].decode())
                pos = int(parts[1])
                ref_c = parts[3].upper()
                valid = bool(ref_c) and all(c in b"ACGTN" for c in ref_c)
                if valid:
                    try:
                        valid = reference.seq(chrom, pos, len(ref_c)).upper() == ref_c
                    except Exception:
                        valid = False
                if valid:
                    for a in parts[4].split(b","):
                        if a.startswith(b"<") or a == b"*":
                            continue
                        if not a or not all(c in b"ACGTN" for c in a.upper()):
                            valid = False
                if not valid:
                    print(f"filtered invalid variant: {parts[0].decode()}:{parts[1].decode()} "
                          f"{parts[3].decode()}>{parts[4].decode()}", file=sys.stderr)
                    continue
            if remove_non_ref and b"<NON_REF>" in parts[4].split(b","):
                print(f"filtered '<NON_REF>' variant: {parts[0].decode()}:{parts[1].decode()} "
                      f"{parts[3].decode()}>{parts[4].decode()}", file=sys.stderr)
                continue
            if quality > 0 and float(parts[5]) < quality:
                continue
            if filter_empty and parts[6] not in (b".", b"", b"PASS"):
                continue
            if filter_re is not None and not filter_re.search(parts[6]):
                continue
            if filter_ex_re is not None and filter_ex_re.search(parts[6]):
                continue
            if id_re is not None and not id_re.search(parts[2]):
                continue

            if info_filters or flags_keep or flags_exclude:
                var_flags = set()
                passes = True
                for entry in parts[7].split(b";"):
                    sep = entry.find(b"=")
                    if sep == -1:
                        var_flags.add(entry)
                    elif info_filters:
                        name = entry[:sep]
                        for fd in info_filters:
                            if fd.field == name and not fd.satisfied(entry[sep + 1:], line):
                                passes = False
                    if not passes:
                        break
                if not passes:
                    continue
                if flags_keep and not (var_flags & flags_keep):
                    continue
                if var_flags & flags_exclude:
                    continue

            if sample_filters:
                format_entries = parts[8].split(b":") if len(parts) > 8 else []
                samples_passing = 0
                samples_failing = 0
                for i in range(9, column_count):
                    sample_parts = parts[i].split(b":")
                    current_passes = True
                    for fd in sample_filters:
                        try:
                            idx = format_entries.index(fd.field)
                        except ValueError:
                            continue
                        if not fd.satisfied(sample_parts[idx], line):
                            current_passes = False
                            break
                    if current_passes:
                        samples_passing += 1
                        if sample_one_match:
                            break
                    else:
                        samples_failing += 1
                        if not sample_one_match:
                            break
                if (sample_one_match and samples_passing == 0) or \
                   (not sample_one_match and samples_failing != 0):
                    continue

            if filter_clear:
                parts[6] = b"PASS"
                line = b"\t".join(parts)
            out.write(line + b"\n")
        out.close()


class VcfCheckTool(ToolBase):
    """VcfCheck (VcfCheck/main.cpp): VCF validity checking."""

    name = "VcfCheck"
    description = "Checks a VCF file for errors."

    def setup(self):
        self.add_infile("in", "Input VCF file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output file. If unset, writes to STDOUT.", optional=True)
        self.add_int("lines", "Number of variant lines to check in the VCF file (unlimited if 0)", optional=True, default=5000)
        self.add_infile("ref", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)
        self.add_flag("info", "Add general information about the input file to the output.")
        self.add_flag("duplicates", "Check for variants occuring twice (input VCF needs to be sorted).")

    def main(self):
        from ..io.vcf_check import vcf_is_valid
        ref_file = self.get_ref()
        if not ref_file:
            raise ToolError("Reference genome FASTA unset in both command-line and settings.ini file!")
        lines = self.get_int("lines")
        if lines <= 0:
            lines = 2 ** 31 - 1
        out = _TextOut(self.get("out"))
        ok = vcf_is_valid(self.get("in"), ref_file, out,
                          self.get_flag("info"), lines,
                          self.get_flag("duplicates"))
        out.close()
        if not ok:
            raise ToolError("VCF check failed - see 'out' file for details!")


class VcfLeftNormalizeTool(ToolBase):
    """VcfLeftNormalize (VcfLeftNormalize/main.cpp): InDel left/right shifting."""

    name = "VcfLeftNormalize"
    description = "Normalizes all variants and shifts indels to the left in a VCF file."

    def setup(self):
        self.add_infile("in", "Input VCF or VCF.GZ file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output VCF or VCF.GZ file. If unset, writes to STDOUT.", optional=True)
        self.add_infile("ref", "Reference genome FASTA file. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)
        self.add_int("compression_level", "Output VCF compression level from 1 (fastest) to 9 (best compression).", optional=True, default=0)
        self.add_flag("stream", "Stream the input and output VCF without loading the whole file into memory.")
        self.add_flag("right", "Right-normalize VCF instead of left-normalizing it.")

    def main(self):
        from ..core.normalize import LEFT, RIGHT, normalize_variant
        from ..io.fasta import FastaFileIndex

        ref_file = self.get_ref()
        if not ref_file:
            raise ToolError("Reference genome FASTA unset in both command-line and settings.ini file!")
        reference = FastaFileIndex(ref_file)
        direction = RIGHT if self.get_flag("right") else LEFT
        from ..core.chromosome import Chromosome

        level = self.get_int("compression_level")
        out_path = self.get("out")
        stream = self.get_flag("stream")
        if stream and (str(out_path).endswith(".gz") or level > 0):
            raise ToolError("Streaming is only supported with uncompressed VCF files!")

        def normalized_lines():
            for line in _open_lines(self.get("in")):
                if not line.strip():
                    continue
                if line.startswith(b"#"):
                    yield line
                    continue
                parts = line.split(b"\t")
                if len(parts) < 5:
                    raise ToolError(f"VCF with too few columns: {line.decode(errors='replace')}")
                chrom = Chromosome(parts[0].decode())
                pos = int(parts[1])
                ref = parts[3].upper()
                alt = parts[4].upper()
                if b"," not in alt:
                    _, pos, ref, alt = normalize_variant(chrom, pos, ref, alt,
                                                         reference, direction)
                parts[1] = b"%d" % pos
                parts[3] = ref
                parts[4] = alt
                yield b"\t".join(parts)

        if stream or out_path in ("", None):
            # line-by-line: constant memory (streamVcf in the reference)
            fh = stdout_binary() if out_path in ("", None) else open(out_path, "wb")
            try:
                for line in normalized_lines():
                    fh.write(line + b"\n")
            finally:
                if fh is not stdout_binary():
                    fh.close()
        else:
            data = b"".join(l + b"\n" for l in normalized_lines())
            if str(out_path).endswith(".gz") or level > 0:
                from ..io.bgzf import bgzf_compress
                with open(out_path, "wb") as fh:
                    fh.write(bgzf_compress(data, level if level > 0 else 1))
            else:
                with open(out_path, "wb") as fh:
                    fh.write(data)


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
    "VcfFilter": VcfFilterTool,
    "VcfCheck": VcfCheckTool,
    "VcfLeftNormalize": VcfLeftNormalizeTool,
}
