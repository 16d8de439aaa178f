"""VCF annotation tools (BED / VCF sources).

Behavioral reference: ngs-bits src/VcfAnnotateFromBed (ChunkProcessor.cpp)
and src/VcfAnnotateFromVcf. Like the reference, VcfAnnotateFromVcf fans
body-line chunks out to -threads workers with ordered writes (fork-based
here — the annotation inner loop is pure Python, so processes rather than
GIL-bound threads); VcfAnnotateFromBed's interval lookup is a vectorized
single pass, where the thread/block parameters are accepted for CLI parity
(a sequential pass produces identical bytes).
"""

from __future__ import annotations

import gzip
import os
import sys

from ngsbits_tpu.utils.stdio import stdin_binary, stdout_binary

from ..core.intervals import BedFile, ChromosomalIndex
from .toolbase import ToolBase, ToolError

# VcfFile::INFO_URL_MAPPING (VcfFile.cpp:1557-1567)
INFO_URL_MAPPING = [("%", "%25"), ("\t", "%09"), ("\n", "%0A"), ("\r", "%0D"),
                    (" ", "%20"), (",", "%2C"), (";", "%3B"), ("=", "%3D")]


def encode_info_value(v: bytes) -> bytes:
    s = v.decode()
    for k, r in INFO_URL_MAPPING:
        s = s.replace(k, r)
    return s.encode()


def decode_info_value(v: bytes) -> bytes:
    s = v.decode()
    for k, r in reversed(INFO_URL_MAPPING):
        s = s.replace(r, k)
    return s.encode()


def _read_lines(path):
    if path in ("", "-", None):
        data = stdin_binary().read()
    elif str(path).endswith(".gz"):
        data = gzip.decompress(open(path, "rb").read())
    else:
        data = open(path, "rb").read()
    return data.split(b"\n")


def _write(path, lines):
    data = b"".join(lines)
    if path in ("", "-", None):
        stdout_binary().write(data)
    else:
        with open(path, "wb") as fh:
            fh.write(data)


class VcfAnnotateFromBedTool(ToolBase):
    name = "VcfAnnotateFromBed"
    description = "Annotates the INFO column of a VCF with data from a BED file."

    def setup(self):
        self.add_infile("bed", "BED file used as source of annotations (name column).")
        self.add_string("name", "Annotation name in INFO column of output VCF file.")
        self.add_infile("in", "Input VCF file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output VCF list. If unset, writes to STDOUT.", optional=True)
        self.add_string("sep", "Separator used if there are several matches for one variant.", optional=True, default=":")
        self.add_int("threads", "The number of threads used to read, process and write files.", optional=True, default=1)
        self.add_int("block_size", "Number of lines processed in one chunk.", optional=True, default=5000)
        self.add_int("prefetch", "Maximum number of chunks that may be pre-fetched into memory.", optional=True, default=64)
        self.add_int("debug", "Enables debug output at the given interval in milliseconds (disabled by default, cannot be combined with writing to STDOUT).", optional=True, default=-1)
        self.add_string("desc", "Custom INFO header description. If unset auto-generated string with file name and separator is used. (Use underscore instead of spaces.)", optional=True, default="")

    def main(self):
        in_ = self.get("in") or ""
        out = self.get("out") or ""
        bed = self.get("bed")
        name = self.get("name").strip().encode()
        sep = self.get("sep").strip().encode()
        desc = self.get("desc").strip().encode()

        bed_data = BedFile.from_file(bed)
        if not bed_data.is_sorted():
            bed_data.sort()
        bed_index = ChromosomalIndex(bed_data)
        for line in bed_data.lines:
            if len(line.annotations) == 0:
                raise ToolError(f"BED line '{line.to_string(True)}' has no name "
                                f"column: {line.to_string(True)}")
            if sep in line.annotations[0]:
                raise ToolError(f"BED line '{line.to_string(True)}' name column "
                                f"contains separator: "
                                + line.annotations[0].decode())

        if in_ and in_ == out:
            raise ToolError("Input and output files must be different when streaming!")

        out_lines = []
        for raw in _read_lines(in_):
            line = raw.rstrip(b"\r\n")
            if not line.strip():
                continue
            if line.startswith(b"#"):
                if line.startswith(b"#CHROM"):
                    if not desc.strip():
                        out_lines.append(b"##INFO=<ID=" + name
                                         + b',Number=.,Type=String,Description="Annotation from '
                                         + os.path.basename(bed).encode()
                                         + b" delimited by '" + sep + b"'\">\n")
                    else:
                        out_lines.append(b"##INFO=<ID=" + name
                                         + b',Number=.,Type=String,Description="'
                                         + desc.replace(b"_", b" ") + b'">\n')
                out_lines.append(line + b"\n")
                continue

            parts = line.split(b"\t")
            if len(parts) < 8:
                raise ToolError("VCF line with too few columns: " + line.decode())
            from ..core.chromosome import Chromosome
            chr_ = Chromosome(parts[0])
            start = int(parts[1])
            end = start + len(parts[3]) - 1

            annos = []
            for idx in bed_index.matching_indices(chr_, start, end):
                annos.append(bed_data.lines[int(idx)].annotations[0])

            if not annos:
                out_lines.append(line + b"\n")
            else:
                if parts[7] == b".":
                    parts[7] = b""
                if parts[7]:
                    parts[7] += b";"
                parts[7] += name + b"=" + encode_info_value(sep.join(annos))
                out_lines.append(b"\t".join(parts) + b"\n")

        _write(out, out_lines)


TOOLS = {"VcfAnnotateFromBed": VcfAnnotateFromBedTool}


class _AnnotateState:
    """Per-run state shared with chunk workers (inherited via fork)."""

    __slots__ = ("sources", "n", "exist_only", "exist_names",
                 "id_column_indices", "info_id_list", "out_info_id_list",
                 "out_id_col_names")


def _annotate_vcf_line(line: bytes, st: _AnnotateState) -> bytes:
    """Annotate one body line (the reference's ChunkProcessor inner loop)."""
    from ..core.chromosome import Chromosome

    cols = line.strip().split(b"\t")
    if len(cols) < 8:
        raise ToolError("VCF line with too few columns in input file: "
                        + line.decode())
    chr_ = Chromosome(cols[0])
    start = int(cols[1])
    end = start + len(cols[3]) - 1
    ref = cols[3]
    obs = cols[4]

    additional_annotation = []
    for i in range(st.n):
        matches = st.sources[i].matching_lines(chr_, start, end)
        additional_keys = []
        additional_values = []
        additional_ids = []
        for match in matches:
            parts = match.strip().split(b"\t")
            if len(parts) < 8:
                raise ToolError("VCF line with too few columns in "
                                "annotation file: " + match.decode())
            if parts[3] != ref or parts[4] != obs:
                continue
            if int(parts[1]) != start:
                continue
            if st.exist_only[i]:
                additional_annotation.append(st.exist_names[i])
            else:
                if st.id_column_indices[i] > -1:
                    additional_ids.append(parts[st.id_column_indices[i]].strip())
                info_column = parts[7].split(b";")
                for j, src_id in enumerate(st.info_id_list[i]):
                    for kv in info_column:
                        kv_split = kv.split(b"=")
                        if kv_split[0].strip() == src_id:
                            if len(kv_split) == 1:
                                additional_annotation.append(st.out_info_id_list[i][j])
                            else:
                                # reference takes split('=')[1]
                                val = kv.split(b"=")[1].strip()
                                if val == b"":
                                    continue
                                out_key = st.out_info_id_list[i][j]
                                if out_key in additional_keys:
                                    ki = additional_keys.index(out_key)
                                    additional_values[ki] += b"&" + val
                                else:
                                    additional_keys.append(out_key)
                                    additional_values.append(val)
                            break
        if additional_ids:
            additional_annotation.append(st.out_id_col_names[i] + b"="
                                         + b"&".join(additional_ids))
        for k, v in zip(additional_keys, additional_values):
            additional_annotation.append(k + b"=" + v)

    if additional_annotation:
        if cols[7] == b".":
            cols[7] = b";".join(additional_annotation)
        else:
            cols[7] += b";" + b";".join(additional_annotation)
        return b"\t".join(cols) + b"\n"
    return line + b"\n"


def _annotate_chunk_st(chunk: list, st: _AnnotateState) -> list:
    return [_annotate_vcf_line(l, st) for l in chunk]


class _SourceIndex:
    """Source-VCF lookup: tabix random access when an index exists
    (memory-bounded — production sources like gnomAD are tens of GB,
    matching the reference's TabixIndexedFile usage), else an in-memory
    per-chromosome table. Both query by overlap of [pos, pos+len(ref)-1]
    with the query interval."""

    def __init__(self, path: str):
        import os as _os

        self._tabix = None
        if _os.path.exists(path + ".tbi") or _os.path.exists(path + ".csi"):
            from ..io.tabix import TabixIndexedFile
            try:
                self._tabix = TabixIndexedFile(path)
                return
            except Exception:
                self._tabix = None   # unreadable index -> in-memory fallback

        import numpy as np

        from ..core.chromosome import Chromosome

        lines_by_chr: dict[int, list] = {}
        for raw in _read_lines(path):
            line = raw.rstrip(b"\r")
            if not line or line.startswith(b"#"):
                continue
            parts = line.split(b"\t", 4)
            chr_num = Chromosome(parts[0]).num
            pos = int(parts[1])
            end = pos + len(parts[3]) - 1
            lines_by_chr.setdefault(chr_num, []).append((pos, end, line))
        self._idx = {}
        for cn, items in lines_by_chr.items():
            items.sort(key=lambda t: t[0])
            pos = np.array([t[0] for t in items], dtype=np.int64)
            end = np.array([t[1] for t in items], dtype=np.int64)
            maxlen = int((end - pos).max()) + 1 if len(items) else 1
            self._idx[cn] = (pos, end, [t[2] for t in items], maxlen)

    def matching_lines(self, chr_: "Chromosome", start: int, end: int) -> list[bytes]:
        import numpy as np

        if self._tabix is not None:
            return self._tabix.get_matching_lines(
                chr_, start, end, ignore_missing_chr=True)

        ent = self._idx.get(chr_.num)
        if ent is None:
            return []
        pos, ends, lines, maxlen = ent
        lo = int(np.searchsorted(pos, start - maxlen, side="left"))
        hi = int(np.searchsorted(pos, end, side="right"))
        return [lines[i] for i in range(lo, hi) if ends[i] >= start]


def _get_info_header_value(header_line: bytes, key: bytes) -> bytes:
    if b"<" not in header_line:
        raise ToolError("VCF INFO header contains no '<': " + header_line.decode())
    key = key.lower()
    kvs = header_line.split(b"<")[1].split(b">")[0].split(b",")
    for kv in kvs:
        if kv.lower().startswith(key + b"="):
            return kv.split(b"=")[1].strip()
    raise ToolError("VCF INFO header contains no key '" + key.decode() + "': "
                    + header_line.decode())


def _modify_info_header_value(header_line: bytes, key: bytes, new_value: bytes,
                              extend: bool = False) -> bytes:
    inner = header_line[header_line.index(b"<") + 1:
                        header_line.rindex(b">")]
    raw_kvs = inner.split(b",")
    joint = []
    tmp = b""
    for kv in raw_kvs:
        if tmp:
            tmp += b","
        tmp += kv
        n_quotes = tmp.count(b'"') - tmp.count(b'\\"')
        if n_quotes % 2 == 0:
            joint.append(tmp)
            tmp = b""
    if tmp:
        raise ToolError("Error parsing Info header: Quoted string was not closed!")
    for i, kv in enumerate(joint):
        if kv.startswith(key) or kv.lower().startswith(key.lower()):
            k, v = kv.split(b"=", 1)
            in_quotes = v.startswith(b'"')
            if in_quotes:
                v = v[1:v.rindex(b'"')].strip()
            v = v + new_value if extend else new_value
            joint[i] = k + b'="' + v + b'"' if in_quotes else k + b"=" + v
            return b"##INFO=<" + b",".join(joint) + b">"
    raise ToolError("Key \"" + key.decode() + "\" not found in header line!")


class VcfAnnotateFromVcfTool(ToolBase):
    """Behavioral reference: ngs-bits src/VcfAnnotateFromVcf (main.cpp +
    ChunkProcessor.cpp). Sequential pass; chunk outputs are ordered in the
    reference, so output is byte-identical."""

    name = "VcfAnnotateFromVcf"
    description = "Annotates a VCF file with data from one or more source VCF files."
    extended_description = ["NOTICE: the parameter '-existence_only' cannot be used together with '-config_file', '-info_keys' or '-id_column'."]

    def setup(self):
        self.add_infile("in", "Input VCF(.GZ) file that is annotated. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output VCF file. If unset, writes to STDOUT.", optional=True)
        self.add_infile("config_file", "TSV file for annotation from multiple source files. For each source file, these tab-separated columns have to be given: source file name, prefix, INFO keys, ID column.", optional=True)
        self.add_infile("source", "Tabix indexed VCF.GZ file that is the source of the annotated data.", optional=True)
        self.add_string("info_keys", "INFO key(s) in 'source' that should be annotated (Multiple keys are be separated by ',', optional keys can be renamed using this syntax: 'original_key=new_key').", optional=True, default="")
        self.add_string("id_column", "ID column in 'source' (must be 'ID'). If unset, the ID column is not annotated. Alternative output name can be specified by using 'ID=new_name'.", optional=True, default="")
        self.add_string("prefix", "Prefix added to all annotations in the output VCF file.", optional=True, default="")
        self.add_flag("allow_missing_header", "If set the execution is not aborted if a INFO header is missing in the source file.")
        self.add_flag("existence_only", "Only annotate if variant exists in source.")
        self.add_string("existence_key_name", "Defines the INFO key name.", optional=True, default="EXISTS_IN_SOURCE")
        self.add_int("threads", "The number of threads used to process VCF lines.", optional=True, default=1)
        self.add_int("block_size", "Number of lines processed in one chunk.", optional=True, default=10000)
        self.add_int("prefetch", "Maximum number of chunks that may be pre-fetched into memory.", optional=True, default=64)
        self.add_flag("debug", "Enables debug output (use only with one thread).")

    @staticmethod
    def _parse_info_ids(input_string: bytes, prefix: bytes):
        info_ids, out_info_ids = [], []
        for entry in input_string.split(b","):
            entry = entry.strip()
            if not entry:
                continue
            parts = entry.split(b"=")
            info_ids.append(parts[0].strip())
            if len(parts) == 1:
                out_id = parts[0].strip()
            elif len(parts) == 2:
                out_id = parts[1].strip()
            else:
                raise ToolError('Error while parsing "info_ids" entry "'
                                + entry.decode() + '"!')
            if prefix:
                out_id = prefix + b"_" + out_id
            out_info_ids.append(out_id)
        return info_ids, out_info_ids

    @staticmethod
    def _parse_id_column(input_string: bytes, prefix: bytes):
        if not input_string.strip():
            return b"", b""
        parts = input_string.strip().split(b"=")
        if parts[0] != b"ID":
            raise ToolError('Parameter "id_column" is \'' + input_string.decode()
                            + "', but column name must be 'ID'!")
        out_name = b"ID"
        if len(parts) == 2:
            out_name = parts[1].strip()
        elif len(parts) > 2:
            raise ToolError('Parameter "id_column" contains more than one \'=\'!')
        if prefix:
            out_name = prefix + b"_" + out_name
        return b"ID", out_name

    def main(self):
        in_ = self.get("in") or ""
        out = self.get("out") or ""
        file_path = (self.get("config_file") or "").strip()
        source = (self.get("source") or "").strip()
        info_keys = self.get("info_keys").strip().encode()
        id_column = self.get("id_column").strip().encode()
        prefix = self.get("prefix").strip().encode()
        allow_missing_header = self.get_flag("allow_missing_header")
        existence_only = self.get_flag("existence_only")
        existence_key_name = self.get("existence_key_name").strip().encode()

        if in_ and in_ == out:
            raise ToolError("Input and output files must be different when streaming!")
        if existence_only and (file_path or info_keys or id_column):
            raise ToolError("Parameter 'existence_only' cannot be used together "
                            "with '-config_file', '-info_keys' or '-id_column'!")
        if existence_only and not existence_key_name:
            raise ToolError("Parameter 'existence_key_name' cannot be empty!")

        ann_files = []
        prefixes = []
        info_id_list = []
        out_info_id_list = []
        id_col_names = []
        out_id_col_names = []
        allow_missing = []
        exist_only = []
        exist_names = []
        if file_path:
            for raw in open(file_path, "rb").read().split(b"\n"):
                line = raw.rstrip(b"\r")
                if not line.strip() or line.startswith(b"#"):
                    continue
                cols = line.split(b"\t")
                if len(cols) < 4:
                    raise ToolError("Config file line does not contain 4 "
                                    "tab-separated columns (source file name, "
                                    "prefix, INFO keys, ID column). Found:\n"
                                    + line.replace(b"\t", b" -> ").strip().decode())
                ann_files.append(cols[0].strip().decode())
                pfx = cols[1].strip()
                ids, out_ids = self._parse_info_ids(cols[2], pfx)
                id_name, out_id_name = self._parse_id_column(cols[3], pfx)
                prefixes.append(pfx)
                info_id_list.append(ids)
                out_info_id_list.append(out_ids)
                id_col_names.append(id_name)
                out_id_col_names.append(out_id_name)
                allow_missing.append(len(cols) > 4 and cols[4].strip().lower() in (b"true", b"1"))
                eo = len(cols) > 5 and cols[5].strip().lower() in (b"true", b"1")
                exist_only.append(eo)
                if len(cols) > 6 and cols[6].strip():
                    exist_names.append(cols[6].strip())
                else:
                    exist_names.append(b"EXISTS_IN_SOURCE")
                if eo and (out_ids or out_id_name):
                    raise ToolError("'existence_only' annotation cannot be used "
                                    "together with INFO/ID annotation!")
            if not ann_files:
                raise ToolError("The config file has to contain at least 1 valid "
                                "annotation configuration!")
        else:
            if not info_keys and not id_column and not existence_only:
                raise ToolError("One of the parameters 'info_keys', 'id_column' or "
                                "'existence_only' is required if no config file is provided!")
            if not source:
                raise ToolError("The 'source' parameter is required if no config "
                                "file is provided!")
            ann_files.append(source)
            ids, out_ids = self._parse_info_ids(info_keys, prefix)
            id_name, out_id_name = self._parse_id_column(id_column, prefix)
            prefixes.append(prefix)
            info_id_list.append(ids)
            out_info_id_list.append(out_ids)
            id_col_names.append(id_name)
            out_id_col_names.append(out_id_name)
            allow_missing.append(allow_missing_header)
            exist_only.append(existence_only)
            exist_names.append(existence_key_name)

        all_out_ids = [i for ids in out_info_id_list for i in ids]
        if len(set(all_out_ids)) < len(all_out_ids):
            raise ToolError("The given output INFO ids contain duplicates!")
        unique_output_ids = set(all_out_ids)

        # per annotation file: header lines + index
        id_column_indices = []
        annotation_header_lines = []
        sources = []
        for i, path in enumerate(ann_files):
            if not path.lower().endswith(".vcf.gz"):
                raise ToolError(f"File extension of input file '{path}' is not in VCF.GZ!")
            id_idx = -1 if not id_col_names[i] else 2
            id_column_indices.append(id_idx)
            wanted = list(info_id_list[i])
            header_lines = []
            for raw in _read_lines(path):
                line = raw.rstrip(b"\r")
                if not line.strip():
                    continue
                if not line.startswith(b"#"):
                    break
                if line.startswith(b"##INFO=<ID="):
                    id_value = _get_info_header_value(line, b"ID")
                    if id_value in wanted:
                        header_lines.append(line)
                        wanted = [w for w in wanted if w != id_value]
            if wanted:
                if allow_missing[i]:
                    for w in wanted:
                        header_lines.append(b"##INFO=<ID=" + w
                                            + b',Number=.,Type=String,Description="">')
                else:
                    raise ToolError('INFO key(s) "' + b", ".join(wanted).decode()
                                    + '" not found in source file "' + path + '"!')
            if id_col_names[i] and id_idx != -1:
                header_lines.append(b"##INFO=<ID=" + id_col_names[i]
                                    + b',Number=.,Type=String,Description="ID column">')
            fname = os.path.basename(path).encode()
            header_lines = [_modify_info_header_value(
                l, b"Description", b" (from file " + fname + b")", extend=True)
                for l in header_lines]
            # rename INFO ids
            for j in range(len(info_id_list[i])):
                if info_id_list[i][j] != out_info_id_list[i][j]:
                    start_tag = b"##INFO=<ID=" + info_id_list[i][j]
                    for h in range(len(header_lines)):
                        if header_lines[h].startswith(start_tag):
                            header_lines[h] = header_lines[h].replace(
                                start_tag, b"##INFO=<ID=" + out_info_id_list[i][j])
            if len(header_lines) > len(info_id_list[i]) and prefixes[i]:
                header_lines[-1] = header_lines[-1].replace(
                    b"##INFO=<ID=" + id_col_names[i],
                    b"##INFO=<ID=" + prefixes[i] + b"_" + id_col_names[i])
            if exist_only[i]:
                header_lines.append(b"##INFO=<ID=" + exist_names[i]
                                    + b',Number=0,Type=Flag,Description="Variant is '
                                    + b"present in annotation file '" + fname + b"'\">")
            annotation_header_lines.extend(header_lines)
            sources.append(_SourceIndex(path))

        st = _AnnotateState()
        st.sources = sources
        st.n = len(ann_files)
        st.exist_only = exist_only
        st.exist_names = exist_names
        st.id_column_indices = id_column_indices
        st.info_id_list = info_id_list
        st.out_info_id_list = out_info_id_list
        st.out_id_col_names = out_id_col_names

        out_lines = []
        body = []
        for raw in _read_lines(in_):
            line = raw.rstrip(b"\r")
            if not line.strip():
                continue
            if line.startswith(b"#"):
                if line.startswith(b"##INFO=<"):
                    id_value = _get_info_header_value(line, b"ID")
                    if id_value in unique_output_ids:
                        raise ToolError("INFO name '" + id_value.decode()
                                        + "' already exists in input file: " + line.decode())
                if line.startswith(b"#CHROM"):
                    out_lines.extend(l + b"\n" for l in annotation_header_lines)
                out_lines.append(line + b"\n")
                continue
            body.append(line)

        # ordered chunk parallelism (reference: N ChunkProcessor threads):
        # fork workers inherit the sources read-only when jax is unloaded,
        # thread pool otherwise (utils/chunkpool.py)
        from ..utils.chunkpool import process_chunks
        out_lines.extend(process_chunks(
            body, _annotate_chunk_st, st,
            self.get_int("threads"), self.get_int("block_size")))

        _write(out, out_lines)


TOOLS["VcfAnnotateFromVcf"] = VcfAnnotateFromVcfTool
