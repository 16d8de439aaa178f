"""TSV utility tools (TsvInfo/TsvSlice/TsvFilter/TsvMerge/TsvAnnotate).

Behavioral reference: ngs-bits src/Tsv*/main.cpp.
"""

from __future__ import annotations

import math
import os
import sys

from ngsbits_tpu.utils.stdio import stdout_binary

from ..io.tsv import TsvFile, write_tsv
from .toolbase import ToolBase, ToolError


def _is_valid_float(s: bytes) -> bool:
    try:
        v = float(s)
    except (ValueError, TypeError):
        return False
    return not (math.isnan(v) or math.isinf(v))


def _write_text(tool, lines, out_key="out"):
    text = "".join(l + "\n" for l in lines)
    out = tool.get(out_key)
    if out:
        with open(out, "w") as fh:
            fh.write(text)
    else:
        sys.stdout.write(text)


class TsvInfoTool(ToolBase):
    name = "TsvInfo"
    description = "Prints general information about a TSV file."

    def setup(self):
        self.add_infile("in", "Input TSV file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output file. If unset, writes to STDOUT.", optional=True)

    def main(self):
        in_path = self.get("in")
        t = TsvFile.from_file(in_path)
        ncols = len(t.header)
        numeric = [True] * ncols
        for row in t.rows:
            for i in range(ncols):
                if numeric[i]:
                    numeric[i] = i < len(row) and _is_valid_float(row[i])
        lines = [f"File   : {os.path.basename(in_path or '')}",
                 f"Columns: {ncols}",
                 f"Rows   : {len(t.rows)}",
                 "",
                 "Column details:"]
        for i in range(ncols):
            suffix = " (N)" if numeric[i] else ""
            lines.append(f"{str(i).rjust(2)}: {t.header[i].decode()}{suffix}")
        _write_text(self, lines)


class TsvSliceTool(ToolBase):
    name = "TsvSlice"
    description = "Extracts/reorders columns of a TSV file."

    def setup(self):
        self.add_string("cols", "Comma-separated list of column names to extract.")
        self.add_infile("in", "Input TSV file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output file. If unset, writes to STDOUT.", optional=True)
        self.add_flag("numeric", "If set, column names are interpreted as 1-based column numbers.")
        self.add_flag("rm", "If set, the columns given in 'cols' are removed instead of extracted.")

    def main(self):
        t = TsvFile.from_file(self.get("in"))
        cols = t.check_columns([c.encode() for c in self.get("cols").split(",")],
                               self.get_flag("numeric"))
        if self.get_flag("rm"):
            old = set(cols)
            cols = [c for c in range(len(t.header)) if c not in old]
        header = [t.header[c] for c in cols]
        rows = [[r[c] for c in cols] for r in t.rows]
        write_tsv(self.get("out"), t.comments, header, rows)


class TsvFilterTool(ToolBase):
    name = "TsvFilter"
    description = "Filters the rows of a TSV file according to the value of a specific column."

    OPS = [">", ">=", "=", "<=", "<", "is", "contains"]

    def setup(self):
        self.add_string("filter", "Filter string with column name, operation and value,e.g. 'depth > 17'.\nValid operations are '" + "','".join(self.OPS) + "'.")
        self.add_infile("in", "Input TSV file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output TSV file. If unset, writes to STDOUT.", optional=True)
        self.add_flag("numeric", "If set, column name is interpreted as a 1-based column number.")
        self.add_flag("v", "Invert filter.")

    def main(self):
        t = TsvFile.from_file(self.get("in"))
        invert = self.get_flag("v")
        parts = self.get("filter").split(" ")
        if len(parts) < 3:
            raise ToolError(f"Could not split filter '{self.get('filter')}' in three or more parts (by space)!")
        while len(parts) > 3:
            parts[-2] += " " + parts[-1]
            parts.pop()
        cols = t.check_columns([parts[0].encode()], self.get_flag("numeric"))
        col = cols[0]
        op = parts[1]
        if op not in self.OPS:
            raise ToolError(f"Invalid operation '{op}'!")
        op_index = self.OPS.index(op)
        value = parts[2]
        value_num = 0.0
        if op_index < 5:
            try:
                value_num = float(value)
            except ValueError:
                raise ToolError(f"Non-numeric filter value '{value}' for numeric filter operation '{op} given!")

        rows = []
        for r in t.rows:
            v2 = r[col]
            if op_index < 5:
                try:
                    v2n = float(v2)
                except ValueError:
                    continue
                match = ((op == ">" and v2n > value_num) or (op == ">=" and v2n >= value_num)
                         or (op == "=" and v2n == value_num) or (op == "<=" and v2n <= value_num)
                         or (op == "<" and v2n < value_num))
            elif op == "is":
                match = v2.decode() == value
            else:
                match = value.encode() in v2
            if match != invert:
                rows.append(r)
        write_tsv(self.get("out"), t.comments, t.header, rows)


class TsvMergeTool(ToolBase):
    name = "TsvMerge"
    description = "Merges TSV file based on a list of columns."

    def setup(self):
        self.add_infile_list("in", "Input TSV files that are merged. If only one file is given, each line in this file is interpreted as an input file path.")
        self.add_string("cols", "Comma-separated list of column names used as key for merging.")
        self.add_outfile("out", "Output file. If unset, writes to STDOUT.", optional=True)
        self.add_flag("numeric", "If set, column names are interpreted as 1-based column numbers.")
        self.add_string("mv", "Missing value, i.e. value that is inserted when key is missing in a file.", optional=True, default="")
        self.add_flag("simple", "Fast and memory-efficient mode for merging files that have the same keys in the same order.")

    def main(self):
        in_files = self.get_infile_list("in")
        if len(in_files) == 1:
            with open(in_files[0]) as fh:
                in_files = [l.strip() for l in fh if l.strip() and not l.startswith("#")]
        key_cols = [c.encode() for c in self.get("cols").split(",")]
        mv = self.get("mv").encode()
        files = [TsvFile.from_file(f) for f in in_files]

        key_idx = [f.check_columns(key_cols, self.get_flag("numeric")) for f in files]
        # merged header: key cols + non-key cols of each file. With -numeric
        # the key header names come from the first file, not the indices
        # (pinned by TsvMerge_out1.tsv).
        header = [files[0].header[i] for i in key_idx[0]]
        comments = []
        for f, ki in zip(files, key_idx):
            comments.extend(f.comments)
            for i, h in enumerate(f.header):
                if i not in ki:
                    header.append(h)
        if self.get_flag("simple"):
            # -simple: positional merge requiring identical keys in identical
            # order in every file (TsvMerge simple mode) — no hash join
            n = len(files[0].rows)
            for fi, (f, ki) in enumerate(zip(files, key_idx)):
                if len(f.rows) != n:
                    raise ToolError("Input files differ in row count "
                                    "('simple' mode requires the same keys in "
                                    "the same order)!")
            rows = []
            for r_i in range(n):
                key = tuple(files[0].rows[r_i][i] for i in key_idx[0])
                row = list(key)
                for fi, (f, ki) in enumerate(zip(files, key_idx)):
                    this_key = tuple(f.rows[r_i][i] for i in ki)
                    if this_key != key:
                        raise ToolError(
                            "Keys differ between input files in line "
                            f"{r_i + 1} ('simple' mode requires the same keys "
                            "in the same order)!")
                    row.extend(f.rows[r_i][i] for i in range(len(f.header))
                               if i not in ki)
                rows.append(row)
            write_tsv(self.get("out"), comments, header, rows)
            return
        # build key -> row values
        order = []
        data: dict = {}
        for fi, (f, ki) in enumerate(zip(files, key_idx)):
            nonkey = [i for i in range(len(f.header)) if i not in ki]
            for r in f.rows:
                key = tuple(r[i] for i in ki)
                if key not in data:
                    data[key] = [None] * len(files)
                    order.append(key)
                data[key][fi] = [r[i] for i in nonkey]
        rows = []
        for key in order:
            row = list(key)
            for fi, f in enumerate(files):
                nonkey_n = len(f.header) - len(key_idx[fi])
                vals = data[key][fi]
                row.extend(vals if vals is not None else [mv] * nonkey_n)
            rows.append(row)
        write_tsv(self.get("out"), comments, header, rows)


class TsvAnnotateTool(ToolBase):
    """Behavioral reference: ngs-bits src/TsvAnnotate/main.cpp."""

    name = "TsvAnnotate"
    description = "Extends TSV file by appending columns from a second TSV file."

    def setup(self):
        self.add_infile("in2", "Input TSV files that is used as source of annotated columns.")
        self.add_string("c1", "Column in 'in1' that is used for matching lines between files.")
        self.add_string("anno", "Comma-separated column list from 'in2' that is appended to 'in1'. Order matters.")
        self.add_infile("in1", "Input TSV files that is annoated. If unset, reads from STDIN.", optional=True)
        self.add_string("c2", "Column in 'in2' that is used for matching lines between files. If unset, the value of 'c1' is used.", optional=True)
        self.add_outfile("out", "Output file. If unset, writes to STDOUT.", optional=True)
        self.add_string("mv", "Missing value, i.e. value that is used when data is missing in 'in2'.", optional=True, default="")

    def main(self):
        anno = [a.encode() for a in self.get("anno").split(",")]
        missing_value = b"\t".join([self.get("mv").encode()] * len(anno))
        c1 = self.get("c1").encode()
        c2 = (self.get("c2") or "").encode() or c1

        in2 = TsvFile.from_file(self.get("in2"))
        c2_index = in2.column_index(c2)
        anno_indices = [in2.column_index(col) for col in anno]
        in2_data: dict[bytes, bytes] = {}
        for row in in2.rows:
            key = row[c2_index]
            value = b"\t".join(row[i] for i in anno_indices)
            if key in in2_data and in2_data[key] != value:
                raise ToolError(f"Key '{key.decode()}' found several times in "
                                f"'in2' and data in 'anno' columns differs!")
            in2_data[key] = value

        in1 = TsvFile.from_file(self.get("in1") or "")
        c1_index = in1.column_index(c1)
        lines = [c.decode() for c in in1.comments]
        lines.append("#" + "\t".join(h.decode() for h in in1.header)
                     + "\t" + "\t".join(a.decode() for a in anno))
        for row in in1.rows:
            key = row[c1_index]
            lines.append(b"\t".join(row).decode() + "\t"
                         + in2_data.get(key, missing_value).decode())
        _write_text(self, lines)


class TsvToTool(ToolBase):
    """Behavioral reference: ngs-bits src/TsvTo/main.cpp."""

    name = "TsvTo"
    description = "Converts TSV file to different table formats."
    extended_description = ["Comment lines are not written to the output."]

    def setup(self):
        self.add_enum("format", "Output format.", valid=("txt", "md", "html"))
        self.add_infile("in", "Input TSV file. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output file. If unset, writes to STDOUT.", optional=True)

    def main(self):
        f = TsvFile.from_file(self.get("in") or "")
        fmt = self.get_enum("format")
        headers = f.header
        ncols = len(headers)

        def cell(parts, i, pad=False):
            v = parts[i] if i < len(parts) else b""
            if fmt == "html":
                v = (v.replace(b"&", b"&amp;").replace(b"<", b"&lt;")
                     .replace(b">", b"&gt;").replace(b'"', b"&quot;"))
            elif fmt == "md":
                v = v.replace(b"|", b"\\|")
            if pad:
                v = v.ljust(col_size[i])
            return v

        col_size = {}
        if fmt in ("txt", "md"):
            for i in range(ncols):
                col_size[i] = len(cell(headers, i))
            for row in f.rows:
                for i in range(ncols):
                    col_size[i] = max(col_size[i], len(cell(row, i)))

        out = []
        indent = 0

        def w(text, newline=False):
            if indent > 0:
                out.append(b" " * indent)
            out.append(text)
            if newline:
                out.append(b"\n")

        if fmt == "html":
            w(b"<html>", True)
            indent += 2
            w(b"<head>", True)
            indent += 2
            w(b"<style>", True)
            indent += 2
            w(b"table { border-collapse: collapse; width: auto; border: 1px solid #444; }", True)
            w(b"table td { border: 1px solid #444; padding: 2px; }", True)
            w(b"table th { border: 1px solid #444; text-align: left; padding: 2px; background: #ccc; font-weight: 600; }", True)
            w(b"table tr:nth-child(even) td { background: #f3f3f3; }", True)
            w(b"table tr:hover td { background: #d0d7df; }", True)
            indent -= 2
            w(b"</style>", True)
            indent -= 2
            w(b"</head>", True)
            w(b"<body>", True)
            indent += 2
            w(b"<table>", True)
            indent += 2

        if headers:
            if fmt == "html":
                w(b"<tr>", True)
                indent += 2
                for i in range(ncols):
                    w(b"<th>" + cell(headers, i) + b"</th>", True)
                indent -= 2
                w(b"</tr>", True)
            elif fmt == "txt":
                for i in range(ncols):
                    if i != 0:
                        w(b" ")
                    w(cell(headers, i, True))
                w(b"\n")
                for i in range(ncols):
                    if i != 0:
                        w(b" ")
                    w(b"-" * col_size[i])
                w(b"\n")
            else:
                for i in range(ncols):
                    w(b"|")
                    w(cell(headers, i, True))
                w(b"|\n")
                for i in range(ncols):
                    w(b"|")
                    w(b"-" * col_size[i])
                w(b"|\n")

        for row in f.rows:
            if fmt == "html":
                w(b"<tr>", True)
                indent += 2
                for i in range(ncols):
                    w(b"<td>" + cell(row, i) + b"</td>", True)
                indent -= 2
                w(b"</tr>", True)
            elif fmt == "txt":
                for i in range(ncols):
                    if i != 0:
                        w(b" ")
                    w(cell(row, i, True))
                w(b"\n")
            else:
                for i in range(ncols):
                    w(b"|")
                    w(cell(row, i, True))
                w(b"|\n")

        if fmt == "html":
            indent -= 2
            w(b"</table>", True)
            indent -= 2
            w(b"</body>", True)
            indent -= 2
            w(b"</html>", True)

        data = b"".join(out)
        path = self.get("out")
        if path:
            with open(path, "wb") as fh:
                fh.write(data)
        else:
            stdout_binary().write(data)


class TsvDiffTool(ToolBase):
    """Behavioral reference: ngs-bits src/TsvDiff/main.cpp (LCS diff over
    retained columns; tie directions read back as TOP in backtracking)."""

    name = "TsvDiff"
    description = "Compares TSV files."

    def setup(self):
        self.add_infile("in1", "First input TSV file.")
        self.add_infile("in2", "Second input TSV file.")
        self.add_outfile("out", "Output file with differences. If unset, writes to stdout.", optional=True)
        self.add_flag("skip_comments", "Do not compare comment lines starting with '##'.")
        self.add_string("skip_comments_matching", "Comma-separated list of sub-strings for skipping comment lines (case-sensitive matching).", optional=True)
        self.add_string("skip_cols", "Comma-separated list of colums to skip during line comparison.", optional=True)
        self.add_string("comp", "Comma-separated list of columns to use for comparison (all other columns are ignored).", optional=True)
        self.add_string("diff_abs", "Comma-separated list of column=difference tuples for defining maximum allowed numeric difference of columns.", optional=True)
        self.add_flag("no_error", "Do not exit with error state if differences are detected.")
        self.add_int("debug", "Debug level (0=none, 1=basic, 2=extended", optional=True, default=0)

    @staticmethod
    def _lcs_diff(lines1, lines2, eq, out, summary):
        n, m = len(lines1), len(lines2)
        if n == 0 and m == 0:
            return
        if n > 0 and m == 0:
            for l in lines1:
                out.append(b"-" + b"\t".join(l))
            return
        if n == 0 and m > 0:
            for l in lines2:
                out.append(b"+" + b"\t".join(l))
            return

        # LCS DP; directions: 0=diagonal, 1=left, 2=top (ties read as TOP)
        D = [bytearray(m + 1) for _ in range(n + 1)]
        before = [0] * (m + 1)
        current = [0] * (m + 1)
        for i in range(1, n + 1):
            row = D[i]
            a = lines1[i - 1]
            for j in range(1, m + 1):
                if eq(a, lines2[j - 1]):
                    current[j] = before[j - 1] + 1
                    row[j] = 0
                else:
                    left = current[j - 1]
                    top = before[j]
                    if left > top:
                        current[j] = left
                        row[j] = 1
                    else:  # ties behave as TOP (DirectionVector::get order)
                        current[j] = top
                        row[j] = 2
            before, current = current, before
            current = [0] * (m + 1)

        matches = []
        i = n
        j = m
        while j > 0 and i > 0:
            d = D[i][j]
            if d == 1:
                j -= 1
                continue
            if d == 2:
                i -= 1
                continue
            matches.insert(0, (i - 1, j - 1))
            i -= 1
            j -= 1

        if not matches:
            for l in lines1:
                out.append(b"-" + b"\t".join(l))
                summary[1] += 1
            for l in lines2:
                out.append(b"+" + b"\t".join(l))
                summary[0] += 1
            return

        def emit(rm_range, add_range):
            for i2 in rm_range:
                out.append(b"-" + b"\t".join(lines1[i2]))
                summary[1] += 1
            for i2 in add_range:
                out.append(b"+" + b"\t".join(lines2[i2]))
                summary[0] += 1

        emit(range(0, matches[0][0]), range(0, matches[0][1]))
        for k in range(1, len(matches)):
            emit(range(matches[k - 1][0] + 1, matches[k][0]),
                 range(matches[k - 1][1] + 1, matches[k][1]))
        emit(range(matches[-1][0] + 1, len(lines1)),
             range(matches[-1][1] + 1, len(lines2)))

    def main(self):
        skip_comments = self.get_flag("skip_comments")
        skip_matching = [s for s in (self.get("skip_comments_matching") or "").split(",") if s]
        skip_cols = {s for s in (self.get("skip_cols") or "").split(",") if s}
        no_error = self.get_flag("no_error")

        in1 = TsvFile.from_file(self.get("in1"))
        in2 = TsvFile.from_file(self.get("in2"))

        comp_cols = {s for s in (self.get("comp") or "").split(",") if s}
        if not comp_cols:
            comp_cols = {h.decode() for h in in1.header} | {h.decode() for h in in2.header}
        comp_cols -= skip_cols

        def restrict(f):
            keep = [i for i, h in enumerate(f.header) if h.decode() in comp_cols]
            headers = [f.header[i] for i in keep]
            rows = [[r[i] if i < len(r) else b"" for i in keep] for r in f.rows]
            return headers, rows

        if comp_cols:
            h1, rows1 = restrict(in1)
            h2, rows2 = restrict(in2)
        else:
            h1, rows1 = in1.header, in1.rows
            h2, rows2 = in2.header, in2.rows

        if h1 != h2:
            raise ToolError("Cannot compare files with differing columns!\nin1: "
                            + ", ".join(h.decode() for h in h1) + "\nin2: "
                            + ", ".join(h.decode() for h in h2))

        diff_abs = {}
        for entry in [s for s in (self.get("diff_abs") or "").split(",") if s]:
            parts = entry.split("=")
            if len(parts) != 2 or not _is_valid_float(parts[1].encode()):
                raise ToolError(f"Absolute column difference entry '{entry}' not valid!")
            try:
                ci = h1.index(parts[0].encode())
            except ValueError:
                raise ToolError(f"Could not find column '{parts[0]}'!")
            diff_abs[ci] = float(parts[1])

        def rows_eq(a, b):
            for i in range(len(a)):
                if a[i] == b[i]:
                    continue
                if i in diff_abs:
                    try:
                        if abs(float(a[i]) - float(b[i])) > diff_abs[i]:
                            return False
                    except ValueError:
                        return False
                else:
                    return False
            return True

        out_lines: list[bytes] = []
        summary_comments = [0, 0]  # added, removed
        summary_content = [0, 0]
        if not skip_comments:
            c1 = [c for c in in1.comments
                  if not any(s in c.decode() for s in skip_matching)]
            c2 = [c for c in in2.comments
                  if not any(s in c.decode() for s in skip_matching)]
            self._lcs_diff([[c] for c in c1], [[c] for c in c2],
                           lambda a, b: a == b, out_lines, summary_comments)
        self._lcs_diff(rows1, rows2, rows_eq, out_lines, summary_content)

        has_diff = sum(summary_comments) + sum(summary_content) > 0
        if has_diff:
            out_lines.append(b"Difference summary:")
            if summary_comments[0]:
                out_lines.append(b"comment lines added: " + str(summary_comments[0]).encode())
            if summary_comments[1]:
                out_lines.append(b"comment lines removed: " + str(summary_comments[1]).encode())
            if summary_content[0]:
                out_lines.append(b"content lines added: " + str(summary_content[0]).encode())
            if summary_content[1]:
                out_lines.append(b"content lines removed: " + str(summary_content[1]).encode())

        data = b"".join(l + b"\n" for l in out_lines)
        out = self.get("out")
        if out:
            with open(out, "wb") as fh:
                fh.write(data)
        else:
            stdout_binary().write(data)

        if has_diff and not no_error:
            raise SystemExit(1)


TOOLS = {
    "TsvInfo": TsvInfoTool,
    "TsvTo": TsvToTool,
    "TsvDiff": TsvDiffTool,
    "TsvSlice": TsvSliceTool,
    "TsvFilter": TsvFilterTool,
    "TsvMerge": TsvMergeTool,
    "TsvAnnotate": TsvAnnotateTool,
}
