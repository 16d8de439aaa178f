"""TSV utility tools (TsvInfo/TsvSlice/TsvFilter/TsvMerge/TsvAnnotate).

Behavioral reference: ngs-bits src/Tsv*/main.cpp.
"""

from __future__ import annotations

import math
import os
import sys

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
        # merged header: key cols + non-key cols of each file
        header = list(key_cols)
        comments = []
        for f, ki in zip(files, key_idx):
            comments.extend(f.comments)
            for i, h in enumerate(f.header):
                if i not in ki:
                    header.append(h)
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


TOOLS = {
    "TsvInfo": TsvInfoTool,
    "TsvSlice": TsvSliceTool,
    "TsvFilter": TsvFilterTool,
    "TsvMerge": TsvMergeTool,
    "TsvAnnotate": TsvAnnotateTool,
}
