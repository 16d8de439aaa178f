"""TSV file streaming (cppCORE TSVFileStream semantics).

Leading '##' lines are comments; the last leading '#' line is the header;
data rows are tab-separated with the header's column count.
"""

from __future__ import annotations

import gzip
import sys

from ngsbits_tpu.utils.stdio import stdin_binary, stdout_binary


class TsvFile:
    def __init__(self):
        self.comments: list[bytes] = []
        self.header: list[bytes] = []
        self.rows: list[list[bytes]] = []

    @staticmethod
    def from_file(path: str) -> "TsvFile":
        out = TsvFile()
        if path in ("", "-", None):
            data = stdin_binary().read()
        else:
            with open(path, "rb") as fh:
                data = fh.read()
            if data[:2] == b"\x1f\x8b":
                data = gzip.decompress(data)
        lines = data.split(b"\n")
        i = 0
        header_line = None
        while i < len(lines):
            line = lines[i].rstrip(b"\r")
            if line.startswith(b"##"):
                out.comments.append(line)
                i += 1
            elif line.startswith(b"#"):
                if header_line is not None:
                    out.comments.append(header_line)
                header_line = line
                i += 1
            else:
                break
        if header_line is not None:
            out.header = header_line[1:].split(b"\t")
        first = True
        for raw in lines[i:]:
            line = raw.rstrip(b"\r")
            if not line:
                continue
            if line.startswith(b"##"):
                # mid-file comment lines are skipped (TSVFileStream::readLine
                # semantics; only LEADING ## lines end up in comments())
                continue
            parts = line.split(b"\t")
            if first and header_line is None:
                out.header = [b""] * len(parts)
                first = False
            out.rows.append(parts)
        return out

    def column_index(self, name: bytes) -> int:
        try:
            return self.header.index(name)
        except ValueError:
            raise KeyError(f"Could not find column '{name.decode()}' in TSV header")

    def check_columns(self, cols: list[bytes], numeric: bool) -> list[int]:
        out = []
        for c in cols:
            if numeric:
                idx = int(c) - 1
                if idx < 0 or idx >= len(self.header):
                    raise ValueError(f"1-based column number '{c.decode()}' out of range!")
                out.append(idx)
            else:
                out.append(self.column_index(c))
        return out


def write_tsv(path: str | None, comments, header, rows):
    parts = []
    for c in comments:
        parts.append(c)
    if header is not None:
        parts.append(b"#" + b"\t".join(header))
    for r in rows:
        parts.append(b"\t".join(r))
    data = b"\n".join(parts) + b"\n"
    if path in ("", "-", None):
        stdout_binary().write(data)
    else:
        with open(path, "wb") as fh:
            fh.write(data)
