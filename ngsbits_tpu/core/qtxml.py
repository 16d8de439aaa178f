"""Qt-compatible XML stream writer.

Produces byte-identical output to Qt's QXmlStreamWriter with
``setAutoFormatting(true)`` (4-space indent), as used by the reference's
report generators (cppNGSD/SomaticXmlReportGenerator.cpp:95-99,
cppNGSD/GermlineReportGenerator.cpp writeXML): elements on their own
indented lines, attribute-only elements self-closed, character data kept
inline with the end tag, attributes escaped incl. '>' and whitespace
character references.
"""

from __future__ import annotations


def escape_attribute(value: str) -> str:
    """Qt writeEscaped with escapeWhitespace=true: &, ", <, > plus
    tab/newline/carriage-return as character references."""
    out = []
    for ch in value:
        if ch == "&":
            out.append("&amp;")
        elif ch == '"':
            out.append("&quot;")
        elif ch == "<":
            out.append("&lt;")
        elif ch == ">":
            out.append("&gt;")
        elif ch == "\t":
            out.append("&#9;")
        elif ch == "\n":
            out.append("&#10;")
        elif ch == "\r":
            out.append("&#13;")
        else:
            out.append(ch)
    return "".join(out)


def escape_text(value: str) -> str:
    """Qt writeEscaped with escapeWhitespace=false: &, <, > (also " per Qt)."""
    return (value.replace("&", "&amp;").replace("<", "&lt;")
                 .replace(">", "&gt;").replace('"', "&quot;"))


class QtXmlStreamWriter:
    """Stream writer mirroring QXmlStreamWriter auto-formatting output."""

    def __init__(self, indent: int = 4):
        self._indent = indent
        self._buf: list[str] = []
        # stack entries: [name, wrote_child_element, wrote_characters]
        self._stack: list[list] = []
        self._tag_open = False

    def start_document(self):
        self._buf.append('<?xml version="1.0" encoding="UTF-8"?>')

    def _close_open_tag(self):
        if self._tag_open:
            self._buf.append(">")
            self._tag_open = False

    def start_element(self, name: str):
        self._close_open_tag()
        if self._stack:
            self._stack[-1][1] = True
        self._buf.append("\n" + " " * (self._indent * len(self._stack)) + "<" + name)
        self._stack.append([name, False, False])
        self._tag_open = True

    def attribute(self, name: str, value) -> None:
        self._buf.append(f' {name}="{escape_attribute(str(value))}"')

    def characters(self, text: str):
        self._close_open_tag()
        if self._stack:
            self._stack[-1][2] = True
        self._buf.append(escape_text(text))

    def end_element(self):
        name, wrote_child, wrote_chars = self._stack.pop()
        if self._tag_open:
            self._buf.append("/>")
            self._tag_open = False
        elif wrote_chars and not wrote_child:
            self._buf.append(f"</{name}>")
        else:
            self._buf.append("\n" + " " * (self._indent * len(self._stack))
                             + f"</{name}>")
        if self._stack:
            self._stack[-1][1] = True

    def end_document(self):
        while self._stack:
            self.end_element()
        self._buf.append("\n")

    def to_string(self) -> str:
        return "".join(self._buf)

    def to_bytes(self) -> bytes:
        return self.to_string().encode("utf-8")
