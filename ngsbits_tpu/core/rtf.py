"""RTF report document writer.

Behavioral reference: ngs-bits cppNGS/RtfDocument.{h,cpp} (header/footer
layout RtfDocument.cpp:105-154, text/paragraph control words :44-91, table
row/cell emission :278-374, umlaut escaping :156-169). Emits the same RTF
control-word stream so downstream report generators (somatic report RTF,
GSvar report tabs) produce equivalent documents.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass
class RtfColor:
    red: int
    green: int
    blue: int


def escape_umlauts(text: bytes) -> bytes:
    """RtfDocument::escapeUmlauts (RtfDocument.cpp:156-169)."""
    for lit, esc in ((b"\xc3\x9f", b"\\u223;"), (b"\xc3\xa4", b"\\u228;"),
                     (b"\xc3\xb6", b"\\u246;"), (b"\xc3\xbc", b"\\u252;"),
                     (b"\xc3\x84", b"\\u196;"), (b"\xc3\x96", b"\\u214;"),
                     (b"\xc3\x9c", b"\\u220;"), (b">", b"\\u62;"),
                     (b"\xe2\x96\xa1", b"\\u9633;")):
        text = text.replace(lit, esc)
    return text


def cm2twip(cm: float) -> float:
    """RtfDocument::cm2twip (RtfDocument.cpp:171-174)."""
    return 566.929133858264 * cm


class RtfPicture:
    """PNG picture element (RtfDocument.cpp:19-42)."""

    def __init__(self, png_data: bytes = b"", width: int = 0, height: int = 0):
        self.png_data = png_data
        self.width = width
        self.height = height

    def resize_to_width(self, new_width: int):
        ratio = new_width / self.width
        self.width = new_width
        self.height = int(self.height * ratio)

    def rtf_code(self) -> bytes:
        out = [b"{", b"\\pict", b"\\pngblip"]
        if self.width > 0:
            out.append(b"\\picwgoal%d" % self.width)
        if self.height > 0:
            out.append(b"\\pichgoal%d" % self.height)
        hexed = self.png_data.hex().encode()
        out.append(b"\n".join(hexed[p:p + 128] for p in range(0, len(hexed), 128)))
        out.append(b"}")
        return b"\n".join(out)


@dataclass
class RtfText:
    """Formatted text run (RtfDocument.cpp:44-64). Setters chain."""

    content: bytes = b""
    font_size: int = 18
    bold: bool = False
    italic: bool = False
    underline: bool = False
    horizontal_alignment: bytes = b"l"
    font_number: int = 0
    font_color: int = 0
    highlight_color: int = 0

    def append(self, content: bytes, new_line: bool = False) -> "RtfText":
        if new_line:
            self.content += b"\n\\line\n" + content
        else:
            self.content += content
        return self

    def set_content(self, content) -> "RtfText":
        if isinstance(content, (list, tuple)):
            self.content = b"\n\\line\n".join(content)
        else:
            self.content = content
        return self

    def set_font_size(self, v: int) -> "RtfText":
        self.font_size = v
        return self

    def set_bold(self, v: bool) -> "RtfText":
        self.bold = v
        return self

    def set_italic(self, v: bool) -> "RtfText":
        self.italic = v
        return self

    def set_underline(self, v: bool) -> "RtfText":
        self.underline = v
        return self

    def highlight(self, color_number: int) -> "RtfText":
        self.highlight_color = color_number
        return self

    def set_font_color(self, color_number: int) -> "RtfText":
        self.font_color = color_number
        return self

    def set_horizontal_alignment(self, alignment: bytes) -> "RtfText":
        if alignment in (b"c", b"l", b"r", b"j"):
            self.horizontal_alignment = alignment
        return self

    def _text_code(self) -> bytes:
        out = [b"\\q" + self.horizontal_alignment, b"{",
               b"\\fs%d" % self.font_size]
        if self.font_number > 0:
            out.append(b"\\f%d" % self.font_number)
        if self.font_color > 0:
            out.append(b"\\cf%d" % self.font_color)
        if self.bold:
            out.append(b"\\b")
        if self.italic:
            out.append(b"\\i")
        if self.underline:
            out.append(b"\\ul")
        if self.highlight_color != 0:
            out.append(b"\\highlight%d" % self.highlight_color)
        out.append(escape_umlauts(self.content))
        out.append(b"}")
        return b"\n".join(out)

    def rtf_code(self) -> bytes:
        return self._text_code()


@dataclass
class RtfParagraph(RtfText):
    """Paragraph with spacing/indent layout (RtfDocument.cpp:67-91)."""

    part_of_a_cell: bool = False
    space_before: int = 30
    space_after: int = 30
    indent_block_left: int = 30
    indent_block_right: int = 30
    indent_first_line: int = 0
    line_spacing: int = 0

    def set_part_of_a_cell(self, v: bool) -> "RtfParagraph":
        self.part_of_a_cell = v
        return self

    def set_indent(self, left: int, right: int, first_line: int) -> "RtfParagraph":
        self.indent_block_left = left
        self.indent_block_right = right
        self.indent_first_line = first_line
        return self

    def set_space_before(self, v: int) -> "RtfParagraph":
        self.space_before = v
        return self

    def set_space_after(self, v: int) -> "RtfParagraph":
        self.space_after = v
        return self

    def set_line_spacing(self, v: int) -> "RtfParagraph":
        self.line_spacing = v
        return self

    def rtf_code(self) -> bytes:
        out = [b"\\pard"]
        if self.part_of_a_cell:
            out.append(b"\\q" + self.horizontal_alignment)
        if self.space_after != 0:
            out.append(b"\\sa%d" % self.space_after)
        if self.space_before != 0:
            out.append(b"\\sb%d" % self.space_before)
        if self.indent_block_left != 0:
            out.append(b"\\li%d" % self.indent_block_left)
        if self.indent_block_right != 0:
            out.append(b"\\ri%d" % self.indent_block_right)
        if self.indent_first_line != 0:
            out.append(b"\\fi%d" % self.indent_first_line)
        if self.line_spacing != 0:
            out.append(b"\\sl%d\\slmult1" % self.line_spacing)
        out.append(self._text_code())
        if not self.part_of_a_cell:
            out.append(b"\\par\n")
        return b"\n".join(out)


class RtfTableCell:
    """Table cell (RtfDocument.cpp:201-216, 278-287)."""

    def __init__(self, width: int, text_format: RtfParagraph | None = None):
        self.paragraph = replace(text_format) if text_format else RtfParagraph()
        self.paragraph.set_part_of_a_cell(True)
        self.width = width
        self.border_left = self.border_right = 0
        self.border_top = self.border_bottom = 0
        self.border_type = b"brdrs"
        self.border_color = 0
        self.background_color = 0
        self.control_word = b""

    def set_border(self, left: int, top: int, right: int, bottom: int,
                   border_type: bytes = b"brdrs"):
        self.border_left, self.border_top = left, top
        self.border_right, self.border_bottom = right, bottom
        self.border_type = border_type

    def set_border_color(self, color: int):
        self.border_color = color

    def set_background_color(self, color: int):
        self.background_color = color

    def format(self) -> RtfParagraph:
        return self.paragraph

    def write_cell(self) -> bytes:
        return b"{\\intbl " + self.paragraph.rtf_code() + b"\\cell}"


class RtfTableRow:
    """Table row (RtfDocument.cpp:290-374)."""

    TABLE_ROW_GAP_HALF = 180

    def __init__(self, cell_contents=None, cell_widths=None,
                 fmt: RtfParagraph | None = None):
        self.cells: list[RtfTableCell] = []
        self.tr_left = 0
        self.padding = 28
        if cell_contents is not None:
            if isinstance(cell_contents, bytes):
                cell_contents, cell_widths = [cell_contents], [cell_widths]
            if len(cell_contents) != len(cell_widths):
                raise ValueError(
                    "Cell_contents and cell_widths don't have the same length")
            for content, width in zip(cell_contents, cell_widths):
                self.add_cell(width, content, fmt)

    def add_cell(self, width: int, content=None, fmt: RtfParagraph | None = None):
        par = replace(fmt) if fmt is not None else RtfParagraph()
        if isinstance(content, (list, tuple)):
            par.set_content(b"\\line\n".join(content))
        elif content is not None:
            par.set_content(content)
        par.set_part_of_a_cell(True)
        self.cells.append(RtfTableCell(width, par))

    def set_borders(self, width: int, border_type: bytes = b"brdrs",
                    color: int = 0) -> "RtfTableRow":
        for cell in self.cells:
            cell.set_border(width, width, width, width, border_type)
            if color:
                cell.set_border_color(color)
        return self

    def set_border_color(self, color: int) -> "RtfTableRow":
        for cell in self.cells:
            cell.set_border_color(color)
        return self

    def set_background_color(self, color: int) -> "RtfTableRow":
        for cell in self.cells:
            cell.set_background_color(color)
        return self

    def last(self) -> RtfTableCell:
        return self.cells[-1]

    def set_header(self) -> "RtfTableRow":
        """RtfTableRow::setHeader (RtfDocument.h:450-456) — repeat row on
        every page via the 'trhdr' control word."""
        for cell in self.cells:
            cell.control_word = b"trhdr"
        return self

    def set_padding(self, padding: int) -> "RtfTableRow":
        self.padding = padding
        return self

    def __getitem__(self, i: int) -> RtfTableCell:
        return self.cells[i]

    def __len__(self) -> int:
        return len(self.cells)

    def write_row_header(self) -> bytes:
        out = b"\\trowd\\trgraph%d" % self.TABLE_ROW_GAP_HALF
        if self.tr_left > 0:
            out += b"\\trleft%d" % self.tr_left
        if self.padding > 0:
            p = b"%d" % self.padding
            out += (b"\\trpaddb" + p + b"\\trpaddl" + p
                    + b"\\trpaddr" + p + b"\\trpaddt" + p)
        right_cell_offset = self.tr_left
        for cell in self.cells:
            right_cell_offset += cell.width
            border = b"\\" + cell.border_type
            if cell.border_color != 0:
                border += b"\\brdrcf%d" % cell.border_color
            if cell.border_top != 0:
                out += b"\\clbrdrt\\brdrw%d" % cell.border_top + border
            if cell.border_bottom != 0:
                out += b"\\clbrdrb\\brdrw%d" % cell.border_bottom + border
            if cell.border_left != 0:
                out += b"\\clbrdrl\\brdrw%d" % cell.border_left + border
            if cell.border_right != 0:
                out += b"\\clbrdrr\\brdrw%d" % cell.border_right + border
            if cell.background_color != 0:
                out += b"\\clcbpat%d" % cell.background_color
            if cell.control_word:
                out += b"\\" + cell.control_word
            out += b"\\cellx%d" % right_cell_offset
        return out + b"\n"

    def write_row(self) -> bytes:
        out = [self.write_row_header()]
        out.extend(cell.write_cell() for cell in self.cells)
        out.append(b"\\row")
        return b"\n".join(out)


class RtfTable:
    """Table = list of rows (RtfDocument.cpp:376-449)."""

    def __init__(self, contents=None, widths=None, fmt: RtfParagraph | None = None):
        self.rows: list[RtfTableRow] = []
        if contents is not None:
            for row_contents, row_widths in zip(contents, widths):
                self.rows.append(RtfTableRow(row_contents, row_widths, fmt))

    def add_row(self, row: RtfTableRow) -> "RtfTable":
        self.rows.append(row)
        return self

    def prepend_row(self, row: RtfTableRow) -> "RtfTable":
        self.rows.insert(0, row)
        return self

    def first(self) -> RtfTableRow:
        return self.rows[0]

    def last(self) -> RtfTableRow:
        return self.rows[-1]

    def remove_row(self, i: int):
        del self.rows[i]

    def add_titel_row(self, headers, widths, fontsize: int = 18) -> "RtfTable":
        """RtfTable::addTitelRow (RtfDocument.h:539-542)."""
        self.rows.append(RtfTableRow(headers, widths, RtfParagraph()
                         .set_font_size(fontsize).set_bold(True)
                         .set_horizontal_alignment(b"c")).set_background_color(4))
        return self

    def add_header_row(self, headers, widths, fontsize: int = 16) -> "RtfTable":
        self.rows.append(RtfTableRow(headers, widths, RtfParagraph()
                         .set_font_size(fontsize).set_bold(True)
                         .set_horizontal_alignment(b"c")))
        return self

    def add_data_row(self, headers, widths, fontsize: int = 16) -> "RtfTable":
        self.rows.append(RtfTableRow(headers, widths,
                                     RtfParagraph().set_font_size(fontsize)))
        return self

    def __getitem__(self, i: int) -> RtfTableRow:
        return self.rows[i]

    def __len__(self) -> int:
        return len(self.rows)

    def rtf_code(self) -> bytes:
        if not self.rows:
            return b"\n"
        return b"\n".join(row.write_row() for row in self.rows)

    def set_unique_border(self, border: int, border_type: bytes = b"brdrs",
                          border_color: int = 0) -> "RtfTable":
        for row in self.rows:
            row.set_borders(border, border_type)
            if border_color != 0:
                row.set_border_color(border_color)
        return self

    def set_unique_font_size(self, font_size: int) -> "RtfTable":
        for row in self.rows:
            for cell in row.cells:
                cell.paragraph.set_font_size(font_size)
        return self

    def sort_by_col(self, i_col: int):
        self.sort_by_cols([i_col])

    def sort_by_cols(self, indices: list[int]):
        self.rows.sort(key=lambda r: tuple(r[i].paragraph.content for i in indices))

    def swap_rows(self, a: int, b: int):
        self.rows[a], self.rows[b] = self.rows[b], self.rows[a]


class RtfDocument:
    """Whole document: header + body parts + footer (RtfDocument.cpp:93-199)."""

    def __init__(self):
        self.width = 11905
        self.height = 15840
        self.margin_top = 1134
        self.margin_bottom = 1134
        self.margin_left = int(cm2twip(2.3))
        self.margin_right = int(cm2twip(1.2))
        self.fonts: list[bytes] = [b"Calibri"]
        self.default_font_size = 18
        self.colors: list[RtfColor] = []
        self.body_parts: list[bytes] = []

    def max_width(self) -> int:
        """RtfDocument::maxWidth (RtfDocument.h:311-314)."""
        return self.width - self.margin_left - self.margin_right

    def new_page(self):
        """RtfDocument::newPage (RtfDocument.h:305-308)."""
        self.body_parts.append(b"\n\\page\n")

    def set_margins(self, left: int, top: int, right: int, bottom: int):
        self.margin_left, self.margin_top = left, top
        self.margin_right, self.margin_bottom = right, bottom

    def set_default_font_size(self, v: int):
        self.default_font_size = v

    def add_color(self, red: int, green: int, blue: int):
        self.colors.append(RtfColor(red, green, blue))

    def add_part(self, part: bytes):
        self.body_parts.append(part)

    def header(self) -> bytes:
        out = [b"{\\rtf\\ansi", b"\\deff0"]
        font_table = b"{\\fonttbl{\\f0 " + self.fonts[0] + b";"
        for i, font in enumerate(self.fonts[1:], start=1):
            font_table += b"\\f%d %s;" % (i + 1, font)
        font_table += b"}}"
        out.append(font_table)
        out.append(b"\\paperw%d" % self.width)
        out.append(b"\\paperh%d" % self.height)
        out.append(b"\\margl%d" % self.margin_left)
        out.append(b"\\margr%d" % self.margin_right)
        out.append(b"\\margt%d" % self.margin_top)
        out.append(b"\\margb%d" % self.margin_bottom)
        if self.colors:
            ct = b"{\\colortbl;"
            for c in self.colors:
                ct += b"\\red%d\\green%d\\blue%d;" % (c.red, c.green, c.blue)
            ct += b"}"
            out.append(ct)
        out.append(b"\\deflang1031\\plain\\fs%d\\widowctrl\\hyphauto"
                   % self.default_font_size)
        return b"\n".join(out)

    def footer(self) -> bytes:
        return b"\n}"

    def to_bytes(self) -> bytes:
        parts = [self.header()]
        parts.extend(p + b"\n" for p in self.body_parts)
        parts.append(self.footer())
        return b"".join(parts)

    def save(self, file_name: str):
        with open(file_name, "wb") as fh:
            fh.write(self.to_bytes())
