"""VCF validity checking (the VcfCheck engine).

Behavioral reference: ngs-bits VcfFile::isValid (cppNGS/VcfFile.cpp:896-1355),
parseDefinitionLine (:1378-1466) and checkValues (:1468-1525) — identical
message strings, warning-vs-error severities, and -info output layout
(FILTER/INFO/FORMAT definitions in ID-sorted order, then samples, then the
'Finished' summary). MISO consequence terms are validated against the
embedded sequence-ontology OBO (Resources/so-xp_3_1_0.obo).
"""

from __future__ import annotations

import sys
from ngsbits_tpu.utils.stdio import stdin_binary

import gzip
import re

from ..core.chromosome import Chromosome

# invalid characters in INFO values (VcfFile::INFO_URL_MAPPING minus '%', ','
# plus space — VcfFile.cpp:910-921)
INVALID_INFO_CHARS = ["\t", "\n", "\r", " ", ";", "="]
_ALT_RE = re.compile(rb"^[ACGTN]+$")


class _Definition:
    __slots__ = ("id", "description", "type", "number", "used")

    def __init__(self):
        self.id = b""
        self.description = b""
        self.type = b""
        self.number = b""
        self.used = 0

    def to_string(self) -> bytes:
        out = b"ID=" + self.id + b" (%dx used)" % self.used
        if self.type:
            out += b" Type=" + self.type
        if self.number:
            out += b" Number=" + self.number
        out += b" Description=" + self.description
        return out


import functools


@functools.lru_cache(maxsize=1)
def _miso_terms() -> frozenset:
    """Names of non-obsolete sequence-ontology terms (so-xp_3_1_0.obo,
    loaded with skip-obsolete like VcfFile.cpp:905)."""
    from ..core.ontology import RESOURCE_DIR, OntologyTermCollection
    with gzip.open(RESOURCE_DIR / "so-xp_3_1_0.obo.gz", "rt",
                   encoding="utf-8", errors="replace") as fh:
        coll = OntologyTermCollection.from_obo_text(fh.read())
    return frozenset(t.name for t in coll if not t.obsolete)


class _Out:
    def __init__(self, stream):
        self.stream = stream

    def info(self, message: bytes):
        self.stream.write(message.strip() + b"\n")

    def warning(self, message: bytes, l: int, line: bytes):
        self.stream.write(b"WARNING: " + message.strip()
                          + b" - in line %d:\n" % l + line + b"\n")

    def error(self, message: bytes, l: int, line: bytes):
        self.stream.write(b"ERROR: " + message.strip()
                          + b" - in line %d:\n" % l + line + b"\n")


def _parse_definition_line(out: _Out, l: int, line: bytes) -> _Definition:
    if not line.endswith(b">"):
        out.error(b"Character '>' at end missing!", l, line)
    start = line.find(b"<")
    if start == -1:
        out.error(b"Character '<' at beginning missing!", l, line)
    def_type = line[2:start - 1]
    result = _Definition()
    for entry in line[start + 1:len(line) - 1].split(b","):
        sep = entry.find(b"=")
        if sep == -1:
            result.description += entry
        else:
            name = entry[:sep].strip()
            value = entry[sep + 1:].strip()
            if name == b"ID":
                result.id = value
            elif name == b"Description":
                result.description = value
            elif name == b"Number":
                result.number = value
            elif name == b"Type":
                result.type = value
    if not result.id:
        out.error(b"Entry 'ID' missing!", l, line)
    if not result.description:
        out.error(b"Entry 'Description' missing!", l, line)
    if result.number:
        if def_type not in (b"FORMAT", b"INFO"):
            out.error(def_type + b" definition cannot have a 'Number' entry!", l, line)
        if result.type == b"Flag" and result.number != b"0":
            out.error(def_type + b" definition of 'Flag' has 'Number' value other than '0'", l, line)
        if (result.type != b"Flag" and result.number not in (b".", b"G", b"A", b"R")
                and _to_int(result.number) < 1):
            out.error(def_type + b" definition has invalid 'Number' field ", l, line)
    if result.type:
        if def_type not in (b"FORMAT", b"INFO"):
            out.error(def_type + b" definition cannot have a 'Number' entry!", l, line)
        if result.type not in (b"Integer", b"Float", b"Character", b"String"):
            if result.type != b"Flag" or def_type != b"INFO":
                out.error(def_type + b" definition cannot have a 'Type' entry of '"
                          + result.type + b"'!", l, line)
    return result


def _to_int(value: bytes) -> int:
    try:
        return int(value)
    except ValueError:
        return 0


def _is_int(value: bytes) -> bool:
    try:
        int(value)
        return True
    except ValueError:
        return False


def _is_float(value: bytes) -> bool:
    try:
        float(value)
        return True
    except ValueError:
        return False


def _check_values(definition: _Definition, values: list, alt_count: int,
                  sample: bytes, out: _Out, l: int, line: bytes):
    """checkValues (VcfFile.cpp:1468-1525)."""
    expected = -1
    if definition.number == b"A":
        expected = alt_count
    elif definition.number == b"R":
        expected = alt_count + 1
    elif _to_int(definition.number) > 0:
        expected = _to_int(definition.number)
    if expected != -1 and expected != len(values):
        where = b"INFO" if not sample else b"sample '" + sample + b" / annotation"
        out.warning(b"For " + where + b" '" + definition.id + b"' (number="
                    + definition.number + b"), the number of values is %d"
                    % len(values) + b", but should be %d!" % expected, l, line)
    for value in values:
        valid = True
        if definition.type == b"Integer":
            if value != b".":
                valid = _is_int(value)
        elif definition.type == b"Float":
            if value != b".":
                valid = _is_float(value)
        elif definition.type == b"Character":
            valid = len(value) == 1
        if not valid:
            where = b"INFO" if not sample else b"sample '" + sample + b" / annotation"
            out.warning(b"For " + where + b" '" + definition.id + b"', the value '"
                        + value + b"' is not a '" + definition.type + b"'!", l, line)


def vcf_is_valid(filename: str, ref_file: str, out_stream,
                 print_general_information: bool = False,
                 max_lines: int = 5000, duplicates: bool = False) -> bool:
    """VcfFile::isValid — writes findings to out_stream (binary), returns
    False when an error was found."""
    from .fasta import FastaFileIndex

    out = _Out(out_stream)
    reference = FastaFileIndex(ref_file)
    obo_terms = _miso_terms()

    if filename in ("", "-", None):
        # stdin fallback (VersatileFile(filename, true) in the reference)
        import io as _io
        raw = stdin_binary().read()
        if raw[:2] == b"\x1f\x8b":
            raw = gzip.decompress(raw)

        def opener(_fn, _mode):
            return _io.BytesIO(raw)
    else:
        opener = gzip.open if str(filename).endswith(".gz") else open
    defined_filters: dict[bytes, _Definition] = {}
    defined_formats: dict[bytes, _Definition] = {}
    defined_infos: dict[bytes, _Definition] = {}
    defined_samples: list[bytes] = []
    last_tag = b""
    expected_parts = 8
    in_header = True
    vcf_main_header_found = False
    error_found = False
    c_data = 0
    l = 0
    with opener(filename, "rb") as fh:
        for raw in fh:
            if c_data >= max_lines:
                break
            l += 1
            line = raw.rstrip(b"\r\n").strip()
            if not line:
                continue

            if l == 1:
                if not line.startswith(b"##fileformat=VCFv"):
                    out.error(b"First line must be 'fileformat' line!", l, line)
                    return False
                if print_general_information:
                    out.info(b"VCF version: " + line[17:])

            if line.startswith(b"#"):
                if not in_header:
                    out.error(b"Header lines are not allowed in VCF body!", l, line)
                    return False
                for prefix, store in ((b"##INFO=<", defined_infos),
                                      (b"##FORMAT=<", defined_formats),
                                      (b"##FILTER=<", defined_filters)):
                    if line.startswith(prefix):
                        data = _parse_definition_line(out, l, line)
                        kind = prefix[2:-2]
                        if data.id in store:
                            out.error(kind + b" '" + data.id + b"' defined twice!", l, line)
                            return False
                        store[data.id] = data
                        break
                else:
                    if not line.startswith(b"##"):
                        parts = line.split(b"\t")
                        vcf_main_header_found = True
                        if len(parts) < 8:
                            out.error(b"Header line with less than 8 fields!", l, line)
                            return False
                        if len(parts) == 9:
                            out.error(b"Header line with FORMAT, but without samples!", l, line)
                            return False
                        if len(parts) > 9:
                            defined_samples = parts[9:]
                            expected_parts = 9 + len(defined_samples)
                        in_header = False
                continue

            # ---- data line ----
            if not vcf_main_header_found:
                out.error(b"Main header line missing!", l, line)
                return False
            c_data += 1
            parts = line.split(b"\t")
            if len(parts) < expected_parts:
                out.error(b"Data line with %d" % len(parts)
                          + b" elements, expected %d!" % expected_parts, l, line)
                return False

            chrom = Chromosome(parts[0].decode())
            if ":" in chrom.str:
                out.error(b"Chromosome '" + parts[0] + b"' is not valid!", l, line)
                return False

            try:
                pos = int(parts[1])
                pos_is_valid = True
            except ValueError:
                pos_is_valid = False
                out.error(b"Chromosomal position '" + parts[1] + b"' is not a number!", l, line)
                return False

            ref = parts[3].upper()
            if pos_is_valid:
                if not ref:
                    out.error(b"Reference base(s) not set!", l, line)
                    error_found = True
                else:
                    try:
                        ref_exp = reference.seq(chrom, pos, len(ref)).upper()
                    except Exception:
                        ref_exp = b""
                    if ref != ref_exp:
                        msg = (b"Reference base(s) not correct. Is '" + ref
                               + b"', should be '" + ref_exp + b"'!")
                        if _only_acgt(ref) and _only_acgt(ref_exp):
                            out.error(msg, l, line)
                            error_found = True
                        else:
                            out.warning(msg, l, line)

            alt = parts[4]
            alts = alt.split(b",")
            if len(alts) == 1 and alts[0] == b".":
                out.warning(b"Missing value '.' used as alternative allele!", l, line)
            else:
                for a in alts:
                    if a.startswith(b"<") and a.endswith(b">"):
                        continue
                    if a == b"*":
                        continue
                    if not a or not _ALT_RE.match(a):
                        out.error(b"Invalid alternative allele '" + a + b"'!", l, line)
                        error_found = True

            # first-base agreement for indels (warning only)
            for a in alts:
                if (a.startswith(b"<") and a.endswith(b">")) or a == b"*" or not a:
                    continue
                if (len(a) > 1 or len(ref) > 1) and len(a) != len(ref):
                    if a[:1] != ref[:1]:
                        out.warning(b"First base of insertion/deletion not matching - ref: '"
                                    + ref + b"' alt: '" + a + b"'!", l, line)

            if duplicates:
                tag = (chrom.str.encode() + b":%d " % pos + ref + b">" + alt)
                if tag == last_tag:
                    out.error(b"Variant '" + tag + b"' contained at least twice!", l, line)
                    return False
                last_tag = tag

            qual = parts[5]
            if qual != b"." and not _is_float(qual):
                out.error(b"Invalid quality value '" + qual + b"'!", l, line)
                return False

            filt = parts[6]
            if filt not in (b".", b"PASS"):
                for name in filt.split(b";"):
                    if name not in defined_filters:
                        out.warning(b"FILTER '" + name + b"' used but not defined!", l, line)
                    else:
                        defined_filters[name].used += 1

            info_col = parts[7]
            if not info_col.strip():
                out.error(b"INFO column is empty! Has to contain either INFO values "
                          b"or missing value '.'!", l, line)
                return False
            if info_col != b".":
                for entry in info_col.split(b";"):
                    sep = entry.find(b"=")
                    has_value = sep != -1
                    name = entry[:sep] if has_value else entry
                    value = entry[sep + 1:].strip() if has_value else b""
                    is_defined = name in defined_infos
                    if is_defined:
                        defined_infos[name].used += 1
                    else:
                        out.warning(b"INFO '" + name + b"' used but not defined!", l, line)
                    if is_defined:
                        if defined_infos[name].type != b"Flag" and not has_value:
                            out.error(b"Non-flag INFO '" + name + b"' has no value!", l, line)
                            return False
                        if defined_infos[name].type == b"Flag" and has_value:
                            out.error(b"Flag INFO '" + name + b"' has a value ("
                                      + value + b")!", l, line)
                            return False
                    for ch in INVALID_INFO_CHARS:
                        if ch.encode() in value:
                            out.error(b"Value of INFO entry '" + name
                                      + b"' has a value which contains the invalid character '"
                                      + ch.encode() + b"' (value: '" + value + b"')!", l, line)
                            return False
                    if is_defined and has_value:
                        _check_values(defined_infos[name], value.split(b","),
                                      len(alts), b"", out, l, line)
                    if name == b"CSQ" and is_defined:
                        csq_defs = defined_infos[name].description.split(b"|")
                        i_consequence = csq_defs.index(b"Consequence") if b"Consequence" in csq_defs else -1
                        for csq_transcript in value.split(b","):
                            csq_parts = csq_transcript.split(b"|")
                            if len(csq_parts) != len(csq_defs):
                                out.error(b"VEP-based CSQ annotation has %d" % len(csq_parts)
                                          + b" entries, expected %d" % len(csq_defs)
                                          + b" according to definition in header!", l, line)
                                return False
                            if i_consequence >= 0:
                                for term in csq_parts[i_consequence].split(b"&"):
                                    if term.decode(errors="replace") not in obo_terms:
                                        out.warning(b"Unknown MISO term '" + term
                                                    + b"' used!", l, line)

            if len(parts) == 8:
                continue
            format_names = parts[8].split(b":")
            for name in format_names:
                if name not in defined_formats:
                    out.warning(b"FORMAT '" + name + b"' used but not defined!", l, line)
                else:
                    defined_formats[name].used += 1
                if name == b"GT" and format_names.index(name) != 0:
                    out.error(b"FORMAT 'GT' must be first format field!", l, line)
                    return False

            for s, sample_name in enumerate(defined_samples):
                if parts[9 + s] == b".":
                    continue
                sample_data = parts[9 + s].split(b":")
                if len(format_names) != len(sample_data):
                    out.error(b"Sample " + sample_name + b" has %d" % len(sample_data)
                              + b" entries, expected %d" % len(format_names)
                              + b" according to FORMAT entry!", l, line)
                    return False
                for i, name in enumerate(format_names):
                    if sample_data[i] == b".":
                        continue
                    if name not in defined_formats:
                        # Qt quirk mirrored: the reference's QMap::operator[]
                        # default-inserts undefined FORMATs here, so the
                        # 'used but not defined' warning fires only once per
                        # name (pinned by VcfCheck_out3.txt)
                        defined_formats[name] = _Definition()
                        defined_formats[name].id = name
                    values = sample_data[i].split(b",")
                    _check_values(defined_formats[name], values, len(alts),
                                  sample_name, out, l, line)
                    if name == b"GT":
                        for gt_entry in values[0].replace(b"/", b"|").split(b"|"):
                            ok = _is_int(gt_entry)
                            if (gt_entry != b"." and not ok) or \
                               (ok and int(gt_entry) > len(alts)):
                                out.error(b"Sample " + sample_name
                                          + b" has invalid GT entry '" + values[0]
                                          + b"'!", l, line)
                                return False

    if print_general_information:
        for store, label in ((defined_filters, b"FILTER: "),
                             (defined_infos, b"INFO: "),
                             (defined_formats, b"FORMAT: ")):
            for key in sorted(store):
                out.info(label + store[key].to_string())
        for sample in defined_samples:
            out.info(b"SAMPLE: " + sample)
        out.info(b"Finished - checked %d lines" % l
                 + b" - %d data lines." % c_data)

    return not error_found


def _only_acgt(seq: bytes) -> bool:
    return bool(seq) and all(c in b"ACGT" for c in seq)
