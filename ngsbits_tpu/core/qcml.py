"""qcML 0.0.8 report writer.

Byte-level behavioral reference: ngs-bits ``QCCollection::storeToQCML``
(cppNGS/QCCollection.cpp:200-337) — the golden files in the reference test
suite pin this exact layout (modulo 'creation ' and '<binary>' lines, which
the reference tests strip, tools-TEST/ReadQC_Test.cpp:9-11).
"""

from __future__ import annotations

import html
import os
from dataclasses import dataclass, field
from datetime import datetime
from enum import Enum
from typing import Iterable

from . import ontology


class QCType(Enum):
    INT = "int"
    DOUBLE = "double"
    STRING = "string"
    IMAGE = "image"


def _fmt_double(v: float, precision: int = 2) -> str:
    # Qt QString::number(v,'f',p): correctly-rounded fixed formatting with
    # ties (exact binary midpoints) rounded away from zero — Python's format()
    # rounds half-even, so go through Decimal. nan/inf spelled like Qt.
    if v != v:
        return "nan"
    if v == float("inf"):
        return "inf"
    if v == float("-inf"):
        return "-inf"
    from decimal import ROUND_HALF_UP, Decimal
    d = Decimal(v).quantize(Decimal(1).scaleb(-precision), rounding=ROUND_HALF_UP)
    return f"{d:.{precision}f}"


@dataclass
class QCValue:
    name: str
    value: object
    description: str = ""
    accession: str = "NONE"
    type: QCType = QCType.STRING

    @staticmethod
    def from_int(name: str, value: int, description: str = "", accession: str = "NONE") -> "QCValue":
        return QCValue(name, int(value), description, accession, QCType.INT)

    @staticmethod
    def from_double(name: str, value: float, description: str = "", accession: str = "NONE") -> "QCValue":
        return QCValue(name, float(value), description, accession, QCType.DOUBLE)

    @staticmethod
    def from_string(name: str, value: str, description: str = "", accession: str = "NONE") -> "QCValue":
        return QCValue(name, str(value), description, accession, QCType.STRING)

    @staticmethod
    def image_from_base64(name: str, data_b64: bytes, description: str = "", accession: str = "NONE") -> "QCValue":
        return QCValue(name, data_b64, description, accession, QCType.IMAGE)

    def to_string(self, double_precision: int = 2) -> str:
        if self.type == QCType.DOUBLE:
            return _fmt_double(self.value, double_precision)
        if self.type == QCType.IMAGE:
            return self.value.decode() if isinstance(self.value, bytes) else str(self.value)
        return str(self.value)

    def as_int(self) -> int:
        if self.type != QCType.INT:
            raise TypeError(f"QCValue '{self.name}' requested as int, but has type {self.type}")
        return int(self.value)

    def as_double(self) -> float:
        if self.type not in (QCType.DOUBLE, QCType.INT):
            raise TypeError(f"QCValue '{self.name}' requested as double, but has type {self.type}")
        return float(self.value)


def _escape_attr(s: str) -> str:
    # Qt's toHtmlEscaped escapes < > & " — used for descriptions/parameters.
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace('"', "&quot;")
    )


_STYLESHEET = """  <xsl:stylesheet id="stylesheet" version="1.0" xmlns:xsl="http://www.w3.org/1999/XSL/Transform" xmlns:ns="http://www.prime-xs.eu/ms/qcml" xmlns="">
      <xsl:template match="/">
          <html>
            <style type="text/css">
            table {border: 1px solid #bbb; border-collapse: collapse; }
            td {border: 1px solid #bbb; padding: 1px 2px 1px 2px; vertical-align: top; }
            th {border: 1px solid #bbb; padding: 1px 2px 1px 2px; text-align: left; background-color: #eee; }
            </style>
              <body>
                  <h2>Meta data:</h2>
                  <table>
                    <tr>
                      <th>Accession</th><th>Name</th><th>Value</th>
                    </tr>
                    <xsl:for-each select="ns:qcML/ns:runQuality">
                      <xsl:for-each select="ns:metaDataParameter">
                        <tr>
                          <td><xsl:value-of select="@accession"/></td>
                          <td><span title="{@description}"><xsl:value-of select="@name"/></span></td>
                          <td>
                            <xsl:choose>
                              <xsl:when test="@accession = 'QC:1000006'"><a href="{@uri}" title="{@uri}" target="blank"><xsl:value-of select="@value"/></a></xsl:when>
                              <xsl:otherwise><xsl:value-of select="@value"/></xsl:otherwise>
                            </xsl:choose>
                          </td>
                        </tr>
                      </xsl:for-each>
                    </xsl:for-each>
                  </table>
                  <h2>Quality parameters:</h2>
                  <table>
                    <tr>
                      <th>Accession</th><th>Name</th><th>Value</th>
                    </tr>
                    <xsl:for-each select="ns:qcML/ns:runQuality">
                      <xsl:for-each select="ns:qualityParameter">
                        <tr>
                          <td><xsl:value-of select="@accession"/></td>
                          <td><span title="{@description}"><xsl:value-of select="@name"/></span></td>
                          <td><xsl:value-of select="@value"/></td>
                        </tr>
                      </xsl:for-each>
                    </xsl:for-each>
                    <xsl:for-each select="ns:qcML/ns:runQuality">
                      <xsl:for-each select="ns:attachment">
                          <xsl:choose>
                              <xsl:when test="ns:binary">
                                <tr>
                                  <td><xsl:value-of select="@accession"/></td>
                                  <td><span title="{@description}"><xsl:value-of select="@name"/></span></td>
                                  <td>
                                    <img>
                                      <xsl:attribute name="src">
                                        data:image/png;base64,<xsl:value-of select="ns:binary"/>
                                      </xsl:attribute>
                                    </img>
                                  </td>
                                </tr>
                              </xsl:when>
                          </xsl:choose>
                      </xsl:for-each>
                    </xsl:for-each>
                  </table>
              </body>
          </html>
      </xsl:template>
  </xsl:stylesheet>
"""


class QCCollection:
    def __init__(self):
        self._values: list[QCValue] = []

    def insert(self, value):
        if isinstance(value, QCCollection):
            for v in value._values:
                self.insert(v)
            return
        for i, v in enumerate(self._values):
            if v.name == value.name:
                self._values[i] = value
                return
        self._values.append(value)

    def __len__(self) -> int:
        return len(self._values)

    def __getitem__(self, i: int) -> QCValue:
        return self._values[i]

    def __iter__(self):
        return iter(self._values)

    def contains(self, name: str, by_accession: bool = False) -> bool:
        key = (lambda v: v.accession) if by_accession else (lambda v: v.name)
        return any(key(v) == name for v in self._values)

    def value(self, name: str, by_accession: bool = False) -> QCValue:
        key = (lambda v: v.accession) if by_accession else (lambda v: v.name)
        for v in self._values:
            if key(v) == name:
                return v
        raise KeyError(f"QC value with name/accession '{name}' not found in QC collection.")

    def validate_terms(self):
        terms = ontology.qcml_terms()
        for v in self._values:
            if not terms.contains(v.accession):
                raise RuntimeError(
                    f"QC term '{v.accession}/{v.name}' not found in the ontology!")
            if terms.get(v.accession).obsolete:
                raise RuntimeError(
                    f"QC term '{v.accession}/{v.name}' is marked as obsolete in the ontology!")

    def to_qcml(self, source_files: Iterable[str], parameters: str,
                precision_overwrite: dict[str, int] | None = None,
                metadata: list[QCValue] | None = None,
                creation_software: str | None = None,
                creation_version: str | None = None) -> str:
        from .. import APP_NAME, __version__
        precision_overwrite = precision_overwrite or {}
        metadata = metadata or []
        sw = creation_software or APP_NAME
        ver = creation_version or __version__

        out = []
        out.append('<?xml version="1.0" encoding="ISO-8859-1"?>')
        out.append('<?xml-stylesheet type="text/xml" href="#stylesheet"?>')
        out.append('<!DOCTYPE catelog [')
        out.append('  <!ATTLIST xsl:stylesheet')
        out.append('  id  ID  #REQUIRED>')
        out.append('  ]>')
        out.append('<qcML version="0.0.8" xmlns="http://www.prime-xs.eu/ms/qcml" >')
        out.append('  <runQuality ID="rq0001">')
        out.append(f'    <metaDataParameter ID="md0001" name="creation software" value="{sw} {ver}" cvRef="QC" accession="QC:1000002"/>')
        out.append(f'    <metaDataParameter ID="md0002" name="creation software parameters" value="{_escape_attr(parameters)}" cvRef="QC" accession="QC:1000003"/>')
        now = datetime.now().strftime("%Y-%m-%dT%H:%M:%S")
        out.append(f'    <metaDataParameter ID="md0003" name="creation date" value="{now}" cvRef="QC" accession="QC:1000004"/>')
        idx = 4
        for sf in source_files:
            fname = os.path.basename(str(sf))
            out.append(f'    <metaDataParameter ID="md{idx:04d}" name="source file" value="{fname}" cvRef="QC" accession="QC:1000005"/>')
            idx += 1
        for md in metadata:
            if md.accession == "QC:1000006":
                fname = os.path.basename(md.to_string())
                out.append(f'    <metaDataParameter ID="md{idx:04d}" name="{md.name}" value="{fname}" uri="{md.to_string()}" cvRef="QC" accession="{md.accession}" />')
            else:
                out.append(f'    <metaDataParameter ID="md{idx:04d}" name="{md.name}" value="{md.to_string()}" cvRef="QC" accession="{md.accession}"/>')
            idx += 1
        for i, v in enumerate(self._values):
            if v.type == QCType.IMAGE:
                continue
            value = v.to_string(precision_overwrite.get(v.name, 2))
            out.append(f'    <qualityParameter ID="qp{i + 1:04d}" name="{v.name}" description="{_escape_attr(v.description)}" value="{value}" cvRef="QC" accession="{v.accession}"/>')
        for i, v in enumerate(self._values):
            if v.type != QCType.IMAGE:
                continue
            out.append(f'    <attachment ID="qp{i + 1:04d}" name="{v.name}" description="{_escape_attr(v.description)}" cvRef="QC" accession="{v.accession}">')
            out.append(f'      <binary>{v.to_string()}</binary>')
            out.append('    </attachment>')
        out.append('  </runQuality>')
        out.append('  <cvList>')
        out.append('    <cv uri="https://raw.githubusercontent.com/imgag/ngs-bits/master/src/cppNGS/Resources/qcML.obo" ID="QC" fullName="QC" version="0.1"/>')
        out.append('  </cvList>')
        out.append(_STYLESHEET + '</qcML>')
        return "\n".join(out) + "\n"

    def store_to_qcml(self, filename: str | None, source_files: Iterable[str], parameters: str,
                      precision_overwrite: dict[str, int] | None = None,
                      metadata: list[QCValue] | None = None):
        self.validate_terms()
        text = self.to_qcml(source_files, parameters, precision_overwrite, metadata)
        if filename:
            with open(filename, "w", encoding="utf-8") as fh:
                fh.write(text)
            # self-validate against the qcML schema like the reference
            # (QCCollection.cpp:339-347)
            error = validate_qcml_schema(filename)
            if error:
                raise RuntimeError(
                    f"store_to_qcml produced an invalid XML file: {error}")
        else:
            import sys
            sys.stdout.write(text)


    def to_string_list(self, precision_overwrite: dict[str, int] | None = None) -> list[str]:
        precision_overwrite = precision_overwrite or {}
        lines = []
        for v in self._values:
            if v.type == QCType.IMAGE:
                continue
            lines.append(f"{v.name}: {v.to_string(precision_overwrite.get(v.name, 2))}")
        return lines


_QCML_SCHEMA = None


def validate_qcml_schema(filename: str) -> str:
    """Validate a qcML file against the shipped qcML_0.0.8.xsd.

    Returns an empty string when valid, the first validation error
    otherwise (XmlHelper::isValidXml analogue, QCCollection.cpp:343).
    Gated on lxml availability: returns '' when lxml is absent."""
    global _QCML_SCHEMA
    try:
        from lxml import etree
    except ImportError:
        return ""
    if _QCML_SCHEMA is None:
        import gzip as _gzip
        xsd_path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                "resources", "qcML_0.0.8.xsd.gz")
        with _gzip.open(xsd_path, "rb") as fh:
            _QCML_SCHEMA = etree.XMLSchema(etree.fromstring(fh.read()))
    try:
        doc = etree.parse(filename)
    except etree.XMLSyntaxError as e:
        return str(e)
    if not _QCML_SCHEMA.validate(doc):
        log = _QCML_SCHEMA.error_log
        return str(log[0]) if len(log) else "schema validation failed"
    return ""
