"""qcML converter tools (QcToTsv / TsvToQC).

Behavioral reference: ngs-bits src/QcToTsv/main.cpp, src/TsvToQC/main.cpp +
QCCollection::fromQCML (typed via the qcML.obo value-type).
"""

from __future__ import annotations

import sys

from ngsbits_tpu.utils.stdio import stdin_binary

from ..core.ontology import qcml_terms
from ..core.qcml import QCCollection, QCType, QCValue
from .toolbase import ToolBase, ToolError


def qc_from_qcml(path: str, obo: str = "", errors: list[str] | None = None) -> QCCollection:
    """QCCollection::fromQCML (QCCollection.cpp:386-465) — parse the
    qualityParameter/attachment elements of a qcML file; value types come
    from the ontology.  Metrics with an unknown accession or an unparsable
    int/float value are SKIPPED with a message appended to ``errors``;
    base64Binary attachments become IMAGE values.  A custom OBO file replaces
    the built-in qcML.obo (QcToTsv/main.cpp:30-31)."""
    import math as _math
    import xml.etree.ElementTree as ET

    from ..core.qcml import validate_qcml_schema
    error = validate_qcml_schema(path)
    if error:
        raise ToolError(f"QC file '{path}' does not match schema: {error}")
    if obo:
        from ..core.ontology import OntologyTermCollection
        with open(obo, "r", encoding="utf-8", errors="replace") as fh:
            terms = OntologyTermCollection.from_obo_text(fh.read())
    else:
        terms = qcml_terms()
    if errors is None:
        errors = []

    def strip_ns(tag):
        return tag.rsplit("}", 1)[-1]

    out = QCCollection()
    root = ET.parse(path).getroot()
    for element in root.iter():
        if strip_ns(element.tag) not in ("qualityParameter", "attachment"):
            continue
        name = element.get("name", "")
        value = element.get("value", "")
        accession = element.get("accession", "")
        desc = element.get("description", "")
        if not terms.contains(accession):
            errors.append(f"Skipped metric with unknown accession (accession={accession}/{name})")
            continue
        vtype = terms.get(accession).term_type
        if vtype == "int":
            try:
                out.insert(QCValue.from_int(name, int(value), desc, accession))
            except ValueError:
                errors.append(f"Skipped metric with invalid integer value '{value}' "
                              f"(accession={accession}/{name})")
            continue
        if vtype == "float":
            try:
                num = float(value)
                if _math.isnan(num):
                    raise ValueError
                out.insert(QCValue.from_double(name, num, desc, accession))
            except ValueError:
                errors.append(f"Skipped metric with invalid float value '{value}' "
                              f"(accession={accession}/{name})")
            continue
        if vtype == "base64Binary":  # image attachment
            for child in element:
                if strip_ns(child.tag) == "binary":
                    out.insert(QCValue.image_from_base64(
                        name, (child.text or "").strip().encode(), desc, accession))
            continue
        out.insert(QCValue.from_string(name, value, desc, accession))
    return out


class QcToTsvTool(ToolBase):
    name = "QcToTsv"
    description = "Converts qcML files to a TSV file.."

    def setup(self):
        self.add_infile_list("in", "Input qcML files.")
        self.add_outfile("out", "Output TSV file. If unset, writes to STDOUT.", optional=True)
        self.add_infile("obo", "OBO file to use. If unset, uses the default file compiled into ngs-bits.", optional=True)

    def main(self):
        lines = ["#accession\tname\tvalue"]
        for path in self.get_infile_list("in"):
            qc = qc_from_qcml(path, obo=self.get("obo") or "")
            for v in qc:
                if v.type == QCType.IMAGE:  # QcToTsv/main.cpp:43
                    continue
                lines.append(f"{v.accession}\t{v.name}\t{v.to_string()}")
        text = "".join(l + "\n" for l in lines)
        out = self.get("out")
        if out:
            with open(out, "w") as fh:
                fh.write(text)
        else:
            sys.stdout.write(text)


class TsvToQCTool(ToolBase):
    name = "TsvToQC"
    description = "Converts TSV file to a qcML file."

    def setup(self):
        self.add_infile_list("sources", "Source files the QC terms were extracted from.")
        self.add_infile("in", "Input TSV file with two columns (QC term accession and value). If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output qcML file. If unset, writes to STDOUT.", optional=True)

    def main(self):
        terms = qcml_terms()
        output = QCCollection()
        in_path = self.get("in")
        if in_path:
            with open(in_path, "rb") as fh:
                data = fh.read()
        else:
            data = stdin_binary().read()
        for raw in data.split(b"\n"):
            line = raw.strip()
            if not line or line.startswith(b"#"):
                continue
            parts = line.split(b"\t")
            if len(parts) != 2:
                raise ToolError(f"Input line with more/less than two parts: '{line.decode(errors='replace')}'")
            accession = parts[0].decode()
            value = parts[1].decode()
            if not terms.contains(accession):
                raise ToolError(f"qcML OBO file does not contain term with accession '{accession}'!")
            term = terms.get(accession)
            output.insert(QCValue.from_string(term.name, value, term.definition, accession))
        output.store_to_qcml(self.get("out") or None, self.get_infile_list("sources"), "")


TOOLS = {"QcToTsv": QcToTsvTool, "TsvToQC": TsvToQCTool}
