"""qcML converter tools (QcToTsv / TsvToQC).

Behavioral reference: ngs-bits src/QcToTsv/main.cpp, src/TsvToQC/main.cpp +
QCCollection::fromQCML (typed via the qcML.obo value-type).
"""

from __future__ import annotations

import re
import sys

from ngsbits_tpu.utils.stdio import stdin_binary

from ..core.ontology import qcml_terms
from ..core.qcml import QCCollection, QCValue
from .toolbase import ToolBase, ToolError

_QP_RX = re.compile(
    rb'<qualityParameter [^>]*name="([^"]*)" description="([^"]*)" value="([^"]*)"'
    rb' cvRef="QC" accession="([^"]*)"')


def qc_from_qcml(path: str, obo: str = "") -> QCCollection:
    """Parse qualityParameter elements of a qcML file; value types come from
    the ontology (QCCollection::fromQCML semantics; a custom OBO file
    replaces the built-in qcML.obo, QcToTsv/main.cpp:30-31)."""
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
    out = QCCollection()
    with open(path, "rb") as fh:
        data = fh.read()
    for m in _QP_RX.finditer(data):
        name = m.group(1).decode()
        desc = m.group(2).decode()
        value = m.group(3).decode()
        accession = m.group(4).decode()
        vtype = ""
        if terms.contains(accession):
            vtype = terms.get(accession).term_type
        if "int" in vtype:
            try:
                out.insert(QCValue.from_int(name, int(value), desc, accession))
                continue
            except ValueError:
                pass
        if "float" in vtype:
            try:
                out.insert(QCValue.from_double(name, float(value), desc, accession))
                continue
            except ValueError:
                pass
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
