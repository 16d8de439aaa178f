"""Minimal OBO ontology reader for the qcML term catalogue.

Behavioral reference: ngs-bits ``OntologyTermCollection`` as used by
``QCCollection::storeToQCML`` (cppNGS/QCCollection.cpp:339-366): every metric
accession must exist in the ontology, must not be obsolete, and its name must
match the term name exactly (cppNGS/Statistics.cpp:2904-2941).
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from functools import lru_cache
from pathlib import Path

RESOURCE_DIR = Path(__file__).resolve().parent.parent / "resources"


@dataclass
class OboTerm:
    id: str
    name: str
    definition: str = ""
    obsolete: bool = False
    term_type: str = ""  # from xref value-type, e.g. xsd:int / xsd:float / xsd:string / png
    parents: list = None        # is_a accessions
    synonyms: list = None       # EXACT synonyms
    replaced_by: str = ""

    def __post_init__(self):
        if self.parents is None:
            self.parents = []
        if self.synonyms is None:
            self.synonyms = []

    def is_child_of(self, parent_id: str) -> bool:
        """OntologyTerm::isChildOf (OntologyTermCollection.cpp:27-37) —
        substring match against each is_a entry."""
        return any(parent_id in p for p in self.parents)


class OntologyTermCollection:
    def __init__(self, terms: dict[str, OboTerm], version: str = ""):
        self._terms = terms
        self.version = version

    def contains(self, term_id: str) -> bool:
        return term_id in self._terms

    contains_by_id = contains

    def contains_by_name(self, name: str) -> bool:
        """OntologyTermCollection::containsByName — linear name scan."""
        return any(t.name == name for t in self._terms.values())

    def get(self, term_id: str) -> OboTerm:
        return self._terms[term_id]

    def get_by_id(self, term_id: str) -> OboTerm:
        """OntologyTermCollection::getByID — throws on unknown id."""
        try:
            return self._terms[term_id]
        except KeyError:
            raise ValueError(f"Ontology term collection has no term with "
                             f"id '{term_id}'") from None

    def add(self, term: OboTerm):
        if term.id in self._terms:
            raise ValueError(f"OntologyTermCollection::add: Term with id "
                             f"'{term.id}' already present!")
        self._terms[term.id] = term

    def __len__(self):
        return len(self._terms)

    def __iter__(self):
        return iter(self._terms.values())

    @staticmethod
    def from_obo_text(text: str) -> "OntologyTermCollection":
        terms: dict[str, OboTerm] = {}
        cur: OboTerm | None = None
        in_term = False
        version = ""
        for raw in text.splitlines():
            line = raw.strip()
            if line.startswith("data-version:"):
                version = line[13:].strip()
            if line == "[Term]":
                if cur is not None:
                    terms[cur.id] = cur
                cur = OboTerm(id="", name="")
                in_term = True
                continue
            if line.startswith("[") and line != "[Term]":
                if cur is not None:
                    terms[cur.id] = cur
                    cur = None
                in_term = False
                continue
            if not in_term or cur is None or not line:
                continue
            if line.startswith("id:"):
                cur.id = line[3:].strip()
            elif line.startswith("name:"):
                cur.name = line[5:].strip()
            elif line.startswith("def:"):
                raw = line[4:].strip()
                # OBO def format: "text" [citations]
                if raw.startswith('"'):
                    end = raw.rfind('"')
                    raw = raw[1:end].replace('\\"', '"')
                cur.definition = raw
            elif line.startswith("is_obsolete:"):
                cur.obsolete = line.split(":", 1)[1].strip().lower() == "true"
            elif line.startswith("is_a:"):
                # 'is_a: QC:2000002 ! NGS aquisition parameter'
                parent = line[5:].strip()
                bang = parent.rfind("!")
                if bang != -1:
                    parent = parent[:bang].strip()
                cur.parents.append(parent)
            elif line.startswith("synonym:") and " EXACT " in line:
                raw2 = line[8:].strip()
                start = raw2.find('"') + 1
                end = raw2.rfind('"')
                cur.synonyms.append(raw2[start:end])
            elif line.startswith("replaced_by:"):
                cur.replaced_by = line[12:].strip()
            elif line.startswith("xref: value-type:xsd\\:"):
                # OntologyTermCollection.cpp:81-87: 'xref: value-type:xsd\:int "..."'
                cur.term_type = (line + ":").replace('"', ":").split(":")[3].strip()
        if cur is not None:
            terms[cur.id] = cur
        return OntologyTermCollection(terms, version)

    @staticmethod
    def load_obo(filename, skip_obsolete: bool = True) -> "OntologyTermCollection":
        """OntologyTermCollection(filename, skip_obsolete_terms)
        (OntologyTermCollection.cpp:43-125): [Term] blocks end at the first
        empty line; obsolete terms are optionally dropped."""
        import os

        if not os.path.isfile(str(filename)):
            raise FileNotFoundError(f"Could not open file for reading: "
                                    f"'{filename}'!")
        opener = gzip.open if str(filename).endswith(".gz") else open
        with opener(filename, "rt", encoding="utf-8", errors="replace") as fh:
            lines = iter(fh.read().splitlines())
        out = OntologyTermCollection({}, "")
        for raw in lines:
            line = raw.strip()
            if line.startswith("data-version:"):
                out.version = line[13:].strip()
            if line != "[Term]":
                continue
            term = OboTerm(id="", name="")
            for raw2 in lines:
                line = raw2.strip()
                if not line:
                    break
                if line.startswith("id:"):
                    term.id = line[3:].strip()
                if line.startswith("name:"):
                    term.name = line[5:].strip()
                if line.startswith("def:"):
                    d = line[4:].strip()
                    start = d.find('"') + 1
                    end = d.rfind('"')
                    term.definition = d[start:end]
                if line.startswith("xref: value-type:xsd\\:"):
                    term.term_type = (line + ":").replace('"', ":").split(":")[3].strip()
                if line.startswith("is_a:"):
                    parent = line[5:].strip()
                    end = parent.rfind("!")
                    parent = parent[:end].strip() if end != -1 else parent
                    term.parents.append(parent)
                if line.startswith("synonym:") and " EXACT " in line:
                    s = line[8:].strip()
                    start = s.find('"') + 1
                    end = s.rfind('"')
                    term.synonyms.append(s[start:end])
                if line.startswith("is_obsolete:"):
                    term.obsolete = "true" in line
                if line.startswith("replaced_by:"):
                    term.replaced_by = line[12:].strip()
            if term.obsolete and skip_obsolete:
                continue
            out.add(term)
        return out


@lru_cache(maxsize=1)
def qcml_terms() -> OntologyTermCollection:
    path = RESOURCE_DIR / "qcML.obo.gz"
    with gzip.open(path, "rt", encoding="utf-8", errors="replace") as fh:
        return OntologyTermCollection.from_obo_text(fh.read())
