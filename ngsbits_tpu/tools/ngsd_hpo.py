"""NGSDImportHPO — HPO terms and gene-phenotype relations.

Behavioral reference: ngs-bits src/NGSDImportHPO/main.cpp (obo + anno import,
optional OMIM/ClinVar/HGMD/hpophen/GenCC/G2P evidence sources, evidence
translation tables, term-gene optimization pass).
"""

from __future__ import annotations

import gzip
import re
import sys

from ..core.geneset import GeneSet
from ..core.ontology import OntologyTermCollection
from ..ngsd import NGSD
from .toolbase import ToolBase, ToolError

# PhenotypeEvidenceLevel (Phenotype.h:11)
NA, AGAINST, LOW, MEDIUM, HIGH = 0, 1, 2, 3, 4
EVIDENCE_STR = {NA: "n/a", AGAINST: "against", LOW: "low", MEDIUM: "medium", HIGH: "high"}


def translate_hpo_evidence(e: str) -> int:
    if e == "IEA":
        return LOW
    if e == "TAS":
        return MEDIUM
    if e == "PCS":
        return HIGH
    raise ToolError(f"Given Evidence is not a HPO evidence value: {e}")


def translate_omim_evidence(e: str) -> int:
    if e in ("(1)", "(2)"):
        return LOW
    if e in ("(3)", "(4)"):
        return HIGH
    raise ToolError(f"Given Evidence is not a Omim evidence value: {e}")


def translate_d2g_evidence(e: str) -> int:
    if e in ("definitive", "strong"):
        return HIGH
    if e == "moderate":
        return MEDIUM
    if e in ("limited", "disputed", "refuted"):
        return LOW
    raise ToolError(f"Unsupported G2P evidence value '{e}'")


def translate_gencc_evidence(e: str, line: str) -> int:
    table = {"No Known": NA, "No Known Disease Relationship": NA, "Animal": LOW,
             "Refuted": AGAINST, "Refuted Evidence": AGAINST,
             "Disputed": AGAINST, "Disputed Evidence": AGAINST,
             "Limited": LOW, "Supportive": LOW, "Moderate": MEDIUM,
             "Strong": HIGH, "Definitive": HIGH}
    if e not in table:
        raise ToolError(f"Given Evidence is not a GenCC evidence value: {e} in line:\n{line}")
    return table[e]


class SourceDetails:
    """Per-source original/translated evidence (main.cpp:50-140)."""

    __slots__ = ("sources", "original", "translated")

    def __init__(self, source=None, original="", translated=NA):
        self.sources = []
        self.original = []
        self.translated = []
        if source is not None:
            self.sources.append(source)
            self.original.append(original)
            self.translated.append(translated)

    def unite(self, other: "SourceDetails"):
        for i, s in enumerate(other.sources):
            if s in self.sources:
                idx = self.sources.index(s)
                if other.translated[i] > self.translated[idx]:
                    self.original[idx] = other.original[i]
                    self.translated[idx] = other.translated[i]
            else:
                self.sources.append(s)
                self.original.append(other.original[i])
                self.translated.append(other.translated[i])

    def to_csv_string(self) -> str:
        return "; ".join(f"({s}, {o}, {EVIDENCE_STR[t]})"
                         for s, o, t in zip(self.sources, self.original, self.translated))


class AnnotatedList:
    """Keyed items with evidence-max merging; iteration sorted by key
    (the reference uses QMap for deterministic order)."""

    def __init__(self):
        self.hash: dict[str, list] = {}  # item -> [SourceDetails, evidence]

    def add(self, item: str, source, original="", evidence=NA):
        if isinstance(source, str):
            source = SourceDetails(source, original, evidence)
        entry = self.hash.get(item)
        if entry is not None:
            entry[0].unite(source)
            if entry[1] < evidence:
                entry[1] = evidence
        else:
            self.hash[item] = [source, evidence]

    def items(self):
        return sorted(self.hash.items())


def _open_text(path):
    fh = open(path, "rb")
    if fh.read(2) == b"\x1f\x8b":
        fh.close()
        return gzip.open(path, "rb")
    fh.seek(0)
    return fh


def _reconstruct_strings(parts: list[bytes], expected: int) -> list[bytes]:
    """main.cpp reconstructStrings — re-join quoted CSV fields split on ','."""
    if len(parts) <= expected:
        return parts
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p.startswith(b'"') and not p.endswith(b'"'):
            combined = p
            while i + 1 < len(parts):
                i += 1
                combined += parts[i]
                if parts[i].endswith(b'"'):
                    break
            out.append(combined)
        else:
            out.append(p)
        i += 1
    return out


class NGSDImportHPOTool(ToolBase):
    name = "NGSDImportHPO"
    description = "Imports HPO terms and gene-phenotype relations into the NGSD."

    def setup(self):
        self.add_infile("obo", "HPO ontology file from 'https://github.com/obophenotype/human-phenotype-ontology/releases/download/v2026-02-16/hp.obo'.")
        self.add_infile("anno", "HPO annotations file from 'https://github.com/obophenotype/human-phenotype-ontology/releases/download/v2026-02-16/phenotype_to_genes.txt'")
        self.add_infile("omim", "OMIM 'morbidmap.txt' file for additional disease-gene information, from https://omim.org/downloads/", optional=True)
        self.add_infile("clinvar", "ClinVar VCF file for additional disease-gene information. Download and unzip from https://ftp.ncbi.nlm.nih.gov/pub/clinvar/vcf_GRCh38/archive_2.0/2026/clinvar_20260329.vcf.gz", optional=True)
        self.add_infile("hgmd", "HGMD phenbase file (Manually download 'hgmd_phenbase-2026.1.dump.gz').", optional=True)
        self.add_infile("hpophen", "HPO 'phenotype.hpoa' file for additional phenotype-disease evidence information.", optional=True)
        self.add_infile("gencc", "gencc 'gencc-submissions.tsv' file for additional disease-gene evidence information.", optional=True)
        self.add_infile("g2p", "DDG2P file for additional gene-disease-phenotype evidence information.", optional=True)
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_flag("force", "If set, overwrites old data.")
        self.add_flag("debug", "Enables debug output")

    # ---- ontology import (main.cpp importHpoOntology) ----
    def _import_ontology(self, db: NGSD) -> dict[str, int]:
        with open(self.get_infile("obo")) as fh:
            terms = OntologyTermCollection.from_obo_text(fh.read())
        id2ngsd: dict[str, int] = {}
        for term in terms:
            if term.obsolete:
                continue
            db.execute("INSERT INTO hpo_term (hpo_id, name, definition, synonyms) VALUES (?, ?, ?, ?)",
                       (term.id, term.name, term.definition,
                        "\n".join(term.synonyms) if term.synonyms else ""))
            id2ngsd[term.id] = db.last_insert_id()
        sys.stdout.write(f"Imported {len(id2ngsd)} non-obsolete HPO terms.\n")

        version = terms.version.replace("hp/", "").replace("releases/", "")
        db.set_database_info("HPO", version)

        c_parent = 0
        for term in terms:
            if term.obsolete:
                continue
            c_db = id2ngsd.get(term.id, -1)
            if c_db == -1:
                continue
            for p_id in term.parents:
                p_db = id2ngsd.get(p_id, -1)
                if p_db == -1:
                    sys.stdout.write(f"Notice: Parent term '{p_id}' is not a valid term!\n")
                    continue
                db.execute("INSERT INTO hpo_parent (parent, child) VALUES (?, ?)", (p_db, c_db))
                c_parent += 1
        sys.stdout.write(f"Imported {c_parent} parent-child relations between terms from HPO.\n")

        c_obs = c_obs_rep = 0
        for term in terms:
            if not term.obsolete:
                continue
            replace_id = None
            if term.replaced_by:
                ngsd_id = id2ngsd.get(term.replaced_by, -1)
                if ngsd_id == -1:
                    sys.stdout.write(f"Notice: Replacement term '{term.replaced_by}' is not a valid term!\n")
                    continue
                replace_id = ngsd_id
            db.execute("INSERT INTO hpo_obsolete (hpo_id, name, definition, replaced_by) VALUES (?, ?, ?, ?)",
                       (term.id, term.name, term.definition, replace_id))
            c_obs += 1
            if replace_id is not None:
                c_obs_rep += 1
        sys.stdout.write(f"Imported {c_obs} obsolete HPO terms ({c_obs_rep} with replacement).\n")
        return id2ngsd

    def main(self):
        db = NGSD(self.get_flag("test"))
        debug = self.get_flag("debug")
        if db.get_value("SELECT count(*) FROM gene") == 0:
            raise ToolError("Table 'gene' is empty. Please import HGNC database before importing HPO.")
        if (not db.table_empty("hpo_term") or not db.table_empty("hpo_parent")
                or not db.table_empty("hpo_genes")):
            if self.get_flag("force"):
                for t in ("hpo_obsolete", "hpo_genes", "hpo_parent", "hpo_term"):
                    db.clear_table(t)
            else:
                raise ToolError("Tables already contain data! Use '-force' to overwrite old data!")

        id2ngsd = self._import_ontology(db)
        term2genes: dict[int, AnnotatedList] = {}
        term2diseases: dict[int, AnnotatedList] = {}
        disease2genes: dict[str, AnnotatedList] = {}

        self._parse_g2p(db, id2ngsd, disease2genes, term2diseases, term2genes)
        self._parse_gencc(db, disease2genes)
        self._parse_hpophen(id2ngsd, term2diseases)

        # term-disease and disease-gene relations from the HPO anno file
        inheritance_ids = set()
        inh_root = db.phenotype_id_by_accession("HP:0000005", False)
        inheritance_accessions = set()
        if inh_root != -1:
            child_ids = db.phenotype_child_terms(inh_root, True)
            inheritance_accessions = {db.phenotype_accession(i) for i in child_ids}
            inheritance_ids = set(child_ids)
        _ = inheritance_ids
        added_t2g = added_t2d = added_d2g = 0
        non_hgnc = []
        with open(self.get_infile("anno"), "rb") as fh:
            for nr, raw in enumerate(fh, start=1):
                parts = raw.split(b"\t")
                if len(parts) < 5:
                    continue
                if len(parts) > 5:
                    raise ToolError(f"Found line with more than 5 tab-separated parts in {self.get_infile('anno')}. The file might by outdated!")
                if parts[0] == b"hpo_id":
                    continue
                disease = parts[4].strip().decode()
                gene = parts[3].strip().decode()
                accession = parts[0].strip().decode()
                gene_db_id = db.gene_to_approved_id(gene)
                term_db_id = id2ngsd.get(accession, -1)
                if term_db_id != -1:
                    if accession in inheritance_accessions:
                        if gene_db_id != -1:
                            term2genes.setdefault(term_db_id, AnnotatedList()).add(
                                db.gene_symbol(gene_db_id), "HPO", "", NA)
                            added_t2g += 1
                    else:
                        term2diseases.setdefault(term_db_id, AnnotatedList()).add(
                            disease, "HPO", "", NA)
                        added_t2d += 1
                if gene_db_id != -1:
                    disease2genes.setdefault(disease, AnnotatedList()).add(
                        db.gene_symbol(gene_db_id), "HPO", "", NA)
                    added_d2g += 1
                elif gene not in non_hgnc:
                    non_hgnc.append(gene)
        sys.stdout.write(f"Imported {added_d2g} disease-gene relations, {added_t2d} term-disease relations, {added_t2g} term-gene relations from HPO (anno).\n")
        for gene in non_hgnc:
            sys.stdout.write(f"Skipped gene '{gene}' because it is not an approved HGNC symbol!\n")

        self._parse_omim(db, disease2genes, debug)
        self._parse_clinvar(db, id2ngsd, disease2genes, term2genes, debug)
        self._parse_hgmd(db, id2ngsd, term2genes, debug)

        # combine term->disease->gene into term->gene (main.cpp:1269-1302)
        sys.stdout.write("Gathering all term2gene relations\n")
        for term_id, diseases in term2diseases.items():
            for disease, (d_src, d_evi) in diseases.items():
                genes = disease2genes.get(disease)
                if genes is None:
                    continue
                for gene, (g_src, g_evi) in genes.items():
                    if d_evi == NA:
                        evi = g_evi
                    elif g_evi == NA:
                        evi = d_evi
                    else:
                        evi = min(d_evi, g_evi)
                    src = SourceDetails()
                    src.unite(d_src)
                    src.unite(g_src)
                    term2genes.setdefault(term_id, AnnotatedList()).add(gene, src, "", evi)

        sys.stdout.write("Starting import into NGSD\n")
        rows = []
        for term_id in term2genes:
            for gene, (src, evi) in term2genes[term_id].items():
                rows.append((term_id, gene, src.to_csv_string(), EVIDENCE_STR[evi]))
        db.executemany("INSERT INTO hpo_genes (hpo_term_id, gene, details, evidence) VALUES (?, ?, ?, ?)", rows)
        db.commit()
        sys.stdout.write(f"Overall imported term-gene relations: {db.get_value('SELECT COUNT(*) FROM hpo_genes')}\n")

        sys.stdout.write("Optimizing term-gene relations (removing genes which are present in all leaf nodes from the parent node)...\n")
        removed = self._optimize(db, "HP:0000001")
        db.commit()

        # import stats
        root_id = db.phenotype_id_by_accession("HP:0000001", False)
        subtree_roots = db.phenotype_child_terms(root_id, False) if root_id != -1 else []
        subtrees = [set(db.phenotype_accession(i) for i in db.phenotype_child_terms(r, True))
                    for r in subtree_roots]
        rows = db.get_rows("SELECT ht.hpo_id, hg.gene FROM hpo_genes hg INNER JOIN hpo_term ht ON hg.hpo_term_id = ht.id")
        counts = [0] * len(subtree_roots)
        for acc, _gene in rows:
            for i, st in enumerate(subtrees):
                if acc in st:
                    counts[i] += 1
        sys.stdout.write("Imported HPO-Gene relations: \n")
        sys.stdout.write(f" Overall:\t{len(rows)}\n")
        for i, r in enumerate(subtree_roots):
            sys.stdout.write(f" {db.phenotype_name(r)}:\t{counts[i]}\n")
        sys.stdout.write(f"{removed} duplicate genes removed during optimization\n")
        db.close()

    def _optimize(self, db: NGSD, root_accession: str) -> int:
        """optimizeHpoGeneTable (main.cpp:1362-1410)."""
        removed = 0

        def recurse(root_id: int):
            nonlocal removed
            children = db.phenotype_child_terms(root_id, False)
            if not children:
                return
            genes_children = GeneSet()
            for child in children:
                genes_children.insert_all(db.phenotype_to_genes(child, True, False))
            to_remove = genes_children.intersect(db.phenotype_to_genes(root_id, False, False))
            for gene in to_remove:
                db.execute("DELETE FROM hpo_genes WHERE hpo_term_id=? AND gene=?", (root_id, gene))
                removed += 1
            for child in children:
                recurse(child)

        root_id = db.phenotype_id_by_accession(root_accession, False)
        if root_id != -1:
            recurse(root_id)
        return removed

    # ---- evidence sources ----
    def _parse_hpophen(self, id2ngsd, term2diseases):
        path = self.get_infile("hpophen")
        if not path:
            return
        added = 0
        with open(path, "rb") as fh:
            for raw in fh:
                if raw.startswith(b"#"):
                    continue
                parts = raw.split(b"\t")
                if len(parts) < 6 or parts[2].strip():
                    continue
                term = parts[3].strip().decode()
                disease = parts[4].strip().decode()
                evidence = parts[5].strip().decode()
                term_id = id2ngsd.get(term, -1)
                if term_id == -1:
                    continue
                term2diseases.setdefault(term_id, AnnotatedList()).add(
                    disease, "HPO", evidence, translate_hpo_evidence(evidence))
                added += 1
        sys.stdout.write(f"Imported {added} term-disease relations from HPO (hpophen).\n")

    def _parse_omim(self, db, disease2genes, debug):
        path = self.get_infile("omim")
        if not path:
            return
        count = 0
        mim_rx = re.compile(rb"([0-9]{6})")
        evi_rx = re.compile(rb"(\([1-4]\))")
        with open(path, "rb") as fh:
            for raw in fh:
                parts = raw.strip().split(b"\t")
                if len(parts) < 4:
                    continue
                pheno = parts[0].strip()
                genes = parts[1].split(b",")
                mim_number = parts[2].strip().decode()
                omim_evi = ""
                m = mim_rx.search(pheno)
                if m:
                    mim_number = m.group(1).decode()
                m = evi_rx.search(pheno)
                if m:
                    omim_evi = m.group(1).decode()
                for gene in genes:
                    gene = gene.strip().decode()
                    gid = db.gene_to_approved_id(gene)
                    if gid == -1:
                        continue
                    disease2genes.setdefault("OMIM:" + mim_number, AnnotatedList()).add(
                        db.gene_symbol(gid), "OMIM", omim_evi,
                        translate_omim_evidence(omim_evi) if omim_evi else NA)
                    count += 1
        sys.stdout.write(f"Imported {count} disease-gene relations from OMIM.\n")

    def _parse_clinvar(self, db, id2ngsd, disease2genes, term2genes, debug):
        path = self.get_infile("clinvar")
        if not path:
            return
        if path.endswith(".vcf.gz"):
            raise ToolError("ClinVar must not be gzipped!")
        added_t2g = added_d2g = 0
        with open(path, "rb") as fh:
            for raw in fh:
                line = raw.strip()
                if b"CLNSIG=Pathogenic" not in line and b"CLNSIG=Likely_pathogenic" not in line:
                    continue
                parts = line.split(b"\t")
                if len(parts) < 8:
                    continue
                genes = []
                diseases = []
                hpos = []
                for part in parts[7].split(b";"):
                    if part.startswith(b"GENEINFO="):
                        for gi in part[9:].split(b"|"):
                            ci = gi.find(b":")
                            if ci != -1:
                                g = gi[:ci].decode()
                                if g not in genes:
                                    genes.append(g)
                    if part.startswith(b"CLNDISDB=") or part.startswith(b"CLNDISDBINCL="):
                        for dp in part[part.find(b"=") + 1:].replace(b",", b"|").split(b"|"):
                            if dp.startswith(b"OMIM:"):
                                diseases.append(dp.strip().decode())
                            elif dp.startswith(b"Orphanet:ORPHA"):
                                diseases.append(dp.replace(b"Orphanet:ORPHA", b"ORPHA:").strip().decode())
                            elif dp.startswith(b"Human_Phenotype_Ontology:"):
                                hpos.append(dp.replace(b"Human_Phenotype_Ontology:", b"").strip().decode())
                if not genes or (not diseases and not hpos):
                    continue
                for gene in sorted(genes):
                    gid = db.gene_to_approved_id(gene)
                    if gid == -1:
                        continue
                    approved = db.gene_symbol(gid)
                    for disease in diseases:
                        disease2genes.setdefault(disease, AnnotatedList()).add(
                            approved, "ClinVar", "", NA)
                        added_d2g += 1
                    for hpo in hpos:
                        tid = id2ngsd.get(hpo, -1)
                        if tid != -1:
                            term2genes.setdefault(tid, AnnotatedList()).add(
                                approved, "ClinVar", "", NA)
                            added_t2g += 1
        sys.stdout.write(f"Imported {added_d2g} disease-gene relations, {added_t2g} term-gene relations from ClinVar.\n")

    def _parse_hgmd(self, db, id2ngsd, term2genes, debug):
        path = self.get_infile("hgmd")
        if not path:
            return
        added_t2g = 0
        phenid2gene: dict[int, list[str]] = {}
        cui2phenid: dict[str, list[int]] = {}
        hpo2cui: dict[str, list[str]] = {}
        with _open_text(path) as fh:
            for nr, raw in enumerate(fh, start=1):
                line = raw.strip()
                if not line:
                    continue
                if line.startswith(b"INSERT INTO `concept` VALUES "):
                    value = line[31:-3].decode(errors="replace")
                    for tup in value.split("'),('"):
                        entries = tup.split("','")
                        if len(entries) != 10:
                            raise ToolError(f"Invalid number of columns in INSERT Statement in line {nr}\n{tup}")
                        if entries[2].strip() != "HPO":
                            continue
                        cui, hpo = entries[0], entries[3]
                        lst = hpo2cui.setdefault(hpo, [])
                        if cui not in lst:
                            lst.append(cui)
                elif line.startswith(b"INSERT INTO `hgmd_mutation` VALUES "):
                    value = line[36:-2].decode(errors="replace")
                    for tup in value.split("),("):
                        entries = tup.split(",")
                        if len(entries) != 3:
                            raise ToolError(f"Invalid number of columns in INSERT Statement in line {nr}\n{tup}")
                        gene_name = entries[1].strip("'\"")
                        phen_id = int(entries[2])
                        lst = phenid2gene.setdefault(phen_id, [])
                        if gene_name not in lst:
                            lst.append(gene_name)
                elif line.startswith(b"INSERT INTO `phenotype_concept` VALUES "):
                    value = line[40:-2].decode(errors="replace")
                    for tup in value.split("),("):
                        entries = tup.split(",")
                        if len(entries) != 3:
                            raise ToolError(f"Invalid number of columns in INSERT Statement in line {nr}\n{tup}")
                        cui = entries[2].strip("'\"")
                        phen_id = int(entries[0])
                        lst = cui2phenid.setdefault(cui, [])
                        if phen_id not in lst:
                            lst.append(phen_id)
        for hpo in sorted(hpo2cui):
            for cui in hpo2cui[hpo]:
                for phen_id in cui2phenid.get(cui, []):
                    for gene in phenid2gene.get(phen_id, []):
                        gid = db.gene_to_approved_id(gene)
                        if gid == -1:
                            continue
                        tid = id2ngsd.get(hpo, -1)
                        if tid != -1:
                            term2genes.setdefault(tid, AnnotatedList()).add(
                                db.gene_symbol(gid), "HGMD", "", NA)
                            added_t2g += 1
        sys.stdout.write(f"Imported {added_t2g} term-gene relations from HGMD.\n")

    def _parse_g2p(self, db, id2ngsd, disease2genes, term2diseases, term2genes):
        path = self.get_infile("g2p")
        if not path:
            return
        countT2D = countD2G = countT2G = 0
        mim_rx = re.compile(rb"([0-9]{6})")
        with _open_text(path) as fh:
            header = fh.readline().rstrip(b"\r\n")
            if len(header.split(b",")) != 24:
                raise ToolError(f"G2P file header contains {len(header.split(b','))} columns, but 24 expected!")
            for nr, raw in enumerate(fh, start=1):
                line = raw.rstrip(b"\r\n")
                parts = _reconstruct_strings(line.split(b","), 24)
                if len(parts) != 24:
                    raise ToolError(f"G2P file contains {len(parts)} columns, but 24 expected!")
                gene = parts[1].strip().decode()
                disease_num = parts[6].strip()
                disease = "OMIM:" + disease_num.decode()
                g2p_evi = parts[10].strip().decode()
                evidence = translate_d2g_evidence(g2p_evi)
                hpo_terms = [t.strip().decode() for t in parts[17].strip().split(b";")]
                gid = db.gene_to_approved_id(gene)
                if gid == -1:
                    for term in hpo_terms:
                        tid = id2ngsd.get(term, -1)
                        if tid != -1 and mim_rx.search(disease_num):
                            term2diseases.setdefault(tid, AnnotatedList()).add(
                                disease, "G2P", g2p_evi, evidence)
                            countT2D += 1
                else:
                    approved = db.gene_symbol(gid)
                    for term in hpo_terms:
                        tid = id2ngsd.get(term, -1)
                        if tid != -1:
                            term2genes.setdefault(tid, AnnotatedList()).add(
                                approved, "G2P", g2p_evi, evidence)
                            countT2G += 1
                            if mim_rx.search(disease_num):
                                term2diseases.setdefault(tid, AnnotatedList()).add(
                                    disease, "G2P", g2p_evi, evidence)
                                countT2D += 1
                    if mim_rx.search(disease_num):
                        disease2genes.setdefault(disease, AnnotatedList()).add(
                            approved, "G2P", g2p_evi, evidence)
                        countD2G += 1
        sys.stdout.write(f"Imported {countD2G} disease-gene relations, {countT2D} term-disease relations, {countT2G} term-gene relations from G2P.\n")

    def _parse_gencc(self, db, disease2genes):
        path = self.get_infile("gencc")
        if not path:
            return
        lines: list[bytes] = []
        with _open_text(path) as fh:
            fh.readline()  # header
            for raw in fh:
                line = raw.rstrip(b"\r\n")
                if line.startswith(b"SGC-"):
                    lines.append(line)
                elif lines:
                    lines[-1] += b" " + line
        c_imported = c_not_omim = c_invalid_hgnc = c_no_evidence = c_bad_parts = 0
        for line in lines:
            parts = line.split(b"\t")
            if len(parts) != 31:
                # remove tabs within double quotes
                fixed = bytearray()
                in_quotes = False
                for ch in line:
                    if ch == ord('"'):
                        in_quotes = not in_quotes
                        fixed.append(ch)
                    elif in_quotes and ch == ord("\t"):
                        continue
                    else:
                        fixed.append(ch)
                parts = bytes(fixed).split(b"\t")
                if len(parts) != 31:
                    c_bad_parts += 1
                    continue
            disease = parts[6].strip().decode()
            if not disease.startswith("OMIM:"):
                c_not_omim += 1
                continue
            gencc_evi = parts[9].strip().decode()
            evidence = translate_gencc_evidence(gencc_evi, line.decode(errors="replace"))
            if evidence in (NA, AGAINST):
                c_no_evidence += 1
                continue
            gid = db.hgnc_id_to_gene_id(parts[2].strip().decode())
            if gid == -1:
                c_invalid_hgnc += 1
                continue
            disease2genes.setdefault(disease, AnnotatedList()).add(
                db.gene_symbol(gid), "GenCC", gencc_evi, evidence)
            c_imported += 1
        sys.stdout.write(f"Imported {c_imported} disease-gene relations from GenCC\n")
        sys.stdout.write(f"  Skipped {c_not_omim} lines without OMIM term.\n")
        sys.stdout.write(f"  Skipped {c_no_evidence} lines without evidence.\n")
        sys.stdout.write(f"  Skipped {c_invalid_hgnc} lines without valid HGNC ID.\n")
        sys.stdout.write(f"  Skipped {c_bad_parts} lines without invalid part count.\n")


TOOLS = {
    "NGSDImportHPO": NGSDImportHPOTool,
}
