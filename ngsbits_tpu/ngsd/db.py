"""NGSD database access (SQLite).

Behavioral reference: ngs-bits cppNGSD/NGSD.{h,cpp}. The reference talks to
MySQL using credentials from settings.ini; this build keeps the same schema
and query surface on a single-file SQLite database. The database location
comes from the environment:

  NGSBITS_NGSD       — production database path
  NGSBITS_NGSD_TEST  — test database path (used by tools' '-test' flag)
"""

from __future__ import annotations

import datetime
import gzip
import os
import re
import sqlite3

from .sqlconvert import convert_literals, mysql_to_sqlite

_RES_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "resources")


class NgsdError(Exception):
    pass


_IMPRINTING = None


def _imprinting_genes() -> dict:
    """NGSHelper::imprintingGenes — gene -> (expressed allele, status)."""
    global _IMPRINTING
    if _IMPRINTING is None:
        _IMPRINTING = {}
        path = os.path.join(_RES_DIR, "imprinting_genes.tsv.gz")
        if os.path.exists(path):
            with gzip.open(path, "rt") as fh:
                for line in fh:
                    if line.startswith("#"):
                        continue
                    parts = line.rstrip("\r\n").split("\t")
                    if len(parts) >= 3:
                        _IMPRINTING[parts[0]] = (parts[1], parts[2])
    return _IMPRINTING


def _regexp(pattern, value):
    if value is None:
        return False
    return re.search(pattern, str(value)) is not None


class NGSD:
    def __init__(self, test_db: bool = False, path: str | None = None):
        self.test_db = test_db
        if path is None:
            env = "NGSBITS_NGSD_TEST" if test_db else "NGSBITS_NGSD"
            path = os.environ.get(env, "")
            if not path:
                raise NgsdError(
                    f"NGSD {'test ' if test_db else ''}database not configured — set the {env} environment variable to a SQLite file path!")
        self.path = path
        self.conn = sqlite3.connect(path)
        self.conn.create_function("REGEXP", 2, _regexp)
        self.conn.execute("PRAGMA foreign_keys = OFF")

    def close(self):
        self.conn.commit()
        self.conn.close()

    def commit(self):
        self.conn.commit()

    # ---- generic query API (NGSD::getValue/getValues/execute) ----
    def execute(self, query: str, params=()):
        return self.conn.execute(query, params)

    def executemany(self, query: str, seq):
        return self.conn.executemany(query, seq)

    def get_value(self, query: str, no_value_is_ok: bool = True, params=()):
        cur = self.conn.execute(query, params)
        row = cur.fetchone()
        if row is None:
            if no_value_is_ok:
                return None
            raise NgsdError(f"NGSD single value query returned no value: {query}")
        return row[0]

    def get_values(self, query: str, params=()) -> list:
        return [r[0] for r in self.conn.execute(query, params).fetchall()]

    def get_rows(self, query: str, params=()) -> list[tuple]:
        return self.conn.execute(query, params).fetchall()

    def last_insert_id(self) -> int:
        return int(self.get_value("SELECT last_insert_rowid()"))

    def table_exists(self, name: str) -> bool:
        return self.get_value(
            "SELECT count(*) FROM sqlite_master WHERE type='table' AND name=?",
            params=(name,)) > 0

    def tables(self) -> list[str]:
        return self.get_values(
            "SELECT name FROM sqlite_master WHERE type='table' AND name NOT LIKE 'sqlite_%'")

    # ---- init (NGSD::init, NGSD.cpp:4440-4500) ----
    def init(self):
        for t in self.tables():
            self.conn.execute(f"DROP TABLE {t}")
        self.run_sql_resource("ngsd_schema.sql.gz")
        self.run_sql_resource("ngsd_initial_data.sql.gz")
        self.conn.execute(
            "INSERT INTO db_info (name, value) VALUES ('init_timestamp', ?)",
            (datetime.datetime.now().isoformat(),))
        self.conn.execute(
            "INSERT INTO db_info (name, value) VALUES ('is_production', ?)",
            ("no" if self.test_db else "yes",))
        self.conn.commit()

    def run_sql_resource(self, name: str):
        with gzip.open(os.path.join(_RES_DIR, name), "rt") as fh:
            sql = fh.read()
        self.run_mysql_script(sql)

    def run_mysql_script(self, sql: str):
        """Execute a MySQL-dialect script (schema or test dump)."""
        for stmt in mysql_to_sqlite(sql):
            try:
                self.conn.execute(stmt)
            except sqlite3.Error as e:
                raise NgsdError(f"SQL error '{e}' in statement: {stmt[:300]}")
        self.conn.commit()

    def run_mysql_file(self, path: str):
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt") as fh:
            self.run_mysql_script(fh.read())

    def get_enum(self, table: str, column: str) -> list[str]:
        """Enum values of a column (from the translated schema's side table)."""
        return self.get_values(
            "SELECT value FROM _enum_values WHERE table_name=? AND column_name=? ORDER BY position",
            params=(table, column))

    def set_database_info(self, name: str, version: str):
        """NGSD::setDatabaseInfo — upsert into db_import_info with today's date."""
        self.execute(
            "INSERT INTO db_import_info (name, version, import_date) VALUES (?, ?, DATE('now')) "
            "ON CONFLICT(name) DO UPDATE SET version=excluded.version, import_date=excluded.import_date",
            (name, version))
        self.commit()

    def update_qc(self, obo_file: str, debug: bool = False):
        """NGSD::updateQC (NGSD.cpp:5927-5977)."""
        from ..core.ontology import OntologyTermCollection
        valid_types = self.get_enum("qc_terms", "type")
        with open(obo_file) as fh:
            terms = OntologyTermCollection.from_obo_text(fh.read())
        for term in terms:
            if not term.id.startswith("QC:2"):
                continue
            if term.term_type not in valid_types:
                continue
            self.execute(
                "INSERT INTO qc_terms (qcml_id, name, description, type, obsolete) VALUES (?, ?, ?, ?, ?) "
                "ON CONFLICT(qcml_id) DO UPDATE SET name=excluded.name, description=excluded.description, "
                "type=excluded.type, obsolete=excluded.obsolete",
                (term.id, term.name, term.definition, term.term_type, int(term.obsolete)))
        self.commit()
        version = terms.version or os.path.basename(obo_file)
        self.set_database_info("QC terms", version)

    # ---- domain helpers (grown as tools need them) ----
    def table_empty(self, name: str) -> bool:
        return self.get_value(f"SELECT count(*) FROM {name}") == 0

    def clear_table(self, name: str):
        self.execute(f"DELETE FROM {name}")
        self.execute("DELETE FROM sqlite_sequence WHERE name=?", (name,))

    def approved_gene_names(self) -> set:
        return set(self.get_values("SELECT symbol FROM gene"))

    def gene_to_approved_id(self, symbol: str) -> int:
        """NGSD::geneId — approved symbol, else unique previous, else unique
        synonym, else -1."""
        v = self.get_value("SELECT id FROM gene WHERE symbol=?", params=(symbol,))
        if v is not None:
            return int(v)
        for type_ in ("previous", "synonym"):
            ids = self.get_values(
                "SELECT g.id FROM gene g, gene_alias ga WHERE g.id=ga.gene_id AND ga.symbol=? "
                "AND ga.type=? ORDER BY g.id", params=(symbol, type_))
            if len(ids) == 1:
                return int(ids[0])
            if len(ids) > 1:
                return -1
        return -1

    def gene_symbol(self, gene_id: int) -> str:
        v = self.get_value("SELECT symbol FROM gene WHERE id=?", params=(gene_id,))
        return v if v is not None else ""

    def gene_to_approved(self, symbol: str, return_input_when_unconvertable: bool = False) -> str:
        gid = self.gene_to_approved_id(symbol)
        if gid != -1:
            return self.gene_symbol(gid)
        return symbol if return_input_when_unconvertable else ""

    def gene_to_approved_with_message(self, gene: str) -> tuple[str, str]:
        """NGSD::geneToApprovedWithMessage (NGSD.cpp) — exact messages."""
        if self.get_value("SELECT id FROM gene WHERE symbol=?", params=(gene,)) is not None:
            return gene, f"KEPT: {gene} is an approved symbol"
        prev = self.get_values(
            "SELECT g.symbol FROM gene g, gene_alias ga WHERE g.id=ga.gene_id AND ga.symbol=? "
            "AND ga.type='previous' ORDER BY g.id", params=(gene,))
        if len(prev) == 1:
            return prev[0], f"REPLACED: {gene} is a previous symbol"
        if len(prev) > 1:
            return gene, f"ERROR: {gene} is a previous symbol of the genes " + ", ".join(prev)
        syn = self.get_values(
            "SELECT g.symbol FROM gene g, gene_alias ga WHERE g.id=ga.gene_id AND ga.symbol=? "
            "AND ga.type='synonym' ORDER BY g.id", params=(gene,))
        if len(syn) == 1:
            return syn[0], f"REPLACED: {gene} is a synonymous symbol"
        if len(syn) > 1:
            return gene, f"ERROR: {gene} is a synonymous symbol of the genes " + ", ".join(syn)
        return gene, f"ERROR: {gene} is unknown symbol"

    def gene_to_approved_with_message_and_ambiguous(self, gene: str) -> list[tuple[str, str]]:
        """NGSD::geneToApprovedWithMessageAndAmbiguous."""
        if self.get_value("SELECT id FROM gene WHERE symbol=?", params=(gene,)) is not None:
            return [(gene, f"KEPT: {gene} is an approved symbol")]
        prev = self.get_values(
            "SELECT g.symbol FROM gene g, gene_alias ga WHERE g.id=ga.gene_id AND ga.symbol=? "
            "AND ga.type='previous' ORDER BY g.id", params=(gene,))
        if prev:
            return [(p, f"REPLACED: {gene} is a previous symbol") for p in prev]
        syn = self.get_values(
            "SELECT g.symbol FROM gene g, gene_alias ga WHERE g.id=ga.gene_id AND ga.symbol=? "
            "AND ga.type='synonym' ORDER BY g.id", params=(gene,))
        if syn:
            return [(s, f"REPLACED: {gene} is a synonymous symbol") for s in syn]
        return [(gene, f"ERROR: {gene} is an unknown symbol")]

    def transcript_id(self, name: str, throw_on_error: bool = True) -> int:
        """NGSD::transcriptId — lookup by name, retry without version suffix."""
        v = self.get_value("SELECT id FROM gene_transcript WHERE name=?", params=(name,))
        if v is None and "." in name:
            v = self.get_value("SELECT id FROM gene_transcript WHERE name=?",
                               params=(name.split(".")[0],))
        if v is None:
            if not throw_on_error:
                return -1
            raise NgsdError(f"No transcript with name '{name}' found in NGSD!")
        return int(v)

    # ---- transcript cache (NGSD::initTranscriptCache, NGSD.cpp:10998-11100) ----
    def _transcript_cache(self):
        if getattr(self, "_tcache", None) is not None:
            return self._tcache
        from ..core.chromosome import Chromosome
        from ..core.intervals import BedFile, BedLine
        from ..core.transcripts import Transcript
        pts = set(self.get_values("SELECT DISTINCT name FROM preferred_transcripts"))
        coords: dict[int, list[tuple[int, int]]] = {}
        for tid, s, e in self.get_rows("SELECT transcript_id, start, end FROM gene_exon ORDER BY start, end"):
            coords.setdefault(tid, []).append((s, e))
        transcripts = []
        name2id = {}
        for row in self.get_rows(
                "SELECT t.id, g.symbol, t.name, t.source, t.strand, t.chromosome, "
                "t.start_coding, t.end_coding, t.biotype, t.is_gencode_basic, "
                "t.is_gencode_primary, t.is_ensembl_canonical, t.is_mane_select, "
                "t.is_mane_plus_clinical, t.version, g.ensembl_id, t.gene_id "
                "FROM gene_transcript t, gene g WHERE t.gene_id=g.id"):
            (tid, symbol, name, source, strand, chrom, cs, ce, biotype,
             basic, primary, canonical, mane_sel, mane_plus, version, ensg, gene_db_id) = row
            chr_ = Chromosome("chr" + str(chrom))
            regions = BedFile()
            for s, e in coords.get(tid, []):
                regions.append(BedLine(chr_, s, e))
            cs = cs or 0
            ce = ce or 0
            if strand == "-":
                cs, ce = ce, cs
            t = Transcript(name=name, version=version or 0, gene=symbol,
                           gene_id=ensg or "", source=source, chr=chr_, strand=strand,
                           biotype=biotype, regions=regions,
                           coding_start=cs, coding_end=ce,
                           is_gencode_basic=bool(basic), is_gencode_primary=bool(primary),
                           is_ensembl_canonical=bool(canonical),
                           is_mane_select=bool(mane_sel),
                           is_mane_plus_clinical=bool(mane_plus))
            t.is_preferred = name in pts
            t.db_id = tid
            t.gene_db_id = gene_db_id
            transcripts.append(t)
            name2id[name] = tid
        transcripts.sort(key=lambda t: (t.chr.num, t.start(), t.end(), t.name))
        id2trans = {t.db_id: t for t in transcripts}
        symbol2trans: dict[str, list] = {}
        for t in transcripts:
            symbol2trans.setdefault(t.gene, []).append(t)
        self._tcache = (transcripts, name2id, id2trans, symbol2trans)
        return self._tcache

    def clear_transcript_cache(self):
        self._tcache = None

    def transcript(self, tid: int):
        return self._transcript_cache()[2][tid]

    def transcripts(self, gene_id: int, source: str, coding_only: bool = False) -> list:
        """NGSD::transcripts — all transcripts of a gene from one source,
        sorted by position."""
        symbol = self.gene_symbol(gene_id)
        out = [t for t in self._transcript_cache()[3].get(symbol, [])
               if t.source == source and (not coding_only or t.is_coding())]
        return out

    def transcripts_overlapping(self, chr_, start: int, end: int, extend: int = 0,
                                source: str = "ensembl") -> list:
        out = []
        for t in self._transcript_cache()[0]:
            if t.source != source:
                continue
            if t.chr == chr_ and t.start() - extend <= end and t.end() + extend >= start:
                out.append(t)
        return out

    def gene_to_regions(self, gene: str, source: str, mode: str, fallback: bool = False,
                        annotate_transcript_names: bool = False, messages=None):
        """NGSD::geneToRegions."""
        from ..core.intervals import BedFile, BedLine
        if mode not in ("gene", "exon"):
            raise NgsdError(f"Invalid mode '{mode}'. Valid modes are: gene, exon.")
        output = BedFile()
        gid = self.gene_to_approved_id(gene)
        if gid == -1:
            if messages:
                messages.write(f"Gene name '{gene}' is no HGNC-approved symbol. Skipping it!\n")
            return output
        annos = [self.gene_symbol(gid).encode()]
        sources = [source] + ([("ccds" if source == "ensembl" else "ensembl")] if fallback else [])
        for cur in sources:
            for trans in self.transcripts(gid, cur, False):
                if annotate_transcript_names:
                    annos = [(trans.gene + " " + trans.name_with_version()).encode()]
                if mode == "gene":
                    output.append(BedLine(trans.chr, trans.start(), trans.end(), list(annos)))
                else:
                    regs = trans.coding_regions() if trans.is_coding() else trans.regions
                    for l in regs.lines:
                        output.append(BedLine(l.chr, l.start, l.end, list(annos)))
            if cur == source and len(output):
                break
        if not len(output) and messages is not None:
            messages.write(f"No transcripts found for gene '{gene}'. Skipping it!\n")
        if not output.is_sorted():
            output.sort()
        if not annotate_transcript_names:
            output.remove_duplicates()
        return output

    def genes_to_regions(self, genes, source: str, mode: str, fallback: bool = False,
                         annotate_transcript_names: bool = False, messages=None):
        """NGSD::genesToRegions."""
        from ..core.intervals import BedFile
        output = BedFile()
        for gene in genes:
            output.add(self.gene_to_regions(gene, source, mode, fallback,
                                            annotate_transcript_names, messages))
        if not output.is_sorted():
            output.sort()
        if not annotate_transcript_names:
            output.remove_duplicates()
        return output

    def best_transcript(self, gene_id: int):
        """NGSD::bestTranscript(gene_id) — preferred > MANE select > MANE plus
        clinical > Ensembl canonical > longest coding > longest; None if no
        transcripts."""
        trans = self.transcripts(gene_id, "ensembl", False)
        for pred in (lambda t: t.is_preferred, lambda t: t.is_mane_select,
                     lambda t: t.is_mane_plus_clinical, lambda t: t.is_ensembl_canonical):
            tmp = [t for t in trans if pred(t)]
            if tmp:
                return tmp[0]
        by_coding = sorted(trans, key=lambda t: -t.coding_regions().base_count())
        tmp = [t for t in by_coding if t.is_coding()]
        if tmp:
            return tmp[0]
        by_bases = sorted(trans, key=lambda t: -t.regions.base_count())
        return by_bases[0] if by_bases else None

    def relevant_transcripts(self, gene_id: int) -> list:
        """NGSD::relevantTranscripts."""
        tmp = self.transcripts(gene_id, "ensembl", False)
        out = []
        for pred in (lambda t: t.is_preferred, lambda t: t.is_mane_select,
                     lambda t: t.is_mane_plus_clinical, lambda t: t.is_ensembl_canonical):
            for t in tmp:
                if pred(t) and t not in out:
                    out.append(t)
        if not out:
            best = self.best_transcript(gene_id)
            if best is not None:
                out.append(best)
        return out

    def transcript_to_regions(self, name: str, mode: str):
        tid = self.transcript_id(name, True)
        t = self.transcript(tid)
        from ..core.intervals import BedFile, BedLine
        out = BedFile()
        annos = [(t.gene + " " + t.name_with_version()).encode()]
        if mode == "gene":
            out.append(BedLine(t.chr, t.start(), t.end(), annos))
        elif mode == "exon":
            regs = t.coding_regions() if t.is_coding() else t.regions
            for l in regs.lines:
                out.append(BedLine(l.chr, l.start, l.end, list(annos)))
        else:
            raise NgsdError(f"Invalid mode for convertring transcript to region: '{mode}'. Valid modes are: gene, exon.")
        if not out.is_sorted():
            out.sort()
        return out

    def hgnc_id_to_gene_id(self, hgnc_id: str) -> int:
        """NGSD::hgncIdToGeneId — 'HGNC:123' or '123' -> gene.id or -1."""
        hgnc_id = hgnc_id.strip()
        if ":" in hgnc_id:
            hgnc_id = hgnc_id.split(":")[-1]
        if not hgnc_id.isdigit():
            return -1
        v = self.get_value("SELECT id FROM gene WHERE hgnc_id=?", params=(hgnc_id,))
        return int(v) if v is not None else -1

    # ---- phenotype (HPO) helpers ----
    def phenotype_id_by_accession(self, accession: str, throw_on_error: bool = True) -> int:
        v = self.get_value("SELECT id FROM hpo_term WHERE hpo_id=?", params=(accession,))
        if v is None:
            if throw_on_error:
                raise NgsdError(f"No HPO term with accession '{accession}' found in NGSD!")
            return -1
        return int(v)

    def phenotype_id_by_name(self, name: str, throw_on_error: bool = True) -> int:
        v = self.get_value("SELECT id FROM hpo_term WHERE name=?", params=(name,))
        if v is None:
            if throw_on_error:
                raise NgsdError(f"No HPO term with name '{name}' found in NGSD!")
            return -1
        return int(v)

    def phenotype_accession(self, term_id: int) -> str:
        return self.get_value("SELECT hpo_id FROM hpo_term WHERE id=?", params=(term_id,)) or ""

    def phenotype_name(self, term_id: int) -> str:
        return self.get_value("SELECT name FROM hpo_term WHERE id=?", params=(term_id,)) or ""

    def phenotype_child_terms(self, term_id: int, recursive: bool) -> list[int]:
        """NGSD::phenotypeChildTerms — child term db ids (BFS order like the
        reference's stack walk)."""
        parent_map: dict[int, list[int]] = {}
        for p, c in self.get_rows("SELECT parent, child FROM hpo_parent"):
            parent_map.setdefault(p, []).append(c)
        out = []
        stack = [term_id]
        while stack:
            cur = stack.pop()
            for child in parent_map.get(cur, []):
                out.append(child)
                if recursive:
                    stack.append(child)
        return out

    def phenotype_to_genes(self, term_id: int, recursive: bool,
                           ignore_non_phenotype_terms: bool = True):
        """NGSD::phenotypeToGenes — GeneSet of genes of the term (and its
        children when recursive)."""
        from ..core.geneset import GeneSet
        ignored = set()
        if ignore_non_phenotype_terms:
            for acc in ("HP:0000005", "HP:0040279"):
                tid = self.phenotype_id_by_accession(acc, False)
                if tid != -1:
                    ignored.add(tid)
                    ignored.update(self.phenotype_child_terms(tid, True))
        ids = [term_id]
        if recursive:
            ids += self.phenotype_child_terms(term_id, True)
        out = GeneSet()
        for tid in ids:
            if tid in ignored:
                continue
            out.insert_all(self.get_values(
                "SELECT gene FROM hpo_genes WHERE hpo_term_id=?", params=(tid,)))
        return out

    def phenotype_to_genes_by_source_and_evidence(
            self, term_id: int, sources: set, evidences: set,
            recursive: bool = True, ignore_non_phenotype_terms: bool = False):
        """NGSD::phenotypeToGenesbySourceAndEvidence."""
        from ..core.geneset import GeneSet
        ALL_SOURCES = {"HPO", "OMIM", "ClinVar", "G2P", "HGMD", "GenCC"}
        ALL_EVIDENCES = {"n/a", "low", "medium", "high"}
        ignored = set()
        if ignore_non_phenotype_terms:
            for acc in ("HP:0000005", "HP:0040279"):
                tid = self.phenotype_id_by_accession(acc, False)
                if tid != -1:
                    ignored.add(tid)
                    ignored.update(self.phenotype_child_terms(tid, True))
        ids = [term_id]
        if recursive:
            ids += self.phenotype_child_terms(term_id, True)
        genes = GeneSet()
        for tid in ids:
            if ignore_non_phenotype_terms and tid in ignored:
                continue
            query = f"SELECT gene FROM hpo_genes WHERE hpo_term_id={tid}"
            restricted = False
            if sources and len(sources) < len(ALL_SOURCES):
                query += " and (" + " or ".join(f"details like '%{s}%'" for s in sources) + ")"
                restricted = True
            if evidences and len(evidences) < len(ALL_EVIDENCES):
                query += " and (" + " or ".join(f"evidence= '{e}'" for e in evidences) + ")"
                restricted = True
            _ = restricted
            for gene in self.get_values(query):
                genes.insert(self.gene_to_approved(gene, True))
        return genes

    def phenotypes_of_gene(self, symbol: str, sort_by_relevance: bool = False) -> list[tuple[str, str]]:
        """NGSD::phenotypes(symbol) — list of (accession, name); sorted by
        name unless sort_by_relevance."""
        if sort_by_relevance:
            rows = self.get_rows("SELECT hpo_term_id, details FROM hpo_genes WHERE gene=?",
                                 params=(symbol,))
            scored = []
            for tid, details in rows:
                score = 0
                for part in (details or "").split(";"):
                    part = part.strip()
                    if not part:
                        continue
                    if part.endswith("high)"):
                        score += 4
                    elif part.endswith("medium)"):
                        score += 2
                    else:
                        score += 1
                scored.append((tid, score))
            scored.sort(key=lambda p: -p[1])
            ids = [tid for tid, _s in scored]
        else:
            ids = self.get_values("SELECT hpo_term_id FROM hpo_genes WHERE gene=?",
                                  params=(symbol,))
        out = [(self.phenotype_accession(i), self.phenotype_name(i)) for i in ids]
        if not sort_by_relevance:
            out.sort(key=lambda p: p[1])
        return out

    def omim_info(self, symbol: str) -> list[dict]:
        """NGSD::omimInfo — per omim_gene entry: mim, gene, phenotypes."""
        import re as _re
        approved = self.gene_to_approved(symbol, True)
        ids = self.get_values(
            "SELECT id FROM omim_gene WHERE gene=? OR gene=? ORDER BY mim",
            params=(symbol, approved))
        out = []
        mim_rx = _re.compile(r"[^0-9]([0-9]{6})[^0-9]")
        for gid in ids:
            info = {"mim": self.get_value("SELECT mim FROM omim_gene WHERE id=?", params=(gid,)),
                    "gene_symbol": self.get_value("SELECT gene FROM omim_gene WHERE id=?", params=(gid,)),
                    "phenotypes": []}
            for pheno in self.get_values(
                    "SELECT phenotype FROM omim_phenotype WHERE omim_gene_id=? ORDER BY phenotype ASC",
                    params=(gid,)):
                m = mim_rx.search(pheno)
                info["phenotypes"].append({"name": pheno, "accession": m.group(1) if m else ""})
            out.append(info)
        return out

    def gene_info(self, symbol: str) -> dict:
        """NGSD::geneInfo (NGSD.cpp:9922+) — subset used by tools/tests."""
        approved, notice = self.gene_to_approved_with_message(symbol.strip())
        out = {"symbol": approved, "symbol_notice": notice,
               "imprinting_expressed_allele": "", "imprinting_confidence": "",
               "pseudogenes": []}
        imprinting = _imprinting_genes()
        if symbol.strip() in imprinting:
            out["imprinting_expressed_allele"], out["imprinting_confidence"] = imprinting[symbol.strip()]
        row = self.get_rows("SELECT id, name, hgnc_id, type FROM gene WHERE symbol=?",
                            params=(approved,))
        if row:
            out["name"] = row[0][1]
            out["hgnc_id"] = f"HGNC:{row[0][2]}"
            out["locus_group"] = row[0][3]
        else:
            out["name"] = out["hgnc_id"] = out["locus_group"] = ""
        row = self.get_rows(
            "SELECT inheritance, gnomad_oe_syn, gnomad_oe_mis, gnomad_oe_lof, gnomad_pli, comments "
            "FROM geneinfo_germline WHERE symbol=?", params=(approved,))
        if row:
            inh, syn, mis, lof, pli, comments = row[0]
            out["inheritance"] = inh
            out["oe_syn"] = "n/a" if syn is None else f"{float(syn):.2f}"
            out["oe_mis"] = "n/a" if mis is None else f"{float(mis):.2f}"
            out["oe_lof"] = "n/a" if lof is None else f"{float(lof):.2f}"
            out["pli"] = "n/a" if pli is None else f"{float(pli):.2f}"
            out["comments"] = comments
        else:
            out["inheritance"] = out["oe_syn"] = out["oe_mis"] = out["oe_lof"] = out["pli"] = "n/a"
            out["comments"] = ""
        # pseudogene info (first relation only, like the reference)
        gid = self.get_value("SELECT id FROM gene WHERE symbol=?", params=(approved,))
        if gid is not None:
            rows = self.get_rows(
                "SELECT g.symbol, gps.gene_name FROM gene_pseudogene_relation gps "
                "LEFT JOIN gene g ON gps.pseudogene_gene_id=g.id WHERE parent_gene_id=?",
                params=(gid,))
            if rows:
                hgnc_symbol = (rows[0][0] or "").strip()
                if hgnc_symbol:
                    out["pseudogenes"].append(hgnc_symbol)
                else:
                    parts = (rows[0][1] or "").split(";")
                    out["pseudogenes"].append(parts[1] if len(parts) > 1 else "")
        return out

    def previous_symbols(self, gene_id: int) -> list[str]:
        return sorted(set(self.get_values(
            "SELECT symbol FROM gene_alias WHERE gene_id=? AND type='previous'", params=(gene_id,))))

    def synonymous_symbols(self, gene_id: int) -> list[str]:
        return sorted(set(self.get_values(
            "SELECT symbol FROM gene_alias WHERE gene_id=? AND type='synonym'", params=(gene_id,))))
