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
import math
import gzip
import os
import re
import sqlite3

from .sqlconvert import convert_literals, mysql_to_sqlite

_RES_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "resources")


class NgsdError(Exception):
    pass


class _StdAggregate:
    """MySQL STD() — population standard deviation."""

    def __init__(self):
        self.values = []

    def step(self, value):
        if value is not None:
            self.values.append(float(value))

    def finalize(self):
        n = len(self.values)
        if n == 0:
            return None
        mean = sum(self.values) / n
        return math.sqrt(sum((v - mean) ** 2 for v in self.values) / n)


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
        # serialized threadsafety (level 3) lets the REST server's handler
        # threads share this connection safely
        check_same_thread = sqlite3.threadsafety < 3
        self.conn = sqlite3.connect(path, check_same_thread=check_same_thread)
        self.conn.create_function("REGEXP", 2, _regexp)
        # MySQL functions the reference queries rely on
        self.conn.create_function("CONCAT", -1, lambda *a: "".join("" if x is None else str(x) for x in a))
        self.conn.create_function("LPAD", 3, lambda s, n, p: str(s).rjust(int(n), str(p)))
        self.conn.create_function("LOG2", 1, lambda x: math.log2(x) if x is not None else None)
        self.conn.create_aggregate("STD", 1, _StdAggregate)
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

    @staticmethod
    def escape_text(text: str) -> str:
        """NGSD::escapeText — SQL string literal ('...' with doubled quotes)."""
        return "'" + str(text).replace("'", "''") + "'"

    def row_exists(self, table: str, row_id: int) -> bool:
        """NGSD::rowExists."""
        return self.get_value(
            f"SELECT count(*) FROM {table} WHERE id=?", params=(row_id,)) > 0

    def next_processing_id(self, sample_id) -> str:
        """NGSD::nextProcessingId — max(process_id)+1 for the sample."""
        max_num = self.get_value(
            "SELECT MAX(process_id) FROM processed_sample WHERE sample_id=?",
            params=(sample_id,))
        return "1" if max_num is None else str(int(max_num) + 1)

    def genes_overlapping_by_exon(self, chr_, start: int, end: int,
                                  extend: int = 0):
        """NGSD::genesOverlappingByExon — genes with an exon overlapping the
        (extended) region."""
        from ..core.geneset import GeneSet
        genes = GeneSet()
        for t in self._transcript_cache()[0]:
            if t.chr != chr_:
                continue
            for line in t.regions.lines:
                if line.start <= end + extend and line.end >= start - extend:
                    genes.insert(t.gene)
                    break
        return genes

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

    def longest_coding_transcript(self, gene_id: int, source: str,
                                  fallback_alt_source: bool = False,
                                  fallback_noncoding: bool = False):
        """NGSD::longestCodingTranscript — coding transcript with the most
        coding bases; None when the gene has no coding transcript."""
        trans = [t for t in self.transcripts(gene_id, source, True)
                 if t.is_coding()]
        if not trans and fallback_alt_source:
            alt = "ccds" if source == "ensembl" else "ensembl"
            trans = [t for t in self.transcripts(gene_id, alt, True)
                     if t.is_coding()]
        if not trans:
            return None
        return max(trans, key=lambda t: t.coding_regions().base_count())

    def gene_id_of_transcript(self, name: str, throw_on_error: bool = True) -> int:
        """NGSD::geneIdOfTranscript."""
        v = self.get_value("SELECT gene_id FROM gene_transcript WHERE name=?",
                           params=(name,))
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
                    if trans.start() == 0 and trans.end() == 0:
                        continue  # transcript without exon rows (incomplete fixture DB)
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

    @staticmethod
    def highest_impact_transcript(transcripts: list, var_transcripts: list):
        """NGSD::highestImpactTranscript (NGSD.cpp:7733-7764) — among the
        candidate transcripts pick the one with the highest variant impact."""
        if not transcripts:
            return None
        if not var_transcripts or len(transcripts) == 1:
            return transcripts[0]
        impact_rank = {"HIGH": 3, "MODERATE": 2, "LOW": 1, "MODIFIER": 0}
        by_name = {t.name: t for t in transcripts}
        current_impact = "MODIFIER"
        current = None
        for vt in var_transcripts:
            name = vt.id_without_version()
            if isinstance(name, bytes):
                name = name.decode()
            if name in by_name and (current is None
                                    or impact_rank.get(current_impact, 0)
                                    < impact_rank.get(vt.impact, 0)):
                current_impact = vt.impact
                current = by_name[name]
        return current if current is not None else transcripts[0]

    def best_transcript(self, gene_id: int, var_transcripts: list = ()):
        """NGSD::bestTranscript(gene_id[, var_transcripts]) — preferred >
        MANE select > MANE plus clinical > Ensembl canonical > longest coding
        > longest; ties broken by the highest variant impact; None if no
        transcripts."""
        trans = self.transcripts(gene_id, "ensembl", False)
        for pred in (lambda t: t.is_preferred, lambda t: t.is_mane_select,
                     lambda t: t.is_mane_plus_clinical, lambda t: t.is_ensembl_canonical):
            tmp = [t for t in trans if pred(t)]
            if tmp:
                return self.highest_impact_transcript(tmp, list(var_transcripts))
        by_coding = sorted(trans, key=lambda t: -t.coding_regions().base_count())
        tmp = [t for t in by_coding if t.is_coding()]
        if tmp:
            return self.highest_impact_transcript(tmp, list(var_transcripts))
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

    # ---- sample layer (NGSD.cpp sample/processed_sample helpers) ----
    def sample_id(self, name: str, throw_if_fails: bool = True) -> str:
        base = os.path.basename(name).split(".")[0]
        sample = (base + "_").split("_")[0]
        v = self.get_value("SELECT id FROM sample WHERE name=?", params=(sample,))
        if v is None:
            if throw_if_fails:
                raise NgsdError(f"Sample name '{sample}' not found in NGSD!")
            return ""
        return str(v)

    def processed_sample_id(self, name: str, throw_if_fails: bool = True) -> str:
        base = os.path.basename(name.strip()).split(".")[0]
        parts = (base + "_").split("_")
        sample, ps_num = parts[0], parts[1][:2]
        try:
            pid = int(ps_num)
        except ValueError:
            pid = 0
        v = self.get_value(
            "SELECT ps.id FROM processed_sample ps, sample s WHERE s.name=? AND ps.sample_id=s.id AND ps.process_id=?",
            params=(sample, pid))
        if v is None:
            if throw_if_fails:
                raise NgsdError(f"Processed sample '{name}' not found in NGSD!")
            return ""
        return str(v)

    def processed_sample_name(self, ps_id) -> str:
        v = self.get_value(
            "SELECT CONCAT(s.name,'_',LPAD(ps.process_id,2,'0')) FROM processed_sample ps, sample s "
            "WHERE ps.sample_id=s.id AND ps.id=?", params=(ps_id,))
        return v or ""

    def normal_sample(self, ps_id) -> str:
        v = self.get_value("SELECT normal_id FROM processed_sample WHERE id=?", params=(ps_id,))
        return self.processed_sample_name(v) if v is not None else ""

    def rna(self, ps_id, throw_on_error: bool = True) -> str:
        """NGSD::rna (NGSD.cpp:961-995).

        NOTE: replicates the reference's lookup of sample_relations with the
        given (processed-sample) id, as relatedSamples is called with ps_id.
        """
        rna_sample_ids = self.related_samples(int(ps_id), "same sample", "RNA")
        rna_ps_ids = []
        for rna_s_id in rna_sample_ids:
            rna_ps_ids.extend(self.get_values(
                "SELECT ps.id FROM processed_sample ps WHERE sample_id=?", params=(rna_s_id,)))
        newest = "2000-01-01"
        newest_rna_ps_id = -1
        for rna_ps_id in rna_ps_ids:
            date = self.get_value(
                "SELECT r.start_date FROM processed_sample ps, sequencing_run r "
                "WHERE r.id=ps.sequencing_run_id AND ps.id=?", params=(rna_ps_id,))
            if date is not None and newest < str(date):
                newest = str(date)
                newest_rna_ps_id = rna_ps_id
        if newest_rna_ps_id != -1:
            return self.processed_sample_name(newest_rna_ps_id)
        if throw_on_error:
            raise NgsdError(f"Could not find RNA sample of {self.processed_sample_name(ps_id)}!")
        return ""

    def get_qc_data(self, ps_id) -> dict:
        """NGSD::getQCData (NGSD.cpp:4697-4735) — {qcml_id: value-string}."""
        out = {}
        for name, value, qcml_id in self.get_rows(
                "SELECT n.name, nm.value, n.qcml_id FROM processed_sample_qc nm, qc_terms n "
                "WHERE nm.processed_sample_id=? AND nm.qc_terms_id=n.id AND n.obsolete=0 "
                "ORDER BY n.qcml_id", params=(ps_id,)):
            out[str(qcml_id)] = str(value)
        return out

    def studies(self, ps_id) -> list[str]:
        return sorted(self.get_values(
            "SELECT s.name FROM study s, study_sample ss WHERE s.id=ss.study_id AND ss.processed_sample_id=?",
            params=(ps_id,)))

    def variant_calling_info(self, ps_id) -> dict:
        out = {}
        for key, table in (("small", "small_variants_callset"), ("cnv", "cnv_callset"),
                           ("sv", "sv_callset"), ("re", "re_callset")):
            rows = self.get_rows(
                f"SELECT caller, caller_version, call_date FROM {table} WHERE processed_sample_id=?",
                params=(ps_id,))
            if rows:
                caller, version, date = rows[0]
                out[key] = ((caller or "").strip(), (version or "").strip(),
                            (str(date)[:10] if date else ""))
            else:
                out[key] = ("", "", "")
        return out

    def report_config_id(self, ps_id) -> int:
        v = self.get_value("SELECT id FROM report_configuration WHERE processed_sample_id=?",
                           params=(ps_id,))
        return int(v) if v is not None else -1

    def genes_overlapping(self, chr_, start: int, end: int, extend: int = 0):
        """NGSD::genesOverlapping — GeneSet of genes whose transcripts overlap
        the (extended) region."""
        from ..core.geneset import GeneSet
        genes = GeneSet()
        for t in self._transcript_cache()[0]:
            if t.chr == chr_ and t.start() <= end + extend and t.end() >= start - extend:
                genes.insert(t.gene)
        return genes

    def report_config_summary_text(self, ps_id) -> str:
        """NGSD::reportConfigSummaryText (small-variant part; CNV/SV summaries
        follow the same pattern once those import tools exist)."""
        from ..core.chromosome import Chromosome
        rc_id = self.report_config_id(ps_id)
        if rc_id == -1:
            return ""
        output = "exists"
        for var_id, in self.get_rows(
                "SELECT variant_id FROM report_configuration_variant WHERE causal='1' AND report_configuration_id=?",
                params=(rc_id,)):
            row = self.get_rows("SELECT chr, start, end, ref, obs FROM variant WHERE id=?",
                                params=(var_id,))
            if not row:
                continue
            chrom, start, end, ref, obs = row[0]
            genotype = self.get_value(
                "SELECT genotype FROM detected_variant WHERE processed_sample_id=? AND variant_id=?",
                params=(ps_id, var_id)) or ""
            genes = self.genes_overlapping(Chromosome(str(chrom)), int(start), int(end), 5000).join(", ")
            var_class = self.get_value(
                "SELECT class FROM variant_classification WHERE variant_id=?", params=(var_id,)) or ""
            output += f", causal variant: {chrom}:{start}-{end} {ref}>{obs} (genotype:{genotype} genes:{genes}"
            if var_class:
                output += f" classification:{var_class}"
            output += ")"
        return output

    def same_samples(self, sample_id: int, mode: str = "SAME_PATIENT") -> set:
        """NGSD::sameSamples — transitive same-sample/same-patient clusters."""
        relations = ("'same sample'", "'same sample', 'same patient'")[mode == "SAME_PATIENT"]
        id2same: dict[int, set] = {}
        for id1, id2 in self.get_rows(
                f"SELECT sample1_id, sample2_id FROM sample_relations WHERE relation IN ({relations})"):
            id2same.setdefault(id1, set()).add(id2)
            id2same.setdefault(id2, set()).add(id1)
        same: dict[int, set] = {}
        for s1 in id2same:
            if s1 in same:
                continue
            cluster = {s1}
            size_before = -1
            while size_before != len(cluster):
                size_before = len(cluster)
                for sid in list(cluster):
                    cluster |= id2same.get(sid, set())
            for sid in cluster:
                same[sid] = cluster - {sid}
        if mode == "SAME_PATIENT":
            by_patient: dict[str, set] = {}
            for sid, patient in self.get_rows(
                    "SELECT id, patient_identifier FROM sample WHERE patient_identifier IS NOT NULL AND patient_identifier!=''"):
                patient = str(patient).strip()
                if patient:
                    by_patient.setdefault(patient, set()).add(sid)
            for ids in by_patient.values():
                if len(ids) < 2:
                    continue
                combined = set()
                for sid in ids:
                    combined.add(sid)
                    combined |= same.get(sid, set())
                for sid in combined:
                    same[sid] = combined - {sid}
        return same.get(sample_id, set())

    def sample_phenotypes(self, sample_id) -> list:
        """NGSD::samplePhenotypes — [(accession, name)] of HPO disease infos."""
        out = []
        for acc in self.get_values(
                "SELECT disease_info FROM sample_disease_info WHERE sample_id=? AND type='HPO term id'",
                params=(sample_id,)):
            name = self.get_value("SELECT name FROM hpo_term WHERE hpo_id=?", params=(acc,))
            if name is not None:
                out.append((acc, name))
        return out

    def get_sample_data(self, sample_id) -> dict:
        rows = self.get_rows(
            "SELECT s.name, s.name_external, s.gender, s.quality, s.comment, s.disease_group, "
            "s.disease_status, s.tumor, s.ffpe, s.sample_type, s.tissue, s.patient_identifier, "
            "s.year_of_birth, s.received, s.order_date, s.sampling_date "
            "FROM sample s WHERE id=?", params=(sample_id,))
        if not rows:
            raise NgsdError(f"Invalid 'id' for table 'sample' given: '{sample_id}'")
        r = rows[0]
        return {"name": (r[0] or "").strip(), "name_external": (r[1] or "").strip(),
                "gender": r[2], "quality": r[3], "comments": (r[4] or "").strip(),
                "disease_group": (r[5] or "").strip(), "disease_status": (r[6] or "").strip(),
                "is_tumor": str(r[7]) == "1", "is_ffpe": str(r[8]) == "1",
                "type": r[9], "tissue": r[10], "patient_identifier": r[11],
                "year_of_birth": str(r[12]) if r[12] is not None else "",
                "received_date": _qt_date(r[13]), "order_date": _qt_date(r[14]),
                "sampling_date": _qt_date(r[15]),
                # HPO phenotypes (SampleData::phenotypes): "HP:... - name"
                "phenotypes": [
                    f"{acc} - {self.get_value('SELECT name FROM hpo_term WHERE hpo_id=?', params=(acc,)) or ''}"
                    for _t, acc in self.get_sample_disease_info(sample_id, "HPO term id")]}

    def get_processed_sample_data(self, ps_id) -> dict:
        rows = self.get_rows(
            "SELECT CONCAT(s.name,'_',LPAD(ps.process_id,2,'0')), sys.name_manufacturer, sys.type, "
            "ps.quality, ps.comment, p.name, p.type, r.name, ps.normal_id, s.gender, "
            "ps.processing_modus, ps.batch_number "
            "FROM sample s, project p, processing_system sys, "
            "processed_sample ps LEFT JOIN sequencing_run r ON ps.sequencing_run_id=r.id "
            "WHERE ps.sample_id=s.id AND ps.project_id=p.id AND ps.processing_system_id=sys.id AND ps.id=?",
            params=(ps_id,))
        if not rows:
            raise NgsdError(f"Invalid 'id' for table 'processed_sample' given: '{ps_id}'")
        r = rows[0]
        return {"name": (r[0] or "").strip(), "processing_system": (r[1] or "").strip(),
                "processing_system_type": (r[2] or "").strip(), "quality": (r[3] or "").strip(),
                "comments": (r[4] or "").strip(), "project_name": (r[5] or "").strip(),
                "project_type": (r[6] or "").strip(), "run_name": (r[7] or "").strip(),
                "normal_sample_name": self.processed_sample_name(r[8]) if r[8] is not None else "",
                "gender": (r[9] or "").strip(),
                "processing_modus": (r[10] or "").strip(),
                "batch_number": (r[11] or "").strip(),
                "ancestry": str(self.get_value(
                    "SELECT population FROM processed_sample_ancestry WHERE processed_sample_id=?",
                    params=(ps_id,)) or "")}

    def processed_sample_search(self, p: dict):
        """NGSD::processedSampleSearch (NGSD.cpp:280-745) — returns
        (headers, rows, ps_ids)."""
        def esc(v):
            return str(v).replace("'", "''")

        ps_override = p.get("ps_override") or []
        fields = ["ps.id",
                  "CONCAT(s.name,'_',LPAD(ps.process_id,2,'0')) as name",
                  "s.name_external", "s.gender", "s.tumor", "s.ffpe", "ps.quality",
                  "psa.population", "sys.name_manufacturer", "sys.name_short", "sys.type",
                  "p.name", "p.type", "r.name", "r.fcid", "r.flowcell_type", "r.recipe",
                  "r.quality", "s.disease_group", "s.disease_status", "s.tissue"]
        headers = ["name", "name_external", "gender", "is_tumor", "is_ffpe", "quality",
                   "ancestry", "system_name", "system_name_short", "system_type",
                   "project_name", "project_type", "run_name", "run_flowcell_id",
                   "run_flowcell_type", "run_recipe", "run_quality", "disease_group",
                   "disease_status", "tissue"]
        tables = ["sample s", "processing_system sys", "project p",
                  "processed_sample ps LEFT JOIN sequencing_run r ON r.id=ps.sequencing_run_id "
                  "LEFT JOIN diag_status ds ON ds.processed_sample_id=ps.id "
                  "LEFT JOIN processed_sample_ancestry psa ON psa.processed_sample_id=ps.id "
                  "LEFT JOIN user u ON ps.operator_id=u.id"]
        conditions = ["ps.sample_id=s.id", "ps.processing_system_id=sys.id", "ps.project_id=p.id"]

        if not ps_override:
            if p.get("s_name", "").strip():
                pattern = esc(p["s_name"])
                if pattern.startswith("*"):
                    pattern = "%" + pattern[1:]
                if pattern.endswith("*"):
                    pattern = pattern[:-1] + "%"
                if not pattern.startswith("%") and not pattern.endswith("%"):
                    pattern = "%" + pattern + "%"
                name_conds = [f"s.name LIKE '{pattern}'"]
                if p.get("s_name_ext"):
                    name_conds.append(f"s.name_external LIKE '%{esc(p['s_name'])}%'")
                conditions.append("(" + " OR ".join(name_conds) + ")")
            if p.get("s_species", "").strip():
                tables.append("species sp")
                conditions += ["sp.id=s.species_id", f"sp.name='{esc(p['s_species'])}'"]
            if p.get("s_sender", "").strip():
                tables.append("sender se")
                conditions += ["se.id=s.sender_id", f"se.name='{esc(p['s_sender'])}'"]
            if p.get("s_study", "").strip():
                tables += ["study st", "study_sample sts"]
                conditions += ["st.id=sts.study_id", "sts.processed_sample_id=ps.id",
                               f"st.name='{esc(p['s_study'])}'"]
            for key, cond in (("s_disease_group", "s.disease_group"),
                              ("s_disease_status", "s.disease_status"),
                              ("s_tissue", "s.tissue"),
                              ("s_ancestry", "psa.population")):
                if p.get(key, "").strip():
                    conditions.append(f"{cond}='{esc(p[key])}'")
            if not p.get("include_bad_quality_samples", True):
                conditions.append("ps.quality!='bad'")
            if not p.get("include_scheduled_for_resequencing_samples", True):
                conditions.append("ps.scheduled_for_resequencing='0'")
            if not p.get("include_tumor_samples", True):
                conditions.append("s.tumor='0'")
            if not p.get("include_germline_samples", True):
                conditions.append("s.tumor='1'")
            if not p.get("include_ffpe_samples", True):
                conditions.append("s.ffpe='0'")
            if not p.get("include_merged_samples", False):
                conditions.append("ps.id NOT IN (SELECT processed_sample_id FROM merged_processed_samples)")
            if p.get("only_with_small_variants"):
                conditions.append("ps.id IN (SELECT DISTINCT processed_sample_id FROM small_variants_callset)")
            if p.get("s_phenotypes"):
                tables.append("sample_disease_info sdi")
                conditions += ["s.id=sdi.sample_id", "sdi.type='HPO term id'"]
                accessions = []
                for acc in p["s_phenotypes"]:
                    accessions.append(acc)
                    tid = self.phenotype_id_by_accession(acc)
                    accessions += [self.phenotype_accession(c)
                                   for c in self.phenotype_child_terms(tid, True)]
                accessions = list(dict.fromkeys(accessions))
                conditions.append("sdi.disease_info IN ('" + "', '".join(accessions) + "')")
            if p.get("p_name", "").strip():
                conditions.append(f"p.name LIKE '%{esc(p['p_name'])}%'")
            if p.get("p_type", "").strip():
                conditions.append(f"p.type='{esc(p['p_type'])}'")
            if not p.get("include_archived_projects", True):
                conditions.append("p.archived='0'")
            if p.get("sys_name", "").strip():
                conditions.append(f"(sys.name_manufacturer LIKE '{esc(p['sys_name'])}' OR sys.name_short LIKE '{esc(p['sys_name'])}')")
            if p.get("sys_type", "").strip():
                conditions.append(f"sys.type ='{esc(p['sys_type'])}'")
            if p.get("r_name", "").strip():
                conditions.append(f"r.name LIKE '%{esc(p['r_name'])}%'")
            if not p.get("include_bad_quality_runs", True):
                conditions.append("r.quality!='bad'")
            if p.get("run_finished"):
                conditions.append("r.status='analysis_finished'")
            if p.get("r_before"):
                conditions.append(f"r.start_date<='{p['r_before']}'")
            if p.get("r_after"):
                conditions.append(f"r.start_date>='{p['r_after']}'")
            if p.get("r_device_name", "").strip():
                tables.append("device d")
                conditions += ["d.id=r.device_id", f"d.name LIKE '%{esc(p['r_device_name'])}%'"]

        id2index = {}
        if ps_override:
            tmp = []
            for ps in ps_override:
                pid = self.processed_sample_id(ps, False)
                if not pid:
                    raise NgsdError(f"Processed sample '{ps}' given in 'ps_override' not found in NGSD!")
                tmp.append(pid)
                id2index[pid] = len(id2index)
            conditions.append("ps.id IN (" + ", ".join(tmp) + ")")

        if p.get("add_comments"):
            fields += ["s.comment", "ps.comment"]
            headers += ["comment_sample", "comment_processed_sample"]
        if p.get("add_outcome"):
            fields += ["ds.outcome", "ds.comment"]
            headers += ["outcome", "outcome_comment"]
        if p.get("add_dates"):
            fields += ["s.year_of_birth", "s.received", "s.sampling_date", "s.order_date"]
            headers += ["year_of_birth", "received_date", "sampling_date", "order_date"]
        if p.get("add_qc"):
            fields += ["s.quality", "ps.quality"]
            headers += ["sample_quality", "processed_sample_quality"]
        if p.get("add_lab_columns"):
            fields += ["ps.processing_input", "ps.molarity", "u.name", "ps.processing_modus", "ps.batch_number"]
            headers += ["processing_input", "molarity", "operator", "processing_modus", "batch_number"]

        sql = ("SELECT " + ", ".join(fields) + " FROM " + ", ".join(tables)
               + " WHERE " + " AND ".join(conditions)
               + " ORDER BY r.name ASC, s.name ASC, ps.process_id ASC")
        rows = []
        done = set()
        for r in self.get_rows(sql):
            ps_id = str(r[0])
            if ps_id in done:
                continue
            done.add(ps_id)
            rows.append([ps_id] + ["" if v is None else str(v) for v in r[1:]])

        if ps_override:
            rows.sort(key=lambda r: id2index.get(r[0], -1))

        # post columns
        if p.get("add_disease_details"):
            types = sorted(self.get_enum("sample_disease_info", "type"))
            for row in rows:
                details = self.get_rows(
                    "SELECT sdi.type, sdi.disease_info FROM sample_disease_info sdi, processed_sample ps "
                    "WHERE ps.sample_id=sdi.sample_id AND ps.id=? ORDER BY sdi.disease_info ASC",
                    params=(row[0],))
                for type_ in types:
                    tmp = []
                    for t, info in details:
                        if t != type_:
                            continue
                        entry = str(info).replace("\r", " ").replace("\n", " ")
                        if type_ == "HPO term id":
                            name = self.get_value("SELECT name FROM hpo_term WHERE hpo_id=?", params=(entry,)) or ""
                            tmp.append(f"{entry} - {name}")
                        else:
                            tmp.append(entry)
                    row.append("; ".join(tmp))
            headers += ["disease_details_" + t.replace(" ", "_") for t in types]
        if p.get("add_path"):
            # path column right after the base columns (reference inserts it
            # before the outcome/disease/qc blocks)
            idx = 20
            headers.insert(idx, "path")
            for row in rows:
                try:
                    path = self.processed_sample_path(row[0], p["add_path"])
                except Exception:
                    path = ""
                row.insert(idx + 1, path)
        if p.get("add_qc"):
            # move the quality columns to the start of the qc block
            # (DBTable::takeColumn + addColumn in the reference)
            for col in ("sample_quality", "processed_sample_quality"):
                i = headers.index(col)
                headers.pop(i)
                vals = [row.pop(i + 1) for row in rows]
                headers.append(col)
                for row, v in zip(rows, vals):
                    row.append(v)
            qc_names = self.get_values("SELECT name FROM qc_terms WHERE obsolete=0 ORDER BY qcml_id")
            for row in rows:
                qc_hash = dict(self.get_rows(
                    "SELECT n.name, nm.value FROM qc_terms n, processed_sample_qc nm "
                    "WHERE nm.qc_terms_id=n.id AND nm.processed_sample_id=? AND n.obsolete=0",
                    params=(row[0],)))
                row.extend(str(qc_hash.get(name, "")) for name in qc_names)
            headers += ["qc_" + n.replace(" ", "_") for n in qc_names]
        if p.get("add_report_config"):
            for row in rows:
                row.append(self.report_config_summary_text(row[0]))
            headers.append("report_config")
        if p.get("add_normal_sample"):
            for row in rows:
                row.append(self.normal_sample(row[0]))
            headers.append("normal_sample")
        if p.get("add_call_details"):
            for row in rows:
                info = self.variant_calling_info(row[0])
                for key in ("small", "cnv", "sv", "re"):
                    caller, version, date = info[key]
                    row.append((caller + " " + version).strip())
                    row.append(date.strip())
            headers += ["small_variants_caller", "small_variants_call_date", "cvn_caller",
                        "cnv_call_date", "sv_caller", "sv_call_date", "re_caller", "re_call_date"]
        if p.get("add_study_column"):
            for row in rows:
                row.append(", ".join(self.studies(row[0])))
            headers.append("studies")
        return headers, rows

    # ---- RNA expression (NGSD.cpp:2065-2850) ----
    def processing_system_id(self, name: str, throw_if_fails: bool = True) -> int:
        for col in ("name_short", "name_manufacturer"):
            ids = self.get_values(f"SELECT id FROM processing_system WHERE {col}=?", params=(name,))
            if len(ids) == 1:
                return int(ids[0])
        if throw_if_fails:
            raise NgsdError(f"No processing system with name '{name}' not found in NGSD!")
        return -1

    def related_samples(self, sample_id: int, relation: str | None = None,
                        sample_type: str = "") -> set:
        cond = ""
        params = [sample_id, sample_id]
        if relation is not None:
            cond = " AND relation=?"
            params.append(relation)
        out = set()
        for id1, id2 in self.get_rows(
                "SELECT sample1_id, sample2_id FROM sample_relations "
                "WHERE (sample1_id=? OR sample2_id=?)" + cond, params=tuple(params)):
            other = id2 if id1 == sample_id else id1
            if sample_type:
                st = self.get_value("SELECT sample_type FROM sample WHERE id=?", params=(other,))
                if st != sample_type:
                    continue
            out.add(other)
        return out

    def get_sample_disease_info(self, sample_id, only_type: str = "") -> list[tuple[str, str]]:
        cond = ""
        params = [sample_id]
        if only_type:
            cond = " AND type=?"
            params.append(only_type)
        return self.get_rows(
            "SELECT type, disease_info FROM sample_disease_info WHERE sample_id=?" + cond +
            " ORDER BY type ASC, disease_info ASC",
            params=tuple(params))

    def add_sample_disease_info(self, sample_id, disease_info: str, info_type: str,
                                user: str = "genlab_import", date: str | None = None):
        """NGSD::addSampleDiseaseInfo (NGSD.cpp:906-915)."""
        user_id = self.get_value("SELECT id FROM user WHERE user_id=?", params=(user,))
        if user_id is None:
            raise NgsdError(f"Could not determine NGSD user ID for user name '{user}'!")
        if date is None:
            import datetime
            date = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
        self.execute("INSERT INTO sample_disease_info (`sample_id`, `disease_info`, `type`, "
                     "`user_id`, `date`) VALUES (?, ?, ?, ?, ?)",
                     (sample_id, disease_info, info_type, user_id, date))
        self.commit()

    def get_gene_expression_values_of_sample(self, ps_id, allow_empty: bool = False) -> dict:
        rows = self.get_rows(
            "SELECT eg.symbol, e.tpm FROM expression e, expression_gene eg "
            "WHERE e.symbol_id=eg.id AND e.processed_sample_id=?", params=(ps_id,))
        if not allow_empty and not rows:
            raise NgsdError(f"No expression data found for processed sample '{self.processed_sample_name(ps_id)}'!")
        return {sym: float(tpm) for sym, tpm in rows}

    def get_rna_cohort(self, sys_id: int, tissue_type: str, project: str, ps_id,
                       cohort_type: str, mode: str = "genes", exclude_quality=(),
                       gender: str = "all") -> set:
        """NGSD::getRNACohort."""
        s_id = None
        if ps_id:
            s_id = int(self.sample_id(self.processed_sample_name(ps_id)))
        table = "expression" if mode == "genes" else "expression_exon"
        all_ps = set(self.get_values(f"SELECT DISTINCT e.processed_sample_id FROM {table} e"))
        if cohort_type in ("RNA_COHORT_GERMLINE", "RNA_COHORT_GERMLINE_PROJECT"):
            if tissue_type not in self.get_enum("sample", "tissue"):
                raise NgsdError(f"'{tissue_type}' is not a valid tissue type in the NGSD!")
            q = ("SELECT ps.id FROM processed_sample ps LEFT JOIN sample s on ps.sample_id = s.id "
                 f"WHERE ps.processing_system_id = {sys_id} AND s.tissue = '{tissue_type}'")
            if exclude_quality:
                q += " AND ps.quality NOT IN ('" + "', '".join(exclude_quality) + "')"
            if gender in ("male", "female"):
                q += f" AND s.gender = '{gender}'"
            elif gender != "all":
                raise NgsdError(f"Invalid gender '{gender}' provided!")
            if cohort_type == "RNA_COHORT_GERMLINE_PROJECT":
                project_id = self.get_value("SELECT id FROM project WHERE name=?",
                                            no_value_is_ok=False, params=(project,))
                q += f" AND ps.project_id = {project_id}"
            cohort = set(self.get_values(q))
        elif cohort_type == "RNA_COHORT_SOMATIC":
            if not str(ps_id).strip():
                raise NgsdError("Processed sample id required for somatic RNA cohort determination!")
            project_id = self.get_value("SELECT id FROM project WHERE name=?",
                                        no_value_is_ok=False, params=(project,))
            sample_ids = self.related_samples(s_id, "same sample", "DNA")
            sample_ids.add(s_id)
            icd10 = set()
            hpo = set()
            for sid in sample_ids:
                for _t, info in self.get_sample_disease_info(sid, "ICD10 code"):
                    icd10.add(info)
                for _t, info in self.get_sample_disease_info(sid, "HPO term id"):
                    hpo.add(info)
            name = self.processed_sample_name(ps_id)
            if len(icd10) > 1:
                raise NgsdError(f"Sample {name} contains more than 1 ICD10 code, cannot create sample cohort")
            if len(hpo) > 1:
                raise NgsdError(f"Sample {name} contains more than 1 HPO term, cannot create sample cohort")
            if len(icd10) < 1:
                raise NgsdError(f"Sample {name} does not contain ICD10 code, cannot create sample cohort")
            if len(hpo) < 1:
                raise NgsdError(f"Sample {name} does not contain HPO term, cannot create sample cohort")
            q = ("SELECT DISTINCT ps.id FROM processed_sample ps LEFT JOIN sample s on ps.sample_id=s.id "
                 "LEFT JOIN sample_relations sr ON s.id=sr.sample1_id OR s.id=sr.sample2_id "
                 "LEFT JOIN sample_disease_info sdi ON s.id=sdi.sample_id OR sr.sample1_id=sdi.sample_id OR sr.sample2_id=sdi.sample_id "
                 f"WHERE ps.processing_system_id={sys_id} AND ps.project_id={project_id} "
                 "AND ps.quality != 'bad' AND (sr.relation='same sample' OR sr.relation IS NULL) "
                 f"AND ((sdi.type='ICD10 code' AND sdi.disease_info='{list(icd10)[0]}') "
                 f"OR (sdi.type='HPO term id' AND sdi.disease_info='{list(hpo)[0]}'))")
            if exclude_quality:
                q += " AND ps.quality NOT IN ('" + "', '".join(exclude_quality) + "')"
            if gender in ("male", "female"):
                q += f" AND s.gender = '{gender}'"
            elif gender != "all":
                raise NgsdError(f"Invalid gender '{gender}' provided!")
            cohort = set(self.get_values(q))
        else:
            raise NgsdError("Invalid cohort type!")

        if s_id is not None:
            related = self.related_samples(s_id)
            related.add(s_id)
            related_ps = set()
            for sid in related:
                related_ps.update(self.get_values(
                    "SELECT id FROM processed_sample WHERE sample_id=?", params=(sid,)))
            cohort -= related_ps
        return cohort & all_ps

    def calculate_gene_expression_statistics(self, cohort: set, gene_symbol: str = "") -> dict:
        """NGSD::calculateGeneExpressionStatistics — gene -> (mean, mean_log2,
        stddev_log2)."""
        if not cohort:
            return {}
        ids = ", ".join(str(i) for i in cohort)
        q = ("SELECT e.symbol_id, AVG(e.tpm), AVG(LOG2(e.tpm+1)), STD(LOG2(e.tpm+1)) FROM expression e "
             f"WHERE e.processed_sample_id IN ({ids}) GROUP BY e.symbol_id ORDER BY e.symbol_id")
        id2gene = dict(self.get_rows("SELECT id, symbol FROM expression_gene"))
        out = {}
        for sid, mean, mean_log2, std_log2 in self.get_rows(q):
            out[id2gene.get(sid, "")] = (float(mean), float(mean_log2),
                                         float(std_log2) if std_log2 is not None else 0.0)
        return out

    def previous_symbols(self, gene_id: int) -> list[str]:
        return sorted(set(self.get_values(
            "SELECT symbol FROM gene_alias WHERE gene_id=? AND type='previous'", params=(gene_id,))))

    def synonymous_symbols(self, gene_id: int) -> list[str]:
        return sorted(set(self.get_values(
            "SELECT symbol FROM gene_alias WHERE gene_id=? AND type='synonym'", params=(gene_id,))))

    # ---------- variant/CNV/SV import (NGSD::addVariants/addCnv/addSv) ----------

    MAX_VARIANT_SIZE = 500

    def add_variants(self, gs, max_af: float) -> tuple[list[int], int, int]:
        """NGSD::addVariants (NGSD.cpp) — returns (variant ids, c_add, c_update);
        id is -1 for skipped (too long / AF above cutoff) variants."""
        import math

        i_gnomad = gs.annotation_index("gnomAD")
        i_co_sp = gs.annotation_index("coding_and_splicing")
        i_cadd = gs.annotation_index("CADD")
        i_spliceai = gs.annotation_index("SpliceAI")
        try:
            i_pubmed = gs.annotation_index("PubMed")
        except Exception:
            i_pubmed = -1
        output = []
        c_add = c_update = 0
        for v in gs.variants:
            if len(v.ref) > self.MAX_VARIANT_SIZE or len(v.obs) > self.MAX_VARIANT_SIZE:
                output.append(-1)
                continue
            gnomad = v.annotations[i_gnomad].strip()
            if gnomad == b"n/a":
                gnomad = b""
            if gnomad and float(gnomad) > max_af:
                output.append(-1)
                continue
            cadd = v.annotations[i_cadd].strip()
            spliceai = max_spliceai_score(v.annotations[i_spliceai])
            # keep only gene:transcript:type:impact of each consequence
            coding_parts = []
            for entry in v.annotations[i_co_sp].split(b","):
                parts = entry.split(b":")
                if len(parts) < 4:
                    continue
                coding_parts.append(b":".join(parts[:4]))
            coding = b",".join(coding_parts).decode()

            chrom = v.chr.str_normalized(True) if hasattr(v.chr, "str_normalized") else str(v.chr)
            row = self.get_rows(
                "SELECT id, gnomad, coding, cadd, spliceai FROM variant "
                "WHERE chr=? AND start=? AND end=? AND ref=? AND obs=?",
                params=(chrom, v.start, v.end, v.ref.decode(), v.obs.decode()))
            if row:
                vid, db_gnomad, db_coding, db_cadd, db_spliceai = row[0]
                def _num(x):
                    try:
                        return float(x)
                    except (TypeError, ValueError):
                        return 0.0
                if (_num(db_gnomad) != _num(gnomad) or (db_coding or "") != coding
                        or _num(db_cadd) != _num(cadd)
                        or _num(db_spliceai) != max(0.0, spliceai)):
                    self.execute("UPDATE variant SET gnomad=?, coding=?, cadd=?, spliceai=? WHERE id=?",
                                 (gnomad.decode() if gnomad else None, coding,
                                  cadd.decode() if cadd else None,
                                  spliceai if spliceai >= 0 else None, vid))
                    c_update += 1
                output.append(int(vid))
            else:
                self.execute(
                    "INSERT INTO variant (chr, start, end, ref, obs, gnomad, coding, cadd, spliceai) "
                    "VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)",
                    (chrom, v.start, v.end, v.ref.decode(), v.obs.decode(),
                     gnomad.decode() if gnomad else None, coding,
                     cadd.decode() if cadd else None,
                     spliceai if spliceai >= 0 else None))
                c_add += 1
                output.append(self.last_insert_id())
            if i_pubmed > 0:
                for pubmed_id in v.annotations[i_pubmed].split(b","):
                    if not pubmed_id:
                        continue
                    self.execute("INSERT OR IGNORE INTO variant_literature (variant_id, pubmed) VALUES (?, ?)",
                                 (output[-1], pubmed_id.decode()))
        self.commit()
        return output, c_add, c_update

    def delete_detected_variants(self, ps_id):
        """NGSD::deleteVariants(ps_id, SNVS_INDELS)."""
        self.execute("DELETE FROM detected_variant WHERE processed_sample_id=?", (ps_id,))
        self.commit()

    def add_cnv(self, callset_id: int, cnv, cnv_list, max_ll: float = 0.0) -> str:
        """NGSD::addCnv — returns the insert id as string, '' if skipped."""
        import json
        if cnv_list.type == "invalid":
            raise NgsdError("CNV caller type not handled in NGSD::addCnv")
        quality_metrics = {"regions": str(cnv.num_regs)}
        skip = False
        for i, col_name in enumerate(cnv_list.annotation_headers):
            entry = cnv.annotations[i]
            if col_name == b"loglikelihood":
                quality_metrics[col_name.decode()] = entry.decode()
                if max_ll > 0.0 and float(entry) < max_ll:
                    skip = True
            elif col_name == b"qvalue":
                quality_metrics[col_name.decode()] = entry.decode()
        if skip:
            return ""
        cn = cnv.copy_number(cnv_list.annotation_headers)
        # Qt compact JSON sorts object keys
        metrics_json = json.dumps(dict(sorted(quality_metrics.items())), separators=(",", ":"))
        self.execute("INSERT INTO `cnv` (`cnv_callset_id`, `chr`, `start`, `end`, `cn`, `quality_metrics`) "
                     "VALUES (?, ?, ?, ?, ?, ?)",
                     (callset_id, cnv.chr.str_normalized(True), cnv.start, cnv.end, cn, metrics_json))
        return str(self.last_insert_id())

    def add_sv(self, callset_id: int, sv, svs, callset_table_prefix: str = "sv") -> int:
        """NGSD::addSv — inserts into the per-type SV table, returns insert id."""
        import json
        if not sv.chr1.is_non_special() or not sv.chr2.is_non_special():
            raise NgsdError("Structural variants on special chromosomes can not be added to the NGSD!")
        qual = sv.annotations[svs.annotation_index_by_name(b"QUAL")].strip().decode()
        filt = sv.annotations[svs.annotation_index_by_name(b"FILTER")].strip().decode()
        metrics_json = json.dumps({"filter": filt, "quality": qual}, separators=(",", ":"))
        idx_format = svs.annotation_index_by_name(b"FORMAT")
        format_keys = sv.annotations[idx_format].split(b":")
        format_values = sv.annotations[idx_format + 1].split(b":")
        genotype = ""
        for k, val in zip(format_keys, format_values):
            if k == b"GT":
                genotype = "hom" if val.strip() == b"1/1" else "het"
                break
        if not genotype:
            raise NgsdError("SV doesn't contain genotype information!")
        callset_col = "sv_callset_id"
        sv_type = sv.type.decode() if isinstance(sv.type, bytes) else sv.type
        if sv_type in ("DEL", "DUP", "INV"):
            table = {"DEL": "sv_deletion", "DUP": "sv_duplication", "INV": "sv_inversion"}[sv_type]
            self.execute(
                f"INSERT INTO `{table}` (`{callset_col}`, `chr`, `start_min`, `start_max`, `end_min`, `end_max`, `genotype`, `quality_metrics`) "
                "VALUES (?, ?, ?, ?, ?, ?, ?, ?)",
                (callset_id, sv.chr1.str_normalized(True), sv.start1, sv.end1, sv.start2, sv.end2,
                 genotype, metrics_json))
        elif sv_type == "INS":
            if sv.chr1.str != sv.chr2.str:
                raise NgsdError("Invalid insertion position!")
            inserted_sequence = known_left = known_right = ""
            alt_seq = sv.annotations[svs.annotation_index_by_name(b"ALT_A")]
            if alt_seq != b"<INS>":
                inserted_sequence = alt_seq.decode()
            else:
                for kv in sv.annotations[svs.annotation_index_by_name(b"INFO_A")].split(b";"):
                    if kv.startswith(b"LEFT_SVINSSEQ="):
                        known_left = kv.split(b"=")[1].strip().decode()
                    if kv.startswith(b"RIGHT_SVINSSEQ="):
                        known_right = kv.split(b"=")[1].strip().decode()
            pos = min(sv.start1, sv.start2, sv.end1, sv.end2)
            ci_upper = max(sv.start1, sv.start2, sv.end1, sv.end2) - pos
            self.execute(
                f"INSERT INTO `sv_insertion` (`{callset_col}`, `chr`, `pos`, `ci_upper`, `inserted_sequence`, "
                "`known_left`, `known_right`, `genotype`, `quality_metrics`) VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)",
                (callset_id, sv.chr1.str_normalized(True), pos, ci_upper, inserted_sequence,
                 known_left, known_right, genotype, metrics_json))
        elif sv_type == "BND":
            self.execute(
                f"INSERT INTO `sv_translocation` (`{callset_col}`, `chr1`, `start1`, `end1`, `chr2`, `start2`, `end2`, `genotype`, `quality_metrics`) "
                "VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)",
                (callset_id, sv.chr1.str_normalized(True), sv.start1, sv.end1,
                 sv.chr2.str_normalized(True), sv.start2, sv.end2, genotype, metrics_json))
        else:
            raise NgsdError("Invalid structural variant type!")
        return self.last_insert_id()

    def repeat_expansion_id(self, region: str, repeat_unit: str, throw_if_fails: bool = True) -> int:
        v = self.get_value("SELECT id FROM repeat_expansion WHERE region=? and repeat_unit=?",
                           params=(region, repeat_unit))
        if v is None:
            if throw_if_fails:
                raise NgsdError(f"Repeat expansion {region}/{repeat_unit} not found in NGSD!")
            return -1
        return int(v)


def max_spliceai_score(annotation: bytes) -> float:
    """NGSHelper::maxSpliceAiScore (cppNGS/NGSHelper.cpp:945)."""
    annotation = annotation.strip()
    if not annotation:
        return -1.0
    try:
        return float(annotation)
    except ValueError:
        pass
    max_score = -1.0
    for entry in annotation.split(b","):
        parts = entry.split(b"|")
        if len(parts) != 9:
            continue
        for score in parts[1:5]:
            if score == b".":
                continue
            try:
                val = float(score)
            except ValueError:
                continue
            if 0 <= val <= 1:
                max_score = max(max_score, val)
    return max_score


def _qt_json_compact(obj: dict) -> str:
    import json
    return json.dumps(dict(sorted(obj.items())), separators=(",", ":"))


def _ngsd_somatic_ext(cls):
    """Somatic variant import helpers (NGSD::addSomaticCnv/addSomaticSv/
    deleteSomaticVariants/somaticReportConfigId)."""

    def somatic_report_config_id(self, t_ps_id, n_ps_id) -> int:
        v = self.get_value("SELECT id FROM somatic_report_configuration "
                           "WHERE ps_tumor_id=? AND ps_normal_id=?", params=(t_ps_id, n_ps_id))
        return -1 if v is None else int(v)

    def delete_somatic_variants(self, t_ps_id, n_ps_id, variant_type: str):
        n_cond = "IS NULL" if not n_ps_id else f"={n_ps_id}"
        if variant_type == "SNVS_INDELS":
            self.execute(f"DELETE FROM detected_somatic_variant WHERE processed_sample_id_tumor={t_ps_id} "
                         f"AND processed_sample_id_normal {n_cond}")
            cs = self.get_value(f"SELECT id FROM somatic_snv_callset WHERE processed_sample_id_tumor={t_ps_id} "
                                f"AND processed_sample_id_normal {n_cond}")
            if cs is not None:
                self.execute("DELETE FROM somatic_snv_callset WHERE id=?", (cs,))
        elif variant_type == "CNVS":
            cs = self.get_value(f"SELECT id FROM somatic_cnv_callset WHERE ps_tumor_id={t_ps_id} "
                                f"AND ps_normal_id {n_cond}")
            if cs is not None:
                self.execute("DELETE FROM somatic_cnv WHERE somatic_cnv_callset_id=?", (cs,))
                self.execute("DELETE FROM somatic_cnv_callset WHERE id=?", (cs,))
        elif variant_type == "SVS":
            cs = self.get_value(f"SELECT id FROM somatic_sv_callset WHERE ps_tumor_id={t_ps_id} "
                                f"AND ps_normal_id {n_cond}")
            if cs is not None:
                for table in ("somatic_sv_deletion", "somatic_sv_duplication", "somatic_sv_insertion",
                              "somatic_sv_inversion", "somatic_sv_translocation"):
                    self.execute(f"DELETE FROM {table} WHERE somatic_sv_callset_id=?", (cs,))
                self.execute("DELETE FROM somatic_sv_callset WHERE id=?", (cs,))
        else:
            raise NgsdError(f"Deleting somatic variants of type '{variant_type}' not implemented!")
        self.commit()

    _QC_METRIC_COLS = {"major_CN_allele", "minor_CN_allele", "loglikelihood", "Ontarget_RD_CI_lower",
                       "Ontarget_RD_CI_upper", "Offtarget_RD_CI_lower", "Offtarget_RD_CI_upper",
                       "Lowmed_tumor_BAF", "Highmed_tumor_BAF", "BAF_qval_fdr", "Overall_qvalue",
                       "Major allele", "Minor allele"}

    def add_somatic_cnv(self, callset_id: int, cnv, cnv_list, min_ll: float = 0.0) -> str:
        if cnv_list.type not in ("tumor_normal", "tumor_only"):
            raise NgsdError("NGSD::addSomaticCnv can only be used with tumor-normal or tumor-only CNV calls.")
        is_tumor_only = cnv_list.type == "tumor_only"
        quality_metrics = {"regions": str(cnv.num_regs)}
        for i, col_name in enumerate(cnv_list.annotation_headers):
            name = col_name.decode()
            if name not in _QC_METRIC_COLS:
                continue
            entry = cnv.annotations[i]
            if name == "loglikelihood" and min_ll > 0.0 and float(entry) < min_ll:
                return ""
            quality_metrics[name] = entry.decode()
        if is_tumor_only:
            raw_cn = float(cnv.annotations[cnv_list.annotation_index_by_name(b"CN_change")])
            tumor_cn = int(cnv.annotations[cnv_list.annotation_index_by_name(b"Minor allele")]
                           + cnv.annotations[cnv_list.annotation_index_by_name(b"Major allele")])
            tumor_clonality = float(cnv.annotations[cnv_list.annotation_index_by_name(b"Purity")])
        else:
            raw_cn = float(cnv.annotations[cnv_list.annotation_index_by_name(b"CN_change")])
            tumor_cn = int(cnv.annotations[cnv_list.annotation_index_by_name(b"tumor_CN_change")])
            tumor_clonality = float(cnv.annotations[cnv_list.annotation_index_by_name(b"tumor_clonality")])
        self.execute("INSERT INTO `somatic_cnv` (`somatic_cnv_callset_id`, `chr`, `start`, `end`, `cn`, "
                     "`tumor_cn`, `tumor_clonality`, `quality_metrics`) VALUES (?, ?, ?, ?, ?, ?, ?, ?)",
                     (callset_id, cnv.chr.str_normalized(True), cnv.start, cnv.end, raw_cn, tumor_cn,
                      tumor_clonality, _qt_json_compact(quality_metrics)))
        return str(self.last_insert_id())

    def add_somatic_sv(self, callset_id: int, sv, svs) -> str:
        fmt = svs.format()
        if fmt not in ("somatic_tumor_normal", "somatic_tumor_only"):
            raise NgsdError("NGSD::addSomaticSv can only be used with tumor-normal or tumor-only SV calls.")
        is_tumor_only = fmt == "somatic_tumor_only"
        if not sv.chr1.is_non_special() or not sv.chr2.is_non_special():
            raise NgsdError("Structural variants on special chromosomes can not be added to the NGSD!")
        quality_metrics = {}
        if not is_tumor_only:
            quality_metrics["quality"] = sv.annotations[svs.annotation_index_by_name(b"SOMATICSCORE")].strip().decode()
        quality_metrics["filter"] = sv.annotations[svs.annotation_index_by_name(b"FILTER")].strip().decode()
        metrics_json = _qt_json_compact(quality_metrics)
        sv_type = sv.type.decode()
        if sv_type in ("DEL", "DUP", "INV"):
            table = {"DEL": "somatic_sv_deletion", "DUP": "somatic_sv_duplication",
                     "INV": "somatic_sv_inversion"}[sv_type]
            self.execute(
                f"INSERT INTO `{table}` (`somatic_sv_callset_id`, `chr`, `start_min`, `start_max`, `end_min`, `end_max`, `quality_metrics`) "
                "VALUES (?, ?, ?, ?, ?, ?, ?)",
                (callset_id, sv.chr1.str_normalized(True), sv.start1, sv.end1, sv.start2, sv.end2, metrics_json))
        elif sv_type == "INS":
            if sv.chr1.str != sv.chr2.str:
                raise NgsdError("Invalid insertion position!")
            inserted_sequence = known_left = known_right = ""
            alt_seq = sv.annotations[svs.annotation_index_by_name(b"ALT_A")]
            if alt_seq != b"<INS>":
                inserted_sequence = alt_seq.decode()
            else:
                for kv in sv.annotations[svs.annotation_index_by_name(b"INFO_A")].split(b";"):
                    if kv.startswith(b"LEFT_SVINSSEQ="):
                        known_left = kv.split(b"=")[1].strip().decode()
                    if kv.startswith(b"RIGHT_SVINSSEQ="):
                        known_right = kv.split(b"=")[1].strip().decode()
            pos = min(sv.start1, sv.start2, sv.end1, sv.end2)
            ci_upper = max(sv.start1, sv.start2, sv.end1, sv.end2) - pos
            self.execute(
                "INSERT INTO `somatic_sv_insertion` (`somatic_sv_callset_id`, `chr`, `pos`, `ci_upper`, `inserted_sequence`, "
                "`known_left`, `known_right`, `quality_metrics`) VALUES (?, ?, ?, ?, ?, ?, ?, ?)",
                (callset_id, sv.chr1.str_normalized(True), pos, ci_upper, inserted_sequence,
                 known_left, known_right, metrics_json))
        elif sv_type == "BND":
            self.execute(
                "INSERT INTO `somatic_sv_translocation` (`somatic_sv_callset_id`, `chr1`, `start1`, `end1`, `chr2`, `start2`, `end2`, `quality_metrics`) "
                "VALUES (?, ?, ?, ?, ?, ?, ?, ?)",
                (callset_id, sv.chr1.str_normalized(True), sv.start1, sv.end1,
                 sv.chr2.str_normalized(True), sv.start2, sv.end2, metrics_json))
        else:
            raise NgsdError("Invalid structural variant type!")
        return str(self.last_insert_id())

    cls.somatic_report_config_id = somatic_report_config_id
    cls.delete_somatic_variants = delete_somatic_variants
    cls.add_somatic_cnv = add_somatic_cnv
    cls.add_somatic_sv = add_somatic_sv
    return cls


_QC_METRIC_COLS = {"major_CN_allele", "minor_CN_allele", "loglikelihood", "Ontarget_RD_CI_lower",
                   "Ontarget_RD_CI_upper", "Offtarget_RD_CI_lower", "Offtarget_RD_CI_upper",
                   "Lowmed_tumor_BAF", "Highmed_tumor_BAF", "BAF_qval_fdr", "Overall_qvalue",
                   "Major allele", "Minor allele"}

_ngsd_somatic_ext(NGSD)


def _ngsd_paths_ext(cls):
    """Processed-sample file paths (NGSD::processedSamplePath/projectFolder)."""
    import os

    _SUFFIX = {
        "GSVAR": "{ps}.GSvar",
        "VCF": "{ps}_var_annotated.vcf.gz",
        "VCF_CF_DNA": "{ps}_var.vcf",
        "LOWCOV_BED": "{ps}_{sys}_lowcov.bed",
        "MANTA_EVIDENCE": "manta_evid/{ps}_manta_evidence.bam",
        "BAF": "{ps}_bafs.igv",
        "COPY_NUMBER_RAW_DATA": "{ps}_cnvs_clincnv.seg",
        "COPY_NUMBER_CALLS": "{ps}_cnvs_clincnv.tsv",
        "CIRCOS_PLOT": "{ps}_circos.png",
        "FUSIONS": "{ps}_fusions_arriba.tsv",
        "FUSIONS_PIC_DIR": "{ps}_fusions_arriba_pics",
        "FUSIONS_BAM": "{ps}_fusions_arriba.bam",
        "SPLICING_BED": "{ps}_splicing.bed",
        "SPLICING_ANN": "{ps}_splicing_annot.tsv",
        "MANTA_FUSIONS": "{ps}_var_fusions_manta.bedpe",
        "VIRAL": "{ps}_viral.tsv",
        "COUNTS": "{ps}_counts.tsv",
        "EXPRESSION": "{ps}_expr.tsv",
        "EXPRESSION_COHORT": "{ps}_expr.cohort.tsv",
        "EXPRESSION_STATS": "{ps}_expr.stats.tsv",
        "EXPRESSION_CORR": "{ps}_expr.corr.txt",
        "EXPRESSION_EXON": "{ps}_expr_exon.tsv",
        "MRD_CF_DNA": "umiVar/{ps}.mrd",
        "HLA_GENOTYPER": "{ps}_hla_genotyper.tsv",
        "METHYLATION": "{ps}_var_methylation.tsv",
        "PARAPHASE_EVIDENCE": "paraphase/{ps}.paraphase.bam",
    }

    def project_folder(self, p_type: str) -> str:
        # NGSD::projectFolder (NGSD.cpp:1358-1376): per-type key first, then
        # the generic projects_folder + type subdirectory; settings.string
        # also honors NGSBITS_PROJECTS_FOLDER[_TYPE] env overrides
        from ..core import settings
        val = settings.string(f"projects_folder_{p_type}", optional=True)
        if val:
            return val.rstrip("/") + "/"
        val = settings.string("projects_folder", optional=True)
        if val:
            return val.rstrip("/") + "/" + p_type + "/"
        raise NgsdError(f"Found no project folder entry in settings.ini file for project type '{p_type}'!")

    def processed_sample_path(self, ps_id, path_type: str = "SAMPLE_FOLDER") -> str:
        rows = self.get_rows(
            "SELECT CONCAT(s.name,'_',LPAD(ps.process_id,2,'0')), p.type, p.name, sys.name_short, "
            "ps.folder_override, p.folder_override "
            "FROM processed_sample ps, sample s, project p, processing_system sys "
            "WHERE ps.processing_system_id=sys.id AND ps.sample_id=s.id AND ps.project_id=p.id AND ps.id=?",
            params=(ps_id,))
        if not rows:
            raise NgsdError(f"Processed sample with id '{ps_id}' not found in NGSD!")
        ps_name, p_type, p_name, sys_name_short, ps_override, p_override = rows[0]
        if ps_override:
            output = ps_override
            if not output.endswith("/"):
                output += "/"
        elif p_override:
            output = p_override
            if not output.endswith("/"):
                output += "/"
            output += f"Sample_{ps_name}/"
        else:
            output = self.project_folder(p_type) + f"{p_name}/Sample_{ps_name}/"
        if path_type == "SAMPLE_FOLDER":
            pass
        elif path_type == "BAM":
            if os.path.exists(output + ps_name + ".cram"):
                output += ps_name + ".cram"
            else:
                output += ps_name + ".bam"
        elif path_type == "STRUCTURAL_VARIANTS":
            if os.path.exists(output + ps_name + "_var_structural_variants.bedpe"):
                output += ps_name + "_var_structural_variants.bedpe"
            else:
                output += ps_name + "_manta_var_structural.bedpe"
        elif path_type == "REPEAT_EXPANSIONS":
            if os.path.exists(output + ps_name + "_repeats_expansionhunter.vcf"):
                output += ps_name + "_repeats_expansionhunter.vcf"
            else:
                output += ps_name + "_repeats.vcf"
        elif path_type in _SUFFIX:
            output += _SUFFIX[path_type].format(ps=ps_name, sys=sys_name_short)
        else:
            raise NgsdError(f"Unhandled PathType '{path_type}' in NGSD::processedSamplePath(...)!")
        return os.path.abspath(output) + ("/" if path_type == "SAMPLE_FOLDER" and not os.path.abspath(output).endswith("/") else "")

    cls.project_folder = project_folder
    cls.processed_sample_path = processed_sample_path
    return cls


_ngsd_paths_ext(NGSD)


def _ngsd_users_ext(cls):
    """User authentication (NGSD::checkPassword/setPassword/userId,
    NGSD.cpp:140-178 — SHA1(salt+password) hex, salt falls back to the
    login for legacy rows)."""
    import hashlib
    import secrets as _secrets

    def check_password(self, user_name: str, password: str,
                       only_active: bool = True) -> str:
        uid = self.get_value("SELECT id FROM user WHERE user_id=?",
                             params=(user_name,))
        if uid in (None, ""):
            return f"User '{user_name}' does not exist!"
        if only_active:
            active = self.get_value("SELECT active FROM user WHERE id=?",
                                    params=(uid,))
            if str(active) == "0":
                return f"User '{user_name}' is no longer active!"
        salt = self.get_value("SELECT salt FROM user WHERE id=?", params=(uid,))
        if salt in (None, ""):
            salt = user_name  # backward compatibility (NGSD.cpp:161)
        digest = hashlib.sha1((str(salt) + password).encode()).hexdigest()
        stored = self.get_value("SELECT password FROM user WHERE id=?",
                                params=(uid,))
        if digest != str(stored):
            return f"Invalid password for user '{user_name}'!"
        return ""

    def set_password(self, user_db_id: int, password: str):
        salt = _secrets.token_hex(20)  # 40 chars like Helper::randomString(40)
        digest = hashlib.sha1((salt + password).encode()).hexdigest()
        self.execute("UPDATE user SET password=?, salt=? WHERE id=?",
                     (digest, salt, user_db_id))
        self.commit()

    def user_id(self, user_name: str, only_active: bool = False) -> int:
        uid = self.get_value("SELECT id FROM user WHERE user_id=?",
                             params=(user_name,))
        if uid in (None, ""):
            raise NgsdError(f"Could not determine NGSD id of user '{user_name}'!")
        return int(uid)

    cls.check_password = check_password
    cls.set_password = set_password
    cls.user_id = user_id
    return cls


_ngsd_users_ext(NGSD)


def _qt_date(v) -> str:
    """QDate::toString("dd.MM.yyyy") of a SQL date value."""
    if v is None or str(v) == "":
        return ""
    s = str(v)[:10]
    parts = s.split("-")
    if len(parts) == 3:
        return f"{parts[2]}.{parts[1]}.{parts[0]}"
    return s


def _ngsd_analysis_jobs_ext(cls):
    """Analysis-job accessors (NGSD::analysisInfo/analysisJobFolder/
    analysisJobGSvarFile/analysisJobLatestLogInfo, NGSD.cpp:5552-5746;
    secondaryAnalyses NGSD.cpp:1494-1527; processing-system file paths
    NGSD.cpp:1216-1251)."""

    def analysis_info(self, job_id: int, throw_if_fails: bool = True) -> dict:
        rows = self.get_rows(
            "SELECT type, high_priority, args, sge_id, sge_queue "
            "FROM analysis_job WHERE id=?", params=(job_id,))
        if not rows:
            if throw_if_fails:
                raise NgsdError(f"Analysis job with id '{job_id}' not found in NGSD!")
            return {}
        type_, high_priority, args, sge_id, sge_queue = rows[0]
        samples = self.get_rows(
            "SELECT CONCAT(s.name,'_',LPAD(ps.process_id,2,'0')), js.info "
            "FROM analysis_job_sample js, processed_sample ps, sample s "
            "WHERE js.analysis_job_id=? AND js.processed_sample_id=ps.id "
            "AND ps.sample_id=s.id ORDER by js.id ASC", params=(job_id,))
        history = self.get_rows(
            "SELECT js.time, u.user_id, js.status, js.output "
            "FROM analysis_job_history js LEFT JOIN user u ON js.user_id=u.id "
            "WHERE js.analysis_job_id=? ORDER BY js.id ASC", params=(job_id,))
        return {
            "type": type_, "high_priority": bool(high_priority),
            "args": args or "", "sge_id": sge_id or "", "sge_queue": sge_queue or "",
            "samples": [{"name": n, "info": i or ""} for n, i in samples],
            "history": [{"time": t, "user": u or "", "status": s,
                         "output": (o or "").split("\n")} for t, u, s, o in history],
        }

    def analysis_job_folder(self, job_id: int) -> str:
        job = self.analysis_info(job_id, True)
        sample_folder = self.processed_sample_path(
            self.processed_sample_id(job["samples"][0]["name"]), "SAMPLE_FOLDER")
        base = os.path.abspath(os.path.join(sample_folder, ".."))
        type_ = job["type"]
        sample_sep = ""
        if type_ == "single sample":
            prefix = "Sample_"
        elif type_ == "multi sample":
            prefix, sample_sep = "Multi_", "_"
        elif type_ == "trio":
            prefix, sample_sep = "Trio_", "_"
        elif type_ == "somatic":
            if len(job["samples"]) == 2:
                prefix, sample_sep = "Somatic_", "-"
            elif len(job["samples"]) == 1:
                prefix = "Somatic_"
            else:
                raise NgsdError(f"Somatic analysis type with "
                                f"{len(job['samples'])} samples!")
        else:
            raise NgsdError(f"Unknown analysis type '{type_}'!")
        folder = prefix + sample_sep.join(s["name"] for s in job["samples"])
        return os.path.join(base, folder) + "/"

    def analysis_job_gsvar_file(self, job_id: int) -> str:
        job = self.analysis_info(job_id, True)
        folder = self.analysis_job_folder(job_id)
        type_ = job["type"]
        if type_ == "single sample":
            name = job["samples"][0]["name"] + ".GSvar"
        elif type_ == "multi sample":
            name = "multi.GSvar"
        elif type_ == "trio":
            name = "trio.GSvar"
        elif type_ == "somatic":
            if len(job["samples"]) == 2:
                name = job["samples"][0]["name"] + "-" + job["samples"][1]["name"] + ".GSvar"
            elif len(job["samples"]) == 1:
                name = job["samples"][0]["name"] + ".GSvar"
            else:
                raise NgsdError(f"Somatic analysis type with "
                                f"{len(job['samples'])} samples!")
        else:
            raise NgsdError(f"Unknown analysis type '{type_}'!")
        return folder + name

    def analysis_job_latest_log_info(self, job_id: int) -> dict:
        import glob
        folder = self.analysis_job_folder(job_id)
        if not os.path.exists(folder):
            raise NgsdError(f"Analysis job folder for '{job_id}' does not exist")
        files = glob.glob(os.path.join(folder, "*.log"))
        if not files:
            raise NgsdError(f"There are no log files for the job '{job_id}'")
        latest = max(files, key=os.path.getmtime)
        st = os.stat(latest)
        return {"file_name": os.path.basename(latest),
                "file_name_with_path": os.path.abspath(latest),
                "created": int(getattr(st, "st_ctime", st.st_mtime)),
                "last_modified": int(st.st_mtime)}

    def secondary_analyses(self, processed_sample_name: str, analysis_type: str) -> list[str]:
        files = self.get_values(
            "SELECT gsvar_file FROM secondary_analysis WHERE type=? "
            "AND gsvar_file LIKE ?",
            params=(analysis_type, f"%{processed_sample_name}%"))
        out = []
        for file in files:
            gsvar_file = os.path.basename(file)
            secondary_folder_name = os.path.basename(os.path.dirname(file))
            parts = secondary_folder_name.split("_")
            first_sample = parts[1] + "_" + parts[2]
            sample_folder = self.processed_sample_path(
                self.processed_sample_id(first_sample), "SAMPLE_FOLDER")
            project_folder = os.path.dirname(os.path.abspath(sample_folder).rstrip("/"))
            project_folder = os.path.dirname(project_folder)
            out.append(os.path.abspath(os.path.join(
                project_folder, secondary_folder_name, gsvar_file)))
        return out

    def target_file_path(self) -> str:
        from ..core import settings as _settings
        data_folder = _settings.string("data_folder", True)
        return data_folder.rstrip("/") + "/enrichment/" if data_folder else ""

    def processing_system_regions_file_path(self, sys_id: int) -> str:
        rel = (self.get_value("SELECT target_file FROM processing_system WHERE id=?",
                              params=(sys_id,)) or "").strip()
        if rel:
            return self.target_file_path() + rel
        return ""

    def processing_system_genes_file_path(self, sys_id: int) -> str:
        rel = (self.get_value("SELECT target_file FROM processing_system WHERE id=?",
                              params=(sys_id,)) or "").strip()
        if rel:
            return self.target_file_path() + rel[:-4] + "_genes.txt"
        return ""

    def queue_analysis(self, type_: str, high_priority: bool, use_dragen: bool,
                       args: list, samples: list):
        """NGSD::queueAnalysis (NGSD.cpp:5590-5606)."""
        self.execute(
            "INSERT INTO analysis_job (type, high_priority, use_dragen, args) "
            "VALUES (?, ?, ?, ?)",
            (type_, 1 if high_priority else 0, 1 if use_dragen else 0,
             " ".join(args)))
        job_id = self.last_insert_id()
        for sample in samples:
            self.execute(
                "INSERT INTO analysis_job_sample (analysis_job_id, "
                "processed_sample_id, info) VALUES (?, ?, ?)",
                (job_id, self.processed_sample_id(sample["name"]),
                 sample.get("info", "")))
        user_id = self.get_value("SELECT id FROM user WHERE user_id=?",
                                 params=(current_user_login() or "ahmustm1",))
        self.execute(
            "INSERT INTO analysis_job_history (analysis_job_id, time, "
            "user_id, status, output) VALUES (?, datetime('now', "
            "'localtime'), ?, 'queued', '')", (job_id, user_id))
        self.commit()
        return job_id

    def cancel_analysis(self, job_id: int) -> bool:
        """NGSD::cancelAnalysis (NGSD.cpp:5608-5618) — only running jobs."""
        job = self.analysis_info(job_id, False)
        history = job.get("history") or []
        if not history or history[-1]["status"] not in ("queued", "started"):
            return False
        user_id = self.get_value("SELECT id FROM user WHERE user_id=?",
                                 params=(current_user_login() or "ahmustm1",))
        self.execute(
            "INSERT INTO analysis_job_history (analysis_job_id, time, "
            "user_id, status, output) VALUES (?, datetime('now', "
            "'localtime'), ?, 'cancel', '')", (job_id, user_id))
        self.commit()
        return True

    def delete_analysis(self, job_id: int) -> bool:
        """NGSD::deleteAnalysis (NGSD.cpp:5620-5629)."""
        self.execute("DELETE FROM analysis_job_sample WHERE analysis_job_id=?",
                     (job_id,))
        self.execute("DELETE FROM analysis_job_history WHERE analysis_job_id=?",
                     (job_id,))
        cur = self.execute("DELETE FROM analysis_job WHERE id=?", (job_id,))
        self.commit()
        return cur.rowcount > 0

    def last_analysis_of(self, ps_id) -> int:
        """NGSD::lastAnalysisOf (NGSD.cpp:5540-5550) — single-sample only."""
        v = self.get_value(
            "SELECT j.id FROM analysis_job j, analysis_job_sample js WHERE "
            "js.analysis_job_id=j.id AND js.processed_sample_id=? AND "
            "j.type='single sample' ORDER BY j.id DESC LIMIT 1", params=(ps_id,))
        return -1 if v is None else int(v)

    cls.queue_analysis = queue_analysis
    cls.cancel_analysis = cancel_analysis
    cls.delete_analysis = delete_analysis
    cls.last_analysis_of = last_analysis_of
    cls.analysis_info = analysis_info
    cls.analysis_job_folder = analysis_job_folder
    cls.analysis_job_gsvar_file = analysis_job_gsvar_file
    cls.analysis_job_latest_log_info = analysis_job_latest_log_info
    cls.secondary_analyses = secondary_analyses
    cls.target_file_path = target_file_path
    cls.processing_system_regions_file_path = processing_system_regions_file_path
    cls.processing_system_genes_file_path = processing_system_genes_file_path
    return cls


_ngsd_analysis_jobs_ext(NGSD)


def _ngsd_user_role_ext(cls):
    """NGSD::getUserRole — role of a user by numeric id."""

    def get_user_role(self, user_id: int) -> str:
        return self.get_value("SELECT user_role FROM user WHERE id=?",
                              params=(user_id,)) or ""

    cls.get_user_role = get_user_role
    return cls


_ngsd_user_role_ext(NGSD)


def _ngsd_reports_ext(cls):
    """Report-generator support (NGSD::geneHgncId, variantId/addVariant,
    somaticCnvId/somaticSvId, getQCData as typed collection,
    bestTranscript with variant-transcript tie-break, getSomaticGeneRole,
    getSomaticViccId; cppNGSD/NGSD.cpp:1529-1718, 1973-1995, 3053-3158,
    4697-4735, 5029-5070, 7660-7764)."""

    def gene_id(self, symbol) -> int:
        """NGSD::geneId — approved-gene row id, -1 if not approvable."""
        if isinstance(symbol, bytes):
            symbol = symbol.decode()
        return self.gene_to_approved_id(symbol)

    def gene_hgnc_id(self, gene_row_id: int) -> str:
        """NGSD::geneHgncId — 'HGNC:<id>' for a gene table row id."""
        v = self.get_value("SELECT hgnc_id FROM gene WHERE id=?", params=(gene_row_id,))
        return "" if v is None else f"HGNC:{v}"

    def add_pubmed_id(self, variant_id, pubmed_id: str):
        """NGSD::addPubmedId (NGSD.cpp:1959-1966) — duplicates ignored."""
        self.execute(
            "INSERT OR IGNORE INTO variant_literature (variant_id, pubmed) "
            "VALUES (?, ?)", (variant_id, pubmed_id))
        self.commit()

    def pubmed_ids(self, variant_id) -> list[str]:
        """NGSD::pubmedIds (NGSD.cpp:1968-1971)."""
        return [str(v) for v in self.get_values(
            "SELECT pubmed FROM variant_literature WHERE variant_id=?",
            params=(variant_id,))]

    def variant(self, variant_id):
        """NGSD::variant — GSvarVariant from the variant table row."""
        from ..core.chromosome import Chromosome
        from ..io.gsvar import GSvarVariant
        rows = self.get_rows(
            "SELECT chr, start, end, ref, obs FROM variant WHERE id=?",
            params=(variant_id,))
        if not rows:
            raise NgsdError(f"Variant with identifier '{variant_id}' does not "
                            "exist!")
        c, s, e, ref, obs = rows[0]
        return GSvarVariant(Chromosome(str(c)), int(s), int(e),
                            str(ref).encode(), str(obs).encode(), [])

    def genotype_counts(self, variant_id) -> tuple[int, int, int]:
        """NGSD::genotypeCounts (NGSD.cpp:1736-1790) — (hom, het, mosaic),
        deduplicated per sample, bad-quality samples excluded."""
        c_het = c_hom = c_mosaic = 0
        done_het = set()
        done_hom = set()
        done_mosaic = set()
        for sample_id, genotype, mosaic in self.get_rows(
                "SELECT ps.sample_id, dv.genotype, dv.mosaic FROM "
                "detected_variant dv, processed_sample ps WHERE "
                "dv.variant_id=? AND dv.processed_sample_id=ps.id AND "
                "ps.quality!='bad'", params=(variant_id,)):
            is_mosaic = str(mosaic) == "1"
            if genotype == "het":
                if not is_mosaic and sample_id not in done_het:
                    c_het += 1
                    done_het.add(sample_id)
                if is_mosaic and sample_id not in done_mosaic:
                    c_mosaic += 1
                    done_mosaic.add(sample_id)
            elif genotype == "hom" and sample_id not in done_hom:
                c_hom += 1
                done_hom.add(sample_id)
        return c_hom, c_het, c_mosaic

    def genotype_counts_cached(self, variant_id) -> tuple[int, int, int]:
        """NGSD::genotypeCountsCached — from the variant table columns."""
        rows = self.get_rows(
            "SELECT germline_hom, germline_het, germline_mosaic FROM variant "
            "WHERE id=?", params=(variant_id,))
        hom, het, mosaic = rows[0]
        return (int(hom or 0), int(het or 0), int(mosaic or 0))

    def set_sample_disease_info(self, sample_id, disease_info: list):
        """NGSD::setSampleDiseaseInfo — replace all entries of the sample."""
        self.execute("DELETE FROM sample_disease_info WHERE sample_id=?",
                     (sample_id,))
        for entry in disease_info:
            user_id = self.get_value("SELECT id FROM user WHERE user_id=?",
                                     params=(entry.get("user", "ahmustm1"),))
            self.execute(
                "INSERT INTO sample_disease_info (sample_id, disease_info, "
                "type, user_id, date) VALUES (?, ?, ?, ?, datetime('now'))",
                (sample_id, entry["disease_info"], entry["type"], user_id))
        self.commit()

    def variant_id(self, variant, throw_if_fails: bool = True) -> str:
        """NGSD::variantId (NGSD.cpp:1693-1717)."""
        v = self.get_value(
            "SELECT id FROM variant WHERE chr=? AND start=? AND end=? AND ref=? AND obs=?",
            params=(variant.chr.str_normalized(True), variant.start, variant.end,
                    variant.ref.decode(), variant.obs.decode()))
        if v is None:
            if throw_if_fails:
                raise NgsdError(f"Variant {variant.to_string()} not found in NGSD!")
            return ""
        return str(v)

    def add_variant(self, variant, variant_list) -> str:
        """NGSD::addVariant(variant, list) (NGSD.cpp:1544-1569)."""
        i_gnomad = variant_list.annotation_index("gnomAD")
        gnomad = variant.annotations[i_gnomad].strip()
        gnomad_val = None if (not gnomad or gnomad == b"n/a") else gnomad.decode()
        i_co_sp = variant_list.annotation_index("coding_and_splicing")
        self.execute(
            "INSERT INTO variant (chr, start, end, ref, obs, gnomad, coding) "
            "VALUES (?,?,?,?,?,?,?)",
            (variant.chr.str_normalized(True), variant.start, variant.end,
             variant.ref.decode(), variant.obs.decode(), gnomad_val,
             variant.annotations[i_co_sp].decode()))
        self.commit()
        return str(self.last_insert_id())

    def somatic_cnv_id(self, cnv, callset_id: int, throw_if_fails: bool = True) -> str:
        """NGSD::somaticCnvId (NGSD.cpp:1973-1995)."""
        v = self.get_value(
            "SELECT id FROM somatic_cnv WHERE somatic_cnv_callset_id=? AND chr=? "
            "AND start=? AND end=?",
            params=(callset_id, cnv.chr.str_normalized(True), cnv.start, cnv.end))
        if v is None:
            if throw_if_fails:
                raise NgsdError(f"Somatic CNV {cnv.to_string()} with somatic callset id "
                                f"'{callset_id}' not found in NGSD!")
            return ""
        return str(v)

    def somatic_sv_id(self, sv, callset_id: int, svs, throw_if_fails: bool = True) -> str:
        """NGSD::somaticSvId (NGSD.cpp:3053-3158)."""
        type_str = sv.type.decode() if isinstance(sv.type, bytes) else str(sv.type)
        table = {"DEL": "somatic_sv_deletion", "DUP": "somatic_sv_duplication",
                 "INV": "somatic_sv_inversion", "INS": "somatic_sv_insertion",
                 "BND": "somatic_sv_translocation"}[type_str]
        if type_str in ("DEL", "DUP", "INV"):
            rows = self.get_values(
                f"SELECT id FROM `{table}` WHERE somatic_sv_callset_id=? AND chr=? "
                "AND start_min=? AND start_max=? AND end_min=? AND end_max=?",
                params=(callset_id, sv.chr1.str_normalized(True), sv.start1, sv.end1,
                        sv.start2, sv.end2))
        elif type_str == "INS":
            inserted, known_left, known_right = b"", b"", b""
            alt_seq = sv.annotations[svs.annotation_index(b"ALT_A")]
            if alt_seq != b"<INS>":
                inserted = alt_seq
            else:
                for kv in sv.annotations[svs.annotation_index(b"INFO_A")].split(b";"):
                    if kv.startswith(b"LEFT_SVINSSEQ="):
                        known_left = kv.split(b"=")[1].strip()
                    if kv.startswith(b"RIGHT_SVINSSEQ="):
                        known_right = kv.split(b"=")[1].strip()
            pos = min(sv.start1, sv.start2, sv.end1, sv.end2)
            ci_upper = max(sv.start1, sv.start2, sv.end1, sv.end2) - pos
            conds, params = [], [callset_id, sv.chr1.str_normalized(True), pos, ci_upper]
            for col, val in (("inserted_sequence", inserted), ("known_left", known_left),
                             ("known_right", known_right)):
                if val == b"":
                    conds.append(f"AND `{col}` IS NULL")
                else:
                    conds.append(f"AND `{col}`=?")
                    params.append(val.decode())
            rows = self.get_values(
                f"SELECT id FROM `{table}` WHERE somatic_sv_callset_id=? AND chr=? "
                "AND (pos - ci_lower)=? AND ci_upper=? " + " ".join(conds),
                params=tuple(params))
        else:  # BND
            rows = self.get_values(
                f"SELECT id FROM `{table}` WHERE somatic_sv_callset_id=? AND chr1=? "
                "AND start1=? AND end1=? AND chr2=? AND start2=? AND end2=?",
                params=(callset_id, sv.chr1.str_normalized(True), sv.start1, sv.end1,
                        sv.chr2.str_normalized(True), sv.start2, sv.end2))
        if len(rows) > 1:
            raise NgsdError("Multiple matching SVs found in NGSD!\t(" +
                            ",".join(str(r) for r in rows) + ")")
        if not rows:
            if not throw_if_fails:
                return ""
            raise NgsdError(f"SV {type_str} for callset with id '{callset_id}' "
                            "not found in NGSD!")
        return str(rows[0])

    def get_qc_collection(self, ps_id):
        """NGSD::getQCData as a typed QCCollection (NGSD.cpp:4697-4735)."""
        from ..core.qcml import QCCollection, QCValue
        out = QCCollection()
        for name, value, desc, qcml_id, type_ in self.get_rows(
                "SELECT n.name, nm.value, n.description, n.qcml_id, n.type "
                "FROM processed_sample_qc nm, qc_terms n "
                "WHERE nm.processed_sample_id=? AND nm.qc_terms_id=n.id AND n.obsolete=0 "
                "ORDER BY n.qcml_id", params=(ps_id,)):
            name, value, desc, qcml_id = str(name), str(value), str(desc or ""), str(qcml_id)
            if type_ == "int":
                out.insert(QCValue.from_int(name, int(value), desc, qcml_id))
            elif type_ == "float":
                out.insert(QCValue.from_double(name, float(value), desc, qcml_id))
            else:
                out.insert(QCValue.from_string(name, value, desc, qcml_id))
        return out

    def get_somatic_gene_role(self, gene, throw_on_fail: bool = False) -> dict | None:
        """NGSD::getSomaticGeneRole (NGSD.cpp:5029-5053) — dict or None."""
        if isinstance(gene, bytes):
            gene = gene.decode()
        approved = self.gene_to_approved(gene, True)
        row = self.get_rows("SELECT symbol, gene_role, high_evidence, comment "
                            "FROM somatic_gene_role WHERE symbol=?", params=(approved,))
        if not row:
            if throw_on_fail:
                raise NgsdError(f"There is no somatic gene role for gene symbol '{gene}' "
                                f"(used approved symbol {approved}) in the NGSD.")
            return None
        symbol, role, high_evidence, comment = row[0]
        return {"gene": symbol, "role": str(role), "high_evidence": bool(high_evidence),
                "comment": comment or ""}

    def get_somatic_vicc_id(self, variant) -> int:
        """NGSD::getSomaticViccId — -1 when the variant has no VICC entry."""
        vid = self.variant_id(variant, throw_if_fails=False)
        if vid == "":
            return -1
        v = self.get_value("SELECT id FROM somatic_vicc_interpretation WHERE variant_id=?",
                           params=(vid,))
        return -1 if v is None else int(v)

    def best_transcript_for_variant(self, gene_row_id: int, var_transcripts):
        """NGSD::bestTranscript(gene_id, var_transcripts, &quality)
        (NGSD.cpp:7660-7731) — returns (Transcript|None, quality)."""
        gene_transcripts = self.transcripts(gene_row_id, "ensembl", False)

        def highest_impact(candidates):
            # NGSD::highestImpactTranscript (NGSD.cpp:7733-7764)
            if not candidates:
                return None
            if not var_transcripts or len(candidates) == 1:
                return candidates[0]
            order = ["MODIFIER", "LOW", "MODERATE", "HIGH"]
            by_name = {t.name: t for t in candidates}
            current, current_impact = None, "MODIFIER"
            for vt in var_transcripts:
                t = by_name.get(vt.id_without_version().decode())
                if t is not None and (current is None
                                      or order.index(current_impact) < order.index(vt.impact or "MODIFIER")):
                    current_impact = vt.impact or "MODIFIER"
                    current = t
            return current if current is not None else candidates[0]

        for quality, pred in ((6, lambda t: t.is_preferred),
                              (5, lambda t: t.is_mane_select),
                              (4, lambda t: t.is_mane_plus_clinical),
                              (3, lambda t: t.is_ensembl_canonical)):
            tmp = [t for t in gene_transcripts if pred(t)]
            if tmp:
                return highest_impact(tmp), quality
        by_coding = sorted(gene_transcripts, key=lambda t: -t.coding_regions().base_count())
        tmp = [t for t in by_coding if t.is_coding()]
        if tmp:
            return highest_impact(tmp), 2
        by_bases = sorted(gene_transcripts, key=lambda t: -t.regions.base_count())
        if by_bases:
            return by_bases[0], 1
        return None, -1

    def relevant_transcripts_map(self) -> dict:
        """NGSD::relevantTranscripts() — {gene symbol: {transcript names}} of
        preferred/MANE/canonical transcripts for all genes that have any."""
        out: dict[bytes, set] = {}
        for symbol, name in self.get_rows(
                "SELECT g.symbol, t.name FROM gene g, gene_transcript t "
                "WHERE t.gene_id=g.id AND (t.is_mane_select=1 "
                "OR t.is_mane_plus_clinical=1 OR t.is_ensembl_canonical=1)"):
            out.setdefault(str(symbol).encode(), set()).add(str(name).encode())
        for symbol, name in self.get_rows(
                "SELECT g.symbol, t.name FROM gene g, gene_transcript t, "
                "preferred_transcripts pt WHERE t.gene_id=g.id AND pt.name=t.name"):
            out.setdefault(str(symbol).encode(), set()).add(str(name).encode())
        return out

    cls.gene_id = gene_id
    cls.gene_hgnc_id = gene_hgnc_id
    cls.variant_id = variant_id
    cls.add_variant = add_variant
    cls.add_pubmed_id = add_pubmed_id
    cls.pubmed_ids = pubmed_ids
    cls.variant = variant
    cls.genotype_counts = genotype_counts
    cls.genotype_counts_cached = genotype_counts_cached
    cls.set_sample_disease_info = set_sample_disease_info
    cls.somatic_cnv_id = somatic_cnv_id
    cls.somatic_sv_id = somatic_sv_id
    cls.get_qc_collection = get_qc_collection
    cls.get_somatic_gene_role = get_somatic_gene_role
    cls.get_somatic_vicc_id = get_somatic_vicc_id
    cls.best_transcript_for_variant = best_transcript_for_variant
    cls.relevant_transcripts_map = relevant_transcripts_map
    return cls


_ngsd_reports_ext(NGSD)


def _ngsd_somatic_pathways_ext(cls):
    """NGSD somatic-pathway + processing-system lookups used by the somatic
    report helper (NGSD.cpp:1182-1207, 4986-5027)."""

    def processing_system_id_from_processed_sample(self, ps_name: str) -> int:
        ps_id = self.processed_sample_id(ps_name, True)
        return int(self.get_value(
            "SELECT processing_system_id FROM processed_sample WHERE id=?", params=(ps_id,)))

    def get_processing_system_data(self, sys_id: int) -> dict:
        row = self.get_rows(
            "SELECT sys.name_manufacturer, sys.name_short, sys.platform, sys.type, "
            "sys.adapter1_p5, sys.adapter2_p7, sys.shotgun, sys.umi_type, g.build "
            "FROM processing_system sys, genome g WHERE sys.genome_id=g.id AND sys.id=?",
            params=(sys_id,))[0]
        return {"name": row[0], "name_short": row[1], "platform": row[2], "type": row[3],
                "adapter1_p5": row[4], "adapter2_p7": row[5],
                "shotgun": str(row[6]) == "1", "umi_type": row[7], "genome": row[8]}

    def get_somatic_pathways(self, gene_symbol=None) -> list[bytes]:
        if gene_symbol is None:
            return [str(n).encode() for n in self.get_values(
                "SELECT name FROM somatic_pathway sp ORDER BY name ASC")]
        if isinstance(gene_symbol, bytes):
            gene_symbol = gene_symbol.decode()
        gene_symbol = self.gene_to_approved(gene_symbol, True)
        return [str(n).encode() for n in self.get_values(
            "SELECT sp.name FROM somatic_pathway_gene sgp, somatic_pathway sp "
            "WHERE sgp.pathway_id=sp.id AND sgp.symbol=? ORDER BY sgp.symbol ASC",
            params=(gene_symbol,))]

    def get_somatic_pathway_genes(self, pathway_name):
        from ..core.geneset import GeneSet
        if isinstance(pathway_name, bytes):
            pathway_name = pathway_name.decode()
        out = GeneSet()
        for gene in self.get_values(
                "SELECT sgp.symbol FROM somatic_pathway_gene sgp, somatic_pathway sp "
                "WHERE sgp.pathway_id=sp.id AND sp.name=?", params=(pathway_name,)):
            out.insert(str(gene))
        return out

    def get_diagnostic_status(self, ps_id) -> dict:
        """NGSD::getDiagnosticStatus (NGSD.cpp:7847-7868)."""
        default = {"status": "", "user": "", "date": "", "outcome": "n/a",
                   "comments": ""}
        if ps_id in ("", None):
            return default
        rows = self.get_rows(
            "SELECT s.status, u.name, s.date, s.outcome, s.comment "
            "FROM diag_status s, user u "
            "WHERE s.processed_sample_id=? AND s.user_id=u.id", params=(ps_id,))
        if not rows:
            return default
        status, user, date, outcome, comment = rows[0]
        return {"status": str(status or ""), "user": str(user or ""),
                "date": str(date or ""), "outcome": str(outcome or "n/a"),
                "comments": str(comment or "")}

    def set_diagnostic_status(self, ps_id, status: dict,
                              user_login: str = "ahmustm1"):
        """NGSD::setDiagnosticStatus (NGSD.cpp:7869-7882) — upsert."""
        user_id = self.get_value("SELECT id FROM user WHERE user_id=?",
                                 params=(current_user_login() or user_login,))
        self.execute(
            "INSERT INTO diag_status (processed_sample_id, status, user_id, "
            "outcome, comment, date) VALUES (?, ?, ?, ?, ?, "
            "datetime('now')) ON CONFLICT(processed_sample_id) DO UPDATE SET "
            "status=excluded.status, user_id=excluded.user_id, "
            "outcome=excluded.outcome, comment=excluded.comment, "
            "date=datetime('now')",
            (ps_id, status["status"], user_id, status["outcome"],
             status["comments"]))
        self.commit()

    def set_sample_disease_data(self, sample_id, disease_group: str,
                                disease_status: str):
        """NGSD::setSampleDiseaseData (NGSD.cpp:1128-1131)."""
        self.execute("UPDATE sample SET disease_group=?, disease_status=? "
                     "WHERE id=?", (disease_group, disease_status, sample_id))
        self.commit()

    def set_gene_info(self, info: dict):
        """NGSD::setGeneInfo (NGSD.cpp:9997-10005) — only inheritance and
        comments are persisted."""
        self.execute(
            "INSERT INTO geneinfo_germline (symbol, inheritance, comments) "
            "VALUES (?, ?, ?) ON CONFLICT(symbol) DO UPDATE SET "
            "inheritance=excluded.inheritance, comments=excluded.comments",
            (info["symbol"], info["inheritance"], info["comments"]))
        self.commit()

    def phenotypes(self, search_terms: list) -> list[str]:
        """NGSD::phenotypes (NGSD.cpp:6959-7005) — accessions of HPO terms
        matching ALL search terms (name/hpo_id/synonyms, case-insensitive)."""
        terms = [t.strip() for t in search_terms if t.strip()]
        if not terms:
            return self.get_values(
                "SELECT hpo_id FROM hpo_term ORDER BY name ASC")
        result = None
        for term in terms:
            like = f"%{term}%"
            ids = set(self.get_values(
                "SELECT hpo_id FROM hpo_term WHERE name LIKE ? OR hpo_id "
                "LIKE ? OR synonyms LIKE ?", params=(like, like, like)))
            result = ids if result is None else (result & ids)
        return sorted(result or ())

    def phenotype_replacement_by_accession(self, accession: str) -> int:
        """NGSD::phenotypeReplacementByAccession (NGSD.cpp:7388-7392)."""
        v = self.get_value("SELECT replaced_by FROM hpo_obsolete WHERE hpo_id=?",
                           params=(accession,))
        return -1 if v is None else int(v)

    def phenotype_replacement_by_name(self, name: str) -> int:
        """NGSD::phenotypeReplacementByName (NGSD.cpp:7394-7407)."""
        v = self.get_value("SELECT replaced_by FROM hpo_obsolete WHERE name=?",
                           params=(f"obsolete {name}",))
        if v is None:
            v = self.get_value("SELECT replaced_by FROM hpo_obsolete WHERE name=?",
                               params=(name,))
        return -1 if v is None else int(v)

    def phenotype_parent_terms(self, term_id: int, recursive: bool) -> list[int]:
        """NGSD::phenotypeParentTerms (NGSD.cpp:7202-7232)."""
        out = []
        todo = [term_id]
        while todo:
            tid = todo.pop()
            for parent, in self.get_rows(
                    "SELECT parent FROM hpo_parent WHERE child=?", params=(tid,)):
                out.append(int(parent))
                if recursive:
                    todo.append(int(parent))
        return out

    def get_qc_values(self, accession: str, ps_id) -> list[float]:
        """NGSD::getQCValues (NGSD.cpp:4732-4754) — numeric values of the
        metric over all samples of the same processing system."""
        sys_id = self.get_value(
            "SELECT processing_system_id FROM processed_sample WHERE id=?",
            params=(ps_id,))
        qc_id = self.get_value("SELECT id FROM qc_terms WHERE qcml_id=?",
                               params=(accession,))
        out = []
        for value, in self.get_rows(
                "SELECT nm.value FROM processed_sample_qc as nm, "
                "processed_sample as ps WHERE ps.processing_system_id=? AND "
                "nm.qc_terms_id=? AND nm.processed_sample_id=ps.id",
                params=(sys_id, qc_id)):
            try:
                out.append(float(value))
            except (TypeError, ValueError):
                continue
        return out

    def comment(self, variant) -> str:
        """NGSD::comment (NGSD.cpp:5535-5538)."""
        return str(self.get_value(
            "SELECT comment FROM variant WHERE id=?",
            params=(self.variant_id(variant),)) or "")

    def set_comment(self, variant, text: str):
        """NGSD::setComment."""
        self.execute("UPDATE variant SET comment=? WHERE id=?",
                     (text, self.variant_id(variant)))
        self.commit()

    def get_classification(self, variant) -> dict:
        """NGSD::getClassification (NGSD.cpp:4793-4812)."""
        default = {"classification": "", "comments": ""}
        vid = self.variant_id(variant, False)
        if vid in ("", None, -1):
            return default
        rows = self.get_rows(
            "SELECT class, comment FROM variant_classification WHERE "
            "variant_id=?", params=(vid,))
        if not rows:
            return default
        return {"classification": str(rows[0][0] or "").strip(),
                "comments": str(rows[0][1] or "").strip()}

    def set_classification(self, variant, variant_list, info: dict):
        """NGSD::setClassification (NGSD.cpp:4835-4848)."""
        vid = self.variant_id(variant, False)
        if vid in ("", None, -1):
            vid = self.add_variant(variant, variant_list)
        self.execute(
            "INSERT INTO variant_classification (variant_id, class, comment) "
            "VALUES (?, ?, ?) ON CONFLICT(variant_id) DO UPDATE SET "
            "class=excluded.class, comment=excluded.comment",
            (vid, info["classification"], info["comments"]))
        self.commit()

    def omim_preferred_phenotype(self, symbol, disease_group) -> str:
        """NGSD::omimPreferredPhenotype (NGSD.cpp:7268-7283)."""
        if isinstance(symbol, bytes):
            symbol = symbol.decode()
        v = self.get_value(
            "SELECT phenotype_accession FROM omim_preferred_phenotype "
            "WHERE gene=? AND disease_group=?", params=(symbol, str(disease_group)))
        return "" if v is None else str(v)

    def cnv_callset_metrics(self, callset_id) -> dict:
        """NGSD::cnvCallsetMetrics (NGSD.cpp:5885-5897) — JSON quality metrics."""
        import json
        raw = self.get_value("SELECT quality_metrics FROM cnv_callset WHERE id=?",
                             params=(callset_id,))
        if not raw:
            return {}
        try:
            obj = json.loads(str(raw))
        except ValueError:
            return {}
        return {k: str(v).strip() for k, v in obj.items()}

    def phenotype_name(self, pheno_id: int) -> str:
        """NGSD::phenotype(id).name()."""
        v = self.get_value("SELECT name FROM hpo_term WHERE id=?", params=(pheno_id,))
        if v is None:
            raise NgsdError(f"Phenotype with id '{pheno_id}' not found in NGSD!")
        return str(v)

    def subpanel_regions(self, name: str):
        """NGSD::subpanelRegions (NGSD.cpp:4498-4503)."""
        from ..core.chromosome import Chromosome
        from ..core.intervals import BedFile, BedLine
        roi = self.get_value("SELECT roi FROM subpanels WHERE name=?", params=(name,))
        out = BedFile()
        for line in str(roi or "").replace("\r", "").split("\n"):
            line = line.strip()
            if not line or line.startswith("#") or line.startswith("track "):
                continue
            parts = line.split("\t")
            out.append(BedLine(Chromosome(parts[0]), int(parts[1]) + 1, int(parts[2]),
                               [p.encode() for p in parts[3:]]))
        return out

    def subpanel_genes(self, name: str):
        """NGSD::subpanelGenes (NGSD.cpp:4505-4510)."""
        from ..core.geneset import GeneSet
        genes = self.get_value("SELECT genes FROM subpanels WHERE name=?", params=(name,))
        return GeneSet.create_from_text(str(genes or ""))

    cls.get_diagnostic_status = get_diagnostic_status
    cls.set_diagnostic_status = set_diagnostic_status
    cls.set_sample_disease_data = set_sample_disease_data
    cls.set_gene_info = set_gene_info
    cls.phenotypes = phenotypes
    cls.phenotype_replacement_by_accession = phenotype_replacement_by_accession
    cls.phenotype_replacement_by_name = phenotype_replacement_by_name
    cls.phenotype_parent_terms = phenotype_parent_terms
    cls.get_qc_values = get_qc_values
    cls.comment = comment
    cls.set_comment = set_comment
    cls.get_classification = get_classification
    cls.set_classification = set_classification
    cls.omim_preferred_phenotype = omim_preferred_phenotype
    cls.cnv_callset_metrics = cnv_callset_metrics
    cls.phenotype_name = phenotype_name
    cls.subpanel_regions = subpanel_regions
    cls.subpanel_genes = subpanel_genes
    cls.processing_system_id_from_processed_sample = processing_system_id_from_processed_sample
    cls.get_processing_system_data = get_processing_system_data
    cls.get_somatic_pathways = get_somatic_pathways
    cls.get_somatic_pathway_genes = get_somatic_pathway_genes
    return cls


_ngsd_somatic_pathways_ext(NGSD)


# ---- LoginManager analogue (cppNGSD/LoginManager) --------------------------

_CURRENT_USER_LOGIN = ""


def login(user_login: str):
    """LoginManager::login (test mode: no password check)."""
    global _CURRENT_USER_LOGIN
    _CURRENT_USER_LOGIN = user_login


def current_user_login() -> str:
    """LoginManager::userLogin."""
    return _CURRENT_USER_LOGIN


def _create_sample_sheet(self, run_id: int, warnings: list,
                         adapter_trimming: bool = True,
                         dragen_analysis: bool = True) -> str:
    """NGSD::createSampleSheet (NGSD.cpp:6141-6420) — NovaSeq X sample sheet
    (BCLConvert + DragenGermline/DragenEnrichment sections).

    Software versions come from settings keys ``nova_seq_x_sw_version`` /
    ``nova_seq_x_app_version`` / ``nova_seq_x_keep_fastq`` (defaults pinned to
    the reference test settings)."""
    from ..core import settings as _settings

    def _setting(key, default):
        try:
            v = _settings.string(key, optional=True)
            return v if v else default
        except Exception:
            return default

    sw_version = _setting("nova_seq_x_sw_version", "4.4.12")
    app_version = _setting("nova_seq_x_app_version", "1.4.52")
    keep_fastq = _setting("nova_seq_x_keep_fastq", "true").lower() in ("true", "1")
    keep_fastq = "true" if keep_fastq else "false"
    fastq_compression_format = "dragen"
    barcode_mismatch_index1 = 1
    barcode_mismatch_index2 = 1

    sheet: list[str] = []
    run = self.get_rows(
        "SELECT r.name, r.recipe, r.flowcell_type, d.type FROM sequencing_run r, "
        "device d WHERE r.device_id=d.id AND r.id=?", params=(run_id,))[0]
    run_name, recipe_str, flowcell_type, device_type = (str(x) for x in run)
    recipe = recipe_str.split("+")
    if len(recipe) != 4:
        raise NgsdError(f"Invalid recipe '{recipe_str}' provided! It has to "
                        "contain 4 read lengths (forward, index1, index2, "
                        "reverse), divided by '+'.")
    forward_read_length = int(recipe[0])
    index1_read_length = int(recipe[1])
    index2_read_length = int(recipe[2])
    reverse_read_length = int(recipe[3])

    sheet.append("[Header],")
    sheet.append("FileFormatVersion,2")
    if run_name.startswith("#"):
        run_name = run_name[1:]
    sheet.append("RunName," + run_name)
    sheet.append("InstrumentPlatform,NovaSeqXSeries")
    sheet.append("InstrumentType," + device_type)
    sheet.append("IndexOrientation,Forward")
    sheet.append("")

    sheet.append("[Reads]")
    sheet.append(f"Read1Cycles,{forward_read_length}")
    sheet.append(f"Read2Cycles,{reverse_read_length}")
    sheet.append(f"Index1Cycles,{index1_read_length}")
    sheet.append(f"Index2Cycles,{index2_read_length}")
    sheet.append("")

    adapter_read1: set[str] = set()
    adapter_read2: set[str] = set()
    used_lanes: set[int] = set()
    bcl_convert: list[str] = []
    germline_analysis: list[str] = []
    enrichment_analysis: list[str] = []
    rna_analysis: list[str] = []
    mid1_chopped = mid2_chopped = False

    rows = self.get_rows(
        "SELECT ps.id, ps.lane, (s.name || '_' || substr('00' || ps.process_id, -2, 2)) as ps_name, "
        "s.tumor, s.sample_type, "
        "(SELECT sequence FROM mid WHERE id=ps.mid1_i7) as mid1, "
        "(SELECT sequence FROM mid WHERE id=ps.mid2_i5) as mid2, "
        "(SELECT name_short FROM processing_system WHERE id=ps.processing_system_id) as system_name, "
        "(SELECT type FROM processing_system WHERE id=ps.processing_system_id) as system_type, "
        "(SELECT name FROM project WHERE id=ps.project_id) as project "
        "FROM processed_sample ps, sample s WHERE ps.sample_id=s.id AND "
        "ps.sequencing_run_id=? ORDER BY ps.lane ASC, ps.id", params=(run_id,))
    for (_psid, lane_str, ps_name, tumor, sample_type, mid1, mid2,
         system_name, system_type, _project) in rows:
        lanes = str(lane_str).split(",")
        mid1 = (mid1 or "").strip()
        mid2 = (mid2 or "").strip()
        is_tumor = str(tumor) == "1"

        variant_calling_mode = "AllVariantCallers"
        target_region = f"DragenEnrichment/{system_name}.bed"
        if is_tumor:
            variant_calling_mode = "None"
            target_region = "na"

        # QByteArray::chopped(n) = drop the last n bytes (bug-faithful)
        if len(mid1) > index1_read_length:
            mid1 = mid1[:len(mid1) - index1_read_length]
            mid1_chopped = True
        if len(mid2) > index2_read_length:
            mid2 = mid2[:len(mid2) - index2_read_length]
            mid2_chopped = True

        sys_info = self.get_processing_system_data(
            self.processing_system_id(system_name))
        if (sys_info["adapter1_p5"] or "").strip():
            adapter_read1.add(sys_info["adapter1_p5"])
        if (sys_info["adapter2_p7"] or "").strip():
            adapter_read2.add(sys_info["adapter2_p7"])

        if dragen_analysis:
            if sample_type in ("DNA", "cfDNA"):
                if system_type == "WGS":
                    germline_analysis.append(f"{ps_name},{variant_calling_mode}")
                elif system_type == "WES":
                    enrichment_analysis.append(
                        f"{ps_name},{target_region},{variant_calling_mode}")
            elif sample_type == "RNA":
                rna_analysis.append(ps_name)
            else:
                raise NgsdError(f"Invalid sample type '{sample_type}'!")

        for lane in lanes:
            umi_length = 0
            used_lanes.add(int(lane))
            oc = f"Y{forward_read_length};"
            oc += f"I{len(mid1)}"
            umi_type = sys_info["umi_type"]
            if umi_type == "IDT-UDI-UMI":
                oc += "U11"
                umi_length = 11
            elif umi_type in ("IDT-xGen-Prism", "Twist"):
                pass  # UMI processing in megSAP
            elif umi_type != "n/a":
                raise NgsdError(f"Unsupported UMI type '{umi_type}!")
            if index1_read_length - (len(mid1) + umi_length) < 0:
                raise NgsdError("Index1 (+ UMI) read longer than seqeuncing length!")
            if index1_read_length - (len(mid1) + umi_length) > 0:
                oc += f"N{index1_read_length - len(mid1)}"
            oc += ";"
            if index2_read_length - len(mid2) < 0:
                raise NgsdError("Index2 read longer than seqeuncing length!")
            if index2_read_length - len(mid2) > 0:
                oc += f"N{index2_read_length - len(mid2)}"
            oc += f"I{len(mid2)};"
            oc += f"Y{reverse_read_length}"
            bcl_convert.append(
                f"{lane},{ps_name},{mid1},{mid2},{oc},"
                f"{barcode_mismatch_index1},{barcode_mismatch_index2}")

    if flowcell_type in ("Illumina NovaSeqX 25B", "Illumina NovaSeqX 10B",
                         "Illumina NovaSeqX 5B"):
        if len(used_lanes) != 8:
            warnings.append(f"WARNING: The number of lanes covered by samples "
                            f"({len(used_lanes)}) and the number of lanes on "
                            "the flow cell (8) does not match!")
    elif len(used_lanes) != 2:  # "Illumina NovaSeqX 1.5B"
        warnings.append(f"WARNING: The number of lanes covered by samples "
                        f"({len(used_lanes)}) and the number of lanes on the "
                        "flow cell (2) does not match!")

    sheet.append("[BCLConvert_Settings]")
    sheet.append("SoftwareVersion," + sw_version)
    if adapter_trimming:
        r1 = sorted(adapter_read1)
        if r1:
            sheet.append("AdapterRead1," + "+".join(r1))
        else:
            warnings.append("WARNING: No adapter for read 1 provided! "
                            "Adapter trimming will not work.")
        r2 = sorted(adapter_read2)
        if r2:
            sheet.append("AdapterRead2," + "+".join(r2))
        else:
            warnings.append("WARNING: No adapter for read 2 provided! "
                            "Adapter trimming will not work.")
    else:
        sheet.append("AdapterRead1,na")
        sheet.append("AdapterRead2,na")

    sheet.append("FastqCompressionFormat," + fastq_compression_format)
    sheet.append("")
    sheet.append("[BCLConvert_Data]")
    sheet.append("Lane,Sample_ID,Index,Index2,OverrideCycles,"
                 "BarcodeMismatchesIndex1,BarcodeMismatchesIndex2")
    sheet.extend(bcl_convert)
    sheet.append("")

    if mid1_chopped:
        warnings.append("WARNING: At least one Sample has a i7 MID which is "
                        "longer than recipe. It will be shorted according to recipe.")
    if mid2_chopped:
        warnings.append("WARNING: At least one Sample has a i5 MID which is "
                        "longer than recipe. It will be shorted according to recipe.")

    if germline_analysis:
        sheet.append("[DragenGermline_Settings]")
        sheet.append("SoftwareVersion," + sw_version)
        sheet.append("AppVersion," + app_version)
        sheet.append("KeepFastq," + keep_fastq)
        sheet.append("MapAlignOutFormat,cram")
        sheet.append("ReferenceGenomeDir,GRCh38")
        sheet.append("")
        sheet.append("[DragenGermline_Data]")
        sheet.append("Sample_ID,VariantCallingMode")
        sheet.extend(germline_analysis)
        sheet.append("")

    if enrichment_analysis:
        sheet.append("[DragenEnrichment_Settings]")
        sheet.append("SoftwareVersion," + sw_version)
        sheet.append("AppVersion," + app_version)
        sheet.append("KeepFastq," + keep_fastq)
        sheet.append("MapAlignOutFormat,cram")
        sheet.append("ReferenceGenomeDir,GRCh38")
        sheet.append("GermlineOrSomatic,germline")
        sheet.append("")
        sheet.append("[DragenEnrichment_Data]")
        sheet.append("Sample_ID,BedFile,VariantCallingMode")
        sheet.extend(enrichment_analysis)
        sheet.append("")

    return "\n".join(sheet)


try:
    NGSD.create_sample_sheet = _create_sample_sheet
except NameError:
    pass


def _export_sample_data(self, ps_id, sql_data: list):
    """NGSD::exportSampleData (NGSD.cpp:10466-10900) — serialize one
    processed sample (with its sample, processing system, run, device, MIDs
    and QC values) as INSERT OR IGNORE statements (SQLite dialect of the reference
    MySQL INSERT IGNORE dump) importable into another NGSD;
    user/project/sender references are remapped to dummy entries."""
    dummy_user_id = "99999"
    dummy_project_id = "99999"
    dummy_sender = "99999"

    sql_data.append(
        "INSERT OR IGNORE INTO `user` (`id`, `user_id`, `password`, `user_role`, "
        "`name`, `email`, `created`, `last_login`, `active`, `salt`, `comment`) "
        f"VALUES ('{dummy_user_id}', 'dummy_user', 'pass', 'user_restricted', "
        f"'Dummy User', 'no_valid@email{dummy_user_id}.de', "
        "'2024-08-07 10:06:28', '2025-08-26 12:00:25', '1', NULL, NULL)")
    sql_data.append(
        "INSERT OR IGNORE INTO `project` (`id`, `name`, `aliases`, `type`, "
        "`internal_coordinator_id`, `comment`, `analysis`, `preserve_fastqs`, "
        "`email_notification`, `archived`, `folder_override`) VALUES "
        f"('{dummy_project_id}', 'Dummy', NULL, 'test', '{dummy_user_id}', "
        "NULL, 'variants', '0', NULL, '1', NULL)")
    sql_data.append(
        "INSERT OR IGNORE INTO `sender` (`id`, `name`, `phone`, `email`, "
        "`affiliation`) VALUES "
        f"('{dummy_sender}', 'Dummy Senders', NULL, NULL, 'Fake sender')")

    def esc(v):
        if v is None:
            return "NULL"
        return "'" + str(v).replace("'", "''") + "'"

    def dump_row(table: str, where: str, remap: dict | None = None):
        cols = [r[1] for r in self.get_rows(f"PRAGMA table_info({table})")]
        emitted = []
        for row in self.get_rows(f"SELECT * FROM {table} WHERE {where}"):
            values = []
            for col, val in zip(cols, row):
                if remap and col in remap:
                    val = remap[col]
                values.append(esc(val))
            emitted.append(
                f"INSERT OR IGNORE INTO `{table}` "
                "(" + ", ".join(f"`{c}`" for c in cols) + ") VALUES "
                "(" + ", ".join(values) + ")")
        return emitted

    # QC terms first, then the per-sample QC rows (after the sample exists)
    ps_qc_rows = []
    for row in self.get_rows(
            "SELECT id, qc_terms_id, value FROM processed_sample_qc "
            "WHERE processed_sample_id=?", params=(ps_id,)):
        qc_id, qc_terms_id, value = row
        sql_data.extend(dump_row("qc_terms", f"id={qc_terms_id}"))
        ps_qc_rows.append(
            "INSERT OR IGNORE INTO `processed_sample_qc` (`id`, "
            "`processed_sample_id`, `qc_terms_id`, `value`) VALUES "
            f"({esc(qc_id)}, {esc(ps_id)}, {esc(qc_terms_id)}, {esc(value)})")

    ps = self.get_rows("SELECT sample_id, processing_system_id, "
                       "sequencing_run_id FROM processed_sample WHERE id=?",
                       params=(ps_id,))
    if not ps:
        raise NgsdError(f"Processed sample with id '{ps_id}' not found in NGSD!")
    sample_id, sys_id, run_id = ps[0]

    sql_data.extend(dump_row("sample", f"id={sample_id}",
                             remap={"received_by": dummy_user_id,
                                    "sender_id": dummy_sender}))
    genome_id = self.get_value(
        "SELECT genome_id FROM processing_system WHERE id=?", params=(sys_id,))
    sql_data.extend(dump_row("genome", f"id={genome_id}"))
    sql_data.extend(dump_row("processing_system", f"id={sys_id}"))
    if run_id is not None:
        device_id = self.get_value(
            "SELECT device_id FROM sequencing_run WHERE id=?", params=(run_id,))
        if device_id is not None:
            sql_data.extend(dump_row("device", f"id={device_id}"))
        sql_data.extend(dump_row("sequencing_run", f"id={run_id}"))
    for mid_col in ("mid1_i7", "mid2_i5"):
        mid_id = self.get_value(
            f"SELECT {mid_col} FROM processed_sample WHERE id=?", params=(ps_id,))
        if mid_id is not None:
            sql_data.extend(dump_row("mid", f"id={mid_id}"))
    sql_data.extend(dump_row("processed_sample", f"id={ps_id}",
                             remap={"operator_id": dummy_user_id,
                                    "project_id": dummy_project_id,
                                    "normal_id": None}))
    sql_data.extend(ps_qc_rows)


NGSD.export_sample_data = _export_sample_data


# ---- table metadata + value checking (NGSD::tableInfo/checkValue) ----------

_TABLE_REGEXPS = {
    # hard-coded per-column patterns (NGSD.cpp:4045-4052)
    ("sample", "name"): r"^[A-Za-z0-9-]*$",
    ("mid", "sequence"): r"^[ACGT]*$",
    ("project", "name"): r"^[A-Za-z0-9_-]*$",
    ("processing_system", "name_short"): r"^[A-Za-z0-9_\.-]*$",
    ("processing_system", "adapter1_p5"): r"^[ACGTN]*$",
    ("processing_system", "adapter2_p7"): r"^[ACGTN]*$",
    ("processed_sample", "lane"): r"^[1-8](,[1-8])*$",
    ("user", "user_id"): r"^[A-Za-z0-9_]+$",
}

_SCHEMA_META_CACHE: dict | None = None


def _schema_meta() -> dict:
    """{(table, column): meta} parsed from the shipped MySQL schema."""
    global _SCHEMA_META_CACHE
    if _SCHEMA_META_CACHE is not None:
        return _SCHEMA_META_CACHE
    import gzip
    import os
    import re

    path = os.path.join(os.path.dirname(__file__), "..", "resources",
                        "ngsd_schema.sql.gz")
    with gzip.open(path, "rt", encoding="utf-8", errors="replace") as fh:
        sql = fh.read()

    meta: dict = {}
    for m in re.finditer(r"CREATE\s+TABLE\s+(?:IF NOT EXISTS\s+)?`?(\w+)`?\s*"
                         r"\((.*?)\)\s*ENGINE", sql, re.DOTALL | re.IGNORECASE):
        table, body = m.group(1), m.group(2)
        unique_cols = set(re.findall(
            r"UNIQUE\s+INDEX\s+`?\w+`?\s*\(\s*`?(\w+)`?", body, re.IGNORECASE))
        fk_refs = {c: ref for c, ref in re.findall(
            r"FOREIGN\s+KEY\s*\(\s*`?(\w+)`?\s*\)\s*REFERENCES\s+`?(\w+)`?",
            body, re.IGNORECASE | re.DOTALL)}
        for line in body.split("\n"):
            line = line.strip().rstrip(",")
            cm = re.match(r"`(\w+)`\s+(.*)", line)
            if not cm:
                continue
            col, rest = cm.group(1), cm.group(2)
            upper = rest.upper()
            info = {
                "nullable": "NOT NULL" not in upper,
                "unsigned": "UNSIGNED" in upper,
                "unique": col in unique_cols,
                "fk": fk_refs.get(col),
                "max_length": 0,
                "enum_values": None,
                "type": "TEXT",
            }
            lm = re.match(r"VARCHAR\s*\((\d+)\)", upper)
            if lm:
                info["type"] = "VARCHAR"
                info["max_length"] = int(lm.group(1))
            elif re.match(r"ENUM\s*\(", upper):
                em = re.match(r"ENUM\s*\(((?:[^)(]|\([^)]*\))*)\)", rest,
                              re.IGNORECASE | re.DOTALL)
                vals = [v.strip()[1:-1] for v in em.group(1).split(",")
                        if v.strip()]
                info["type"] = "ENUM"
                info["enum_values"] = vals
            elif re.match(r"TINYINT\s*\(\s*1\s*\)", upper) or upper.startswith("BOOLEAN"):
                info["type"] = "BOOL"
            elif upper.startswith("BIGINT"):
                info["type"] = "LONG"
            elif re.match(r"(INT|MEDIUMINT|SMALLINT|TINYINT)", upper):
                info["type"] = "INT"
            elif re.match(r"(FLOAT|DOUBLE|DECIMAL)", upper):
                info["type"] = "FLOAT"
            elif upper.startswith("DATETIME") or upper.startswith("TIMESTAMP"):
                info["type"] = "DATETIME"
            elif upper.startswith("DATE"):
                info["type"] = "DATE"
            if info["fk"]:
                info["type"] = "FK"
            meta[(table, col)] = info
    _SCHEMA_META_CACHE = meta
    return meta


def _check_value(self, table: str, field: str, value: str,
                 check_unique: bool) -> list[str]:
    """NGSD::checkValue (NGSD.cpp:10200-10420) — validation errors for a
    candidate column value."""
    import datetime
    import re

    info = _schema_meta().get((table, field))
    if info is None:
        raise NgsdError(f"Unknown field '{table}.{field}' in checkValue!")
    errors: list[str] = []
    t = info["type"]

    if t in ("INT", "LONG"):
        if value == "" and not info["nullable"]:
            errors.append("Cannot be empty!")
        if value != "":
            try:
                num = int(value)
                if info["unsigned"] and num < 0:
                    errors.append("Must not be negative!")
            except ValueError:
                errors.append("Cannot be converted to a integer number!")
    elif t == "FLOAT":
        if value == "" and not info["nullable"]:
            errors.append("Cannot be empty!")
        if value != "":
            try:
                num = float(value)
                if info["unsigned"] and num < 0:
                    errors.append("Must not be negative!")
            except ValueError:
                errors.append("Cannot be converted to a floating-point number!")
    elif t == "DATE":
        if value == "" and not info["nullable"]:
            errors.append("Cannot be empty!")
        if value != "":
            try:
                datetime.date.fromisoformat(value)
            except ValueError:
                errors.append("Invalid format! The correct format is YYYY-MM-DD")
    elif t == "VARCHAR":
        if not info["nullable"] and value == "":
            errors.append("Field must not be empty!")
        if len(value) > info["max_length"]:
            errors.append(f"Maximum length is {info['max_length']}")
        pattern = _TABLE_REGEXPS.get((table, field))
        if pattern and not re.search(pattern, value):
            errors.append(f"Regular expression mismatch of value '{value}' "
                          f"(pattern={pattern})")
        if check_unique and info["unique"]:
            if self.get_value(f"SELECT id FROM {table} WHERE {field}=?",
                              params=(value,)) is not None:
                errors.append("Value already present in database "
                              "(this field is unique!)")
    elif t == "BOOL":
        if value not in ("0", "1"):
            errors.append("Can only be '0' or '1'!")
    elif t == "ENUM":
        if value == "":
            if not info["nullable"]:
                errors.append("Cannot be empty!")
        else:
            if value not in info["enum_values"]:
                errors.append(f"Invalid value '{value}'. Valid are: '"
                              + "', '".join(info["enum_values"]) + "'")
    elif t == "FK":
        if value == "" and not info["nullable"]:
            errors.append("Cannot be empty!")
        if value != "":
            if self.get_value(f"SELECT id FROM {info['fk']} WHERE id=?",
                              params=(value,)) is None:
                errors.append(f"Invalid reference to table {info['fk']}!")
    return errors


def _table_info(self, table: str) -> dict:
    """NGSD::tableInfo (field-metadata subset used by checkValue)."""
    cols = {c: m for (t, c), m in _schema_meta().items() if t == table}
    if not cols:
        raise NgsdError(f"Unknown table '{table}' in tableInfo!")
    return cols


def _sv_table_name(sv_type: bytes | str) -> str:
    """NGSD::svTableName."""
    t = sv_type.decode() if isinstance(sv_type, bytes) else str(sv_type)
    return {"DEL": "sv_deletion", "DUP": "sv_duplication",
            "INV": "sv_inversion", "INS": "sv_insertion",
            "BND": "sv_translocation"}[t]


def _user_name(self, user_id: int) -> str:
    """NGSD::userName."""
    return str(self.get_value("SELECT name FROM user WHERE id=?",
                              params=(user_id,)) or "")


def _user_email(self, user_id: int) -> str:
    """NGSD::userEmail."""
    return str(self.get_value("SELECT email FROM user WHERE id=?",
                              params=(user_id,)) or "")


def _cnv_id(self, cnv, callset_id: int, throw_if_fails: bool = True) -> str:
    """NGSD::cnvId."""
    v = self.get_value(
        "SELECT id FROM cnv WHERE cnv_callset_id=? AND chr=? AND start=? AND "
        "end=?", params=(callset_id, cnv.chr.str_normalized(True), cnv.start,
                         cnv.end))
    if v is None:
        if throw_if_fails:
            raise NgsdError(f"CNV {cnv.to_string()} not found in NGSD!")
        return ""
    return str(v)


def _delete_variants(self, ps_id):
    """NGSD::deleteVariants — all small variant/CNV/SV/RE calls of a sample."""
    self.execute("DELETE FROM detected_variant WHERE processed_sample_id=?",
                 (ps_id,))
    callset_ids = self.get_values(
        "SELECT id FROM cnv_callset WHERE processed_sample_id=?", params=(ps_id,))
    for cid in callset_ids:
        self.execute("DELETE FROM cnv WHERE cnv_callset_id=?", (cid,))
    self.execute("DELETE FROM cnv_callset WHERE processed_sample_id=?", (ps_id,))
    sv_callsets = self.get_values(
        "SELECT id FROM sv_callset WHERE processed_sample_id=?", params=(ps_id,))
    for cid in sv_callsets:
        for table in ("sv_deletion", "sv_duplication", "sv_inversion",
                      "sv_insertion", "sv_translocation"):
            self.execute(f"DELETE FROM {table} WHERE sv_callset_id=?", (cid,))
    self.execute("DELETE FROM sv_callset WHERE processed_sample_id=?", (ps_id,))
    if self.table_exists("re_callset"):
        self.execute("DELETE FROM re_callset WHERE processed_sample_id=?",
                     (ps_id,))
    self.commit()


def _add_preferred_transcript(self, transcript_name: str) -> bool:
    """NGSD::addPreferredTranscript — True if added, False if already there;
    unknown transcript names throw."""
    tid = self.transcript_id(transcript_name, False)
    if tid == -1:
        raise NgsdError(f"Transcript '{transcript_name}' not found in NGSD!")
    exists = self.get_value(
        "SELECT count(*) FROM preferred_transcripts WHERE name=?",
        params=(transcript_name,)) > 0
    if exists:
        return False
    self.execute("INSERT INTO preferred_transcripts (name, added_by, "
                 "added_date) VALUES (?, 99, datetime('now'))",
                 (transcript_name,))
    self.commit()
    return True


def _add_sample_relation(self, sample1: str, sample2: str, relation: str,
                         user_login: str = "ahmustm1"):
    """NGSD::addSampleRelation."""
    user_id = self.get_value("SELECT id FROM user WHERE user_id=?",
                             params=(current_user_login() or user_login,))
    self.execute(
        "INSERT OR IGNORE INTO sample_relations (sample1_id, relation, "
        "sample2_id, user_id) VALUES (?, ?, ?, ?)",
        (self.sample_id(sample1), relation, self.sample_id(sample2), user_id))
    self.commit()


def _user_role_in(self, user_id: int, roles: list) -> bool:
    """NGSD::userRoleIn."""
    role = self.get_value("SELECT user_role FROM user WHERE id=?",
                          params=(user_id,))
    if role is None:
        raise NgsdError(f"User with id '{user_id}' not found in NGSD!")
    return str(role) in set(roles)


_ESD_FIELDS = [
    "dna_rna", "reviewer1", "review_date1", "reviewer2", "review_date2",
    "analysis_scope", "acmg_requested", "acmg_noticeable", "acmg_analyzed",
    "filtered_by_freq_based_dominant", "filtered_by_freq_based_recessive",
    "filtered_by_mito", "filtered_by_x_chr", "filtered_by_cnv",
    "filtered_by_svs", "filtered_by_res", "filtered_by_mosaic",
    "filtered_by_phenotype", "filtered_by_multisample",
    "filtered_by_trio_stringent", "filtered_by_trio_relaxed",
]


def _store_evaluation_sheet_data(self, esd: dict, overwrite: bool = False):
    """NGSD::storeEvaluationSheetData — insert (or overwrite) the evaluation
    sheet row of a processed sample."""
    exists = self.get_value(
        "SELECT count(*) FROM evaluation_sheet_data WHERE processed_sample_id=?",
        params=(esd["ps_id"],)) > 0
    if exists:
        if not overwrite:
            raise NgsdError("Evaluation sheet data for this sample already "
                            "exists in the NGSD!")
        self.execute("DELETE FROM evaluation_sheet_data WHERE "
                     "processed_sample_id=?", (esd["ps_id"],))

    def uid(name):
        return self.get_value("SELECT id FROM user WHERE name=?", params=(name,))

    cols = ["processed_sample_id", "dna_rna", "reviewer1", "review_date1",
            "reviewer2", "review_date2", "analysis_scope", "acmg_requested",
            "acmg_noticeable", "acmg_analyzed",
            "filtered_by_freq_based_dominant",
            "filtered_by_freq_based_recessive", "filtered_by_mito",
            "filtered_by_x_chr", "filtered_by_cnv", "filtered_by_svs",
            "filtered_by_res", "filtered_by_mosaic", "filtered_by_phenotype",
            "filtered_by_multisample", "filtered_by_trio_stringent",
            "filtered_by_trio_relaxed"]
    values = [esd["ps_id"], esd["dna_rna"], uid(esd["reviewer1"]),
              esd["review_date1"], uid(esd["reviewer2"]), esd["review_date2"],
              esd["analysis_scope"]]
    values += [1 if esd[f] else 0 for f in _ESD_FIELDS[6:]]
    placeholders = ", ".join("?" for _ in cols)
    self.execute(f"INSERT INTO evaluation_sheet_data ({', '.join(cols)}) "
                 f"VALUES ({placeholders})", tuple(values))
    self.commit()


def _evaluation_sheet_data(self, ps_id) -> dict:
    """NGSD::evaluationSheetData."""
    rows = self.get_rows(
        "SELECT processed_sample_id, dna_rna, reviewer1, review_date1, "
        "reviewer2, review_date2, analysis_scope, acmg_requested, "
        "acmg_noticeable, acmg_analyzed, filtered_by_freq_based_dominant, "
        "filtered_by_freq_based_recessive, filtered_by_mito, "
        "filtered_by_x_chr, filtered_by_cnv, filtered_by_svs, "
        "filtered_by_res, filtered_by_mosaic, filtered_by_phenotype, "
        "filtered_by_multisample, filtered_by_trio_stringent, "
        "filtered_by_trio_relaxed FROM evaluation_sheet_data WHERE "
        "processed_sample_id=?", params=(ps_id,))
    if not rows:
        raise NgsdError(f"No evaluation sheet data for processed sample "
                        f"'{ps_id}'!")
    r = rows[0]
    out = {"ps_id": str(r[0]), "dna_rna": r[1],
           "reviewer1": self.user_name(r[2]), "review_date1": str(r[3]),
           "reviewer2": self.user_name(r[4]), "review_date2": str(r[5]),
           "analysis_scope": r[6]}
    for i, f in enumerate(_ESD_FIELDS[6:], start=7):
        out[f] = str(r[i]) == "1"
    return out


NGSD.check_value = _check_value
NGSD.table_info = _table_info
NGSD.sv_table_name = staticmethod(_sv_table_name)
NGSD.user_name = _user_name
NGSD.user_email = _user_email
NGSD.cnv_id = _cnv_id
NGSD.delete_variants = _delete_variants
NGSD.add_preferred_transcript = _add_preferred_transcript
NGSD.add_sample_relation = _add_sample_relation
NGSD.user_role_in = _user_role_in
NGSD.store_evaluation_sheet_data = _store_evaluation_sheet_data
NGSD.evaluation_sheet_data = _evaluation_sheet_data
