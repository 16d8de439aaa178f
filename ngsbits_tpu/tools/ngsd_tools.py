"""NGSD administration and import tools.

Behavioral reference: ngs-bits src/NGSDInit/main.cpp, src/NGSDImportQC/...
(each tool's docstring cites its own reference file).
"""

from __future__ import annotations

import sys

from ..ngsd import NGSD, NgsdError
from .toolbase import ToolBase, ToolError


class NGSDInitTool(ToolBase):
    """Behavioral reference: src/NGSDInit/main.cpp."""

    name = "NGSDInit"
    description = "Sets up the NDSD database (creates tables and adds minimal data)."

    def setup(self):
        self.add_infile("add", "Additional SQL script to execute after database initialization.", optional=True)
        self.add_string("force", "Database password needed to re-initialize the production database.", optional=True, default="")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        db.init()
        add = self.get_infile("add")
        if add:
            db.run_mysql_file(add)
        db.close()
        sys.stdout.write("Database initialization succesfully.\n")
        sys.stdout.write("You are now able to login with user name 'admin' and password 'admin' via GSvar.\n")
        sys.stdout.write("**Please change the password on first login!**\n")


class NGSDImportQCTool(ToolBase):
    """Behavioral reference: src/NGSDImportQC/main.cpp + NGSD::updateQC."""

    name = "NGSDImportQC"
    description = "Imports QC terms into the NGSD."

    def setup(self):
        self.add_infile("obo", "HPO ontology file from 'https://raw.githubusercontent.com/imgag/ngs-bits/master/src/cppNGS/Resources/qcML.obo'.")
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_flag("debug", "Enable debug output.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        db.update_qc(self.get_infile("obo"), self.get_flag("debug"))
        db.close()


class NGSDImportHGNCTool(ToolBase):
    """Behavioral reference: src/NGSDImportHGNC/main.cpp."""

    name = "NGSDImportHGNC"
    description = "Imports genes from the HGNC flat file."

    def setup(self):
        self.add_infile("in", "HGNC flat file (download https://storage.googleapis.com/public-download-files/hgnc/archive/archive/monthly/tsv/hgnc_complete_set_2026-04-07.tsv)")
        self.add_infile("ensembl", "Ensembl gene file (gff3) to resolve duplicate ENSG identifier (same as NGSDImportEnsembl 'in' parameter).")
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_flag("force", "If set, overwrites old data.")

    def _update_table(self, db: NGSD, table: str):
        sys.stdout.write(f"Updating entries in {table} table...\n")
        genes = set(db.get_values(f"SELECT symbol FROM {table}"))
        c_del = c_upd = 0
        for gene in genes:
            approved, message = db.gene_to_approved_with_message(gene)
            if message.startswith("ERROR:"):
                db.execute(f"DELETE FROM {table} WHERE symbol=?", (gene,))
                c_del += 1
            if message.startswith("REPLACED:"):
                if approved in genes:
                    db.execute(f"DELETE FROM {table} WHERE symbol=?", (gene,))
                    c_del += 1
                else:
                    db.execute(f"UPDATE {table} SET symbol=? WHERE symbol=?", (approved, gene))
                    c_upd += 1
        sys.stdout.write(f"  updated  {c_upd} entries\n")
        sys.stdout.write(f"  deleted  {c_del} entries\n")

    def main(self):
        import os
        db = NGSD(self.get_flag("test"))
        if not db.table_empty("gene") or not db.table_empty("gene_alias"):
            if self.get_flag("force"):
                for t in ("gene_exon", "gene_transcript", "gene_alias",
                          "gene_pseudogene_relation", "gene"):
                    db.clear_table(t)
            else:
                raise ToolError("Tables already contain data! Use '-force' to overwrite old data!")

        valid_types = db.get_enum("gene", "type")

        with open(self.get_infile("in"), "rb") as fh:
            lines = [l.rstrip(b"\r\n") for l in fh]

        # pass 1: duplicate ENSG ids (main.cpp:168-196)
        sys.stdout.write("Extract duplicate ENSG ids...\n")
        ensg_ids = set()
        duplicates = set()
        for line in lines:
            sline = line.strip()
            if not sline or sline.startswith(b"hgnc_id"):
                continue
            parts = sline.split(b"\t")
            if len(parts) < 11:
                raise ToolError(f"Invalid line (too few values): {line.decode()}")
            if len(parts) < 20 or not parts[19].strip():
                continue
            ensg = parts[19].strip()
            if ensg in ensg_ids:
                duplicates.add(ensg)
            else:
                ensg_ids.add(ensg)
        sys.stdout.write(f"ENSG IDs used for more than one gene ({len(duplicates)}): "
                         + ", ".join(sorted(d.decode() for d in duplicates)) + "\n")

        # ENSG -> HGNC mapping from the Ensembl GFF3 (main.cpp:90-130)
        sys.stdout.write("Get ENSG -> HGNC mapping from ensembl file...\n")
        mapping: dict[bytes, bytes] = {}
        if duplicates:
            with open(self.get_infile("ensembl"), "rb") as fh:
                for raw in fh:
                    line = raw.strip()
                    if not line or line.startswith(b"#"):
                        continue
                    parts = line.split(b"\t")
                    if len(parts) < 9:
                        raise ToolError(f"Invalid line (too few values): {line.decode()}")
                    comment = parts[8]
                    if not comment.startswith(b"ID=gene:"):
                        continue
                    ensg = comment.split(b";")[0].split(b":")[1].strip()
                    if ensg not in duplicates:
                        continue
                    for kv in comment.split(b";"):
                        if kv.startswith(b"description="):
                            if b"Source:HGNC Symbol%3BAcc:HGNC" not in kv:
                                raise ToolError(f"Gene line doesn't contain HGNC identifier: {line.decode()}")
                            hgnc = kv.split(b"[")[1].split(b"]")[0].split(b":")[-1]
                            mapping[ensg] = b"HGNC:" + hgnc
                            break
                    if len(mapping) == len(duplicates):
                        break
            if len(mapping) != len(duplicates):
                raise ToolError("Couldn't find all duplicate ENSG ids in ensembl file.")

        # pass 2: import (main.cpp:210-276)
        sys.stdout.write("Parse HGNC file and import genes into the NGSD...\n")
        for line in lines:
            if not line.strip() or line.startswith(b"hgnc_id"):
                continue
            parts = line.split(b"\t")
            if len(parts) < 11:
                raise ToolError(f"Invalid line (too few values): {line.decode()}")
            status = parts[5]
            if status == b"Entry Withdrawn":
                continue
            if status != b"Approved":
                raise ToolError(f"Unknown status '{status.decode()}' in line: {line.decode()}")
            locus = parts[3].decode()
            if locus == "phenotype":
                continue
            if locus not in valid_types:
                raise ToolError(f"Unknown locus '{locus}' in line: {line.decode()}")
            hgnc_num = parts[0][5:].decode()
            symbol = parts[1].upper().decode()
            ensg_id = None
            if len(parts) > 19 and parts[19].strip():
                ensg_id = parts[19].strip()
                # bug-compatible: the reference looks the HGNC number up in the
                # ENSG-keyed map, so duplicates always get NULL (main.cpp:244-250)
                if ensg_id in duplicates and mapping.get(hgnc_num.encode()) != ensg_id:
                    ensg_id = None
            ncbi_id = int(parts[18].strip()) if parts[18].strip() else None
            db.execute("INSERT INTO gene (hgnc_id, symbol, name, type, ensembl_id, ncbi_id) "
                       "VALUES (?, ?, ?, ?, ?, ?)",
                       (hgnc_num, symbol, parts[2].decode(), locus,
                        ensg_id.decode() if ensg_id else None, ncbi_id))
            gene_id = db.last_insert_id()
            for raw_names, type_ in ((parts[10], "previous"), (parts[8], "synonym")):
                for nm in raw_names.split(b"|"):
                    nm = nm.replace(b'"', b"").strip().upper()
                    if nm:
                        db.execute("INSERT INTO gene_alias (gene_id, symbol, type) VALUES (?, ?, ?)",
                                   (gene_id, nm.decode(), type_))

        total = db.get_value("SELECT count(*) FROM gene")
        sys.stdout.write(f"  {total} gene symbols imported into the NGSD:\n")
        for t in valid_types:
            n = db.get_value("SELECT count(*) FROM gene WHERE type=?", params=(t,))
            sys.stdout.write(f"    {n} genes of type '{t}'\n")
        n = db.get_value("SELECT count(*) FROM gene WHERE ensembl_id IS NULL")
        sys.stdout.write(f"    {n} genes without Ensembl ID\n")

        self._update_table(db, "geneinfo_germline")
        self._update_table(db, "somatic_gene_role")
        self._update_table(db, "somatic_pathway_gene")
        db.commit()

        version = os.path.basename(self.get_infile("in"))
        tmp = version.replace("hgnc_complete_set_", "").replace(".tsv", "")
        import datetime
        try:
            datetime.date.fromisoformat(tmp)
            version = tmp
        except ValueError:
            pass
        db.set_database_info("HGNC", version)
        db.close()


class GenesToApprovedTool(ToolBase):
    """Behavioral reference: src/GenesToApproved/main.cpp."""

    name = "GenesToApproved"
    description = "Replaces gene symbols by approved symbols using the HGNC database."

    def setup(self):
        self.add_infile("in", "Input TXT file with one gene symbol per line. If unset, reads from STDIN.", optional=True)
        self.add_outfile("out", "Output TXT file with approved gene symbols. If unset, writes to STDOUT.", optional=True)
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_flag("report_ambiguous", "Report all matching genes for ambiguous previous/synonymous symbols - instead of an error.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        in_path = self.get_infile("in")
        out_path = self.get_outfile("out")
        if in_path and in_path == out_path:
            raise ToolError("Input and output files must be different when streaming!")
        fh = open(in_path, "rb") if in_path else sys.stdin.buffer
        out = open(out_path, "w") if out_path else sys.stdout
        for raw in fh:
            gene = raw.decode().strip().upper()
            if not gene or gene[0] == "#":
                continue
            if self.get_flag("report_ambiguous"):
                for sym, msg in db.gene_to_approved_with_message_and_ambiguous(gene):
                    out.write(f"{sym}\t{msg}\n")
            else:
                sym, msg = db.gene_to_approved_with_message(gene)
                out.write(f"{sym}\t{msg}\n")
        if in_path:
            fh.close()
        if out_path:
            out.close()
        db.close()


class NGSDImportEnsemblTool(ToolBase):
    """Behavioral reference: src/NGSDImportEnsembl/main.cpp."""

    name = "NGSDImportEnsembl"
    description = "Imports Ensembl/CCDS transcript information into NGSD."

    def setup(self):
        self.add_infile("in", "Ensembl transcript file (download and unzip https://ftp.ensembl.org/pub/release-115/gff3/homo_sapiens/Homo_sapiens.GRCh38.115.gff3.gz).")
        self.add_infile_list("pseudogenes", "Pseudogene flat file(s) (download from http://pseudogene.org/psidr/psiDR.v0.txt and http://pseudogene.org/psicube/data/gencode.v10.pgene.parents.txt).", optional=True)
        self.add_flag("all", "If set, all transcripts are imported (the default is to skip transcripts that do not have at least one of the flags 'GENCODE basic', 'Ensembl canonical', 'MANE select' or 'MANE plus clinical').")
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_flag("force", "If set, overwrites old data.")

    def _add_transcript(self, db, gene_id, name, version, source, t) -> int:
        if t.coding_start != 0 and t.coding_end != 0:
            cs = min(t.coding_start, t.coding_end)
            ce = max(t.coding_start, t.coding_end)
        else:
            cs = ce = None
        flags = (t.is_gencode_basic, t.is_gencode_primary, t.is_ensembl_canonical,
                 t.is_mane_select, t.is_mane_plus_clinical) if source == "ensembl" \
            else (False, False, False, False, False)
        db.execute(
            "INSERT INTO gene_transcript (gene_id, name, version, source, chromosome, "
            "start_coding, end_coding, strand, biotype, is_gencode_basic, is_gencode_primary, "
            "is_ensembl_canonical, is_mane_select, is_mane_plus_clinical) "
            "VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
            (gene_id, name, version, source, t.chr.str_normalized(False), cs, ce,
             t.strand, t.biotype, *[int(f) for f in flags]))
        return db.last_insert_id()

    def _import_pseudogenes(self, db, enst2ensg, ensg2symbol, path):
        stats = dict.fromkeys(
            ("missing_pg_tid", "missing_parent_file", "missing_parent_tid",
             "missing_gene_name", "unknown_transcript", "gene_gene", "by_name",
             "gene_name", "duplicates"), 0)
        with open(path, "rb") as fh:
            for raw in fh:
                line = raw.strip()
                if (not line or line.startswith(b"#") or line.startswith(b"Pseudogene_id")
                        or line.startswith(b"ID")):
                    continue
                parts = line.split(b"\t")
                if len(parts) < 8:
                    continue
                pg_enst = parts[0].split(b".")[0].strip().decode()
                parent_enst = parts[7].split(b".")[0].strip().decode()
                if not parent_enst:
                    stats["missing_parent_file"] += 1
                    continue
                parent_tid = db.transcript_id(parent_enst, False)
                if parent_tid == -1:
                    stats["missing_parent_tid"] += 1
                    continue
                parent_gene_id = db.get_value(
                    "SELECT gene_id FROM gene_transcript WHERE id=?", params=(parent_tid,))
                pg_tid = db.transcript_id(pg_enst, False)
                if pg_tid != -1:
                    pg_gene_id = db.get_value(
                        "SELECT gene_id FROM gene_transcript WHERE id=?", params=(pg_tid,))
                    if db.get_value("SELECT id FROM gene_pseudogene_relation WHERE parent_gene_id=? AND pseudogene_gene_id=?",
                                    params=(parent_gene_id, pg_gene_id)) is None:
                        db.execute("INSERT INTO gene_pseudogene_relation (parent_gene_id, pseudogene_gene_id, gene_name) VALUES (?, ?, NULL)",
                                   (parent_gene_id, pg_gene_id))
                        stats["gene_gene"] += 1
                    else:
                        stats["duplicates"] += 1
                else:
                    stats["missing_pg_tid"] += 1
                    if pg_enst in enst2ensg:
                        ensg = enst2ensg[pg_enst]
                        if ensg in ensg2symbol:
                            symbol = ensg2symbol[ensg].split(".")[0].strip()
                            pg_gene_id = db.gene_to_approved_id(symbol)
                            if pg_gene_id != -1:
                                if db.get_value("SELECT id FROM gene_pseudogene_relation WHERE parent_gene_id=? AND pseudogene_gene_id=?",
                                                params=(parent_gene_id, pg_gene_id)) is None:
                                    db.execute("INSERT INTO gene_pseudogene_relation (parent_gene_id, pseudogene_gene_id, gene_name) VALUES (?, ?, NULL)",
                                               (parent_gene_id, pg_gene_id))
                                    stats["by_name"] += 1
                                else:
                                    stats["duplicates"] += 1
                            else:
                                label = f"{ensg};{symbol}"
                                if db.get_value("SELECT id FROM gene_pseudogene_relation WHERE parent_gene_id=? AND gene_name=?",
                                                params=(parent_gene_id, label)) is None:
                                    db.execute("INSERT INTO gene_pseudogene_relation (parent_gene_id, pseudogene_gene_id, gene_name) VALUES (?, NULL, ?)",
                                               (parent_gene_id, label))
                                    stats["gene_name"] += 1
                                else:
                                    stats["duplicates"] += 1
                        else:
                            sys.stdout.write(f"No gene name found for ensembl gene id '{ensg}'! \n")
                            stats["missing_gene_name"] += 1
                    else:
                        sys.stdout.write(f"Pseudogene transcript '{pg_enst}' not found in ensembl flat file! \n")
                        stats["unknown_transcript"] += 1
        import os
        w = sys.stdout.write
        w(f"pseudogene flat file: {os.path.basename(path)}\n")
        w(f"\t missing parent transcript ids in File: {stats['missing_parent_file']}\n")
        w(f"\t missing pseudogene transcript ids in NGSD: {stats['missing_pg_tid']}\n")
        w(f"\t missing parent transcript ids in NGSD: {stats['missing_parent_tid']}\n")
        w(f"\n\t found gene-gene relations: {stats['gene_gene']}\n")
        w(f"\t additional gene-gene relations by name matching: {stats['by_name']}\n")
        w(f"\t found gene-name relations: {stats['gene_name']}\n")
        w(f"\t pseudogenes with no gene name: {stats['missing_gene_name']}\n")
        w(f"\t pseudogenes with unknown transcript: {stats['unknown_transcript']}\n")
        w(f"\t pseudogenes already in database: {stats['duplicates']}\n")

    def main(self):
        import os

        from ..core import resources
        from ..core.intervals import BedFile, BedLine
        from ..core.transcripts import load_gff3

        db = NGSD(self.get_flag("test"))
        all_flag = self.get_flag("all")
        par = resources.pseudoautosomal_regions("hg38")

        if (not db.table_empty("gene_transcript") or not db.table_empty("gene_exon")
                or not db.table_empty("gene_pseudogene_relation")):
            if self.get_flag("force"):
                for t in ("gene_exon", "gene_transcript", "gene_pseudogene_relation"):
                    db.clear_table(t)
            else:
                raise ToolError("Tables already contain data! Use '-force' to overwrite old data!")

        data = load_gff3(self.get_infile("in"), include_all=True,
                         skip_not_hgnc=False, print_to_stdout=True)
        approved = db.approved_gene_names()
        ccds_added = set()
        for t in data.transcripts:
            flags = (t.is_gencode_basic, t.is_gencode_primary,
                     t.is_ensembl_canonical, t.is_mane_select, t.is_mane_plus_clinical)
            if not all_flag and not any(flags):
                continue
            hgnc_num = t.hgnc_id.split(":")[-1] if t.hgnc_id else ""
            gene_id = None
            if hgnc_num:
                gene_id = db.get_value("SELECT id FROM gene WHERE hgnc_id=?", params=(hgnc_num,))
            if gene_id is None and t.gene_id:
                gene_id = db.get_value("SELECT id FROM gene WHERE ensembl_id=?", params=(t.gene_id,))
            if gene_id is None and t.gene in approved:
                gene_id = db.gene_to_approved_id(t.gene)
                sys.stdout.write(f"Notice: HGNC-approved symbol of gene {t.gene}/{t.gene_id}/{t.hgnc_id} determined via gene name\n")
            if gene_id is None or gene_id == -1:
                sys.stdout.write(f"Notice: Could not determine HGNC-approved symbol of gene {t.gene}/{t.gene_id}/{t.hgnc_id}\n")
                continue
            if t.chr.is_y() and par.overlaps_with(t.chr, t.start(), t.end()):
                sys.stdout.write(f"Notice: skipped chrY PAR transcript of {t.gene}/{t.gene_id}/{t.hgnc_id}\n")
                continue
            tid = self._add_transcript(db, gene_id, t.name, t.version, "ensembl", t)
            db.executemany("INSERT INTO gene_exon (transcript_id, start, end) VALUES (?, ?, ?)",
                           [(tid, l.start, l.end) for l in t.regions.lines])
            if t.name_ccds and t.name_ccds not in ccds_added:
                parts = t.name_ccds.split(".")
                if len(parts) != 2:
                    raise ToolError(f"CCDS transcript name does not contain two parts separated by '.': {t.name_ccds}")
                tid_ccds = self._add_transcript(db, gene_id, parts[0], int(parts[1]), "ccds", t)
                exons = BedFile()
                cs = min(t.coding_start, t.coding_end)
                ce = max(t.coding_start, t.coding_end)
                for l in t.regions.lines:
                    s, e = max(l.start, cs), min(l.end, ce)
                    if s <= e:
                        exons.append(BedLine(l.chr, s, e))
                db.executemany("INSERT INTO gene_exon (transcript_id, start, end) VALUES (?, ?, ?)",
                               [(tid_ccds, l.start, l.end) for l in exons.lines])
                ccds_added.add(t.name_ccds)
        db.commit()

        for path in self.get_infile_list("pseudogenes"):
            self._import_pseudogenes(db, data.enst2ensg, data.ensg2symbol, path)
        db.commit()

        sys.stdout.write(f"Imported {db.get_value('SELECT count(*) FROM gene_transcript')} transcripts into NGSD\n")

        version = os.path.basename(self.get_infile("in"))
        tmp = version.replace("Homo_sapiens.GRCh38.", "").replace(".gff3", "").replace(".gz", "")
        if tmp.replace(".", "").isdigit():
            version = tmp
        db.set_database_info("Ensembl", version)
        db.close()


TOOLS = {
    "NGSDInit": NGSDInitTool,
    "NGSDImportQC": NGSDImportQCTool,
    "NGSDImportHGNC": NGSDImportHGNCTool,
    "GenesToApproved": GenesToApprovedTool,
    "NGSDImportEnsembl": NGSDImportEnsemblTool,
}
