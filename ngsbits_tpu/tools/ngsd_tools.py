"""NGSD administration and import tools.

Behavioral reference: ngs-bits src/NGSDInit/main.cpp, src/NGSDImportQC/...
(each tool's docstring cites its own reference file).
"""

from __future__ import annotations

import sys

from ngsbits_tpu.utils.stdio import stdin_binary

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
        fh = open(in_path, "rb") if in_path else stdin_binary()
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


class NGSDImportOMIMTool(ToolBase):
    """Behavioral reference: src/NGSDImportOMIM/main.cpp."""

    name = "NGSDImportOMIM"
    description = "Imports OMIM genes/phenotypes into the NGSD."

    def setup(self):
        self.add_infile("gene", "OMIM 'mim2gene.txt' file from 'http://omim.org/downloads/'.")
        self.add_infile("morbid", "OMIM 'morbidmap.txt' file from 'http://omim.org/downloads/'.")
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_flag("force", "If set, overwrites old data.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        if not db.table_empty("omim_gene") or not db.table_empty("omim_phenotype"):
            if self.get_flag("force"):
                db.clear_table("omim_phenotype")
                db.clear_table("omim_gene")
            else:
                raise ToolError("Tables already contain data! Use '-force' to overwrite old data!")

        sys.stdout.write("Importing OMIM genes...\n")
        version = ""
        mim2gene_id = {}
        with open(self.get_infile("gene"), "rb") as fh:
            for raw in fh:
                line = raw.strip()
                if not line:
                    continue
                if line.startswith(b"#"):
                    if line.startswith(b"# Generated:"):
                        version = line[12:].strip().decode()
                    continue
                parts = line.split(b"\t")
                if len(parts) < 4:
                    continue
                if b"gene" not in parts[1].strip():
                    continue
                gene = parts[3].strip().decode()
                if not gene:
                    continue
                approved = db.gene_to_approved(gene)
                if not approved:
                    sys.stdout.write(f"Gene '{gene}' could not be converted to approved symbol! Using it anyway.\n")
                    approved = gene
                mim = parts[0].decode()
                db.execute("INSERT INTO omim_gene (gene, mim) VALUES (?, ?)", (approved, mim))
                mim2gene_id[mim] = db.last_insert_id()
        c_genes = len(db.get_values("SELECT gene FROM omim_gene"))
        c_distinct = len(db.get_values("SELECT DISTINCT gene FROM omim_gene"))
        sys.stdout.write(f"Imported {c_genes} genes ({c_genes - c_distinct} duplicate genes)\n")

        sys.stdout.write("\nImporting OMIM gene-phenotype relations...\n")
        with open(self.get_infile("morbid"), "rb") as fh:
            for raw in fh:
                line = raw.strip()
                if not line or line.startswith(b"#"):
                    continue
                parts = line.split(b"\t")
                if len(parts) < 3:
                    continue
                phenotype = parts[0].strip().decode()
                gene_mim = parts[2].strip().decode()
                if not phenotype or not gene_mim or gene_mim not in mim2gene_id:
                    continue
                db.execute("INSERT INTO omim_phenotype (omim_gene_id, phenotype) VALUES (?, ?)",
                           (mim2gene_id[gene_mim], phenotype))
        sys.stdout.write(f"Imported {db.get_value('SELECT COUNT(*) FROM omim_phenotype')} phenotypes\n")
        c_pheno = len(db.get_values("SELECT DISTINCT omim_gene_id FROM omim_phenotype"))
        sys.stdout.write(f"{c_pheno} out of the {c_genes} genes have phenotype information\n")
        db.commit()
        db.set_database_info("OMIM", version)
        db.close()


class NGSDImportORPHATool(ToolBase):
    """Behavioral reference: src/NGSDImportORPHA/main.cpp."""

    name = "NGSDImportORPHA"
    description = "Imports ORPHA diseases/genes into the NGSD."

    def setup(self):
        self.add_infile("terms", "Terms XML file from 'https://www.orphadata.com/data/xml/en_product1.xml'.")
        self.add_infile("genes", "Terms<>genes XML file from 'https://www.orphadata.com/data/xml/en_product6.xml'.")
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_flag("force", "If set, overwrites old data.")

    def main(self):
        import xml.etree.ElementTree as ET
        db = NGSD(self.get_flag("test"))
        if not db.table_empty("disease_term") or not db.table_empty("disease_gene"):
            if self.get_flag("force"):
                db.clear_table("disease_gene")
                db.clear_table("disease_term")
            else:
                raise ToolError("Tables already contain data! Use '-force' to overwrite old data!")

        approved = db.approved_gene_names()
        sys.stdout.write("Parsing gene-disease relations...\n")
        disease_genes: dict[str, list[str]] = {}
        root = ET.parse(self.get_infile("genes")).getroot()
        for disorder in root.iter("Disorder"):
            code = disorder.findtext("OrphaCode")
            if code is None:
                continue
            number = "ORPHA:" + code
            for gene_el in disorder.iter("Gene"):
                symbol = gene_el.findtext("Symbol")
                if symbol is None:
                    continue
                gene = db.gene_to_approved(symbol, True)
                if gene in approved:
                    lst = disease_genes.setdefault(number, [])
                    if gene not in lst:
                        lst.append(gene)
                else:
                    sys.stdout.write(f"Warning: Skipping non-approved gene name '{gene}' for term '{number}'!\n")

        sys.stdout.write("Importing ORPHA information...\n")
        tree = ET.parse(self.get_infile("terms"))
        root = tree.getroot()
        version = (root.get("date") or "")[:10]
        for disorder in root.iter("Disorder"):
            number = "ORPHA:" + (disorder.findtext("OrphaCode") or "")
            name = disorder.findtext("Name") or ""
            synonyms = [s.text or "" for s in disorder.iter("Synonym")]
            skip = any((f.findtext("Label") in ("Obsolete entity", "offline"))
                       for f in disorder.iter("DisorderFlag"))
            if skip:
                continue
            db.execute("INSERT INTO disease_term (source, identifier, name, synonyms) VALUES ('OrphaNet', ?, ?, ?)",
                       (number, name, "\n".join(synonyms)))
            did = db.last_insert_id()
            for gene in disease_genes.get(number, []):
                db.execute("INSERT INTO disease_gene (disease_term_id, gene) VALUES (?, ?)", (did, gene))
        db.commit()
        db.set_database_info("ORPHA", version)
        c_disease = db.get_value("SELECT COUNT(*) FROM disease_term")
        sys.stdout.write(f"Imported {c_disease} diseases\n")
        c_dg = db.get_value("SELECT COUNT(*) FROM disease_gene")
        sys.stdout.write(f"Imported {c_dg} disease-gene relations\n")
        db.close()


class NGSDImportGeneInfoTool(ToolBase):
    """Behavioral reference: src/NGSDImportGeneInfo/main.cpp."""

    name = "NGSDImportGeneInfo"
    description = "Imports gene-specific information into NGSD."

    def setup(self):
        self.add_infile("constraint", "gnomAD gene contraints file (download and unzip https://storage.googleapis.com/gcp-public-data--gnomad/release/v4.1/constraint/gnomad.v4.1.constraint_metrics.tsv)")
        self.add_flag("test", "Uses the test database instead of on the production database.")
        self.add_flag("force", "If set, overwrites old data.")

    def main(self):
        import gzip
        import os
        import re

        db = NGSD(self.get_flag("test"))
        genes = db.get_values("SELECT symbol FROM geneinfo_germline WHERE symbol NOT IN (SELECT symbol FROM gene)")
        if genes:
            sys.stdout.write("Note: 'geneinfo_germline' contains gene symbols that are not approved genes names: "
                             + ", ".join(genes) + "\n\n")
        ensg2symbol = dict(db.get_rows("SELECT ensembl_id, symbol FROM gene"))
        db.execute("UPDATE geneinfo_germline SET gnomad_oe_syn=NULL, gnomad_oe_mis=NULL, gnomad_oe_lof=NULL, gnomad_pli=NULL")

        sys.stdout.write("Getting ENSG to gene name mapping from NGSD...\n")
        sys.stdout.write("Importing gnomAD constraints...\n")
        c_inserted = c_skipped = 0
        path = self.get_infile("constraint")
        opener = gzip.open if path.endswith((".gz", ".bgz")) else open
        idx = {}
        with opener(path, "rb") as fh:
            for raw in fh:
                line = raw.rstrip(b"\r\n")
                if not line:
                    continue
                parts = line.split(b"\t")
                if len(parts) < 111:
                    continue
                if parts[0] == b"gene":
                    for key in ("syn.oe", "mis.oe", "lof.oe", "lof.pLI", "canonical", "mane_select"):
                        idx[key] = parts.index(key.encode())
                    continue
                if parts[idx["canonical"]].strip() != b"true" and parts[idx["mane_select"]].strip() != b"true":
                    continue
                gene = ensg2symbol.get(parts[1].decode(), "")
                if not gene:
                    c_skipped += 1
                    continue
                vals = []
                for key, prec in (("syn.oe", 2), ("mis.oe", 2), ("lof.oe", 2), ("lof.pLI", 3)):
                    # bug-compatible: pLI NA-check uses the lof.oe column
                    check = parts[idx["lof.oe"]] if key == "lof.pLI" else parts[idx[key]]
                    if check == b"NA":
                        vals.append(None)
                    else:
                        vals.append(f"{float(parts[idx[key]]):.{prec}f}")
                db.execute("INSERT INTO geneinfo_germline (symbol, inheritance, gnomad_oe_syn, gnomad_oe_mis, gnomad_oe_lof, gnomad_pli, comments) "
                           "VALUES (?, 'n/a', ?, ?, ?, ?, '') "
                           "ON CONFLICT(symbol) DO UPDATE SET gnomad_oe_syn=excluded.gnomad_oe_syn, "
                           "gnomad_oe_mis=excluded.gnomad_oe_mis, gnomad_oe_lof=excluded.gnomad_oe_lof, gnomad_pli=excluded.gnomad_pli",
                           (gene, *vals))
                c_inserted += 1
        sys.stdout.write(f"  skipped {c_skipped} lines because no gene symbol could be determined based on ENSG\n")
        sys.stdout.write(f"  imported constraint info for {c_inserted} genes\n\n")

        sys.stdout.write("\nSetting gene inheritance based on info from HPO...\n")
        c_noinfo = c_unchanged = c_update = c_check = 0
        for gene in db.get_values("SELECT symbol FROM gene"):
            inh_old = db.get_value("SELECT inheritance FROM geneinfo_germline WHERE symbol=?", params=(gene,)) or "n/a"
            chrs = ",".join(db.get_values(
                "SELECT DISTINCT gt.chromosome FROM gene_transcript gt, gene g WHERE g.id=gt.gene_id AND g.symbol=?",
                params=(gene,)))
            modes = db.get_values(
                "SELECT ht.name FROM hpo_term ht, hpo_genes hg WHERE hg.hpo_term_id=ht.id AND hg.gene=? "
                "AND ht.name LIKE '%inheritance%' ORDER BY ht.name DESC", params=(gene,))
            inh_list = []
            for mode, tag, cond in (
                    ("X-linked recessive inheritance", "XLR", "X" in chrs),
                    ("X-linked dominant inheritance", "XLD", "X" in chrs),
                    ("Mitochondrial inheritance", "MT", "M" in chrs),
                    ("Autosomal recessive inheritance", "AR", bool(re.search(r"\d", chrs))),
                    ("Autosomal dominant inheritance", "AD", bool(re.search(r"\d", chrs)))):
                if mode in modes:
                    if cond:
                        inh_list.append(tag)
                    else:
                        sys.stdout.write(f"  skipped invalid inheritance mode '{mode}' for gene {gene} (chromosome {chrs})\n")
            inh_new = "+".join(inh_list) if inh_list else "n/a"
            if inh_new == "n/a" and inh_old == "n/a":
                c_noinfo += 1
            elif inh_new == inh_old or inh_new == "n/a":
                c_unchanged += 1
            elif inh_old == "n/a":
                db.execute("INSERT INTO geneinfo_germline (symbol, inheritance, comments) VALUES (?, ?, '') "
                           "ON CONFLICT(symbol) DO UPDATE SET inheritance=excluded.inheritance",
                           (gene, inh_new))
                c_update += 1
            else:
                sys.stdout.write(f"  check inheritance manually: gene={gene} chr={chrs} old={inh_old} new={inh_new}\n")
                c_check += 1
        sys.stdout.write(f"  genes without inheritance info: {c_noinfo}\n")
        sys.stdout.write(f"  genes with unchanged inheritance: {c_unchanged}\n")
        sys.stdout.write(f"  genes with updated inheritance: {c_update}\n")
        sys.stdout.write(f"  genes that require manual check: {c_check}\n")
        db.commit()

        version = os.path.basename(path)
        tmp = version.replace("gnomad.v", "").replace(".constraint_metrics.tsv", "").replace(".bgz", "").replace("NGSDImportGeneInfo_", "")
        if re.match(r"^[0-9.]+$", tmp):
            version = tmp
        db.set_database_info("gnomAD constraints", version)
        db.close()


TOOLS = {
    "NGSDInit": NGSDInitTool,
    "NGSDImportQC": NGSDImportQCTool,
    "NGSDImportHGNC": NGSDImportHGNCTool,
    "GenesToApproved": GenesToApprovedTool,
    "NGSDImportEnsembl": NGSDImportEnsemblTool,
    "NGSDImportOMIM": NGSDImportOMIMTool,
    "NGSDImportORPHA": NGSDImportORPHATool,
    "NGSDImportGeneInfo": NGSDImportGeneInfoTool,
}
