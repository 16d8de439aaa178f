"""NGSDTransferReportConfig — transfer a germline report configuration.

Behavioral reference: ngs-bits src/NGSDTransferReportConfig/main.cpp +
NGSD::reportConfig/setReportConfig (see ngsd/report_config.py).
"""

from __future__ import annotations

import sys

from ..core.chromosome import Chromosome
from ..io.bedpe import BedpeFile, BedpeLine
from ..io.cnv import CnvList
from ..io.gsvar import GSvarFile
from ..io.repeat_locus import RepeatLocusList
from ..ngsd import NGSD, NgsdError
from ..ngsd import report_config as rc
from ..qc import sample_similarity as ss
from .bedpe_counts import _find_match as bedpe_find_match
from .toolbase import ToolBase, ToolError

_SV_TABLES = {"DEL": "sv_deletion", "DUP": "sv_duplication", "INS": "sv_insertion",
              "INV": "sv_inversion", "BND": "sv_translocation"}


def _gsvar_variant_str(v) -> str:
    return f"{v.chr.str_normalized(True)}:{v.start}-{v.end} {v.ref.decode()}>{v.obs.decode()}"


def _db_variant_str(db, variant_id) -> str:
    chrom, start, end, ref, obs = db.get_rows(
        "SELECT chr, start, end, ref, obs FROM variant WHERE id=?", params=(variant_id,))[0]
    return f"{chrom}:{start}-{end} {ref}>{obs}"


def _bedpe_line_str(sv, add_type=True) -> str:
    t = sv.type.decode()
    if t in ("INV", "DEL", "DUP"):
        return (f"{t} at " if add_type else "") + f"{sv.chr1.str_normalized(True)}:{sv.start1}-{sv.end2}"
    if t == "BND":
        return ("BND from " if add_type else "") + \
            f"{sv.chr1.str_normalized(True)}:{sv.start1}-{sv.end1} to {sv.chr2.str_normalized(True)}:{sv.start2}-{sv.end2}"
    return (f"INS at " if add_type else "") + \
        f"{sv.chr1.str_normalized(True)}:{min(sv.start1, sv.start2)}-{max(sv.end1, sv.end2)}"


def _structural_variant_line(db, sv_id, sv_type, svs) -> BedpeLine:
    """NGSD::structuralVariant — positions + GT + INS sequence annotations."""
    from .ngsd_export_sv_cnv import NGSDExportSVTool
    table = _SV_TABLES[sv_type]
    pos, _cs, geno, _x = NGSDExportSVTool._structural_variant(db, table, sv_type, sv_id)
    chr1, s1, e1, chr2, s2, e2 = pos
    anno = [b""] * len(svs.annotation_headers)
    try:
        fmt_idx = svs.annotation_index_by_name(b"FORMAT")
        anno[fmt_idx] = b"GT"
        geno_map = {"hom": b"1/1", "het": b"0/1"}
        anno[fmt_idx + 1] = geno_map.get(geno, b"./.")
    except Exception:
        pass
    if sv_type == "INS":
        ins_seq, known_left, known_right = db.get_rows(
            "SELECT inserted_sequence, known_left, known_right FROM sv_insertion WHERE id=?",
            params=(sv_id,))[0]
        try:
            alt_a_idx = svs.annotation_index_by_name(b"ALT_A")
            anno[alt_a_idx] = ins_seq.encode() if ins_seq else b"<INS>"
            parts = []
            if known_left:
                parts.append(b"LEFT_SVINSSEQ=" + known_left.encode())
            if known_right:
                parts.append(b"RIGHT_SVINSSEQ=" + known_right.encode())
            anno[svs.annotation_index_by_name(b"INFO_A")] = b";".join(parts)
        except Exception:
            pass
    return BedpeLine(chr1, s1, e1, chr2, s2, e2, sv_type.encode(), anno)


def _cnv_find_match(cnvs: CnvList, cnv, copy_number: int, fuzzy: bool) -> int:
    """CnvList::findMatch."""
    for i, c in enumerate(cnvs.variants):
        if c.chr.num == cnv.chr.num and c.start == cnv.start and c.end == cnv.end:
            if copy_number >= 0 and c.copy_number(cnvs.annotation_headers) != copy_number:
                continue
            return i
        elif fuzzy and c.chr.num == cnv.chr.num and c.start <= cnv.end and cnv.start <= c.end:
            overlap = min(c.end, cnv.end) - max(c.start, cnv.start)
            if overlap / (cnv.end - cnv.start) < 0.9 or overlap / (c.end - c.start) < 0.9:
                continue
            if copy_number >= 0 and c.copy_number(cnvs.annotation_headers) != copy_number:
                continue
            return i
    return -1


def _re_find_match(res: RepeatLocusList, re_locus, fuzzy: bool) -> int:
    """RepeatLocusList::findMatch."""
    def as_int(allele: bytes) -> int:
        a = allele.strip()
        if b"." in a:
            a = a[:a.index(b".")]
        return int(a) if a else 0
    for i, r in enumerate(res.variants):
        if (r.chr.num != re_locus.chr.num or r.start != re_locus.start
                or r.end != re_locus.end or r.unit != re_locus.unit):
            continue
        if r.allele1 == re_locus.allele1 and r.allele2 == re_locus.allele2:
            return i
        if fuzzy:
            re1_max = max(as_int(r.allele1), as_int(r.allele2))
            re2_max = max(as_int(re_locus.allele1), as_int(re_locus.allele2))
            if re1_max and re2_max:
                frac = min(re1_max
                           / re2_max, re2_max / re1_max)
                if frac >= 0.95:
                    return i
    return -1


def _cnv_str(cnv) -> str:
    return f"{cnv.chr.str_normalized(True)}:{cnv.start}-{cnv.end}"


class NGSDTransferReportConfigTool(ToolBase):
    name = "NGSDTransferReportConfig"
    description = "Transfers (germline) Report Configuration from one sample to another."

    def setup(self):
        self.add_string("source_ps", "Processed sample name from which the ReportConfig is taken.")
        self.add_string("target_ps", "Processed sample name to which the ReportConfig is transferred to.")
        self.add_flag("force", "Transfer report even if some variants aren't present in the target sample (Missing variants will be written into the `report_configuration_failed_transfer` table.)")
        self.add_flag("test", "Uses the test database instead of on the production database.")

    def main(self):
        db = NGSD(self.get_flag("test"))
        source_ps_name = self.get_string("source_ps")
        source_ps_id = str(db.processed_sample_id(source_ps_name))
        target_ps_name = self.get_string("target_ps")
        target_ps_id = str(db.processed_sample_id(target_ps_name))
        force = self.get_flag("force")

        out = sys.stdout
        err = sys.stderr
        out.write(f"{source_ps_name} (ps_id: {source_ps_id}) > {target_ps_name} (ps_id: {target_ps_id})\n")

        if source_ps_id == target_ps_id:
            raise ToolError("Source and target sample cannot be the same!")
        rc_id = db.report_config_id(source_ps_id)
        if rc_id == -1:
            raise ToolError("Source sample doesn't have a ReportConfig!")
        if db.report_config_id(target_ps_id) != -1:
            raise ToolError("Target sample already has a ReportConfig!")

        # sample similarity check (the reference restricts to a coding-region
        # BED shipped as a Qt resource; without it, all GSvar variants count)
        geno1 = ss.genotypes_from_gsvar(db.processed_sample_path(source_ps_id, "GSVAR"), False)
        geno2 = ss.genotypes_from_gsvar(db.processed_sample_path(target_ps_id, "GSVAR"), False)
        sim = ss.calculate_similarity(geno1, geno2)
        out.write(f"Sample correlation:\t{sim.sample_correlation:.4f} (overlapping variants: {sim.ol_count})\n\n")
        if sim.sample_correlation < 0.9:
            raise ToolError(f"Sample correlation between {source_ps_name} and {target_ps_name} to low! "
                            f"({sim.sample_correlation:.4f}, should be above 0.9)")

        src_variants = GSvarFile.from_file(db.processed_sample_path(source_ps_id, "GSVAR"))
        src_cnvs = CnvList.from_file(db.processed_sample_path(source_ps_id, "COPY_NUMBER_CALLS"))
        src_svs = BedpeFile.from_file(db.processed_sample_path(source_ps_id, "STRUCTURAL_VARIANTS"))
        src_res = RepeatLocusList.load(db.processed_sample_path(source_ps_id, "REPEAT_EXPANSIONS"))

        config = rc.load_report_config(db, rc_id)
        self._sort_by_source_index(db, config, src_variants, src_cnvs, src_svs, src_res)

        target_variants = GSvarFile.from_file(db.processed_sample_path(target_ps_id, "GSVAR"))
        target_cnvs = CnvList.from_file(db.processed_sample_path(target_ps_id, "COPY_NUMBER_CALLS"))
        target_svs = BedpeFile.from_file(db.processed_sample_path(target_ps_id, "STRUCTURAL_VARIANTS"))
        target_res = RepeatLocusList.load(db.processed_sample_path(target_ps_id, "REPEAT_EXPANSIONS"))

        target_cnv_callset_id = int(db.get_value(
            "SELECT id FROM cnv_callset WHERE processed_sample_id=?", no_value_is_ok=False, params=(target_ps_id,)))
        target_sv_callset_id = int(db.get_value(
            "SELECT id FROM sv_callset WHERE processed_sample_id=?", no_value_is_ok=False, params=(target_ps_id,)))

        report = ["\t#type\tsource\t\t\t\ttarget"]
        report_missed = ["\t#type\tsource"]
        missed_variants = []
        complete_transfer_possible = True
        transfers = []  # (type, source_row, target_data)

        # --- SNVs/InDels
        n_match = n_missed = n_missed_excluded = 0
        for row in config["variants"]:
            var_str = _db_variant_str(db, row["variant_id"])
            idx = -1
            for i, tv in enumerate(target_variants.variants):
                if _gsvar_variant_str(tv) == var_str:
                    idx = i
                    break
            if idx > -1:
                n_match += 1
                transfers.append(("variant", row, idx))
                report.append(f"\tSNV/InDel\t{var_str}\t{var_str}")
            else:
                if not rc.show_in_report(row):
                    err.write(f"Warning: excuded report variant {var_str} not found in target sample!\n")
                    report_missed.append(f"\tSNV/InDel\t{var_str}(excluded)")
                    n_missed_excluded += 1
                else:
                    err.write(f"Error: report variant {var_str} not found in target sample!\n")
                    report_missed.append(f"\tSNV/InDel\t{var_str}")
                    missed_variants.append(rc.report_variant_to_text(db, row["id"], "SNVS_INDELS", var_str, source_ps_name))
                    n_missed += 1
                    complete_transfer_possible = False
        out.write(f"\tSNVs\tall/match/missed/missed_excluded\t{len(config['variants'])}/{n_match}/{n_missed}/{n_missed_excluded}\n")

        # --- CNVs
        n_match = n_missed = n_missed_excluded = 0
        for row in config["cnvs"]:
            chrom, start, end = db.get_rows("SELECT chr, start, end FROM cnv WHERE id=?",
                                            params=(row["cnv_id"],))[0]
            src_idx = _cnv_find_match(src_cnvs, _CnvShim(chrom, int(start), int(end)), -1, False)
            cnv = src_cnvs.variants[src_idx] if src_idx != -1 else _CnvShim(chrom, int(start), int(end))
            cn = cnv.copy_number(src_cnvs.annotation_headers) if src_idx != -1 else -1
            idx = _cnv_find_match(target_cnvs, cnv, cn, True)
            cnv_str = _cnv_str(cnv)
            if idx > -1:
                n_match += 1
                transfers.append(("cnv", row, idx))
                ngsd_id = rc.cnv_id(db, target_cnvs.variants[idx], target_cnv_callset_id, False)
                if not ngsd_id:
                    report.append(f"\tCNV\t{cnv_str}\t{_cnv_str(target_cnvs.variants[idx])} (not in NGSD yet)")
                else:
                    t_chrom, t_start, t_end = db.get_rows("SELECT chr, start, end FROM cnv WHERE id=?",
                                                          params=(ngsd_id,))[0]
                    report.append(f"\tCNV\t{cnv_str}\t{t_chrom}:{t_start}-{t_end} (already in NGSD)")
            else:
                if not rc.show_in_report(row):
                    err.write(f"Warning: excuded report cnv {cnv_str} not found in target sample!\n")
                    report_missed.append(f"\tCNV\t{cnv_str}(excluded)")
                    n_missed_excluded += 1
                else:
                    err.write(f"Error: report cnv {cnv_str} not found in target sample!\n")
                    report_missed.append(f"\tCNV\t{cnv_str}")
                    missed_variants.append(rc.report_variant_to_text(db, row["id"], "CNVS", cnv_str, source_ps_name))
                    n_missed += 1
                    complete_transfer_possible = False
        out.write(f"\tCNVs\tall/match/missed/missed_excluded\t{len(config['cnvs'])}/{n_match}/{n_missed}/{n_missed_excluded}\n")

        # --- SVs
        n_match = n_missed = n_missed_excluded = 0
        for row in config["svs"]:
            sv_type = None
            sv_db_id = None
            for col, t in rc.SV_ID_COLUMNS:
                if row.get(col) is not None:
                    sv_type = t
                    sv_db_id = row[col]
                    break
            if sv_type is None:
                raise ToolError("Report config entry does not contain a SV id!")
            sv = _structural_variant_line(db, sv_db_id, sv_type, src_svs)
            idx = bedpe_find_match(target_svs, sv, False, True)
            if idx > -1:
                n_match += 1
                transfers.append(("sv", row, idx))
                ngsd_id = rc.sv_id(db, target_svs.lines[idx], target_sv_callset_id, target_svs)
                target_line = _structural_variant_line(db, int(ngsd_id), target_svs.lines[idx].type.decode(), target_svs)
                report.append(f"\tSV\t{_bedpe_line_str(sv)}\t{_bedpe_line_str(target_line)}")
            else:
                if not rc.show_in_report(row):
                    err.write(f"Warning: excuded report sv {_bedpe_line_str(sv)} not found in target sample!\n")
                    report_missed.append(f"\tSV\t{_bedpe_line_str(sv)}(excluded)")
                    n_missed_excluded += 1
                else:
                    err.write(f"Error: report sv {_bedpe_line_str(sv)} not found in target sample!\n")
                    report_missed.append(f"\tSV\t{_bedpe_line_str(sv)}")
                    missed_variants.append(rc.report_variant_to_text(db, row["id"], "SVS", _bedpe_line_str(sv), source_ps_name))
                    n_missed += 1
                    complete_transfer_possible = False
        out.write(f"\tSVs\tall/match/missed/missed_excluded\t{len(config['svs'])}/{n_match}/{n_missed}/{n_missed_excluded}\n")

        # --- REs
        n_match = n_missed = n_missed_excluded = 0
        for row in config["res"]:
            re_locus = rc.repeat_expansion_genotype(db, row["repeat_expansion_genotype_id"])
            idx = _re_find_match(target_res, re_locus, True)
            re_str = re_locus.to_string(True, True)
            if idx > -1:
                n_match += 1
                transfers.append(("re", row, idx))
                re_id = db.repeat_expansion_id(re_locus.region_string(), re_locus.unit.decode())
                ngsd_id = rc.repeat_expansion_genotype_id(db, re_id, int(target_ps_id))
                report.append(f"\tRE\t{re_str}\t{rc.repeat_expansion_genotype(db, ngsd_id).to_string(True, True)}")
            else:
                if not rc.show_in_report(row):
                    err.write(f"Warning: excuded report re {re_str} not found in target sample!\n")
                    report_missed.append(f"\tRE\t{re_str}(excluded)")
                    n_missed_excluded += 1
                else:
                    err.write(f"Error: report re {re_str} not found in target sample!\n")
                    report_missed.append(f"\tRE\t{re_str}")
                    missed_variants.append(rc.report_variant_to_text(db, row["id"], "RES", re_str, source_ps_name))
                    n_missed += 1
                    complete_transfer_possible = False
        out.write(f"\tREs\tall/match/missed/missed_excluded\t{len(config['res'])}/{n_match}/{n_missed}/{n_missed_excluded}\n")

        if len(report) > 1:
            out.write("\n")
            out.write("The following variants can be transferred:\n")
            out.write("\n".join(report))
            out.write("\n")
        if len(report_missed) > 1:
            out.write("\n")
            out.write("The following variants cannot be transferred:\n")
            out.write("\n".join(report_missed))
            out.write("\n")
        out.write("\n")

        if not complete_transfer_possible:
            if force:
                out.write(f"WARNING: Only partial ReportConfig transfer {source_ps_name}>{target_ps_name} possible!\n\n")
            else:
                out.write(f"ERROR: ReportConfig transfer {source_ps_name}>{target_ps_name} is not possible!\n\n")
                raise ToolError(f"ReportConfig transfer {source_ps_name}>{target_ps_name} is not possible!")
        else:
            out.write(f"ReportConfig transfer {source_ps_name}>{target_ps_name} is possible.\n\n")

        self._store_transfer(db, config, transfers, source_ps_id, target_ps_id,
                             target_variants, target_cnvs, target_svs, target_res,
                             target_cnv_callset_id, target_sv_callset_id, missed_variants, rc_id)
        db.close()

    @staticmethod
    def _sort_by_source_index(db, config, src_variants, src_cnvs, src_svs, src_res):
        """NGSD::reportConfig skips rows whose variant is not in the source
        files and ReportConfiguration::set keeps them sorted by file index
        (deduplicating by index)."""
        by_index = {}
        for row in config["variants"]:
            var_str = _db_variant_str(db, row["variant_id"])
            idx = -1
            for i, v in enumerate(src_variants.variants):
                if _gsvar_variant_str(v) == var_str:
                    idx = i
                    break
            if idx != -1:
                by_index[idx] = row
        config["variants"] = [by_index[i] for i in sorted(by_index)]

        by_index = {}
        for row in config["cnvs"]:
            chrom, start, end = db.get_rows("SELECT chr, start, end FROM cnv WHERE id=?",
                                            params=(row["cnv_id"],))[0]
            c = Chromosome(chrom)
            idx = -1
            for i, cnv in enumerate(src_cnvs.variants):
                if cnv.chr.num == c.num and cnv.start == int(start) and cnv.end == int(end):
                    idx = i
                    break
            if idx != -1:
                by_index[idx] = row
        config["cnvs"] = [by_index[i] for i in sorted(by_index)]

        by_index = {}
        for row in config["svs"]:
            for col, t in rc.SV_ID_COLUMNS:
                if row.get(col) is not None:
                    sv = _structural_variant_line(db, row[col], t, src_svs)
                    idx = bedpe_find_match(src_svs, sv, True, False)
                    if idx != -1:
                        by_index[idx] = row
                    break
        config["svs"] = [by_index[i] for i in sorted(by_index)]

        by_index = {}
        for row in config["res"]:
            re_locus = rc.repeat_expansion_genotype(db, row["repeat_expansion_genotype_id"])
            idx = -1
            for i, r in enumerate(src_res.variants):
                if (r.chr.num == re_locus.chr.num and r.start == re_locus.start
                        and r.end == re_locus.end and r.unit == re_locus.unit):
                    idx = i
                    break
            if idx != -1:
                by_index[idx] = row
        config["res"] = [by_index[i] for i in sorted(by_index)]

    def _store_transfer(self, db, config, transfers, source_ps_id, target_ps_id,
                        target_variants, target_cnvs, target_svs, target_res,
                        target_cnv_callset_id, target_sv_callset_id, missed_variants, source_rc_id):
        meta = config["meta"]
        created_by_id = db.get_value("SELECT id FROM user WHERE user_id=?", params=(meta.get("created_by"),))
        db.execute("INSERT INTO `report_configuration`(`processed_sample_id`, `created_by`, `created_date`, "
                   "`last_edit_by`, `last_edit_date`) VALUES (?, ?, ?, ?, CURRENT_TIMESTAMP)",
                   (target_ps_id, created_by_id, meta.get("created_date"), created_by_id))
        new_rc_id = db.last_insert_id()

        for kind, row, idx in transfers:
            data = {k: v for k, v in row.items() if k != "id"}
            data["report_configuration_id"] = new_rc_id
            if kind == "variant":
                v = target_variants.variants[idx]
                variant_id = db.get_value(
                    "SELECT id FROM variant WHERE chr=? AND start=? AND end=? AND ref=? AND obs=?",
                    params=(v.chr.str_normalized(True), v.start, v.end, v.ref.decode(), v.obs.decode()))
                if variant_id is None:
                    variant_id = self._add_variant(db, target_variants, v)
                data["variant_id"] = variant_id
                table = "report_configuration_variant"
            elif kind == "cnv":
                cnv = target_cnvs.variants[idx]
                cnv_id = rc.cnv_id(db, cnv, target_cnv_callset_id, False)
                if not cnv_id:
                    cnv_id = db.add_cnv(target_cnv_callset_id, cnv, target_cnvs)
                data["cnv_id"] = int(cnv_id)
                table = "report_configuration_cnv"
            elif kind == "sv":
                sv = target_svs.lines[idx]
                for col, _t in rc.SV_ID_COLUMNS:
                    data[col] = None
                sv_db_id = rc.sv_id(db, sv, target_sv_callset_id, target_svs)
                col = {"DEL": "sv_deletion_id", "DUP": "sv_duplication_id", "INS": "sv_insertion_id",
                       "INV": "sv_inversion_id", "BND": "sv_translocation_id"}[sv.type.decode()]
                data[col] = int(sv_db_id)
                table = "report_configuration_sv"
            else:  # re
                re_locus = target_res.variants[idx]
                re_id = db.repeat_expansion_id(re_locus.region_string(), re_locus.unit.decode())
                data["repeat_expansion_genotype_id"] = rc.repeat_expansion_genotype_id(db, re_id, int(target_ps_id))
                table = "report_configuration_re"
            cols = ", ".join(f"`{c}`" for c in data)
            placeholders = ", ".join("?" for _ in data)
            db.execute(f"INSERT INTO `{table}` ({cols}) VALUES ({placeholders})", tuple(data.values()))

        # transfer other causal variant
        cur = db.execute("SELECT * FROM report_configuration_other_causal_variant WHERE report_configuration_id=?",
                         (source_rc_id,))
        cols = [d[0] for d in cur.description]
        for r in cur.fetchall():
            data = dict(zip(cols, r))
            data.pop("id", None)
            data["report_configuration_id"] = new_rc_id
            colnames = ", ".join(f"`{c}`" for c in data)
            placeholders = ", ".join("?" for _ in data)
            db.execute(f"INSERT INTO report_configuration_other_causal_variant ({colnames}) VALUES ({placeholders})",
                       tuple(data.values()))

        # transfer last_edit / finalized meta data
        meta = config["meta"]
        last_edit_by = db.get_value("SELECT id FROM user WHERE user_id=?", params=(meta.get("last_edit_by"),))
        db.execute("UPDATE `report_configuration` SET `last_edit_by`=?, `last_edit_date`=? WHERE id=?",
                   (last_edit_by, meta.get("last_edit_date"), new_rc_id))
        if meta.get("finalized_by"):
            fin_by = db.get_value("SELECT id FROM user WHERE user_id=?", params=(meta.get("finalized_by"),))
            db.execute("UPDATE `report_configuration` SET `finalized_by`=?, `finalized_date`=? WHERE id=?",
                       (fin_by, meta.get("finalized_date"), new_rc_id))
        for variant_description in missed_variants:
            db.execute("INSERT INTO report_configuration_failed_transfer (processed_sample_id, status, variant_description) "
                       "VALUES (?, ?, ?)", (int(target_ps_id), "open", variant_description))
        db.commit()

    @staticmethod
    def _add_variant(db, gs, v):
        """NGSD::addVariant — insert a single variant with GSvar annotations."""
        from ..ngsd.db import max_spliceai_score

        def anno(name):
            try:
                return v.annotations[gs.annotation_index(name)].strip()
            except KeyError:
                return b""
        gnomad = anno("gnomAD")
        if gnomad == b"n/a":
            gnomad = b""
        cadd = anno("CADD")
        spliceai = max_spliceai_score(anno("SpliceAI"))
        coding_parts = []
        for entry in anno("coding_and_splicing").split(b","):
            parts = entry.split(b":")
            if len(parts) >= 4:
                coding_parts.append(b":".join(parts[:4]))
        db.execute("INSERT INTO variant (chr, start, end, ref, obs, gnomad, coding, cadd, spliceai) "
                   "VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)",
                   (v.chr.str_normalized(True), v.start, v.end, v.ref.decode(), v.obs.decode(),
                    gnomad.decode() if gnomad else None, b",".join(coding_parts).decode(),
                    cadd.decode() if cadd else None, spliceai if spliceai >= 0 else None))
        return db.last_insert_id()


class _CnvShim:
    def __init__(self, chrom, start, end):
        self.chr = Chromosome(chrom)
        self.start = start
        self.end = end

    def copy_number(self, headers, throw=True):
        return -1

    def to_string(self):
        return f"{self.chr.str}:{self.start}-{self.end}"


TOOLS = {
    "NGSDTransferReportConfig": NGSDTransferReportConfigTool,
    "SamplePath": None,  # registered in sample_path module
}
TOOLS = {
    "NGSDTransferReportConfig": NGSDTransferReportConfigTool,
}
