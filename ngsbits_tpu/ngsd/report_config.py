"""Germline report configuration layer.

Behavioral reference: ngs-bits cppNGSD/ReportConfiguration.{h,cpp} +
NGSD::reportConfig/setReportConfig (cppNGSD/NGSD.cpp). Variant configs are
kept as dicts of the raw table row plus bookkeeping fields.
"""

from __future__ import annotations

from .db import NGSD, NgsdError

EXCLUDE_FLAGS = ["exclude_artefact", "exclude_frequency", "exclude_phenotype",
                 "exclude_mechanism", "exclude_hit2_missing", "exclude_gus",
                 "exclude_used_other_var_type", "exclude_other"]

SV_ID_COLUMNS = [("sv_deletion_id", "DEL"), ("sv_duplication_id", "DUP"),
                 ("sv_insertion_id", "INS"), ("sv_inversion_id", "INV"),
                 ("sv_translocation_id", "BND")]


def _rows_as_dicts(db: NGSD, query: str, params=()):
    cur = db.execute(query, params)
    cols = [d[0] for d in cur.description]
    return [dict(zip(cols, row)) for row in cur.fetchall()]


def show_in_report(row: dict) -> bool:
    """ReportVariantConfiguration::showInReport."""
    return not any(row.get(flag) for flag in EXCLUDE_FLAGS)


def repeat_expansion_genotype(db: NGSD, reg_id: int):
    """NGSD::repeatExpansionGenotype — returns a RepeatLocus."""
    from ..io.repeat_locus import RepeatLocus
    from ..core.chromosome import Chromosome
    rows = db.get_rows(
        "SELECT re.region, re.repeat_unit, re.name, reg.allele1, reg.allele2 "
        "FROM repeat_expansion_genotype reg, repeat_expansion re "
        "WHERE re.id=reg.repeat_expansion_id AND reg.id=?", params=(reg_id,))
    if not rows:
        raise NgsdError(f"Repeat expansion with identifier '{reg_id}' does not exist!")
    region, unit, name, allele1, allele2 = rows[0]
    rl = RepeatLocus()
    region = region.replace(",", "")
    chrom, rest = region.split(":")
    s, e = rest.split("-")
    rl.chr = Chromosome(chrom)
    rl.start = int(s)
    rl.end = int(e)
    rl.unit = (unit or "").encode()
    rl.name = (name or "").encode()
    if allele1 is not None:
        rl.allele1 = _num_str(allele1).encode()
    if allele2 is not None:
        rl.allele2 = _num_str(allele2).encode()
    return rl


def _num_str(v) -> str:
    try:
        f = float(v)
        if f == int(f):
            return str(int(f))
        return f"{f:g}"
    except (TypeError, ValueError):
        return str(v)


def repeat_expansion_genotype_id(db: NGSD, repeat_expansion_id: int, ps_id: int,
                                 throw_if_fails: bool = True) -> int:
    v = db.get_value("SELECT id FROM repeat_expansion_genotype WHERE repeat_expansion_id=? "
                     "AND processed_sample_id=?", params=(repeat_expansion_id, ps_id))
    if v is None:
        if throw_if_fails:
            raise NgsdError(f"No repeat expansion genotype data found for repeat expansion "
                            f"'{repeat_expansion_id}' and processed sample '{ps_id}'")
        return -1
    return int(v)


def cnv_id(db: NGSD, cnv, callset_id: int, throw_if_fails: bool = True) -> str:
    v = db.get_value("SELECT id FROM cnv WHERE cnv_callset_id=? AND chr=? AND start=? AND end=?",
                     params=(callset_id, cnv.chr.str_normalized(True), cnv.start, cnv.end))
    if v is None:
        if throw_if_fails:
            raise NgsdError(f"CNV {cnv.to_string()} if callset with id '{callset_id}' not found in NGSD!")
        return ""
    return str(v)


def sv_id(db: NGSD, sv, callset_id: int, svs, throw_if_fails: bool = True) -> str:
    """NGSD::svId."""
    sv_type = sv.type.decode()
    if sv_type in ("DEL", "DUP", "INV"):
        table = {"DEL": "sv_deletion", "DUP": "sv_duplication", "INV": "sv_inversion"}[sv_type]
        v = db.get_value(f"SELECT id FROM `{table}` WHERE sv_callset_id=? AND chr=? "
                         "AND start_min=? AND start_max=? AND end_min=? AND end_max=?",
                         params=(callset_id, sv.chr1.str_normalized(True),
                                 sv.start1, sv.end1, sv.start2, sv.end2))
    elif sv_type == "INS":
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
        filters = []
        filters.append("AND `inserted_sequence` IS NULL" if inserted_sequence == ""
                       else f"AND `inserted_sequence`='{inserted_sequence}'")
        filters.append("AND `known_left` IS NULL" if known_left == ""
                       else f"AND `known_left`='{known_left}'")
        filters.append("AND `known_right` IS NULL" if known_right == ""
                       else f"AND `known_right`='{known_right}'")
        v = db.get_value(f"SELECT id FROM `sv_insertion` WHERE sv_callset_id={callset_id} "
                         f"AND chr='{sv.chr1.str_normalized(True)}' "
                         f"AND (`pos` - `ci_lower`)={pos} AND `ci_upper`={ci_upper} " + " ".join(filters))
    elif sv_type == "BND":
        v = db.get_value("SELECT id FROM `sv_translocation` WHERE sv_callset_id=? AND chr1=? "
                         "AND start1=? AND end1=? AND chr2=? AND start2=? AND end2=?",
                         params=(callset_id, sv.chr1.str_normalized(True), sv.start1, sv.end1,
                                 sv.chr2.str_normalized(True), sv.start2, sv.end2))
    else:
        raise NgsdError("Invalid structural variant type!")
    if v is None:
        if throw_if_fails:
            raise NgsdError("SV not found in NGSD!")
        return ""
    return str(v)


def load_report_config(db: NGSD, conf_id: int) -> dict:
    """NGSD::reportConfig — meta data + per-type raw rows (dicts)."""
    meta_rows = _rows_as_dicts(db, "SELECT (SELECT user_id FROM user WHERE id=created_by) as created_by, "
                                   "created_date, (SELECT user_id FROM user WHERE id=last_edit_by) as last_edit_by, "
                                   "last_edit_date, (SELECT user_id FROM user WHERE id=finalized_by) as finalized_by, "
                                   "finalized_date FROM report_configuration WHERE id=?", (conf_id,))
    out = {"meta": meta_rows[0] if meta_rows else {}}
    out["variants"] = _rows_as_dicts(db, "SELECT * FROM report_configuration_variant WHERE report_configuration_id=? ORDER BY id", (conf_id,))
    out["cnvs"] = _rows_as_dicts(db, "SELECT * FROM report_configuration_cnv WHERE report_configuration_id=? ORDER BY id", (conf_id,))
    out["svs"] = _rows_as_dicts(db, "SELECT * FROM report_configuration_sv WHERE report_configuration_id=? ORDER BY id", (conf_id,))
    out["res"] = _rows_as_dicts(db, "SELECT * FROM report_configuration_re WHERE report_configuration_id=? ORDER BY id", (conf_id,))
    return out


def report_variant_to_text(db: NGSD, rvc_id: int, variant_type: str, variant_text: str,
                           source_ps_name: str) -> str:
    """NGSDTransferReportConfig reportVariant2Text."""
    table = {"SNVS_INDELS": "report_configuration_variant", "CNVS": "report_configuration_cnv",
             "SVS": "report_configuration_sv", "RES": "report_configuration_re"}[variant_type]
    type_str = {"SNVS_INDELS": "small variant", "CNVS": "CNV", "SVS": "SV", "RES": "RE"}[variant_type]
    rows = _rows_as_dicts(db, f"SELECT * FROM {table} WHERE id=?", (rvc_id,))
    if not rows:
        raise NgsdError(f"No ReportConfigurationVariant with id={rvc_id} found!")
    info = [f"SourceSample:{source_ps_name}", f"Variant:{variant_text}", f"VariantType:{type_str}"]
    for column, value in rows[0].items():
        if column.startswith("exclude_"):
            continue
        value_str = str(value) if value is not None else ""
        value_str = (value_str.replace("\t", " ").replace("\n", "<BR>")
                     .replace("\r", "").replace("\v", "").replace("\f", ""))
        if not value_str:
            continue
        info.append(f"{column}:{value_str}")
    return "\t".join(info)
