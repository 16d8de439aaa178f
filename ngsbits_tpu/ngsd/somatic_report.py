"""Somatic report configuration layer.

Behavioral reference: ngs-bits cppNGSD/SomaticReportConfiguration.{h,cpp},
cppNGSD/SomaticReportSettings.{h,cpp} and NGSD::somaticReportConfig
(cppNGSD/NGSD.cpp:9678-9905), NGSD::somaticCnv (:2021-2028) and
NGSD::somaticSv (:3158-3280).
"""

from __future__ import annotations

from ..filters.cascade import FilterCascade
from .db import NGSD, NgsdError

SOMATIC_EXCLUDE_FLAGS = ["exclude_artefact", "exclude_low_tumor_content",
                         "exclude_low_copy_number", "exclude_high_baf_deviation",
                         "exclude_other_reason", "exclude_unclear_effect"]


def show_in_report(conf: dict) -> bool:
    """SomaticReportVariantConfiguration::showInReport (SomaticReportConfiguration.cpp:36-39)."""
    return not any(conf.get(flag) for flag in SOMATIC_EXCLUDE_FLAGS)


class SomaticReportConfiguration:
    """Loaded somatic report configuration (variant configs as dicts)."""

    def __init__(self):
        self.meta: dict = {}
        self.filters = FilterCascade()
        self.variant_configs: list[dict] = []
        self.germline_configs: list[dict] = []

    def variant_indices(self, variant_type: str, only_selected: bool) -> list[int]:
        """SomaticReportConfiguration::variantIndices (:133-147)."""
        out = []
        for conf in self.variant_configs:
            if conf["variant_type"] != variant_type:
                continue
            if only_selected and not show_in_report(conf):
                continue
            out.append(conf["variant_index"])
        return sorted(out)

    def variant_config(self, index: int, variant_type: str) -> dict:
        for conf in self.variant_configs:
            if conf["variant_index"] == index and conf["variant_type"] == variant_type:
                return conf
        raise NgsdError(f"Could not find somatic variant configuration for index {index}.")

    def add_variant_configuration(self, conf: dict):
        """SomaticReportConfiguration::addSomaticVariantConfiguration (:175-197)."""
        if conf["variant_type"] == "SNVS_INDELS" and (
                conf.get("include_variant_alteration") or conf.get("include_variant_description")
        ) and not show_in_report(conf):
            raise NgsdError("Cannot set somatic report configuration. Variant Configuration for "
                            f"variant index {conf['variant_index']} contains both include and "
                            "exclude switches.")
        for i, existing in enumerate(self.variant_configs):
            if (existing["variant_index"] == conf["variant_index"]
                    and existing["variant_type"] == conf["variant_type"]):
                self.variant_configs[i] = conf
                return
        self.variant_configs.append(conf)


class SomaticReportSettings:
    """cppNGSD/SomaticReportSettings.h (data holder)."""

    def __init__(self):
        self.tumor_ps = ""
        self.normal_ps = ""
        self.msi_file = ""
        self.viral_file = ""
        self.report_config: SomaticReportConfiguration | None = None
        self.target_region_regions = None  # BedFile or None


def _row_dicts(db: NGSD, query: str, params=()):
    cur = db.execute(query, params)
    cols = [d[0] for d in cur.description]
    return [dict(zip(cols, row)) for row in cur.fetchall()]


def somatic_cnv(db: NGSD, cnv_id: int):
    """NGSD::somaticCnv (NGSD.cpp:2021-2028) — (chr, start, end)."""
    rows = db.get_rows("SELECT chr, start, end FROM somatic_cnv WHERE id=?", params=(cnv_id,))
    if not rows:
        raise NgsdError(f"Somatic CNV with identifier '{cnv_id}' does not exist!")
    return rows[0]


def somatic_sv(db: NGSD, sv_id, sv_type: str, svs):
    """NGSD::somaticSv (NGSD.cpp:3158-3280) — coordinates only (no_annotation).

    Returns a BedpeLine-like shim with chr1/start1/end1/chr2/start2/end2/type.
    """
    from ..core.chromosome import Chromosome
    from ..io.bedpe import BedpeLine
    table = {"DEL": "somatic_sv_deletion", "DUP": "somatic_sv_duplication",
             "INV": "somatic_sv_inversion", "INS": "somatic_sv_insertion",
             "BND": "somatic_sv_translocation"}[sv_type]
    n_anno = len(svs.annotation_headers)
    annotations = [b""] * n_anno
    if sv_type in ("DEL", "DUP", "INV"):
        rows = db.get_rows(f"SELECT chr, start_min, start_max, end_min, end_max FROM `{table}` "
                           "WHERE id=?", params=(sv_id,))
        if not rows:
            raise NgsdError(f"SV with id '{sv_id}' not found in table '{table}'!")
        chrom, start_min, start_max, end_min, end_max = rows[0]
        return BedpeLine(Chromosome(chrom), int(start_min), int(start_max),
                         Chromosome(chrom), int(end_min), int(end_max),
                         sv_type.encode(), annotations)
    if sv_type == "INS":
        rows = db.get_rows(f"SELECT chr, pos, ci_upper FROM `{table}` WHERE id=?", params=(sv_id,))
        if not rows:
            raise NgsdError(f"SV with id '{sv_id}' not found in table '{table}'!")
        chrom, pos, ci_upper = rows[0]
        return BedpeLine(Chromosome(chrom), int(pos), int(pos) + int(ci_upper or 0),
                         Chromosome(chrom), int(pos), int(pos) + int(ci_upper or 0),
                         b"INS", annotations)
    rows = db.get_rows(f"SELECT chr1, start1, end1, chr2, start2, end2 FROM `{table}` "
                       "WHERE id=?", params=(sv_id,))
    if not rows:
        raise NgsdError(f"SV with id '{sv_id}' not found in table '{table}'!")
    chr1, start1, end1, chr2, start2, end2 = rows[0]
    return BedpeLine(Chromosome(chr1), int(start1), int(end1),
                     Chromosome(chr2), int(start2), int(end2), b"BND", annotations)


def somatic_report_config(db: NGSD, t_ps_id, n_ps_id, snvs, cnvs, svs, germline_snvs,
                          messages: list[str]) -> SomaticReportConfiguration:
    """NGSD::somaticReportConfig (NGSD.cpp:9678-9905)."""
    config_id = db.somatic_report_config_id(t_ps_id, n_ps_id)
    if config_id == -1:
        raise NgsdError(f"Somatic report for the processed samples with the database ids {t_ps_id} "
                        f"(tumor) and {n_ps_id} (normal) does not exist!")

    output = SomaticReportConfiguration()
    meta = _row_dicts(db, "SELECT u.name, r.* FROM somatic_report_configuration r, user u "
                          "WHERE r.id=? AND u.id=r.created_by", (config_id,))[0]
    output.meta = meta
    if meta.get("filters"):
        output.filters = FilterCascade.from_text(str(meta["filters"]).split("\n"))

    # SNVs
    for row in _row_dicts(db, "SELECT * FROM somatic_report_configuration_variant "
                              "WHERE somatic_report_configuration_id=?", (config_id,)):
        conf = dict(row)
        conf["variant_type"] = "SNVS_INDELS"
        conf["variant_index"] = -1
        chrom, start, end, ref, obs = db.get_rows(
            "SELECT chr, start, end, ref, obs FROM variant WHERE id=?",
            params=(row["variant_id"],))[0]
        for i, v in enumerate(snvs.variants):
            if (v.chr.str_normalized(True) == chrom and v.start == int(start)
                    and v.end == int(end) and v.ref.decode() == ref and v.obs.decode() == obs):
                conf["variant_index"] = i
        if conf["variant_index"] == -1:
            messages.append(f"Could not find somatic variant '{chrom}:{start}-{end} {ref}>{obs}' "
                            "in given variant list. The report configuration of this variant will "
                            "be lost if you change anything in the report configuration!")
        conf["include_variant_alteration"] = row.get("include_variant_alteration") or ""
        conf["include_variant_description"] = row.get("include_variant_description") or ""
        output.add_variant_configuration(conf)

    # CNVs
    for row in _row_dicts(db, "SELECT * FROM somatic_report_configuration_cnv "
                              "WHERE somatic_report_configuration_id=?", (config_id,)):
        conf = dict(row)
        conf["variant_type"] = "CNVS"
        conf["variant_index"] = -1
        chrom, start, end = somatic_cnv(db, row["somatic_cnv_id"])
        for i in range(len(cnvs)):
            c = cnvs[i]
            if (c.chr.str_normalized(True) == str(chrom) and c.start == int(start)
                    and c.end == int(end)):
                conf["variant_index"] = i
        if conf["variant_index"] == -1:
            messages.append(f"Could not find somatic CNV '{chrom}:{start}-{end}' in given variant "
                            "list. The report configuration of this variant will be lost if you "
                            "change anything in the report configuration!")
            continue
        output.add_variant_configuration(conf)

    # SVs
    for row in _row_dicts(db, "SELECT * FROM somatic_report_configuration_sv "
                              "WHERE somatic_report_configuration_id=?", (config_id,)):
        conf = dict(row)
        conf["variant_type"] = "SVS"
        sv_type = None
        sv_id = None
        for column, t in (("somatic_sv_deletion_id", "DEL"), ("somatic_sv_duplication_id", "DUP"),
                          ("somatic_sv_insertion_id", "INS"), ("somatic_sv_inversion_id", "INV"),
                          ("somatic_sv_translocation_id", "BND")):
            if row.get(column) is not None:
                sv_type = t
                sv_id = row[column]
                break
        if sv_type is None:
            raise NgsdError("Somatic report config entry does not contain a SV id!")
        sv = somatic_sv(db, sv_id, sv_type, svs)
        from ..tools.bedpe_counts import _find_match
        conf["variant_index"] = _find_match(svs, sv, deep_ins_compare=True, compare_ci=False)
        if conf["variant_index"] == -1:
            continue  # skip SVs that are not found
        conf["exclude_other_reason"] = row.get("exclude_other")
        output.add_variant_configuration(conf)

    # germline SNVs related to tumor
    for row in _row_dicts(db, "SELECT * FROM somatic_report_configuration_germl_var "
                              "WHERE somatic_report_configuration_id=?", (config_id,)):
        conf = dict(row)
        conf["variant_index"] = -1
        chrom, start, end, ref, obs = db.get_rows(
            "SELECT chr, start, end, ref, obs FROM variant WHERE id=?",
            params=(row["variant_id"],))[0]
        for i, v in enumerate(germline_snvs.variants):
            if (v.chr.str_normalized(True) == chrom and v.start == int(start)
                    and v.end == int(end) and v.ref.decode() == ref and v.obs.decode() == obs):
                conf["variant_index"] = i
        if conf["variant_index"] == -1:
            messages.append(f"Could not find germline variant '{chrom}:{start}-{end} {ref}>{obs}' "
                            "in given variant list. The report configuration of this variant will "
                            "be lost if you change anything in the report configuration!")
        output.germline_configs.append(conf)

    return output


def filter_variants(snvs, sett: SomaticReportSettings, throw_errors: bool = False):
    """SomaticReportSettings::filterVariants (SomaticReportSettings.cpp:25-72).

    Returns a new GSvarFile with two extra annotation columns
    (alt_var_alteration, alt_var_description).
    """
    import copy

    rc = sett.report_config
    variant_indices = set(rc.variant_indices("SNVS_INDELS", False))

    filter_res = rc.filters.apply(snvs, "snv", throw_errors=throw_errors)

    if sett.target_region_regions is not None and len(sett.target_region_regions) > 0:
        from ..core.intervals import ChromosomalIndex
        idx = ChromosomalIndex(sett.target_region_regions)
        for i, v in enumerate(snvs.variants):
            if filter_res.flags[i] and not idx.matching_indices(v.chr, v.start, v.end):
                filter_res.flags[i] = False

    for index in variant_indices:
        filter_res.flags[index] = show_in_report(rc.variant_config(index, "SNVS_INDELS"))

    result = copy.copy(snvs)
    result.variants = []
    result.columns = snvs.columns + ["alt_var_alteration", "alt_var_description"]
    result.descriptions = list(snvs.descriptions)
    result.add_description("alt_var_alteration", "If an alternative text for protein change is "
                           "specified in report config, this is stored here.")
    result.add_description("alt_var_description", "Alternate description text for variant alteration")

    for i, v in enumerate(snvs.variants):
        if not filter_res.flags[i]:
            continue
        new_v = copy.copy(v)
        new_v.annotations = list(v.annotations)
        if i in variant_indices and show_in_report(rc.variant_config(i, "SNVS_INDELS")):
            conf = rc.variant_config(i, "SNVS_INDELS")
            new_v.annotations.append(conf["include_variant_alteration"].encode())
            new_v.annotations.append(conf["include_variant_description"].encode())
        else:
            new_v.annotations.extend([b"", b""])
        result.variants.append(new_v)
    return result


def filter_cnvs(cnvs, sett: SomaticReportSettings):
    """SomaticReportSettings::filterCnvs (SomaticReportSettings.cpp:97-115)."""
    import copy

    rc = sett.report_config
    flags = [True] * len(cnvs)
    for index in rc.variant_indices("CNVS", False):
        flags[index] = show_in_report(rc.variant_config(index, "CNVS"))

    result = copy.copy(cnvs)
    result.variants = [c for i, c in enumerate(cnvs.variants) if flags[i]]
    return result
