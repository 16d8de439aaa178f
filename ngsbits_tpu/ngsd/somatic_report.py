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
        self.target_region_name = ""
        self.target_region_genes = []      # GeneSet-like list of symbols
        self.relevant_transcripts = {}     # {gene bytes: {transcript-name bytes}}
        self.sbs_signature = ""
        self.dbs_signature = ""
        self.id_signature = ""
        self.cnv_signature = ""
        self.obo_terms_coding_splicing = None
        self.icd10 = ""
        self.phenotype = ""
        self.igv_snapshot_png_hex_image = b""
        self.igv_snapshot_width = 0
        self.igv_snapshot_height = 0

    @property
    def target_region_filter(self):
        """TargetRegionInfo analogue as a dict; None when not set."""
        if self.target_region_regions is None and not self.target_region_name:
            return None
        return {"name": self.target_region_name,
                "regions": self.target_region_regions,
                "genes": self.target_region_genes}

    def msi_value(self, db: NGSD) -> float:
        """SomaticReportSettings::get_msi_value (SomaticReportSettings.cpp:10-23)."""
        qc = db.get_qc_collection(db.processed_sample_id(self.tumor_ps))
        if qc.contains("QC:2000141", True):
            return qc.value("QC:2000141", True).as_double()
        return float("nan")


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
    elif meta.get("filter_base_name"):
        # NGSD.cpp somaticReportConfig: filters empty -> load the named cascade
        # from GSvar_filters.ini next to the application (shipped as resource)
        from ..core.resources import RESOURCE_DIR
        output.filters = FilterCascade.load_from_file(
            str(RESOURCE_DIR / "GSvar_filters.ini.gz"), str(meta["filter_base_name"]))

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
            if filter_res.flags[i] and len(idx.matching_indices(v.chr, v.start, v.end)) == 0:
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


def filter_germline_variants(germl_snvs, sett: SomaticReportSettings):
    """SomaticReportSettings::filterGermlineVariants (SomaticReportSettings.cpp:73-95)."""
    import copy

    rc = sett.report_config
    by_index = {c["variant_index"]: c for c in rc.germline_configs}

    result = copy.copy(germl_snvs)
    result.variants = []
    result.columns = germl_snvs.columns + ["freq_in_tum", "depth_in_tum"]
    result.descriptions = list(germl_snvs.descriptions)
    result.add_description("freq_in_tum", "Frequency of variant which was found in normal "
                           "tissue within the tumor sample.")
    result.add_description("depth_in_tum", "Depth of variant which was found in normal "
                           "tissue within the tumor sample.")
    for i, v in enumerate(germl_snvs.variants):
        if i not in by_index:
            continue
        new_v = copy.copy(v)
        new_v.annotations = list(v.annotations)
        new_v.annotations.append(_qbytearray_number(by_index[i]["tum_freq"]))
        new_v.annotations.append(_qbytearray_number(by_index[i]["tum_depth"]))
        result.variants.append(new_v)
    return result


def _qbytearray_number(v) -> bytes:
    """QByteArray::number(double) — 'g' format with 6 significant digits."""
    if v is None:
        return b"0"
    s = f"{float(v):.6g}"
    return s.encode()


def set_somatic_report_config(db: NGSD, t_ps_id, n_ps_id, config: SomaticReportConfiguration,
                              snvs, cnvs, svs, germl_snvs, user_name: str) -> int:
    """NGSD::setSomaticReportConfig (NGSD.cpp:9335-9657)."""
    import os

    config_id = db.somatic_report_config_id(t_ps_id, n_ps_id)
    target_file = ""
    if config.meta.get("target_region_name"):
        target_file = os.path.basename(config.meta["target_region_name"])

    m = config.meta
    hrd = m.get("hrd_statement") or ""
    if hrd not in (db.get_enum("somatic_report_configuration", "hrd_statement") or []):
        hrd = None
    quality = ",".join(m["quality"]) if m.get("quality") else None
    cin = ",".join(m["cin_chr"]) if m.get("cin_chr") else None
    filters_text = ("\n".join(config.filters.to_text())
                    if len(config.filters.filters) > 0 else None)
    common = (int(bool(m.get("tum_content_max_af"))), int(bool(m.get("tum_content_max_clonality"))),
              int(bool(m.get("tum_content_hist"))), int(bool(m.get("msi_status"))),
              int(bool(m.get("cnv_burden"))), hrd,
              int(m.get("cnv_loh_count") or 0), int(m.get("cnv_tai_count") or 0),
              int(m.get("cnv_lst_count") or 0), m.get("tmb_ref_text") or "",
              quality, int(bool(m.get("fusions_detected"))), cin,
              m.get("limitations") or None, m.get("filter_base_name") or None,
              int(bool(m.get("tum_content_estimated"))),
              int(m.get("tum_content_estimated_value") or 0) if m.get("tum_content_estimated") else None,
              int(bool(m.get("include_mutation_burden"))), filters_text)

    if config_id != -1:
        for table in ("somatic_report_configuration_variant", "somatic_report_configuration_cnv",
                      "somatic_report_configuration_germl_var", "somatic_report_configuration_sv"):
            db.execute(f"DELETE FROM `{table}` WHERE somatic_report_configuration_id={config_id}")
        db.execute(
            "UPDATE somatic_report_configuration SET last_edit_by=?, "
            "last_edit_date=CURRENT_TIMESTAMP, target_file=?, tum_content_max_af=?, "
            "tum_content_max_clonality=?, tum_content_hist=?, msi_status=?, cnv_burden=?, "
            "hrd_statement=?, cnv_loh_count=?, cnv_tai_count=?, cnv_lst_count=?, "
            "tmb_ref_text=?, quality=?, fusions_detected=?, cin_chr=?, limitations=?, "
            "filter_base_name=?, tum_content_estimated=?, tum_content_estimated_value=?, "
            "include_mutation_burden=?, filters=? WHERE id=?",
            (db.user_id(user_name), target_file or None) + common + (config_id,))
    else:
        db.execute(
            "INSERT INTO somatic_report_configuration (ps_tumor_id, ps_normal_id, created_by, "
            "created_date, last_edit_by, last_edit_date, target_file, tum_content_max_af, "
            "tum_content_max_clonality, tum_content_hist, msi_status, cnv_burden, hrd_statement, "
            "cnv_loh_count, cnv_tai_count, cnv_lst_count, tmb_ref_text, quality, fusions_detected, "
            "cin_chr, limitations, filter_base_name, tum_content_estimated, "
            "tum_content_estimated_value, include_mutation_burden, filters) VALUES "
            "(?,?,?,?,?,CURRENT_TIMESTAMP,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?)",
            (t_ps_id, n_ps_id, db.user_id(m.get("created_by") or user_name),
             # created_at_ defaults to now (SomaticReportConfiguration.cpp:82)
             m.get("created_date") or __import__("datetime").datetime.now()
             .strftime("%Y-%m-%d %H:%M:%S"),
             db.user_id(user_name), target_file or None) + common)
        config_id = db.last_insert_id()

    for conf in config.variant_configs:
        vtype = conf["variant_type"]
        if vtype == "SNVS_INDELS":
            idx = conf["variant_index"]
            if idx < 0 or idx >= len(snvs.variants):
                raise NgsdError(f"Variant list does not contain variant with index '{idx}' "
                                "in NGSD::setSomaticReportConfig!")
            variant = snvs.variants[idx]
            variant_id = db.variant_id(variant, throw_if_fails=False)
            if variant_id == "":
                variant_id = db.add_variant(variant, snvs)
            db.execute(
                "INSERT INTO somatic_report_configuration_variant "
                "(somatic_report_configuration_id, variant_id, exclude_artefact, "
                "exclude_low_tumor_content, exclude_low_copy_number, exclude_high_baf_deviation, "
                "exclude_other_reason, include_variant_alteration, include_variant_description, "
                "comment) VALUES (?,?,?,?,?,?,?,?,?,?)",
                (config_id, variant_id, int(bool(conf.get("exclude_artefact"))),
                 int(bool(conf.get("exclude_low_tumor_content"))),
                 int(bool(conf.get("exclude_low_copy_number"))),
                 int(bool(conf.get("exclude_high_baf_deviation"))),
                 int(bool(conf.get("exclude_other_reason"))),
                 (conf.get("include_variant_alteration") or "").strip() and conf["include_variant_alteration"] or "",
                 (conf.get("include_variant_description") or "").strip() and conf["include_variant_description"] or "",
                 (conf.get("comment") or "").strip() and conf["comment"] or ""))
        elif vtype == "CNVS":
            idx = conf["variant_index"]
            if idx < 0 or idx > len(cnvs):
                raise NgsdError(f"Somatic CNV list does not contain CNV with index '{idx}' "
                                "in NGSD::setSomaticReportConfig!")
            callset_id = db.get_value("SELECT id FROM somatic_cnv_callset WHERE ps_tumor_id=? "
                                      "AND ps_normal_id=?", params=(t_ps_id, n_ps_id))
            if callset_id is None:
                raise NgsdError("No somatic CNV callset defined for tumor-normal processed "
                                f"sample ids {t_ps_id}-{n_ps_id}in NGSD::setSomaticReportConfig!")
            cnv = cnvs[idx]
            cnv_id = db.somatic_cnv_id(cnv, int(callset_id), throw_if_fails=False)
            if cnv_id == "":
                cnv_id = db.add_somatic_cnv(int(callset_id), cnv, cnvs)
            db.execute(
                "INSERT INTO somatic_report_configuration_cnv "
                "(somatic_report_configuration_id, somatic_cnv_id, exclude_artefact, "
                "exclude_low_tumor_content, exclude_low_copy_number, exclude_high_baf_deviation, "
                "exclude_other_reason, comment) VALUES (?,?,?,?,?,?,?,?)",
                (config_id, cnv_id, int(bool(conf.get("exclude_artefact"))),
                 int(bool(conf.get("exclude_low_tumor_content"))),
                 int(bool(conf.get("exclude_low_copy_number"))),
                 int(bool(conf.get("exclude_high_baf_deviation"))),
                 int(bool(conf.get("exclude_other_reason"))), conf.get("comment") or ""))
        elif vtype == "SVS":
            idx = conf["variant_index"]
            if idx < 0 or idx >= len(svs.lines):
                raise NgsdError(f"SV list does not contain SV with index '{idx}' "
                                "in NGSD::setSomaticReportConfig!")
            callset_id = db.get_value("SELECT id FROM somatic_sv_callset WHERE ps_tumor_id=? "
                                      "AND ps_normal_id=?", params=(t_ps_id, n_ps_id))
            if callset_id is None:
                raise NgsdError("No SV callset defined for tumor-normal processed sample ids  "
                                f"{t_ps_id}-{n_ps_id}in NGSD::setSomaticReportConfig!")
            sv = svs.lines[idx]
            sv_id = db.somatic_sv_id(sv, int(callset_id), svs, throw_if_fails=False)
            if sv_id == "":
                sv_id = db.add_somatic_sv(int(callset_id), sv, svs)
            type_col = {"DEL": "somatic_sv_deletion_id", "DUP": "somatic_sv_duplication_id",
                        "INS": "somatic_sv_insertion_id", "INV": "somatic_sv_inversion_id",
                        "BND": "somatic_sv_translocation_id"}[
                sv.type.decode() if isinstance(sv.type, bytes) else str(sv.type)]
            cols = {"somatic_sv_deletion_id": None, "somatic_sv_duplication_id": None,
                    "somatic_sv_insertion_id": None, "somatic_sv_inversion_id": None,
                    "somatic_sv_translocation_id": None}
            cols[type_col] = sv_id
            db.execute(
                "INSERT INTO somatic_report_configuration_sv "
                "(somatic_report_configuration_id, somatic_sv_deletion_id, "
                "somatic_sv_duplication_id, somatic_sv_insertion_id, somatic_sv_inversion_id, "
                "somatic_sv_translocation_id, exclude_artefact, exclude_unclear_effect, "
                "exclude_other, description, comment, rna_info, manual_start, manual_end, "
                "manual_hgvs_type, manual_hgvs_suffix, manual_start_bnd, manual_end_bnd, "
                "manual_hgvs_type_bnd, manual_hgvs_suffix_bnd) "
                "VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?)",
                (config_id, cols["somatic_sv_deletion_id"], cols["somatic_sv_duplication_id"],
                 cols["somatic_sv_insertion_id"], cols["somatic_sv_inversion_id"],
                 cols["somatic_sv_translocation_id"], int(bool(conf.get("exclude_artefact"))),
                 int(bool(conf.get("exclude_unclear_effect"))),
                 int(bool(conf.get("exclude_other_reason"))), conf.get("description") or "",
                 conf.get("comment") or "", conf.get("rna_info") or "n/a",
                 conf.get("manual_sv_start"), conf.get("manual_sv_end"),
                 conf.get("manual_sv_hgvs_type") or "", conf.get("manual_sv_hgvs_suffix") or "",
                 conf.get("manual_sv_start_bnd"), conf.get("manual_sv_end_bnd"),
                 conf.get("manual_sv_hgvs_type_bnd") or "",
                 conf.get("manual_sv_hgvs_suffix_bnd") or ""))
        else:
            raise NgsdError("Storing of somatic report configuration variant with type "
                            f"'{vtype}' not implemented!")

    for conf in config.germline_configs:
        idx = conf["variant_index"]
        if idx < 0 or idx >= len(germl_snvs.variants):
            raise NgsdError(f"Variant list does not contain variant with index '{idx}' "
                            "in NGSD::setSomaticReportConfig!")
        variant = germl_snvs.variants[idx]
        variant_id = db.variant_id(variant, throw_if_fails=False)
        if variant_id == "":
            variant_id = db.add_variant(variant, germl_snvs)
        db.execute(
            "INSERT INTO somatic_report_configuration_germl_var "
            "(somatic_report_configuration_id, variant_id, tum_freq, tum_depth) "
            "VALUES (?,?,?,?)",
            (config_id, variant_id, conf.get("tum_freq"), conf.get("tum_depth")))

    db.commit()
    return config_id


def filter_svs(db: NGSD, svs, sett: SomaticReportSettings):
    """SomaticReportSettings::filterSvs (SomaticReportSettings.cpp:117-147)."""
    import copy

    from ..core.geneset import GeneSet

    result = copy.copy(svs)
    result.annotation_headers = list(svs.annotation_headers) + [
        b"DESCRIPTION", b"GENES_BREAKPOINT_A", b"GENES_BREAKPOINT_B",
        b"START_POS_REPORT", b"END_POS_REPORT"]
    result.lines = []

    rc = sett.report_config
    sv_indices = {c["variant_index"] for c in rc.variant_configs
                  if c["variant_type"] == "SVS" and show_in_report(c)}
    if not sv_indices:
        return result
    for idx in sv_indices:
        sv = copy.copy(svs.lines[idx])
        sv.annotations = list(sv.annotations)
        genes_a, genes_b = GeneSet(), GeneSet()
        for g in db.genes_overlapping(sv.chr1, sv.start1, sv.end1, 5000):
            genes_a.insert(g)
        for g in db.genes_overlapping(sv.chr2, sv.start2, sv.end2, 5000):
            genes_b.insert(g)
        conf = rc.variant_config(idx, "SVS")
        sv.annotations.append((conf.get("description") or "").encode())
        sv.annotations.append(genes_a.join(", ").encode())
        sv.annotations.append(genes_b.join(", ").encode())
        manual_start = conf.get("manual_start")
        manual_end = conf.get("manual_end")
        sv.annotations.append(
            (sv.chr1.str_normalized(True) + ": "
             + (str(manual_start) if manual_start not in (None, "") else str(sv.start1))).encode())
        sv.annotations.append(
            (sv.chr2.str_normalized(True) + ": "
             + (str(manual_end) if manual_end not in (None, "") else str(sv.start2))).encode())
        result.lines.append(sv)
    result.sort()
    return result


def delete_somatic_report_config(db: NGSD, config_id: int):
    """NGSD::deleteSomaticReportConfig (NGSD.cpp:9659-9677)."""
    exists = db.get_value("SELECT id FROM somatic_report_configuration WHERE id=?",
                          params=(config_id,))
    if exists is None:
        raise NgsdError(f"Cannot delete somatic report configuration with id={config_id} "
                        "because it does not exist!")
    for table in ("somatic_report_configuration_cnv", "somatic_report_configuration_variant",
                  "somatic_report_configuration_germl_var", "somatic_report_configuration_sv"):
        db.execute(f"DELETE FROM `{table}` WHERE somatic_report_configuration_id=?", (config_id,))
    db.execute("DELETE FROM somatic_report_configuration WHERE id=?", (config_id,))
    db.commit()


def somatic_report_config_data(db: NGSD, config_id: int) -> dict:
    """NGSD::somaticReportConfigData (NGSD.cpp:9304-9326)."""
    def _qt_datetime(v) -> str:
        # QDateTime::toString("dd.MM.yyyy hh:mm:ss") of a SQL datetime value
        s = str(v)[:19]
        if len(s) < 19:
            return ""
        return f"{s[8:10]}.{s[5:7]}.{s[0:4]} {s[11:19]}"

    row = db.get_rows(
        "SELECT created_by, created_date, "
        "(SELECT name FROM user WHERE id=last_edit_by) as last_edit_by, last_edit_date, "
        "mtb_xml_upload_date, target_file FROM somatic_report_configuration WHERE id=?",
        params=(config_id,))[0]
    created_by, created_date, last_edit_by, last_edit_date, mtb_date, target_file = row
    return {
        "created_by": db.get_value("SELECT name FROM user WHERE id=?", params=(created_by,)) or "",
        "created_date": _qt_datetime(created_date) if created_date else "",
        "last_edit_by": last_edit_by or "",
        "last_edit_date": _qt_datetime(last_edit_date) if last_edit_date else "",
        "mtb_xml_upload_date": _qt_datetime(mtb_date) if mtb_date else "",
        "target_file": target_file or "",
    }


def set_somatic_mtb_xml_upload(db: NGSD, config_id: int):
    """NGSD::setSomaticMtbXmlUpload (NGSD.cpp:9909-9915)."""
    db.execute("UPDATE somatic_report_configuration SET mtb_xml_upload_date=CURRENT_TIMESTAMP "
               "WHERE id=?", (config_id,))
    db.commit()


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
