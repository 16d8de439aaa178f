"""Somatic VICC interpretation scoring.

Behavioral reference: ngs-bits cppNGS/SomaticVariantInterpreter.{h,cpp}
(SomaticViccData evidence counts + viccOncogenicRule/viccBenignRule) and
NGSD::getSomaticViccData (cppNGSD/NGSD.cpp).

States are tri-valued: True / False / None (NOT_APPLICABLE).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

# evidence keys in the order of the somatic_vicc_interpretation table
VICC_KEYS = [
    "null_mutation_in_tsg",
    "known_oncogenic_aa",
    "strong_cancerhotspot",
    "oncogenic_functional_studies",
    "located_in_canerhotspot",
    "absent_from_controls",
    "protein_length_change",
    "other_aa_known_oncogenic",
    "weak_cancerhotspot",
    "computational_evidence",
    "mutation_in_gene_with_etiology",
    "very_weak_cancerhotspot",
    "very_high_maf",
    "benign_functional_studies",
    "high_maf",
    "benign_computational_evidence",
    "synonymous_mutation",
]


def _state_str(v) -> str:
    if v is None:
        return "NOT_APPLICABLE"
    return "TRUE" if v else "FALSE"


@dataclass
class SomaticViccData:
    states: dict = field(default_factory=dict)  # key -> True/False/None
    comment: str = ""
    created_by: str = ""
    created_at: str = ""
    last_updated_by: str = ""
    last_updated_at: str = ""

    def _true(self, *keys) -> int:
        return sum(1 for k in keys if self.states.get(k) is True)

    def strong_evidence_count(self) -> int:
        return self._true("known_oncogenic_aa", "oncogenic_functional_studies", "strong_cancerhotspot")

    def moderate_evidence_count(self) -> int:
        return self._true("located_in_canerhotspot", "absent_from_controls", "protein_length_change",
                          "other_aa_known_oncogenic", "weak_cancerhotspot")

    def supporting_evidence_count(self) -> int:
        return self._true("computational_evidence", "mutation_in_gene_with_etiology", "very_weak_cancerhotspot")

    def benign_strong_evidence_count(self) -> int:
        return self._true("benign_functional_studies", "high_maf")

    def benign_supporting_evidence_count(self) -> int:
        return self._true("benign_computational_evidence", "synonymous_mutation")

    def is_valid(self) -> bool:
        """SomaticViccData::isValid (SomaticVariantInterpreter.h:95-109) —
        mutually-exclusive hotspot rules may not both be set."""
        s = self.states

        def set_(k):
            return s.get(k) is not None
        for a, b in (("known_oncogenic_aa", "located_in_canerhotspot"),
                     ("strong_cancerhotspot", "located_in_canerhotspot"),
                     ("known_oncogenic_aa", "other_aa_known_oncogenic"),
                     ("strong_cancerhotspot", "other_aa_known_oncogenic"),
                     ("located_in_canerhotspot", "other_aa_known_oncogenic"),
                     ("located_in_canerhotspot", "weak_cancerhotspot"),
                     ("other_aa_known_oncogenic", "weak_cancerhotspot")):
            if set_(a) and set_(b):
                return False
        return True

    def config_as_map(self) -> dict[str, str]:
        """SomaticViccData::configAsMap — key-sorted by callers (QMap)."""
        out = {k: _state_str(self.states.get(k)) for k in VICC_KEYS}
        out["comment"] = self.comment
        out["created_by"] = self.created_by
        out["created_at"] = self.created_at
        out["last_updated_by"] = self.last_updated_by
        out["last_updated_at"] = self.last_updated_at
        return out


def _vicc_oncogenic_rule(d: SomaticViccData) -> str:
    strong = d.strong_evidence_count()
    moderate = d.moderate_evidence_count()
    supporting = d.supporting_evidence_count()
    if d.states.get("null_mutation_in_tsg") is True:
        if strong >= 1 or moderate >= 2 or (moderate >= 1 and supporting >= 1) or supporting >= 2:
            return "ONCOGENIC"
    if strong >= 2:
        return "ONCOGENIC"
    if strong == 1:
        if moderate >= 3 or (moderate >= 2 and supporting >= 2) or (moderate == 1 and supporting >= 3):
            return "ONCOGENIC"
    if d.states.get("null_mutation_in_tsg") is True and moderate >= 1:
        return "LIKELY_ONCOGENIC"
    if strong == 1 and moderate >= 1:
        return "LIKELY_ONCOGENIC"
    if strong == 1 and supporting >= 2:
        return "LIKELY_ONCOGENIC"
    if moderate >= 3:
        return "LIKELY_ONCOGENIC"
    if moderate >= 2 and supporting >= 2:
        return "LIKELY_ONCOGENIC"
    if moderate >= 1 and supporting >= 3:
        return "LIKELY_ONCOGENIC"
    return "UNCERTAIN_SIGNIFICANCE"


def _vicc_benign_rule(d: SomaticViccData) -> str:
    if d.states.get("very_high_maf") is True:
        return "BENIGN"
    if d.benign_strong_evidence_count() >= 2:
        return "BENIGN"
    if d.benign_strong_evidence_count() >= 1 and d.benign_supporting_evidence_count() >= 2:
        return "LIKELY_BENIGN"
    return "UNCERTAIN_SIGNIFICANCE"


def vicc_score_as_string(d: SomaticViccData) -> str:
    onc = _vicc_oncogenic_rule(d)
    ben = _vicc_benign_rule(d)
    if onc != "UNCERTAIN_SIGNIFICANCE" and ben != "UNCERTAIN_SIGNIFICANCE":
        return "UNCERTAIN_SIGNIFICANCE"
    if onc != "UNCERTAIN_SIGNIFICANCE":
        return onc
    if ben != "UNCERTAIN_SIGNIFICANCE":
        return ben
    return "UNCERTAIN_SIGNIFICANCE"


_PREDICTION_ANNOS = ["CMC_mutation_significance", "ncg_tsg", "ncg_oncogene", "gnomAD",
                     "coding_and_splicing", "ClinVar", "CANCERHOTSPOTS_TOTAL_MUT",
                     "CANCERHOTSPOTS_ALT_COUNT", "gene_info", "REVEL", "CADD"]


def check_anno_for_prediction(vl) -> bool:
    """SomaticVariantInterpreter::checkAnnoForPrediction
    (SomaticVariantInterpreter.cpp:208-217)."""
    for anno in _PREDICTION_ANNOS:
        try:
            vl.annotation_index(anno)
        except KeyError:
            return False
    return True


def predict_vicc_value(vl, var) -> SomaticViccData:
    """SomaticVariantInterpreter::predictViccValue
    (SomaticVariantInterpreter.cpp:68-206) — derive VICC evidence states from
    the GSvar annotation columns of a somatic variant."""
    if not check_anno_for_prediction(vl):
        raise ValueError("Could not find all necessary annotation for VICC parameter "
                         f"prediction for variant {var.to_string()}")

    def _to_double(b):
        try:
            return float(b)
        except (TypeError, ValueError):
            return 0.0

    def _to_int(b):
        try:
            return int(b)
        except (TypeError, ValueError):
            return 0

    out = SomaticViccData()
    ann = var.annotations
    idx = vl.annotation_index
    is_tsg = b"1" in ann[idx("ncg_tsg")]
    is_oncogene = b"1" in ann[idx("ncg_oncogene")]

    transcripts = vl.transcript_annotations(var, idx("coding_and_splicing"))
    if not transcripts:
        return out
    trans = transcripts[0]
    s = out.states

    # very strong oncogenic: null mutation in TSG
    s["null_mutation_in_tsg"] = is_tsg and any(
        t in trans.type for t in (b"stop_gained", b"frameshift", b"start_codon",
                                  b"start_lost", b"splice_acceptor", b"splice_donor"))

    # strong oncogenic 1: known oncogenic amino acid change
    clinvar = ann[idx("ClinVar")]
    if b"likely pathogenic" in clinvar:
        clinvar_class = 4
    elif b"pathogenic" in clinvar:
        clinvar_class = 5
    elif b"likely benign" in clinvar:
        clinvar_class = 2
    elif b"benign" in clinvar:
        clinvar_class = 1
    else:
        clinvar_class = -1
    cmc = ann[idx("CMC_mutation_significance")]
    s["known_oncogenic_aa"] = bool(cmc.strip()) and b"Other" not in cmc and clinvar_class >= 4

    # strong oncogenic 3: hot cancerhotspot
    hotspots_total = _to_int(ann[idx("CANCERHOTSPOTS_TOTAL_MUT")])
    hotspots_alt = _to_int(ann[idx("CANCERHOTSPOTS_ALT_COUNT")])
    s["strong_cancerhotspot"] = hotspots_total >= 50 and hotspots_alt >= 10

    # moderate 1 (located in cancerhotspot) + moderate 4 (other AA oncogenic):
    # NOT_APPLICABLE when the stronger hotspot rules were already decided
    s["located_in_canerhotspot"] = None
    s["other_aa_known_oncogenic"] = None

    # moderate 2: absent from controls
    gnomad_af = _to_double(ann[idx("gnomAD")])
    s["absent_from_controls"] = gnomad_af < 0.001

    # moderate 3: protein length changed
    s["protein_length_change"] = (
        ((is_oncogene or is_tsg) and (b"inframe_insertion" in trans.type
                                      or b"inframe_deletion" in trans.type))
        or (is_tsg and b"stop_lost" in trans.type))

    # moderate 5: weak hotspot
    s["weak_cancerhotspot"] = hotspots_total < 50 and hotspots_alt >= 10

    # supporting 1: computational evidence
    s["computational_evidence"] = (_to_double(ann[idx("REVEL")]) > 0.5
                                   and _to_double(ann[idx("CADD")]) > 20)

    # supporting 3: very weak cancerhotspot
    s["very_weak_cancerhotspot"] = 0 < hotspots_alt < 10

    # benign rules
    s["very_high_maf"] = gnomad_af > 0.05
    s["benign_functional_studies"] = clinvar_class in (1, 2)
    s["high_maf"] = gnomad_af > 0.01

    # supporting benign 2: synonymous with high o/e score
    if b"synonymous" in trans.type:
        parts = (ann[idx("gene_info")] + b",").split(b",")[0] \
            .replace(b"(", b"").replace(b")", b"") + b" "
        oe_syn = math.nan
        for part in parts.split(b" "):
            if b"oe_syn" not in part:
                continue
            oe_syn = _to_double(part.strip().replace(b"oe_syn=", b""))
        s["synonymous_mutation"] = not math.isnan(oe_syn) and oe_syn > 0.1
    else:
        s["synonymous_mutation"] = False
    return out


def get_somatic_vicc_data(db, variant_id: int) -> SomaticViccData | None:
    """NGSD::getSomaticViccData looked up by variant id."""
    rows = db.get_rows(
        "SELECT null_mutation_in_tsg, known_oncogenic_aa, strong_cancerhotspot, "
        "oncogenic_funtional_studies, located_in_canerhotspot, absent_from_controls, "
        "protein_length_change, other_aa_known_oncogenic, weak_cancerhotspot, "
        "computational_evidence, mutation_in_gene_with_etiology, very_weak_cancerhotspot, "
        "very_high_maf, benign_functional_studies, high_maf, benign_computational_evidence, "
        "synonymous_mutation, comment, created_by, created_date, last_edit_by, last_edit_date "
        "FROM somatic_vicc_interpretation WHERE variant_id=?", params=(variant_id,))
    if not rows:
        return None
    row = rows[0]
    d = SomaticViccData()
    order = ["null_mutation_in_tsg", "known_oncogenic_aa", "strong_cancerhotspot",
             "oncogenic_functional_studies", "located_in_canerhotspot", "absent_from_controls",
             "protein_length_change", "other_aa_known_oncogenic", "weak_cancerhotspot",
             "computational_evidence", "mutation_in_gene_with_etiology", "very_weak_cancerhotspot",
             "very_high_maf", "benign_functional_studies", "high_maf",
             "benign_computational_evidence", "synonymous_mutation"]
    for key, value in zip(order, row):
        d.states[key] = None if value is None else bool(int(value))
    d.comment = row[17] or ""

    def login(uid):
        v = db.get_value("SELECT user_id FROM user WHERE id=?", params=(uid,))
        return v or ""

    d.created_by = login(row[18])
    d.created_at = _qt_datetime(row[19])
    d.last_updated_by = login(row[20])
    d.last_updated_at = _qt_datetime(row[21])
    return d


def _qt_datetime(v) -> str:
    """QDateTime::toString("yyyy-MM-dd hh:mm:ss") of a SQL datetime value."""
    if v is None:
        return ""
    return str(v)[:19]
