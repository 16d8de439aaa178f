"""Somatic VICC interpretation scoring.

Behavioral reference: ngs-bits cppNGS/SomaticVariantInterpreter.{h,cpp}
(SomaticViccData evidence counts + viccOncogenicRule/viccBenignRule) and
NGSD::getSomaticViccData (cppNGSD/NGSD.cpp).

States are tri-valued: True / False / None (NOT_APPLICABLE).
"""

from __future__ import annotations

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
