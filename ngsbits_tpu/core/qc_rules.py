"""QC cutoff rule evaluation (quality classes good/medium/bad).

Behavioral reference: ngs-bits cppNGS/QcRuleMatcher.{h,cpp} — rules XML with
SysNameRules (per processing system, checked first) and SysTypeRules (per
system type), each holding TermRules/Rule elements with operations
"less than"/"less equal"/"greater than"/"greater equal"
(QcRuleMatcher.cpp:107-138). Collection verdict: bad > medium > good, "n/a"
when a required metric is missing (QcRuleMatcher.cpp:62-105). The rule file
format is bin/GSvar_qc_cutoffs.xml.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET


_OPERATIONS = {
    "less than": lambda value, cutoff: value < cutoff,
    "less equal": lambda value, cutoff: value <= cutoff,
    "greater than": lambda value, cutoff: value > cutoff,
    "greater equal": lambda value, cutoff: value >= cutoff,
}


class QcRuleMatcher:
    """Evaluates QC metric values against a cutoff rule XML."""

    def __init__(self, rules_xml_file: str):
        try:
            tree = ET.parse(rules_xml_file)
        except FileNotFoundError:
            raise FileNotFoundError(
                f"Could not open the cutoffs file: {rules_xml_file}")
        except ET.ParseError as exc:
            raise ValueError(f"Invalid XML: {rules_xml_file}: {exc}")
        self._root = tree.getroot()
        self._validate()
        # cache of all term names used in any rule (QcRuleMatcher.cpp:22-33)
        self._used_terms = {
            tr.get("term_name")
            for tag in ("SysTypeRules", "SysNameRules")
            for block in self._root.iter(tag)
            for tr in block.iter("TermRules")
        }

    def _validate(self):
        """Structural check standing in for the reference's XSD validation
        (qc_rules_schema.xsd, QcRuleMatcher.cpp:16-17)."""
        if self._root.tag != "QcRules":
            raise ValueError("root element must be QcRules")
        for block in self._root:
            if block.tag not in ("SysTypeRules", "SysNameRules"):
                raise ValueError(f"unexpected element: {block.tag}")
            if block.get("tumor") not in ("true", "false"):
                raise ValueError("missing/invalid 'tumor' attribute")
            for tr in block:
                if tr.tag != "TermRules" or not tr.get("term_name"):
                    raise ValueError("TermRules needs a term_name attribute")
                for rule in tr:
                    if rule.tag != "Rule":
                        raise ValueError(f"unexpected element: {rule.tag}")
                    if rule.get("operation") not in _OPERATIONS:
                        raise ValueError(
                            f"Unknown operation: {rule.get('operation')}!")
                    float(rule.get("cutoff"))
                    if rule.get("result") not in ("good", "medium", "bad"):
                        raise ValueError(
                            f"invalid result: {rule.get('result')}")

    def _get_rules(self, name_short: str, sys_type: str, is_tumor: bool):
        """Rule set for a processing system — by name first, then by type
        (QcRuleMatcher.cpp:107-128)."""
        tumor = "true" if is_tumor else "false"
        for block in self._root.iter("SysNameRules"):
            if block.get("name") == name_short and block.get("tumor") == tumor:
                return list(block.iter("TermRules"))
        for block in self._root.iter("SysTypeRules"):
            if block.get("type") == sys_type and block.get("tumor") == tumor:
                return list(block.iter("TermRules"))
        return []

    def evaluate_term(self, term_name: str, value: float, name_short: str,
                      sys_type: str, is_tumor: bool) -> str:
        """Single term -> 'good'/'medium'/'bad'/'' (QcRuleMatcher.cpp:36-60)."""
        if term_name not in self._used_terms:
            return ""
        for tr in self._get_rules(name_short, sys_type, is_tumor):
            if tr.get("term_name") != term_name:
                continue
            for rule in tr.iter("Rule"):
                op = _OPERATIONS[rule.get("operation")]
                if op(value, float(rule.get("cutoff"))):
                    return rule.get("result")
        return ""

    def evaluate(self, qc_data, name_short: str, sys_type: str,
                 is_tumor: bool) -> str:
        """Whole QCCollection -> verdict (QcRuleMatcher.cpp:62-84).

        qc_data: iterable of objects with .name and a string value (QCValue),
        or (name, value) pairs.
        """
        pairs = []
        for item in qc_data:
            if isinstance(item, tuple):
                name, val = item
            else:
                name = item.name
                val = item.to_string() if hasattr(item, "to_string") else str(item.value)
            pairs.append((name, val))

        numeric = {}
        for name, val in pairs:
            try:
                numeric[name] = float(val)
            except (TypeError, ValueError):
                continue

        # all rule terms must be present (QcRuleMatcher.cpp:86-105)
        for tr in self._get_rules(name_short, sys_type, is_tumor):
            if tr.get("term_name") not in numeric:
                return "n/a"

        counts = {"good": 0, "medium": 0, "bad": 0}
        for name, value in numeric.items():
            if name not in self._used_terms:
                continue
            quality = self.evaluate_term(name, value, name_short, sys_type,
                                         is_tumor)
            if quality in counts:
                counts[quality] += 1
        if counts["bad"]:
            return "bad"
        if counts["medium"]:
            return "medium"
        if counts["good"]:
            return "good"
        return ""
