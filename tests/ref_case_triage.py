"""Triage runner: replay the reference tools-TEST corpus with the SAME
machinery and gating as tests/test_ref_parity.py and print one line per
case plus a summary.

Usage: python tests/ref_case_triage.py [ToolName ...]

This is a convenience view over the durable pytest regression net — it
imports test_ref_parity's case table and executor, so the two always agree
(a VERDICT round-3 finding was that they used to diverge).
"""

from __future__ import annotations

import collections
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import test_ref_parity as parity  # noqa: E402


def _gate_category(msg: str) -> str:
    """Bucket a skip message into one reporting category."""
    m = msg or ""
    if "fixture missing" in m:
        return "fixture-missing"
    if "genome" in m or "FASTA" in m:
        return "genome-gated"
    if "NGSD" in m:
        return "ngsd-gated"
    if "thread-count sweep" in m:
        return "thread-sweep"
    if "lastlog" in m:
        return "lastlog-golden"
    if "env" in m or "GenLab" in m or "QSKIP" in m:
        return "env-gated"
    return "other-gated"


def main(argv: list[str]) -> int:
    if any(a in ("-h", "--help") for a in argv):
        print(__doc__.strip())
        return 0
    bad = [a for a in argv if a.startswith("-")]
    if bad:
        print(f"unknown option(s): {', '.join(bad)} (see --help)")
        return 2
    known_tools = {c["tool"] for cs in parity.CASES_BY_FILE.values() for c in cs}
    unknown = [a for a in argv if a not in known_tools]
    if unknown:
        print("no corpus cases for tool(s): " + ", ".join(unknown))
        return 2
    only_tools = set(argv)
    counts: collections.Counter = collections.Counter()
    skip_cats: collections.Counter = collections.Counter()
    for fname in sorted(parity.CASES_BY_FILE):
        cases = parity.CASES_BY_FILE[fname]
        if only_tools and not any(c["tool"] in only_tools for c in cases):
            continue
        results = parity._run_file(fname)
        for seq, c in enumerate(cases):
            if only_tools and c["tool"] not in only_tools:
                continue
            status, msg = results.get(seq, ("skip", "not collected"))
            counts[status] += 1
            if status == "skip":
                skip_cats[_gate_category(msg)] += 1
            line = f"{status.upper():5s} {c['tool']}.{c['method']}.{seq}"
            if msg:
                line += f"  [{msg[:120]}]"
            print(line)
    total = sum(counts.values())
    print(f"\nsummary: {total} cases — " + ", ".join(
        f"{k}={v}" for k, v in sorted(counts.items())))
    if skip_cats:
        print("skip breakdown: " + ", ".join(
            f"{k}={v}" for k, v in sorted(skip_cats.items()))
            + f"  (sum={sum(skip_cats.values())})")
    return 1 if counts.get("fail") or counts.get("error") else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
