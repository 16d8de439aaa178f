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


def main(argv: list[str]) -> int:
    only_tools = set(argv)
    counts: collections.Counter = collections.Counter()
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
            line = f"{status.upper():5s} {c['tool']}.{c['method']}.{seq}"
            if msg:
                line += f"  [{msg[:120]}]"
            print(line)
    total = sum(counts.values())
    print(f"\nsummary: {total} cases — " + ", ".join(
        f"{k}={v}" for k, v in sorted(counts.items())))
    return 1 if counts.get("fail") or counts.get("error") else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
