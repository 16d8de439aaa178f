"""Triage runner: replay every extracted reference test case against our CLI.

Usage: python tests/ref_case_triage.py [ToolName ...]
Prints PASS/FAIL/ERROR per case plus a summary. Used to drive parity work;
the durable regression net is tests/test_ref_parity.py.
"""

from __future__ import annotations

import os
import sys
import tempfile
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ref_case_extract import all_cases  # noqa: E402

import helpers  # noqa: E402


def replayable(c):
    return (not c["unresolved"] and not c["gated"] and c["compares"]
            and not c["uses_lastlog"] and not c["fail_expected"])


def run_case(c) -> tuple[str, str]:
    import contextlib
    import io

    cwd = os.getcwd()
    with tempfile.TemporaryDirectory() as td:
        try:
            os.chdir(td)
            os.makedirs("out", exist_ok=True)
            sink = io.StringIO()
            with contextlib.redirect_stdout(sink), contextlib.redirect_stderr(sink):
                rc = helpers.execute(c["tool"], c["args"])
            if rc not in (0, None):
                tail_out = sink.getvalue().strip().splitlines()
                return "ERROR", f"exit code {rc}: {tail_out[-1][:160] if tail_out else ''}"
            for src_f, dst_f in c.get("bam_to_text", []):
                helpers.bam_to_text(src_f, dst_f)
            for kind, a, b, delta in c["compares"]:
                strips = tuple(c["strips"].get(a, []) + c["strips"].get(b, []))
                if kind == "COMPARE_FILES_DELTA":
                    helpers.compare_files_delta(a, b, delta=delta or 0.01,
                                                strip_patterns=strips)
                else:
                    helpers.compare_files(a, b, strip_patterns=strips)
            return "PASS", ""
        except AssertionError as e:
            return "FAIL", str(e).splitlines()[0][:200]
        except SystemExit as e:
            return "ERROR", f"SystemExit {e.code}"
        except Exception as e:
            return "ERROR", f"{type(e).__name__}: {e}"
        finally:
            os.chdir(cwd)


def main():
    only = set(sys.argv[1:])
    cases = [c for c in all_cases() if replayable(c)]
    if only:
        cases = [c for c in cases if c["tool"] in only]
    results = {}
    for c in cases:
        status, msg = run_case(c)
        key = f"{c['tool']}.{c['method']}"
        results[key] = (status, msg)
        flag = {"PASS": ".", "FAIL": "F", "ERROR": "E"}[status]
        print(f"{flag} {key}: {msg}" if status != "PASS" else f". {key}")
    n = len(results)
    np_ = sum(1 for s, _ in results.values() if s == "PASS")
    print(f"\n{np_}/{n} PASS, "
          f"{sum(1 for s, _ in results.values() if s == 'FAIL')} FAIL, "
          f"{sum(1 for s, _ in results.values() if s == 'ERROR')} ERROR")


if __name__ == "__main__":
    main()
