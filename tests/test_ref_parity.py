"""Durable regression net over the reference's own tools-TEST corpus.

Extracts every EXECUTE/COMPARE case from
``/root/reference/src/tools-TEST/*_Test.cpp`` (see ``ref_case_extract.py``)
and replays it against our CLI, comparing outputs to the reference goldens.

Mirrors the reference test framework's execution model (``src/cppTFW``):
all methods of one test file run *in order* in a shared working directory
that looks like the reference's ``bin/`` (a sibling ``src`` symlink makes
``../src/tools-TEST/...`` relative paths inside config fixtures resolve,
and later test methods may read outputs of earlier ones, e.g.
``TsvAnnotate_Test.cpp`` method 2 compares method 1's output file).

Cases whose fixtures are absent from this mount (``panel.bam``,
``SampleSimilarity_in5.bam``) are skipped with an explicit reason instead
of erroring, and cases the reference itself gates (genome / NGSD-prod /
Genlab / chain-file SKIPs) are excluded by the extractor.
"""

from __future__ import annotations

import contextlib
import io
import os
import tempfile
from pathlib import Path

import pytest

import helpers
from ref_case_extract import all_cases

REF = Path("/root/reference/src/tools-TEST")


# lastlog-comparing cases replay for tools whose console output matches the
# reference log byte-for-byte; BamDownsample/FastqDownsample keep their
# platform-specific RNG goldens (the reference itself keys them by OS) and
# stay out.
LASTLOG_TOOLS = {"CnvReferenceCohort", "BamClipOverlap"}


def _replayable(c) -> bool:
    if c["unresolved"] or c["gated"]:
        return False
    if c["uses_lastlog"] and c["tool"] not in LASTLOG_TOOLS:
        return False
    if c["fail_expected"]:
        return True  # assert non-zero exit
    return bool(c["compares"])


def _env_gate(c) -> str | None:
    """Skip reason for cases needing environment pieces absent from this
    mount (mirrors the reference's own Settings-based SKIPs)."""
    args = c["args"] or []
    if c["tool"] == "BedLiftOver" and "-chain" in args:
        name = args[args.index("-chain") + 1]
        if not os.path.exists(name) and "/" not in name \
                and not os.environ.get("NGSBITS_LIFTOVER_" + name.upper()):
            # reference gates sibling methods on Settings liftover_* keys
            # (BedLiftOver_Test.cpp: SKIP if chain file not configured)
            return f"gated: liftover chain '{name}' not configured in this mount"
    return None


def _missing_fixtures(c) -> list[str]:
    """Reference-tree paths this case needs that are absent from the mount."""
    missing = []
    for a in c["args"] or []:
        if a.startswith(str(REF.parent)) and not os.path.exists(a):
            missing.append(a)
    for _kind, a, b, _delta in c["compares"]:
        for p in (a, b):
            if p and p.startswith(str(REF.parent)) and not os.path.exists(p):
                missing.append(p)
    return missing


def _collect():
    """(file -> ordered cases, [(file, seq, case, id)]) for parametrization."""
    by_file: dict[str, list[dict]] = {}
    for c in all_cases():
        by_file.setdefault(c["file"], []).append(c)
    params = []
    for fname, cases in by_file.items():
        for seq, c in enumerate(cases):
            if not _replayable(c):
                continue
            params.append((fname, seq, f"{c['tool']}.{c['method']}.{seq}"))
    return by_file, params


CASES_BY_FILE, PARAMS = _collect()

# file -> {seq: (status, message)}; populated lazily, one shared dir per file
_RESULTS: dict[str, dict[int, tuple[str, str]]] = {}
_SANDBOXES: list[tempfile.TemporaryDirectory] = []


def _run_file(fname: str) -> dict[int, tuple[str, str]]:
    if fname in _RESULTS:
        return _RESULTS[fname]
    td = tempfile.TemporaryDirectory(prefix="refparity_")
    _SANDBOXES.append(td)  # keep alive for the session
    root = Path(td.name)
    os.symlink("/root/reference/src", root / "src")
    bindir = root / "bin"
    (bindir / "out").mkdir(parents=True)
    results: dict[int, tuple[str, str]] = {}
    cwd = os.getcwd()
    os.chdir(bindir)
    try:
        for seq, c in enumerate(CASES_BY_FILE[fname]):
            if not _replayable(c):
                results[seq] = ("skip", "not replayable (gated/unresolved/no compares)")
                continue
            missing = _missing_fixtures(c)
            if missing:
                results[seq] = ("skip", f"gated: fixture missing from mount: {missing[0]}")
                continue
            env_gate = _env_gate(c)
            if env_gate:
                results[seq] = ("skip", env_gate)
                continue
            try:
                sink = io.StringIO()
                errsink = io.StringIO()
                with contextlib.redirect_stdout(sink), \
                        contextlib.redirect_stderr(errsink):
                    rc = helpers.execute(c["tool"], c["args"])
                # cppTFW's EXECUTE captures the tool's console output
                # (merged stdout+stderr channels) into a log file; lastlog
                # compares read it back
                log_path = None
                if c["uses_lastlog"]:
                    log_path = f"out/lastlog_{seq}.txt"
                    with open(log_path, "w") as lf:
                        lf.write(sink.getvalue())
                        lf.write(errsink.getvalue())
                if c["fail_expected"]:
                    # cppTFW's EXECUTE_FAIL expects a non-zero exit; but
                    # VcfSplit_Test pairs it with golden COMPAREs although
                    # the tool source exits 0 on that input, so when goldens
                    # exist they are the assertion and the exit code is
                    # tolerated either way.
                    if not c["compares"]:
                        assert rc not in (0, None), "EXECUTE_FAIL case exited 0"
                        results[seq] = ("pass", "")
                        continue
                if rc not in (0, None) and not c["fail_expected"]:
                    tail = (sink.getvalue() + errsink.getvalue()).strip().splitlines()
                    results[seq] = ("error",
                                    f"exit code {rc}: {tail[-1][:200] if tail else ''}")
                    continue
                for src_f, dst_f in c.get("bam_to_text", []):
                    helpers.bam_to_text(src_f, dst_f)
                for kind, a, b, delta in c["compares"]:
                    strips = tuple(c["strips"].get(a, []) + c["strips"].get(b, []))
                    if a == "<LASTLOG>":
                        a = log_path
                    if b == "<LASTLOG>":
                        b = log_path
                    if kind == "COMPARE_FILES_DELTA":
                        helpers.compare_files_delta(a, b, delta=delta or 0.01,
                                                    strip_patterns=strips)
                    else:
                        helpers.compare_files(a, b, strip_patterns=strips)
                results[seq] = ("pass", "")
            except AssertionError as e:
                results[seq] = ("fail", str(e).splitlines()[0][:300])
            except SystemExit as e:
                results[seq] = ("error", f"SystemExit {e.code}")
            except Exception as e:  # noqa: BLE001 — record, don't abort the file
                results[seq] = ("error", f"{type(e).__name__}: {e}")
    finally:
        os.chdir(cwd)
    _RESULTS[fname] = results
    return results


@pytest.mark.parametrize(("fname", "seq"),
                         [(f, s) for f, s, _ in PARAMS],
                         ids=[i for _, _, i in PARAMS])
def test_ref_parity(fname: str, seq: int):
    status, msg = _run_file(fname)[seq]
    if status == "skip":
        pytest.skip(msg)
    assert status == "pass", f"{status}: {msg}"


def test_corpus_extraction_floor():
    """The extractor must keep finding the corpus; a parse regression that
    silently drops cases would otherwise look like a green run."""
    assert len(PARAMS) >= 230, f"only {len(PARAMS)} replayable cases extracted"
