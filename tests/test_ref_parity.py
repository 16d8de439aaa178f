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
import re
import tempfile
from pathlib import Path

import pytest

import helpers
from ref_case_extract import all_cases

REF = Path("/root/reference/src/tools-TEST")


# lastlog-comparing cases replay everywhere the console output is
# deterministic; BamDownsample/FastqDownsample keep their platform-specific
# RNG goldens (the reference itself keys them by OS) and stay out.
LASTLOG_DENY = {"BamDownsample", "FastqDownsample"}


def _replayable(c) -> bool:
    if c["unresolved"] or c["gated"]:
        return False
    if c["uses_lastlog"] and c["tool"] in LASTLOG_DENY:
        return False
    # cases with no compare/check still replay as exit-status smoke runs
    # (the reference asserts the same by running them without TFW failure)
    return True


def _env_gate(c) -> str | None:
    """Skip reason for cases needing environment pieces absent from this
    mount (mirrors the reference's own Settings-based SKIPs)."""
    args = c["args"] or []
    if any(re.match(r"^[A-Za-z]:\\\\?", a) for a in args):
        # e.g. MappingQC_Test.cpp debug_mapping_qc_runtime: EXECUTEs against
        # C:\Marc\... — a developer-machine-only method, never runnable in CI
        return "gated: references developer-local Windows data paths"
    if c["tool"] == "BamToFastq" and c["method"] == "test_fix":
        # the method builds its input BAM with a C++ BamReader/BamWriter
        # duplication loop in the test body (BamToFastq_Test.cpp:20-29) —
        # not a macro the replay reproduces
        return "gated: input BAM constructed via C++ BamWriter loop in test body"
    if c["tool"] == "NGSDExportIgvGeneTrack":
        # golden names carry ', NM_...' matches from
        # hg38_ensembl_transcript_matches.tsv — listed in cppNGS.qrc but not
        # present in this mount's Resources/ (only the hg19 file is)
        return ("gated: needs hg38_ensembl_transcript_matches.tsv "
                "(listed in cppNGS.qrc, absent from this mount)")
    if c["tool"] == "GenesToBed" and c["method"] == "ccds_exon_annotated":
        # golden line order within identical (chr,start,end) groups is the
        # tie order of the reference's non-stable std::sort (BedFile::sort
        # does not compare annotations) — implementation-defined, not
        # reproducible semantics (e.g. CCDS46474/46473/2302 vs 46473/46474/
        # 2302 between adjacent groups in GenesToBed_out4.bed)
        return "gated: golden depends on std::sort tie order for equal regions"
    if c["tool"] == "NGSDTransferReportConfig":
        # goldens pin 'overlapping variants: 3' — computed over the
        # hg38_coding_highconf_all_kits.bed ROI, which cppNGS.qrc lists but
        # this mount does not contain (Resources/ has no such file)
        return ("gated: needs hg38_coding_highconf_all_kits.bed "
                "(listed in cppNGS.qrc, absent from this mount)")
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


class _MergedLog:
    """Captures a tool's console output the way cppTFW's log file sees it:
    stderr lines appear immediately, stdout is buffered until flushed (Qt's
    QTextStream(stdout) flushes when the tool's main() scope exits, which is
    why reference .log goldens show the stderr lines first)."""

    def __init__(self):
        self.parts: list[str] = []
        self.out = _BufferedOut(self)
        self.err = _PassthroughErr(self)

    def text(self) -> str:
        self.out.flush()
        return "".join(self.parts)


class _BufferedOut(io.TextIOBase):
    def __init__(self, merged):
        self._m = merged
        self._buf: list[str] = []

    def write(self, s):
        self._buf.append(s)
        return len(s)

    def flush(self):
        if self._buf:
            self._m.parts.append("".join(self._buf))
            self._buf = []

    def getvalue(self):
        return "".join(self._buf)


class _PassthroughErr(io.TextIOBase):
    def __init__(self, merged):
        self._m = merged

    def write(self, s):
        self._m.parts.append(s)
        return len(s)

    def flush(self):
        pass


def _apply_ngsd_ops(ops):
    """Reproduce the reference method's NGSD setup preamble
    (``NGSD db(true); db.init(); db.executeQueriesFromFile(...)`` and
    expression imports) against the SQLite NGSD layer."""
    from ngsbits_tpu.ngsd import NGSD
    for op in ops:
        if op[0] == "init":
            path = os.environ["NGSBITS_NGSD_TEST"]
            if os.path.exists(path):
                os.remove(path)
            db = NGSD(test_db=True)
            db.init()
            db.close()
        elif op[0] == "sql":
            db = NGSD(test_db=True)
            db.run_mysql_file(op[1])
            db.close()
        elif op[0] == "sqlstmt":
            db = NGSD(test_db=True)
            db.run_mysql_script(op[1])
            db.close()
        elif op[0] == "import_expr":
            mode, path, ps, force = op[1:]
            args = ["-test", "-expression", path, "-ps", ps, "-mode", mode]
            if force:
                args.append("-force")
            with contextlib.redirect_stdout(io.StringIO()), \
                    contextlib.redirect_stderr(io.StringIO()):
                rc = helpers.execute("NGSDImportExpressionData", args)
            assert rc in (0, None), f"expression import setup failed: {op}"


def _run_db_checks(checks, check_vars=None):
    """Replay the reference method's S_EQUAL/I_EQUAL(db.getValue(...))
    assertions against the SQLite NGSD. ``check_vars`` maps {var}
    placeholders in queries to id-lookup recipes (ps_id etc.), resolved
    against the live test NGSD here."""
    from ngsbits_tpu.ngsd import NGSD
    def fmt(v):
        # QVariant::toString semantics: NULL -> "", doubles shortest repr
        if v is None:
            return ""
        if isinstance(v, float):
            s = repr(v)
            return s[:-2] if s.endswith(".0") else s
        return str(v)

    db = NGSD(test_db=True)
    try:
        subs = {}
        for var, (fn, arg) in (check_vars or {}).items():
            if fn == "processedSampleId":
                subs["{" + var + "}"] = str(db.processed_sample_id(arg))
            elif fn == "sampleId":
                subs["{" + var + "}"] = str(db.sample_id(arg))
        for kind, q, expected in checks:
            for ph, val in subs.items():
                q = q.replace(ph, val)
            if kind == "table_rows":
                got = len(db.get_rows(q))
                assert got == expected, \
                    f"db table [{q}]: {got} rows != {expected}"
                continue
            if kind == "table_row":
                i, sep, expected_s = expected
                rows = db.get_rows(q)
                got = sep.join(fmt(v) for v in rows[i])
                assert got == expected_s, \
                    f"db table [{q}] row {i}: {got!r} != {expected_s!r}"
                continue
            val = db.get_value(q)
            if kind == "int":
                got = 0 if val is None else int(val)
                assert got == expected, f"db check [{q}]: {got!r} != {expected!r}"
            elif kind == "float":
                assert val is not None and abs(float(val) - expected) < 1e-6, \
                    f"db check [{q}]: {val!r} != {expected!r}"
            elif kind == "date":
                assert str(val)[:10] == expected, \
                    f"db check [{q}]: {val!r} != {expected!r}"
            else:
                got = "" if val is None else str(val)
                assert got == expected, f"db check [{q}]: {got!r} != {expected!r}"
    finally:
        db.close()


def _run_file(fname: str) -> dict[int, tuple[str, str]]:
    if fname in _RESULTS:
        return _RESULTS[fname]
    td = tempfile.TemporaryDirectory(prefix="refparity_")
    _SANDBOXES.append(td)  # keep alive for the session
    root = Path(td.name)
    os.symlink("/root/reference/src", root / "src")
    bindir = root / "bin"
    (bindir / "out").mkdir(parents=True)
    # mirror the reference CI's test settings (.github/workflows/settings.sh:
    # a generic projects_folder plus an empty directory for it)
    (root / "projects_folder").mkdir()
    (bindir / "settings.ini").write_text(
        'projects_folder = "../projects_folder"\n'
        'location = "UKT"\n')
    results: dict[int, tuple[str, str]] = {}
    cwd = os.getcwd()
    os.chdir(bindir)
    needs_ngsd = any(c.get("needs_ngsd") for c in CASES_BY_FILE[fname])
    saved_ngsd_env = os.environ.get("NGSBITS_NGSD_TEST")
    if needs_ngsd:
        os.environ["NGSBITS_NGSD_TEST"] = str(root / "ngsd_test.sqlite")
    try:
        for seq, c in enumerate(CASES_BY_FILE[fname]):
            if not _replayable(c):
                if c.get("gate_reason"):
                    reason = c["gate_reason"]
                elif c["unresolved"] and c["method"].endswith(
                        ("multithread", "multiple_threads")):
                    # foreach-loop thread sweeps with runtime-built args;
                    # cross-thread-count determinism is pinned by our own
                    # suite (test_seqpurge.py::test_native_threads_
                    # deterministic, BedCoverage -threads goldens)
                    reason = ("loop-driven thread-count sweep (runtime-built "
                              "args); -threads determinism pinned by the "
                              "native test suite")
                elif c["unresolved"]:
                    reason = (c.get("unresolved_reason")
                              or "unresolved C++ arg expression")
                else:
                    reason = "platform-specific RNG lastlog golden"
                results[seq] = ("skip", f"gated: {reason}")
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
                _apply_ngsd_ops(c.get("ngsd_ops") or [])
                for d in c.get("mkdirs") or []:
                    os.makedirs(d, exist_ok=True)
                for target, lines in c.get("write_files") or []:
                    # Helper::storeTextFile appends a '\n' per line
                    with open(target, "w") as wf:
                        wf.write("".join(line + "\n" for line in lines))
                merged = _MergedLog()
                with contextlib.redirect_stdout(merged.out), \
                        contextlib.redirect_stderr(merged.err):
                    rc = helpers.execute(c["tool"], c["args"])
                # cppTFW's EXECUTE captures the tool's console output
                # (merged stdout+stderr channels) into out/<class>_line<N>.log;
                # lastlog compares and literal references both read it back
                log_path = c.get("log_path") or f"out/lastlog_{seq}.txt"
                with open(log_path, "w") as lf:
                    lf.write(merged.text())
                # cppTFW's EXECUTE_FAIL means "execute, tolerating a failed
                # exit" — VcfSplit_Test pairs it with golden COMPAREs and
                # NGSDAddVariantsSomatic_Test uses it on a re-import the tool
                # source handles with a NOTE + exit 0 (main.cpp:296-300), so
                # the exit code is not an assertion; any compares/db checks
                # that follow are.
                if rc not in (0, None) and not c["fail_expected"]:
                    tail = merged.text().strip().splitlines()
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
                if c.get("db_checks"):
                    _run_db_checks(c["db_checks"], c.get("db_check_vars"))
                results[seq] = ("pass", "")
            except AssertionError as e:
                results[seq] = ("fail", str(e).splitlines()[0][:300])
            except SystemExit as e:
                results[seq] = ("error", f"SystemExit {e.code}")
            except Exception as e:  # noqa: BLE001 — record, don't abort the file
                results[seq] = ("error", f"{type(e).__name__}: {e}")
    finally:
        os.chdir(cwd)
        if needs_ngsd:
            if saved_ngsd_env is None:
                os.environ.pop("NGSBITS_NGSD_TEST", None)
            else:
                os.environ["NGSBITS_NGSD_TEST"] = saved_ngsd_env
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
    assert len(PARAMS) >= 420, f"only {len(PARAMS)} replayable cases extracted"
