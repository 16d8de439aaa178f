"""Extract tool-invocation test cases from the reference tools-TEST sources.

Parses the cppTFW macros (TEST_METHOD / EXECUTE / COMPARE_FILES /
COMPARE_FILES_DELTA / COMPARE_GZ_FILES / REMOVE_LINES) out of
``/root/reference/src/tools-TEST/<Tool>_Test.cpp`` (reference:
``src/cppTFW`` macro call sites, e.g. ``tools-TEST/TsvFilter_Test.cpp``)
into plain-data case dicts so a parametrized pytest can replay them
against our CLI and the reference goldens.

Only the macro *call sites* are parsed — no reference code is copied.
"""

from __future__ import annotations

import re
from pathlib import Path

REF_TEST_DIR = Path("/root/reference/src/tools-TEST")

_METHOD_RX = re.compile(r"TEST_METHOD\((\w+)\)")
_EXECUTE_RX = re.compile(r'(EXECUTE|EXECUTE_FAIL)\(\s*"(\w+)"\s*,\s*(.*?)\);', re.S)
_COMPARE_RX = re.compile(
    r"(COMPARE_FILES_DELTA|COMPARE_FILES|COMPARE_GZ_FILES)\(\s*(.*?)\);", re.S)
_BAM2TXT_RX = re.compile(r"BAM_TO_TEXT\(\s*(.*?)\);", re.S)
_REMOVE_RX = re.compile(
    r'REMOVE_LINES\(\s*(.*?),\s*QRegularExpression\("((?:[^"\\]|\\.)*)"\)\s*\);', re.S)
# environment gates we genuinely cannot satisfy in this mount
_GENOME_SKIP_RX = re.compile(r"SKIP_IF_NO_HG(19|38)_GENOME")
_OTHER_SKIP_RX = re.compile(r"SKIP_IF_NO_PROD_GENLAB|QSKIP|SKIP_IF\(|\bSKIP\(")
# the test NGSD we CAN provide (SQLite layer, ngsbits_tpu/ngsd)
_TEST_NGSD_RX = re.compile(r"SKIP_IF_NO_TEST_NGSD")
_NGSD_DECL_RX = re.compile(r"NGSD\s+\w+\s*\(")

# NGSD C++-API calls inside method bodies: read-only ones appear in S_EQUAL
# etc. assertions and do not influence tool outputs; mutating ones are setup
# the replay must reproduce (supported set) or a gate reason (anything else)
_DB_CALL_RX = re.compile(r"\bdb\.(\w+)\(")
_DB_READONLY = {
    "getValue", "getValues", "getSampleDiseaseInfo", "sampleId",
    "processedSampleId", "phenotypeToGenes", "phenotypeIdByName",
    "relatedSamples", "getSampleData", "geneSymbol", "variant",
    "getProcessedSampleData", "geneInfo", "variantId", "synonymousSymbols",
    "previousSymbols", "pubmedIds", "geneToApprovedID", "genesOverlapping",
    "transcripts", "transcriptId", "geneId",
    # DBTable db.createTable(name, query) materializes a SELECT in memory —
    # a read, despite the name (used by S_EQUAL row checks)
    "createTable",
}
# db.getQuery() alone is a handle; db.getQuery().exec("...") is a mutation
# the replay reproduces as a raw SQL statement
_GETQUERY_EXEC_RX = re.compile(r"\.exec\s*\(")


def _resolve_expr(expr: str, variables: dict | None = None) -> str:
    """Resolve a C++ string-concatenation expression into one flat string.

    Handles ``"literal" + TESTDATA("path") + "more"``, known local QString
    variables (tempFileName paths), and the cppTFW convention that ``%20``
    escapes a space inside a single argument.
    """
    expr = expr.strip()
    # TESTDATA("x") -> absolute reference path
    expr = re.sub(r'TESTDATA\(\s*"([^"]*)"\s*\)',
                  lambda m: '"' + str(REF_TEST_DIR / m.group(1)) + '"', expr)
    if variables:
        # substitute only outside string literals
        parts = re.split(r'("(?:[^"\\]|\\.)*")', expr)
        for i in range(0, len(parts), 2):
            for var, val in variables.items():
                parts[i] = re.sub(rf'\b{re.escape(var)}\b',
                                  '"' + val + '"', parts[i])
        expr = "".join(parts)
    if "lastLogFile()" in expr:
        return "<LASTLOG>"
    # now it should be "a" + "b" + ... — join string literals
    parts = re.findall(r'"((?:[^"\\]|\\.)*)"', expr)
    joined = "".join(parts)
    leftover = re.sub(r'"(?:[^"\\]|\\.)*"', "", expr).replace("+", "").strip()
    if leftover:
        return None  # unresolvable (variables, helper calls)
    return joined


def _unresolved_reason(argexpr: str, body: str = "") -> str:
    """Explain WHY an EXECUTE argv expression could not be flattened
    (VERDICT r4 item 5: no empty gate reasons). Classifies the leftover
    C++ tokens after literal/TESTDATA substitution; local variables holding
    Settings lookups (``QString ref_file = Settings::string(...)``) are
    traced back to their declaration in the method body."""
    for var in set(re.findall(r"\b([a-zA-Z_]\w*)\b", argexpr)):
        decl = re.search(
            rf'\b{re.escape(var)}\s*=\s*(Settings::string\([^;]*)', body)
        if decl:
            argexpr = argexpr + " " + decl.group(1)
    if re.search(r'Settings::string\(\s*"reference_genome', argexpr):
        return ("args embed Settings::string(\"reference_genome*\") — "
                "genome-gated (no GRCh38/hg19 FASTA in this mount)")
    if "Settings::" in argexpr:
        return "args embed a Settings:: lookup (machine-config value absent here)"
    if "QString::number" in argexpr or "QByteArray::number" in argexpr:
        return "args built from a runtime loop variable (QString::number)"
    for var in set(re.findall(r"\b([a-zA-Z_]\w*)\b", argexpr)):
        if re.search(rf'foreach\s*\(\s*QString\s+{re.escape(var)}\b', body):
            return (f"args built from a foreach loop variable '{var}' "
                    "(thread-count sweep; determinism pinned by our own suite)")
    if "Helper::tempFileName" in argexpr:
        return "args use an unmapped Helper::tempFileName variable"
    leftover = re.sub(r'TESTDATA\(\s*"[^"]*"\s*\)', "", argexpr)
    leftover = re.sub(r'"(?:[^"\\]|\\.)*"', "", leftover)
    leftover = " ".join(t for t in leftover.replace("+", " ").split() if t)
    return f"argv contains unresolvable C++ expression: {leftover[:80]}"


def _split_args(argstr: str) -> list[str]:
    """Split a flattened EXECUTE arg string like the reference framework:
    whitespace-separated, then %20 -> literal space within each token."""
    return [tok.replace("%20", " ") for tok in argstr.split()]


def _split_top_level(s: str) -> list[str]:
    """Split macro operands on top-level commas (respecting parens/quotes)."""
    out, depth, cur, inq = [], 0, [], False
    i = 0
    while i < len(s):
        c = s[i]
        if inq:
            cur.append(c)
            if c == "\\":
                if i + 1 < len(s):
                    cur.append(s[i + 1]); i += 1
            elif c == '"':
                inq = False
        elif c == '"':
            inq = True; cur.append(c)
        elif c in "(":
            depth += 1; cur.append(c)
        elif c == ")":
            depth -= 1; cur.append(c)
        elif c == "," and depth == 0:
            out.append("".join(cur)); cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        out.append("".join(cur))
    return [x.strip() for x in out]


def _balanced_args(s: str, open_idx: int) -> str:
    """Return the contents of the parenthesised argument list that opens at
    ``s[open_idx] == '('``."""
    depth, i, inq = 0, open_idx, False
    while i < len(s):
        c = s[i]
        if inq:
            if c == "\\":
                i += 1
            elif c == '"':
                inq = False
        elif c == '"':
            inq = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return s[open_idx + 1:i]
        i += 1
    return s[open_idx + 1:]


def _ngsd_ops(window: str):
    """NGSD setup operations (in order) found in a body window, plus the
    names of any db mutations the replay harness cannot reproduce."""
    ops, unsupported = [], []
    for m in _DB_CALL_RX.finditer(window):
        fn = m.group(1)
        if fn in _DB_READONLY:
            continue
        argstr = _balanced_args(window, m.end() - 1)
        if fn == "getQuery":
            # find end of getQuery(...) then check for .exec("...")
            open_idx = m.end() - 1
            inner = _balanced_args(window, open_idx)
            after = window[open_idx + len(inner) + 2:]
            em = _GETQUERY_EXEC_RX.match(after)
            if em:
                stmt = _resolve_expr(
                    _balanced_args(after, em.end() - 1))
                if stmt:
                    ops.append(("sqlstmt", stmt))
                else:
                    unsupported.append("getQuery().exec")
            continue
        if fn == "init":
            ops.append(("init",))
        elif fn == "executeQueriesFromFile":
            p = _resolve_expr(argstr)
            if p:
                ops.append(("sql", p))
            else:
                unsupported.append(fn)
        elif fn in ("importGeneExpressionData", "importExonExpressionData"):
            parts = _split_top_level(argstr)
            path = _resolve_expr(parts[0]) if parts else None
            ps = _resolve_expr(parts[1]) if len(parts) > 1 else None
            force = len(parts) > 2 and parts[2].strip() == "true"
            mode = "genes" if fn == "importGeneExpressionData" else "exons"
            if path and ps:
                ops.append(("import_expr", mode, path, ps, force))
            else:
                unsupported.append(fn)
        else:
            unsupported.append(fn)
    return ops, unsupported


_CHECK_MACRO_RX = re.compile(r"\b(I_EQUAL|S_EQUAL|F_EQUAL)\(")
_VAR_ASSIGN_RX = re.compile(
    r"^\s*(?:int|QString|QByteArray|double|auto)?\s*(\w+)\s*=\s*db\.getValue\(")
_SUFFIX_KIND = (
    (".toDate().toString(Qt::ISODate)", "date"),
    (".toInt()", "int"),
    (".toDouble()", "float"),
    (".toString()", "str"),
)


def _parse_getvalue(line: str, start: int, variables: dict | None = None):
    """Parse ``db.getValue(<query>)<suffix>`` at ``line[start:]``; returns
    (flat_query | None, kind, end_index) or None."""
    open_idx = line.find("(", start)
    if open_idx < 0:
        return None
    q = _balanced_args(line, open_idx)
    end = open_idx + len(q) + 2
    rest = line[end:]
    kind = "str"
    for suffix, k in _SUFFIX_KIND:
        if rest.startswith(suffix):
            kind = k
            end += len(suffix)
            break
    return _resolve_expr(q, variables), kind, end


def _parse_expected(kind: str, text: str):
    # the macro arg splitter already excluded the closing paren/semicolon,
    # so only whitespace needs trimming (an rstrip of ')'/';'/'"' would
    # corrupt quoted values ending in those characters)
    text = text.strip()
    if kind == "int":
        try:
            return int(text)
        except ValueError:
            return None
    if kind == "float":
        try:
            return float(text)
        except ValueError:
            return None
    m = re.fullmatch(r'"((?:[^"\\]|\\.)*)"', text)
    return _cpp_unescape(m.group(1)) if m else None


def _cpp_unescape(s: str) -> str:
    return (s.replace(r"\"", '"').replace(r"\t", "\t")
             .replace(r"\n", "\n").replace("\\\\", "\\"))


_TABLE_ASSIGN_RX = re.compile(
    r"^\s*DBTable\s+(\w+)\s*=\s*db\.createTable\(")
_TABLE_ROWCOUNT_RX = re.compile(r"I_EQUAL\((\w+)\.rowCount\(\),\s*(\d+)\)")
_TABLE_ROW_RX = re.compile(
    r"S_EQUAL\((\w+)\.row\((\d+)\)\.asString\('(.)'\),\s*\"((?:[^\"\\]|\\.)*)\"\)")


def _db_checks(scope: str, variables: dict | None = None) -> list[tuple]:
    """Extract `(kind, flat_query, expected)` assertions over db.getValue
    from an EXECUTE's scope: both direct ``I_EQUAL(db.getValue(q).toInt(), n)``
    and the two-step ``int c = db.getValue(q).toInt(); I_EQUAL(c, n)``, plus
    DBTable materializations (``DBTable t = db.createTable(n, q)`` with
    rowCount/row(i).asString checks)."""
    checks = []
    pending: dict[str, tuple] = {}   # var -> (kind, flat_query)
    tables: dict[str, str] = {}      # var -> flat query
    for line in scope.splitlines():
        tm = _TABLE_ASSIGN_RX.match(line)
        if tm:
            ops = _split_top_level(
                _balanced_args(line, line.index("db.createTable(")
                               + len("db.createTable")))
            q = _resolve_expr(ops[1], variables) if len(ops) > 1 else None
            if q:
                tables[tm.group(1)] = q
            else:
                tables.pop(tm.group(1), None)
            continue
        rm = _TABLE_ROWCOUNT_RX.search(line)
        if rm and rm.group(1) in tables:
            checks.append(("table_rows", tables[rm.group(1)],
                           int(rm.group(2))))
            continue
        rm = _TABLE_ROW_RX.search(line)
        if rm and rm.group(1) in tables:
            checks.append(("table_row", tables[rm.group(1)],
                           (int(rm.group(2)), rm.group(3),
                            _cpp_unescape(rm.group(4)))))
            continue
        am = _VAR_ASSIGN_RX.match(line)
        if am and "db.getValue(" in line:
            parsed = _parse_getvalue(line, line.index("db.getValue(") + len("db.getValue"), variables)
            if parsed and parsed[0] is not None:
                pending[am.group(1)] = (parsed[1], parsed[0])
            else:
                pending.pop(am.group(1), None)   # unresolvable query
            continue
        cm = _CHECK_MACRO_RX.search(line)
        if not cm:
            continue
        argstr = _balanced_args(line, line.find("(", cm.start()))
        ops = _split_top_level(argstr)
        if len(ops) != 2:
            continue
        lhs, rhs = ops
        if lhs.startswith("db.getValue("):
            parsed = _parse_getvalue(lhs, len("db.getValue"), variables)
            if not parsed or parsed[0] is None:
                continue
            kind = "int" if cm.group(1) == "I_EQUAL" else parsed[1]
            expected = _parse_expected(kind, rhs)
            if expected is not None:
                checks.append((kind, parsed[0], expected))
        elif re.fullmatch(r"\w+", lhs) and lhs in pending:
            kind, q = pending[lhs]
            if cm.group(1) == "I_EQUAL":
                kind = "int"
            expected = _parse_expected(kind, rhs)
            if expected is not None:
                checks.append((kind, q, expected))
    return checks


def extract_cases(test_cpp: Path) -> list[dict]:
    """Return a list of case dicts for one reference test file.

    Case dict: {tool, method, args: [str], compares: [(kind, out, ref, delta)],
                strips: {out_file: [pattern,...]}, uses_lastlog, gated, fail}
    """
    src = test_cpp.read_text(errors="replace")
    cases = []
    # split into method bodies
    methods = list(_METHOD_RX.finditer(src))
    for i, m in enumerate(methods):
        body = src[m.end(): methods[i + 1].start() if i + 1 < len(methods) else len(src)]
        gate_reason = None
        if _GENOME_SKIP_RX.search(body):
            gate_reason = "needs reference genome (no FASTA in this mount)"
        elif _OTHER_SKIP_RX.search(body):
            gate_reason = "reference gates on env (GenLab/QSKIP) absent here"
        needs_ngsd = bool(_TEST_NGSD_RX.search(body)
                          or _NGSD_DECL_RX.search(body))
        # local QString variables from Helper::tempFileName — replay maps
        # them to sandbox-relative paths so later references resolve
        mvars = {var: f"out/tmp_{var}{suffix}"
                 for var, suffix in re.findall(
                     r'QString\s+(\w+)\s*=\s*Helper::tempFileName\('
                     r'"([^"]*)"\);', body)}
        # id-lookup variables (ps_id etc.): value only known at replay time —
        # resolve queries to {var} placeholders and record the recipe
        db_check_vars = {var: (fn, arg) for var, fn, arg in re.findall(
            r'QString\s+(\w+)\s*=\s*db\.(processedSampleId|sampleId)\('
            r'"([^"]+)"\);', body)}
        check_vars = {var: "{" + var + "}" for var in db_check_vars}
        prev_end = 0
        unsupported_so_far: list[str] = []
        for em in _EXECUTE_RX.finditer(body):
            kind, tool, argexpr = em.groups()
            flat = _resolve_expr(argexpr, mvars)
            window = body[prev_end:em.start()]
            ngsd_ops, unsup = _ngsd_ops(window)
            mkdirs = [d for d in re.findall(
                r'QDir\([^)]*\)\.(?:mkdir|mkpath)\("([^"]+)"\)', window)]
            # Helper::storeTextFile(target, QStringList() << a << b ...)
            write_files = []
            for wm in re.finditer(
                    r'Helper::storeTextFile\(\s*(\w+|\bTESTDATA\([^)]*\)|"[^"]*")'
                    r'\s*,\s*QStringList\(\)((?:\s*<<\s*[^;<]+)+)\);', window):
                target = _resolve_expr(wm.group(1), mvars)
                items = [_resolve_expr(p, mvars)
                         for p in wm.group(2).split("<<")[1:]]
                if target and all(x is not None for x in items):
                    write_files.append((target, items))
            unsupported_so_far.extend(unsup)
            # cppTFW logs each EXECUTE's console output to
            # out/<TestClass>_line<N>.log (N = source line of the macro)
            exec_line = src.count("\n", 0, m.end() + em.start()) + 1
            prev_end = em.end()
            case_gate = gate_reason
            if case_gate is None and unsupported_so_far:
                case_gate = ("method mutates NGSD via C++ API the replay "
                             f"cannot reproduce: db.{unsupported_so_far[0]}()")
            case = {
                "tool": tool,
                "method": m.group(1),
                "file": test_cpp.name,
                "args": _split_args(flat) if flat is not None else None,
                "unresolved": flat is None,
                "unresolved_reason": (_unresolved_reason(argexpr, body)
                                      if flat is None else None),
                "fail_expected": kind == "EXECUTE_FAIL",
                "gated": case_gate is not None,
                "gate_reason": case_gate,
                "needs_ngsd": needs_ngsd,
                "ngsd_ops": ngsd_ops,
                "mkdirs": mkdirs,
                "write_files": write_files,
                "log_path": f"out/{test_cpp.stem}_line{exec_line}.log",
                "compares": [],
                "strips": {},
                "uses_lastlog": False,
            }
            # compares/removes that appear after this EXECUTE, before next EXECUTE
            rest = body[em.end():]
            nxt = _EXECUTE_RX.search(rest)
            scope = rest[: nxt.start()] if nxt else rest
            case["db_checks"] = _db_checks(scope, check_vars) if needs_ngsd else []
            case["db_check_vars"] = db_check_vars
            case["bam_to_text"] = []
            for bm in _BAM2TXT_RX.finditer(scope):
                ops = _split_top_level(bm.group(1))
                if len(ops) == 2:
                    src_f = _resolve_expr(ops[0], mvars)
                    dst_f = _resolve_expr(ops[1], mvars)
                    if src_f and dst_f:
                        case["bam_to_text"].append((src_f, dst_f))
            for rm in _REMOVE_RX.finditer(scope):
                target = _resolve_expr(rm.group(1), mvars)
                if target == "<LASTLOG>":
                    case["uses_lastlog"] = True
                if target:
                    case["strips"].setdefault(target, []).append(rm.group(2))
            for cm in _COMPARE_RX.finditer(scope):
                ops = _split_top_level(cm.group(2))
                if len(ops) < 2:
                    continue
                a = _resolve_expr(ops[0], mvars)
                b = _resolve_expr(ops[1], mvars)
                delta = None
                if cm.group(1) == "COMPARE_FILES_DELTA" and len(ops) >= 3:
                    try:
                        delta = float(ops[2])
                    except ValueError:
                        delta = 0.01
                if a == "<LASTLOG>" or b == "<LASTLOG>":
                    case["uses_lastlog"] = True
                case["compares"].append((cm.group(1), a, b, delta))
            cases.append(case)
    return cases


def all_cases() -> list[dict]:
    out = []
    for f in sorted(REF_TEST_DIR.glob("*_Test.cpp")):
        out.extend(extract_cases(f))
    return out


if __name__ == "__main__":
    import collections
    cs = all_cases()
    ok = [c for c in cs if not c["unresolved"] and not c["gated"]
          and c["compares"] and not c["uses_lastlog"] and not c["fail_expected"]]
    print(f"total EXECUTE cases: {len(cs)}")
    print(f"replayable (resolved, ungated, has compares, no lastlog): {len(ok)}")
    byt = collections.Counter(c["tool"] for c in ok)
    for t, n in sorted(byt.items()):
        print(f"  {n:2d} {t}")
