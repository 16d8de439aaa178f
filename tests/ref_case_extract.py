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
_SKIP_RX = re.compile(
    r"SKIP_IF_NO_\w+|SKIP_IF\(|NGSD\s|NGSD\(|QSKIP|\bSKIP\(")


def _resolve_expr(expr: str) -> str:
    """Resolve a C++ string-concatenation expression into one flat string.

    Handles ``"literal" + TESTDATA("path") + "more"`` and the cppTFW
    convention that ``%20`` escapes a space inside a single argument.
    """
    expr = expr.strip()
    # TESTDATA("x") -> absolute reference path
    expr = re.sub(r'TESTDATA\(\s*"([^"]*)"\s*\)',
                  lambda m: '"' + str(REF_TEST_DIR / m.group(1)) + '"', expr)
    if "lastLogFile()" in expr:
        return "<LASTLOG>"
    # now it should be "a" + "b" + ... — join string literals
    parts = re.findall(r'"((?:[^"\\]|\\.)*)"', expr)
    joined = "".join(parts)
    leftover = re.sub(r'"(?:[^"\\]|\\.)*"', "", expr).replace("+", "").strip()
    if leftover:
        return None  # unresolvable (variables, helper calls)
    return joined


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
        gated = bool(_SKIP_RX.search(body))
        for em in _EXECUTE_RX.finditer(body):
            kind, tool, argexpr = em.groups()
            flat = _resolve_expr(argexpr)
            case = {
                "tool": tool,
                "method": m.group(1),
                "file": test_cpp.name,
                "args": _split_args(flat) if flat is not None else None,
                "unresolved": flat is None,
                "fail_expected": kind == "EXECUTE_FAIL",
                "gated": gated,
                "compares": [],
                "strips": {},
                "uses_lastlog": False,
            }
            # compares/removes that appear after this EXECUTE, before next EXECUTE
            rest = body[em.end():]
            nxt = _EXECUTE_RX.search(rest)
            scope = rest[: nxt.start()] if nxt else rest
            case["bam_to_text"] = []
            for bm in _BAM2TXT_RX.finditer(scope):
                ops = _split_top_level(bm.group(1))
                if len(ops) == 2:
                    src_f = _resolve_expr(ops[0])
                    dst_f = _resolve_expr(ops[1])
                    if src_f and dst_f:
                        case["bam_to_text"].append((src_f, dst_f))
            for rm in _REMOVE_RX.finditer(scope):
                target = _resolve_expr(rm.group(1))
                if target == "<LASTLOG>":
                    case["uses_lastlog"] = True
                if target:
                    case["strips"].setdefault(target, []).append(rm.group(2))
            for cm in _COMPARE_RX.finditer(scope):
                ops = _split_top_level(cm.group(2))
                if len(ops) < 2:
                    continue
                a = _resolve_expr(ops[0])
                b = _resolve_expr(ops[1])
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
