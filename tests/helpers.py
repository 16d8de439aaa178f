"""Golden-file comparison helpers mirroring the reference test framework
(cppTFW: EXECUTE / REMOVE_LINES / COMPARE_FILES / COMPARE_FILES_DELTA)."""

from __future__ import annotations

import gzip
import re
from pathlib import Path

from ngsbits_tpu.__main__ import main as cli_main


def execute(tool: str, args: list[str]) -> int:
    """EXECUTE analogue: run a tool in-process, return exit code."""
    return cli_main([tool] + [str(a) for a in args])


def read_lines(path) -> list[str]:
    path = Path(path)
    data = path.read_bytes()
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    # some reference goldens carry Windows \r\n (even \r\r\n) LINE ENDINGS;
    # normalize only \r runs adjacent to \n so a stray mid-line \r in tool
    # output still fails the comparison, then split on \n alone
    text = re.sub(rb"\r+\n", b"\n", data).decode("utf-8", errors="replace")
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    return lines


def remove_lines(lines: list[str], pattern: str) -> list[str]:
    rx = re.compile(pattern)
    return [l for l in lines if not rx.search(l)]


def compare_files(out_path, ref_path, strip_patterns=()):
    out = read_lines(out_path)
    ref = read_lines(ref_path)
    for p in strip_patterns:
        out = remove_lines(out, p)
        ref = remove_lines(ref, p)
    assert len(out) == len(ref), (
        f"line count differs: {out_path}={len(out)} vs {ref_path}={len(ref)}\n"
        + "\n".join(_first_diff(out, ref)))
    for i, (a, b) in enumerate(zip(out, ref)):
        assert a == b, f"line {i + 1} differs:\n  out: {a}\n  ref: {b}"


def _first_diff(out, ref):
    for i in range(min(len(out), len(ref))):
        if out[i] != ref[i]:
            return [f"first diff at line {i+1}:", f"  out: {out[i]}", f"  ref: {ref[i]}"]
    n = min(len(out), len(ref))
    longer = out if len(out) > len(ref) else ref
    which = "out" if len(out) > len(ref) else "ref"
    return [f"extra {which} line {n+1}: {longer[n]}"]


_NUM_RX = re.compile(r"-?\d+\.?\d*(?:[eE][+-]?\d+)?")


def compare_files_delta(out_path, ref_path, delta=0.01, strip_patterns=(), sep=None):
    """COMPARE_FILES_DELTA analogue: numeric fields may differ by <= delta."""
    out = read_lines(out_path)
    ref = read_lines(ref_path)
    for p in strip_patterns:
        out = remove_lines(out, p)
        ref = remove_lines(ref, p)
    assert len(out) == len(ref), f"line count differs: {len(out)} vs {len(ref)}"
    for i, (a, b) in enumerate(zip(out, ref)):
        if a == b:
            continue
        a_nums = _NUM_RX.findall(a)
        b_nums = _NUM_RX.findall(b)
        a_rest = _NUM_RX.sub("#", a)
        b_rest = _NUM_RX.sub("#", b)
        assert a_rest == b_rest, f"line {i + 1} differs (non-numeric):\n  out: {a}\n  ref: {b}"
        assert len(a_nums) == len(b_nums), f"line {i + 1} numeric count differs"
        for x, y in zip(a_nums, b_nums):
            assert abs(float(x) - float(y)) <= delta, (
                f"line {i + 1}: {x} vs {y} differ by more than {delta}\n  out: {a}\n  ref: {b}")


def bam_to_text(bam_path, txt_path):
    """BAM_TO_TEXT analogue: render a BAM semantically as SAM-like text.

    Both sides of a comparison go through this same renderer, so it serves
    the same purpose as the reference macro (semantic BAM equality)."""
    from ngsbits_tpu.io.bam import BamReader, batch_to_sam_text

    lines = []
    with BamReader(str(bam_path)) as rd:
        for batch in rd:
            lines.extend(batch_to_sam_text(batch, rd.ref_names))
    Path(txt_path).write_text("\n".join(lines) + ("\n" if lines else ""))


QCML_STRIP = (r"creation ", r"<binary>")
