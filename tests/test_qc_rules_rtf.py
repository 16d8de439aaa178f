"""QcRuleMatcher (mirrors cppNGS-TEST/QcRuleMatcher_Test.cpp) and RtfDocument."""

import pathlib

import pytest

from ngsbits_tpu.core.qc_rules import QcRuleMatcher
from ngsbits_tpu.core.qcml import QCValue
from ngsbits_tpu.core import rtf

DATA = pathlib.Path("/root/reference/src/cppNGS-TEST/data_in")


def test_invalid_xml_rejected():
    with pytest.raises(ValueError):
        QcRuleMatcher(str(DATA / "test_qc_cutoffs_invalid.xml"))


def test_evaluation_matches_reference():
    m = QcRuleMatcher(str(DATA / "test_qc_cutoffs.xml"))
    name_short, sys_type = "system", "WGS"

    def coll(*pairs):
        return [QCValue.from_double(n, v) for n, v in pairs]

    assert m.evaluate(coll(("target region 20x percentage", 20.0),
                           ("target region read depth", 30.0)),
                      name_short, sys_type, False) == "bad"
    assert m.evaluate(coll(("target region 20x percentage", 98.0),
                           ("target region read depth", 30.0)),
                      name_short, sys_type, False) == "medium"
    assert m.evaluate(coll(("target region 20x percentage", 99.0),
                           ("target region read depth", 31.0)),
                      name_short, sys_type, False) == "good"
    # extra metric not in the rules is ignored
    assert m.evaluate(coll(("target region 20x percentage", 99.0),
                           ("target region read depth", 31.0),
                           ("mapped read percentage", 96.0)),
                      name_short, sys_type, False) == "good"
    # a required metric missing -> n/a
    assert m.evaluate(coll(("target region 20x percentage", 99.0)),
                      name_short, sys_type, False) == "n/a"
    assert m.evaluate(coll(("insert size", 363.22),
                           ("duplicate read percentage", 11.66)),
                      name_short, sys_type, False) == "n/a"

    assert m.evaluate_term("target region 20x percentage", 99.0,
                           name_short, sys_type, False) == "good"
    assert m.evaluate_term("target region 20x percentage", 95.0,
                           name_short, sys_type, False) == "medium"
    assert m.evaluate_term("target region 20x percentage", 89.0,
                           name_short, sys_type, False) == "bad"
    # SysNameRules take precedence over SysTypeRules
    assert m.evaluate_term("target region read depth", 1100.0,
                           "RPGR-Ex15", sys_type, False) == "good"
    assert m.evaluate_term("target region read depth", 450.0,
                           "RPGR-Ex15", sys_type, False) == "medium"


def test_rtf_document(tmp_path):
    doc = rtf.RtfDocument()
    doc.add_color(255, 0, 0)
    doc.add_part(rtf.RtfParagraph(b"Hello").set_bold(True).rtf_code())
    table = rtf.RtfTable(
        [[b"a", b"b"], [b"c", b"d"]],
        [[1000, 2000], [1000, 2000]],
        rtf.RtfParagraph(),
    )
    table.set_unique_border(10)
    doc.add_part(table.rtf_code())
    out = tmp_path / "doc.rtf"
    doc.save(str(out))
    data = out.read_bytes()
    assert data.startswith(b"{\\rtf\\ansi")
    assert data.endswith(b"\n}")
    assert b"\\fonttbl{\\f0 Calibri;}" in data
    assert b"{\\colortbl;\\red255\\green0\\blue0;}" in data
    assert b"\\b" in data
    assert b"\\trowd" in data and data.count(b"\\row") >= 2
    assert b"\\cellx1000" in data and b"\\cellx3000" in data
    assert b"\\clbrdrt\\brdrw10\\brdrs" in data


def test_rtf_escapes_and_picture():
    assert rtf.escape_umlauts("ä>ß".encode()) == b"\\u228;\\u62;\\u223;"
    assert round(rtf.cm2twip(1.0), 3) == 566.929
    pic = rtf.RtfPicture(b"\x89PNG", 100, 50)
    pic.resize_to_width(200)
    assert (pic.width, pic.height) == (200, 100)
    code = pic.rtf_code()
    assert b"\\pngblip" in code and b"\\picwgoal200" in code
    assert b"89504e47" in code  # hex-encoded payload
