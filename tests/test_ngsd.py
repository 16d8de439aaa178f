"""NGSD (SQLite) layer tests, mirroring the reference's NGSD tool tests
(which run `NGSD db(true); db.init();` then EXECUTE the tool and check via
SQL)."""

import os

import pytest

from helpers import execute


@pytest.fixture
def ngsd(tmp_path, monkeypatch):
    path = str(tmp_path / "ngsd_test.sqlite")
    monkeypatch.setenv("NGSBITS_NGSD_TEST", path)
    from ngsbits_tpu.ngsd import NGSD
    db = NGSD(test_db=True)
    db.init()
    yield db
    db.close()


def test_init_schema(ngsd):
    assert len(ngsd.tables()) > 100
    assert ngsd.get_values("SELECT user_id FROM user") == ["admin", "genlab_import", "unknown"]
    assert ngsd.get_values("SELECT build FROM genome") == ["GRCh37", "GRCh38"]
    # enum metadata captured from the MySQL DDL
    assert ngsd.get_enum("qc_terms", "type") == ["float", "int", "string"]
    assert "protein-coding gene" in ngsd.get_enum("gene", "type")


def test_ngsd_init_tool_with_add(tmp_path, monkeypatch):
    path = str(tmp_path / "ngsd_test.sqlite")
    monkeypatch.setenv("NGSBITS_NGSD_TEST", path)
    add = tmp_path / "add.sql"
    add.write_text("INSERT INTO gene VALUES (NULL, 1234, 'TESTG', 'Test gene', 'protein-coding gene', NULL, NULL);\n")
    assert execute("NGSDInit", ["-test", "-add", add]) == 0
    from ngsbits_tpu.ngsd import NGSD
    db = NGSD(test_db=True)
    assert db.get_value("SELECT symbol FROM gene WHERE hgnc_id=1234") == "TESTG"
    db.close()


def test_ngsd_import_qc(ngsd, monkeypatch):
    # reference test: NGSDImportQC_Test.cpp pins 43 terms, 39 non-obsolete,
    # version 2025-11-19
    assert execute("NGSDImportQC", [
        "-test", "-obo", "/root/reference/src/tools-TEST/data_in/NGSDImportQC_qcml.obo"]) == 0
    assert ngsd.get_value("SELECT count(*) FROM qc_terms") == 43
    assert ngsd.get_value("SELECT count(*) FROM qc_terms WHERE obsolete=0") == 39
    assert ngsd.get_value("SELECT version FROM db_import_info WHERE name='QC terms'") == "2025-11-19"
