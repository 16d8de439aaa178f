"""GenlabInfo / NGSDImportGenlab tests.

Mirrors tools-TEST/GenlabInfo_Test.cpp and NGSDImportGenLab_Test.cpp. The
reference tests are gated on a production GenLab MSSQL server
(SKIP_IF_NO_PROD_GENLAB); here the GenLab views are reconstructed in a SQLite
fixture whose content is derived from the reference tests' assertions, so the
reference's NGSD init SQL files and expected values apply unchanged.
"""

import sqlite3

import pytest

from helpers import compare_files, execute

DIN = "/root/reference/src/tools-TEST/data_in"
DOUT = "/root/reference/src/tools-TEST/data_out"

GENLAB_SQL = """
CREATE TABLE v_ngs_hpo (labornummer TEXT, code TEXT);
CREATE TABLE v_ngs_orpha (labornummer TEXT, code TEXT);
CREATE TABLE v_ngs_icd10 (labornummer TEXT, code TEXT);
CREATE TABLE v_ngs_anamnese (LABORNUMMER TEXT, ANAMNESE TEXT);
CREATE TABLE v_ngs_tumoranteil (labornummer TEXT, tumoranteil REAL);
CREATE TABLE v_ngs_dates (LABORNUMMER TEXT, Geburtsjahr INTEGER,
                          Probe_Entnahmedatum TEXT, Datum_Auftragseingang TEXT);
CREATE TABLE v_krankheitsgruppe_pattyp (labornummer TEXT, krankheitsgruppe TEXT, patienttyp TEXT);
CREATE TABLE v_ngs_patient_ids (labornummer TEXT, SAPID TEXT, GenlabID TEXT);
CREATE TABLE v_ngs_duo (Labornummer_Index TEXT, BEZIEHUNGSTEXT TEXT, Labornummer_Verwandter TEXT);
CREATE TABLE v_ngs_geschlecht (labornummer TEXT, geschlecht TEXT);
CREATE TABLE v_ngs_studie (LABORNUMMER TEXT, SAMPLENAME TEXT, STUDIE TEXT);
CREATE TABLE v_ngs_dnarna (LABORNUMMER TEXT, T_UNTERSUCHUNG_1_MATERIALINFO TEXT);
CREATE TABLE v_ngs_eingangsprobe (LABORNUMMER TEXT, PROBENART_LANGFORM TEXT);
CREATE TABLE v_ngs_abrechnung (LABORNUMMER TEXT, KASSENNAME TEXT, ABRECHNUNGSMODUS TEXT);

INSERT INTO v_ngs_patient_ids VALUES
  ('DX172305', '4942684', '141517'),
  ('DXtest1', '', '179158'),
  ('DXtest3', '', '179158'),
  ('DXtest2', '', '179159'),
  ('DXtest4', '', '179159');

INSERT INTO v_ngs_geschlecht VALUES ('DXtest1', '2'), ('DXtest2', '1');

INSERT INTO v_krankheitsgruppe_pattyp VALUES
  ('DXtest1', 'Mental, behavioural or neurodevelopmental disorders', 'Index'),
  ('DXtest2', 'Diseases of the nervous system', 'Index');

INSERT INTO v_ngs_dates VALUES ('DXtest1', 2018, NULL, NULL);

INSERT INTO v_ngs_anamnese VALUES
  ('DXtest1', 'Entwicklungsverzoegerung'),
  ('DXtest2', 'Ataxie');

INSERT INTO v_ngs_orpha VALUES ('DXtest1', '73223'), ('DXtest2', '99');

INSERT INTO v_ngs_icd10 VALUES ('DXtest1', 'F89'), ('DXtest2', 'G11.0');

INSERT INTO v_ngs_tumoranteil VALUES ('DXtest1', 50);

INSERT INTO v_ngs_hpo VALUES
  ('DXtest1', 'HP:0000750'), ('DXtest1', 'HP:0007281'),
  ('DXtest2', 'HP:0002066'), ('DXtest2', 'HP:0002070');

INSERT INTO v_ngs_duo VALUES ('DXtest1', 'SCHWESTER', 'DXtest2');

INSERT INTO v_ngs_studie VALUES ('DXtest1', NULL, 'DISCO-TWIN');
"""

# HPO terms referenced by GenLabDB::phenotypes (branch roots) + the terms used
# by the GenLab fixture; present in the production NGSD in the reference setup
HPO_TERMS = [
    ("HP:0000001", "All"),
    ("HP:0000118", "Phenotypic abnormality"),
    ("HP:0000005", "Mode of inheritance"),
    ("HP:0040279", "Frequency"),
    ("HP:0032223", "Blood group"),
    ("HP:0000750", "Delayed speech and language development"),
    ("HP:0007281", "Developmental stagnation"),
    ("HP:0002066", "Gait ataxia"),
    ("HP:0002070", "Limb ataxia"),
]


@pytest.fixture
def genlab(tmp_path, monkeypatch):
    path = str(tmp_path / "genlab.sqlite")
    conn = sqlite3.connect(path)
    conn.executescript(GENLAB_SQL)
    conn.commit()
    conn.close()
    monkeypatch.setenv("NGSBITS_GENLAB_SQLITE", path)
    return path


@pytest.fixture
def ngsd(tmp_path, monkeypatch):
    path = str(tmp_path / "ngsd_test.sqlite")
    monkeypatch.setenv("NGSBITS_NGSD_TEST", path)
    from ngsbits_tpu.ngsd import NGSD
    db = NGSD(test_db=True)
    db.init()
    yield db
    db.close()


def _add_hpo_terms(db):
    for acc, name in HPO_TERMS:
        db.execute("INSERT INTO hpo_term (hpo_id, name, definition, synonyms) "
                   "VALUES (?, ?, '', '')", (acc, name))
    db.commit()


def _disease_info(db, sample, info_type):
    s_id = db.sample_id(sample)
    return [info for _t, info in db.get_sample_disease_info(s_id, info_type)]


def test_genlab_not_available(ngsd, monkeypatch, capsys):
    monkeypatch.delenv("NGSBITS_GENLAB_SQLITE", raising=False)
    assert execute("GenlabInfo", ["-ps", "DXtest1_01"]) == 1
    assert "Genlab database is not available" in capsys.readouterr().err
    assert execute("NGSDImportGenlab", ["-test", "-ps", "DXtest1_01"]) == 1
    assert "Genlab database is not available" in capsys.readouterr().err


def test_genlabinfo(genlab, ngsd, tmp_path):
    # GenlabInfo_Test.cpp getInfo
    out1 = tmp_path / "out1.tsv"
    assert execute("GenlabInfo", ["-ps", "DX172305_01", "-out", out1]) == 0
    compare_files(out1, f"{DOUT}/GenlabInfo_out1.tsv")

    out2 = tmp_path / "out2.tsv"
    assert execute("GenlabInfo", ["-ps", "DXtest1_02", "-info", "SAPID,PATID", "-out", out2]) == 0
    compare_files(out2, f"{DOUT}/GenlabInfo_out2.tsv")

    out3 = tmp_path / "out3.tsv"
    assert execute("GenlabInfo", ["-ps", "DXtest1_01", "-info", "PATID,SAPID", "-out", out3]) == 0
    compare_files(out3, f"{DOUT}/GenlabInfo_out3.tsv")

    out4 = tmp_path / "out4.tsv"
    assert execute("GenlabInfo", ["-ps", f"{DIN}/GenlabInfo_in1.tsv",
                                  "-info", "SAPID,PATID", "-out", out4]) == 0
    compare_files(out4, f"{DOUT}/GenlabInfo_out4.tsv")


def test_metadata_import(genlab, ngsd):
    # NGSDImportGenLab_Test.cpp metadata_import
    db = ngsd
    db.run_mysql_file(f"{DIN}/NGSDImportGenlab_init1.sql")
    _add_hpo_terms(db)

    # test sample 1
    assert execute("NGSDImportGenlab", ["-test", "-ps", "DXtest1_01",
                                        "-no_relations", "-no_rna_tissue"]) == 0
    s_id = db.sample_id("DXtest1_01")
    s_data = db.get_sample_data(s_id)
    assert s_data["gender"] == "male"
    assert s_data["disease_group"] == "Mental, behavioural or neurodevelopmental disorders"
    assert s_data["disease_status"] == "Affected"
    assert s_data["patient_identifier"] == "179158"
    assert s_data["year_of_birth"] == "2018"
    assert _disease_info(db, "DXtest1_01", "clinical phenotype (free text)") == ["Entwicklungsverzoegerung"]
    assert _disease_info(db, "DXtest1_01", "Orpha number") == ["ORPHA:73223"]
    assert _disease_info(db, "DXtest1_01", "ICD10 code") == ["F89"]
    assert _disease_info(db, "DXtest1_01", "tumor fraction") == ["50"]
    assert _disease_info(db, "DXtest1_01", "HPO term id") == ["HP:0000750", "HP:0007281"]

    # test sample 2
    assert execute("NGSDImportGenlab", ["-test", "-ps", "DXtest2_01",
                                        "-no_relations", "-no_rna_tissue"]) == 0
    s_data = db.get_sample_data(db.sample_id("DXtest2_01"))
    assert s_data["gender"] == "female"
    assert s_data["disease_group"] == "Diseases of the nervous system"
    assert s_data["disease_status"] == "Affected"
    assert s_data["patient_identifier"] == "179159"
    assert _disease_info(db, "DXtest2_01", "clinical phenotype (free text)") == ["Ataxie"]
    assert _disease_info(db, "DXtest2_01", "Orpha number") == ["ORPHA:99"]
    assert _disease_info(db, "DXtest2_01", "ICD10 code") == ["G11.0"]
    assert _disease_info(db, "DXtest2_01", "tumor fraction") == []
    assert _disease_info(db, "DXtest2_01", "HPO term id") == ["HP:0002066", "HP:0002070"]

    # sample not in genlab -> no import
    assert execute("NGSDImportGenlab", ["-test", "-ps", "DXtest5_01",
                                        "-no_relations", "-no_rna_tissue"]) == 0
    s_data = db.get_sample_data(db.sample_id("DXtest5_01"))
    assert s_data["gender"] == "n/a"
    assert s_data["disease_group"] == "n/a"
    assert s_data["disease_status"] == "n/a"
    assert (s_data["patient_identifier"] or "") == ""
    for info_type in ("clinical phenotype (free text)", "Orpha number", "ICD10 code",
                      "tumor fraction", "HPO term id"):
        assert _disease_info(db, "DXtest5_01", info_type) == []


def _reinit(db, sql):
    db.init()
    db.run_mysql_file(sql)
    _add_hpo_terms(db)


def _tumor_normal_case(db, sql, imported, expected):
    """NGSDImportGenLab_Test.cpp tumor_normal_test helper."""
    _reinit(db, sql)
    assert execute("NGSDImportGenlab", ["-test", "-ps", imported]) == 0
    s_id = db.sample_id(imported)
    s_data = db.get_sample_data(s_id)
    related = db.related_samples(int(s_id), "tumor-normal")
    if s_data["is_tumor"]:
        ps_data = db.get_processed_sample_data(db.processed_sample_id(imported))
        assert ps_data["normal_sample_name"] == expected
    else:
        ps_data = db.get_processed_sample_data(db.processed_sample_id(expected))
        assert ps_data["normal_sample_name"] == imported
    assert int(db.sample_id(expected)) in related


def test_relations_import(genlab, ngsd):
    # NGSDImportGenLab_Test.cpp relations_import
    db = ngsd
    db.run_mysql_file(f"{DIN}/NGSDImportGenlab_init1.sql")
    _add_hpo_terms(db)

    # same sample (RNA/DNA of same patient)
    assert execute("NGSDImportGenlab", ["-test", "-ps", "DXtest4_01"]) == 0
    s_id = db.sample_id("DXtest4_01")
    related = db.related_samples(int(s_id), "same sample")
    assert related == {int(db.sample_id("DXtest2_01"))}

    # tumor-normal simple case
    _reinit(db, f"{DIN}/NGSDImportGenlab_init1.sql")
    assert execute("NGSDImportGenlab", ["-test", "-ps", "DXtest1_01"]) == 0
    s_id = db.sample_id("DXtest1_01")
    related = db.related_samples(int(s_id), "tumor-normal")
    assert related == {int(db.sample_id("DXtest3_01"))}
    ps_data = db.get_processed_sample_data(db.processed_sample_id("DXtest3_01"))
    assert ps_data["normal_sample_name"] == "DXtest1_01"
    related = db.related_samples(int(s_id), "siblings")
    assert related == {int(db.sample_id("DXtest2_01"))}

    # tumor-normal simple case reversed
    _reinit(db, f"{DIN}/NGSDImportGenlab_init1.sql")
    assert execute("NGSDImportGenlab", ["-test", "-ps", "DXtest3_01"]) == 0
    s_id = db.sample_id("DXtest3_01")
    related = db.related_samples(int(s_id), "tumor-normal")
    assert related == {int(db.sample_id("DXtest1_01"))}
    ps_data = db.get_processed_sample_data(db.processed_sample_id("DXtest3_01"))
    assert ps_data["normal_sample_name"] == "DXtest1_01"

    # multiple processed samples - find best one
    init3 = f"{DIN}/NGSDImportGenlab_init3.sql"
    _tumor_normal_case(db, init3, "DXtest1_01", "DXtest3_01")
    _tumor_normal_case(db, init3, "DXtest3_03", "DXtest1_02")
    _tumor_normal_case(db, init3, "DXtest1_02", "DXtest3_03")
    _tumor_normal_case(db, init3, "DXtest3_02", "DXtest1_02")
    _tumor_normal_case(db, init3, "DXtest3_04", "DXtest1_04")
    _tumor_normal_case(db, init3, "DXtest1_04", "DXtest3_04")

    # relation of the same type already imported: same sample
    _reinit(db, init3)
    db.execute("INSERT INTO sample_relations (sample1_id, relation, sample2_id) VALUES (?, 'same sample', ?)",
               (db.sample_id("DXtest4_01"), db.sample_id("DXtest1_01")))
    db.commit()
    assert execute("NGSDImportGenlab", ["-test", "-ps", "DXtest4_01"]) == 0
    related = db.related_samples(int(db.sample_id("DXtest4_01")), "same sample")
    assert related == {int(db.sample_id("DXtest1_01"))}

    # relation of the same type already imported: tumor-normal
    _reinit(db, init3)
    db.execute("INSERT INTO sample_relations (sample1_id, relation, sample2_id) VALUES (?, 'tumor-normal', ?)",
               (db.sample_id("DXtest3_03"), db.sample_id("DXtest5_01")))
    db.commit()
    assert execute("NGSDImportGenlab", ["-test", "-ps", "DXtest3_03"]) == 0
    related = db.related_samples(int(db.sample_id("DXtest3_03")), "tumor-normal")
    assert related == {int(db.sample_id("DXtest5_01"))}
    ps_data = db.get_processed_sample_data(db.processed_sample_id("DXtest3_03"))
    assert ps_data["normal_sample_name"] == ""


def _set_hpo_terms(db, sample, accessions):
    s_id = db.sample_id(sample)
    db.execute("DELETE FROM sample_disease_info WHERE sample_id=?", (s_id,))
    db.commit()
    for acc in accessions:
        db.add_sample_disease_info(s_id, acc, "HPO term id", user="admin")


def test_rna_tissue_import(genlab, ngsd, capsys):
    # NGSDImportGenLab_Test.cpp rna_tissue_import
    db = ngsd
    db.run_mysql_file(f"{DIN}/NGSDImportGenlab_init4.sql")
    _add_hpo_terms(db)
    args = ["-test", "-ps", "DXtest1_01", "-no_metadata", "-no_relations"]

    for accessions, expected in [
            (["HP:0012268"], ["adipose tissue"]),
            (["HP:0100634"], ["lung"]),
            (["HP:0003002"], ["breast"]),
            (["HP:9999999"], []),  # not mappable
            (["HP:0100634", "HP:0030360"], ["lung"]),  # same tissue twice
            (["HP:0100634", "HP:9999999"], ["lung"]),  # one mapped, one not
    ]:
        _set_hpo_terms(db, "DXtest1_01", accessions)
        assert execute("NGSDImportGenlab", args) == 0
        assert _disease_info(db, "DXtest1_01", "RNA reference tissue") == expected

    # contradicting reference tissues -> warning, nothing imported
    _set_hpo_terms(db, "DXtest1_01", ["HP:0100634", "HP:0012056"])  # lung vs skin
    assert execute("NGSDImportGenlab", args) == 0
    assert "Cannot determine RNA reference tissue" in capsys.readouterr().out
    assert _disease_info(db, "DXtest1_01", "RNA reference tissue") == []


def test_add_information_to_existing_information(genlab, ngsd):
    # NGSDImportGenLab_Test.cpp add_information_to_existing_information
    db = ngsd
    db.run_mysql_file(f"{DIN}/NGSDImportGenlab_init2.sql")
    _add_hpo_terms(db)

    assert execute("NGSDImportGenlab", ["-test", "-ps", "DXtest1_01", "-no_relations"]) == 0
    s_data = db.get_sample_data(db.sample_id("DXtest1_01"))
    assert s_data["gender"] == "female"
    assert s_data["disease_group"] == "Neoplasms"
    assert s_data["disease_status"] == "Unaffected"
    assert s_data["patient_identifier"] == "9999999"
    assert _disease_info(db, "DXtest1_01", "clinical phenotype (free text)") == ["Entwicklungsverzoegerung", "Is sick"]
    assert _disease_info(db, "DXtest1_01", "Orpha number") == ["ORPHA:73223", "ORPHA:999"]
    assert _disease_info(db, "DXtest1_01", "ICD10 code") == ["F89", "G99.9"]
    assert _disease_info(db, "DXtest1_01", "tumor fraction") == ["111", "50"]
    assert _disease_info(db, "DXtest1_01", "HPO term id") == ["HP:0000750", "HP:0007281", "HP:9999999"]
    assert _disease_info(db, "DXtest1_01", "RNA reference tissue") == ["tissue"]

    assert execute("NGSDImportGenlab", ["-test", "-ps", "DXtest2_01", "-no_relations"]) == 0
    s_data = db.get_sample_data(db.sample_id("DXtest2_01"))
    assert s_data["gender"] == "male"
    assert s_data["disease_group"] == "Neoplasms"
    assert s_data["disease_status"] == "Unaffected"
    assert s_data["patient_identifier"] == "9999999"
    assert _disease_info(db, "DXtest2_01", "clinical phenotype (free text)") == ["Ataxie", "Is sick"]
    assert _disease_info(db, "DXtest2_01", "Orpha number") == ["ORPHA:99", "ORPHA:999"]
    assert _disease_info(db, "DXtest2_01", "ICD10 code") == ["G11.0", "G99.9"]
    assert _disease_info(db, "DXtest2_01", "tumor fraction") == ["111"]
    assert _disease_info(db, "DXtest2_01", "HPO term id") == ["HP:0002066", "HP:0002070", "HP:9999999"]
    assert _disease_info(db, "DXtest2_01", "RNA reference tissue") == ["tissue"]
