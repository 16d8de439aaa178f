"""Replay of the reference's NGSD_Test.cpp ``main_tests`` (lines 21-1873)
against our SQLite NGSD with the NGSD_in1.sql fixture — the same linear
assertion sequence, split into ordered test functions over a shared
module-scoped database."""

from __future__ import annotations

import pytest

DIN = "/root/reference/src/cppNGSD-TEST/data_in"


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ngsd_main") / "ngsd_test.sqlite")
    import os
    old = os.environ.get("NGSBITS_NGSD_TEST")
    os.environ["NGSBITS_NGSD_TEST"] = path
    from ngsbits_tpu.ngsd import NGSD
    ngsd = NGSD(test_db=True)
    ngsd.init()
    ngsd.run_mysql_file(f"{DIN}/NGSD_in1.sql")
    yield ngsd
    ngsd.close()
    if old is None:
        os.environ.pop("NGSBITS_NGSD_TEST", None)
    else:
        os.environ["NGSBITS_NGSD_TEST"] = old


def test_basics(db):
    """NGSD_Test.cpp:30-66 — escapeText/tableExists/tableEmpty/rowExists/
    getEnum."""
    assert db.escape_text("; '") == "'; '''"

    assert db.table_exists("user")
    assert not db.table_exists("user_missing")

    assert not db.table_empty("user")
    assert db.table_empty("gaps")

    assert db.row_exists("user", 99)    # ahmustm1
    assert db.row_exists("user", 101)   # ahkerra1
    assert not db.row_exists("user", 666)

    enum_values = db.get_enum("sample", "disease_group")
    assert ", ".join(enum_values) == (
        "n/a, Neoplasms, Diseases of the blood or blood-forming organs, "
        "Diseases of the immune system, Endocrine, nutritional or metabolic "
        "diseases, Mental, behavioural or neurodevelopmental disorders, "
        "Sleep-wake disorders, Diseases of the nervous system, Diseases of "
        "the visual system, Diseases of the ear or mastoid process, Diseases "
        "of the circulatory system, Diseases of the respiratory system, "
        "Diseases of the digestive system, Diseases of the skin, Diseases of "
        "the musculoskeletal system or connective tissue, Diseases of the "
        "genitourinary system, Developmental anomalies, Other diseases")
    assert len(enum_values) == 18
    assert enum_values[4] == "Endocrine, nutritional or metabolic diseases"

    enum_values = db.get_enum("sample_disease_info", "type")
    assert ", ".join(enum_values) == (
        "HPO term id, ICD10 code, OMIM disease/phenotype identifier, Orpha "
        "number, CGI cancer type, tumor fraction, age of onset, clinical "
        "phenotype (free text), RNA reference tissue, Oncotree code")
    assert len(enum_values) == 10

    enum_values = db.get_enum("somatic_report_configuration", "quality")
    assert len(enum_values) == 6
    assert ", ".join(enum_values) == (
        "no abnormalities, tumor cell content too low, quality of tumor DNA "
        "too low, DNA quantity too low, heterogeneous sample, contamination")


def test_processed_sample_and_system(db):
    """NGSD_Test.cpp:71-98 — processedSampleName/processingSystem*/
    normalSample/nextProcessingId/processedSamplePath."""
    ps_name = db.processed_sample_name(db.processed_sample_id("NA12878_03"))
    assert ps_name == "NA12878_03"

    sys_id = db.processing_system_id_from_processed_sample(ps_name)
    assert sys_id == 1

    d = db.get_processing_system_data(sys_id)
    assert d["name"] == "HaloPlex HBOC v5"
    assert d["name_short"] == "hpHBOCv5"
    assert d["adapter1_p5"] == "AGATCGGAAGAGCACACGTCTGAACTCCAGTCAC"
    assert d["adapter2_p7"] == "AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGT"
    assert d["type"] == "Panel Haloplex"
    assert not d["shotgun"]
    assert d["umi_type"] == "n/a"
    assert d["genome"] == "GRCh37"

    assert db.normal_sample(db.processed_sample_id("NA12345_01")) == "NA12878_03"
    assert db.next_processing_id(db.sample_id("NA12878")) == "5"

    import os
    os.environ["NGSBITS_PROJECTS_FOLDER"] = "/mnt/projects"
    try:
        gsvar_path = db.processed_sample_path(
            db.processed_sample_id("NA12878_03"), "GSVAR")
        assert gsvar_path.endswith(
            "test/KontrollDNACoriell/Sample_NA12878_03/NA12878_03.GSvar")
    finally:
        os.environ.pop("NGSBITS_PROJECTS_FOLDER", None)


def test_gene_symbols(db):
    """NGSD_Test.cpp:100-155 — geneToApproved*/geneId/geneSymbol/geneHgncId."""
    assert db.gene_to_approved("BRCA1") == "BRCA1"
    assert db.gene_to_approved("BLABLA") == ""
    assert db.gene_to_approved("BLABLA", True) == "BLABLA"
    assert db.gene_to_approved("BLABLA2", True) == "BLABLA2"

    assert db.gene_to_approved_with_message("BRCA1") == \
        ("BRCA1", "KEPT: BRCA1 is an approved symbol")
    assert db.gene_to_approved_with_message("BLABLA") == \
        ("BLABLA", "ERROR: BLABLA is unknown symbol")
    assert db.gene_to_approved_with_message("COX2") == \
        ("COX2", "ERROR: COX2 is a synonymous symbol of the genes MT-CO2, PTGS2")
    assert db.gene_to_approved_with_message("QARS") == \
        ("QARS", "ERROR: QARS is a previous symbol of the genes EPRS, QARS1")

    assert db.gene_to_approved_with_message_and_ambiguous("BRCA1") == \
        [("BRCA1", "KEPT: BRCA1 is an approved symbol")]
    assert db.gene_to_approved_with_message_and_ambiguous("BLABLA") == \
        [("BLABLA", "ERROR: BLABLA is an unknown symbol")]
    assert db.gene_to_approved_with_message_and_ambiguous("COX2") == \
        [("MT-CO2", "REPLACED: COX2 is a synonymous symbol"),
         ("PTGS2", "REPLACED: COX2 is a synonymous symbol")]
    assert db.gene_to_approved_with_message_and_ambiguous("QARS") == \
        [("EPRS", "REPLACED: QARS is a previous symbol"),
         ("QARS1", "REPLACED: QARS is a previous symbol")]

    assert db.gene_id("BRCA1") == 1
    assert db.gene_id("BLABLA") == -1

    assert db.gene_hgnc_id(433223) == "HGNC:9605"
    assert db.hgnc_id_to_gene_id("HGNC:9605") == 433223
    assert db.hgnc_id_to_gene_id("9605") == 433223


def test_genes_overlapping(db):
    """NGSD_Test.cpp:157-199 — genesOverlapping[ByExon]."""
    from ngsbits_tpu.core.chromosome import Chromosome

    c13 = Chromosome("chr13")
    c22 = Chromosome("chr22")
    assert db.genes_overlapping(c13, 90, 95, 0).count() == 0
    assert db.genes_overlapping(c13, 205, 210, 0).count() == 0
    genes = db.genes_overlapping(c13, 100, 200, 0)
    assert list(genes) == ["BRCA2"]
    genes = db.genes_overlapping(c13, 140, 160, 0)
    assert list(genes) == ["BRCA2"]
    assert list(db.genes_overlapping(c13, 90, 95, 6)) == ["BRCA2"]
    assert list(db.genes_overlapping(c13, 205, 210, 6)) == ["BRCA2"]
    assert list(db.genes_overlapping(c22, 80, 110, 0)) == ["NON-CODING"]

    assert db.genes_overlapping_by_exon(c13, 90, 95, 0).count() == 0
    assert db.genes_overlapping_by_exon(c13, 205, 210, 0).count() == 0
    assert list(db.genes_overlapping_by_exon(c13, 100, 200, 0)) == ["BRCA2"]
    assert db.genes_overlapping_by_exon(c13, 140, 160, 0).count() == 0
    assert list(db.genes_overlapping_by_exon(c13, 90, 95, 6)) == ["BRCA2"]
    assert list(db.genes_overlapping_by_exon(c13, 205, 210, 6)) == ["BRCA2"]
    assert list(db.genes_overlapping_by_exon(c22, 110, 190, 0)) == ["NON-CODING"]


def test_sample_data(db):
    """NGSD_Test.cpp:201-256 — getSampleData/getProcessedSampleData."""
    sample_id = db.sample_id("NA12878")
    d = db.get_sample_data(sample_id)
    assert d["name"] == "NA12878"
    assert d["name_external"] == "ex1"
    assert d["patient_identifier"] == "pat1"
    assert d["year_of_birth"] == "1977"
    assert d["quality"] == "good"
    assert d["comments"] == "comment_s1"
    assert d["disease_group"] == "Diseases of the blood or blood-forming organs"
    assert d["disease_status"] == "Unaffected"
    assert len(d["phenotypes"]) == 0
    assert not d["is_tumor"]
    assert not d["is_ffpe"]

    sample_id = db.sample_id("NA12345_01")
    d = db.get_sample_data(sample_id)
    assert d["name"] == "NA12345"
    assert d["name_external"] == "ex3"
    assert d["patient_identifier"] == "pat3"
    assert d["year_of_birth"] == ""
    assert d["quality"] == "bad"
    assert d["comments"] == "comment_s3"
    assert d["disease_group"] == "Diseases of the immune system"
    assert d["disease_status"] == "Affected"
    assert d["phenotypes"] == ["HP:0001251 - Ataxia"]
    assert d["is_tumor"]
    assert d["is_ffpe"]

    ps_id = db.processed_sample_id("NA12878_03")
    d = db.get_processed_sample_data(ps_id)
    assert d["name"] == "NA12878_03"
    assert d["quality"] == "medium"
    assert d["gender"] == "female"
    assert d["comments"] == "comment_ps1"
    assert d["project_name"] == "KontrollDNACoriell"
    assert d["project_type"] == "test"
    assert d["run_name"] == "#00372"
    assert d["normal_sample_name"] == ""
    assert d["processing_system"] == "HaloPlex HBOC v5"
    assert d["processing_system_type"] == "Panel Haloplex"
    assert d["processing_modus"] == "manual"
    assert d["batch_number"] == "batch 17"

    ps_id = db.processed_sample_id("NA12345_01")
    d = db.get_processed_sample_data(ps_id)
    assert d["name"] == "NA12345_01"
    assert d["quality"] == "good"
    assert d["gender"] == "male"
    assert d["comments"] == "comment_ps4"
    assert d["project_name"] == "KontrollDNACoriell"
    assert d["run_name"] == "#00372"
    assert d["normal_sample_name"] == "NA12878_03"
    assert d["processing_modus"] == "n/a"
    assert d["batch_number"] == ""


def test_genes_to_regions(db):
    """NGSD_Test.cpp:258-380 — genesToRegions in gene/exon modes with
    fallback and transcript annotation."""
    class _Msgs:
        def __init__(self):
            self.text = ""

        def write(self, t):
            self.text += t

        def __bool__(self):
            return bool(self.text)

    def regions_for(gene, source, mode, fallback=False, annotate=False):
        messages = _Msgs()
        out = db.gene_to_regions(gene, source, mode, fallback, annotate,
                                 messages)
        return out, messages

    r, msg = regions_for("BRCA1", "ccds", "gene")
    assert len(r) == 1
    assert r.lines[0].annotations[0] == b"BRCA1"
    assert r.base_count() == 101
    assert not msg

    r, msg = regions_for("NIPA1", "ensembl", "gene", annotate=True)
    assert len(r) == 2
    assert r.lines[0].annotations[0] == b"NIPA1 NIPA1_TR2.5"
    assert r.lines[1].annotations[0] == b"NIPA1 NIPA1_TR1.4"
    assert r.base_count() == 642
    r.merge()
    assert len(r) == 1 and r.base_count() == 341
    assert not msg

    r, msg = regions_for("NIPA1", "ccds", "gene")
    assert r.base_count() == 0
    assert msg

    r, msg = regions_for("NIPA1", "ccds", "gene", fallback=True)
    assert len(r) == 2 and r.base_count() == 642
    r.merge()
    assert len(r) == 1 and r.base_count() == 341
    assert not msg

    r, msg = regions_for("BRCA1", "ccds", "exon")
    assert len(r) == 4
    assert r.lines[0].annotations[0] == b"BRCA1"
    assert r.base_count() == 44
    assert not msg

    r, msg = regions_for("NIPA1", "ccds", "exon")
    assert r.base_count() == 0 and msg

    r, msg = regions_for("NIPA1", "ccds", "exon", fallback=True)
    assert len(r) == 4 and r.base_count() == 304
    r.merge()
    assert len(r) == 2 and r.base_count() == 202
    assert not msg

    r, msg = regions_for("NIPA1", "ensembl", "exon", annotate=True)
    assert len(r) == 4
    assert r.lines[0].annotations[0] == b"NIPA1 NIPA1_TR1.4"
    assert r.lines[1].annotations[0] == b"NIPA1 NIPA1_TR2.5"
    assert r.lines[2].annotations[0] == b"NIPA1 NIPA1_TR2.5"
    assert r.lines[3].annotations[0] == b"NIPA1 NIPA1_TR1.4"
    r.merge()
    assert len(r) == 2 and r.base_count() == 202
    assert not msg

    r, msg = regions_for("NON-CODING", "ensembl", "exon", annotate=True)
    assert len(r) == 2
    assert r.lines[0].annotations[0] == b"NON-CODING NON-CODING_TR1.6"


def test_transcripts(db):
    """NGSD_Test.cpp:336-470 — transcriptId/transcript/transcripts/
    transcriptsOverlapping/longestCodingTranscript."""
    assert db.transcript_id("NIPA1_TR2") == 4
    assert db.transcript_id("NIPA1_TR2_FAIL", False) == -1
    assert db.transcript_id("NIPA1_TR2.3", False) == 4

    t = db.transcript(4)
    assert t.name == "NIPA1_TR2"
    assert t.strand == "-"
    assert t.source == "ensembl"
    assert len(t.regions) == 4 and t.regions.base_count() == 224
    assert len(t.coding_regions()) == 2
    assert t.coding_regions().base_count() == 102

    ts = db.transcripts(1, "ccds", True)  # BRCA1, CCDS, coding
    assert len(ts) == 1
    assert (ts[0].gene, ts[0].name, ts[0].strand, ts[0].source) == \
        ("BRCA1", "BRCA1_TR1", "+", "ccds")
    assert len(ts[0].regions) == 4 and ts[0].regions.base_count() == 44
    assert len(ts[0].coding_regions()) == 4
    assert ts[0].coding_regions().base_count() == 44
    assert ts[0].is_gencode_basic
    assert not ts[0].is_ensembl_canonical
    assert ts[0].is_mane_select
    assert not ts[0].is_mane_plus_clinical

    ts = db.transcripts(3, "ensembl", True)  # NIPA1, Ensembl, coding
    assert len(ts) == 2
    assert ts[0].name == "NIPA1_TR2"
    assert len(ts[0].regions) == 4 and ts[0].regions.base_count() == 224
    assert len(ts[0].coding_regions()) == 2
    assert ts[0].coding_regions().base_count() == 102
    assert not ts[0].is_gencode_basic and ts[0].is_ensembl_canonical
    assert not ts[0].is_mane_select and not ts[0].is_mane_plus_clinical
    assert (ts[1].gene, ts[1].name, ts[1].strand) == ("NIPA1", "NIPA1_TR1", "-")
    assert len(ts[1].regions) == 2 and ts[1].regions.base_count() == 202
    assert len(ts[1].coding_regions()) == 2
    assert ts[1].coding_regions().base_count() == 202
    assert not ts[1].is_gencode_basic and not ts[1].is_ensembl_canonical
    assert ts[1].is_mane_select and ts[1].is_mane_plus_clinical

    ts = db.transcripts(3, "ensembl", False)
    assert len(ts) == 2 and ts[0].name == "NIPA1_TR2" and ts[1].name == "NIPA1_TR1"

    assert len(db.transcripts(4, "ensembl", True)) == 0
    ts = db.transcripts(4, "ensembl", False)
    assert len(ts) == 1 and ts[0].name == "NON-CODING_TR1"
    assert len(ts[0].regions) == 2 and ts[0].regions.base_count() == 202
    assert len(ts[0].coding_regions()) == 0

    from ngsbits_tpu.core.chromosome import Chromosome
    c15 = Chromosome("chr15")
    assert len(db.transcripts_overlapping(c15, 70, 70, 0)) == 0
    assert len(db.transcripts_overlapping(c15, 425, 425, 0)) == 0
    ts = db.transcripts_overlapping(c15, 95, 95, 0)
    assert len(ts) == 1 and ts[0].name == "NIPA1_TR2"
    ts = db.transcripts_overlapping(c15, 95, 95, 10)
    assert len(ts) == 2
    assert (ts[0].name, ts[1].name) == ("NIPA1_TR2", "NIPA1_TR1")

    assert db.longest_coding_transcript(4, "ensembl") is None
    t = db.longest_coding_transcript(1, "ccds")
    assert t is not None and t.name == "BRCA1_TR1"
    assert len(t.regions) == 4 and t.regions.base_count() == 44
    assert len(t.coding_regions()) == 4 and t.coding_regions().base_count() == 44
    t = db.longest_coding_transcript(3, "ensembl")
    assert t is not None and t.name == "NIPA1_TR1"
    assert len(t.regions) == 2 and t.regions.base_count() == 202


def test_best_and_relevant_transcripts(db):
    """NGSD_Test.cpp:460-570 — bestTranscript (plain + impact-resolved),
    relevantTranscripts, geneIdOfTranscript, transcriptToRegions."""
    from ngsbits_tpu.io.gsvar import VariantTranscript

    t = db.best_transcript(4)
    assert t is not None and t.name == "NON-CODING_TR1"
    t = db.best_transcript(3)
    assert t is not None and t.name == "NIPA1_TR1"
    t = db.best_transcript(652410)
    assert t is not None and t.name == "ENST00000341316"
    assert db.best_transcript(1) is None
    t = db.best_transcript(415153)
    assert t is not None and t.name == "EPRS_TR2"
    t = db.best_transcript(427667)
    assert t is not None and t.name == "MT-CO2_TR3"

    def vt(tid, impact):
        v = VariantTranscript(id=tid.encode())
        v.impact = impact
        return v

    t = db.best_transcript(415153, [vt("EPRS_TR2.1", "LOW"),
                                    vt("EPRS_TR3.1", "HIGH")])
    assert t is not None and t.name == "EPRS_TR3"

    t = db.best_transcript(427667, [vt("MT-CO2_TR3.1", "LOW"),
                                    vt("MT-CO2_TR4.1", "MODERATE"),
                                    vt("MT-CO2_TR2.1", "HIGH")])
    assert t is not None and t.name == "MT-CO2_TR4"

    t = db.best_transcript(427667, [vt("MT-CO2_TR3.1", "LOW"),
                                    vt("MT-CO2_TR4.1", "LOW"),
                                    vt("MT-CO2_TR2.1", "HIGH")])
    assert t is not None and t.name == "MT-CO2_TR3"

    ts = db.relevant_transcripts(3)
    assert [t.name for t in ts] == ["NIPA1_TR1", "NIPA1_TR2"]
    ts = db.relevant_transcripts(652410)
    assert [t.name for t in ts] == ["ENST00000341316", "ENST00000268704"]
    assert db.relevant_transcripts(1) == []

    assert db.gene_id_of_transcript("BRCA1_TR1") == 1
    assert db.gene_id_of_transcript("BRCA2_TR1") == 2
    assert db.gene_id_of_transcript("NIPA1_TR1") == 3
    assert db.gene_id_of_transcript("NIPA1_TR2") == 3
    assert db.gene_id_of_transcript("NON-CODING_TR1") == 4
    assert db.gene_id_of_transcript("HARSTEM_ROX", False) == -1

    r = db.transcript_to_regions("NIPA1_TR2", "gene")
    assert len(r) == 1
    assert r.lines[0].annotations[0] == b"NIPA1 NIPA1_TR2.5"
    assert r.base_count() == 341

    r = db.transcript_to_regions("NIPA1_TR2.5", "exon")
    assert len(r) == 2


def test_gene_info_and_phenotypes(db):
    """NGSD_Test.cpp:569-700 — geneInfo/setGeneInfo/approvedGeneNames/
    phenotypes + replacement/child/parent terms."""
    g = db.gene_info("BRCA1")
    assert g["symbol"] == "BRCA1"
    assert g["name"] == "Breast cancer associated gene 1"
    assert g["oe_syn"] == "0.77"
    assert g["oe_mis"] == "0.88"
    assert g["oe_lof"] == "0.99"
    assert g["inheritance"] == "AD"
    assert g["comments"] == ""

    g = db.gene_info("NIPA1")
    assert g["symbol"] == "NIPA1"
    assert (g["oe_syn"], g["oe_mis"], g["oe_lof"]) == ("n/a", "n/a", "n/a")
    assert g["inheritance"] == "n/a"
    assert g["comments"] == ""

    g["inheritance"] = "AD"
    g["comments"] = "comment"
    g["oe_syn"], g["oe_mis"], g["oe_lof"] = "0.11", "0.22", "0.33"
    db.set_gene_info(g)
    g = db.gene_info("NIPA1")
    assert g["symbol"] == "NIPA1"
    assert (g["oe_syn"], g["oe_mis"], g["oe_lof"]) == ("n/a", "n/a", "n/a")
    assert g["inheritance"] == "AD"
    assert g["comments"] == "comment"

    g["symbol"] = "NEWGENE"
    g["oe_syn"], g["oe_mis"], g["oe_lof"] = "0.11", "0.22", "0.33"
    db.set_gene_info(g)
    g = db.gene_info("NEWGENE")
    assert g["symbol"] == "NEWGENE"
    assert (g["oe_syn"], g["oe_mis"], g["oe_lof"]) == ("n/a", "n/a", "n/a")
    assert g["inheritance"] == "AD"
    assert g["comments"] == "comment"

    assert len(db.approved_gene_names()) == 20

    phenos = db.phenotypes(["aBNOrmality"])
    assert phenos == ["HP:0000118"]  # Phenotypic abnormality
    phenos = db.phenotypes(["sYNonym"])
    assert sorted(phenos) == ["HP:0012823", "HP:0040279"]

    hpo_id1 = db.phenotype_id_by_name("Frequency")
    hpo_id2 = db.phenotype_id_by_accession("HP:0040279")
    assert hpo_id1 == hpo_id2

    assert db.phenotype_replacement_by_accession("HP:0001240") == 12
    assert db.phenotype_replacement_by_accession("HP:0001242") == -1
    assert db.phenotype_replacement_by_name("Ataxia (old1)") == 12
    assert db.phenotype_replacement_by_name("Ataxia (old2)") == 12
    assert db.phenotype_replacement_by_name("Ataxia (old3)") == -1

    def accs(ids):
        return {db.get_value("SELECT hpo_id FROM hpo_term WHERE id=?",
                             params=(i,)) for i in ids}

    ids = db.phenotype_child_terms(db.phenotype_id_by_name("All"), True)
    assert len(ids) == 10
    ids = db.phenotype_child_terms(db.phenotype_id_by_name("All"), False)
    assert len(ids) == 4
    assert {"HP:0000005", "HP:0000118", "HP:0012823", "HP:0040279"} <= accs(ids)

    ids = db.phenotype_child_terms(
        db.phenotype_id_by_name("Mode of inheritance"), True)
    assert len(ids) == 6
    assert "HP:0001419" in accs(ids)
    ids = db.phenotype_child_terms(
        db.phenotype_id_by_name("Mode of inheritance"), False)
    assert len(ids) == 4
    assert "HP:0001419" not in accs(ids)

    assert db.phenotype_child_terms(
        db.phenotype_id_by_name("Mitochondrial inheritance"), True) == []
    assert db.phenotype_child_terms(
        db.phenotype_id_by_name("Mitochondrial inheritance"), False) == []

    assert db.phenotype_parent_terms(db.phenotype_id_by_name("All"), False) == []
    assert db.phenotype_parent_terms(db.phenotype_id_by_name("All"), True) == []
    ids = db.phenotype_parent_terms(
        db.phenotype_id_by_name("X-linked recessive inheritance"), False)
    assert len(ids) == 1 and accs(ids) == {"HP:0001417"}
    ids = db.phenotype_parent_terms(
        db.phenotype_id_by_name("X-linked recessive inheritance"), True)
    assert len(ids) == 3
    assert accs(ids) == {"HP:0001417", "HP:0000005", "HP:0000001"}


def test_diag_status_qc_and_classification(db):
    """NGSD_Test.cpp:702-780 — diagnostic status, sample disease data, QC
    values, variant comment + classification."""
    from ngsbits_tpu.ngsd.db import login

    login("ahmustm1")

    ps3 = db.processed_sample_id("NA12878_03")
    d = db.get_diagnostic_status(ps3)
    assert d["date"] == "2014-07-29 09:40:49"
    assert d["user"] == "Max Mustermann"
    assert d["status"] == "done"
    assert d["outcome"] == "no significant findings"
    assert d["comments"] == "free text"

    ps4 = db.processed_sample_id("NA12878_04")
    d = db.get_diagnostic_status(ps4)
    assert d["user"] == ""
    assert d["date"] == ""
    assert d["status"] == ""
    assert d["outcome"] == "n/a"
    assert d["comments"] == ""

    d["status"] = "done"
    d["outcome"] = "significant findings"
    d["comments"] = "comment1"
    db.set_diagnostic_status(ps4, d)
    d = db.get_diagnostic_status(ps4)
    assert d["user"] == "Max Mustermann"
    assert d["date"] != ""
    assert d["status"] == "done"
    assert d["outcome"] == "significant findings"
    assert d["comments"] == "comment1"

    d = db.get_diagnostic_status(ps3)
    d["comments"] = "comment2"
    db.set_diagnostic_status(ps3, d)
    d = db.get_diagnostic_status(ps3)
    assert d["date"] != ""
    assert d["user"] == "Max Mustermann"
    assert d["status"] == "done"
    assert d["outcome"] == "no significant findings"
    assert d["comments"] == "comment2"

    sample_id = db.sample_id("NA12878")
    db.set_sample_disease_data(sample_id, "Neoplasms", "Affected")
    sd = db.get_sample_data(sample_id)
    assert sd["disease_group"] == "Neoplasms"
    assert sd["disease_status"] == "Affected"

    qc = db.get_qc_data(ps3)  # {qcml_id: value-string}
    assert len(qc) == 2
    assert f"{float(qc['QC:2000027']):.2f}" == "95.96"  # target region 20x percentage
    assert f"{float(qc['QC:2000025']):.2f}" == "103.24"  # target region read depth

    values = sorted(db.get_qc_values("QC:2000025", ps3))
    assert values == [103.24, 132.24]

    from ngsbits_tpu.core.chromosome import Chromosome
    from ngsbits_tpu.io.gsvar import GSvarVariant

    variant = GSvarVariant(Chromosome("chr10"), 43613843, 43613843, b"G", b"T", [])
    assert db.comment(variant) == ""
    db.set_comment(variant, "var_comm1")
    assert db.comment(variant) == "var_comm1"

    info = db.get_classification(variant)
    assert info == {"classification": "", "comments": ""}
    info = {"classification": "2", "comments": "class_comm1"}
    db.set_classification(variant, None, info)
    info = db.get_classification(variant)
    assert info == {"classification": "2", "comments": "class_comm1"}


def test_classification_update_pubmed_and_jobs(db):
    """NGSD_Test.cpp:760-900 — classification update, PubMed IDs, analysis
    job info/queue/cancel/delete, job folders and GSvar paths."""
    from ngsbits_tpu.core.chromosome import Chromosome
    from ngsbits_tpu.io.gsvar import GSvarVariant
    from ngsbits_tpu.ngsd.db import login

    login("ahmustm1")

    variant = GSvarVariant(Chromosome("chr10"), 43613843, 43613843, b"G", b"T", [])
    db.set_classification(variant, None,
                          {"classification": "5", "comments": "class_comm2"})
    assert db.get_classification(variant) == \
        {"classification": "5", "comments": "class_comm2"}

    db.add_pubmed_id(199844, "12345678")
    db.add_pubmed_id(199844, "87654321")
    assert sorted(db.pubmed_ids("199844")) == ["12345678", "87654321"]
    db.add_pubmed_id(199844, "12345678")
    assert len(db.pubmed_ids("199844")) == 2

    assert db.analysis_info(-1, False) == {}

    job = db.analysis_info(1)
    assert job["type"] == "single sample"
    assert job["high_priority"] is False
    assert job["args"] == ""
    assert job["sge_id"] == "4711"
    assert job["sge_queue"] == "default_srv018"
    assert [s["name"] for s in job["samples"]] == ["NA12878_03"]
    assert job["samples"][0]["info"] == ""
    assert len(job["history"]) == 3
    assert (job["history"][0]["status"], job["history"][0]["user"]) == \
        ("queued", "ahmustm1")
    assert job["history"][0]["time"].replace("T", " ") == "2018-02-12 10:20:00"
    assert job["history"][1]["status"] == "started"
    assert job["history"][1]["user"] == ""
    assert job["history"][1]["time"].replace("T", " ") == "2018-02-12 10:20:45"
    assert job["history"][2]["status"] == "finished"
    assert job["history"][2]["time"].replace("T", " ") == "2018-02-12 10:34:09"
    assert "\n".join(job["history"][2]["output"]) == "warning: bla bla bla"

    db.queue_analysis("single sample", True, False, ["-steps ma,vc,an"],
                      [{"name": "NA12878_03", "info": "index"}])
    job = db.analysis_info(2)
    assert job["type"] == "single sample"
    assert job["high_priority"] is True
    assert job["args"] == "-steps ma,vc,an"
    assert job["sge_id"] == "" and job["sge_queue"] == ""
    assert job["samples"] == [{"name": "NA12878_03", "info": "index"}]
    assert len(job["history"]) == 1
    assert (job["history"][0]["status"], job["history"][0]["user"]) == \
        ("queued", "ahmustm1")

    assert db.cancel_analysis(2) is True
    job = db.analysis_info(2)
    assert [h["status"] for h in job["history"]] == ["queued", "cancel"]
    assert job["history"][1]["user"] == "ahmustm1"
    assert db.cancel_analysis(2) is False

    assert db.last_analysis_of(db.processed_sample_id("NA12878_03")) == 2

    assert db.delete_analysis(2) is True
    assert db.analysis_info(2, False) == {}
    assert db.delete_analysis(2) is False

    import os
    os.environ["NGSBITS_PROJECTS_FOLDER"] = "/mnt/projects"
    try:
        folder = db.analysis_job_folder(1)
        assert folder.endswith("test/KontrollDNACoriell/Sample_NA12878_03/")
        db.queue_analysis("somatic", False, False, [],
                          [{"name": "NA12345_01", "info": "tumor"},
                           {"name": "NA12878_03", "info": "normal"}])
        assert db.analysis_job_folder(3).endswith(
            "test/KontrollDNACoriell/Somatic_NA12345_01-NA12878_03/")
        db.queue_analysis("trio", False, False, [],
                          [{"name": "NA12878_03", "info": "child"},
                           {"name": "NA12123_04", "info": "father"},
                           {"name": "NA12345_01", "info": "mother"}])
        assert db.analysis_job_folder(4).endswith(
            "test/KontrollDNACoriell/Trio_NA12878_03_NA12123_04_NA12345_01/")
        db.queue_analysis("multi sample", False, False, [],
                          [{"name": "NA12123_04", "info": "affected"},
                           {"name": "NA12345_01", "info": "affected"}])
        assert db.analysis_job_folder(5).endswith(
            "test/KontrollDNACoriell/Multi_NA12123_04_NA12345_01/")

        assert db.analysis_job_gsvar_file(1).endswith(
            "test/KontrollDNACoriell/Sample_NA12878_03/NA12878_03.GSvar")
        assert db.analysis_job_gsvar_file(3).endswith(
            "test/KontrollDNACoriell/Somatic_NA12345_01-NA12878_03/"
            "NA12345_01-NA12878_03.GSvar")
        assert db.analysis_job_gsvar_file(4).endswith(
            "test/KontrollDNACoriell/Trio_NA12878_03_NA12123_04_NA12345_01/"
            "trio.GSvar")
        assert db.analysis_job_gsvar_file(5).endswith(
            "test/KontrollDNACoriell/Multi_NA12123_04_NA12345_01/multi.GSvar")
    finally:
        os.environ.pop("NGSBITS_PROJECTS_FOLDER", None)


def test_update_qc_variants_and_disease_info(db):
    """NGSD_Test.cpp:880-940 — updateQC, addVariant/variant, genotype counts
    (live + cached), sample disease info."""
    db.update_qc(f"{DIN}/qcml.obo", False)
    assert db.get_value("SELECT count(*) FROM qc_terms") == 43
    assert db.get_value("SELECT count(*) FROM qc_terms WHERE obsolete=0") == 39
    db.update_qc(f"{DIN}/qcml.obo", False)
    assert db.get_value("SELECT count(*) FROM qc_terms") == 43
    assert db.get_value("SELECT count(*) FROM qc_terms WHERE obsolete=0") == 39

    from ngsbits_tpu.core.chromosome import Chromosome
    from ngsbits_tpu.io.gsvar import GSvarFile, GSvarVariant

    vl = GSvarFile.from_file(
        "/root/reference/src/cppNGS-TEST/data_in/panel_vep.GSvar")
    assert len(vl) == 329
    var_id = db.add_variant(vl[0], vl)
    v = db.variant(var_id)
    assert (v.chr.num, v.start, v.end, v.ref, v.obs) == \
        (vl[0].chr.num, vl[0].start, vl[0].end, vl[0].ref, vl[0].obs)

    variant_id = db.variant_id(
        GSvarVariant(Chromosome("chr10"), 43613843, 43613843, b"G", b"T", []))
    assert db.genotype_counts(variant_id) == (1, 0, 0)  # hom

    variant_id = db.variant_id(
        GSvarVariant(Chromosome("chr17"), 7579472, 7579472, b"G", b"C", []))
    assert db.genotype_counts(variant_id) == (0, 1, 0)  # het

    assert db.genotype_counts_cached(variant_id) == (0, 0, 0)
    db.execute(f"UPDATE variant SET germline_het=17, germline_hom=7 WHERE id={variant_id}")
    db.commit()
    assert db.genotype_counts_cached(variant_id) == (7, 17, 0)

    sample_id = db.sample_id("NA12878")
    assert db.get_sample_disease_info(sample_id) == []
    db.set_sample_disease_info(sample_id, [
        {"disease_info": "HP:0001251", "type": "HPO term id", "user": "ahmustm1"},
        {"disease_info": "G11.9", "type": "ICD10 code", "user": "ahmustm1"}])
    info = db.get_sample_disease_info(sample_id)
    assert len(info) == 2
    assert info[0] == ("HPO term id", "HP:0001251")
    info = db.get_sample_disease_info(sample_id, "ICD10 code")
    assert info == [("ICD10 code", "G11.9")]


def test_processed_sample_search(db):
    """NGSD_Test.cpp:940-965 — processedSampleSearch column growth."""
    import os
    os.environ["NGSBITS_PROJECTS_FOLDER"] = "/mnt/projects"
    try:
        headers, rows = db.processed_sample_search({})
        assert len(rows) == 9
        assert len(headers) == 20

        headers, rows = db.processed_sample_search({"add_path": "SAMPLE_FOLDER"})
        assert len(rows) == 9 and len(headers) == 21

        headers, rows = db.processed_sample_search(
            {"add_path": "SAMPLE_FOLDER", "add_outcome": True})
        assert len(rows) == 9 and len(headers) == 23

        headers, rows = db.processed_sample_search(
            {"add_path": "SAMPLE_FOLDER", "add_outcome": True,
             "add_disease_details": True})
        assert len(rows) == 9 and len(headers) == 33

        headers, rows = db.processed_sample_search(
            {"add_path": "SAMPLE_FOLDER", "add_outcome": True,
             "add_disease_details": True, "add_qc": True})
        assert len(rows) == 9 and len(headers) == 74
        assert headers[33] == "sample_quality"
    finally:
        os.environ.pop("NGSBITS_PROJECTS_FOLDER", None)
