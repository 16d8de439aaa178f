"""NGSDImportClinvarAccessions test (synthetic mini-genome + chain file).

The reference tool (src/NGSDImportClinvarAccessions/main.cpp) has no
tools-TEST test (it needs production genomes/chain files); this test builds a
600 bp hg38 chr1, an hg19 chr1 shifted by 50 bp, an identity chain file and a
ClinVar submission log, and checks result/details updates end-to-end.
"""

import sqlite3

import pytest

from helpers import execute

HG38_CHR1 = ("ACGTACGGTTCAGCATTGGCCAATGCGTACCTAGGATCCAGTTCGATAGC" * 12)  # 600 bp


def _write_fasta(path, name, seq):
    with open(path, "w") as fh:
        fh.write(f">{name}\n")
        for i in range(0, len(seq), 60):
            fh.write(seq[i:i + 60] + "\n")
    with open(str(path) + ".fai", "w") as fh:
        fh.write(f"{name}\t{len(seq)}\t{len(name) + 2}\t60\t61\n")
    return str(path)


@pytest.fixture
def clinvar_env(tmp_path, monkeypatch):
    hg19 = "N" * 50 + HG38_CHR1
    hg38_fa = _write_fasta(tmp_path / "hg38.fa", "chr1", HG38_CHR1)
    hg19_fa = _write_fasta(tmp_path / "hg19.fa", "chr1", hg19)
    chain = tmp_path / "hg38_hg19.chain"
    # trailing dummy chain: ChainFileReader (bug-compatibly) never registers
    # the final chain of a file
    chain.write_text("chain 1000 chr1 600 + 0 600 chr1 650 + 50 650 1\n600\n\n"
                     "chain 1 chrUn 10 + 0 1 chrUn 10 + 0 1 2\n1\n\n")
    monkeypatch.setenv("NGSBITS_REFERENCE_GENOME", hg38_fa)
    monkeypatch.setenv("NGSBITS_REFERENCE_GENOME_HG19", hg19_fa)
    monkeypatch.setenv("NGSBITS_LIFTOVER_HG38_HG19", str(chain))
    return tmp_path


@pytest.fixture
def ngsd(tmp_path, monkeypatch):
    path = str(tmp_path / "ngsd_test.sqlite")
    monkeypatch.setenv("NGSBITS_NGSD_TEST", path)
    from ngsbits_tpu.ngsd import NGSD
    db = NGSD(test_db=True)
    db.init()
    yield db
    db.close()


def test_import_clinvar_accessions(clinvar_env, ngsd):
    db = ngsd
    db.run_mysql_file("/root/reference/src/tools-TEST/data_in/NGSDImportGenlab_init1.sql")

    # hg38 variants; hg19 position = hg38 position + 50
    snv_ref = HG38_CHR1[100]   # hg38 chr1:101, hg19 chr1:151
    snv_obs = "T" if snv_ref != "T" else "A"
    ins_prefix = HG38_CHR1[199]  # hg38 chr1:200, VCF hg19 chr1:250 prefix base
    db.execute("INSERT INTO variant (chr, start, end, ref, obs) VALUES ('chr1', 101, 101, ?, ?)",
               (snv_ref, snv_obs))
    db.execute("INSERT INTO variant (chr, start, end, ref, obs) VALUES ('chr1', 200, 200, '-', 'TT')")
    db.execute("INSERT INTO variant (chr, start, end, ref, obs) VALUES ('chr1', 301, 301, ?, 'C')",
               (HG38_CHR1[300],))
    db.execute("INSERT INTO variant_publication (sample_id, variant_id, variant_table, db, class, "
               "details, user_id, result) VALUES "
               "(1, 1, 'variant', 'ClinVar', '5', 'variant_id=1', 1, NULL),"
               "(1, 2, 'variant', 'ClinVar', '4', 'variant_id=2', 1, NULL),"
               "(1, 3, 'variant', 'ClinVar', '3', 'variant_id=3', 1, NULL),"
               "(2, 1, 'variant', 'LOVD', '5', 'variant_id=1', 1, NULL),"
               "(2, 1, 'variant', 'ClinVar', '5', 'variant_id=1', 1, 'processed;SCV000000001')")
    db.commit()

    log = clinvar_env / "SUB99001_submitter_report_B.txt"
    desc = ('<SequenceLocation Assembly="GRCh37" Chr="1" alternateAllele="{obs}" '
            'referenceAllele="{ref}" start="{pos}"/>')
    lines = [
        "#Submission was processed",
        "#Your_variant_id\tVariantID\tAlleleID\tYour_record_id\tSCV\tRCV\tYour_variant_description",
        "\t".join(["var1", "12345", "54321", "rec1", "SCV000111222.2", "RCV1",
                   desc.format(obs=snv_obs, ref=snv_ref, pos=151)]),
        "\t".join(["var2", "12346", "54322", "rec2", "SCV000111333.1", "RCV2",
                   desc.format(obs=ins_prefix + "TT", ref=ins_prefix, pos=250)]),
    ]
    log.write_text("\n".join(lines) + "\n")

    assert execute("NGSDImportClinvarAccessions", ["-test", "-in", log]) == 0

    rows = db.get_rows("SELECT id, result, details FROM variant_publication ORDER BY id")
    assert rows[0] == (1, "processed;SCV000111222", "submission_id=SUB99001;variant_id=1")
    assert rows[1] == (2, "processed;SCV000111333", "submission_id=SUB99001;variant_id=2")
    # no log entry for variant 3 -> untouched
    assert rows[2] == (3, None, "variant_id=3")
    # non-ClinVar and already-processed rows untouched
    assert rows[3] == (4, None, "variant_id=1")
    assert rows[4] == (5, "processed;SCV000000001", "variant_id=1")


def test_import_clinvar_accessions_missing_column(clinvar_env, ngsd):
    log = clinvar_env / "SUB99002_report.txt"
    log.write_text("#Your_variant_id\tVariantID\tSCV\n")
    assert execute("NGSDImportClinvarAccessions", ["-test", "-in", log]) == 1
