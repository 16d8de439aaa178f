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


@pytest.fixture
def ngsd_with_hgnc(ngsd):
    din = "/root/reference/src/tools-TEST/data_in"
    ngsd.run_mysql_file(f"{din}/NGSDImportHGNC_init.sql")
    assert execute("NGSDImportHGNC", [
        "-test", "-in", f"{din}/NGSDImportHGNC_in1.txt",
        "-ensembl", f"{din}/NGSDImportEnsembl_in.gff3"]) == 0
    return ngsd


def test_ngsd_import_hgnc(ngsd_with_hgnc):
    # assertions from NGSDImportHGNC_Test.cpp
    db = ngsd_with_hgnc
    assert db.get_value("SELECT count(*) FROM gene") == 8
    assert db.get_value("SELECT count(*) FROM gene_alias") == 39
    for sym, ncbi in (("TP53", 7157), ("CA8", 767), ("BRCA1", 672), ("BRCA2", 675)):
        assert db.get_value(f"SELECT ncbi_id FROM gene WHERE symbol='{sym}'") == ncbi
    gid = db.get_value("SELECT id FROM gene WHERE symbol='TP53'")
    assert db.previous_symbols(gid) == []
    assert db.synonymous_symbols(gid) == ["LFS1", "P53"]
    assert db.get_value("SELECT name FROM gene WHERE symbol='TP53'") == "tumor protein p53"
    assert db.get_value("SELECT type FROM gene WHERE symbol='TP53'") == "protein-coding gene"
    gid = db.get_value("SELECT id FROM gene WHERE symbol='CA8'")
    assert db.previous_symbols(gid) == ["CALS"]
    assert db.synonymous_symbols(gid) == ["CARP"]
    assert sorted(db.get_values("SELECT symbol FROM geneinfo_germline")) == ["BRCA1", "BRCA2"]
    assert sorted(db.get_values("SELECT symbol FROM somatic_gene_role")) == ["BRCA1", "BRCA2"]
    rows = db.get_rows("SELECT spg.symbol, sp.name FROM somatic_pathway_gene spg, somatic_pathway sp "
                       "WHERE sp.id=spg.pathway_id ORDER BY spg.symbol ASC, sp.name ASC")
    # MySQL ci collation sorts 'alternative' before 'DNA' (reference test order)
    assert rows == [("BRCA1", "DNA Damage Repair"), ("BRCA2", "alternative pathway"),
                    ("BRCA2", "DNA Damage Repair")]
    assert db.get_value("SELECT version FROM db_import_info WHERE name='HGNC'") == "NGSDImportHGNC_in1.txt"


@pytest.mark.parametrize("extra,golden", [
    ([], "GenesToApproved_out1.txt"),
    (["-report_ambiguous"], "GenesToApproved_out2.txt"),
])
def test_genes_to_approved(ngsd_with_hgnc, tmp_path, ref_data_in, ref_data_out, extra, golden):
    from helpers import compare_files
    out = tmp_path / "out.txt"
    assert execute("GenesToApproved", ["-test", "-in", ref_data_in / "GenesToApproved_in1.txt",
                                       "-out", out] + extra) == 0
    compare_files(out, ref_data_out / golden)


@pytest.fixture
def ngsd_with_transcripts(ngsd):
    din = "/root/reference/src/tools-TEST/data_in"
    ngsd.run_mysql_file(f"{din}/NGSDImportEnsembl_init.sql")
    assert execute("NGSDImportEnsembl", ["-test", "-in", f"{din}/NGSDImportEnsembl_in.gff3"]) == 0
    return ngsd


def test_ngsd_import_ensembl(ngsd_with_transcripts):
    # assertions from NGSDImportEnsembl_Test.cpp (default_parameters)
    db = ngsd_with_transcripts
    assert db.get_value("SELECT count(*) FROM gene_transcript") == 14
    assert db.get_value("SELECT count(*) FROM gene_transcript WHERE source='ensembl'") == 10
    assert db.get_value("SELECT count(*) FROM gene_transcript WHERE source='ccds'") == 4
    assert db.get_value("SELECT count(*) FROM gene_transcript WHERE start_coding IS NULL AND end_coding IS NULL") == 3
    assert db.get_value("SELECT biotype FROM gene_transcript WHERE name='ENST00000456328'") == "processed transcript"
    assert db.get_value("SELECT biotype FROM gene_transcript WHERE name='ENST00000306125'") == "protein coding"
    assert db.get_value("SELECT count(ge.start) FROM gene_exon ge, gene_transcript gt, gene g "
                        "WHERE g.id=gt.gene_id AND ge.transcript_id=gt.id AND g.symbol='DDX11L1'") == 9
    assert db.get_value("SELECT count(ge.start) FROM gene_exon ge, gene_transcript gt "
                        "WHERE ge.transcript_id=gt.id AND gt.name='CCDS9344'") == 26
    assert db.get_value("SELECT version FROM db_import_info WHERE name='Ensembl'") == "NGSDImportEnsembl_in.gff3"


def test_ngsd_import_ensembl_pseudogenes(ngsd):
    # NGSDImportEnsembl_Test.cpp (with_pseudogenes + duplicates)
    din = "/root/reference/src/tools-TEST/data_in"
    ngsd.run_mysql_file(f"{din}/NGSDImportEnsembl_init.sql")
    assert execute("NGSDImportEnsembl", [
        "-test", "-in", f"{din}/NGSDImportEnsembl_in.gff3",
        "-pseudogenes", f"{din}/NGSDImportEnsembl_in_pseudogenes.txt",
        f"{din}/NGSDImportEnsembl_in_pseudogenes.txt"]) == 0
    db = ngsd
    assert db.get_value("SELECT COUNT(*) FROM gene_pseudogene_relation") == 2
    pid = db.get_value("SELECT id FROM gene WHERE symbol='ABCD1'")
    pgid = db.get_value(f"SELECT pseudogene_gene_id FROM gene_pseudogene_relation WHERE parent_gene_id={pid}")
    assert db.gene_symbol(pgid) == "ABCD1P2"
    pid = db.get_value("SELECT id FROM gene WHERE symbol='AARS1'")
    assert db.get_value(f"SELECT gene_name FROM gene_pseudogene_relation WHERE parent_gene_id={pid}") == "ENSG00000249038;RP11-149A7"


def _init_from(ngsd, name):
    ngsd.run_mysql_file(f"/root/reference/src/tools-TEST/data_in/{name}")
    return ngsd


@pytest.mark.parametrize("args,golden", [
    (["-source", "ensembl", "-mode", "gene"], "GenesToBed_out1.bed"),
    (["-source", "ensembl", "-mode", "exon"], "GenesToBed_out2.bed"),
    (["-source", "ccds", "-mode", "gene", "-anno"], "GenesToBed_out3.bed"),
    (["-source", "ccds", "-mode", "exon", "-anno"], "GenesToBed_out4.bed"),
])
def test_genes_to_bed(ngsd, tmp_path, ref_data_in, ref_data_out, args, golden):
    from helpers import compare_files, read_lines
    _init_from(ngsd, "GenesToBed_init.sql")
    out = tmp_path / "out.bed"
    assert execute("GenesToBed", ["-test", "-in", ref_data_in / "GenesToBed_in1.txt",
                                  "-out", out] + args) == 0
    if golden == "GenesToBed_out4.bed":
        # the reference golden's order of equal-coordinate lines comes from
        # libstdc++'s unstable std::sort — compare as a multiset
        assert sorted(read_lines(out)) == sorted(read_lines(ref_data_out / golden))
    else:
        compare_files(out, ref_data_out / golden)


@pytest.mark.parametrize("args,golden", [
    (["-mode", "best"], "GenesToTranscripts_out1.tsv"),
    (["-version", "-mode", "best"], "GenesToTranscripts_out2.tsv"),
    (["-mode", "relevant"], "GenesToTranscripts_out3.tsv"),
    (["-mode", "all"], "GenesToTranscripts_out4.tsv"),
    (["-mode", "mane_select"], "GenesToTranscripts_out5.tsv"),
])
def test_genes_to_transcripts(ngsd, tmp_path, ref_data_in, ref_data_out, args, golden):
    from helpers import compare_files
    _init_from(ngsd, "GenesToTranscripts_init.sql")
    out = tmp_path / "out.tsv"
    assert execute("GenesToTranscripts", ["-test", "-in", ref_data_in / "GenesToTranscripts_in1.txt",
                                          "-out", out] + args) == 0
    compare_files(out, ref_data_out / golden)


@pytest.mark.parametrize("mode,golden", [("gene", "TranscriptsToBed_out1.bed"),
                                         ("exon", "TranscriptsToBed_out2.bed")])
def test_transcripts_to_bed(ngsd, tmp_path, ref_data_in, ref_data_out, mode, golden):
    from helpers import compare_files
    _init_from(ngsd, "TranscriptsToBed_init.sql")
    out = tmp_path / "out.bed"
    assert execute("TranscriptsToBed", ["-test", "-in", ref_data_in / "TranscriptsToBed_in1.txt",
                                        "-out", out, "-mode", mode]) == 0
    compare_files(out, ref_data_out / golden)


def test_transcript_to_protein(ngsd, tmp_path, capsys):
    # synthetic mini-genome: gene with 2 coding exons on '+' strand encoding
    # M-K-F-* and a '-'-strand copy of the reverse complement
    ngsd.run_mysql_script("""
INSERT INTO gene VALUES (NULL, 1, 'GENEA', 'gene A', 'protein-coding gene', NULL, NULL);
INSERT INTO gene_transcript VALUES (NULL, 1, 'ENST00000000001', 1, 'ensembl', '1', 11, 22, '+', 'protein coding', 1, 0, 0, 0, 0);
INSERT INTO gene_exon (transcript_id, start, end) VALUES (1, 5, 16), (1, 20, 30);
INSERT INTO gene_transcript VALUES (NULL, 1, 'ENST00000000002', 1, 'ensembl', '1', 11, 22, '+', 'lncRNA', 1, 0, 0, 0, 0);
INSERT INTO gene_exon (transcript_id, start, end) VALUES (2, 5, 30);
""")
    # coding: 11-16 (ATGAAA) + 20-22 (TTT) then TAA stop needs 12 coding bases:
    # use coding 11..22 -> exon1 11-16 ATGAAA, exon2 20-22 TTT; no stop -> protein MKF
    seq = "N" * 10 + "ATGAAA" + "NNN" + "TTTTAANNNN" + "N" * 10
    ref = tmp_path / "g.fa"
    ref.write_text(">chr1\n" + seq + "\n")
    (tmp_path / "g.fa.fai").write_text(f"chr1\t{len(seq)}\t6\t{len(seq)}\t{len(seq)+1}\n")
    infile = tmp_path / "in.txt"
    infile.write_text("ENST00000000001\nENST00000000002\nENST9\n")
    out = tmp_path / "out.tsv"
    assert execute("TranscriptToProtein", ["-test", "-in", infile, "-out", out, "-ref", ref]) == 0
    assert open(out).read() == "ENST00000000001\tMKF\n"
    err = capsys.readouterr().err
    assert "not protein coding" in err and "no matching transcript" in err


def test_ngsd_import_omim(ngsd_with_hgnc):
    # NGSDImportOMIM_Test.cpp assertions
    din = "/root/reference/src/tools-TEST/data_in"
    assert execute("NGSDImportOMIM", ["-test", "-gene", f"{din}/NGSDImportOMIM_mim2gene.txt",
                                      "-morbid", f"{din}/NGSDImportOMIM_morbidmap.txt"]) == 0
    db = ngsd_with_hgnc
    assert db.get_value("SELECT count(*) FROM omim_gene") == 3
    assert db.get_value("SELECT count(*) FROM omim_phenotype") == 5
    for gene, n in (("ALDH2", 4), ("ALDH1B1", 0), ("ACAT2", 1)):
        assert db.get_value("SELECT count(*) FROM omim_phenotype op, omim_gene og "
                            f"WHERE op.omim_gene_id=og.id AND og.gene='{gene}'") == n
    assert db.get_value("SELECT version FROM db_import_info WHERE name='OMIM'") == "2018-11-15"


def test_ngsd_import_orpha(ngsd):
    din = "/root/reference/src/tools-TEST/data_in"
    _init_from(ngsd, "NGSDImportORPHA_init.sql")
    assert execute("NGSDImportORPHA", ["-test", "-terms", f"{din}/NGSDImportORPHA_terms.xml",
                                       "-genes", f"{din}/NGSDImportORPHA_genes.xml"]) == 0
    assert ngsd.get_value("SELECT count(*) FROM disease_term") == 3
    assert ngsd.get_value("SELECT count(*) FROM disease_gene") == 4


def test_ngsd_import_gene_info(ngsd):
    din = "/root/reference/src/tools-TEST/data_in"
    _init_from(ngsd, "NGSDImportGeneInfo_init.sql")
    assert execute("NGSDImportGeneInfo", [
        "-test", "-constraint", f"{din}/NGSDImportGeneInfo_gnomad.v4.1.1.constraint_metrics.tsv"]) == 0
    for gene, syn, mis, lof, pli, inh in (
            ("BRCA1", 0.88, 0.91, 0.81, 0.00, "AD"),
            ("BRCA2", 0.96, 1.00, 0.73, 0.00, "AD"),
            ("OR4F5", 0.28, 0.27, 0.17, 0.72, "AR"),
            ("WDR45", 0.83, 0.56, 0.07, 1.00, "n/a")):
        gi = ngsd.gene_info(gene)
        assert float(gi["oe_syn"]) == syn, gene
        assert float(gi["oe_mis"]) == mis, gene
        assert float(gi["oe_lof"]) == lof, gene
        assert float(gi["pli"]) == pli, gene
        assert gi["inheritance"] == inh, gene
    assert ngsd.get_value("SELECT version FROM db_import_info WHERE name='gnomAD constraints'") == "4.1.1"


@pytest.fixture
def ngsd_hpo_base(ngsd):
    _init_from(ngsd, "NGSDImportHPO_init.sql")
    return ngsd


def test_ngsd_import_hpo_default(ngsd_hpo_base):
    din = "/root/reference/src/tools-TEST/data_in"
    assert execute("NGSDImportHPO", ["-test", "-obo", f"{din}/NGSDImportHPO_terms.obo",
                                     "-anno", f"{din}/NGSDImportHPO_anno.txt"]) == 0
    db = ngsd_hpo_base
    assert db.get_value("SELECT count(*) FROM hpo_term") == 15
    assert db.get_value("SELECT count(*) FROM hpo_term WHERE synonyms!=''") == 3
    assert db.get_value("SELECT count(*) FROM hpo_parent") == 11
    assert db.get_value("SELECT count(*) FROM hpo_genes") == 121
    assert db.get_value("SELECT count(*) FROM hpo_genes WHERE gene='PTEN_ALT'") == 0
    assert "BRCA1" in db.phenotype_to_genes(db.phenotype_id_by_name("Breast carcinoma"), False, False)
    assert "BRCA2" not in db.phenotype_to_genes(db.phenotype_id_by_name("Breast carcinoma"), False, False)
    assert "PTEN" in db.phenotype_to_genes(db.phenotype_id_by_name("Autosomal dominant inheritance"), False, False)
    assert db.get_value("SELECT version FROM db_import_info WHERE name='HPO'") == "2015-12-01"


def test_ngsd_import_hpo_with_omim(ngsd_hpo_base):
    din = "/root/reference/src/tools-TEST/data_in"
    assert execute("NGSDImportHPO", ["-test", "-obo", f"{din}/NGSDImportHPO_terms.obo",
                                     "-anno", f"{din}/NGSDImportHPO_anno.txt",
                                     "-omim", f"{din}/NGSDImportHPO_omim.txt"]) == 0
    db = ngsd_hpo_base
    assert db.get_value("SELECT count(*) FROM hpo_term") == 15
    assert db.get_value("SELECT count(*) FROM hpo_parent") == 11
    assert db.get_value("SELECT count(*) FROM hpo_genes") == 149
    assert "BRCA1" in db.phenotype_to_genes(db.phenotype_id_by_name("Breast carcinoma"), False, False)
    assert "BRCA2" in db.phenotype_to_genes(db.phenotype_id_by_name("Breast carcinoma"), False, False)
    for pat, n, expected in (("(1)", 4, "low"), ("(2)", 4, "low"), ("(3)", 61, "high"), ("(4)", 4, "high")):
        res = db.get_values(f"SELECT evidence FROM hpo_genes WHERE details LIKE '%{pat}%'")
        assert len(res) == n, (pat, len(res))
        assert all(r == expected for r in res), pat


def _hpo_run(extra):
    din = "/root/reference/src/tools-TEST/data_in"
    return execute("NGSDImportHPO", ["-test", "-obo", f"{din}/NGSDImportHPO_terms.obo",
                                     "-anno", f"{din}/NGSDImportHPO_anno.txt"] + extra)


def test_ngsd_import_hpo_clinvar(ngsd_hpo_base):
    din = "/root/reference/src/tools-TEST/data_in"
    assert _hpo_run(["-clinvar", f"{din}/NGSDImportHPO_clinvar.txt"]) == 0
    db = ngsd_hpo_base
    assert db.get_value("SELECT count(*) FROM hpo_genes") == 122
    bc = db.phenotype_to_genes(db.phenotype_id_by_name("Breast carcinoma"), False, False)
    assert "BRCA1" in bc and "BRCA2" in bc


def test_ngsd_import_hpo_hgmd(ngsd_hpo_base):
    din = "/root/reference/src/tools-TEST/data_in"
    assert _hpo_run(["-hgmd", f"{din}/NGSDImportHPO_hgmd.dump"]) == 0
    db = ngsd_hpo_base
    assert db.get_value("SELECT count(*) FROM hpo_genes") == 147
    bc = db.phenotype_to_genes(db.phenotype_id_by_name("Breast carcinoma"), False, False)
    assert "BARD1" in bc
    assert "WRN" in db.phenotype_to_genes(db.phenotype_id_by_name("Fibroadenoma of the breast"), False, False)


def test_ngsd_import_hpo_hpophen(ngsd_hpo_base):
    din = "/root/reference/src/tools-TEST/data_in"
    assert _hpo_run(["-hpophen", f"{din}/NGSDImportHPO_phenotype.hpoa"]) == 0
    db = ngsd_hpo_base
    assert db.get_value("SELECT count(*) FROM hpo_genes") == 129
    assert db.get_value("SELECT count(*) FROM hpo_genes WHERE details LIKE '%HPO%'") == 129
    assert db.get_value("SELECT count(*) FROM hpo_genes WHERE evidence !='n/a'") == 57
    for pat, n, expected in (("PCS", 2, "high"), ("TAS", 44, "medium"), ("IEA", 11, "low")):
        res = db.get_values(f"SELECT evidence FROM hpo_genes WHERE details LIKE '%{pat}%'")
        assert len(res) == n and all(r == expected for r in res), pat


def test_ngsd_import_hpo_gencc(ngsd_hpo_base):
    din = "/root/reference/src/tools-TEST/data_in"
    assert _hpo_run(["-gencc", f"{din}/NGSDImportHPO_gencc.tsv"]) == 0
    db = ngsd_hpo_base
    assert db.get_value("SELECT count(*) FROM hpo_genes") == 127
    assert db.get_value("SELECT count(*) FROM hpo_genes WHERE details LIKE '%GenCC%'") == 33
    for pat, n in (("Animal", 0), ("Limited", 0), ("Supportive", 0), ("Moderate", 2)):
        assert len(db.get_values(f"SELECT evidence FROM hpo_genes WHERE details LIKE '%{pat}%'")) == n, pat
    for pat, n in (("Strong", 16), ("Definitive", 15)):
        res = db.get_values(f"SELECT evidence FROM hpo_genes WHERE details LIKE '%{pat}%'")
        assert len(res) == n and all(r == "high" for r in res), pat


def test_ngsd_import_hpo_g2p(ngsd_hpo_base):
    din = "/root/reference/src/tools-TEST/data_in"
    assert _hpo_run(["-g2p", f"{din}/NGSDImportHPO_decipher1.csv"]) == 0
    db = ngsd_hpo_base
    assert db.get_value("SELECT count(*) FROM hpo_genes") == 130
    assert db.get_value("SELECT count(*) FROM hpo_genes WHERE details LIKE '%G2P%'") == 22
    res = db.get_values("SELECT evidence FROM hpo_genes WHERE details LIKE '%G2P, definitive,%'")
    assert len(res) == 21 and all(r == "high" for r in res)
    res = db.get_values("SELECT evidence FROM hpo_genes WHERE details LIKE '%G2P, strong,%'")
    assert len(res) == 1 and all(r == "high" for r in res)


def test_ngsd_import_hpo_all(ngsd_hpo_base):
    din = "/root/reference/src/tools-TEST/data_in"
    assert _hpo_run(["-omim", f"{din}/NGSDImportHPO_omim.txt",
                     "-clinvar", f"{din}/NGSDImportHPO_clinvar.txt",
                     "-hgmd", f"{din}/NGSDImportHPO_hgmd.dump",
                     "-hpophen", f"{din}/NGSDImportHPO_phenotype.hpoa",
                     "-gencc", f"{din}/NGSDImportHPO_gencc.tsv",
                     "-g2p", f"{din}/NGSDImportHPO_decipher1.csv"]) == 0
    assert ngsd_hpo_base.get_value("SELECT count(*) FROM hpo_genes") == 180


@pytest.mark.parametrize("args,golden", [
    ([], "PhenotypesToGenes_out1.txt"),
    (["-source", "HPO"], "PhenotypesToGenes_out2.txt"),
    (["-evidence", "high"], "PhenotypesToGenes_out3.txt"),
    (["-source", "GenCC", "-evidence", "medium"], "PhenotypesToGenes_out4.txt"),
])
def test_phenotypes_to_genes(ngsd, tmp_path, ref_data_in, ref_data_out, args, golden):
    from helpers import compare_files
    _init_from(ngsd, "PhenotypesToGenes_init.sql")
    out = tmp_path / "out.txt"
    assert execute("PhenotypesToGenes", ["-test", "-in", str(ref_data_in / "PhenotypesToGenes_in1.txt"),
                                         "-ignore_invalid", "-out", out] + args) == 0
    compare_files(out, ref_data_out / golden)


@pytest.mark.parametrize("acc,golden", [("HP:0001417", "PhenotypeSubtree_out1.tsv"),
                                        ("HP:0000005", "PhenotypeSubtree_out2.tsv")])
def test_phenotype_subtree(ngsd, tmp_path, ref_data_out, acc, golden):
    from helpers import compare_files
    _init_from(ngsd, "PhenotypeSubtree_init.sql")
    out = tmp_path / "out.tsv"
    assert execute("PhenotypeSubtree", ["-test", "-in", acc, "-out", out]) == 0
    compare_files(out, ref_data_out / golden)


def test_ngsd_import_oncotree(ngsd):
    din = "/root/reference/src/tools-TEST/data_in"
    assert execute("NGSDImportOncotree", ["-test", "-tree", f"{din}/NGSDImportOncotree_in1.json"]) == 0
    assert ngsd.get_value("SELECT count(*) FROM oncotree_term") == 898
    assert ngsd.get_value("SELECT count(*) FROM oncotree_parent") == 897
    assert ngsd.get_value("SELECT count(*) FROM oncotree_obsolete") == 36
    assert ngsd.get_value("SELECT version FROM db_import_info WHERE name='oncotree'") == "NGSDImportOncotree_in1.json"


def test_ngsd_import_cspec(ngsd):
    din = "/root/reference/src/tools-TEST/data_in"
    ngsd.run_mysql_script("INSERT INTO `gene` (`id`, `hgnc_id`, `symbol`, `name`, `type`, `ensembl_id`, `ncbi_id`) VALUES (669634, 9588, 'PTEN', 'phosphatase and tensin homolog', 'protein-coding gene', 'ENSG00000171862', 5728);"
                          "INSERT INTO `gene` (`id`, `hgnc_id`, `symbol`, `name`, `type`, `ensembl_id`, `ncbi_id`) VALUES (664242, 7577, 'MYH7', 'myosin heavy chain 7', 'protein-coding gene', 'ENSG00000092054', 4625);")
    assert execute("NGSDImportCSpec", ["-test", "-in", f"{din}/NGSDImportCSpec_in1.json"]) == 0
    genes = ngsd.get_values("SELECT gene FROM cspec_data")
    assert len(genes) == 2 and "PTEN" in genes and "MYH7" in genes
    assert ngsd.get_value("SELECT version FROM db_import_info WHERE name='CSpec'") == "2026-01-17"


@pytest.mark.parametrize("args,golden", [([], "NGSDExportGff_out1.gff3"),
                                         (["-genes"], "NGSDExportGff_out2.gff3")])
def test_ngsd_export_gff(ngsd, tmp_path, ref_data_out, args, golden):
    from helpers import compare_files
    _init_from(ngsd, "NGSDExportGff_init.sql")
    out = tmp_path / "out.gff3"
    assert execute("NGSDExportGff", ["-test", "-out", out] + args) == 0
    compare_files(out, ref_data_out / golden)


def test_ngsd_export_igv_gene_track(ngsd, tmp_path, ref_data_out):
    from helpers import read_lines
    _init_from(ngsd, "NGSDExportIgvGeneTrack_init.sql")
    out1 = tmp_path / "out1.txt"
    out2 = tmp_path / "out2.txt"
    assert execute("NGSDExportIgvGeneTrack", ["-test", "-out", out1, "-out_mane", out2]) == 0

    # the hg38 transcript-matches resource (downloaded in the reference build)
    # is absent here: normalize column 2 to its first transcript name
    def norm(path):
        rows = []
        for l in read_lines(path):
            f = l.split("\t")
            f[1] = f[1].split(", ")[0]
            rows.append("\t".join(f))
        return rows

    assert norm(out1) == norm(ref_data_out / "NGSDExportIgvGeneTrack_out1.txt")
    assert norm(out2) == norm(ref_data_out / "NGSDExportIgvGeneTrack_out2.txt")


def test_ngsd_export_spliceai(ngsd, tmp_path, ref_data_out):
    from helpers import compare_files
    _init_from(ngsd, "NGSDExportSpliceAI_init.sql")
    out = tmp_path / "out.txt"
    assert execute("NGSDExportSpliceAI", ["-test", "-out", out]) == 0
    compare_files(out, ref_data_out / "NGSDExportSpliceAI_out1.txt")


@pytest.mark.parametrize("args,golden", [([], "NGSDExportGenes_out1.tsv"),
                                         (["-add_disease_info"], "NGSDExportGenes_out2.tsv")])
def test_ngsd_export_genes(ngsd, tmp_path, ref_data_out, args, golden):
    from helpers import compare_files
    _init_from(ngsd, "NGSDExportGenes_init.sql")
    out = tmp_path / "out.tsv"
    assert execute("NGSDExportGenes", ["-test", "-out", out] + args) == 0
    compare_files(out, ref_data_out / golden)


@pytest.mark.parametrize("args,golden", [
    ([], "NGSDExportSamples_out1.tsv"),
    (["-add_disease_details", "-add_outcome", "-add_qc", "-add_report_config", "-add_comments",
      "-add_normal_sample", "-add_dates", "-add_call_details", "-add_lab_columns",
      "-add_study_column"], "NGSDExportSamples_out2.tsv"),
    (["-sample", "NA12878", "-species", "human", "-disease_group", "Neoplasms",
      "-disease_status", "Affected", "-tissue", "blood", "-no_bad_samples", "-no_tumor",
      "-no_ffpe", "-project", "Second_project", "-project_type", "diagnostic",
      "-system", "ssHAEv5", "-system_type", "WGS", "-run", "run2", "-no_bad_runs",
      "-run_device", "Morpheus", "-sender", "Klaus-Erhard", "-study", "SomeStudy",
      "-no_archived_projects", "-phenotypes", "HP:0000003;HP:0002862", "-ancestry", "EUR"],
     "NGSDExportSamples_out3.tsv"),
    (["-no_normal"], "NGSDExportSamples_out4.tsv"),
    (["-ps_override", "NA12880_01;NA12878_01"], "NGSDExportSamples_out5.tsv"),
])
def test_ngsd_export_samples(ngsd, tmp_path, ref_data_out, args, golden):
    from helpers import compare_files
    _init_from(ngsd, "NGSDExportSamples_init.sql")
    out = tmp_path / "out.tsv"
    assert execute("NGSDExportSamples", ["-test", "-out", out] + args) == 0
    compare_files(out, ref_data_out / golden)


@pytest.mark.parametrize("args,golden", [
    (["-mode", "SAME_SAMPLE"], "NGSDSameSample_out1.tsv"),
    (["-mode", "SAME_PATIENT"], "NGSDSameSample_out2.tsv"),
    (["-sample_type", "DNA", "-include_bad"], "NGSDSameSample_out3.tsv"),
    (["-system_type", "WGS,lrGS"], "NGSDSameSample_out4.tsv"),
    (["-system", "SQK-114"], "NGSDSameSample_out5.tsv"),
])
def test_ngsd_same_sample(ngsd, tmp_path, ref_data_out, args, golden):
    from helpers import compare_files
    _init_from(ngsd, "NGSDSameSample_init.sql")
    out = tmp_path / "out.tsv"
    assert execute("NGSDSameSample", ["-test", "-ps", "NA12880_01", "-out", out] + args) == 0
    compare_files(out, ref_data_out / golden)


def test_ngsd_sample_users(ngsd, tmp_path, ref_data_in, ref_data_out):
    from helpers import compare_files
    _init_from(ngsd, "NGSDSampleUsers_init.sql")
    out = tmp_path / "out.tsv"
    assert execute("NGSDSampleUsers", ["-test", "-in", ref_data_in / "NGSDSampleUsers_in1.tsv",
                                       "-out", out]) == 0
    compare_files(out, ref_data_out / "NGSDSampleUsers_out1.tsv")


@pytest.mark.parametrize("files,expected", [((1, 2, 3, 4), 46), ((5, 6, 7, 8), 50)])
def test_ngsd_import_sample_qc(ngsd, files, expected):
    din = "/root/reference/src/tools-TEST/data_in"
    _init_from(ngsd, "NGSDImportSampleQC_init.sql")
    assert execute("NGSDImportSampleQC", ["-test", "-ps", "NA12878_45", "-files"]
                   + [f"{din}/NGSDImportSampleQC_in{i}.qcML" for i in files] + ["-force"]) == 0
    assert ngsd.get_value("SELECT count(*) FROM processed_sample_qc") == expected


@pytest.mark.parametrize("args,infile,golden", [
    ([], "BedAnnotateGenes_in1.bed", "BedAnnotateGenes_out1.bed"),
    (["-extend", "25"], "BedAnnotateGenes_in2.bed", "BedAnnotateGenes_out2.bed"),
    (["-clear"], "BedAnnotateGenes_in2.bed", "BedAnnotateGenes_out3.bed"),
])
def test_bed_annotate_genes(ngsd, tmp_path, ref_data_in, ref_data_out, args, infile, golden):
    from helpers import compare_files
    _init_from(ngsd, "BedAnnotateGenes_init.sql")
    out = tmp_path / "out.bed"
    assert execute("BedAnnotateGenes", ["-test", "-in", ref_data_in / infile, "-out", out] + args) == 0
    compare_files(out, ref_data_out / golden)


@pytest.mark.parametrize("source,golden", [("ccds", "BedGeneOverlap_out1.tsv"),
                                           ("ensembl", "BedGeneOverlap_out2.tsv")])
def test_bed_gene_overlap(ngsd, tmp_path, ref_data_in, ref_data_out, source, golden):
    from helpers import compare_files
    _init_from(ngsd, "BedGeneOverlap_init.sql")
    out = tmp_path / "out.tsv"
    assert execute("BedGeneOverlap", ["-test", "-source", source,
                                      "-in", ref_data_in / "BedGeneOverlap_in1.bed", "-out", out]) == 0
    compare_files(out, ref_data_out / golden)


@pytest.mark.parametrize("args,golden", [([], "CnvGeneAnnotation_out1.tsv"),
                                         (["-add_simple_gene_names"], "CnvGeneAnnotation_out2.tsv")])
def test_cnv_gene_annotation(ngsd, tmp_path, ref_data_in, ref_data_out, args, golden):
    from helpers import compare_files
    _init_from(ngsd, "CnvGeneAnnotation_init.sql")
    out = tmp_path / "out.tsv"
    assert execute("CnvGeneAnnotation", ["-test", "-in", ref_data_in / "CnvGeneAnnotation_in.tsv",
                                         "-out", out] + args) == 0
    compare_files(out, ref_data_out / golden)


def test_ngsd_annotate_sv(ngsd, tmp_path, ref_data_in, ref_data_out):
    from helpers import compare_files
    _init_from(ngsd, "NGSDAnnotateSV_init.sql")
    out = tmp_path / "out.bedpe"
    assert execute("NGSDAnnotateSV", ["-test", "-in", ref_data_in / "NGSDAnnotateSV_in1.bedpe",
                                      "-out", out]) == 0
    compare_files(out, ref_data_out / "NGSDAnnotateSV_out1.bedpe")


def test_ngsd_annotate_cnv(ngsd, tmp_path, ref_data_in, ref_data_out):
    from helpers import compare_files
    _init_from(ngsd, "NGSDAnnotateCNV_init.sql")
    out = tmp_path / "out.tsv"
    assert execute("NGSDAnnotateCNV", ["-test", "-in", ref_data_in / "NGSDAnnotateCNV_in.tsv",
                                       "-out", out]) == 0
    compare_files(out, ref_data_out / "NGSDAnnotateCNV_out.tsv")
    # re-annotation of already-annotated file replaces the column
    out2 = tmp_path / "out2.tsv"
    assert execute("NGSDAnnotateCNV", ["-test", "-in", out, "-out", out2]) == 0
    compare_files(out2, ref_data_out / "NGSDAnnotateCNV_out.tsv")


@pytest.mark.parametrize("args,infile,golden", [
    ([], "BedpeGeneAnnotation_in1.bedpe", "BedpeGeneAnnotation_out1.bedpe"),
    (["-add_simple_gene_names"], "BedpeGeneAnnotation_in1.bedpe", "BedpeGeneAnnotation_out2.bedpe"),
    (["-add_simple_gene_names"], "BedpeGeneAnnotation_in2.bedpe", "BedpeGeneAnnotation_out2.bedpe"),
])
def test_bedpe_gene_annotation(ngsd, tmp_path, ref_data_in, ref_data_out, args, infile, golden):
    from helpers import compare_files
    _init_from(ngsd, "BedpeGeneAnnotation_init.sql")
    out = tmp_path / "out.bedpe"
    assert execute("BedpeGeneAnnotation", ["-test", "-in", ref_data_in / infile,
                                           "-out", out] + args) == 0
    compare_files(out, ref_data_out / golden)


def test_ngsd_import_expression_data(ngsd):
    din = "/root/reference/src/tools-TEST/data_in"
    _init_from(ngsd, "NGSDImportExpressionData_init1.sql")
    assert execute("NGSDImportExpressionData", ["-test", "-expression",
                                                f"{din}/NGSDImportExpressionData_in1_counts.tsv",
                                                "-ps", "RX123456_03", "-debug"]) == 0
    assert ngsd.get_value("SELECT count(*) FROM expression") == 7997
    # without -force the second import fails
    assert execute("NGSDImportExpressionData", ["-test", "-expression",
                                                f"{din}/NGSDImportExpressionData_in2_counts.tsv",
                                                "-ps", "RX123456_03", "-debug"]) == 1
    assert ngsd.get_value("SELECT count(*) FROM expression") == 7997
    assert execute("NGSDImportExpressionData", ["-test", "-force", "-expression",
                                                f"{din}/NGSDImportExpressionData_in2_counts.tsv",
                                                "-ps", "RX123456_03", "-debug"]) == 0
    assert ngsd.get_value("SELECT count(*) FROM expression") == 102


def test_ngsd_import_expression_exons(ngsd):
    din = "/root/reference/src/tools-TEST/data_in"
    _init_from(ngsd, "NGSDImportExpressionData_init2.sql")
    assert execute("NGSDImportExpressionData", ["-test", "-expression",
                                                f"{din}/NGSDImportExpressionData_in1_exon.tsv",
                                                "-ps", "RX123456_03", "-mode", "exons", "-debug"]) == 0
    assert ngsd.get_value("SELECT count(*) FROM expression_exon") == 71
    assert execute("NGSDImportExpressionData", ["-test", "-expression",
                                                f"{din}/NGSDImportExpressionData_in2_exon.tsv",
                                                "-ps", "RX123456_03", "-mode", "exons", "-debug"]) == 1
    assert execute("NGSDImportExpressionData", ["-test", "-force", "-expression",
                                                f"{din}/NGSDImportExpressionData_in2_exon.tsv",
                                                "-ps", "RX123456_03", "-mode", "exons", "-debug"]) == 0
    assert ngsd.get_value("SELECT count(*) FROM expression_exon") == 43


@pytest.mark.parametrize("strategy,golden", [
    ("RNA_COHORT_GERMLINE", "NGSDAnnotateGeneExpression_out1.GSvar"),
    ("RNA_COHORT_GERMLINE_PROJECT", "NGSDAnnotateGeneExpression_out2.GSvar"),
    ("RNA_COHORT_SOMATIC", "NGSDAnnotateGeneExpression_out3.GSvar"),
])
def test_ngsd_annotate_gene_expression(ngsd, tmp_path, ref_data_in, ref_data_out, strategy, golden):
    from helpers import compare_files
    _init_from(ngsd, "NGSDAnnotateGeneExpression_NGSD_init.sql")
    # the reference test imports 7 expression profiles before running
    for i in range(1, 8):
        assert execute("NGSDImportExpressionData", [
            "-test", "-expression", str(ref_data_in / f"NGSDAnnotateRNA_expr_in{i}.tsv"),
            "-ps", f"RX00{i}_01"]) == 0
    out = tmp_path / "out.GSvar"
    assert execute("NGSDAnnotateGeneExpression", [
        "-test", "-rna_ps", "RX001_01", "-cohort_strategy", strategy,
        "-in", ref_data_in / "NGSDAnnotateGeneExpression_in1.GSvar", "-out", out]) == 0
    compare_files(out, ref_data_out / golden)


def _import_rna_profiles(ref_data_in, prefix, mode="genes"):
    extra = [] if mode == "genes" else ["-mode", "exons"]
    for i in range(1, 9):
        assert execute("NGSDImportExpressionData", [
            "-test", "-expression", str(ref_data_in / f"{prefix}{i}.tsv"),
            "-ps", f"RX00{i}_01"] + extra) == 0


@pytest.mark.parametrize("extra,golden", [
    ([], "NGSDAnnotateRNA_expr_out1.tsv"),
    (["-cohort_strategy", "RNA_COHORT_GERMLINE_PROJECT"], "NGSDAnnotateRNA_expr_out2.tsv"),
    (["-cohort_strategy", "RNA_COHORT_SOMATIC"], "NGSDAnnotateRNA_expr_out3.tsv"),
    (["-update_genes"], "NGSDAnnotateRNA_expr_out6.tsv"),
])
def test_ngsd_annotate_rna_genes(ngsd, tmp_path, ref_data_in, ref_data_out, extra, golden):
    from helpers import compare_files
    _init_from(ngsd, "NGSDAnnotateRNA_NGSD_init.sql")
    _import_rna_profiles(ref_data_in, "NGSDAnnotateRNA_expr_in")
    out = tmp_path / "out.tsv"
    args = ["-test", "-ps", "RX001_01",
            "-in", ref_data_in / "NGSDAnnotateRNA_expr_in1.tsv", "-out", out] + extra
    if golden.endswith("out1.tsv"):
        args += ["-corr", tmp_path / "corr.txt"]
    assert execute("NGSDAnnotateRNA", args) == 0
    compare_files(out, ref_data_out / golden)
    if golden.endswith("out1.tsv"):
        compare_files(tmp_path / "corr.txt", ref_data_out / "NGSDAnnotateRNA_corr_out1.txt")


@pytest.mark.parametrize("extra,golden", [
    ([], "NGSDAnnotateRNA_expr_exon_out4.tsv"),
    (["-update_genes"], "NGSDAnnotateRNA_expr_exon_out7.tsv"),
])
def test_ngsd_annotate_rna_exons(ngsd, tmp_path, ref_data_in, ref_data_out, extra, golden):
    from helpers import compare_files
    _init_from(ngsd, "NGSDAnnotateRNA_NGSD_init.sql")
    _import_rna_profiles(ref_data_in, "NGSDAnnotateRNA_expr_exon_in", mode="exons")
    out = tmp_path / "out.tsv"
    assert execute("NGSDAnnotateRNA", [
        "-test", "-ps", "RX001_01", "-mode", "exons",
        "-in", ref_data_in / "NGSDAnnotateRNA_expr_exon_in1.tsv", "-out", out] + extra) == 0
    compare_files(out, ref_data_out / golden)


def test_ngsd_annotate_rna_hpa(ngsd, tmp_path, ref_data_in, ref_data_out):
    from helpers import compare_files, compare_files_delta
    _init_from(ngsd, "NGSDAnnotateRNA_NGSD_init.sql")
    _import_rna_profiles(ref_data_in, "NGSDAnnotateRNA_expr_in")
    out = tmp_path / "out5.tsv"
    assert execute("NGSDAnnotateRNA", [
        "-test", "-cohort_strategy", "RNA_COHORT_SOMATIC", "-ps", "RX001_01",
        "-in", ref_data_in / "NGSDAnnotateRNA_expr_in1.tsv",
        "-hpa_file", ref_data_in / "NGSDAnnotateRNA_in_hpa.tsv", "-out", out]) == 0
    compare_files(out, ref_data_out / "NGSDAnnotateRNA_expr_out5.tsv")
    # same annotation with the cohort provided as a file (delta compare per reference test)
    out8 = tmp_path / "out8.tsv"
    assert execute("NGSDAnnotateRNA", [
        "-test", "-cohort_strategy", "RNA_COHORT_SOMATIC", "-ps", "RX001_01",
        "-in", ref_data_in / "NGSDAnnotateRNA_expr_in1.tsv",
        "-hpa_file", ref_data_in / "NGSDAnnotateRNA_in_hpa.tsv",
        "-cohort_data", ref_data_in / "NGSDAnnotateRNA_expr_cohort_in1.tsv", "-out", out8]) == 0
    compare_files_delta(out8, ref_data_out / "NGSDAnnotateRNA_expr_out5.tsv", 0.01, sep="\t")


@pytest.mark.parametrize("extra,golden", [
    (["-genes"], "NGSDExtractRNACohort_cohort_out1.tsv"),
    (["-cohort_strategy", "RNA_COHORT_GERMLINE_PROJECT", "-genes"], "NGSDExtractRNACohort_cohort_out2.tsv"),
    (["-cohort_strategy", "RNA_COHORT_SOMATIC", "-genes"], "NGSDExtractRNACohort_cohort_out3.tsv"),
    (["-sample_expression", None, "-genes"], "NGSDExtractRNACohort_cohort_out4.tsv"),
    (["-only_samples"], "NGSDExtractRNACohort_cohort_out5.tsv"),
    (["-only_samples", "-cohort_strategy", "RNA_COHORT_SOMATIC"], "NGSDExtractRNACohort_cohort_out6.tsv"),
    (["-only_samples", "-cohort_strategy", "RNA_COHORT_SOMATIC", "-allowed_systems", "nebRNAU2_mrna2"],
     "NGSDExtractRNACohort_cohort_out7.tsv"),
])
def test_ngsd_extract_rna_cohort(ngsd, tmp_path, ref_data_in, ref_data_out, extra, golden):
    from helpers import compare_files
    _init_from(ngsd, "NGSDExtractRNACohort_NGSD_init.sql")
    _import_rna_profiles(ref_data_in, "NGSDExtractRNACohort_expr_in")
    if "-allowed_systems" in extra:
        # the reference test imports a 9th profile on the second system
        assert execute("NGSDImportExpressionData", [
            "-test", "-expression", str(ref_data_in / "NGSDExtractRNACohort_expr_in7.tsv"),
            "-ps", "RX009_01"]) == 0
    args = ["-test", "-ps", "RX001_01"]
    for a in extra:
        if a == "-genes":
            args += ["-genes", str(ref_data_in / "NGSDExtractRNACohort_genes.txt")]
        elif a is None:
            args.append(str(ref_data_in / "NGSDExtractRNACohort_expr_in1.tsv"))
        else:
            args.append(a)
    out = tmp_path / "out.tsv"
    assert execute("NGSDExtractRNACohort", args + ["-out", out]) == 0
    compare_files(out, ref_data_out / golden)


def test_ngsd_export_cnv_track(ngsd, tmp_path, ref_data_in, ref_data_out):
    from helpers import compare_files
    _init_from(ngsd, "NGSDExportCnvTrack_init.sql")
    out1 = tmp_path / "out1.igv"
    log1 = tmp_path / "out1.log"
    assert execute("NGSDExportCnvTrack", ["-test", "-system", "ssHAEv7",
                                          "-out", out1, "-stats", log1]) == 0
    compare_files(out1, ref_data_out / "NGSDExportCnvTrack_out1.igv")
    compare_files(log1, ref_data_out / "NGSDExportCnvTrack_out1.log")
    out2 = tmp_path / "out2.igv"
    log2 = tmp_path / "out2.log"
    assert execute("NGSDExportCnvTrack", ["-test", "-system", "ssHAEv7", "-out", out2,
                                          "-stats", log2, "-min_dp", "50", "-min_af", "0.51"]) == 0
    compare_files(out2, ref_data_out / "NGSDExportCnvTrack_out2.igv")
    compare_files(log2, ref_data_out / "NGSDExportCnvTrack_out2.log")


@pytest.mark.parametrize("threshold", [None, 3])
def test_ngsd_export_sv(ngsd, tmp_path, ref_data_in, ref_data_out, threshold):
    from helpers import compare_files
    _init_from(ngsd, "NGSDExportSV_init1.sql")
    outdir = tmp_path / "sv"
    outdir.mkdir()
    args = ["-test", "-out_folder", outdir]
    if threshold is not None:
        args += ["-common_sys_threshold", str(threshold)]
    assert execute("NGSDExportSV", args) == 0
    for name in ("sv_deletion.bedpe", "sv_duplication.bedpe", "sv_insertion.bedpe",
                 "sv_inversion.bedpe", "sv_translocation.bedpe"):
        compare_files(outdir / name, ref_data_out / "NGSDExportSV" / name,
                      strip_patterns=("##fileDate=",))
    compare_files(outdir / "sv_breakpoint_density.igv",
                  ref_data_out / "NGSDExportSV" / "sv_breakpoint_density.igv")
    if threshold is None:
        assert not (outdir / "sv_breakpoint_density_hpHBOCv5.igv").exists()
    else:
        compare_files(outdir / "sv_breakpoint_density_hpHBOCv5.igv",
                      ref_data_out / "NGSDExportSV" / "sv_breakpoint_density_hpHBOCv5.igv")


@pytest.fixture
def stub_hg38_from_goldens(tmp_path):
    """Sparse multi-chromosome FASTA with REF bases patched in from the
    NGSDExportAnnotationData golden VCFs (reference CI needs hg38; the only
    bases the tool reads are the REF/prefix bases present in the goldens)."""
    dout = "/root/reference/src/tools-TEST/data_out"
    ref = tmp_path / "hg38.fa"
    linebases, linewidth = 60, 61
    lengths = {}
    patches = []
    for name in ("NGSDExportAnnotationData_out.vcf", "NGSDExportAnnotationData_out3.vcf",
                 "NGSDExportAnnotationData_out5.vcf"):
        for line in open(f"{dout}/{name}"):
            if line.startswith("##contig=<ID="):
                body = line[len("##contig=<ID="):].rstrip(">\n")
                chrom, length = body.split(",length=")
                lengths[chrom] = int(length)
            elif not line.startswith("#"):
                chrom, pos, _id, vref = line.split("\t")[:4]
                patches.append((chrom, int(pos), vref))
    offsets = {}
    with open(ref, "wb") as fh:
        pos = 0
        for chrom, length in lengths.items():
            fh.seek(pos)
            header = f">{chrom}\n".encode()
            fh.write(header)
            offsets[chrom] = pos + len(header)
            nlines = (length + linebases - 1) // linebases
            pos = offsets[chrom] + (nlines - 1) * linewidth + (length - (nlines - 1) * linebases) + 1
        fh.truncate(pos)
        for chrom, p, vref in patches:
            for i, base in enumerate(vref):
                bp = p + i - 1
                fh.seek(offsets[chrom] + bp // linebases * linewidth + bp % linebases)
                fh.write(base.encode())
    with open(str(ref) + ".fai", "w") as fh:
        for chrom, length in lengths.items():
            fh.write(f"{chrom}\t{length}\t{offsets[chrom]}\t{linebases}\t{linewidth}\n")
    return ref


def test_ngsd_export_annotation_germline(ngsd, tmp_path, ref_data_out, stub_hg38_from_goldens):
    from helpers import compare_files
    _init_from(ngsd, "NGSDExportAnnotationData_init1.sql")
    vcf = tmp_path / "out.vcf"
    bed = tmp_path / "out.bed"
    assert execute("NGSDExportAnnotationData", [
        "-test", "-germline", vcf, "-threads", "1", "-genes", bed,
        "-reference", stub_hg38_from_goldens]) == 0
    strip = ("##fileDate=", "##source=NGSDExportAnnotationData", "##reference=")
    compare_files(vcf, ref_data_out / "NGSDExportAnnotationData_out.vcf", strip_patterns=strip)
    compare_files(bed, ref_data_out / "NGSDExportAnnotationData_out.bed")


@pytest.mark.parametrize("vicc,golden", [(False, "NGSDExportAnnotationData_out3.vcf"),
                                         (True, "NGSDExportAnnotationData_out4.vcf")])
def test_ngsd_export_annotation_somatic(ngsd, tmp_path, ref_data_out, stub_hg38_from_goldens,
                                        vicc, golden):
    from helpers import compare_files
    _init_from(ngsd, "NGSDExportAnnotationData_init2.sql")
    vcf = tmp_path / "out.vcf"
    args = ["-test", "-somatic", vcf, "-threads", "1", "-reference", stub_hg38_from_goldens]
    germline_vcf = tmp_path / "germ.vcf"
    if vicc:
        args += ["-vicc_config_details", "-germline", germline_vcf]
    assert execute("NGSDExportAnnotationData", args) == 0
    strip = ("##fileDate=", "##source=NGSDExportAnnotationData", "##reference=")
    compare_files(vcf, ref_data_out / golden, strip_patterns=strip)
    if vicc:
        compare_files(germline_vcf, ref_data_out / "NGSDExportAnnotationData_out5.vcf",
                      strip_patterns=strip)


def _log_compare(out, golden, ref_data_out):
    # the reference goldens use \r\r\n endings and omit the filename lines
    from helpers import read_lines

    def norm(path):
        return [l.rstrip() for l in read_lines(path)
                if l.strip() and not l.startswith("filename:")]
    got, want = norm(out), norm(ref_data_out / golden)
    assert got == want, "\n".join(
        f"-{a}\n+{b}" for a, b in zip(got + [""] * len(want), want + [""] * len(got)) if a != b)


def test_ngsd_add_variants_germline_panel(ngsd, tmp_path, ref_data_in, ref_data_out):
    _init_from(ngsd, "NGSDAddVariantsGermline_init.sql")
    log = tmp_path / "out1.log"
    assert execute("NGSDAddVariantsGermline", [
        "-test", "-debug", "-no_time", "-ps", "NA12878_18",
        "-var", ref_data_in / "NGSDAddVariantsGermline_in1.GSvar",
        "-cnv", ref_data_in / "NGSDAddVariantsGermline_in1.tsv", "-out", log]) == 0
    _log_compare(log, "NGSDAddVariantsGermline_out1.log", ref_data_out)
    # reimport is skipped (same caller/version/date)
    log2 = tmp_path / "out2.log"
    assert execute("NGSDAddVariantsGermline", [
        "-test", "-debug", "-no_time", "-ps", "NA12878_18",
        "-var", ref_data_in / "NGSDAddVariantsGermline_in1.GSvar",
        "-cnv", ref_data_in / "NGSDAddVariantsGermline_in1.tsv", "-out", log2]) == 0
    _log_compare(log2, "NGSDAddVariantsGermline_out2.log", ref_data_out)
    # var_update adds only missing variants
    log3 = tmp_path / "out3.log"
    assert execute("NGSDAddVariantsGermline", [
        "-test", "-debug", "-no_time", "-ps", "NA12878_18",
        "-var", ref_data_in / "NGSDAddVariantsGermline_in1.1.GSvar", "-var_update", "-out", log3]) == 0
    _log_compare(log3, "NGSDAddVariantsGermline_out3.log", ref_data_out)


def test_ngsd_add_variants_germline_wes(ngsd, tmp_path, ref_data_in, ref_data_out):
    _init_from(ngsd, "NGSDAddVariantsGermline_init.sql")
    log = tmp_path / "out4.log"
    assert execute("NGSDAddVariantsGermline", [
        "-test", "-debug", "-no_time", "-ps", "NA12878_38",
        "-var", ref_data_in / "NGSDAddVariantsGermline_in2.GSvar",
        "-cnv", ref_data_in / "NGSDAddVariantsGermline_in2.tsv", "-out", log]) == 0
    _log_compare(log, "NGSDAddVariantsGermline_out4.log", ref_data_out)


def test_ngsd_add_variants_germline_sv(ngsd, tmp_path, ref_data_in, ref_data_out):
    _init_from(ngsd, "NGSDAddVariantsGermline_init.sql")
    log = tmp_path / "out5.log"
    assert execute("NGSDAddVariantsGermline", [
        "-test", "-debug", "-no_time", "-ps", "NA12878_45",
        "-sv", ref_data_in / "NGSDAddVariantsGermline_in3.bedpe", "-out", log]) == 0
    _log_compare(log, "NGSDAddVariantsGermline_out5.log", ref_data_out)
    for table, n in (("sv_deletion", 35), ("sv_duplication", 8), ("sv_insertion", 36),
                     ("sv_inversion", 0), ("sv_translocation", 6), ("sv_callset", 1)):
        assert ngsd.get_value(f"SELECT count(*) FROM {table}") == n
    # re-import with empty file deletes all previous SVs
    log7 = tmp_path / "out7.log"
    execute("NGSDAddVariantsGermline", [
        "-test", "-debug", "-no_time", "-ps", "NA12878_45",
        "-sv", ref_data_in / "NGSDAddVariantsGermline_in_empty.bedpe", "-out", log7])
    _log_compare(log7, "NGSDAddVariantsGermline_out7.log", ref_data_out)
    for table, n in (("sv_deletion", 0), ("sv_duplication", 0), ("sv_insertion", 0),
                     ("sv_inversion", 0), ("sv_translocation", 0), ("sv_callset", 1)):
        assert ngsd.get_value(f"SELECT count(*) FROM {table}") == n


def test_ngsd_add_variants_germline_report_config(ngsd, tmp_path, ref_data_in, ref_data_out):
    _init_from(ngsd, "NGSDAddVariantsGermline_init.sql")
    _init_from(ngsd, "NGSDAddVariantsGermline_report_config.sql")
    log10 = tmp_path / "out10.log"
    assert execute("NGSDAddVariantsGermline", [
        "-test", "-debug", "-no_time", "-ps", "NA12878_45",
        "-cnv", ref_data_in / "NGSDAddVariantsGermline_in1.tsv", "-out", log10]) == 0
    _log_compare(log10, "NGSDAddVariantsGermline_out10.log", ref_data_out)
    log11 = tmp_path / "out11.log"
    assert execute("NGSDAddVariantsGermline", [
        "-test", "-debug", "-no_time", "-ps", "NA12878_45",
        "-sv", ref_data_in / "NGSDAddVariantsGermline_in3.bedpe", "-out", log11]) == 0
    _log_compare(log11, "NGSDAddVariantsGermline_out11.log", ref_data_out)
    assert ngsd.get_value("SELECT count(*) FROM variant") == 1
    assert ngsd.get_value("SELECT count(*) FROM cnv") == 1
    assert ngsd.get_value("SELECT count(*) FROM sv_deletion") == 1


def test_ngsd_add_variants_germline_sv_longread(ngsd, tmp_path, ref_data_in, ref_data_out):
    _init_from(ngsd, "NGSDAddVariantsGermline_init.sql")
    log = tmp_path / "out.log"
    assert execute("NGSDAddVariantsGermline", [
        "-test", "-debug", "-no_time", "-ps", "NA12878_45",
        "-sv", ref_data_in / "NGSDAddVariantsGermline_in4.bedpe", "-out", log]) == 0
    for table, n in (("sv_deletion", 123), ("sv_duplication", 1), ("sv_insertion", 142),
                     ("sv_inversion", 1), ("sv_translocation", 3), ("sv_callset", 1)):
        assert ngsd.get_value(f"SELECT count(*) FROM {table}") == n
    _log_compare(log, "NGSDAddVariantsGermline_Test_line233.log", ref_data_out)


def test_ngsd_add_variants_germline_re(ngsd, tmp_path, ref_data_in, ref_data_out):
    _init_from(ngsd, "NGSDAddVariantsGermline_init.sql")
    assert ngsd.get_value("SELECT count(*) FROM repeat_expansion_genotype") == 0
    # ExpansionHunter
    assert execute("NGSDAddVariantsGermline", [
        "-test", "-debug", "-no_time", "-ps", "NA12878_45",
        "-re", ref_data_in / "NGSDAddVariantsGermline_in5.vcf", "-out", tmp_path / "l1"]) == 0
    assert ngsd.get_value("SELECT count(*) FROM repeat_expansion_genotype") == 84
    assert ngsd.get_value("SELECT count(*) FROM repeat_expansion_genotype WHERE allele2 IS NULL") == 11
    assert ngsd.get_value("SELECT count(*) FROM repeat_expansion_genotype WHERE allele1 > 30") == 2
    assert ngsd.get_value("SELECT count(*) FROM repeat_expansion_genotype WHERE allele2 > 30") == 4
    assert ngsd.get_value("SELECT caller FROM re_callset") == "ExpansionHunter"
    assert ngsd.get_value("SELECT caller_version FROM re_callset") == "v5.0.0"
    assert str(ngsd.get_value("SELECT call_date FROM re_callset"))[:10] == "2024-04-16"
    # Straglr 1.5.0
    assert execute("NGSDAddVariantsGermline", [
        "-test", "-debug", "-no_time", "-ps", "NA12878_45",
        "-re", ref_data_in / "NGSDAddVariantsGermline_in6.vcf", "-out", tmp_path / "l2"]) == 0
    assert ngsd.get_value("SELECT count(*) FROM repeat_expansion_genotype") == 30
    assert ngsd.get_value("SELECT count(*) FROM repeat_expansion_genotype WHERE allele2 IS NULL") == 0
    assert ngsd.get_value("SELECT count(*) FROM repeat_expansion_genotype WHERE allele1 >= 30") == 3
    assert ngsd.get_value("SELECT count(*) FROM re_callset") == 1
    assert ngsd.get_value("SELECT caller FROM re_callset") == "Straglr"
    assert ngsd.get_value("SELECT caller_version FROM re_callset") == "V1.5.0"
    assert str(ngsd.get_value("SELECT call_date FROM re_callset"))[:10] == "2024-06-06"
    # Straglr 1.5.4
    assert execute("NGSDAddVariantsGermline", [
        "-test", "-debug", "-no_time", "-ps", "NA12878_45", "-force",
        "-re", ref_data_in / "NGSDAddVariantsGermline_in7.vcf", "-out", tmp_path / "l3"]) == 0
    assert ngsd.get_value("SELECT count(*) FROM repeat_expansion_genotype") == 82
    assert ngsd.get_value("SELECT count(*) FROM repeat_expansion_genotype WHERE allele2 IS NULL") == 10
    assert ngsd.get_value("SELECT count(*) FROM repeat_expansion_genotype WHERE allele1 >= 30") == 6
    assert ngsd.get_value("SELECT count(*) FROM repeat_expansion_genotype WHERE allele2 >= 30") == 5
    assert ngsd.get_value("SELECT caller_version FROM re_callset") == "V1.5.4"
    assert str(ngsd.get_value("SELECT call_date FROM re_callset"))[:10] == "2025-07-16"


def test_ngsd_add_variants_germline_long_qual(ngsd, tmp_path, ref_data_in, ref_data_out):
    _init_from(ngsd, "NGSDAddVariantsGermline_init.sql")
    assert execute("NGSDAddVariantsGermline", [
        "-test", "-debug", "-no_time", "-ps", "NA12878_45", "-force",
        "-var", ref_data_in / "NGSDAddVariantsGermline_in8.GSvar", "-out", tmp_path / "l"]) == 0
    ps_id = ngsd.processed_sample_id("NA12878_45")
    assert ngsd.get_value("SELECT caller FROM small_variants_callset WHERE processed_sample_id=?",
                          params=(ps_id,)) == "DeepVariant"
    assert ngsd.get_value("SELECT caller_version FROM small_variants_callset WHERE processed_sample_id=?",
                          params=(ps_id,)) == "1.8.0"
    assert str(ngsd.get_value("SELECT call_date FROM small_variants_callset WHERE processed_sample_id=?",
                              params=(ps_id,)))[:10] == "2025-07-16"


def test_ngsd_add_variants_somatic_tumor_normal(ngsd, tmp_path, ref_data_in, ref_data_out):
    _init_from(ngsd, "NGSDAddVariantsSomatic_init.sql")
    assert execute("NGSDAddVariantsSomatic", [
        "-test", "-no_time", "-t_ps", "DX184894_01", "-n_ps", "DX184263_01",
        "-var", ref_data_in / "NGSDAddVariantsSomatic_in1.GSvar", "-out", tmp_path / "l"]) == 0
    rows = ngsd.get_rows("SELECT chr, start, end, ref, obs FROM variant ORDER BY id")
    assert rows[0] == ("chr2", 178096717, 178096717, "T", "C")
    assert rows[1] == ("chr3", 138456487, 138456488, "AT", "-")
    assert rows[2] == ("chr16", 56870524, 56870524, "A", "C")
    dsv = ngsd.get_rows("SELECT id, processed_sample_id_tumor, processed_sample_id_normal, variant_id, "
                        "variant_frequency, depth, quality_snp FROM detected_somatic_variant ORDER BY id")
    assert dsv == [(1, 8, 7, 1, 0.1057, 389, 229), (2, 8, 7, 2, 0.1304, 26, 22),
                   (3, 8, 7, 3, 0.1254, 639, 330)]
    assert ngsd.get_value("SELECT caller FROM somatic_snv_callset") == "strelka2"
    assert ngsd.get_value("SELECT caller_version FROM somatic_snv_callset") == "2.9.10"
    assert str(ngsd.get_value("SELECT call_date FROM somatic_snv_callset"))[:10] == "2020-10-10"
    # reimport works with force, fails without
    assert execute("NGSDAddVariantsSomatic", [
        "-test", "-no_time", "-t_ps", "DX184894_01", "-n_ps", "DX184263_01", "-force",
        "-var", ref_data_in / "NGSDAddVariantsSomatic_in1.GSvar", "-out", tmp_path / "l2"]) == 0
    assert execute("NGSDAddVariantsSomatic", [
        "-test", "-no_time", "-t_ps", "DX184894_01", "-n_ps", "DX184263_01",
        "-var", ref_data_in / "NGSDAddVariantsSomatic_in1.GSvar", "-out", tmp_path / "l3"]) == 1


def test_ngsd_add_variants_somatic_tumor_only(ngsd, tmp_path, ref_data_in, ref_data_out):
    _init_from(ngsd, "NGSDAddVariantsSomatic_init.sql")
    assert execute("NGSDAddVariantsSomatic", [
        "-test", "-no_time", "-t_ps", "DX184894_01",
        "-var", ref_data_in / "NGSDAddVariantsSomatic_in3.GSvar", "-out", tmp_path / "l"]) == 0
    rows = ngsd.get_rows("SELECT chr, start, ref, obs FROM variant ORDER BY id")
    assert rows == [("chr2", 178096717, "T", "C"), ("chr16", 56870524, "A", "C")]
    dsv = ngsd.get_rows("SELECT id, processed_sample_id_tumor, processed_sample_id_normal, variant_id, "
                        "variant_frequency, depth, quality_snp FROM detected_somatic_variant ORDER BY id")
    assert dsv == [(1, 8, None, 1, 0.1057, 389, 229), (2, 8, None, 2, 0.1254, 639, 330)]
    assert ngsd.get_value("SELECT caller FROM somatic_snv_callset") == "VarScan2"
    assert ngsd.get_value("SELECT caller_version FROM somatic_snv_callset") == "v2.4.6"
    assert execute("NGSDAddVariantsSomatic", [
        "-test", "-no_time", "-t_ps", "DX184894_01", "-force",
        "-var", ref_data_in / "NGSDAddVariantsSomatic_in3.GSvar", "-out", tmp_path / "l2"]) == 0
    assert execute("NGSDAddVariantsSomatic", [
        "-test", "-no_time", "-t_ps", "DX184894_01",
        "-var", ref_data_in / "NGSDAddVariantsSomatic_in3.GSvar", "-out", tmp_path / "l3"]) == 1


def test_ngsd_add_variants_somatic_cnvs(ngsd, tmp_path, ref_data_in, ref_data_out):
    _init_from(ngsd, "NGSDAddVariantsSomatic_init.sql")
    assert execute("NGSDAddVariantsSomatic", [
        "-test", "-debug", "-no_time", "-t_ps", "DX184894_01", "-n_ps", "DX184263_01",
        "-cnv", ref_data_in / "NGSDAddVariantsSomatic_in2.tsv", "-out", tmp_path / "l"]) == 0
    rows = ngsd.get_rows("SELECT id, somatic_cnv_callset_id, chr, start, end, cn, tumor_cn, "
                         "tumor_clonality, quality_metrics FROM somatic_cnv ORDER BY id")
    assert len(rows) == 3
    assert rows[0] == (1, 1, "chr1", 32097627, 32860246, 2.775, 3, 0.775,
                       '{"BAF_qval_fdr":"NA","Highmed_tumor_BAF":"NA","Lowmed_tumor_BAF":"NA",'
                       '"Offtarget_RD_CI_lower":"2.43","Offtarget_RD_CI_upper":"2.99",'
                       '"Ontarget_RD_CI_lower":"NA","Ontarget_RD_CI_upper":"NA","Overall_qvalue":"0",'
                       '"loglikelihood":"191","major_CN_allele":"2","minor_CN_allele":"1","regions":"8"}')
    assert rows[2][5:8] == (1.25, 1, 0.75)
    assert ngsd.get_value("SELECT caller FROM somatic_cnv_callset") == "ClinCNV"
    assert ngsd.get_value("SELECT caller_version FROM somatic_cnv_callset") == "v1.16.1"
    assert str(ngsd.get_value("SELECT call_date FROM somatic_cnv_callset"))[:10] == "2019-10-06"
    assert execute("NGSDAddVariantsSomatic", [
        "-test", "-debug", "-no_time", "-t_ps", "DX184894_01", "-n_ps", "DX184263_01",
        "-cnv", ref_data_in / "NGSDAddVariantsSomatic_in2.tsv", "-out", tmp_path / "l2"]) == 1
    assert execute("NGSDAddVariantsSomatic", [
        "-test", "-debug", "-no_time", "-force", "-t_ps", "DX184894_01", "-n_ps", "DX184263_01",
        "-cnv", ref_data_in / "NGSDAddVariantsSomatic_in2.tsv", "-out", tmp_path / "l3"]) == 0


def test_ngsd_add_variants_somatic_cnvs_tumor_only(ngsd, tmp_path, ref_data_in, ref_data_out):
    _init_from(ngsd, "NGSDAddVariantsSomatic_init.sql")
    assert execute("NGSDAddVariantsSomatic", [
        "-test", "-debug", "-no_time", "-t_ps", "DX184894_01",
        "-cnv", ref_data_in / "NGSDAddVariantsSomatic_in5.tsv", "-out", tmp_path / "l"]) == 0
    rows = ngsd.get_rows("SELECT id, somatic_cnv_callset_id, chr, start, end, cn, tumor_cn, "
                         "tumor_clonality, quality_metrics FROM somatic_cnv ORDER BY id")
    assert rows == [(1, 1, "chr1", 3901206, 5765702, 1.4, 0, 0.3,
                     '{"Major allele":"0","Minor allele":"0","loglikelihood":"226","regions":"28"}')]
    assert ngsd.get_value("SELECT caller_version FROM somatic_cnv_callset") == "v1.18.3"
    assert str(ngsd.get_value("SELECT call_date FROM somatic_cnv_callset"))[:10] == "2025-11-27"
    assert execute("NGSDAddVariantsSomatic", [
        "-test", "-debug", "-no_time", "-t_ps", "DX184894_01",
        "-cnv", ref_data_in / "NGSDAddVariantsSomatic_in5.tsv", "-out", tmp_path / "l2"]) == 1
    assert execute("NGSDAddVariantsSomatic", [
        "-test", "-debug", "-no_time", "-force", "-t_ps", "DX184894_01",
        "-cnv", ref_data_in / "NGSDAddVariantsSomatic_in5.tsv", "-out", tmp_path / "l3"]) == 0


def test_ngsd_add_variants_somatic_svs(ngsd, tmp_path, ref_data_in, ref_data_out):
    _init_from(ngsd, "NGSDAddVariantsSomatic_init.sql")
    assert execute("NGSDAddVariantsSomatic", [
        "-test", "-debug", "-no_time", "-t_ps", "DX184894_01", "-n_ps", "DX184263_01",
        "-sv", ref_data_in / "NGSDAddVariantsSomatic_in4.bedpe", "-out", tmp_path / "l"]) == 0
    for table, n in (("somatic_sv_deletion", 0), ("somatic_sv_duplication", 0),
                     ("somatic_sv_insertion", 1), ("somatic_sv_inversion", 17),
                     ("somatic_sv_translocation", 0)):
        assert ngsd.get_value(f"SELECT count(*) FROM {table}") == n
    assert ngsd.get_value("SELECT caller FROM somatic_sv_callset") == "Manta"
    assert ngsd.get_value("SELECT caller_version FROM somatic_sv_callset") == "1.6.0"
    assert str(ngsd.get_value("SELECT call_date FROM somatic_sv_callset"))[:10] == "2025-05-19"
    # reimport without force is skipped (NOTE message, exit 0)
    assert execute("NGSDAddVariantsSomatic", [
        "-test", "-debug", "-no_time", "-t_ps", "DX184894_01", "-n_ps", "DX184263_01",
        "-sv", ref_data_in / "NGSDAddVariantsSomatic_in4.bedpe", "-out", tmp_path / "l2"]) == 0
    assert "NOTE: SVs were already imported" in (tmp_path / "l2").read_text()
    assert execute("NGSDAddVariantsSomatic", [
        "-test", "-debug", "-no_time", "-force", "-t_ps", "DX184894_01", "-n_ps", "DX184263_01",
        "-sv", ref_data_in / "NGSDAddVariantsSomatic_in4.bedpe", "-out", tmp_path / "l3"]) == 0


def test_ngsd_add_variants_somatic_svs_tumor_only(ngsd, tmp_path, ref_data_in, ref_data_out):
    _init_from(ngsd, "NGSDAddVariantsSomatic_init.sql")
    assert execute("NGSDAddVariantsSomatic", [
        "-test", "-debug", "-no_time", "-t_ps", "DX184894_01",
        "-sv", ref_data_in / "NGSDAddVariantsSomatic_in6.bedpe", "-out", tmp_path / "l"]) == 0
    for table, n in (("somatic_sv_deletion", 1), ("somatic_sv_duplication", 0),
                     ("somatic_sv_insertion", 0), ("somatic_sv_inversion", 0),
                     ("somatic_sv_translocation", 0)):
        assert ngsd.get_value(f"SELECT count(*) FROM {table}") == n
    assert ngsd.get_value("SELECT caller_version FROM somatic_sv_callset") == "1.6.1"
    assert str(ngsd.get_value("SELECT call_date FROM somatic_sv_callset"))[:10] == "2025-11-27"


def test_bedpe_annotate_counts(ngsd, tmp_path, ref_data_in, ref_data_out):
    from helpers import compare_files
    _init_from(ngsd, "BedpeAnnotateCounts_init1.sql")
    out1 = tmp_path / "out1.bedpe"
    assert execute("BedpeAnnotateCounts", [
        "-in", ref_data_in / "BedpeAnnotateCounts_in1.bedpe",
        "-ann_folder", str(ref_data_in / "BedpeAnnotateCounts") + "/",
        "-ps_name", "NA12878_3", "-test", "-out", out1]) == 0
    compare_files(out1, ref_data_out / "BedpeAnnotateCounts_out1.bedpe")
    out2 = tmp_path / "out2.bedpe"
    assert execute("BedpeAnnotateCounts", [
        "-in", ref_data_in / "BedpeAnnotateCounts_in1.bedpe",
        "-ann_folder", str(ref_data_in / "BedpeAnnotateCounts") + "/",
        "-ps_name", "NA12878_3", "-test", "-processing_system", "invalid", "-out", out2]) == 0
    compare_files(out2, ref_data_out / "BedpeAnnotateCounts_out2.bedpe")
    out3 = tmp_path / "out3.bedpe"
    assert execute("BedpeAnnotateCounts", [
        "-in", ref_data_in / "BedpeAnnotateCounts_in1.bedpe",
        "-ann_folder", str(ref_data_in / "BedpeAnnotateCounts") + "/",
        "-processing_system", "hpHBOCv5", "-out", out3]) == 0
    compare_files(out3, ref_data_out / "BedpeAnnotateCounts_out3.bedpe")


def test_transcript_comparison(ngsd, tmp_path, ref_data_in, ref_data_out):
    from helpers import compare_files
    _init_from(ngsd, "TranscriptComparison_init.sql")
    out = tmp_path / "out1.tsv"
    assert execute("TranscriptComparison", [
        "-ensembl", ref_data_in / "TranscriptComparison_ensembl.gff3",
        "-refseq", ref_data_in / "TranscriptComparison_refseq.gff3",
        "-out", out, "-test"]) == 0
    compare_files(out, ref_data_out / "TranscriptComparison_out1.tsv",
                  strip_patterns=(r"##.*file:",))


def test_splicing_to_bed(ngsd, tmp_path, ref_data_in, ref_data_out):
    from helpers import compare_files
    _init_from(ngsd, "SplicingToBed_init.sql")
    report = tmp_path / "report.tsv"
    genes = tmp_path / "genes.tsv"
    bed = tmp_path / "out.bed"
    assert execute("SplicingToBed", ["-test", "-in", ref_data_in / "splicing.tsv",
                                     "-report", report, "-gene_report", genes, "-bed", bed]) == 0
    compare_files(report, ref_data_out / "SplicingToBed_out1_report.tsv")
    compare_files(genes, ref_data_out / "SplicingToBed_out1_genes.tsv")
    compare_files(bed, ref_data_out / "SplicingToBed_out1.bed")


def _transfer_setup(ngsd):
    din = "/root/reference/src/tools-TEST/data_in"
    _init_from(ngsd, "NGSDTransferReportConfig_in1.sql")
    ngsd.execute(f"UPDATE processed_sample SET folder_override='{din}/NGSDTransferReportConfig/Sample_NA12878_05/' WHERE id=1")
    ngsd.execute(f"UPDATE processed_sample SET folder_override='{din}/NGSDTransferReportConfig/Sample_NA12878_06/' WHERE id=2")
    ngsd.commit()


def _compare_log(capfd, golden, ref_data_out):
    from helpers import read_lines
    captured = capfd.readouterr()
    def norm(lines):
        out = []
        for l in lines:
            l = l.rstrip()
            if not l.strip():
                continue
            if l.startswith("NGSDTransferReportConfig ") or l.startswith("Location"):
                continue
            # the reference prints the final tool failure as 'Exception: ...',
            # our ToolBase prints 'Error: ...' — normalize both to EXC
            if l.startswith("Exception: ") or (l.startswith("Error: ") and "not found in target sample" not in l):
                l = "EXC: " + l.split(": ", 1)[1]
            # overlap count depends on the coding-highconf BED resource that is
            # not shipped here — compare the correlation value only
            if l.startswith("Sample correlation:"):
                l = l.split(" (overlapping variants:")[0]
            out.append(l)
        return out
    # stderr warnings flush before stdout; the final exception line flushes
    # after stdout (matches the reference's stream buffering in the goldens)
    err_lines = norm(captured.err.splitlines())
    exceptions = [l for l in err_lines if l.startswith("EXC: ")]
    warnings_ = [l for l in err_lines if not l.startswith("EXC: ")]
    got = warnings_ + norm(captured.out.splitlines()) + exceptions
    want = norm(read_lines(ref_data_out / golden))
    assert got == want, "\n".join(f"-{a}\n+{b}" for a, b in
                                  zip(got + [""] * len(want), want + [""] * len(got)) if a != b)


def test_ngsd_transfer_report_config_fails(ngsd, ref_data_out, capfd):
    _transfer_setup(ngsd)
    assert execute("NGSDTransferReportConfig", ["-test", "-source_ps", "NA12878_05",
                                                "-target_ps", "NA12878_06"]) == 1
    _compare_log(capfd, "NGSDTransferReportConfig_Test_fails_missing_and_mismatch_variants.log", ref_data_out)


def test_ngsd_transfer_report_config_fails_mismatch(ngsd, ref_data_out, capfd):
    _transfer_setup(ngsd)
    for stmt in ("DELETE FROM `report_configuration_variant` WHERE id=4",
                 "DELETE FROM `report_configuration_variant` WHERE id=5",
                 "DELETE FROM `report_configuration_cnv` WHERE id=4",
                 "DELETE FROM `report_configuration_sv` WHERE id=5",
                 "DELETE FROM `report_configuration_re` WHERE id=5"):
        ngsd.execute(stmt)
    ngsd.commit()
    assert execute("NGSDTransferReportConfig", ["-test", "-source_ps", "NA12878_05",
                                                "-target_ps", "NA12878_06"]) == 1
    _compare_log(capfd, "NGSDTransferReportConfig_Test_fails_mismatch_variants.log", ref_data_out)


def test_ngsd_transfer_report_config_no_source_config(ngsd, ref_data_out, capfd):
    _transfer_setup(ngsd)
    for table in ("report_configuration_variant", "report_configuration_cnv",
                  "report_configuration_sv", "report_configuration_re",
                  "report_configuration_other_causal_variant"):
        ngsd.execute(f"DELETE FROM {table} WHERE report_configuration_id=1")
    ngsd.execute("DELETE FROM report_configuration WHERE id=1")
    ngsd.commit()
    assert execute("NGSDTransferReportConfig", ["-test", "-source_ps", "NA12878_05",
                                                "-target_ps", "NA12878_06"]) == 1
    _compare_log(capfd, "NGSDTransferReportConfig_Test_fails_no_report_config.log", ref_data_out)


def test_ngsd_transfer_report_config_target_has_config(ngsd, ref_data_out, capfd):
    _transfer_setup(ngsd)
    ngsd.execute("INSERT INTO `report_configuration`(`id`, `processed_sample_id`, `created_by`, `created_date`, "
                 "`last_edit_by`, `last_edit_date`) VALUES (2,2,100,'2000-01-01 11:11:11',101,'2020-01-01 22:22:22')")
    ngsd.commit()
    assert execute("NGSDTransferReportConfig", ["-test", "-source_ps", "NA12878_05",
                                                "-target_ps", "NA12878_06"]) == 1
    _compare_log(capfd, "NGSDTransferReportConfig_Test_fails_target_has_report_config.log", ref_data_out)


def test_ngsd_transfer_report_config_success(ngsd, ref_data_out, capfd):
    _transfer_setup(ngsd)
    for stmt in ("DELETE FROM `report_configuration_variant` WHERE id=4",
                 "DELETE FROM `report_configuration_variant` WHERE id=5",
                 "DELETE FROM `report_configuration_cnv` WHERE id=4",
                 "DELETE FROM `report_configuration_sv` WHERE id=5",
                 "DELETE FROM `report_configuration_re` WHERE id=5",
                 "DELETE FROM `report_configuration_cnv` WHERE id=3",
                 "DELETE FROM `report_configuration_sv` WHERE id=4",
                 "DELETE FROM `report_configuration_re` WHERE id=4"):
        ngsd.execute(stmt)
    ngsd.commit()
    assert execute("NGSDTransferReportConfig", ["-test", "-source_ps", "NA12878_05",
                                                "-target_ps", "NA12878_06"]) == 0
    _compare_log(capfd, "NGSDTransferReportConfig_Test_only_allowed_mismatches.log", ref_data_out)
    # meta data was transferred
    rc1 = ngsd.get_rows("SELECT created_by, created_date, last_edit_by, last_edit_date, finalized_by, finalized_date "
                        "FROM report_configuration WHERE id=1")[0]
    rc2 = ngsd.get_rows("SELECT created_by, created_date, last_edit_by, last_edit_date, finalized_by, finalized_date "
                        "FROM report_configuration WHERE id=2")[0]
    assert rc1 == rc2
    ocv1 = ngsd.get_rows("SELECT coordinates, gene, type, inheritance, comment, comment_reviewer1, comment_reviewer2 "
                         "FROM report_configuration_other_causal_variant WHERE report_configuration_id=1")
    ocv2 = ngsd.get_rows("SELECT coordinates, gene, type, inheritance, comment, comment_reviewer1, comment_reviewer2 "
                         "FROM report_configuration_other_causal_variant WHERE report_configuration_id=2")
    assert ocv1 == ocv2
    assert ngsd.get_value("SELECT COUNT(id) FROM report_configuration_variant WHERE report_configuration_id=2") == 3
    assert ngsd.get_value("SELECT COUNT(id) FROM report_configuration_cnv WHERE report_configuration_id=2") == 2
    assert ngsd.get_value("SELECT COUNT(id) FROM report_configuration_sv WHERE report_configuration_id=2") == 3
    assert ngsd.get_value("SELECT COUNT(id) FROM report_configuration_re WHERE report_configuration_id=2") == 3
    assert ngsd.get_value("SELECT COUNT(id) FROM report_configuration_sv WHERE sv_deletion_id IS NOT NULL") == 2
    assert ngsd.get_value("SELECT COUNT(id) FROM report_configuration_sv WHERE sv_duplication_id IS NOT NULL") == 2
    assert ngsd.get_value("SELECT COUNT(id) FROM report_configuration_sv WHERE sv_translocation_id IS NOT NULL") == 2


def test_sample_path(ngsd, capfd, tmp_path, monkeypatch):
    _init_from(ngsd, "SamplePath_init.sql")
    monkeypatch.setenv("NGSBITS_PROJECTS_FOLDER", str(tmp_path / "projects"))
    assert execute("SamplePath", ["-test", "-ps", "NA12878_01"]) == 0
    path = capfd.readouterr().out.strip().rstrip("/")
    assert path.endswith("Sample_NA12878_01")
    assert execute("SamplePath", ["-test", "-ps", "NA12878_01", "-type", "BAM"]) == 0
    assert capfd.readouterr().out.strip().endswith("NA12878_01.bam")
    assert execute("SamplePath", ["-test", "-ps", "NA12878_01", "-type", "GSVAR"]) == 0
    assert capfd.readouterr().out.strip().endswith("NA12878_01.GSvar")


@pytest.mark.parametrize("samples,extra,golden", [
    ("NGSDExportStudyGHGA_in1.tsv", ["-include_bam"], "NGSDExportStudyGHGA_out1.json"),
    ("NGSDExportStudyGHGA_in2.tsv", ["-include_bam", "-include_vcf"], "NGSDExportStudyGHGA_out2.json"),
    ("NGSDExportStudyGHGA_in3.tsv", ["-use_sample_folder", "-include_bam", "-include_vcf"], "NGSDExportStudyGHGA_out3.json"),
    ("NGSDExportStudyGHGA_in3.tsv", ["-use_sample_folder", "-group_analyses", "-include_vcf"], "NGSDExportStudyGHGA_out4.json"),
    ("NGSDExportStudyGHGA_in3.tsv", ["-use_sample_folder"], "NGSDExportStudyGHGA_out5.json"),
])
def test_ngsd_export_study_ghga(ngsd, tmp_path, ref_data_in, ref_data_out, samples, extra, golden, monkeypatch):
    from helpers import compare_files
    _init_from(ngsd, "NGSDExportStudyGHGA_init.sql")
    # the in3 sample TSV contains folders relative to the reference test dir
    monkeypatch.chdir("/root/reference/src")
    out = tmp_path / "out.json"
    assert execute("NGSDExportStudyGHGA", [
        "-data", ref_data_in / "NGSDExportStudyGHGA_in1.json",
        "-samples", ref_data_in / samples, "-test", "-out", out] + extra) == 0
    compare_files(out, ref_data_out / golden)


NGSD_DIN = "/root/reference/src/cppNGSD-TEST/data_in"


def test_rna_expression_cohorts_and_statistics(ngsd):
    """NGSD_Test.cpp:3068-3230 (rna_expression) — ENSG<->gene mapping, gene +
    exon expression import counts, RNA cohort determination and cohort
    expression statistics with the reference's pinned values."""
    import pytest

    db = ngsd
    db.run_mysql_file(f"{NGSD_DIN}/NGSD_in3.sql")

    ensg = {e: s for e, s in db.get_rows(
        "SELECT ensembl_id, symbol FROM gene WHERE ensembl_id IS NOT NULL")}
    assert ensg["ENSG00000204518"] == "AADACL4"
    assert ensg["ENSG00000171735"] == "CAMTA1"
    assert ensg["ENSG00000127463"] == "EMC1"
    assert ensg["ENSG00000231510"] == "LINC02782"
    assert ensg["ENSG00000263793"] == "MIR3115"
    assert ensg["ENSG00000187583"] == "PLEKHN1"
    gene_ensg = {s: e for e, s in ensg.items()}
    assert gene_ensg["AADACL4"] == "ENSG00000204518"
    assert gene_ensg["PLEKHN1"] == "ENSG00000187583"

    # gene expression import: 8 samples x 102 rows
    for i in range(1, 9):
        assert execute("NGSDImportExpressionData",
                       ["-test", "-expression", f"{NGSD_DIN}/NGSD_expr_in{i}.tsv",
                        "-ps", f"RX00{i}_01"]) == 0
        assert db.get_value("SELECT count(*) FROM expression") == 102 * i
    # re-import with -force keeps the count
    assert execute("NGSDImportExpressionData",
                   ["-test", "-expression", f"{NGSD_DIN}/NGSD_expr_in8.tsv",
                    "-ps", "RX008_01", "-force"]) == 0
    assert db.get_value("SELECT count(*) FROM expression") == 816

    # pinned imported values
    gene2id = dict(db.get_rows("SELECT symbol, id FROM expression_gene"))

    def val(col, ps_id, ensg_id):
        # like the reference QMap::value(): unknown ENSG/symbol -> id 0 ->
        # empty query result -> 0
        sym_id = gene2id.get(ensg.get(ensg_id, ""), 0)
        v = db.get_value(
            f"SELECT {col} FROM expression WHERE processed_sample_id={ps_id} "
            f"AND symbol_id={sym_id}")
        return 0 if v is None else v

    assert int(val("raw", 5001, "ENSG00000049249")) == 20934
    assert float(val("tpm", 5001, "ENSG00000215720")) == pytest.approx(116.816, abs=0.001)
    assert int(val("raw", 5002, "ENSG00000229716")) == 1371
    assert float(val("tpm", 5002, "ENSG00000159189")) == pytest.approx(204.76, abs=0.001)
    assert int(val("raw", 5005, "ENSG00000227634")) == 15679
    assert float(val("tpm", 5005, "ENSG00000282740")) == pytest.approx(0.0, abs=0.001)

    # exon expression import: 4 samples x 71 rows; duplicate without -force fails
    for i in range(1, 5):
        assert execute("NGSDImportExpressionData",
                       ["-test", "-mode", "exons",
                        "-expression", f"{NGSD_DIN}/NGSD_expr_exon_in{i}.tsv",
                        "-ps", f"RX00{i}_01"]) == 0
        assert db.get_value("SELECT count(*) FROM expression_exon") == 71 * i
    assert execute("NGSDImportExpressionData",
                   ["-test", "-mode", "exons",
                    "-expression", f"{NGSD_DIN}/NGSD_expr_exon_in1.tsv",
                    "-ps", "RX001_01"]) != 0
    assert execute("NGSDImportExpressionData",
                   ["-test", "-mode", "exons",
                    "-expression", f"{NGSD_DIN}/NGSD_expr_exon_in1.tsv",
                    "-ps", "RX001_01", "-force"]) == 0
    assert db.get_value("SELECT count(*) FROM expression_exon") == 284

    # cohort determination (NGSD::getRNACohort)
    cohort = db.get_rna_cohort(1, "blood", "", "", "RNA_COHORT_GERMLINE")
    assert cohort == {5005, 5006, 5007, 5008}

    cohort = db.get_rna_cohort(1, "blood", "", "", "RNA_COHORT_GERMLINE",
                               "genes", ("bad", "medium", "n/a"))
    assert cohort == {5006, 5008}

    cohort = db.get_rna_cohort(1, "skin", "KontrollDNACoriell", "5001",
                               "RNA_COHORT_GERMLINE_PROJECT")
    assert cohort == {5003}

    cohort = db.get_rna_cohort(1, "", "KontrollDNACoriell", "5001",
                               "RNA_COHORT_SOMATIC")
    assert cohort == {5003, 5005, 5007}

    cohort = db.get_rna_cohort(1, "blood", "", "", "RNA_COHORT_GERMLINE",
                               "genes", ("bad",), "female")
    assert cohort == {5005, 5006}

    cohort = db.get_rna_cohort(1, "skin", "KontrollDNACoriell", "5001",
                               "RNA_COHORT_GERMLINE_PROJECT", "genes",
                               ("bad",), "male")
    assert cohort == {5003}

    cohort = db.get_rna_cohort(1, "", "KontrollDNACoriell", "5001",
                               "RNA_COHORT_SOMATIC", "genes", ("bad",), "female")
    assert cohort == {5005}

    # cohort expression statistics (NGSD::calculateCohortExpressionStatistics)
    def stat(stats, ensg_id):
        # QMap::value() default: missing gene -> zeroed ExpressionStats
        return stats.get(ensg.get(ensg_id, ""), (0.0, 0.0, 0.0))

    cohort = db.get_rna_cohort(1, "blood", "", "", "RNA_COHORT_GERMLINE")
    stats = db.calculate_gene_expression_statistics(cohort)
    mean, mean_log2, std_log2 = stat(stats, "ENSG00000232596")
    assert mean == pytest.approx(121.091, abs=0.001)
    assert mean_log2 == pytest.approx(5.373, abs=0.001)
    assert std_log2 == pytest.approx(3.167, abs=0.001)
    mean, mean_log2, std_log2 = stat(stats, "ENSG00000049245")
    assert (mean, mean_log2, std_log2) == (pytest.approx(0, abs=0.001),) * 3
    assert len(cohort) == 4

    cohort = db.get_rna_cohort(1, "blood", "KontrollDNACoriell", "5001",
                               "RNA_COHORT_GERMLINE_PROJECT")
    stats = db.calculate_gene_expression_statistics(cohort)
    mean, mean_log2, std_log2 = stat(stats, "ENSG00000232596")
    assert mean == pytest.approx(204.681, abs=0.001)
    assert mean_log2 == pytest.approx(7.6221, abs=0.001)
    assert std_log2 == pytest.approx(0.427, abs=0.001)
    assert len(cohort) == 2

    cohort = db.get_rna_cohort(1, "skin", "", "", "RNA_COHORT_GERMLINE")
    stats = db.calculate_gene_expression_statistics(cohort)
    assert stat(stats, "ENSG00000157916")[0] == pytest.approx(47.9532, abs=0.001)
    assert stat(stats, "ENSG00000283234")[0] == pytest.approx(0.0, abs=0.001)
    assert len(cohort) == 4

    stats = db.calculate_gene_expression_statistics(cohort)
    mean, mean_log2, std_log2 = stat(stats, "ENSG00000157916")
    assert mean == pytest.approx(47.953, abs=0.001)
    assert mean_log2 == pytest.approx(1.898, abs=0.001)
    assert std_log2 == pytest.approx(3.287, abs=0.001)


def test_create_sample_sheet_for_novaseqx(ngsd):
    """NGSD_Test.cpp:3342-3390 (test_create_sample_sheet_for_novaseqx) —
    three runs byte-compared to the NovaSeqX_samplesheet*.csv goldens."""
    db = ngsd
    db.run_mysql_file(f"{NGSD_DIN}/NGSD_in5.sql")

    def golden(name):
        with open(f"/root/reference/src/cppNGSD-TEST/data_out/{name}", "rb") as fh:
            return fh.read().rstrip(b"\n")

    warnings: list[str] = []
    sheet = db.create_sample_sheet(1, warnings)
    assert warnings[0] == ("WARNING: The number of lanes covered by samples (5) "
                          "and the number of lanes on the flow cell (8) does "
                          "not match!")
    assert sheet.encode().rstrip(b"\n") == golden("NovaSeqX_samplesheet.csv")

    warnings = []
    sheet = db.create_sample_sheet(2, warnings)
    assert warnings[0] == ("WARNING: The number of lanes covered by samples (4) "
                          "and the number of lanes on the flow cell (2) does "
                          "not match!")
    assert warnings[1] == ("WARNING: No adapter for read 1 provided! Adapter "
                           "trimming will not work.")
    assert warnings[2] == ("WARNING: No adapter for read 2 provided! Adapter "
                           "trimming will not work.")
    assert sheet.encode().rstrip(b"\n") == golden("NovaSeqX_samplesheet2.csv")

    warnings = []
    sheet = db.create_sample_sheet(3, warnings)
    assert warnings[0] == ("WARNING: The number of lanes covered by samples (6) "
                          "and the number of lanes on the flow cell (8) does "
                          "not match!")
    assert sheet.encode().rstrip(b"\n") == golden("NovaSeqX_samplesheet3.csv")


def test_overriding_the_processed_sample_data_folder(ngsd, monkeypatch):
    """NGSD_Test.cpp:3327-3340 (test_overriding_the_processed_sample_data_
    folder) — ps.folder_override changes processedSamplePath."""
    monkeypatch.setenv("NGSBITS_PROJECTS_FOLDER", "/mnt/projects")
    db = ngsd
    db.run_mysql_file(f"{NGSD_DIN}/NGSD_in4.sql")

    with_override = db.processed_sample_path(
        db.processed_sample_id("NA12878_02"), "GSVAR")
    assert with_override.endswith("new/folder/NA12878_02.GSvar")

    without_override = db.processed_sample_path(
        db.processed_sample_id("NA12878_03"), "GSVAR")
    assert without_override.endswith("somatic/Sample_NA12878_03/NA12878_03.GSvar")


def test_export_sample_data(ngsd):
    """NGSD_Test.cpp:3392-3420 (test_export_sample_data) — dump processed
    sample 3999 from an NGSD_in2 instance, import into an NGSD_in5 instance,
    sample resolvable with its data intact."""
    db = ngsd
    db.run_mysql_file(f"{NGSD_DIN}/NGSD_in2.sql")

    dump: list[str] = []
    db.export_sample_data("3999", dump)
    assert len(dump) > 0

    db.init()
    db.run_mysql_file(f"{NGSD_DIN}/NGSD_in5.sql")
    for query in dump:
        db.execute(query)
    db.commit()

    assert str(db.processed_sample_id("NA12878_03")) == "3999"
    rows = db.get_rows("SELECT sample_id, quality FROM processed_sample WHERE id=3999")
    assert len(rows) == 1
    assert int(rows[0][0]) == 1
    assert rows[0][1] == "medium"
