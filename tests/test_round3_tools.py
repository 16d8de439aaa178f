"""Round-3 coverage for the four previously untested tools:
BedHighCoverage (direct tests), FastaFromBam (stubbed fetch),
VariantRanking (CLI path on a GSvar fixture), legacy CalculatePRS
(independent expected-score computation on the VcfCalculatePRS fixtures).
"""

import gzip
import os
import sys

import numpy as np
import pytest

from helpers import execute

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import synth_bam  # noqa: E402

REF_IN = "/root/reference/src/tools-TEST/data_in"


@pytest.fixture(scope="module")
def cov_bam(tmp_path_factory):
    path = tmp_path_factory.mktemp("bhc") / "cov.bam"
    synth_bam(str(path), n_reads=20_000)
    return path


def _read_bed_bases(path):
    total = 0
    for line in open(path):
        if line.startswith(("#", "track")):
            continue
        f = line.split("\t")
        total += int(f[2]) - int(f[1])
    return total


def test_bed_high_coverage_partitions_roi(cov_bam, tmp_path):
    """High- and low-coverage regions at the same cutoff must partition the
    ROI exactly (BedHighCoverage/BedLowCoverage are complementary sweeps)."""
    roi = tmp_path / "roi.bed"
    roi.write_text("chr1\t1000000\t1100000\nchr1\t5000000\t5100000\n")
    high = tmp_path / "high.bed"
    low = tmp_path / "low.bed"
    assert execute("BedHighCoverage", ["-in", roi, "-bam", cov_bam,
                                       "-out", high, "-cutoff", "1"]) == 0
    assert execute("BedLowCoverage", ["-in", roi, "-bam", cov_bam,
                                      "-out", low, "-cutoff", "1"]) == 0
    assert _read_bed_bases(high) + _read_bed_bases(low) == 200_000


def test_bed_high_coverage_matches_numpy(cov_bam, tmp_path):
    """High-coverage bases from the tool equal an independent numpy
    diff-array computation over the same BAM records."""
    from ngsbits_tpu.io.bam import BamReader
    start0, end0 = 1_000_000, 1_200_000  # 0-based half-open ROI
    roi = tmp_path / "roi.bed"
    roi.write_text(f"chr1\t{start0}\t{end0}\n")
    high = tmp_path / "high.bed"
    assert execute("BedHighCoverage", ["-in", roi, "-bam", cov_bam,
                                       "-out", high, "-cutoff", "2"]) == 0

    cov = np.zeros(end0 - start0 + 1, dtype=np.int32)
    reader = BamReader(str(cov_bam))
    for batch in reader:
        ends = batch.end_positions()
        for i in range(len(batch)):
            s = int(batch.pos[i])          # 0-based
            e = int(ends[i])               # 0-based exclusive
            s, e = max(s, start0), min(e, end0)
            if s < e:
                cov[s - start0] += 1
                cov[e - start0] -= 1
    reader.close()
    depth = np.cumsum(cov[:-1])
    assert _read_bed_bases(high) == int((depth >= 2).sum())


def test_fasta_from_bam_stubbed_fetch(cov_bam, tmp_path, monkeypatch, capsys):
    """FastaFromBam writes one FASTA record per @SQ entry with an M5 tag,
    fetched from the ENA MD5 endpoint (stubbed)."""
    import io
    import struct

    from ngsbits_tpu.io.bgzf import _EOF_BLOCK, _one_block

    # BAM whose header carries M5 tags (synth_bam writes none)
    bam = tmp_path / "md5.bam"
    text = ("@HD\tVN:1.6\tSO:coordinate\n"
            "@SQ\tSN:chrTest\tLN:100\tM5:abc123\n"
            "@SQ\tSN:chrNoMd5\tLN:50\n").encode()
    payload = (b"BAM\x01" + struct.pack("<i", len(text)) + text
               + struct.pack("<i", 2)
               + struct.pack("<i", 8) + b"chrTest\x00" + struct.pack("<i", 100)
               + struct.pack("<i", 9) + b"chrNoMd5\x00" + struct.pack("<i", 50))
    bam.write_bytes(_one_block(payload, 6) + _EOF_BLOCK)

    fetched = []

    def fake_urlopen(url, *a, **k):
        fetched.append(url if isinstance(url, str) else url.full_url)
        return io.BytesIO(b"ACGTACGT")

    import urllib.request
    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    out = tmp_path / "genome.fa"
    assert execute("FastaFromBam", ["-in", bam, "-out", out]) == 0
    stdout = capsys.readouterr().out
    assert "Skipped chromosome 'chrNoMd5'" in stdout
    assert fetched == ["https://www.ebi.ac.uk/ena/cram/md5/abc123"]
    assert out.read_bytes() == b">chrTest\nACGTACGT\n"


def test_variant_ranking_cli(tmp_path, monkeypatch):
    """VariantRanking ranks a small GSvar list; rank 1 goes to the variant
    hitting an HPO-linked gene (GSvar_v1 algorithm on the test NGSD)."""
    monkeypatch.setenv("NGSBITS_NGSD_TEST", str(tmp_path / "ngsd.sqlite"))
    from ngsbits_tpu.ngsd import NGSD
    db = NGSD(test_db=True)
    db.init()
    db.close()

    gsvar = tmp_path / "in.GSvar"
    gsvar.write_text(
        "##ANALYSISTYPE=GERMLINE_SINGLESAMPLE\n"
        "##SAMPLE=<ID=NA1,Gender=female,DiseaseStatus=affected>\n"
        "#chr\tstart\tend\tref\tobs\tNA1\tfilter\tquality\tgene\tvariant_type"
        "\tcoding_and_splicing\tgnomAD\tgnomAD_sub\tgnomAD_hom_hemi\tgene_info"
        "\tclassification\tNGSD_hom\tNGSD_het\tphyloP\tCADD\tREVEL\tOMIM"
        "\tClinVar\tHGMD\tSpliceAi\tMaxEntScan\n"
        "chr1\t100\t100\tA\tC\thet\t\tQUAL=90;DP=40;AF=0.48\tGENEA\tSNV"
        "\tGENEA:ENST1:missense_variant:MODERATE:exon1/1:c.1A>C:p.M1L:\t0.0001\t\t0,0"
        "\tGENEA (inh=AD oe_lof=0.1)\t\t0\t0\t5.0\t25\t0.95\t\t\t\t\t\n"
        "chr2\t200\t200\tG\tT\thet\t\tQUAL=90;DP=40;AF=0.51\tGENEB\tSNV"
        "\tGENEB:ENST2:synonymous_variant:LOW:exon1/1:c.2G>T:p.=:\t0.2\t\t0,0"
        "\tGENEB (inh=n/a oe_lof=0.9)\t\t500\t500\t0.0\t1\t0.01\t\t\t\t\t\n")
    out = tmp_path / "out.GSvar"
    rc = execute("VariantRanking", ["-in", gsvar, "-hpo_ids", "HP:0000001",
                                    "-out", out, "-algorithm", "GSvar_v1",
                                    "-test", "-skip_ngsd_classifications"])
    assert rc == 0
    lines = [l for l in out.read_text().splitlines() if not l.startswith("#")]
    assert len(lines) == 2
    header = next(l for l in out.read_text().splitlines() if l.startswith("#chr"))
    cols = header.split("\t")
    assert "GSvar_score" in cols and "GSvar_rank" in cols
    i_rank = cols.index("GSvar_rank")
    ranks = {l.split("\t")[0]: l.split("\t")[i_rank] for l in lines}
    # the rare, damaging, conserved chr1 variant must outrank the common one
    assert ranks["chr1"] == "1"


def test_legacy_calculate_prs(tmp_path):
    """Legacy CalculatePRS on the VcfCalculatePRS fixtures: the score must
    equal an independently computed sum over matched genotypes."""
    prs_vcf = f"{REF_IN}/VcfCalculatePRS_prs1.vcf"
    sample = f"{REF_IN}/VcfCalculatePRS_in1.vcf.gz"
    out = tmp_path / "prs.tsv"
    assert execute("CalculatePRS", ["-in", sample, "-prs", prs_vcf,
                                    "-out", out]) == 0
    lines = out.read_text().splitlines()
    assert lines[0].startswith("#pgs_id")
    row = dict(zip(lines[0].lstrip("#").split("\t"), lines[1].split("\t")))

    # independent expectation: sum weight * allele_count over sample matches
    sample_gt = {}
    with gzip.open(sample, "rt") as fh:
        for line in fh:
            if line.startswith("#"):
                continue
            f = line.rstrip("\n").split("\t")
            gt = f[9].split(":")[f[8].split(":").index("GT")]
            count = {"0/1": 1, "1/0": 1, "1/1": 2}.get(gt.replace("|", "/"), 0)
            sample_gt[(f[0], f[1], f[3], f[4])] = count
    expected = 0.0
    for line in open(prs_vcf):
        if line.startswith("#"):
            continue
        f = line.rstrip("\n").split("\t")
        # the reference compares GSvar-normalized PRS ref/obs against the RAW
        # sample VCF columns (CalculatePRS/main.cpp:94), so only SNVs can
        # ever match — mirror that quirk here
        if len(f[3]) != 1 or len(f[4]) != 1:
            continue
        info = dict(kv.split("=", 1) for kv in f[7].split(";") if "=" in kv)
        weight = float(info["WEIGHT"])
        expected += weight * sample_gt.get((f[0], f[1], f[3], f[4]), 0)
    assert abs(float(row["score"]) - expected) < 1e-4


def test_perf_regression_harness(tmp_path):
    """tools/benchmark/perf_regression.py: record + compare with a
    deliberate regression flags it and exits non-zero."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "perf_regression",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "benchmark", "perf_regression.py"))
    pr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pr)
    hist = str(tmp_path / "benchmark.tsv")
    for v in (100.0, 102.0, 98.0):
        pr.record(hist, bench_json=json.dumps(
            {"metric": "m", "value": v, "extra": {"e2e": v * 10}}))
        import time
        time.sleep(1.1)  # distinct run timestamps
    assert pr.compare(hist) == 0
    pr.record(hist, bench_json=json.dumps(
        {"metric": "m", "value": 50.0, "extra": {"e2e": 990.0}}))
    assert pr.compare(hist) == 1  # m dropped 50% -> regression


import json  # noqa: E402
