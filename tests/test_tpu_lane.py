"""On-chip test lane: the golden e2e tests re-run with the REAL TPU backend.

The default suite pins JAX_PLATFORMS=cpu (tests/conftest.py), so the
production device branches (qc/read_stats.py is_tpu_backend(),
ops/seqpurge.py dispatch, ops/pallas_kernels.py Mosaic compilation) are
never exercised by CI. This lane runs them on the chip:

    python -m pytest -m tpu tests/ -q

(The root conftest skips the CPU re-exec for `-m tpu` runs.) Every test
skips unless jax's default backend is a TPU, so the default CPU suite
deselects/skips them cleanly. Reference anchors: the same goldens as
tools-TEST/ReadQC_Test.cpp, SeqPurge_Test.cpp, MappingQC_Test.cpp.

First-compile through the tunnel takes 20-160 s per new shape; the fixtures
are tiny so each tool contributes only a handful of shapes (ReadQC buckets
to powers of two).
"""

from __future__ import annotations

import gzip
import shutil
import time

import numpy as np
import pytest

from helpers import QCML_STRIP, compare_files, execute

pytestmark = pytest.mark.tpu

GENOME_STRIP = (r"AT dropout", r"GC dropout")


@pytest.fixture(scope="module")
def tpu():
    jax = pytest.importorskip("jax")
    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU backend (run: python -m pytest -m tpu tests/)")
    from ngsbits_tpu.utils.backend import enable_compilation_cache, is_tpu_backend
    assert is_tpu_backend()
    # persistent compile cache: keeps lane wall time stable across runs
    # (first run pays 20-160 s/shape through the tunnel; reruns hit disk)
    enable_compilation_cache()
    return jax


@pytest.fixture(scope="module")
def stub_ref(tmp_path_factory):
    ref = tmp_path_factory.mktemp("genome") / "hg19.fa"
    ref.write_bytes(b"")
    shutil.copy("/root/reference/src/tools-TEST/data_in/hg19.fa.fai",
                str(ref) + ".fai")
    return ref


def cmp_gz(out, golden):
    a = gzip.decompress(open(out, "rb").read())
    b = gzip.decompress(open(golden, "rb").read())
    assert a == b, f"{out} differs from {golden}"


def test_readqc_golden_on_chip(tpu, ref_data_in, ref_data_out, tmp_path,
                               monkeypatch):
    """ReadQC_Test.cpp base case with the device batch-stats path (forced:
    the auto policy keeps per-batch stats on the host through the tunnel)."""
    monkeypatch.setenv("NGSBITS_DEVICE_ENGINES", "1")
    out = tmp_path / "r1.qcML"
    assert execute("ReadQC", ["-in1", ref_data_in / "ReadQC_in1.fastq.gz",
                              "-in2", ref_data_in / "ReadQC_in2.fastq.gz",
                              "-out", out]) == 0
    compare_files(out, ref_data_out / "ReadQC_out1.qcML", QCML_STRIP)


def test_seqpurge_golden_on_chip(tpu, ref_data_in, ref_data_out, tmp_path,
                                 monkeypatch):
    """SeqPurge_Test.cpp base case forced through the device formulation
    (Pallas insert scan + XLA adapter scans) instead of the C++ kernel;
    the device route is forced because auto dispatch is tunnel-aware."""
    monkeypatch.setenv("NGSBITS_SEQPURGE_NO_NATIVE", "1")
    monkeypatch.setenv("NGSBITS_DEVICE_ENGINES", "1")
    o1 = tmp_path / "o1.fastq.gz"
    o2 = tmp_path / "o2.fastq.gz"
    qc = tmp_path / "o1.qcML"
    assert execute("SeqPurge", ["-in1", ref_data_in / "SeqPurge_in1.fastq.gz",
                                "-in2", ref_data_in / "SeqPurge_in2.fastq.gz",
                                "-out1", o1, "-out2", o2, "-ncut", "0",
                                "-qcut", "0", "-min_len", "15", "-qc", qc,
                                "-block_size", "100", "-block_prefetch", "1"]) == 0
    cmp_gz(o1, ref_data_out / "SeqPurge_out1.fastq.gz")
    cmp_gz(o2, ref_data_out / "SeqPurge_out2.fastq.gz")
    compare_files(qc, ref_data_out / "SeqPurge_out1.qcML", QCML_STRIP)


def test_mappingqc_golden_on_chip(tpu, ref_data_in, ref_data_out, tmp_path,
                                  stub_ref):
    """MappingQC_Test.cpp ROI case (stub genome; dropout lines stripped the
    way the genome-less replay documents)."""
    out = tmp_path / "m3.qcML"
    assert execute("MappingQC", ["-in", ref_data_in / "MappingQC_in1.bam",
                                 "-roi", ref_data_in / "MappingQC_in2.bed",
                                 "-build", "hg19", "-out", out,
                                 "-ref", stub_ref]) == 0
    compare_files(out, ref_data_out / "MappingQC_test03_out.qcML",
                  QCML_STRIP + GENOME_STRIP)


def test_bedcoverage_backend_parity_on_chip(tpu, ref_data_in, tmp_path):
    """BedCoverage on-chip run must byte-match the host-path output (the
    reference golden needs panel.bam, absent from this mount, so the chip
    run is pinned against our own CPU-path output instead)."""
    bam = ref_data_in / "MappingQC_in1.bam"
    bed = ref_data_in / "MappingQC_in2.bed"
    out_dev = tmp_path / "cov_dev.tsv"
    assert execute("BedCoverage", ["-in", bed, "-bam", bam,
                                   "-out", out_dev]) == 0
    import subprocess
    import sys
    out_cpu = tmp_path / "cov_cpu.tsv"
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
           "PYTHONPATH": "/root/repo"}
    subprocess.run([sys.executable, "-m", "ngsbits_tpu", "BedCoverage",
                    "-in", str(bed), "-bam", str(bam), "-out", str(out_cpu)],
                   check=True, env=env, cwd="/root/repo")
    assert out_dev.read_bytes() == out_cpu.read_bytes()


def test_coverage_device_engine_parity(tpu, ref_data_in, tmp_path,
                                       monkeypatch):
    """BedCoverage with the device scatter-add engine forced on must match
    the host engine byte-for-byte (integer ops both ways)."""
    bam = ref_data_in / "MappingQC_in1.bam"
    bed = ref_data_in / "MappingQC_in2.bed"
    out_host = tmp_path / "h.tsv"
    monkeypatch.setenv("NGSBITS_DEVICE_ENGINES", "0")
    assert execute("BedCoverage", ["-in", bed, "-bam", bam,
                                   "-out", out_host]) == 0
    out_dev = tmp_path / "d.tsv"
    monkeypatch.setenv("NGSBITS_DEVICE_ENGINES", "1")
    assert execute("BedCoverage", ["-in", bed, "-bam", bam,
                                   "-out", out_dev]) == 0
    assert out_dev.read_bytes() == out_host.read_bytes()


def test_mappingqc_device_engine_parity(tpu, ref_data_in, tmp_path, stub_ref,
                                        monkeypatch):
    """MappingQC ROI depth via the device-resident diff buffer must match
    the host single-pass output."""
    args = ["-in", ref_data_in / "MappingQC_in1.bam",
            "-roi", ref_data_in / "MappingQC_in2.bed",
            "-build", "hg19", "-ref", stub_ref]
    out_host = tmp_path / "h.qcML"
    monkeypatch.setenv("NGSBITS_DEVICE_ENGINES", "0")
    assert execute("MappingQC", args + ["-out", out_host]) == 0
    out_dev = tmp_path / "d.qcML"
    monkeypatch.setenv("NGSBITS_DEVICE_ENGINES", "1")
    assert execute("MappingQC", args + ["-out", out_dev]) == 0
    compare_files(out_dev, out_host, QCML_STRIP)


def test_low_high_coverage_device_engine_parity(tpu, ref_data_in, tmp_path,
                                                monkeypatch):
    """BedLowCoverage/BedHighCoverage threshold-run extraction over the
    device coverage engine must match the host engine byte-for-byte."""
    bam = ref_data_in / "MappingQC_in1.bam"
    bed = ref_data_in / "MappingQC_in2.bed"
    for tool, extra in (("BedLowCoverage", ["-cutoff", "20"]),
                        ("BedHighCoverage", ["-cutoff", "10"])):
        out_host = tmp_path / f"{tool}_h.bed"
        monkeypatch.setenv("NGSBITS_DEVICE_ENGINES", "0")
        assert execute(tool, ["-in", bed, "-bam", bam, "-out", out_host]
                       + extra) == 0
        out_dev = tmp_path / f"{tool}_d.bed"
        monkeypatch.setenv("NGSBITS_DEVICE_ENGINES", "1")
        assert execute(tool, ["-in", bed, "-bam", bam, "-out", out_dev]
                       + extra) == 0
        assert out_dev.read_bytes() == out_host.read_bytes(), tool


def test_pileup_device_engine_parity(tpu, ref_data_in, monkeypatch):
    """pileup_at_positions base counts via DeviceBincount must equal the
    host np.add.at accumulation."""
    from ngsbits_tpu.io.bam import BamReader
    from ngsbits_tpu.qc.pileup import pileup_at_positions
    bam = str(ref_data_in / "MappingQC_in1.bam")
    r = BamReader(bam)
    # loci across the first mapped reference span
    first = r.ref_names[0]
    r.close()
    from ngsbits_tpu.core.chromosome import Chromosome
    cn = Chromosome(first).num
    positions = np.arange(1, 200001, 7, dtype=np.int64)
    chr_nums = np.full(len(positions), cn, dtype=np.int64)
    monkeypatch.setenv("NGSBITS_DEVICE_ENGINES", "0")
    host = pileup_at_positions(bam, chr_nums, positions)
    monkeypatch.setenv("NGSBITS_DEVICE_ENGINES", "1")
    dev = pileup_at_positions(bam, chr_nums, positions)
    np.testing.assert_array_equal(host.counts, dev.counts)
    np.testing.assert_array_equal(host.dels, dev.dels)


def test_correlation_device_engine_exact(tpu):
    """Integer-moment device Pearson equals the float64 host correlation
    for discrete genotype vectors."""
    from ngsbits_tpu.core.basicstats import correlation
    from ngsbits_tpu.ops.device_reduce import pearson_from_genotypes
    rng = np.random.default_rng(5)
    g1 = rng.choice([0.0, 0.5, 1.0], size=70000)
    g2 = np.where(rng.random(70000) < 0.8, g1,
                  rng.choice([0.0, 0.5, 1.0], size=70000))
    host = correlation(list(g1), list(g2))
    dev = pearson_from_genotypes(g1, g2)
    assert abs(host - dev) < 1e-9


def _reads(B, L, seed=0):
    rng = np.random.default_rng(seed)
    bases = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8), size=(B, L))
    quals = rng.integers(33, 74, size=(B, L)).astype(np.uint8)
    lengths = rng.integers(1, L + 1, size=(B,)).astype(np.int32)
    return bases, quals, lengths


def test_readqc_pallas_mosaic(tpu):
    """readqc_batch_pallas compiled via Mosaic (interpret=False) matches the
    host reference — the CPU suite only ever runs interpret mode."""
    from ngsbits_tpu.ops import pallas_kernels as pk
    from ngsbits_tpu.ops.readqc import readqc_batch_host
    bases, quals, lengths = _reads(256, 151, seed=7)
    ref = readqc_batch_host(bases, quals, lengths)
    got = pk.readqc_batch_pallas(bases, quals, lengths, interpret=False)
    for r, g, name in zip(ref, got,
                          ["counts5", "qsum_cycle", "qhist", "read_qsum"]):
        np.testing.assert_array_equal(
            np.asarray(r), np.asarray(g), err_msg=name)


def test_insert_scan_pallas_mosaic(tpu):
    """Mosaic-compiled insert scan matches the numpy host formulation."""
    from ngsbits_tpu.ops import pallas_kernels as pk
    from ngsbits_tpu.ops.seqpurge import insert_scan_host
    rng = np.random.default_rng(11)
    B, L = 128, 128
    seq1 = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8), size=(B, L))
    seq2 = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8), size=(B, L))
    seq2[: B // 2, : L // 2] = seq1[: B // 2, L // 2:]
    min_len = rng.integers(1, L + 1, size=(B,)).astype(np.int32)
    rm, rmm = insert_scan_host(seq1, seq2, min_len)
    gm, gmm = pk.insert_scan_pallas(seq1, seq2, min_len, interpret=False)
    np.testing.assert_array_equal(np.asarray(rm), np.asarray(gm))
    np.testing.assert_array_equal(np.asarray(rmm), np.asarray(gmm))


def test_device_kernel_throughput_smoke(tpu):
    """The ReadQC device kernel sustains well above the host decode rate —
    a cheap on-chip perf floor so regressions in the device path surface
    here rather than only in bench.py."""
    from ngsbits_tpu.ops.readqc import readqc_batch
    B, L = 65536, 160
    bases, quals, lengths = _reads(B, L, seed=3)
    # device-resident inputs: measure the kernel, not the axon tunnel
    # (BASELINE.md round 3: per-batch result transfer dominated the tunnel)
    bases, quals, lengths = map(tpu.device_put, (bases, quals, lengths))
    r = readqc_batch(bases, quals, lengths)  # compile + warm
    tpu.block_until_ready(r)
    # async-pipelined dispatches amortize the tunnel's ~10 ms round-trip
    t0 = time.perf_counter()
    n = 40
    results = [readqc_batch(bases, quals, lengths) for _ in range(n)]
    tpu.block_until_ready(results[-1])
    rate = B * n / (time.perf_counter() - t0)
    # host decode tops out well under 10 M reads/s; the chip should be far
    # above it even through the tunnel
    assert rate > 1e7, f"device ReadQC kernel at {rate:.0f} reads/s"


def test_device_stream_readqc_parity_on_chip(tpu):
    """Device-resident streaming engine (packed upload, on-device
    accumulators, single EOF fetch) vs the host path — full metric parity
    on the real chip, including a mid-run spill."""
    import numpy as np

    from ngsbits_tpu.io.fastq import FastqBatch
    from ngsbits_tpu.qc.read_stats import (FORWARD, REVERSE, DeviceReadStream,
                                           ReadStatistics)

    rng = np.random.default_rng(11)
    host = ReadStatistics()
    dev = ReadStatistics()
    stream = DeviceReadStream()
    stream.SPILL_READS = 3000
    dev._stream = stream
    for i in range(4):
        B, L = 2000, 151
        bases = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8),
                           p=[0.24, 0.24, 0.24, 0.24, 0.04], size=(B, L))
        quals = rng.integers(33, 75, size=(B, L)).astype(np.uint8)
        lengths = rng.integers(1, L + 1, size=B).astype(np.int32)
        mask = np.arange(L)[None, :] < lengths[:, None]
        batch = FastqBatch(bases=np.where(mask, bases, 0).astype(np.uint8),
                           quals=np.where(mask, quals, 0).astype(np.uint8),
                           lengths=lengths)
        direction = FORWARD if i % 2 == 0 else REVERSE
        host.update_batch(batch, direction)
        stream.update(batch, direction)
    got = [str(v) for v in dev.get_result().to_string_list()]
    want = [str(v) for v in host.get_result().to_string_list()]
    assert got == want


def test_device_stream_packed_upload_size(tpu):
    """The packed upload is ~9 bits/base (2-bit codes + 1-bit N mask +
    6-bit quals) — ~1.78x less transfer than uint8 bases+quals."""
    import numpy as np

    from ngsbits_tpu.ops.readqc import pack_batch

    B, L = 1024, 152
    bases = np.full((B, L), ord("A"), np.uint8)
    quals = np.full((B, L), 40, np.uint8)
    pb, nm, pq = pack_batch(bases, quals)
    packed = pb.nbytes + nm.nbytes + pq.nbytes
    unpacked = bases.nbytes + quals.nbytes
    assert packed * 8 / (B * L) == pytest.approx(9.0, abs=0.01)
    assert unpacked / packed == pytest.approx(16 / 9, rel=0.01)


def _run_similarity(monkeypatch, tmp_path, force, files, mode, name):
    from ngsbits_tpu.tools.sample_similarity import SampleSimilarityTool
    monkeypatch.setenv("NGSBITS_DEVICE_ENGINES", "1" if force else "0")
    out = str(tmp_path / name)
    SampleSimilarityTool().execute(["-in", *files, "-mode", mode, "-out", out])
    return open(out, "rb").read()


def test_sample_similarity_gsvar_device_on_chip(tpu, ref_data_in, tmp_path,
                                                monkeypatch):
    """SampleSimilarity on real GSvar fixtures: the integer-moment device
    Pearson engine produces byte-identical output to the host float64 path."""
    files = [str(ref_data_in / "SampleSimilarity_in1.GSvar"),
             str(ref_data_in / "SampleSimilarity_in2.GSvar")]
    dev = _run_similarity(monkeypatch, tmp_path, True, files, "gsvar", "dev.tsv")
    host = _run_similarity(monkeypatch, tmp_path, False, files, "gsvar", "host.tsv")
    assert dev == host


def test_sample_similarity_vcf_device_on_chip(tpu, ref_data_in, tmp_path,
                                              monkeypatch):
    """Same parity on real VCF fixtures (the genotype-correlation route)."""
    files = [str(ref_data_in / "SampleSimilarity_in6.vcf.gz"),
             str(ref_data_in / "SampleSimilarity_in7.vcf.gz")]
    dev = _run_similarity(monkeypatch, tmp_path, True, files, "vcf", "dev.tsv")
    host = _run_similarity(monkeypatch, tmp_path, False, files, "vcf", "host.tsv")
    assert dev == host


def test_gender_hetx_pileup_device_on_chip(tpu, monkeypatch):
    """SampleGender hetX on a real long-read BAM: the device-resident pileup
    scatter engine and the host accumulation agree on every SNP count."""
    from ngsbits_tpu.tools.sample_gender import gender_hetx
    bam = "/root/reference/src/cppNGS-TEST/data_in/Statistics_longread.bam"
    monkeypatch.setenv("NGSBITS_DEVICE_ENGINES", "1")
    dev = gender_hetx("hg38", bam, 0.15, 0.24, True)
    monkeypatch.setenv("NGSBITS_DEVICE_ENGINES", "0")
    host = gender_hetx("hg38", bam, 0.15, 0.24, True)
    assert dev == host
    assert dev[0] == "unknown (too few SNPs)"  # Statistics_Test.cpp:841


def test_contamination_pileup_device_on_chip(tpu, monkeypatch):
    """Statistics::contamination on a real tumor BAM — device vs host pileup
    parity for the SNP allele-frequency deviation metric."""
    from ngsbits_tpu.qc.mapping_stats import contamination
    bam = "/root/reference/src/cppNGS-TEST/data_in/tumor.bam"
    monkeypatch.setenv("NGSBITS_DEVICE_ENGINES", "1")
    dev = [str(v) for v in contamination("hg19", bam)]
    monkeypatch.setenv("NGSBITS_DEVICE_ENGINES", "0")
    host = [str(v) for v in contamination("hg19", bam)]
    assert dev == host
