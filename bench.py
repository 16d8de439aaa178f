"""Benchmark driver: end-to-end tool throughput + device-kernel rate.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, "extra": {...}}

The headline metric is END-TO-END ReadQC (5M-read gzip FASTQ -> qcML) —
the honest user-visible number; the device-kernel rate and the other e2e
tool rates (bgzf ReadQC, SeqPurge, BedCoverage, MappingQC) ride in
"extra", together with a "method" block recording how each number was
taken (best-of-N, warm/cold, backend) so rounds compare without prose.

Baseline: the reference publishes no absolute numbers, its Qt dev
toolchain is absent from this image (only Qt5 *runtime* libs, no qmake or
headers), and the cppCORE submodule source is not in the mount — the
reference ReadQC binary cannot be built here. vs_baseline therefore uses a
MEASURED single-core proxy, computed in-run on the same input: the serial
zlib inflate time of the bench FASTQ plus the native C per-read
accumulation time (ngs_readqc_batch), i.e. the throughput of an optimized
single-threaded C implementation with the reference's architecture
(FastqFileStream -> StatisticsReads::update). This proxy is an UPPER bound
on the reference's single-core rate (no Qt/virtual-call overhead, no
per-read allocations), so vs_baseline is conservative.
"""

from __future__ import annotations

import gzip
import json
import os
import struct
import sys
import time

import numpy as np

CACHE = "/tmp/ngsbits_bench_cache"
REF_IN = "/root/reference/src/tools-TEST/data_in"


# ------------------------------------------------------------ data synthesis

def synth_fastq(path: str, n_reads: int = 5_000_000, read_len: int = 151):
    """Vectorized synthetic FASTQ with REALISTIC compressibility: reads are
    windows of a fixed 5 Mb genome (deflate finds the shared k-mers the way
    it does on real resequencing data, ~4:1 instead of the ~1.7:1 of
    uniform-random bases) and qualities are a smooth per-cycle curve with
    small per-read jitter (real Illumina quals are run-heavy). Uniform-
    random input is literal-heavy and caps inflate at ~170 MB/s for every
    inflater, which benchmarks deflate's worst case rather than FASTQ.
    Gzip level 1 (the writer default), single member (the hard, serial-
    decode case)."""
    if os.path.exists(path):
        return
    rng = np.random.default_rng(42)
    chunk = 250_000
    hdr_w = 12  # "@r0000000000"
    rec_len = hdr_w + 1 + read_len + 1 + 2 + read_len + 1
    bases_lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome = bases_lut[rng.integers(0, 4, size=5_000_000)]
    gwin = np.lib.stride_tricks.sliding_window_view(genome, read_len)
    qual_curve = np.clip(
        70 - (np.arange(read_len) * 12) // read_len
        + rng.integers(-2, 3, size=read_len), 35, 73).astype(np.uint8)
    with open(path + ".tmp", "wb") as raw:
        gz = gzip.GzipFile(fileobj=raw, mode="wb", compresslevel=1, mtime=0)
        written = 0
        while written < n_reads:
            n = min(chunk, n_reads - written)
            m = np.zeros((n, rec_len), dtype=np.uint8)
            headers = "".join(f"@r{written + i:010d}" for i in range(n))
            m[:, :hdr_w] = np.frombuffer(headers.encode(), dtype=np.uint8).reshape(n, hdr_w)
            m[:, hdr_w] = 10
            starts = rng.integers(0, len(gwin), size=n)
            reads = gwin[starts].copy()
            # ~0.5% mismatches so reads aren't exact genome copies
            mut = rng.random(size=reads.shape) < 0.005
            reads[mut] = bases_lut[rng.integers(0, 4, size=int(mut.sum()))]
            m[:, hdr_w + 1: hdr_w + 1 + read_len] = reads
            m[:, hdr_w + 1 + read_len] = 10
            m[:, hdr_w + 2 + read_len] = ord("+")
            m[:, hdr_w + 3 + read_len] = 10
            quals = np.clip(qual_curve[None, :].astype(np.int16)
                            + rng.integers(-1, 2, size=(n, 1)), 33, 73)
            m[:, hdr_w + 4 + read_len: hdr_w + 4 + 2 * read_len] = \
                quals.astype(np.uint8)
            m[:, -1] = 10
            gz.write(m.tobytes())
            written += n
        gz.close()
    os.replace(path + ".tmp", path)


def synth_seqpurge_pair(path1: str, path2: str, repeats: int = 256):
    """Repeat the reference SeqPurge fixture pair to ~320k pairs."""
    if os.path.exists(path1) and os.path.exists(path2):
        return
    for src, dst in ((f"{REF_IN}/SeqPurge_in1.fastq.gz", path1),
                     (f"{REF_IN}/SeqPurge_in2.fastq.gz", path2)):
        with gzip.open(src, "rb") as fh:
            block = fh.read()
        if not block.endswith(b"\n"):
            block += b"\n"
        # SeqPurge_in2 ends with a truncated empty record (header/empty/+,
        # no qual line) that only parses at EOF — pad to a full 4-line
        # record so the repeated stream stays valid
        n_lines = block.count(b"\n")
        block += b"\n" * (-n_lines % 4)
        with open(dst + ".tmp", "wb") as raw:
            gz = gzip.GzipFile(fileobj=raw, mode="wb", compresslevel=1, mtime=0)
            for _ in range(repeats):
                gz.write(block)
            gz.close()
        os.replace(dst + ".tmp", dst)


def synth_bam(path: str, n_reads: int = 1_000_000, read_len: int = 100):
    """Minimal coordinate-sorted single-chromosome BAM with M-only CIGARs."""
    if os.path.exists(path):
        return
    from ngsbits_tpu.io.bgzf import _EOF_BLOCK, _one_block

    chrom, chrom_len = "chr1", 248_956_422
    text = f"@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:{chrom}\tLN:{chrom_len}\n".encode()
    name = b"r\x00"
    rng = np.random.default_rng(7)
    seq_codes = rng.choice(np.array([1, 2, 4, 8], dtype=np.uint8), size=read_len)
    packed = (seq_codes[0::2] << 4) | seq_codes[1::2]
    qual = np.full(read_len, 35, dtype=np.uint8).tobytes()
    cigar = struct.pack("<I", (read_len << 4) | 0)
    positions = np.sort(rng.integers(0, chrom_len - read_len, size=n_reads))

    def reg2bin(beg, end):
        end -= 1
        if beg >> 14 == end >> 14:
            return ((1 << 15) - 1) // 7 + (beg >> 14)
        if beg >> 17 == end >> 17:
            return ((1 << 12) - 1) // 7 + (beg >> 17)
        if beg >> 20 == end >> 20:
            return ((1 << 9) - 1) // 7 + (beg >> 20)
        if beg >> 23 == end >> 23:
            return ((1 << 6) - 1) // 7 + (beg >> 23)
        if beg >> 26 == end >> 26:
            return ((1 << 3) - 1) // 7 + (beg >> 26)
        return 0

    fixed_tail = name + cigar + packed.tobytes() + qual
    body_len = 32 + len(fixed_tail)
    with open(path + ".tmp", "wb") as fh:
        buf = bytearray()
        buf += b"BAM\x01" + struct.pack("<i", len(text)) + text
        buf += struct.pack("<i", 1)
        nb = chrom.encode() + b"\x00"
        buf += struct.pack("<i", len(nb)) + nb + struct.pack("<i", chrom_len)
        for pos in positions:
            pos = int(pos)
            rec = struct.pack("<IiiBBHHHIiii", body_len, 0, pos, 2, 60,
                              reg2bin(pos, pos + read_len), 1, 0, read_len,
                              -1, -1, 0)
            buf += rec + fixed_tail
            if len(buf) >= 0xFF00:
                fh.write(_one_block(bytes(buf[:0xFF00]), 6))
                del buf[:0xFF00]
        while buf:
            fh.write(_one_block(bytes(buf[:0xFF00]), 6))
            del buf[:0xFF00]
        fh.write(_EOF_BLOCK)
    os.replace(path + ".tmp", path)


# ------------------------------------------------------------ measurements

def run_tool(tool: str, args: list[str], attempts: int = 2,
             onchip: bool = False) -> float:
    """Wall time of one CLI tool run in a subprocess.

    Default: CPU backend — end-to-end tool benches measure the HOST
    pipeline (decode, host compute paths, writers); in this environment
    the TPU is reached through a tunnel whose transfer bandwidth (not the
    chip) dominates per-batch device dispatch. With ``onchip=True`` the
    axon env is preserved and the TPU backend is verified with a probe
    first (so the metric can never silently record a CPU run)."""
    import subprocess

    env = dict(os.environ)
    repo = os.path.dirname(os.path.abspath(__file__))
    # APPEND to PYTHONPATH: the axon TPU plugin is delivered through the
    # ambient PYTHONPATH (/root/.axon_site sitecustomize) — overwriting it
    # would silently drop the TPU backend from subprocesses
    env["PYTHONPATH"] = repo + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    if onchip:
        env.pop("JAX_PLATFORMS", None)
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.default_backend() == 'tpu', "
             "jax.default_backend()"],
            env=env, capture_output=True, text=True, timeout=300)
        if probe.returncode != 0:
            raise RuntimeError(
                f"TPU backend unavailable for on-chip run: {probe.stderr[-200:]}")
    else:
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
    log = os.path.join(CACHE, "tool_run.log")
    # warm the page cache for input files — measure compute, not the shared
    # VM's cold-read variance (the reference's nightly harness also runs warm)
    for a in args:
        if isinstance(a, str) and os.path.isfile(a):
            with open(a, "rb") as fh:
                while fh.read(16 << 20):
                    pass
    # best-of-2: this VM deboosts idle vCPUs — the first run after idle
    # clocks ~2-3x slower than sustained throughput (same reasoning as the
    # kernel metric's best-of-3)
    best = float("inf")
    for _ in range(attempts):
        t0 = time.perf_counter()
        with open(log, "wb") as fh:
            r = subprocess.run([sys.executable, "-m", "ngsbits_tpu", tool] + args,
                               stdout=fh, stderr=fh, cwd=repo, env=env,
                               timeout=600)
        dt = time.perf_counter() - t0
        if r.returncode != 0:
            tail = open(log, "rb").read()[-300:].decode(errors="replace")
            raise RuntimeError(f"{tool} exited {r.returncode}: {tail}")
        best = min(best, dt)
    return best


def kernel_metric() -> float:
    import jax

    from ngsbits_tpu.ops.readqc import readqc_batch
    from ngsbits_tpu.utils.backend import enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    B, L = 1 << 16, 160  # 64k reads x 151bp padded to 160
    bases = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8), size=(B, L))
    quals = rng.integers(33, 74, size=(B, L)).astype(np.uint8)
    lengths = np.full((B,), 151, dtype=np.int32)
    db, dq, dl = jax.device_put(bases), jax.device_put(quals), jax.device_put(lengths)
    jax.block_until_ready(readqc_batch(db, dq, dl))  # warmup/compile
    # best-of-3: device throughput is stable but tunnel dispatch fluctuates
    iters = 50
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = readqc_batch(db, dq, dl)
        jax.block_until_ready(out)
        best_dt = min(best_dt, time.perf_counter() - t0)
    return B * iters / best_dt


def baseline_proxy(fq_path: str, n_reads: int, read_len: int = 151) -> float:
    """Measured single-core reference proxy on the same input (module
    docstring): serial zlib inflate + native C per-read accumulation."""
    import subprocess

    code = r"""
import sys, time, gzip
import numpy as np
fq, n_reads, read_len = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
# (1) serial zlib inflate of the exact bench input
t0 = time.perf_counter()
with gzip.open(fq, "rb") as fh:
    while fh.read(1 << 20):
        pass
t_inflate = time.perf_counter() - t0
# (2) native C per-read accumulation at the same read count
from ngsbits_tpu.ops.readqc import readqc_batch_host
rng = np.random.default_rng(0)
B = 1 << 16
bases = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=(B, read_len))
quals = rng.integers(33, 74, size=(B, read_len)).astype(np.uint8)
lengths = np.full(B, read_len, dtype=np.int32)
readqc_batch_host(bases, quals, lengths)  # warm
iters = max(1, n_reads // B)
t0 = time.perf_counter()
for _ in range(iters):
    readqc_batch_host(bases, quals, lengths)
t_analyze = (time.perf_counter() - t0) * (n_reads / (iters * B))
print((t_inflate + t_analyze))
"""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
    best = float("inf")
    for _ in range(3):
        out = subprocess.run([sys.executable, "-c", code, fq_path,
                              str(n_reads), str(read_len)],
                             capture_output=True, text=True, env=env)
        if out.returncode != 0:
            raise RuntimeError(f"baseline proxy failed: {out.stderr[-300:]}")
        best = min(best, float(out.stdout.strip().splitlines()[-1]))
    return n_reads / best


def seqpurge_analyze_scaling(sp1: str, sp2: str, n_pairs: int) -> dict:
    """Pairs/s of the analysis stage alone (pre-decoded batches, C++ kernel)
    at 1/2/4 threads, in a CPU-backend subprocess."""
    import subprocess

    code = r"""
import sys, time, copy
import numpy as np
sp1, sp2 = sys.argv[1], sys.argv[2]
from ngsbits_tpu.io.fastq import FastqReader
from ngsbits_tpu.qc.seqpurge import SeqPurgeEngine, SeqPurgeParams
batches = list(zip(FastqReader(sp1), FastqReader(sp2)))
n = sum(len(b1) for b1, _ in batches)
out = {}
for t in (1, 2, 4):
    best = float("inf")
    for _ in range(2):
        engine = SeqPurgeEngine(SeqPurgeParams(qcut=0, ncut=0, min_len=15),
                                threads=t)
        work = [(copy.deepcopy(b1), copy.deepcopy(b2)) for b1, b2 in batches]
        t0 = time.perf_counter()
        for b1, b2 in work:
            engine.process_batch(b1, b2)
        best = min(best, time.perf_counter() - t0)
    out[str(t)] = round(n / best, 1)
print(repr(out))
"""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.abspath(__file__))
    out = subprocess.run([sys.executable, "-c", code, sp1, sp2],
                         capture_output=True, text=True, env=env, timeout=600)
    if out.returncode != 0:
        return {"error": out.stderr[-200:]}
    import ast
    return ast.literal_eval(out.stdout.strip().splitlines()[-1])


def tpu_lane_result() -> dict:
    """Run the on-chip pytest lane and record its outcome."""
    import re
    import subprocess

    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, "-m", "pytest", "-m", "tpu",
                        "tests/test_tpu_lane.py", "-q", "--no-header"],
                       capture_output=True, text=True, timeout=900,
                       cwd=os.path.dirname(os.path.abspath(__file__)))
    dt = time.perf_counter() - t0
    m = re.search(r"(\d+) passed", r.stdout)
    f = re.search(r"(\d+) failed", r.stdout)
    return {"passed": int(m.group(1)) if m else 0,
            "failed": int(f.group(1)) if f else 0,
            "seconds": round(dt, 1)}


def main():
    os.makedirs(CACHE, exist_ok=True)
    extra = {}

    # (a) end-to-end ReadQC: 5M-read FASTQ -> qcML
    n_reads = 5_000_000
    fq = f"{CACHE}/readqc_5m.fastq.gz"
    synth_fastq(fq, n_reads)
    # best-of-3: the headline and the proxy form vs_baseline, so both get
    # an extra attempt against this VM's 2-3x idle-deboost variance
    dt = run_tool("ReadQC", ["-in1", fq, "-out", f"{CACHE}/readqc.qcML"],
                  attempts=3)
    extra["readqc_e2e_reads_per_sec"] = round(n_reads / dt, 1)

    # (a2) same data bgzip-blocked: decode rides the parallel inflate pool
    # instead of the serial zlib stream (plain gz is inflate-bound)
    fq_bgzf = f"{CACHE}/readqc_5m.bgzf.fastq.gz"
    if not os.path.exists(fq_bgzf):
        from ngsbits_tpu.io.bgzf import bgzf_compress
        raw = gzip.decompress(open(fq, "rb").read())
        with open(fq_bgzf + ".tmp", "wb") as fh:
            fh.write(bgzf_compress(raw, level=1))
        os.replace(fq_bgzf + ".tmp", fq_bgzf)
    dt = run_tool("ReadQC", ["-in1", fq_bgzf, "-out", f"{CACHE}/readqc2.qcML"])
    extra["readqc_e2e_bgzf_reads_per_sec"] = round(n_reads / dt, 1)

    # (b) end-to-end SeqPurge: paired FASTQ -> trimmed gz
    sp1, sp2 = f"{CACHE}/sp_R1.fastq.gz", f"{CACHE}/sp_R2.fastq.gz"
    repeats = 256
    n_pairs = 2502 * repeats
    synth_seqpurge_pair(sp1, sp2, repeats)
    dt = run_tool("SeqPurge", [
        "-in1", sp1, "-in2", sp2,
        "-out1", f"{CACHE}/sp_o1.fastq.gz", "-out2", f"{CACHE}/sp_o2.fastq.gz",
        "-min_len", "15", "-ncut", "0", "-qcut", "0", "-summary",
        f"{CACHE}/sp_summary.txt"])
    extra["seqpurge_e2e_pairs_per_sec"] = round(n_pairs / dt, 1)

    # (b2) SeqPurge on bgzip-blocked input: decode rides the parallel BGZF
    # inflate pool (same routing ReadQC gets — FastqReader sniffs BGZF)
    sp1b, sp2b = f"{CACHE}/sp_R1.bgzf.fastq.gz", f"{CACHE}/sp_R2.bgzf.fastq.gz"
    for src, dst in ((sp1, sp1b), (sp2, sp2b)):
        if not os.path.exists(dst):
            from ngsbits_tpu.io.bgzf import bgzf_compress
            with open(dst + ".tmp", "wb") as fh:
                fh.write(bgzf_compress(gzip.decompress(open(src, "rb").read()),
                                       level=1))
            os.replace(dst + ".tmp", dst)
    dt = run_tool("SeqPurge", [
        "-in1", sp1b, "-in2", sp2b,
        "-out1", f"{CACHE}/sp_o1b.fastq.gz", "-out2", f"{CACHE}/sp_o2b.fastq.gz",
        "-min_len", "15", "-ncut", "0", "-qcut", "0"])
    extra["seqpurge_e2e_bgzf_pairs_per_sec"] = round(n_pairs / dt, 1)

    # (b3) analyze-stage scaling: pre-decoded batches through the C++
    # kernel at 1/2/4 threads — isolates analysis scaling from the 2-core
    # decode bound (VERDICT r3 item 6; ThreadCoordinator.cpp '>4 threads')
    extra["seqpurge_analyze_pairs_per_sec"] = seqpurge_analyze_scaling(
        sp1, sp2, n_pairs)

    # (c) end-to-end BedCoverage: 1M-read BAM + ROI -> coverage BED
    bam = f"{CACHE}/cov_1m.bam"
    n_bam_reads = 1_000_000
    synth_bam(bam, n_bam_reads)
    roi = f"{CACHE}/roi.bed"
    if not os.path.exists(roi):
        with open(roi, "w") as fh:
            for s in range(1_000_000, 201_000_000, 2_000_000):
                fh.write(f"chr1\t{s}\t{s + 150_000}\n")
    dt = run_tool("BedCoverage", ["-in", roi, "-bam", bam, "-out",
                                  f"{CACHE}/cov_out.bed"])
    extra["bedcoverage_e2e_reads_per_sec"] = round(n_bam_reads / dt, 1)

    # (d) end-to-end MappingQC (ROI mode) on the same BAM; a stub genome
    # (empty FASTA + .fai) stands in for the reference sequence — GC terms
    # compute against it identically run-to-run
    stub = f"{CACHE}/stub.fa"
    if not os.path.exists(stub + ".fai"):
        open(stub, "w").close()
        with open(stub + ".fai", "w") as fh:
            fh.write("chr1\t248956422\t6\t60\t61\n")
    dt = run_tool("MappingQC", ["-in", bam, "-out", f"{CACHE}/mq.qcML",
                                "-roi", roi, "-no_cont", "-ref", stub])
    extra["mappingqc_e2e_reads_per_sec"] = round(n_bam_reads / dt, 1)

    # device kernel rate (continuity with BENCH_r01-r03 headline)
    extra["readqc_kernel_reads_per_sec"] = round(kernel_metric(), 1)

    # measured single-core reference proxy on the same input
    proxy = baseline_proxy(fq, n_reads)
    extra["baseline_proxy_reads_per_sec"] = round(proxy, 1)

    # on-chip production-path e2e: same ReadQC invocation but with the
    # axon TPU backend live, so every batch rides the device path
    # (host decode -> device batch stats through the tunnel). Through the
    # tunnel this is transfer-bound — recorded for the honest comparison,
    # not as the headline.
    try:
        extra["readqc_e2e_onchip_reads_per_sec"] = round(
            n_reads / run_tool(
                "ReadQC", ["-in1", fq, "-out", f"{CACHE}/readqc_chip.qcML"],
                onchip=True), 1)
    except Exception as e:  # noqa: BLE001 — chip path must not kill bench
        extra["readqc_e2e_onchip_reads_per_sec"] = f"error: {str(e)[:120]}"

    # on-chip test lane outcome (VERDICT r3 item 1)
    try:
        extra["tpu_lane"] = tpu_lane_result()
    except Exception as e:  # noqa: BLE001 — lane failure must not kill bench
        extra["tpu_lane"] = {"error": str(e)[:200]}

    extra["method"] = {
        "e2e": "subprocess wall time, CPU backend, inputs page-cache warm, best-of-2",
        "kernel": "best-of-3 of 50 async dispatches, device-resident inputs, single v5e via axon tunnel",
        "baseline": ("measured in-run proxy: serial zlib inflate of the bench FASTQ "
                     "+ native C per-read accumulation (upper bound of the "
                     "unbuildable reference's single-core rate; no Qt dev toolchain "
                     "or cppCORE source in this image)"),
        "tpu_lane": "pytest -m tpu tests/test_tpu_lane.py on the real chip",
        "e2e_onchip": ("same ReadQC run with the axon TPU backend live and "
                       "verified (probe asserts default_backend=='tpu'); "
                       "auto dispatch is tunnel-aware, so per-batch stats "
                       "stay on the host here — forcing the device-resident "
                       "streaming route through the tunnel measures 122k "
                       "reads/s (packed ~9-bit/base upload, on-device int32 "
                       "accumulators, single EOF fetch; was 39k with "
                       "per-batch padded uploads — BASELINE.md round 5)"),
    }

    headline = extra.pop("readqc_e2e_reads_per_sec")
    print(json.dumps({
        "metric": "readqc_e2e_reads_per_sec",
        "value": headline,
        "unit": "reads/s",
        "vs_baseline": round(headline / proxy, 2),
        "extra": extra,
        "baseline_note": ("vs_baseline is measured against the in-run "
                          "single-core proxy (extra.baseline_proxy_reads_per_sec); "
                          "see extra.method.baseline"),
    }))


if __name__ == "__main__":
    main()
