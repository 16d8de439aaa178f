"""Randomized IO round-trips and batch-split invariance.

The reference processes records one at a time; this framework batches.
Every batched engine must therefore be invariant to how the stream is cut
into batches — pinned here over random inputs for FASTQ IO, ReadQC
accumulation, and SeqPurge trim decisions (the goldens only ever use one
block size)."""

from __future__ import annotations

import gzip

import numpy as np
import pytest

from helpers import execute


def _random_fastq(path, rng, n, long_read=False):
    lut = np.frombuffer(b"ACGTN", dtype=np.uint8)
    qmax = 126 if long_read else 74
    recs = []
    with gzip.open(path, "wb") as fh:
        for i in range(n):
            ln = int(rng.integers(1, 1200 if long_read else 160))
            seq = lut[rng.integers(0, 5, size=ln)].tobytes()
            qual = rng.integers(33, qmax, size=ln).astype(np.uint8).tobytes()
            rec = b"@read_%d some comment\n%s\n+\n%s\n" % (i, seq, qual)
            fh.write(rec)
            recs.append((b"@read_%d some comment" % i, seq, qual))
    return recs


@pytest.mark.parametrize("seed,long_read", [(1, False), (2, False), (3, True)])
def test_fastq_reader_batch_split_invariance(tmp_path, seed, long_read):
    rng = np.random.default_rng(seed)
    fq = tmp_path / "r.fastq.gz"
    recs = _random_fastq(fq, rng, 230, long_read)
    from ngsbits_tpu.io.fastq import FastqReader
    for batch_reads in (7, 64, 1 << 16):
        got = []
        for b in FastqReader(str(fq), batch_reads=batch_reads,
                             keep_headers=True, long_read=long_read):
            b.materialize_headers()
            for i in range(len(b)):
                ln = int(b.lengths[i])
                got.append((b.header_bytes(i), b.bases[i, :ln].tobytes(),
                            b.quals[i, :ln].tobytes()))
        assert got == recs, f"batch_reads={batch_reads} altered the records"


@pytest.mark.parametrize("seed", [4, 5])
def test_fastq_writer_roundtrip(tmp_path, seed):
    """FastqReader -> FastqWriter -> decompressed bytes identical to the
    original decompressed input."""
    rng = np.random.default_rng(seed)
    fq = tmp_path / "in.fastq.gz"
    _random_fastq(fq, rng, 150)
    out = tmp_path / "out.fastq.gz"
    # FastqConcat of one file is a pure read->write pass-through
    assert execute("FastqConcat", ["-in", fq, "-out", out]) == 0
    assert gzip.decompress(out.read_bytes()) == gzip.decompress(fq.read_bytes())


def test_readqc_qcml_batch_split_invariance(tmp_path):
    """The complete ReadQC qcML must not depend on decode batch size."""
    rng = np.random.default_rng(6)
    fq = tmp_path / "r.fastq.gz"
    _random_fastq(fq, rng, 400)
    import ngsbits_tpu.io.fastq as fastq_mod
    from ngsbits_tpu.qc.read_stats import FORWARD, ReadStatistics
    results = []
    for batch_reads in (13, 111, 1 << 16):
        stats = ReadStatistics(single_end=True)
        for b in fastq_mod.FastqReader(str(fq), batch_reads=batch_reads):
            stats.update_batch(b, FORWARD)
        qc = stats.get_result()
        results.append([(v.accession, str(v.value)) for v in qc
                        if v.type.name != "IMAGE"])
    assert results[0] == results[1] == results[2]


@pytest.mark.parametrize("seed", [7, 8])
def test_seqpurge_output_block_size_invariance(tmp_path, seed):
    """Trimmed outputs must be byte-identical for any -block_size."""
    rng = np.random.default_rng(seed)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    adapter1 = b"AGATCGGAAGAGCACACGTCTGAACTCCAGTCA"
    adapter2 = b"AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGT"
    f1 = tmp_path / "R1.fastq.gz"
    f2 = tmp_path / "R2.fastq.gz"
    comp = dict(zip(b"ACGT", b"TGCA"))
    with gzip.open(f1, "wb") as o1, gzip.open(f2, "wb") as o2:
        for i in range(300):
            insert_len = int(rng.integers(20, 140))
            insert = lut[rng.integers(0, 4, size=insert_len)].tobytes()
            L = 100
            # read1 = insert + adapter1..., read2 = revcomp(insert) + adapter2...
            r1 = (insert + adapter1 + bytes(lut[rng.integers(0, 4, size=L)]))[:L]
            rc = bytes(comp[c] for c in reversed(insert))
            r2 = (rc + adapter2 + bytes(lut[rng.integers(0, 4, size=L)]))[:L]
            q = bytes([60]) * L
            o1.write(b"@p%d/1\n%s\n+\n%s\n" % (i, r1, q))
            o2.write(b"@p%d/2\n%s\n+\n%s\n" % (i, r2, q))
    outs = []
    for bs in ("17", "100", "4096"):
        o1 = tmp_path / f"o1_{bs}.fastq.gz"
        o2 = tmp_path / f"o2_{bs}.fastq.gz"
        assert execute("SeqPurge", ["-in1", f1, "-in2", f2, "-out1", o1,
                                    "-out2", o2, "-block_size", bs]) == 0
        outs.append((gzip.decompress(o1.read_bytes()),
                     gzip.decompress(o2.read_bytes())))
    assert outs[0] == outs[1] == outs[2]


def _random_vcf_text(rng, n_samples=2, n_vars=120) -> bytes:
    # canonical store order (contigs directly after fileformat, like the
    # reference's VcfFile writer emits them)
    lines = [b"##fileformat=VCFv4.2",
             b"##contig=<ID=chr1,length=248956422>",
             b"##contig=<ID=chr2,length=242193529>",
             b'##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">',
             b'##INFO=<ID=AF,Number=A,Type=Float,Description="AF">',
             b'##INFO=<ID=DB,Number=0,Type=Flag,Description="dbSNP">',
             b'##FILTER=<ID=q10,Description="Quality below 10">',
             b'##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
             b'##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Depth">']
    hdr = b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
    if n_samples:
        hdr += b"\tFORMAT" + b"".join(b"\tS%d" % i for i in range(n_samples))
    lines.append(hdr)
    bases = b"ACGT"
    pos_by_chr = {b"chr1": 100, b"chr2": 100}
    for i in range(n_vars):
        chrom = b"chr1" if rng.random() < 0.6 else b"chr2"
        pos_by_chr[chrom] += int(rng.integers(1, 5000))
        ref = bytes([bases[rng.integers(0, 4)]])
        if rng.random() < 0.25:  # indel
            ref += bytes(bases[j] for j in rng.integers(0, 4, size=rng.integers(1, 5)))
        alt = bytes([bases[rng.integers(0, 4)]])
        if alt == ref:
            alt = b"T" if ref != b"T" else b"A"
        if rng.random() < 0.15:  # multiallelic
            alt += b"," + (b"G" if alt[:1] != b"G" else b"C")
        info_parts = [b"DP=%d" % rng.integers(1, 500)]
        if rng.random() < 0.5:
            info_parts.append(b"AF=%.4g" % rng.random())
        if rng.random() < 0.3:
            info_parts.append(b"DB")
        # integer or missing QUAL (the writer prints whole-number quals
        # without a decimal point, like the reference)
        qual = b"." if rng.random() < 0.2 else b"%d" % rng.integers(0, 900)
        row = [chrom, b"%d" % pos_by_chr[chrom], b"rs%d" % i if rng.random() < 0.4 else b".",
               ref, alt, qual, b"PASS" if rng.random() < 0.8 else b"q10",
               b";".join(info_parts)]
        if n_samples:
            row.append(b"GT:DP")
            for _s in range(n_samples):
                gt = [b"0/0", b"0/1", b"1/1", b"./."][rng.integers(0, 4)]
                row.append(gt + b":%d" % rng.integers(0, 99))
        lines.append(b"\t".join(row))
    return b"\n".join(lines) + b"\n"


@pytest.mark.parametrize("seed,n_samples", [(10, 0), (11, 1), (12, 3)])
def test_vcf_load_store_roundtrip(tmp_path, seed, n_samples):
    """VcfFile load -> store must be byte-identical for well-formed VCFs
    (single/multi-sample, multiallelic, flags, missing values)."""
    from ngsbits_tpu.io.vcf import VcfFile, vcf_store
    rng = np.random.default_rng(seed)
    text = _random_vcf_text(rng, n_samples=n_samples)
    p = tmp_path / "r.vcf"
    p.write_bytes(text)
    out = tmp_path / "o.vcf"
    vcf_store(VcfFile.from_file(str(p)), str(out))
    assert out.read_bytes() == text


@pytest.mark.parametrize("seed", [13, 14])
def test_vcf_sort_is_stable_and_ordered(tmp_path, seed):
    """VcfSort on a shuffled VCF: positions ordered per chromosome and the
    record multiset preserved."""
    from helpers import execute
    rng = np.random.default_rng(seed)
    text = _random_vcf_text(rng, n_samples=1)
    lines = text.splitlines()
    hdr = [l for l in lines if l.startswith(b"#")]
    body = [l for l in lines if not l.startswith(b"#")]
    rng.shuffle(body)
    p = tmp_path / "shuf.vcf"
    p.write_bytes(b"\n".join(hdr + body) + b"\n")
    out = tmp_path / "sorted.vcf"
    assert execute("VcfSort", ["-in", p, "-out", out]) == 0
    got = [l for l in out.read_bytes().splitlines() if not l.startswith(b"#")]
    assert sorted(got) == sorted(body)
    by_chr = {}
    for l in got:
        c, pos = l.split(b"\t", 2)[:2]
        by_chr.setdefault(c, []).append(int(pos))
    for positions in by_chr.values():
        assert positions == sorted(positions)


def test_remote_inputs_over_http(tmp_path):
    """BAM/VCF/BED/FASTQ readers accept http:// URLs (VersatileFile parity:
    cppCORE VersatileFile + htslib remote access in the reference); the BAI
    sibling is fetched too so random access works."""
    import functools
    import http.server
    import shutil
    import threading

    din = "/root/reference/src/tools-TEST/data_in"
    web = tmp_path / "web"
    web.mkdir()
    for f in ("BamDownsample_in1.bam", "VcfSort_in1.vcf",
              "VariantFilterRegions_in.bed", "ReadQC_in1.fastq.gz"):
        shutil.copy(f"{din}/{f}", web / f)
    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=str(web))
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        from ngsbits_tpu.core.intervals import BedFile
        from ngsbits_tpu.io.bam import BamReader
        from ngsbits_tpu.io.fastq import FastqReader
        from ngsbits_tpu.io.vcf import VcfFile

        r = BamReader(f"{base}/BamDownsample_in1.bam")
        n = sum(len(b) for b in r)
        r.close()
        local = BamReader(f"{din}/BamDownsample_in1.bam")
        n_local = sum(len(b) for b in local)
        local.close()
        assert n == n_local > 0

        vcf = VcfFile.from_file(f"{base}/VcfSort_in1.vcf")
        assert len(vcf) == len(VcfFile.from_file(f"{din}/VcfSort_in1.vcf")) > 0

        bed = BedFile.from_file(f"{base}/VariantFilterRegions_in.bed")
        assert len(bed.lines) == len(
            BedFile.from_file(f"{din}/VariantFilterRegions_in.bed").lines) > 0

        n_fq = sum(len(b) for b in FastqReader(f"{base}/ReadQC_in1.fastq.gz"))
        n_fq_local = sum(len(b) for b in FastqReader(f"{din}/ReadQC_in1.fastq.gz"))
        assert n_fq == n_fq_local > 0

        # remote CRAM goes through the __new__ dispatch (query string kept)
        shutil.copy("/root/reference/src/cppNGS-TEST/data_in/cramTest.cram",
                    web / "cramTest.cram")
        r = BamReader(f"{base}/cramTest.cram?x=1")
        n_cram = sum(len(b) for b in iter(r.read_batch, None))
        local = BamReader("/root/reference/src/cppNGS-TEST/data_in/cramTest.cram")
        n_cram_local = sum(len(b) for b in iter(local.read_batch, None))
        assert n_cram == n_cram_local > 0
    finally:
        srv.shutdown()


def test_remote_tabix_and_bigwig(tmp_path):
    """Tabix-indexed and BigWig annotation sources accept http:// URLs."""
    import functools
    import http.server
    import shutil
    import threading

    din = "/root/reference/src/tools-TEST/data_in"
    web = tmp_path / "web"
    web.mkdir()
    for f in ("VcfAnnotateFromVcf_an1_ClinVar.vcf.gz",
              "VcfAnnotateFromVcf_an1_ClinVar.vcf.gz.tbi"):
        shutil.copy(f"{din}/{f}", web / f)
    bw_src = "/root/reference/src/cppNGS-TEST/data_in/BigWigReader.bw"
    shutil.copy(bw_src, web / "BigWigReader.bw")
    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=str(web))
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        from ngsbits_tpu.io.bigwig import BigWigReader
        from ngsbits_tpu.io.tabix import TabixIndexedFile
        remote = TabixIndexedFile(f"{base}/VcfAnnotateFromVcf_an1_ClinVar.vcf.gz")
        local = TabixIndexedFile(f"{din}/VcfAnnotateFromVcf_an1_ClinVar.vcf.gz")
        # any chromosome present in the local index must fetch identically
        import gzip as _gz
        with _gz.open(f"{din}/VcfAnnotateFromVcf_an1_ClinVar.vcf.gz", "rb") as fh:
            for raw in fh:
                if not raw.startswith(b"#"):
                    chrom = raw.split(b"\t", 1)[0].decode()
                    break
        assert list(remote.get_matching_lines(chrom, 1, 10_000_000)) == \
            list(local.get_matching_lines(chrom, 1, 10_000_000))

        bw_remote = BigWigReader(f"{base}/BigWigReader.bw")
        bw_local = BigWigReader(bw_src)
        assert bw_remote.chromosomes == bw_local.chromosomes
    finally:
        srv.shutdown()


def test_gsvar_load_store_roundtrip(tmp_path):
    """GSvarFile load -> store byte identity on a fixture and a synthetic
    list (comments, headers, annotations preserved verbatim)."""
    from ngsbits_tpu.io.gsvar import GSvarFile

    text = (b"##ANALYSISTYPE=GERMLINE_SINGLESAMPLE\n"
            b"##SAMPLE=<ID=NA12878,Gender=female>\n"
            b"##DESCRIPTION=filter=Annotations for filtering\n"
            b"#chr\tstart\tend\tref\tobs\tNA12878\tfilter\tquality\tgene\tcoding_and_splicing\n"
            b"chr1\t100\t100\tA\tC\thet\t\tQUAL=30\tG1\tG1:HIGH:x\n"
            b"chr2\t500\t502\tCCT\t-\thom\toff-target\tQUAL=12;DP=9\tG2\tG2:MODERATE:y\n")
    p = tmp_path / "a.GSvar"
    p.write_bytes(text)
    out = tmp_path / "b.GSvar"
    GSvarFile.from_file(str(p)).store(str(out))
    assert out.read_bytes() == text

    # reference fixture too (if present): full annotation surface
    import os
    fx = "/root/reference/src/tools-TEST/data_in/NGSDAddVariantsGermline_in1.GSvar"
    if os.path.exists(fx):
        out2 = tmp_path / "c.GSvar"
        GSvarFile.from_file(fx).store(str(out2))
        assert out2.read_bytes() == open(fx, "rb").read()


def test_bedpe_load_store_roundtrip(tmp_path):
    """BedpeFile load -> store byte identity on reference SV fixtures."""
    import glob

    from ngsbits_tpu.io.bedpe import BedpeFile

    checked = 0
    for fx in sorted(glob.glob(
            "/root/reference/src/tools-TEST/data_in/BedpeSort_in*.bedpe"))[:3]:
        out = tmp_path / ("rt_" + fx.rsplit("/", 1)[1])
        BedpeFile.from_file(fx).store(str(out))
        # fixtures may lack a final newline or contain stray blank lines
        # the parser drops (the reference's does too) — compare the
        # non-empty lines
        got = [l for l in out.read_bytes().splitlines() if l.strip()]
        want = [l for l in open(fx, "rb").read().splitlines() if l.strip()]
        assert got == want, fx
        checked += 1
    assert checked > 0


def test_pipeline_chain_seqpurge_readqc_bamfilter(tmp_path):
    """Mini-pipeline interop: SeqPurge-trimmed output feeds ReadQC; a BAM
    flows BamFilter -> BamToFastq -> ReadQC — outputs of one tool are
    valid inputs of the next (the megSAP-style chaining the reference's
    tools are built for)."""
    din = "/root/reference/src/tools-TEST/data_in"
    o1 = tmp_path / "t1.fastq.gz"
    o2 = tmp_path / "t2.fastq.gz"
    assert execute("SeqPurge", ["-in1", f"{din}/SeqPurge_in1.fastq.gz",
                                "-in2", f"{din}/SeqPurge_in2.fastq.gz",
                                "-out1", o1, "-out2", o2,
                                "-ncut", "0", "-qcut", "0", "-min_len", "15"]) == 0
    qc = tmp_path / "trimmed.qcML"
    assert execute("ReadQC", ["-in1", o1, "-in2", o2, "-out", qc]) == 0
    text = qc.read_text()
    assert 'accession="QC:2000005"' in text  # read count present
    assert "qcML" in text

    bam_f = tmp_path / "filtered.bam"
    assert execute("BamFilter", ["-in", f"{din}/BamFilter_in1.bam",
                                 "-out", bam_f]) == 0
    fq1 = tmp_path / "from_bam_R1.fastq.gz"
    fq2 = tmp_path / "from_bam_R2.fastq.gz"
    assert execute("BamToFastq", ["-in", bam_f, "-out1", fq1,
                                  "-out2", fq2]) == 0
    qc2 = tmp_path / "from_bam.qcML"
    assert execute("ReadQC", ["-in1", fq1, "-in2", fq2, "-out", qc2]) == 0
    assert 'accession="QC:2000005"' in qc2.read_text()
