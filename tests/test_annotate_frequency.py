"""Golden parity for VcfAnnotateFrequency / VariantAnnotateASE and a
cross-check for VariantAnnotateFrequency (its reference golden needs the
absent panel.bam fixture).

No reference genome ships here (reference CI gates on
SKIP_IF_NO_HG38_GENOME); for the SNV-only ASE tests the FASTA is a stub, and
for VcfAnnotateFrequency (one insertion variant) a consensus FASTA is
reconstructed from the test BAM's aligned bases — the only positions the
indel-region logic reads."""

import numpy as np
import pytest

from helpers import compare_files, execute, read_lines
from ngsbits_tpu.io.bam import BamReader


@pytest.fixture
def stub_ref(tmp_path):
    ref = tmp_path / "stub.fa"
    ref.write_text(">chr1\nACGT\n")
    (tmp_path / "stub.fa.fai").write_text("chr1\t4\t6\t4\t5\n")
    return ref


def consensus_fasta(bam_path, out_fa, vcf_path=None):
    """Majority-vote reference reconstruction from M-op aligned bases."""
    from ngsbits_tpu.io.bam import SEQ_NIBBLE_ASCII

    reader = BamReader(str(bam_path))
    by_chr = {}
    for batch in reader:
        for i in range(len(batch)):
            if batch.ref_id[i] < 0:
                continue
            chrom = reader.ref_names[batch.ref_id[i]]
            cnt = by_chr.setdefault(chrom, {})
            gpos = int(batch.pos[i]) + 1
            rpos = 0
            seq = batch.seq[batch.seq_off[i]:batch.seq_off[i + 1]]
            for c in batch.cigar[batch.cigar_off[i]:batch.cigar_off[i + 1]]:
                op, ln = int(c) & 0xF, int(c) >> 4
                if op in (0, 7, 8):
                    for k in range(ln):
                        key = gpos + k
                        base = bytes([int(SEQ_NIBBLE_ASCII[seq[rpos + k]])])
                        d = cnt.setdefault(key, {})
                        d[base] = d.get(base, 0) + 1
                    gpos += ln
                    rpos += ln
                elif op == 1:
                    rpos += ln
                elif op in (2, 3):
                    gpos += ln
                elif op == 4:
                    rpos += ln
    reader.close()
    if vcf_path:  # trust REF column over consensus at variant sites
        for line in read_lines(vcf_path):
            if line.startswith("#"):
                continue
            f = line.split("\t")
            for k, b in enumerate(f[3]):
                by_chr.setdefault(f[0], {})[int(f[1]) + k] = {b.encode(): 10 ** 9}
    with open(out_fa, "w") as fh, open(str(out_fa) + ".fai", "w") as fai:
        offset = 0
        for chrom, cnt in by_chr.items():
            if not cnt:
                continue
            length = max(cnt) + 10
            seq = bytearray(b"N" * length)
            for pos, d in cnt.items():
                seq[pos - 1] = max(d, key=d.get)[0]
            header = f">{chrom}\n"
            fh.write(header)
            offset += len(header)
            text = bytes(seq).decode()
            lines = [text[i:i + 60] for i in range(0, len(text), 60)]
            fai.write(f"{chrom}\t{length}\t{offset}\t60\t61\n")
            body = "\n".join(lines) + "\n"
            fh.write(body)
            offset += len(body)
    return out_fa


@pytest.mark.parametrize("args,golden", [
    (["-depth", "-name", "TEST_SAMPLE_01"], "VcfAnnotateFrequency_out1.vcf"),
    ([], "VcfAnnotateFrequency_out2.vcf"),
])
def test_vcf_annotate_frequency(ref_data_in, ref_data_out, tmp_path, args, golden):
    ref = consensus_fasta(ref_data_in / "VcfAnnotateFrequency_in1.bam",
                          tmp_path / "cons.fa",
                          ref_data_in / "VcfAnnotateFrequency_in1.vcf")
    out = tmp_path / "out.vcf"
    assert execute("VcfAnnotateFrequency", [
        "-in", ref_data_in / "VcfAnnotateFrequency_in1.vcf",
        "-bam", ref_data_in / "VcfAnnotateFrequency_in1.bam",
        "-out", out, "-ref", ref] + args) == 0
    compare_files(out, ref_data_out / golden)


@pytest.mark.parametrize("n,golden", [(1, "VariantAnnotateASE_out1.GSvar"),
                                      (2, "VariantAnnotateASE_out2.GSvar")])
def test_variant_annotate_ase(ref_data_in, ref_data_out, tmp_path, stub_ref, n, golden):
    out = tmp_path / "out.GSvar"
    assert execute("VariantAnnotateASE", [
        "-in", ref_data_in / f"VariantAnnotateASE_in{n}.GSvar",
        "-bam", ref_data_in / "rnaseq.bam",
        "-out", out, "-ref", stub_ref]) == 0
    compare_files(out, ref_data_out / golden,
                  strip_patterns=(r"^##VariantAnnotateASE_BAM=",))


def test_variant_annotate_frequency_cross_check(ref_data_in, tmp_path, stub_ref):
    """GSvar-path tool must agree with the VCF-path tool on the same BAM
    (same engine, different containers); also exercises -target placeholders."""
    from ngsbits_tpu.qc.variant_details import gsvar_from_vcf

    vcf_lines = [l.split("\t") for l in read_lines(ref_data_in / "VcfAnnotateFrequency_in1.vcf")
                 if not l.startswith("#")]
    ref = consensus_fasta(ref_data_in / "VcfAnnotateFrequency_in1.bam",
                          tmp_path / "cons.fa",
                          ref_data_in / "VcfAnnotateFrequency_in1.vcf")
    gsvar_in = tmp_path / "in.GSvar"
    rows = []
    for f in vcf_lines:
        s, e, r, o = gsvar_from_vcf(int(f[1]), f[3].encode(), f[4].encode())
        rows.append(f"{f[0]}\t{s}\t{e}\t{r.decode()}\t{o.decode()}\tx")
    gsvar_in.write_text("#chr\tstart\tend\tref\tobs\tgene\n" + "\n".join(rows) + "\n")

    out_gs = tmp_path / "out.GSvar"
    assert execute("VariantAnnotateFrequency", [
        "-in", gsvar_in, "-bam", ref_data_in / "VcfAnnotateFrequency_in1.bam",
        "-out", out_gs, "-depth", "-ref", ref]) == 0
    out_vcf = tmp_path / "out.vcf"
    assert execute("VcfAnnotateFrequency", [
        "-in", ref_data_in / "VcfAnnotateFrequency_in1.vcf",
        "-bam", ref_data_in / "VcfAnnotateFrequency_in1.bam",
        "-out", out_vcf, "-depth", "-ref", ref]) == 0

    gs_rows = [l.split("\t") for l in read_lines(out_gs) if not l.startswith("#")]
    vcf_rows = [l.split("\t") for l in read_lines(out_vcf) if not l.startswith("#")]
    assert len(gs_rows) == len(vcf_rows)
    for g, v in zip(gs_rows, vcf_rows):
        info = dict(kv.split("=") for kv in v[7].split(";") if "=" in kv)
        freq_gs = g[-2]
        depth_gs = g[-1]
        assert depth_gs == info["N_DP"]
        expected = "n/a" if info["N_DP"] == "0" else info["N_AF"]
        if expected == "0" and freq_gs == "n/a":
            continue  # invalid-float case maps to different placeholders
        assert freq_gs == expected

    # -target with an empty region: all placeholder columns
    target = tmp_path / "t.bed"
    target.write_text("chr9\t1\t100\n")
    out_t = tmp_path / "out_t.GSvar"
    assert execute("VariantAnnotateFrequency", [
        "-in", gsvar_in, "-bam", ref_data_in / "VcfAnnotateFrequency_in1.bam",
        "-out", out_t, "-depth", "-mapq0", "-target", target, "-ref", ref]) == 0
    for l in read_lines(out_t):
        if not l.startswith("#"):
            assert l.endswith(".\t.\t.")
