"""Golden parity for BedToEpigen, ExtractMethylationData, FastaChecksumUpdate,
BamCleanHaloplex (reference tools-TEST fixtures).

ExtractMethylationData needs an hg38 genome (reference test gates on
SKIP_IF_NO_HG38_GENOME); none ships here, so a sparse stub FASTA is
synthesized with the correct C/G base at each queried locus — the only
positions the tool reads."""

import pytest

from helpers import compare_files, execute


@pytest.fixture
def stub_hg38_for_loci(tmp_path):
    """Sparse chr22 FASTA + .fai covering the loci file's CpG positions."""
    loci = "/root/reference/src/tools-TEST/data_in/ExtractMethylationData_loci1.bed"
    ref = tmp_path / "hg38.fa"
    header = ">chr22\n"
    linebases, linewidth = 60, 61
    offset = len(header)
    chr_len = 50_818_468
    nlines = (chr_len + linebases - 1) // linebases
    size = offset + (nlines - 1) * linewidth + (chr_len - (nlines - 1) * linebases)
    with open(ref, "wb") as fh:
        fh.write(header.encode())
        fh.truncate(size)
        for line in open(loci):
            if line.startswith("#"):
                continue
            chrom, start, end, strand = line.split("\t")[:4]
            pos = int(start) + 1 if strand == "+" else int(end)  # 1-based C/G position
            base = b"C" if strand == "+" else b"G"
            fh.seek(offset + (pos - 1) // linebases * linewidth + (pos - 1) % linebases)
            fh.write(base)
    with open(str(ref) + ".fai", "w") as fh:
        fh.write(f"chr22\t{chr_len}\t{offset}\t{linebases}\t{linewidth}\n")
    return ref


def test_extract_methylation_default(ref_data_in, ref_data_out, tmp_path, stub_hg38_for_loci):
    out = tmp_path / "out1.bed"
    assert execute("ExtractMethylationData", [
        "-in", ref_data_in / "ExtractMethylationData_in1.bed.gz",
        "-loci", ref_data_in / "ExtractMethylationData_loci1.bed",
        "-ref", stub_hg38_for_loci, "-out", out]) == 0
    compare_files(out, ref_data_out / "ExtractMethylationData_out1.bed")


def test_extract_methylation_type_columns(ref_data_in, ref_data_out, tmp_path, stub_hg38_for_loci):
    out = tmp_path / "out2.bed"
    assert execute("ExtractMethylationData", [
        "-add_methylation_types",
        "-in", ref_data_in / "ExtractMethylationData_in1.bed.gz",
        "-loci", ref_data_in / "ExtractMethylationData_loci1.bed",
        "-ref", stub_hg38_for_loci, "-out", out]) == 0
    compare_files(out, ref_data_out / "ExtractMethylationData_out2.bed")


@pytest.mark.parametrize("infile", ["BedToEpigen_in1.bed.gz", "BedToEpigen_in2.bed"])
def test_bed_to_epigen(ref_data_in, ref_data_out, tmp_path, infile):
    out = tmp_path / "out.tsv"
    assert execute("BedToEpigen", [
        "-sample", "HG002_01", "-id_file", ref_data_in / "BedToEpigen_in_ids.csv",
        "-in", ref_data_in / infile, "-out", out]) == 0
    compare_files(out, ref_data_out / "BedToEpigen_out1.tsv")


def test_fasta_checksum_update(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "out1.fa"
    assert execute("FastaChecksumUpdate", [
        "-in", ref_data_in / "FastaChecksumUpdate_in1.fa", "-out", out]) == 0
    compare_files(out, ref_data_out / "FastaChecksumUpdate_out1.fa")


def test_bam_clean_haloplex(ref_data_in, tmp_path, capsys):
    # the reference golden needs the absent panel.bam fixture; check the
    # flagging semantics (BamCleanHaloplex/main.cpp:41-58) on BamFilter_in1
    # with a min_match high enough to fail some reads.
    from ngsbits_tpu.io.bam import (BamReader, FLAG_DUPLICATE, FLAG_SECONDARY,
                                    FLAG_SUPPLEMENTARY, FLAG_UNMAPPED)
    import numpy as np

    src = ref_data_in / "BamFilter_in1.bam"
    out = tmp_path / "out1.bam"
    assert execute("BamCleanHaloplex", ["-in", src, "-out", out, "-min_match", "50"]) == 0
    stats = capsys.readouterr().out.splitlines()
    c_reads = int(stats[0].split(":")[1])
    c_failed = int(stats[2].split(":")[1].split("(")[0])
    assert c_reads > 0 and 0 < c_failed < c_reads

    # recompute expected failures from the input and compare flags in output
    def m_sums(path):
        r = BamReader(str(path))
        rows = []
        for b in r:
            rec = np.repeat(np.arange(len(b)), b.n_cigar)
            m = np.bincount(rec, weights=np.where((b.cigar & 0xF) == 0,
                                                  b.cigar >> 4, 0), minlength=len(b))
            for i in range(len(b)):
                rows.append((b.name(i), int(b.flag[i]), int(m[i])))
        r.close()
        return rows

    before = m_sums(src)
    after = m_sums(out)
    assert len(before) == len(after)
    n_failed = 0
    for (_, f0, m0), (_, f1, _) in zip(before, after):
        considered = (f0 & (FLAG_UNMAPPED | FLAG_SECONDARY | FLAG_SUPPLEMENTARY | FLAG_DUPLICATE)) == 0
        if considered and m0 < 50:
            n_failed += 1
            assert f1 == f0 | FLAG_UNMAPPED | FLAG_SECONDARY
        else:
            assert f1 == f0
    assert n_failed == c_failed
