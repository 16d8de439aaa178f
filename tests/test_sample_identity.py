"""SampleIdentity on synthetic BAMs over the embedded 75-SNP identity panel.

The reference test (SampleIdentity_Test.cpp) uses hg38 CRAMs + the genome
FASTA (absent here); instead, two synthetic BAMs are built whose reads cover
the first identity SNPs: identical genotypes must correlate ~1.0, opposite
genotypes must not pass the identity threshold.
"""

import types

import numpy as np
import pytest

from helpers import execute
from ngsbits_tpu.core import resources
from ngsbits_tpu.io import bam as bamio
from ngsbits_tpu.io.bam import BamRecord, BamWriter


def _nib(seq: bytes) -> np.ndarray:
    lut = {65: 1, 67: 2, 71: 4, 84: 8, 78: 15}
    return np.array([lut[c] for c in seq], dtype=np.uint8)


def _make_bam(path, snps, allele_of, depth=20, read_len=51):
    """One BAM whose reads cover each SNP with `depth` reads of base
    allele_of(snp)."""
    header_reader = types.SimpleNamespace(
        header_text="@HD\tVN:1.6\tSO:coordinate\n" + "".join(
            f"@SQ\tSN:{name}\tLN:{length}\n" for name, length in _HG38_SQ),
        ref_names=[n for n, _ in _HG38_SQ],
        ref_lengths=[l for _, l in _HG38_SQ],
    )
    w = BamWriter(str(path), header_reader)
    ref_index = {n: i for i, (n, _) in enumerate(_HG38_SQ)}
    records = []
    for line in snps:
        chrom = line.chr.str
        if chrom not in ref_index:
            continue
        base = allele_of(line)
        pos0 = line.start - 1 - read_len // 2  # read centered on the SNP
        for d in range(depth):
            r = BamRecord()
            r.ref_id = ref_index[chrom]
            r.pos = pos0 + (d % 3)  # slight stagger
            # re-center the SNP base for the staggered position
            sq = bytearray(b"A" * read_len)
            sq[line.start - 1 - r.pos] = base
            r.flag = bamio.FLAG_PAIRED | bamio.FLAG_PROPER_PAIR | (0x40 if d % 2 == 0 else 0x80)
            r.mapq = 60
            r.name = f"r{chrom}_{line.start}_{d}".encode()
            r.cigar = np.array([(read_len << 4) | 0], dtype=np.uint32)  # M
            r.seq = _nib(bytes(sq))
            r.qual = np.full(read_len, 35, dtype=np.uint8)
            r.mate_ref_id = r.ref_id
            r.mate_pos = r.pos
            r.tlen = read_len
            r.tags = b""
            records.append((r.ref_id, r.pos, r))
    records.sort(key=lambda t: (t[0], t[1]))
    for _, _, r in records:
        bamio.write_record(w, r)
    w.close()


_HG38_SQ = []


def _build_sq():
    # reference lengths for the chromosomes used by the identity panel (hg38)
    lens = {"chr1": 248956422, "chr2": 242193529, "chr3": 198295559,
            "chr4": 190214555, "chr5": 181538259, "chr6": 170805979,
            "chr7": 159345973, "chr8": 145138636, "chr9": 138394717,
            "chr10": 133797422, "chr11": 135086622, "chr12": 133275309,
            "chr13": 114364328, "chr14": 107043718, "chr15": 101991189,
            "chr16": 90338345, "chr17": 83257441, "chr18": 80373285,
            "chr19": 58617616, "chr20": 64444167, "chr21": 46709983,
            "chr22": 50818468, "chrX": 156040895, "chrY": 57227415}
    return list(lens.items())


_HG38_SQ.extend(_build_sq())


@pytest.fixture(scope="module")
def identity_snps():
    return [l for l in resources.identity_snps_vcf()][:50]


def test_same_sample_detected(tmp_path, identity_snps):
    b1 = tmp_path / "s1.bam"
    b2 = tmp_path / "s2.bam"
    # both homozygous-ref at every SNP -> identical genotype vectors
    _make_bam(b1, identity_snps, lambda l: l.ref[0])
    _make_bam(b2, identity_snps, lambda l: l.ref[0])
    out = tmp_path / "out.tsv"
    assert execute("SampleIdentity", ["-bams", str(b1), str(b2), "-out", out,
                                      "-min_depth", "10", "-min_snps", "20",
                                      "-basename"]) == 0
    rows = [l for l in out.read_text().splitlines() if not l.startswith("#")]
    assert len(rows) == 1, out.read_text()
    fields = rows[0].split("\t")
    # basename strips the extension (SampleIdentity_out1.tsv golden)
    assert fields[0] == "s1" and fields[1] == "s2"
    assert float(fields[3]) == 100.0          # identity percentage


def test_different_sample_not_reported(tmp_path, identity_snps):
    b1 = tmp_path / "s1.bam"
    b2 = tmp_path / "s2.bam"
    _make_bam(b1, identity_snps, lambda l: l.ref[0])

    def alt_of(line):
        a = line.alt() if callable(line.alt) else line.alt
        a0 = a[0] if isinstance(a, (list, tuple)) else a
        return a0[0] if isinstance(a0, (bytes, bytearray)) else ord(str(a0)[0])
    _make_bam(b2, identity_snps, alt_of)
    out = tmp_path / "out.tsv"
    assert execute("SampleIdentity", ["-bams", str(b1), str(b2), "-out", out,
                                      "-min_depth", "10", "-min_snps", "20",
                                      "-basename"]) == 0
    rows = [l for l in out.read_text().splitlines() if not l.startswith("#")]
    assert rows == [], out.read_text()
