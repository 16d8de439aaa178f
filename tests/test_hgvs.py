"""VariantHgvsAnnotator unit tests on a fully synthetic mini-genome.

The reference's unit tests (cppNGS-TEST/VariantHgvsAnnotator_Test.cpp) need
the hg38 genome; here the genome is synthesized so every expected HGVS
string can be derived by hand from a known sequence.
"""

import pytest

from ngsbits_tpu.core.chromosome import Chromosome
from ngsbits_tpu.core.hgvs import HgvsVariant, VariantHgvsAnnotator
from ngsbits_tpu.core.intervals import BedFile, BedLine
from ngsbits_tpu.core.transcripts import Transcript

# --- synthetic genome ----------------------------------------------------
# chr1 layout (1-based):
#   1..100     intergenic filler ("T" * 100)
#   101..160   exon 1  (101..130 5'UTR, 131..160 CDS part 1: 30 bases)
#   161..200   intron 1
#   201..260   exon 2  (CDS part 2: 60 bases)
#   261..300   intron 2
#   301..400   exon 3  (301..330 CDS part 3: 30 bases, 331..400 3'UTR)
#   401..600   filler
#
# CDS (120 bases = 40 codons):
#   ATG GCT GAA TTT CTT AAA CCC GGG TGG CAT  (codons 1-10)
#   ATC GTC GAC GAG GCA CTG AAT AGA AGC ACT  (codons 11-20)
#   TAC TGC CAG CGA GAT GAA TTC GGT CAT ATT  (codons 21-30)
#   AAG CTG ATG AAC CCG AGT ACC GTG TGG TAA  (codons 31-40; TAA = stop)

CDS = ("ATGGCTGAATTTCTTAAACCCGGGTGGCAT"
       "ATCGTCGACGAGGCACTGAATAGAAGCACT"
       "TACTGCCAGCGAGATGAATTCGGTCATATT"
       "AAGCTGATGAACCCGAGTACCGTGTGGTAA")
assert len(CDS) == 120

UTR5 = "GGGGGCCCCCAAAAATTTTTGGGGGCCCCC"   # 30 bases (101..130)
UTR3 = "C" * 70                           # 331..400
INTRON1 = "GTAAGTATGTCCCCCCCCCCCCCCCCCCCCCCCCCCAG"[:40].ljust(40, "C")
INTRON2 = "GTAAGTGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGAG".ljust(40, "G")[:40]


def build_chr1() -> bytes:
    seq = ["T"] * 600
    def put(pos, s):
        for i, c in enumerate(s):
            seq[pos - 1 + i] = c
    put(101, UTR5)
    put(131, CDS[:30])
    put(161, INTRON1)
    put(201, CDS[30:90])
    put(261, INTRON2)
    put(301, CDS[90:120])
    put(331, UTR3)
    return "".join(seq).encode()


class MiniGenome:
    def __init__(self, chroms: dict):
        self.chroms = {Chromosome(c).str_normalized(True): s for c, s in chroms.items()}

    def _seq(self, chr_):
        key = chr_.str_normalized(True) if hasattr(chr_, "str_normalized") else Chromosome(chr_).str_normalized(True)
        return self.chroms[key]

    def seq(self, chr_, start, length, to_upper=True):
        s = self._seq(chr_)
        return s[max(0, start - 1):start - 1 + length]

    def length_of(self, chr_):
        return len(self._seq(chr_))


@pytest.fixture(scope="module")
def genome():
    return MiniGenome({"chr1": build_chr1()})


def make_transcript(plus=True) -> Transcript:
    t = Transcript(name="ENST00000000001", version=1, gene="TESTG", hgnc_id="HGNC:1",
                   chr=Chromosome("chr1"), strand="+", biotype="protein coding")
    regions = BedFile()
    regions.append(BedLine(Chromosome("chr1"), 101, 160))
    regions.append(BedLine(Chromosome("chr1"), 201, 260))
    regions.append(BedLine(Chromosome("chr1"), 301, 400))
    t.regions = regions
    t.coding_start, t.coding_end = 131, 330
    return t


@pytest.fixture(scope="module")
def anno(genome):
    return VariantHgvsAnnotator(genome, 5000, 3, 8, 8)


@pytest.fixture(scope="module")
def trans():
    return make_transcript()


def var(pos, ref, alt):
    return HgvsVariant(Chromosome("chr1"), pos, ref.encode(), alt.encode())


def test_snv_synonymous(anno, trans):
    # c.15 T>A: codon 5 CTT -> CTA, both Leu
    h = anno.annotate(trans, var(145, "T", "A"))
    assert h.hgvs_c == "c.15T>A"
    assert h.hgvs_p == "p.Leu5="
    assert "SYNONYMOUS_VARIANT" in h.types
    assert h.impact == "LOW"
    assert h.exon_number == 1 and h.intron_number == -1


def test_snv_missense(anno, trans):
    # c.4 G>A: codon 2 GCT -> ACT, Ala2Thr
    h = anno.annotate(trans, var(134, "G", "A"))
    assert h.hgvs_c == "c.4G>A"
    assert h.hgvs_p == "p.Ala2Thr"
    assert "MISSENSE_VARIANT" in h.types
    assert h.impact == "MODERATE"


def test_snv_stop_gained(anno, trans):
    # c.26 G>A: codon 9 TGG -> TAG = stop
    h = anno.annotate(trans, var(156, "G", "A"))
    assert h.hgvs_c == "c.26G>A"
    assert h.hgvs_p == "p.Trp9Ter"
    assert "STOP_GAINED" in h.types
    assert h.impact == "HIGH"


def test_snv_start_lost(anno, trans):
    # c.2 T>C: ATG -> ACG
    h = anno.annotate(trans, var(132, "T", "C"))
    assert h.hgvs_c == "c.2T>C"
    assert h.hgvs_p == "p.Met1?"
    assert "START_LOST" in h.types
    assert h.impact == "HIGH"


def test_snv_stop_lost(anno, trans):
    # c.118 T>C: codon 40 TAA -> CAA (Gln); extension, next stop in 3'UTR?
    # 3'UTR is all C -> no stop found -> extTer?
    h = anno.annotate(trans, var(328, "T", "C"))
    assert h.hgvs_c == "c.118T>C"
    assert h.hgvs_p == "p.Ter40GlnextTer?"
    assert "STOP_LOST" in h.types


def test_snv_5utr(anno, trans):
    # position 125 is 6 bases before CDS start (131) -> c.-6
    h = anno.annotate(trans, var(125, "T", "C"))
    assert h.hgvs_c == "c.-6T>C"
    assert "FIVE_PRIME_UTR_VARIANT" in h.types
    assert h.impact == "MODIFIER"


def test_snv_3utr(anno, trans):
    # position 335 is 5 bases after CDS end (330) -> c.*5
    h = anno.annotate(trans, var(335, "C", "A"))
    assert h.hgvs_c == "c.*5C>A"
    assert "THREE_PRIME_UTR_VARIANT" in h.types


def test_snv_intron_near_donor(anno, trans):
    # position 162 = second base of intron 1 -> c.30+2 (splice donor)
    h = anno.annotate(trans, var(162, "T", "C"))
    assert h.hgvs_c == "c.30+2T>C"
    assert "SPLICE_DONOR_VARIANT" in h.types
    assert "INTRON_VARIANT" in h.types
    assert h.hgvs_p == "p.?"
    assert h.impact == "HIGH"
    assert h.intron_number == 1


def test_snv_intron_acceptor(anno, trans):
    # position 199 = last-1 base of intron 1 -> c.31-2 (splice acceptor)
    h = anno.annotate(trans, var(199, "A", "C"))
    assert h.hgvs_c == "c.31-2A>C"
    assert "SPLICE_ACCEPTOR_VARIANT" in h.types
    assert h.impact == "HIGH"


def test_snv_deep_intron(anno, trans):
    # position 180: intron 1 (161..200): dist to prev exon end (160) = 20,
    # dist to next exon start (201) = 21 -> c.30+20
    h = anno.annotate(trans, var(180, "C", "G"))
    assert h.hgvs_c == "c.30+20C>G"
    assert "INTRON_VARIANT" in h.types
    assert h.impact == "MODIFIER"


def test_snv_upstream(anno, trans):
    h = anno.annotate(trans, var(50, "T", "C"))
    assert h.hgvs_c == ""
    assert "UPSTREAM_GENE_VARIANT" in h.types
    assert h.impact == "MODIFIER"


def test_frameshift_deletion(anno, trans):
    # VCF del: pos 134 ref "GC" alt "G" removes c.5 (C of GCT codon2)
    # codon2 GCT -> (G del? c.5) -- deleting base c.5
    h = anno.annotate(trans, var(134, "GC", "G"))
    assert "FRAMESHIFT_VARIANT" in h.types
    assert h.hgvs_c.startswith("c.") and h.hgvs_c.endswith("del")
    assert "fsTer" in h.hgvs_p
    assert h.impact == "HIGH"


def test_inframe_deletion(anno, trans):
    # delete codon 5 exactly: c.13_15 = CTT at 143..145; VCF: pos 142, ref TCTT alt T
    h = anno.annotate(trans, var(142, "TCTT", "T"))
    assert "INFRAME_DELETION" in h.types
    assert h.hgvs_p == "p.Leu5del"
    assert h.impact == "MODERATE"


def test_insertion_duplication(anno, trans):
    # insert "CTT" after position 145 duplicating codon 5 (CTT at 143..145)
    h = anno.annotate(trans, var(145, "T", "TCTT"))
    assert h.hgvs_c.endswith("dup")
    assert "INFRAME_INSERTION" in h.types


def test_intergenic_far_away(anno, genome):
    t = make_transcript()
    # max_dist_to_transcript=50 -> variant at pos 30 is >50 away from 101
    a = VariantHgvsAnnotator(genome, 50, 3, 8, 8)
    h = a.annotate(t, var(30, "T", "C"))
    assert h.hgvs_c == "" and h.types == set()


def test_minus_strand_transcript(anno, genome):
    # reverse-complement view: build a minus-strand transcript on the same
    # genome; CDS on minus strand at 301..330 won't translate to ATG, so use
    # a dedicated genome where the minus CDS makes sense
    from ngsbits_tpu.core.transcripts import reverse_complement
    seq = ["A"] * 400
    # minus-strand CDS: genomic 101..220 reverse-complemented = CDS
    cds_rc = reverse_complement(CDS.encode()).decode()
    for i, c in enumerate(cds_rc):
        seq[100 + i] = c
    g = MiniGenome({"chr2": "".join(seq).encode()})
    t = Transcript(name="ENST00000000002", version=1, gene="TESTG2", hgnc_id="HGNC:2",
                   chr=Chromosome("chr2"), strand="-", biotype="protein coding")
    regions = BedFile()
    regions.append(BedLine(Chromosome("chr2"), 101, 220))
    t.regions = regions
    t.coding_start, t.coding_end = 220, 101  # ATG at 220 (reverse)
    a = VariantHgvsAnnotator(g, 5000, 3, 8, 8)
    # c.2 on minus strand = genomic 219; ATG -> ACG: genomic base at 219 is
    # complement of T = A; change to G (complement C)
    h = a.annotate(t, HgvsVariant(Chromosome("chr2"), 219, b"A", b"G"))
    assert h.hgvs_c == "c.2T>C"
    assert h.hgvs_p == "p.Met1?"
    assert "START_LOST" in h.types
    # synonymous c.15 T>A (codon 5 CTT->CTA): c.15 = genomic 220-14 = 206,
    # genomic ref = complement(T) = A, alt = complement(A) = T
    h = a.annotate(t, HgvsVariant(Chromosome("chr2"), 206, b"A", b"T"))
    assert h.hgvs_c == "c.15T>A"
    assert h.hgvs_p == "p.Leu5="


def test_non_coding_transcript(anno, genome):
    t = Transcript(name="ENST00000000003", version=2, gene="NCG", hgnc_id="HGNC:3",
                   chr=Chromosome("chr1"), strand="+", biotype="lncRNA")
    regions = BedFile()
    regions.append(BedLine(Chromosome("chr1"), 101, 160))
    regions.append(BedLine(Chromosome("chr1"), 201, 260))
    t.regions = regions
    h = anno.annotate(t, var(105, "G", "A"))
    assert h.hgvs_c == "n.5G>A"
    assert "NON_CODING_TRANSCRIPT_EXON_VARIANT" in h.types
    h = anno.annotate(t, var(170, "C", "A"))
    assert h.hgvs_c.startswith("n.60+")
    assert "INTRON_VARIANT" in h.types


def test_vcf_annotate_consequence_tool(tmp_path):
    """End-to-end CLI drive with a synthetic genome + GFF3 + VCF."""
    from helpers import execute

    # genome FASTA
    chr1 = build_chr1().decode()
    fa = tmp_path / "mini.fa"
    body = "\n".join(chr1[i:i + 60] for i in range(0, len(chr1), 60))
    fa.write_text(">chr1\n" + body + "\n")
    with open(str(fa) + ".fai", "w") as fh:
        fh.write(f"chr1\t{len(chr1)}\t6\t60\t61\n")

    # GFF3 (Ensembl flavor)
    gff = tmp_path / "mini.gff3"
    gff.write_text("\n".join([
        "##gff-version 3",
        "\t".join(["chr1", "test", "gene", "101", "400", ".", "+", ".",
                   "ID=gene:ENSG00000000001;Name=TESTG;gene_id=ENSG00000000001;biotype=protein_coding;"
                   "description=test gene [Source:HGNC Symbol%3BAcc:HGNC:1]"]),
        "\t".join(["chr1", "test", "mRNA", "101", "400", ".", "+", ".",
                   "ID=transcript:ENST00000000001;Parent=gene:ENSG00000000001;"
                   "biotype=protein_coding;tag=basic;transcript_id=ENST00000000001;version=1"]),
        "\t".join(["chr1", "test", "exon", "101", "160", ".", "+", ".",
                   "Parent=transcript:ENST00000000001"]),
        "\t".join(["chr1", "test", "exon", "201", "260", ".", "+", ".",
                   "Parent=transcript:ENST00000000001"]),
        "\t".join(["chr1", "test", "exon", "301", "400", ".", "+", ".",
                   "Parent=transcript:ENST00000000001"]),
        "\t".join(["chr1", "test", "CDS", "131", "160", ".", "+", "0",
                   "Parent=transcript:ENST00000000001"]),
        "\t".join(["chr1", "test", "CDS", "201", "260", ".", "+", "1",
                   "Parent=transcript:ENST00000000001"]),
        "\t".join(["chr1", "test", "CDS", "301", "330", ".", "+", "2",
                   "Parent=transcript:ENST00000000001"]),
        "###",
    ]) + "\n")

    vcf = tmp_path / "in.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
        "chr1\t145\t.\tT\tA\t.\t.\t.",       # synonymous
        "chr1\t156\t.\tG\tA\t.\t.\t.",       # stop gained
        "chr1\t162\t.\tT\tC\t.\t.\t.",       # splice donor
        "chr1\t50\t.\tT\tC\t.\t.\t.",        # upstream
    ]) + "\n")

    out = tmp_path / "out.vcf"
    assert execute("VcfAnnotateConsequence", [
        "-in", vcf, "-gff", gff, "-ref", fa, "-out", out,
        "-splice_region_in5", "8", "-splice_region_in3", "8"]) == 0
    lines = [l for l in out.read_text().splitlines() if not l.startswith("#")]
    assert "CSQ=A|synonymous_variant|LOW|TESTG|HGNC:1|ENST00000000001.1|Transcript|1/3||c.15T>A|p.Leu5%3D" in lines[0]
    assert "stop_gained|HIGH|TESTG" in lines[1]
    assert "c.26G>A" in lines[1] and "p.Trp9Ter" in lines[1]
    assert "splice_donor_variant&intron_variant|HIGH" in lines[2]
    assert "c.30+2T>C" in lines[2]
    assert "upstream_gene_variant|MODIFIER" in lines[3]
    # header line present
    header = [l for l in out.read_text().splitlines() if l.startswith("##INFO=<ID=CSQ,")]
    assert len(header) == 1


def _write_mini_ref(tmp_path):
    chr1 = build_chr1().decode()
    fa = tmp_path / "mini.fa"
    body = "\n".join(chr1[i:i + 60] for i in range(0, len(chr1), 60))
    fa.write_text(">chr1\n" + body + "\n")
    with open(str(fa) + ".fai", "w") as fh:
        fh.write(f"chr1\t{len(chr1)}\t6\t60\t61\n")
    return fa


def _write_mini_gff(tmp_path):
    gff = tmp_path / "mini.gff3"
    gff.write_text("\n".join([
        "##gff-version 3",
        "\t".join(["chr1", "test", "gene", "101", "400", ".", "+", ".",
                   "ID=gene:ENSG00000000001;Name=TESTG;gene_id=ENSG00000000001;biotype=protein_coding;"
                   "description=test gene [Source:HGNC Symbol%3BAcc:HGNC:1]"]),
        "\t".join(["chr1", "test", "mRNA", "101", "400", ".", "+", ".",
                   "ID=transcript:ENST00000000001;Parent=gene:ENSG00000000001;"
                   "biotype=protein_coding;tag=basic,Ensembl_canonical;transcript_id=ENST00000000001;version=1"]),
        "\t".join(["chr1", "test", "exon", "101", "160", ".", "+", ".", "Parent=transcript:ENST00000000001"]),
        "\t".join(["chr1", "test", "exon", "201", "260", ".", "+", ".", "Parent=transcript:ENST00000000001"]),
        "\t".join(["chr1", "test", "exon", "301", "400", ".", "+", ".", "Parent=transcript:ENST00000000001"]),
        "\t".join(["chr1", "test", "CDS", "131", "160", ".", "+", "0", "Parent=transcript:ENST00000000001"]),
        "\t".join(["chr1", "test", "CDS", "201", "260", ".", "+", "1", "Parent=transcript:ENST00000000001"]),
        "\t".join(["chr1", "test", "CDS", "301", "330", ".", "+", "2", "Parent=transcript:ENST00000000001"]),
        "###",
    ]) + "\n")
    return gff


def test_ngsd_gene_burden_test(tmp_path, monkeypatch):
    """Synthetic burden test: HIGH-impact variant enriched in cases."""
    from helpers import execute

    monkeypatch.setenv("NGSBITS_NGSD_TEST", str(tmp_path / "ngsd.sqlite"))
    from ngsbits_tpu.ngsd import NGSD
    db = NGSD(True)
    db.init()
    db.run_mysql_file("/root/reference/src/tools-TEST/data_in/NGSDGeneBurdenTest_in.sql")
    db.execute("INSERT INTO gene (hgnc_id, symbol, name, type) VALUES (1, 'TESTG', 'test gene', 'protein-coding gene')")
    db.commit()

    fa = _write_mini_ref(tmp_path)
    gff = _write_mini_gff(tmp_path)
    assert execute("NGSDImportEnsembl", ["-test", "-in", gff]) == 0

    # variants: 3001 stop-gained (HIGH, codon9 TGG>TAG), 3002 synonymous (LOW)
    db.execute("INSERT INTO variant (id, chr, start, end, ref, obs, gnomad, cadd, spliceai, "
               "germline_het, germline_hom, germline_mosaic) VALUES "
               "(3001, 'chr1', 156, 156, 'G', 'A', 0.0001, 25.0, 0.1, 5, 0, 0)")
    db.execute("INSERT INTO variant (id, chr, start, end, ref, obs, gnomad, cadd, spliceai, "
               "germline_het, germline_hom, germline_mosaic) VALUES "
               "(3002, 'chr1', 145, 145, 'T', 'A', 0.0001, 1.0, 0.0, 5, 0, 0)")
    # cases 100..103 carry the HIGH variant, control 200 carries it too
    for ps in (100, 101, 102, 103, 200):
        db.execute(f"INSERT INTO detected_variant (processed_sample_id, variant_id, genotype) VALUES ({ps}, 3001, 'het')")
    # synonymous variant in cases (should NOT count with default impacts)
    for ps in (104, 105):
        db.execute(f"INSERT INTO detected_variant (processed_sample_id, variant_id, genotype) VALUES ({ps}, 3002, 'het')")
    db.commit()
    db.close()

    cases = tmp_path / "cases.txt"
    cases.write_text("".join(f"case0{i}_02\n" for i in range(10)))
    controls = tmp_path / "controls.txt"
    controls.write_text("".join(f"control0{i}_02\n" for i in range(10)))
    genes = tmp_path / "genes.txt"
    genes.write_text("TESTG\n")

    out = tmp_path / "out.tsv"
    assert execute("NGSDGeneBurdenTest", [
        "-test", "-cases", cases, "-controls", controls, "-genes", genes,
        "-out", out, "-ref", fa, "-threads", "1"]) == 0
    lines = [l for l in out.read_text().splitlines() if not l.startswith("#")]
    assert len(lines) == 1
    fields = lines[0].split("\t")
    assert fields[0] == "TESTG"
    assert fields[2] == "4"   # 4 case hits
    assert fields[4] == "1"   # 1 control hit
    # fisher greater: a=4 b=1 c=6 d=9
    from ngsbits_tpu.core.basicstats import fishers_exact_test
    assert abs(float(fields[1]) - fishers_exact_test(4, 1, 6, 9, "greater")) < 1e-6
    assert "case00_02: chr1:156 G>A" in fields[3]
    assert "control00_02: chr1:156 G>A" in fields[5]


def test_hgvs_to_vcf_tool(tmp_path, monkeypatch):
    """Synthetic end-to-end HgvsToVcf run against the mini NGSD/genome."""
    from helpers import execute

    monkeypatch.setenv("NGSBITS_NGSD_TEST", str(tmp_path / "ngsd.sqlite"))
    from ngsbits_tpu.ngsd import NGSD
    db = NGSD(True)
    db.init()
    db.execute("INSERT INTO gene (hgnc_id, symbol, name, type) VALUES (1, 'TESTG', 'test gene', 'protein-coding gene')")
    db.commit()
    db.close()
    fa = _write_mini_ref(tmp_path)
    gff = _write_mini_gff(tmp_path)
    assert execute("NGSDImportEnsembl", ["-test", "-in", gff]) == 0

    tsv = tmp_path / "in.tsv"
    tsv.write_text("#transcript\thgvs_c\tnote\n"
                   "ENST00000000001\tc.15T>A\tsyn\n"          # genomic chr1:145 T>A
                   "ENST00000000001\tc.30+2T>C\tintron\n"     # genomic chr1:162 T>C
                   "ENST00000000001\tc.-6G>C\tutr5\n"         # genomic chr1:125 G>C
                   "ENST00000000001.1\tc.13_15del\tdel\n"     # del CTT at 143..145
                   "ENSTUNKNOWN\tc.1A>G\tmissing\n")
    out = tmp_path / "out.vcf"
    assert execute("HgvsToVcf", ["-test", "-in", tsv, "-out", out, "-ref", fa]) == 0
    lines = [l for l in out.read_text().splitlines() if not l.startswith("#")]
    assert len(lines) == 4
    assert lines[0].startswith("chr1\t145\t.\tT\tA\t.\t.\tHGVSc=ENST00000000001:c.15T>A;note=syn")
    assert lines[1].startswith("chr1\t162\t.\tT\tC")
    assert lines[2].startswith("chr1\t125\t.\tG\tC")
    # deletion is left-aligned and VCF-converted with prefix base
    f = lines[3].split("\t")
    assert f[0] == "chr1" and len(f[3]) == 4 and len(f[4]) == 1


def test_maxentscan_scorer():
    """Scores pinned to the published MaxEntScan reference values
    (Yeo & Burge; same examples as the VEP plugin documentation)."""
    from ngsbits_tpu.tools.vcf_annotate_maxentscan import MaxEntScanScorer
    s = MaxEntScanScorer()
    assert abs(float(s.score5(b"CAGGTAAGT")) - 10.86) < 0.01
    assert abs(float(s.score3(b"TTCCAAACGAACTTTTGTAGGGA")) - 2.89) < 0.01


def test_vcf_annotate_maxentscan_tool(tmp_path):
    from helpers import execute
    fa = _write_mini_ref(tmp_path)
    gff = _write_mini_gff(tmp_path)
    vcf = tmp_path / "in.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
        "chr1\t201\t.\tA\tG\t.\t.\t.",   # near 3' splice site of exon 2 CDS
        "chr1\t160\t.\tT\tC\t.\t.\t.",   # near 5' splice site of exon 1 CDS
    ]) + "\n")
    out = tmp_path / "out.vcf"
    assert execute("VcfAnnotateMaxEntScan", ["-in", vcf, "-gff", gff, "-ref", fa,
                                             "-out", out, "-swa"]) == 0
    lines = [l for l in out.read_text().splitlines() if not l.startswith("#")]
    assert "MES=" in lines[0] and "MES_SWA=" in lines[0]
    assert "MES=" in lines[1]
    # MES entries have format ref&alt&transcript
    mes = [f for f in lines[0].split("\t")[7].split(";") if f.startswith("MES=")][0]
    assert mes.endswith("&ENST00000000001")
    header = [l for l in out.read_text().splitlines() if l.startswith("##INFO=<ID=MES,")]
    assert len(header) == 1


def test_vcf_annotate_hexplorer_tool(tmp_path):
    from helpers import execute
    fa = _write_mini_ref(tmp_path)
    vcf = tmp_path / "in.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
        "chr1\t161\t.\tG\tC\t.\t.\t.",   # destroys the GT donor at intron 1
    ]) + "\n")
    out = tmp_path / "out.vcf"
    assert execute("VcfAnnotateHexplorer", ["-in", vcf, "-out", out, "-ref", fa]) == 0
    lines = [l for l in out.read_text().splitlines() if not l.startswith("#")]
    info = lines[0].split("\t")[7]
    assert "hexplorer_delta=" in info and "hexplorer_wt=" in info
    # wildtype contains the canonical donor GTAAGTATGTC (intron 1 start) -> HBond wt > 0
    assert "max_hbond_wt=" in info
    headers = [l for l in out.read_text().splitlines() if l.startswith("##INFO=<ID=hexplorer")]
    assert len(headers) == 6
    # cross-check one HZEI value against an independent recomputation
    from ngsbits_tpu.tools.vcf_annotate_hexplorer import load_hexplorer_zscores
    z = load_hexplorer_zscores()
    seq = build_chr1()[150:181]  # wt context of chr1:161 (start-10, len 21+ref-1)
    wt_seq = build_chr1()[150:171]
    total = 0.0
    for i in range(5, len(wt_seq) - 5):
        und = wt_seq[i - 5:i + 6]
        total += sum(float(z.get(und[k:k + 6], 0.0)) for k in range(6)) / 6
    expected = total / (len(wt_seq) - 10)
    got = float([e for e in info.split(";") if e.startswith("hexplorer_wt=")][0].split("=")[1])
    assert abs(got - expected) < 0.01
