"""ChainFileReader + BedLiftOver tests on a synthetic chain (the reference
tests need downloaded UCSC chain files; lifting semantics here are checked
against hand-computed block arithmetic)."""

import pytest

from helpers import execute, read_lines
from ngsbits_tpu.core.chromosome import Chromosome
from ngsbits_tpu.io.chain import ChainError, ChainFileReader


@pytest.fixture
def chain_file(tmp_path):
    # chain 1: chr1[100,300) -> chrA[1000,1200) with a 10bp deletion in ref
    #   blocks: 50 match, 10 ref gap, 140 match
    # chain 2: chr2[0,100) -> chrB minus strand [0,100) of size 500
    # trailing dummy chain (the reference drops the last chain of the file)
    p = tmp_path / "test.chain"
    p.write_text(
        "chain 100 chr1 1000 + 100 300 chrA 5000 + 1000 1200 1\n"
        "50\t10\t0\n"
        "140\n"
        "\n"
        "chain 90 chr2 500 + 0 100 chrB 500 - 0 100 2\n"
        "100\n"
        "\n"
        "chain 1 chrX 100 + 0 10 chrY 100 + 0 10 3\n"
        "10\n")
    return p


def test_chain_lift_basic(chain_file):
    r = ChainFileReader(str(chain_file), 0.05)
    # block1 covers 0-based [100,150) -> q [1000,1050); end at the gap boundary
    q_chr, s, e = r.lift(Chromosome("chr1"), 111, 150)
    assert (q_chr.str, s, e) == ("chrA", 1011, 1050)
    # fully inside second block: ref block2 covers 0-based [160,300) -> q [1050,1190)
    q_chr, s, e = r.lift(Chromosome("chr1"), 161, 200)
    assert (q_chr.str, s, e) == ("chrA", 1051, 1090)
    # spanning the 10bp ref gap: [141,170] has 10 deleted bases of 30 -> >5% unmapped
    with pytest.raises(ChainError):
        r.lift(Chromosome("chr1"), 141, 170)
    # same region with 50% allowed
    r2 = ChainFileReader(str(chain_file), 0.5)
    q_chr, s, e = r2.lift(Chromosome("chr1"), 141, 170)
    assert (q_chr.str, s, e) == ("chrA", 1041, 1060)
    # minus strand: chr2 0-based [10,20) -> q plus coords [10,20) -> minus: 500-20..500-10
    q_chr, s, e = r.lift(Chromosome("chr2"), 11, 20)
    assert (q_chr.str, s, e) == ("chrB", 481, 490)
    # last chain of the file is dropped (reference quirk)
    with pytest.raises(ChainError):
        r.lift(Chromosome("chrX"), 1, 5)
    # unknown chromosome
    with pytest.raises(ChainError):
        r.lift(Chromosome("chr9"), 1, 5)


def test_bed_liftover_tool(chain_file, tmp_path, capsys):
    bed = tmp_path / "in.bed"
    bed.write_text("#header\nchr1\t110\t150\tNAME1\nchr1\t140\t170\nchr2\t10\t20\n")
    out = tmp_path / "out.bed"
    unmapped = tmp_path / "unmapped.bed"
    assert execute("BedLiftOver", ["-in", bed, "-out", out, "-chain", chain_file,
                                   "-unmapped", unmapped]) == 0
    lines = read_lines(out)
    assert lines[0].startswith("#BedLiftOver: Lifted file using ")
    assert lines[1] == "#header"
    assert lines[2] == "chrA\t1010\t1050\tNAME1"
    assert lines[3] == "chrB\t480\t490"
    ul = read_lines(unmapped)
    assert ul[0].startswith("chr1:140-170\t#Error: ")
    stats = capsys.readouterr().out
    assert "Input regions : 3" in stats
    assert "lifted        : 2 (66.67%)" in stats
