"""VariantScores unit tests ported from cppNGS-TEST/VariantScores_Test.cpp
(rank_GSvar_v1 expectations on the reference fixtures)."""

import pytest

from ngsbits_tpu.core import variant_scores
from ngsbits_tpu.core.intervals import BedFile
from ngsbits_tpu.io.gsvar import GSvarFile

DIN = "/root/reference/src/cppNGS-TEST/data_in"


def _var_str(v):
    return f"{v.chr.str}:{v.start}-{v.end} {v.ref.decode()}>{v.obs.decode()}"


@pytest.fixture(scope="module")
def ranked():
    roi = BedFile.from_file(f"{DIN}/VariantScores_HP0003002.bed")
    gs = GSvarFile.from_file(f"{DIN}/VariantScores_in1.GSvar")
    params = variant_scores.Parameters()
    result = variant_scores.score("GSvar_v1", gs, {"HP0003002": roi}, params)
    return gs, result


def test_algorithms_and_descriptions():
    assert len(variant_scores.ALGORITHMS) >= 1
    for a in variant_scores.ALGORITHMS:
        assert variant_scores.description(a)


def test_rank_gsvar_v1(ranked):
    gs, result = ranked
    assert result.algorithm == "GSvar_v1"
    assert len(result.scores) == len(gs.variants)
    assert len(result.ranks) == len(gs.variants)
    assert result.warnings == []
    expected = {
        "chr2:178740622-178740622 A>C": (6.5, 1),
        "chr9:116958287-116958287 C>T": (6.5, 2),
        "chr2:29455199-29455199 A>T": (6.0, 3),
        "chr11:6638385-6638385 C>T": (6.0, 4),
        "chr16:3639230-3639230 G>A": (6.0, 5),
        "chr5:131925483-131925483 G>C": (5.5, 6),
        "chr2:234737380-234737380 G>T": (2.0, None),
        "chr14:106330070-106330070 G>A": (1.0, None),
        "chr7:100806448-100806448 C>G": (1.0, None),
        "chr1:866511-866511 ->CCCT": (-1.0, None),
    }
    for i, v in enumerate(gs.variants):
        key = _var_str(v)
        if key in expected:
            score, rank = expected[key]
            assert abs(result.scores[i] - score) < 1e-9, (key, result.scores[i])
            if rank is not None:
                assert result.ranks[i] == rank, (key, result.ranks[i])


def test_explanations_sum_matches_score(ranked):
    gs, result = ranked
    for i in range(len(result.scores)):
        if result.scores[i] >= 0:
            total = sum(float((e + ":").split(":")[1]) for e in result.score_explanations[i])
            assert abs(total - result.scores[i]) < 1e-9


def test_rank_gsvar_v1_no_ngsd():
    roi = BedFile.from_file(f"{DIN}/VariantScores_HP0003002.bed")
    gs = GSvarFile.from_file(f"{DIN}/VariantScores_in1.GSvar")
    params = variant_scores.Parameters()
    params.use_ngsd_classifications = False
    result = variant_scores.score("GSvar_v1", gs, {"HP0003002": roi}, params)
    assert len(result.scores) == len(gs.variants)
