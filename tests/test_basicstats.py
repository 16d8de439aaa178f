"""Pins kernel math to the reference's pinned values
(cppCORE-TEST/BasicStatistics_Test.cpp)."""

import math

import pytest

from ngsbits_tpu.core import basicstats as bs


def test_match_probability_pinned():
    assert math.isclose(bs.match_probability(0.1, 1, 1), 0.100, abs_tol=1e-9)
    assert math.isclose(bs.match_probability(0.1, 1, 2), 0.190, abs_tol=1e-9)
    assert math.isclose(bs.match_probability(0.1, 1, 3), 0.271, abs_tol=1e-9)
    assert math.isclose(bs.match_probability(0.1, 1, 5), 0.40951, abs_tol=1e-9)
    assert math.isclose(bs.match_probability(0.1, 5, 5), 0.00001, abs_tol=1e-9)


def test_match_probability_table_matches_scalar():
    table = bs.match_probability_table(0.25, 50)
    for count, matches in [(1, 1), (10, 3), (50, 40), (50, 0), (33, 33)]:
        assert math.isclose(table[count, matches],
                            bs.match_probability(0.25, matches, count), rel_tol=1e-12)


@pytest.mark.parametrize("a,b,c,d,expected", [
    (1, 2, 3, 0, 0.4),
    (2, 7, 8, 2, 0.023014),
    (1, 9, 11, 3, 0.00276),
    (13, 0, 19, 25, 0.00021),
    (16, 21, 15, 8, 0.11752),
    (7, 8, 12, 12, 1.00000),
    (14, 15, 22, 0, 0.00003),
])
def test_fishers_exact_two_sided(a, b, c, d, expected):
    assert math.isclose(bs.fishers_exact_test(a, b, c, d, "two-sided"), expected, abs_tol=1e-5)


def test_round_half_away():
    assert bs.round_half_away(0.5) == 1.0
    assert bs.round_half_away(1.5) == 2.0
    assert bs.round_half_away(2.5) == 3.0
    assert bs.round_half_away(-0.5) == -1.0
    assert bs.round_half_away(2.4) == 2.0


def test_match_probability_large_count_reduction():
    """Counts beyond the 170! double limit reduce by halving matches and
    mismatches separately (int truncation).  Pinned by the UpdHunter
    positive1 goldens (UpdHunter_out2.tsv Q-scores 617.78/701.26/659.19),
    whose unique reproducing reduced pairs are (9,98)/(23,140)/(30,117)."""
    p = 0.0023545960491713046
    for big, reduced in [((157, 1590), (9, 98)),
                         ((190, 1129), (23, 140)),
                         ((120, 469), (30, 117))]:
        assert math.isclose(bs.match_probability(p, *big),
                            bs.match_probability(p, *reduced), rel_tol=1e-15)


def test_histogram_bin_semantics_randomized():
    """Histogram(min,max,bin_size) semantics pinned against a brute-force
    model over random configurations (cppCORE Histogram: inclusive bounds,
    values binned by floor((x-min)/bin_size) clamped to the last bin;
    out-of-bounds raises unless ignore_bounds)."""
    import numpy as np
    import pytest as _pytest

    from ngsbits_tpu.core.histogram import Histogram

    rng = np.random.default_rng(9)
    for _ in range(25):
        lo = float(rng.integers(-5, 5))
        # dyadic bin sizes: exactly representable, so ceil((max-min)/
        # bin_size) has no float-rounding ambiguity (the 0.05-style
        # production bins are pinned by the qcML goldens instead)
        bin_size = float(rng.choice([0.25, 0.5, 1.0, 4.0]))
        nbins = int(rng.integers(1, 30))
        hi = lo + bin_size * nbins
        h = Histogram(lo, hi, bin_size)
        assert h.bin_count() == nbins
        xs = rng.uniform(lo, hi, size=200)
        expected = np.zeros(nbins)
        for x in xs:
            h.inc(float(x))
            expected[min(int((x - lo) / bin_size), nbins - 1)] += 1
        got = np.array([h.bin_value(i) for i in range(nbins)])
        np.testing.assert_array_equal(got, expected)
        assert h.count() == 200
        # inclusive upper bound lands in the last bin
        h.inc(hi)
        assert h.bin_value(nbins - 1) == expected[-1] + 1
        # out-of-bounds: error unless ignored
        with _pytest.raises(Exception):
            h.inc(hi + bin_size)
        before = h.count()
        h.inc(hi + bin_size, ignore_bounds=True)
        assert h.count() == before
