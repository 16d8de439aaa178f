"""Basic statistics helpers.

Behavioral reference: ngs-bits cppCORE ``BasicStatistics`` (values pinned by
reference tests ``cppCORE-TEST/BasicStatistics_Test.cpp:144-200``).
All computation is float64 on the host; hot paths precompute tables that the
device kernels index into.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np


def is_valid_float(x: float) -> bool:
    return not (math.isnan(x) or math.isinf(x))


def mean(values) -> float:
    values = np.asarray(values, dtype=np.float64)
    if values.size == 0:
        raise ValueError("mean of empty input")
    return float(values.mean())


def stdev(values, m: float | None = None) -> float:
    values = np.asarray(values, dtype=np.float64)
    if values.size == 0:
        raise ValueError("stdev of empty input")
    if m is None:
        m = values.mean()
    # reference uses population stdev (divide by n)
    return float(np.sqrt(np.mean((values - m) ** 2)))


def median(values) -> float:
    """Median of a *sorted* or unsorted array, reference semantics:
    even count -> mean of the two middle elements is NOT used; ngs-bits
    ``BasicStatistics::median(vals, false)`` returns element n/2 for even n
    when ``average_if_even`` is false. We default to numpy median (averaged)
    and provide q50 for the element-based variant."""
    values = np.sort(np.asarray(values, dtype=np.float64))
    return float(np.median(values))


def median_element(values) -> float:
    """ngs-bits-style median: for even n returns element at index n/2 of the
    sorted array (no averaging)."""
    values = np.sort(np.asarray(values, dtype=np.float64))
    n = values.size
    if n == 0:
        raise ValueError("median of empty input")
    return float(values[n // 2])


def q1(values) -> float:
    """cppCORE BasicStatistics::q1 — element at index floor(n/4) of the
    sorted array (semantics pinned by cppCORE-TEST/BasicStatistics_Test.cpp)."""
    values = np.sort(np.asarray(values, dtype=np.float64))
    if values.size == 0:
        raise ValueError("q1 of empty input")
    return float(values[values.size // 4])


def q3(values) -> float:
    """cppCORE BasicStatistics::q3 — element at index floor(3n/4) of the
    sorted array."""
    values = np.sort(np.asarray(values, dtype=np.float64))
    if values.size == 0:
        raise ValueError("q3 of empty input")
    return float(values[3 * values.size // 4])


def correlation(x, y) -> float:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if x.size != y.size or x.size == 0:
        raise ValueError("correlation input size mismatch/empty")
    xm = x.mean()
    ym = y.mean()
    num = float(((x - xm) * (y - ym)).sum())
    den = math.sqrt(float(((x - xm) ** 2).sum()) * float(((y - ym) ** 2).sum()))
    if den == 0.0:
        return float("nan")
    return num / den


@lru_cache(maxsize=None)
def _log_factorials(n: int) -> np.ndarray:
    return np.concatenate([[0.0], np.cumsum(np.log(np.arange(1, n + 1, dtype=np.float64)))])


FACTORIAL_LIMIT = 170  # largest n with finite double factorial (reference cache)

# double-precision factorial table (BasicStatistics::precalculateFactorials:
# iterative double multiplication; values overflow to inf above 170!)
with np.errstate(over="ignore"):
    _FACTORIALS = np.concatenate([[1.0], np.cumprod(np.arange(1, 200, dtype=np.float64))])


def factorial(n: int) -> float:
    """BasicStatistics::factorial — inf beyond the finite-double range."""
    if n < len(_FACTORIALS):
        return float(_FACTORIALS[n])
    return float("inf")


def match_probability(p: float, matches: int, count: int) -> float:
    """Binomial tail probability P(X >= matches) for X ~ Binom(count, p).

    Pinned by reference tests: (0.1,1,1)->0.100, (0.1,1,2)->0.190,
    (0.1,1,3)->0.271, (0.1,1,5)->0.40951, (0.1,5,5)->0.00001.

    For count beyond the reference's factorial table (170! is the largest
    finite double) the reference recursively halves *matches* and
    *mismatches* separately with integer truncation (count' =
    matches/2 + (count-matches)/2) until the sum is computable.  The
    scheme was reverse-engineered from the UpdHunter_out2.tsv goldens:
    (157,1590)->(9,98), (190,1129)->(23,140), (120,469)->(30,117) are
    the unique integer pairs reproducing the golden Q-scores, and the
    matches/mismatches halving chain is the unique rule hitting all
    three (see tests/test_basicstats.py).
    """
    if matches > count:
        raise ValueError("matches > count")
    while count > FACTORIAL_LIMIT:
        mismatches = (count - matches) // 2
        matches //= 2
        count = matches + mismatches
    lf = _log_factorials(count)
    log_p = math.log(p)
    log_q = math.log1p(-p) if p < 1.0 else -math.inf
    total = 0.0
    for k in range(matches, count + 1):
        log_term = lf[count] - lf[k] - lf[count - k] + k * log_p + (count - k) * log_q
        total += math.exp(log_term)
    return min(total, 1.0)


def match_probability_table(p: float, max_count: int) -> np.ndarray:
    """[count, matches] -> P(X>=matches | n=count). Shape (max_count+1, max_count+1).

    Used by the SeqPurge device kernel as a gather table so that trim
    decisions are bit-identical to the host formula.
    """
    n = max_count
    lf = _log_factorials(n)
    counts = np.arange(n + 1)
    table = np.ones((n + 1, n + 1), dtype=np.float64)
    log_p = math.log(p)
    log_q = math.log1p(-p)
    for c in counts:
        k = np.arange(0, c + 1, dtype=np.int64)
        log_terms = lf[c] - lf[k] - lf[c - k] + k * log_p + (c - k) * log_q
        pmf = np.exp(log_terms)
        tail = np.cumsum(pmf[::-1])[::-1]  # tail[k] = P(X>=k)
        row = np.ones(n + 1, dtype=np.float64)
        row[: c + 1] = np.minimum(tail, 1.0)
        row[c + 1:] = 0.0
        table[c] = row
    return table


def fishers_exact_test(a: int, b: int, c: int, d: int, alternative: str = "two-sided") -> float:
    """Fisher's exact test on a 2x2 table [[a,b],[c,d]].

    Matches the reference's pinned values (two-sided: sum of all tables with
    probability <= observed).
    """
    n = a + b + c + d
    lf = _log_factorials(n)

    def hyper(a_, b_, c_, d_):
        return math.exp(
            lf[a_ + b_] + lf[c_ + d_] + lf[a_ + c_] + lf[b_ + d_]
            - lf[n] - lf[a_] - lf[b_] - lf[c_] - lf[d_]
        )

    p_obs = hyper(a, b, c, d)
    row1 = a + b
    col1 = a + c
    a_min = max(0, col1 - (c + d))
    a_max = min(row1, col1)
    if alternative == "two-sided":
        total = 0.0
        for a_ in range(a_min, a_max + 1):
            p_ = hyper(a_, row1 - a_, col1 - a_, n - row1 - col1 + a_)
            if p_ <= p_obs * (1 + 1e-12):
                total += p_
        return min(total, 1.0)
    elif alternative == "less":
        return min(sum(hyper(a_, row1 - a_, col1 - a_, n - row1 - col1 + a_)
                       for a_ in range(a_min, a + 1)), 1.0)
    elif alternative == "greater":
        return min(sum(hyper(a_, row1 - a_, col1 - a_, n - row1 - col1 + a_)
                       for a_ in range(a, a_max + 1)), 1.0)
    raise ValueError(f"unknown alternative '{alternative}'")


def round_half_away(x) -> np.ndarray:
    """std::round semantics: round half away from zero (numpy rounds half to
    even, which differs for *.5 values)."""
    x = np.asarray(x)
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))

