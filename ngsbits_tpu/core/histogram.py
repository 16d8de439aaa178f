"""Histogram with ngs-bits cppCORE ``Histogram`` semantics.

Inferred from call sites (cppNGS/Statistics.cpp, StatisticsReads.cpp):
- ``Histogram(min, max, bin_size)`` — inclusive [min, max] range.
- ``inc(x, ignore_bounds)`` — out-of-range values are silently dropped when
  ignore_bounds is set, otherwise raise.
- bin index = floor((x - min)/bin_size); x == max lands in the last bin.
- ``binValue(i, as_percentage)`` — count or percentage of total increments.
- ``xCoords()`` — bin centers; ``yCoords(percentage)`` — per-bin values.
"""

from __future__ import annotations

import numpy as np


class Histogram:
    def __init__(self, min_: float, max_: float, bin_size: float):
        if bin_size <= 0 or max_ < min_:
            raise ValueError("invalid histogram parameters")
        self.min = float(min_)
        self.max = float(max_)
        self.bin_size = float(bin_size)
        n = int(np.ceil((self.max - self.min) / self.bin_size))
        if n == 0:
            n = 1
        self._bins = np.zeros(n, dtype=np.float64)
        self._count = 0.0

    def bin_count(self) -> int:
        return len(self._bins)

    def _index(self, x: float) -> int:
        if x < self.min or x > self.max:
            return -1
        idx = int((x - self.min) / self.bin_size)
        if idx == len(self._bins):  # x == max
            idx -= 1
        return idx

    def inc(self, x: float, ignore_bounds: bool = False, weight: float = 1.0):
        idx = self._index(float(x))
        if idx < 0:
            if ignore_bounds:
                return
            raise ValueError(f"histogram value {x} out of bounds [{self.min},{self.max}]")
        self._bins[idx] += weight
        self._count += weight

    def inc_array(self, xs, ignore_bounds: bool = False, weights=None):
        xs = np.asarray(xs, dtype=np.float64)
        if weights is None:
            weights = np.ones_like(xs)
        weights = np.asarray(weights, dtype=np.float64)
        in_range = (xs >= self.min) & (xs <= self.max)
        if not ignore_bounds and not in_range.all():
            bad = xs[~in_range][0]
            raise ValueError(f"histogram value {bad} out of bounds [{self.min},{self.max}]")
        xs = xs[in_range]
        weights = weights[in_range]
        idx = ((xs - self.min) / self.bin_size).astype(np.int64)
        idx = np.minimum(idx, len(self._bins) - 1)
        np.add.at(self._bins, idx, weights)
        self._count += float(weights.sum())

    def add_counts(self, counts):
        """Merge a dense per-bin count vector (e.g. from a device partial)."""
        counts = np.asarray(counts, dtype=np.float64)
        if counts.shape != self._bins.shape:
            raise ValueError("count vector shape mismatch")
        self._bins += counts
        self._count += float(counts.sum())

    def count(self) -> float:
        return self._count

    def bin_value(self, i: int, as_percentage: bool = False) -> float:
        v = self._bins[i]
        if as_percentage:
            return 100.0 * v / self._count if self._count > 0 else 0.0
        return v

    def bin_sum(self) -> float:
        return float(self._bins.sum())

    def max_value(self, as_percentage: bool = False) -> float:
        v = float(self._bins.max())
        if as_percentage:
            return 100.0 * v / self._count if self._count > 0 else 0.0
        return v

    def x_coords(self) -> np.ndarray:
        return self.min + self.bin_size * (np.arange(len(self._bins)) + 0.5)

    def y_coords(self, as_percentage: bool = False) -> np.ndarray:
        if as_percentage:
            if self._count == 0:
                return np.zeros_like(self._bins)
            return 100.0 * self._bins / self._count
        return self._bins.copy()
