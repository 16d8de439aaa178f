"""QC statistics engines (the ngs-bits ``Statistics`` class analogue).

Behavioral reference: cppNGS/Statistics.cpp. Each engine gets added here as
its tool lands; heavy inner loops live in ``ngsbits_tpu.ops`` (device code),
these functions do orchestration + report assembly.
"""

from __future__ import annotations

import math

import numpy as np

from ..core.intervals import BedFile
from ..core.qcml import QCCollection, QCValue


def region(bed_file: BedFile, merge: bool) -> QCCollection:
    """Target-region statistics (Statistics.cpp:1381-1441)."""
    regions = BedFile()
    regions.lines = [l for l in bed_file.lines]
    regions.headers = list(bed_file.headers)
    is_sorted = regions.is_sorted()

    # reference semantics: isMerged() = no overlapping fragments (after sort)
    def _is_merged(rf: BedFile) -> bool:
        lines = sorted(rf.lines, key=lambda l: l.sort_key()) if not rf.is_sorted() else rf.lines
        for i in range(1, len(lines)):
            if lines[i - 1].overlaps(lines[i].chr, lines[i].start, lines[i].end):
                return False
        return True

    is_merged = _is_merged(regions)
    if not is_merged and merge:
        regions = BedFile()
        regions.lines = [type(l)(l.chr, l.start, l.end, list(l.annotations)) for l in bed_file.lines]
        regions.merge()
        is_merged = True
        is_sorted = True

    chromosomes = set()
    lengths = np.array([l.length() for l in regions.lines], dtype=np.float64)
    for l in regions.lines:
        chromosomes.add(l.chr)
    length_min = int(lengths.min()) if len(lengths) else 2**31 - 1
    length_max = int(lengths.max()) if len(lengths) else -(2**31)
    length_sum = float(lengths.sum())
    length_mean = length_sum / len(lengths) if len(lengths) else float("nan")
    sq_sum = float((lengths * lengths).sum())
    length_stdev = (math.sqrt(sq_sum / len(lengths) - length_mean * length_mean)
                    if len(lengths) else float("nan"))

    chr_list = sorted(chromosomes, key=lambda c: c.num)
    chr_list_str = ", ".join(c.str_normalized(False) for c in chr_list)

    out = QCCollection()
    out.insert(QCValue.from_double("roi_bases", length_sum, "Number of bases in the (merged) target region."))
    out.insert(QCValue.from_int("roi_fragments", len(regions.lines), "Number of (merged) target regions."))
    out.insert(QCValue.from_string("roi_chromosomes", f"{len(chromosomes)} ({chr_list_str})", "Chromosomes in the target region."))
    out.insert(QCValue.from_string("roi_is_sorted", "yes" if is_sorted else "no", "If the target region is sorted according to chromosome and start position."))
    out.insert(QCValue.from_string("roi_is_merged", "yes" if is_merged else "no", "If the target region is merged, i.e. it has no overlapping fragments."))
    out.insert(QCValue.from_int("roi_fragment_min", length_min, "Minimum fragment size of (merged) target region."))
    out.insert(QCValue.from_int("roi_fragment_max", length_max, "Maximum fragment size of (merged) target region."))
    out.insert(QCValue.from_double("roi_fragment_mean", length_mean, "Mean fragment size of (merged) target region."))
    out.insert(QCValue.from_double("roi_fragment_stdev", length_stdev, "Fragment size standard deviation of (merged) target region."))
    return out
