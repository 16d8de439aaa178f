"""Variant-list QC engines (VariantQC).

Behavioral reference: ngs-bits Statistics::variantList (cppNGS/
Statistics.cpp:96-254) and Statistics::phasing (:256-341). Metric
descriptions come from the qcML ontology (addQcValue semantics,
Statistics.cpp:2904-2941).
"""

from __future__ import annotations

import numpy as np

from ..core.histogram import Histogram
from ..core.intervals import BedFile, BedLine
from ..core.ontology import qcml_terms
from ..core.plots import BarPlot
from ..core.qcml import QCCollection, QCValue
from ..io.vcf import VcfFile


def add_qc_value(output: QCCollection, accession: str, name: str, value):
    terms = qcml_terms()
    if not terms.contains(accession):
        raise RuntimeError(f"qcML does not contain term with accession '{accession}'!")
    term = terms.get(accession)
    if term.name != name:
        raise RuntimeError(f"qcML term with accession '{accession}' does not have name '{name}'!")
    if isinstance(value, bool):
        raise TypeError("bool QC value")
    if isinstance(value, (int, np.integer)):
        qv = QCValue.from_int(name, int(value), term.definition, accession)
    elif isinstance(value, (float, np.floating)):
        qv = QCValue.from_double(name, float(value), term.definition, accession)
    else:
        qv = QCValue.from_string(name, str(value), term.definition, accession)
    output.insert(qv)


def add_qc_plot(output: QCCollection, accession: str, name: str, png_b64: bytes):
    terms = qcml_terms()
    if not terms.contains(accession):
        raise RuntimeError(f"qcML does not contain term with accession '{accession}'!")
    term = terms.get(accession)
    if term.name != name:
        raise RuntimeError(f"qcML term with accession '{accession}' does not have name '{name}'!")
    output.insert(QCValue.image_from_base64(name, png_b64, term.definition, accession))


def _passing_flags(variants: VcfFile, filter_: bool) -> np.ndarray:
    flags = np.ones(len(variants), dtype=bool)
    if filter_:
        for i in range(len(variants)):
            flags[i] = variants[i].filters_passed()
    return flags


def variant_list(variants: VcfFile, filter_: bool) -> QCCollection:
    if len(variants.sample_ids()) > 1:
        raise ValueError("Can not generate QCCollection for a vcf file with multiple samples.")

    output = QCCollection()
    csq_exists = variants.header.info_id_defined("CSQ")
    rs_exists = variants.header.info_id_defined("RS")

    flags = _passing_flags(variants, filter_)
    vars_passing = int(flags.sum())

    add_qc_value(output, "QC:2000013", "variant count", vars_passing)

    if vars_passing == 0:
        add_qc_value(output, "QC:2000014", "known variants percentage", "n/a (no variants)")
    elif not csq_exists and not rs_exists:
        add_qc_value(output, "QC:2000014", "known variants percentage", "n/a (CSQ info field missing)")
    else:
        dbsnp = 0
        for i in range(len(variants)):
            if not flags[i]:
                continue
            if b"|rs" in variants[i].info("CSQ"):
                dbsnp += 1
            elif variants[i].info("RS").startswith(b"rs"):
                dbsnp += 1
        add_qc_value(output, "QC:2000014", "known variants percentage", 100.0 * dbsnp / vars_passing)

    if vars_passing == 0:
        add_qc_value(output, "QC:2000015", "high-impact variants percentage", "n/a (no variants)")
    elif not csq_exists:
        add_qc_value(output, "QC:2000015", "high-impact variants percentage", "n/a (CSQ info field missing)")
    else:
        high = sum(1 for i in range(len(variants))
                   if flags[i] and b"|HIGH|" in variants[i].info("CSQ"))
        add_qc_value(output, "QC:2000015", "high-impact variants percentage", 100.0 * high / vars_passing)

    gt_exists = variants.header.format_id_defined("GT")
    if vars_passing != 0 and gt_exists:
        hom = 0
        for i in range(len(variants)):
            if not flags[i]:
                continue
            geno = variants[i].format_value("GT")
            if geno in (b"1/1", b"1|1"):
                hom += 1
        add_qc_value(output, "QC:2000016", "homozygous variants percentage", 100.0 * hom / vars_passing)
    else:
        add_qc_value(output, "QC:2000016", "homozygous variants percentage",
                     "n/a (GT annotation not found, or no variants)")

    indel_count = 0
    ti_count = 0
    tv_count = 0
    for i in range(len(variants)):
        if not flags[i]:
            continue
        v = variants[i]
        ref = v.ref
        alt0 = v.alt(0)
        if (len(alt0) > 1 and len(ref) == 1) or (len(alt0) == 1 and len(ref) > 1):
            indel_count += 1
        elif ((alt0 == b"A" and ref == b"G") or (alt0 == b"G" and ref == b"A")
              or (alt0 == b"T" and ref == b"C") or (alt0 == b"C" and ref == b"T")):
            ti_count += 1
        else:
            tv_count += 1

    if vars_passing != 0:
        add_qc_value(output, "QC:2000017", "indel variants percentage", 100.0 * indel_count / vars_passing)
    else:
        add_qc_value(output, "QC:2000017", "indel variants percentage", "n/a (no variants)")

    if tv_count != 0:
        add_qc_value(output, "QC:2000018", "transition/transversion ratio", ti_count / tv_count)
    else:
        add_qc_value(output, "QC:2000018", "transition/transversion ratio",
                     "n/a (no variants or tansversions)")

    mosaic = 0
    for i in range(len(variants)):
        if flags[i]:
            continue
        if b"mosaic" in variants[i].filters:
            mosaic += 1
    add_qc_value(output, "QC:2000142", "mosaic variant count", mosaic)

    return output


def phasing(variants: VcfFile, filter_: bool, phasing_blocks: BedFile) -> QCCollection:
    if len(variants.sample_ids()) > 1:
        raise ValueError("Can not generate QCCollection for a vcf file with multiple samples.")

    output = QCCollection()
    flags = _passing_flags(variants, filter_)

    current: BedLine | None = None
    n_phased = 0
    n_het = 0
    for i in range(len(variants)):
        if not flags[i]:
            continue
        v = variants[i]
        genotype = v.format_value("GT")
        if genotype in (b"0/1", b"1/0", b"0|1", b"1|0"):
            n_het += 1
        block_id = v.format_value("PS").strip()
        if block_id == b".":
            continue
        n_phased += 1
        if current is not None:
            if block_id == current.annotations[0]:
                current.end = v.end
            else:
                phasing_blocks.append(current)
                current = BedLine(v.chr, v.start, v.end, [block_id])
        else:
            current = BedLine(v.chr, v.start, v.end, [block_id])
    if current is not None:
        phasing_blocks.append(current)

    block_sizes = np.array([l.length() for l in phasing_blocks.lines], dtype=np.float64)
    mean_size = float(block_sizes.mean())
    # NOTE: the reference passes the UNSORTED block list to
    # BasicStatistics::median (Statistics.cpp:320), which indexes the middle
    # element without sorting — pinned by the VariantQC_test04 golden.
    n = len(block_sizes)
    median_size = (float(block_sizes[n // 2]) if n % 2 == 1
                   else 0.5 * float(block_sizes[n // 2 - 1] + block_sizes[n // 2]))
    max_size = float(block_sizes.max())
    add_qc_value(output, "QC:2000133", "mean phasing block size", mean_size)
    add_qc_value(output, "QC:2000134", "median phasing block size", median_size)
    add_qc_value(output, "QC:2000135", "phasing block count", len(phasing_blocks.lines))
    add_qc_value(output, "QC:2000136", "phased variants percentage",
                 100.00 * (np.float32(n_phased) / n_het if n_het else float("nan")))

    hist = Histogram(0, max_size / 1000.0, (max_size * 0.05) / 1000.0)
    for s in block_sizes:
        hist.inc(s / 1000.0, False)
    plot = BarPlot()
    plot.set_xlabel("phasing block size (kb)")
    plot.set_ylabel("count")
    plot.set_values(hist.y_coords(False), [str(x) for x in hist.x_coords()])
    add_qc_plot(output, "QC:2000137", "phasing block distribution plot", plot.to_base64())

    return output
