"""Embedded resource loaders (known SNPs, ancestry panel, OMIM QC regions).

Behavioral reference: ngs-bits NGSHelper::getKnownVariants
(cppNGS/NGSHelper.cpp:58-95; AF filter :22-55) over the embedded
hg19/hg38_snps.vcf; MappingQC's ://resources/ OMIM gene BEDs
(MappingQC/main.cpp:113). Data files are bundled gzipped under
ngsbits_tpu/resources/ (same content as the reference's Qt resources).
"""

from __future__ import annotations

import gzip
import tempfile
from functools import lru_cache
from pathlib import Path

from ..io.vcf import VcfFile
from .intervals import BedFile, ChromosomalIndex

RESOURCE_DIR = Path(__file__).resolve().parent.parent / "resources"


def _decompress_to_temp(name: str) -> str:
    src = RESOURCE_DIR / (name + ".gz")
    tmp = Path(tempfile.gettempdir()) / f"ngsbits_tpu_{name}"
    if not tmp.exists() or tmp.stat().st_mtime < src.stat().st_mtime:
        data = gzip.decompress(src.read_bytes())
        tmp.write_bytes(data)
    return str(tmp)


@lru_cache(maxsize=4)
def _known_snps_vcf(build: str) -> VcfFile:
    if build not in ("hg19", "hg38"):
        raise ValueError(f"Unsupported genome build '{build}'!")
    return VcfFile.from_file(_decompress_to_temp(f"{build}_snps.vcf"))


def known_variants(build: str, only_snvs: bool, min_af: float = 0.0, max_af: float = 1.0,
                   roi: BedFile | None = None) -> VcfFile:
    src = _known_snps_vcf(build)
    if not (0.0 <= min_af <= 1.0):
        raise ValueError(f"Minumum allele frequency out of range (0.0-1.0): {min_af}")
    if not (0.0 <= max_af <= 1.0):
        raise ValueError(f"Maximum allele frequency out of range (0.0-1.0): {max_af}")

    roi_idx = None
    if roi is not None and len(roi):
        roi_sorted = BedFile()
        roi_sorted.lines = sorted(roi.lines, key=lambda l: l.sort_key())
        roi_idx = ChromosomalIndex(roi_sorted)

    out = VcfFile()
    out.header = src.header
    out.column_headers = src.column_headers
    pos_list = []
    for i in range(len(src)):
        v = src[i]
        if roi_idx is not None:
            if len(roi_idx.matching_indices(v.chr, v.start, v.end)) == 0:
                continue
        if min_af > 0.0 or max_af < 1.0:
            try:
                af = float(v.info("AF") or 0.0)
            except ValueError:
                af = 0.0
            if not (min_af <= af <= max_af):
                continue
        if only_snvs and not (len(v.ref) == 1 and len(v.alt(0)) == 1 and not v.is_multi_allelic()):
            continue
        out.chr_strs.append(src.chr_strs[i])
        pos_list.append(int(src.pos[i]))
        out.ids.append(src.ids[i])
        out.refs.append(src.refs[i])
        out.alts.append(src.alts[i])
        out.quals.append(src.quals[i])
        out.filters.append(src.filters[i])
        out.infos.append(src.infos[i])
        out.format_keys.append(src.format_keys[i])
        out.samples.append(src.samples[i])
    import numpy as np
    out.pos = np.array(pos_list, dtype=np.int64)
    return out


@lru_cache(maxsize=4)
def omim_qc_bed(build: str) -> BedFile:
    name = "hg19_439_omim_genes.bed" if build == "hg19" else "hg38_440_omim_genes.bed"
    return BedFile.from_file(_decompress_to_temp(name))


@lru_cache(maxsize=4)
def ancestry_vcf(build: str) -> VcfFile:
    return VcfFile.from_file(_decompress_to_temp(f"{build}_ancestry.vcf"))


@lru_cache(maxsize=1)
def identity_snps_vcf() -> VcfFile:
    return VcfFile.from_file(_decompress_to_temp("hg38_snps_identity.vcf"))


def pseudoautosomal_regions(build: str) -> BedFile:
    """Hard-coded PARs (NGSHelper.cpp:415-434)."""
    from .chromosome import Chromosome
    from .intervals import BedLine
    bed = BedFile()
    if build == "hg19":
        coords = [("chrX", 60001, 2699520), ("chrX", 154931044, 155260560),
                  ("chrY", 10001, 2649520), ("chrY", 59034050, 59363566)]
    else:
        coords = [("chrX", 10001, 2781479), ("chrX", 155701383, 156030895),
                  ("chrY", 10001, 2781479), ("chrY", 56887903, 57217415)]
    for c, s, e in coords:
        bed.append(BedLine(Chromosome(c), s, e))
    return bed
