"""Variant-list filtering tools (VCF and GSvar formats).

Behavioral reference: ngs-bits src/VariantFilterRegions/main.cpp +
FilterRegions::apply / FilterResult::tagNonPassing
(cppNGS/FilterCascade.cpp:1104-1233).
"""

from __future__ import annotations

import re
import sys

from ngsbits_tpu.utils.stdio import stdout_binary

from ..core.chromosome import Chromosome
from ..core.intervals import BedFile, BedLine, ChromosomalIndex
from ..io.gsvar import GSvarFile
from ..io.vcf import VcfFile, vcf_store
from .toolbase import ToolBase, ToolError


def parse_region(s: str) -> BedLine:
    """BedLine::fromString: 'chr17:41194312-41279500' (commas allowed)."""
    m = re.match(r"^\s*([^:]+):([0-9,]+)-([0-9,]+)\s*$", s)
    if not m:
        raise ToolError(f"Could not parse region string '{s}'!")
    return BedLine(Chromosome(m.group(1)),
                   int(m.group(2).replace(",", "")),
                   int(m.group(3).replace(",", "")))


def _region_flags(chrs, starts, ends, roi: BedFile):
    """pass-flag per variant: overlaps the merged/sorted roi."""
    idx = ChromosomalIndex(roi)
    flags = []
    for c, s, e in zip(chrs, starts, ends):
        flags.append(len(idx.matching_indices(c, s, e)) > 0)
    return flags


class VariantFilterRegionsTool(ToolBase):
    name = "VariantFilterRegions"
    description = "Filter a variant list based on a target region."

    def setup(self):
        self.add_infile("in", "Input variant list. In VCF (default) or GSvar format.")
        self.add_outfile("out", "Output variant list (same format as 'in'). If unset, writes to STDOUT.", optional=True)
        self.add_infile("reg", "Input target region in BED format.", optional=True)
        self.add_string("r", "Single target region in the format chr17:41194312-41279500.", optional=True)
        self.add_string("mark", "If set, instead of removing variants, they are marked with the given flag in the 'filter' column.", optional=True)
        self.add_flag("inv", "Inverts the filter, i.e. variants inside the region are removed/marked.")
        self.add_enum("mode", "Mode (input format).", optional=True,
                      valid=("vcf", "gsvar"), default="vcf")
        self.add_int("compression_level", "Output VCF compression level from 1 (fastest) to 9 (best compression). If unset, an unzipped VCF is written.", optional=True, default=0)

    def main(self):
        inv = self.get_flag("inv")
        mark = (self.get("mark") or "").encode()

        roi = BedFile()
        if self.get("reg"):
            roi = BedFile.from_file(self.get("reg"))
            roi.merge()
        elif self.get("r"):
            roi.append(parse_region(self.get("r")))
        else:
            raise ToolError("You have to provide either the 'reg' or the 'r' parameter!")

        mode = self.get_enum("mode")
        out = self.get("out")
        if mode == "vcf":
            variants = VcfFile.from_file(self.get("in"))
            chrs = [variants.chr_of(i) for i in range(len(variants))]
            starts = [variants[i].start for i in range(len(variants))]
            ends = [variants[i].end for i in range(len(variants))]
            flags = _region_flags(chrs, starts, ends, roi)
            if inv:
                flags = [not f for f in flags]
            if mark:
                if mark.decode() not in [fid for fid, _l in variants.header.filter_lines]:
                    line = (b"##FILTER=<ID=" + mark
                            + b',Description="Variant marked as \'' + mark + b'\'.">')
                    variants.header.filter_lines.append((mark.decode(), line))
                for i, f in enumerate(flags):
                    if not f:
                        self._add_filter(variants, i, mark)
            else:
                keep = [i for i, f in enumerate(flags) if f]
                self._subset(variants, keep)
            vcf_store(variants, out or None,
                      compression_level=self.get_int("compression_level"))
        else:
            gsvar = GSvarFile.from_file(self.get("in"))
            chrs = [v.chr for v in gsvar.variants]
            starts = [v.start for v in gsvar.variants]
            ends = [v.end for v in gsvar.variants]
            flags = _region_flags(chrs, starts, ends, roi)
            if inv:
                flags = [not f for f in flags]
            if mark:
                try:
                    fi = gsvar.annotation_index("filter")
                except KeyError:
                    fi = len(gsvar.columns)
                    gsvar.columns.append("filter")
                    for v in gsvar.variants:
                        v.annotations.append(b"")
                gsvar.filters.setdefault(mark.decode(), f"Variant marked as '{mark.decode()}'.")
                for v, f in zip(gsvar.variants, flags):
                    if not f:
                        value = v.annotations[fi].strip().upper()
                        if value in (b"", b".", b"PASS", b"PASSED"):
                            v.annotations[fi] = mark
                        else:
                            v.annotations[fi] = v.annotations[fi] + b";" + mark
            else:
                gsvar.variants = [v for v, f in zip(gsvar.variants, flags) if f]
            gsvar.store(out or None)

    @staticmethod
    def _add_filter(variants: VcfFile, i: int, tag: bytes):
        """VcfLine::addFilter (VcfLine.h:333-356)."""
        raw = variants.filters[i]
        fl = [] if raw in (b"", b".") else raw.split(b";")
        if b"PASS" in fl:
            fl = [f for f in fl if f != b"PASS"]
        fl.append(tag)
        variants.filters[i] = b";".join(fl)

    @staticmethod
    def _subset(variants: VcfFile, keep: list[int]):
        variants.chr_strs = [variants.chr_strs[i] for i in keep]
        variants.pos = variants.pos[keep] if len(keep) else variants.pos[:0]
        variants.ids = [variants.ids[i] for i in keep]
        variants.refs = [variants.refs[i] for i in keep]
        variants.alts = [variants.alts[i] for i in keep]
        variants.quals = [variants.quals[i] for i in keep]
        variants.filters = [variants.filters[i] for i in keep]
        variants.infos = [variants.infos[i] for i in keep]
        variants.format_keys = [variants.format_keys[i] for i in keep]
        variants.samples = [variants.samples[i] for i in keep]

    @staticmethod
    def _store_gsvar(gsvar: GSvarFile, out: str | None):
        lines = list(gsvar.comments)
        lines.append(b"#chr\tstart\tend\tref\tobs\t"
                     + b"\t".join(c.encode() for c in gsvar.columns))
        for v in gsvar.variants:
            lines.append(b"\t".join([v.chr.str.encode(), str(v.start).encode(),
                                     str(v.end).encode(), v.ref, v.obs]
                                    + list(v.annotations)))
        data = b"".join(l + b"\n" for l in lines)
        if out:
            with open(out, "wb") as fh:
                fh.write(data)
        else:
            stdout_binary().write(data)


TOOLS = {"VariantFilterRegions": VariantFilterRegionsTool}
