"""VcfMerge — merge single-sample VCFs into a multi-sample VCF.

Behavioral reference: ngs-bits src/VcfMerge/main.cpp + Auxilary.h +
ReCallingWorker.cpp (GT normalization incl. DRAGEN 'targeted' handling,
special-call CT flags MO/LM/TA, AF from AO/DP for freebayes, per-variant tag
'chr\\tpos\\t.\\tref\\talt', stable first-seen variant registry sorted by
chr/pos/ref/alt at output, optional re-calling of uncalled variants from
BAMs with CT=RC).
"""

from __future__ import annotations

import os
import sys

from ngsbits_tpu.utils.stdio import stdout_binary
import time

from ..core.chromosome import Chromosome
from .toolbase import ToolBase, ToolError


class _FormatData:
    __slots__ = ("gt", "dp", "af", "gq", "ps", "ct")

    def __init__(self, gt=b"0/0", dp=b".", af=b".", gq=b".", ps=b".", ct=b"."):
        self.gt, self.dp, self.af, self.gq, self.ps, self.ct = gt, dp, af, gq, ps, ct


class _VcfData:
    def __init__(self):
        self.filename = b""
        self.sample = b""
        self.sample_desc = b""
        self.tag_to_format: dict[bytes, _FormatData] = {}
        self.chrx_het_perc = -1.0
        self.c_snv = 0
        self.c_indel = 0
        self.c_mosaic = 0
        self.c_low_mappability = 0
        self.c_targeted = 0
        self.c_skipped_wt = 0
        self.c_skipped_qual = 0
        self.c_skipped_special = 0


def _fmt3(v: float) -> bytes:
    from decimal import ROUND_HALF_UP, Decimal
    return f"{Decimal(v).quantize(Decimal('0.001'), rounding=ROUND_HALF_UP):.3f}".encode()


def _is_numeric(s: bytes) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


class VcfMergeTool(ToolBase):
    name = "VcfMerge"
    description = "Merges several VCF files into a multi-sample VCF file."
    extended_description = [
        "Input VCF have to be normalized (no multi-allelic variants, split into allelic primitives and indels left-aligned.",
        "The output has no information in the QUAL, FILTER and INFO column. It contains the following FORMAT entries: GT, DP, AF, GQ, PS, CT.",
        "Supported file formats for short-read are: freebayes, DRAGEN, DeepVariant.",
        "Supported file formats for long-read are: Clair3 (ONT), DeepVariant (PacBio)",
    ]

    def setup(self):
        self.add_infile_list("in", "Input files to merge in VCF or VCG.GZ format.")
        self.add_outfile("out", "Output multi-sample VCF. If unset, writes to STDOUT.", optional=True)
        self.add_flag("no_special_calls", "Ignores special variant calls in input VCF files (mosaic, low-mappabilty, targeted, etc).")
        self.add_float("min_qual", "If set, ignores input variants with less than the given QUAL cutoff.", optional=True, default=0.0)
        self.add_infile_list("bam", "Input BAM/CRAM files used for variant re-calling of uncalled variants. If not given, no re-calling is performed. For each 'in' file, a BAM file has to be provided in the same order.", optional=True)
        self.add_int("min_mapq", "Minimum mapping quality for re-calling.", optional=True, default=20)
        self.add_flag("no_genotype_correction", "Do not perform genotype correction during re-calling, only calculate DP and AF.")
        self.add_int("threads", "Number of threads used for re-calling", optional=True, default=1)
        self.add_infile("ref", "Reference genome FASTA file of BAM files. If unset 'reference_genome' from the 'settings.ini' file is used.", optional=True)
        self.add_flag("long_read", "Support long reads (> 1kb).")

    # ---- VCF loading ----
    def _load_vcf(self, filename, var_details, var_tag_to_index, min_qual,
                  no_special_calls, par_regions):
        import gzip

        out = _VcfData()
        out.filename = os.path.basename(filename).encode()
        c_snv_x = 0
        c_snv_x_het = 0
        if str(filename).endswith(".gz"):
            data = gzip.decompress(open(filename, "rb").read())
        else:
            data = open(filename, "rb").read()

        for raw in data.split(b"\n"):
            line = raw.rstrip(b"\r")
            if not line:
                continue
            if line[0:1] == b"#":
                if line.startswith(b"##"):
                    if line.startswith(b"##SAMPLE="):
                        out.sample_desc = line
                    continue
                parts = line.split(b"\t")
                if len(parts) != 10:
                    raise ToolError(f"Input file '{filename}' contains {len(parts)} "
                                    "columns. Only single-sample input VCFs with 10 "
                                    "columns are supported.")
                out.sample = parts[9].strip()
                continue

            parts = line.split(b"\t")
            if len(parts) != 10:
                raise ToolError(f"Input file '{filename}' variant line with other "
                                "than 10 columns: " + line.decode())
            alt = parts[4]
            if b"," in alt:
                raise ToolError(f"Input file '{filename}' contains multi-allelic "
                                "variant: " + line.decode())
            if min_qual > 0:
                try:
                    qual = float(parts[5])
                    if qual < min_qual:
                        out.c_skipped_qual += 1
                        continue
                except ValueError:
                    pass

            format_keys = parts[8].split(b":")
            if not format_keys or format_keys[0] != b"GT":
                raise ToolError(f"Input file '{filename}' has invalid FORMAT data: "
                                "GT is not first element: " + line.decode())
            format_values = parts[9].split(b":")
            if len(format_keys) != len(format_values):
                raise ToolError(f"Input file '{filename}' has differing format "
                                "key/value count: " + line.decode())

            def fmt_idx(key):
                try:
                    return format_keys.index(key)
                except ValueError:
                    return -1

            filters = [f.strip() for f in parts[6].split(b";")]

            gt = format_values[0].strip().replace(b"|", b"/").replace(b".", b"0")
            if gt == b"1/0":
                gt = b"0/1"
            if gt not in (b"0/1", b"1/1") and b"targeted" in filters:
                count_1 = gt.count(b"1")
                if count_1 == 0:
                    gt = b"0/0"
                else:
                    gt = b"0/1" if gt.count(b"0") > 0 else b"1/1"
            if gt == b"1":
                gt = b"1/1"  # Clair3 chrMT
            if gt in (b"0/0", b"0"):
                out.c_skipped_wt += 1
                continue
            if gt not in (b"0/1", b"1/1"):
                raise ToolError(f"Input file '{filename}' has unsupported 'GT' "
                                "format: " + line.decode())

            ref = parts[3]
            is_snv = len(ref) == 1 and len(alt) == 1
            chr_ = Chromosome(parts[0])
            pos = int(parts[1])

            fmt = _FormatData(gt=gt)
            i_dp = fmt_idx(b"DP")
            i_af = fmt_idx(b"AF")
            i_ao = fmt_idx(b"AO")
            i_gq = fmt_idx(b"GQ")
            i_ps = fmt_idx(b"PS")
            if i_dp != -1:
                fmt.dp = format_values[i_dp]
            if i_af != -1:
                fmt.af = format_values[i_af]
            elif i_ao != -1 and i_dp != -1:
                dp = format_values[i_dp]
                ao = format_values[i_ao]
                if _is_numeric(dp) and _is_numeric(ao):
                    fmt.af = _fmt3(float(ao) / float(dp))
            if i_gq != -1:
                fmt.gq = format_values[i_gq]
            if i_ps != -1:
                fmt.ps = format_values[i_ps]
            skip_special = False
            for flt, code, attr in ((b"low_mappability", b"LM", "c_low_mappability"),
                                    (b"mosaic", b"MO", "c_mosaic"),
                                    (b"targeted", b"TA", "c_targeted")):
                if flt in filters:
                    if no_special_calls:
                        out.c_skipped_special += 1
                        skip_special = True
                        break
                    fmt.ct = code
                    setattr(out, attr, getattr(out, attr) + 1)
            if skip_special:
                continue

            tag = (chr_.str_normalized(True).encode() + b"\t" + parts[1]
                   + b"\t.\t" + ref + b"\t" + alt)
            out.tag_to_format[tag] = fmt

            if tag not in var_tag_to_index:
                var_details.append((chr_, pos, ref, alt, is_snv, tag))
                var_tag_to_index[tag] = len(var_details) - 1

            if is_snv:
                out.c_snv += 1
            else:
                out.c_indel += 1

            if chr_.num == 1001 and is_snv and fmt.ct == b".":
                if not par_regions.overlaps_with(chr_, pos, pos):
                    c_snv_x += 1
                    if gt == b"0/1":
                        c_snv_x_het += 1

        if c_snv_x > 0:
            out.chrx_het_perc = 100.0 * c_snv_x_het / c_snv_x

        return out

    def _print_details(self, data: _VcfData, stream):
        w = stream.write
        w(f"input file: {data.filename.decode()}\n")
        w(f"  variants skipped (wild-type): {data.c_skipped_wt}\n")
        w(f"  variants skipped (low quality): {data.c_skipped_qual}\n")
        w(f"  variants skipped (special calls): {data.c_skipped_special}\n")
        w(f"  variants loaded: {len(data.tag_to_format)}\n")
        w(f"    SNVs: {data.c_snv}\n")
        w(f"    INDELs: {data.c_indel}\n")
        w(f"    mosaic: {data.c_mosaic}\n")
        w(f"    low-mappability: {data.c_low_mappability}\n")
        w(f"    targeted: {data.c_targeted}\n")
        if data.chrx_het_perc >= 0:
            w(f"  heterozygous SNVs on chrX ouside PAR: {data.chrx_het_perc:.2f}%\n")
        w("\n")

    # ---- re-calling ----
    def _recall(self, bam_file, data: _VcfData, var_details, min_mapq,
                no_genotype_correction, long_read):
        import numpy as np

        from ..qc import pileup as pm

        uncalled = [v for v in var_details if v[5] not in data.tag_to_format]
        if not uncalled:
            return
        chr_nums = np.array([v[0].num for v in uncalled], dtype=np.int64)
        positions = np.array([v[1] for v in uncalled], dtype=np.int64)
        # getPileup(..., min_mapq, include_not_properly_paired=long_read,
        # min_baseq=-1): no base-quality filter
        res = pm.pileup_at_positions(bam_file, chr_nums, positions,
                                     min_mapq=min_mapq,
                                     include_not_properly_paired=long_read,
                                     min_baseq=0)
        indels = pm.indel_pileup_at_positions(bam_file, chr_nums, positions,
                                              window=1, min_mapq=min_mapq,
                                              include_not_properly_paired=long_read)
        depth_arr = res.depth(False)
        for k, (chr_, pos, ref, alt, is_snv, tag) in enumerate(uncalled):
            depth = int(depth_arr[k])
            gt = b"0/0"
            dp = str(depth).encode()
            af = b"."
            ct = b"."
            count = 0
            freq = float("nan")
            if is_snv:
                r = pm.base_index(ref)
                a = pm.base_index(alt)
                if r >= 0 and a >= 0:
                    wt = int(res.counts[k, r])
                    mut = int(res.counts[k, a])
                    freq = mut / (wt + mut) if (wt + mut) else float("nan")
                    count = mut
            elif len(ref) == 1:  # insertion
                expected = b"+" + alt[1:]
                count = indels[k].get(expected, 0)
                freq = count / depth if depth else float("nan")
            elif len(alt) == 1:  # deletion
                expected = b"-" + str(len(ref) - 1).encode()
                count = indels[k].get(expected, 0)
                freq = count / depth if depth else float("nan")
            if freq == freq and freq not in (float("inf"), float("-inf")):
                af = _fmt3(freq)
                if not no_genotype_correction and (depth >= 10 or count > 3):
                    if freq > 0.9:
                        gt = b"1/1"
                    elif freq > 0.1:
                        gt = b"0/1"
            if gt != b"0/0":
                ct = b"RC"
            data.tag_to_format[tag] = _FormatData(gt, dp, af, b".", b".", ct)

    def main(self):
        from ..core import resources

        in_files = self.get_infile_list("in")
        out = self.get("out")
        for f in in_files:
            if f == out:
                raise ToolError("Input and output files must be different!")
        no_special_calls = self.get_flag("no_special_calls")
        min_qual = self.get_float("min_qual")
        bam_files = self.get_infile_list("bam")
        if bam_files and len(bam_files) != len(in_files):
            raise ToolError("Number of 'bam' files has to be the same as the "
                            "number 'in' files!")
        log = sys.stdout if out else sys.stderr

        par_regions = resources.pseudoautosomal_regions("hg38")

        var_details = []
        var_tag_to_index = {}
        data = []
        for f in in_files:
            data.append(self._load_vcf(f, var_details, var_tag_to_index,
                                       min_qual, no_special_calls, par_regions))
            self._print_details(data[-1], log)

        if bam_files:
            # per-sample re-calling parallelism (reference: QThreadPool,
            # VcfMerge/main.cpp:298-323); each worker writes only its own
            # entry's tag_to_format, and the BAM pileup decode releases
            # the GIL in the native decoder
            threads = max(1, self.get_int("threads"))

            def recall_one(pair):
                bam, entry = pair
                self._recall(bam, entry, var_details,
                             self.get_int("min_mapq"),
                             self.get_flag("no_genotype_correction"),
                             self.get_flag("long_read"))

            if threads > 1 and len(bam_files) > 1:
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(max_workers=threads) as pool:
                    list(pool.map(recall_one, zip(bam_files, data)))
            else:
                for pair in zip(bam_files, data):
                    recall_one(pair)

        var_details.sort(key=lambda v: (v[0].num, v[1], v[2], v[3]))

        lines = [b"##fileformat=VCFv4.3",
                 b"##fileDate=" + time.strftime("%Y%m%d").encode(),
                 b"##ANALYSISTYPE=GERMLINE_MULTISAMPLE",
                 b'##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype of variant.">',
                 b'##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Read depth at variant position.">',
                 b'##FORMAT=<ID=AF,Number=1,Type=Float,Description="Allele frequency of variant.">',
                 b'##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype quality.">',
                 b'##FORMAT=<ID=PS,Number=1,Type=Integer,Description="Phase set identifier.">',
                 b'##FORMAT=<ID=CT,Number=1,Type=String,Description="Calling type flag: MO=mosaic calling, LM=low-mappabilty calling, TA=targeted calling, RC=added during re-calling in VcfMerge.">']
        for entry in data:
            if entry.sample_desc:
                lines.append(entry.sample_desc)

        header = b"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT"
        samples_done = set()
        for entry in data:
            if entry.sample in samples_done:
                raise ToolError(f"Sample name '{entry.sample.decode()}' contained "
                                "more than once in input VCFs!")
            samples_done.add(entry.sample)
            header += b"\t" + entry.sample
        lines.append(header)

        default = _FormatData()
        for chr_, pos, ref, alt, is_snv, tag in var_details:
            row = tag + b"\t.\tPASS\t.\tGT:DP:AF:GQ:PS:CT"
            for entry in data:
                fmt = entry.tag_to_format.get(tag, default)
                row += (b"\t" + fmt.gt + b":" + fmt.dp + b":" + fmt.af + b":"
                        + fmt.gq + b":" + fmt.ps + b":" + fmt.ct)
            lines.append(row)

        payload = b"".join(l + b"\n" for l in lines)
        if out:
            with open(out, "wb") as fh:
                fh.write(payload)
        else:
            stdout_binary().write(payload)

        log.write("output:\n")
        log.write(f"  variants written: {len(var_details)}\n")
        c_snv_out = sum(1 for v in var_details if v[4])
        log.write(f"    SNVs: {c_snv_out}\n")
        log.write(f"    INDELs: {len(var_details) - c_snv_out}\n")


TOOLS = {"VcfMerge": VcfMergeTool}
