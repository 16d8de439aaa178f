"""BamRemoveVariants — drop/mask reads containing given variants.

Behavioral reference: ngs-bits src/BamRemoveVariants/main.cpp
(+ BamAlignment::extractBaseByCIGAR / extractIndelsByCIGAR,
cppNGS/BamReader.cpp:307-438).
"""

from __future__ import annotations

import sys

from ..io.bam import (BamReader, BamRecord, BamWriter, write_record,
                      FLAG_SECONDARY, FLAG_SUPPLEMENTARY)
from .toolbase import ToolBase, ToolError

M_OPS = (0, 7, 8)


def extract_base_by_cigar(r: BamRecord, pos: int):
    """Returns (base_char, qual, read_pos); ('~', -1, -1) for skip/clip,
    ('-', 255, -1) for deletion."""
    read_pos = 0
    genome_pos = r.start() - 1
    if r.is_only_insertion():
        return "~", -1, -1
    bases = r.bases()
    for c in r.cigar:
        op = int(c) & 0xF
        length = int(c) >> 4
        if op in M_OPS:
            genome_pos += length
            read_pos += length
        elif op == 1:  # I
            read_pos += length
        elif op == 2:  # D
            genome_pos += length
            if genome_pos >= pos:
                return "-", 255, -1
        elif op == 3:  # N
            genome_pos += length
            if genome_pos >= pos:
                return "~", -1, -1
        elif op == 4:  # S
            read_pos += length
            if read_pos >= len(bases):
                return "~", -1, -1
        elif op == 5:  # H
            pass
        else:
            raise ToolError(f"Unknown CIGAR operation {op}!")
        if genome_pos >= pos:
            actual_pos = read_pos - (genome_pos + 1 - pos)
            return (bases[actual_pos:actual_pos + 1].decode(),
                    int(r.qual[actual_pos]), actual_pos)
    raise ToolError(f"Could not find position {pos} in read "
                    f"{r.name.decode()} with start position {r.start()}!")


def extract_indels_by_cigar(r: BamRecord, pos: int, indel_window: int):
    out = []
    use_window = indel_window != 0
    window_start = pos - indel_window
    window_end = pos + indel_window
    read_pos = 0
    genome_pos = r.start()
    bases = r.bases()
    for c in r.cigar:
        op = int(c) & 0xF
        length = int(c) >> 4
        if op in M_OPS:
            genome_pos += length
            read_pos += length
        elif op == 1:  # I
            if ((not use_window and genome_pos == pos)
                    or (use_window and window_start <= genome_pos <= window_end)):
                out.append(b"+" + bases[read_pos:read_pos + length])
            read_pos += length
        elif op == 2:  # D
            if ((not use_window and genome_pos == pos)
                    or (use_window and window_start <= genome_pos <= window_end)):
                out.append(b"-" + str(length).encode())
            genome_pos += length
        elif op == 3:  # N
            genome_pos += length
        elif op == 4:  # S
            read_pos += length
        elif op == 5:  # H
            pass
        else:
            raise ToolError(f"Unknown CIGAR operation {op}!")
        if ((not use_window and genome_pos > pos)
                or (use_window and genome_pos > window_end)):
            break
    return out


class BamRemoveVariantsTool(ToolBase):
    name = "BamRemoveVariants"
    description = "Removes reads which contain the provided variants"

    def setup(self):
        self.add_infile("in", "Input BAM/CRAM file.")
        self.add_outfile("out", "Output BAM/CRAM file.")
        self.add_infile("vcf", "Input indexed VCF.GZ file.")
        self.add_infile("ref", "Reference genome for CRAM support (mandatory if CRAM is used).", optional=True)
        self.add_flag("mask", "Replace variant bases with reference instead of removing the read (SNV only)")
        self.add_flag("single_end", "Input file is from single-end sequencing (e.g. lrGS).")
        self.add_flag("keep_indels", "Do not remove InDels in mask mode.")

    def _variants_for(self, r: BamRecord):
        return self._vcf.matching_lines_chr(r.ref_id, r.start(), r.end())

    def _alignment_pass(self, r: BamRecord) -> bool:
        for match in self._variants_for(r):
            cols = match.split(b"\t")
            pos = int(cols[1])
            ref = cols[3]
            obs = cols[4]
            if len(ref) == 1 and len(obs) == 1:
                base, _q, _rp = extract_base_by_cigar(r, pos)
                if base.encode() == obs:
                    return False
                if obs == b"<NON_REF>" and base.encode() != ref:
                    return False
            else:
                if extract_indels_by_cigar(r, pos, 50):
                    return False
        return True

    def _mask_alignment(self, r: BamRecord) -> bool:
        """Mutates r; returns pass status."""
        from ..io.bam import SEQ_NIBBLE_ASCII

        for match in self._variants_for(r):
            cols = match.split(b"\t")
            pos = int(cols[1])
            ref = cols[3]
            obs = cols[4]
            if len(ref) == 1 and len(obs) == 1:
                base, _q, read_pos = extract_base_by_cigar(r, pos)
                if (base.encode() == obs
                        or (obs == b"<NON_REF>" and base.encode() != ref)):
                    if read_pos < 0 or read_pos >= len(r.seq):
                        raise ToolError(f"Invalid read position {read_pos}!")
                    code = int(SEQ_NIBBLE_ASCII.tolist().index(ref[0]))
                    r.seq[read_pos] = code
            else:
                if extract_indels_by_cigar(r, pos, 50):
                    return self.get_flag("keep_indels")
        return True

    def main(self):
        import numpy as np

        from .vcf_annotate import _SourceIndex

        count_pass = 0
        count_modified = 0
        count_fail = 0
        count_skipped = 0

        reader = BamReader(self.get("in"))
        writer = BamWriter(self.get("out"), reader)
        src = _SourceIndex(self.get("vcf"))

        # map BAM ref ids to the source-index chromosomes
        from ..core.chromosome import Chromosome
        ref_chrs = [Chromosome(n) for n in reader.ref_names]

        class _V:
            def matching_lines_chr(self, ref_id, start, end):
                if ref_id < 0:
                    return []
                return src.matching_lines(ref_chrs[ref_id], start, end)

        self._vcf = _V()
        mask = self.get_flag("mask")
        single_end = self.get_flag("single_end")

        cache: dict[bytes, BamRecord] = {}
        cache_pass: dict[bytes, bool] = {}
        for batch in reader:
            for i in range(len(batch)):
                r = BamRecord.from_batch(batch, i)
                if (r.flag & FLAG_SECONDARY) or (r.flag & FLAG_SUPPLEMENTARY):
                    count_skipped += 1
                    continue
                if single_end:
                    if mask:
                        prev = r.bases()
                        ok = self._mask_alignment(r)
                        if ok:
                            write_record(writer, r)
                            count_pass += 1
                            if prev != r.bases():
                                count_modified += 1
                        else:
                            count_fail += 1
                    else:
                        if self._alignment_pass(r):
                            write_record(writer, r)
                            count_pass += 1
                        else:
                            count_fail += 1
                    continue

                name = r.name
                if name not in cache:
                    if mask:
                        prev = r.bases()
                        ok = self._mask_alignment(r)
                        cache_pass[name] = ok
                        cache[name] = r
                        if prev != r.bases():
                            count_modified += 1
                    else:
                        cache_pass[name] = self._alignment_pass(r)
                        cache[name] = r
                else:
                    if mask:
                        if cache_pass[name]:
                            prev = r.bases()
                            ok = self._mask_alignment(r)
                            if ok:
                                write_record(writer, cache.pop(name))
                                write_record(writer, r)
                                del cache_pass[name]
                                count_pass += 1
                            else:
                                del cache[name]
                                del cache_pass[name]
                                count_fail += 1
                            if prev != r.bases():
                                count_modified += 1
                        else:
                            del cache[name]
                            del cache_pass[name]
                            count_fail += 1
                    else:
                        if cache_pass[name] and self._alignment_pass(r):
                            write_record(writer, cache.pop(name))
                            write_record(writer, r)
                            del cache_pass[name]
                            count_pass += 1
                        else:
                            cache.pop(name, None)
                            cache_pass.pop(name, None)
                            count_fail += 1

        writer.close()
        reader.close()
        sys.stdout.write(f"pairs passed: {count_pass}\n")
        sys.stdout.write(f"pairs dropped: {count_fail}\n")
        sys.stdout.write(f"reads modified: {count_modified}\n")
        sys.stdout.write(f"skipped reads: {count_skipped}\n")


TOOLS = {"BamRemoveVariants": BamRemoveVariantsTool}
