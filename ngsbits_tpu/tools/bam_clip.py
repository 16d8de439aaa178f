"""BamClipOverlap — soft-clip overlapping read pairs.

Behavioral reference: ngs-bits src/BamClipOverlap/main.cpp +
NGSHelper::softClipAlignment (cppNGS/NGSHelper.cpp:670-810).
"""

from __future__ import annotations

import sys

import numpy as np

from ..io.bam import (BamReader, BamRecord, BamWriter, write_record,
                      FLAG_PAIRED, FLAG_REVERSE, FLAG_READ1, FLAG_SECONDARY,
                      FLAG_SUPPLEMENTARY, FLAG_UNMAPPED, FLAG_MATE_UNMAPPED)
from .toolbase import ToolBase, ToolError

# op codes
M, I, D, S, H = 0, 1, 2, 4, 5


def soft_clip_alignment(r: BamRecord, start_ref_pos: int, end_ref_pos: int):
    """NGSHelper::softClipAlignment: convert [start,end] (1-based ref) to S."""
    r.add_tag(b"BS", b"Z", r.cigar_string())

    if start_ref_pos > end_ref_pos:
        raise ToolError("End position is smaller than start position.")
    if start_ref_pos < r.start() or start_ref_pos > r.end():
        raise ToolError(f"Start position {start_ref_pos} not within alignment "
                        f"({r.start()}:{r.end()}).")
    if end_ref_pos < r.start() or end_ref_pos > r.end():
        raise ToolError(f"End position {end_ref_pos} not within alignment "
                        f"({r.start()}:{r.end()}).")

    matrix = []  # (orig_op, new_op)
    for c in r.cigar:
        op = int(c) & 0xF
        if op not in (M, I, D, S, H):
            raise ToolError(f"Unsupported CIGAR type '{op}'")
        for _ in range(int(c) >> 4):
            matrix.append([op, op])

    j = 0
    current_ref_pos = r.start()
    end = r.end()
    while current_ref_pos <= end:
        if j >= len(matrix):
            raise ToolError("Index out of boundary!")
        if matrix[j][0] != H:
            if start_ref_pos <= current_ref_pos <= end_ref_pos:
                matrix[j][1] = S
            if matrix[j][0] in (D, M):
                current_ref_pos += 1
        j += 1

    new_cigar = []  # [op, length]
    tmp_char = -1
    tmp_count = 0
    for orig, new in matrix:
        if orig == D and new == S:
            continue
        if new != tmp_char:
            if tmp_char != -1:
                new_cigar.append([tmp_char, tmp_count])
            tmp_char = new
            tmp_count = 0
        tmp_count += 1
    new_cigar.append([tmp_char, tmp_count])

    i = 1
    while i < len(new_cigar):
        redo = False
        if new_cigar[i - 1][0] == S and new_cigar[i][0] == D:
            del new_cigar[i]
            redo = True
        elif new_cigar[i - 1][0] == D and new_cigar[i][0] == S:
            del new_cigar[i - 1]
            redo = True
        elif new_cigar[i - 1][0] == S and new_cigar[i][0] == I:
            new_cigar[i - 1][1] += new_cigar[i][1]
            del new_cigar[i]
            redo = True
        elif new_cigar[i - 1][0] == I and new_cigar[i][0] == S:
            new_cigar[i][1] += new_cigar[i - 1][1]
            del new_cigar[i - 1]
            redo = True
        if redo:
            i -= 1
        else:
            i += 1

    start_index = 0
    while start_index < len(matrix) and matrix[start_index][1] == H:
        start_index += 1
    if start_index < len(matrix) and matrix[start_index][1] == S:
        offset = 0
        while start_index < len(matrix) and matrix[start_index][1] == S:
            if matrix[start_index][0] in (M, D):
                offset += 1
            start_index += 1
        r.pos += offset

    r.cigar = np.array([(length << 4) | op for op, length in new_cigar],
                       dtype=np.uint32)


class _Overlap:
    def __init__(self):
        self.genome_pos = []
        self.read_pos = []
        self.base = []
        self.quality = []
        self.cigar = []

    def append(self, base, cigar, quality, genome_pos, read_pos):
        self.base.append(base)
        self.cigar.append(cigar)
        self.quality.append(quality)
        self.genome_pos.append(genome_pos)
        self.read_pos.append(read_pos)

    def insert(self, at, base, cigar, quality, genome_pos, read_pos):
        self.base.insert(at, base)
        self.cigar.insert(at, cigar)
        self.quality.insert(at, quality)
        self.genome_pos.insert(at, genome_pos)
        self.read_pos.insert(at, read_pos)

    def __len__(self):
        return len(self.read_pos)


def _scan_overlap(read: BamRecord, overlap_start, overlap_end, clip_position,
                  ignore_indels, surrounding_nuc=5):
    ov = _Overlap()
    has_indel = False
    genome_pos = read.start() - 1
    read_pos = 0
    bases = read.bases()
    quals = read.qualities_ascii()
    cigar = read.cigar_string(True)
    for ch in cigar.decode():
        if overlap_start <= genome_pos < overlap_end and ch not in "HS":
            current_base = bases[read_pos:read_pos + 1].decode() if ch != "D" else "-"
            current_quality = quals[read_pos:read_pos + 1].decode() if read_pos < len(quals) else "!"
            ov.append(current_base, ch, current_quality, genome_pos, read_pos)
        if (not ignore_indels
                and clip_position - surrounding_nuc < genome_pos < clip_position + surrounding_nuc
                and ch in "ID"):
            has_indel = True
        if ch == "H":
            continue
        elif ch == "S":
            read_pos += 1
        elif ch == "M":
            genome_pos += 1
            read_pos += 1
        elif ch == "D":
            genome_pos += 1
        elif ch == "I":
            read_pos += 1
        else:
            raise ToolError(f"Unknown CIGAR character '{ch}'")
    return ov, has_indel


class BamClipOverlapTool(ToolBase):
    name = "BamClipOverlap"
    description = "Softclipping of overlapping reads."
    extended_description = [
        "Overlapping reads will be soft-clipped from start to end. There are "
        "several parameters available for handling of mismatches in overlapping "
        "reads. Within the overlap the higher base quality will be kept for each "
        "basepair."]

    def setup(self):
        self.add_infile("in", "Input BAM/CRAM file. Needs to be sorted by name.")
        self.add_outfile("out", "Output BAM file.")
        self.add_flag("overlap_mismatch_mapq", "Set mapping quality of pair to 0 if mismatch is found in overlapping reads.")
        self.add_flag("overlap_mismatch_remove", "Remove pair if mismatch is found in overlapping reads.")
        self.add_flag("overlap_mismatch_baseq", "Reduce base quality if mismatch is found in overlapping reads.")
        self.add_flag("overlap_mismatch_basen", "Set base to N if mismatch is found in overlapping reads.")
        self.add_flag("ignore_indels", "Turn off indel detection in overlap.")
        self.add_flag("v", "Verbose mode.")
        self.add_infile("ref", "Reference genome for CRAM support (mandatory if CRAM is used).", optional=True)

    def main(self):
        from ..io.bam import SEQ_NIBBLE_ASCII

        reads_count = 0
        reads_saved = 0
        reads_clipped = 0
        reads_mismatch = 0
        bases_count = 0
        bases_clipped = 0
        ignore_indels = self.get_flag("ignore_indels")
        map_flag = self.get_flag("overlap_mismatch_mapq")
        rem_flag = self.get_flag("overlap_mismatch_remove")
        base_flag = self.get_flag("overlap_mismatch_baseq")
        basen_flag = self.get_flag("overlap_mismatch_basen")

        ascii2code = np.zeros(256, dtype=np.uint8)
        for code, ch in enumerate(b"=ACMGRSVTWYHKDBN"):
            ascii2code[ch] = code

        reader = BamReader(self.get("in"))
        writer = BamWriter(self.get("out"), reader)
        al_map: dict[bytes, BamRecord] = {}
        verbose = self.get_flag("v")

        def vprint(*args_):
            # the reference's console stream is stderr (main.cpp:52)
            print(*args_, file=sys.stderr)

        def _read_line(label, r, overlap, end=None):
            """Reference verbose read line (BamClipOverlap/main.cpp:206)."""
            return (f"{label} read: name - {r.name.decode()}, region - "
                    f"{reader.ref_names[r.ref_id]}:{r.start() - 1}-"
                    f"{r.end() if end is None else end}, insert size: {r.tlen}"
                    f" bp; mate: {r.mate_pos + 1}, CIGAR "
                    f"{r.cigar_string().decode()}, overlap: {overlap} bp")

        for batch in reader:
            for i in range(len(batch)):
                al = BamRecord.from_batch(batch, i)
                reads_count += 1
                bases_count += al.length()
                skip_al = False

                if ((al.flag & FLAG_PAIRED) == 0 or (al.flag & FLAG_SECONDARY)
                        or (al.flag & FLAG_SUPPLEMENTARY)
                        or (al.flag & FLAG_UNMAPPED) or (al.flag & FLAG_MATE_UNMAPPED)
                        or al.ref_id != al.mate_ref_id or al.is_only_insertion()):
                    write_record(writer, al)
                    reads_saved += 1
                    continue

                if al.name not in al_map:
                    al_map[al.name] = al
                    continue
                mate = al_map.pop(al.name)

                forward_read = mate
                reverse_read = al
                both_strands = False
                if (forward_read.flag & FLAG_REVERSE) != (reverse_read.flag & FLAG_REVERSE):
                    both_strands = True
                    if (reverse_read.flag & FLAG_REVERSE) == 0:
                        forward_read, reverse_read = reverse_read, forward_read

                s1, e1 = forward_read.start(), forward_read.end()
                s2, e2 = reverse_read.start(), reverse_read.end()

                soft_clip = (s2 <= s1 <= e2) or (s2 <= e1 <= e2) or (s1 <= s2 and e1 >= e2)

                if soft_clip:
                    if s1 <= s2 and e1 <= e2:
                        overlap = e1 - s2 + 1
                        overlap_start = s2 - 1
                        overlap_end = e1
                        clip_forward = overlap // 2
                        clip_reverse = overlap // 2
                        if forward_read.flag & FLAG_READ1:
                            clip_forward += overlap % 2
                        else:
                            clip_reverse += overlap % 2
                    elif s1 > s2 and e1 > e2:
                        overlap = e2 - s1 + 1
                        overlap_start = s1 - 1
                        overlap_end = e2
                        clip_forward = overlap // 2 + (e1 - e2)
                        clip_reverse = overlap // 2 + (s1 - s2)
                        if forward_read.flag & FLAG_READ1:
                            clip_forward += overlap % 2
                        else:
                            clip_reverse += overlap % 2
                    elif both_strands and s1 >= s2 and e1 <= e2:
                        overlap = e1 - s1 + 1
                        overlap_start = s1 - 1
                        overlap_end = e1
                        clip_forward = overlap // 2
                        clip_reverse = overlap // 2 + (s1 - s2)
                        if forward_read.flag & FLAG_READ1:
                            clip_forward += overlap % 2
                        else:
                            clip_reverse += overlap % 2
                    elif both_strands and s1 <= s2 and e1 >= e2:
                        overlap = e2 - s2 + 1
                        overlap_start = s2 - 1
                        overlap_end = e2
                        clip_forward = overlap // 2 + (e1 - e2)
                        clip_reverse = overlap // 2
                        if forward_read.flag & FLAG_READ1:
                            clip_forward += overlap % 2
                        else:
                            clip_reverse += overlap % 2
                    elif not both_strands and s1 >= s2 and e1 <= e2:
                        overlap = e1 - s1 + 1
                        overlap_start = s1 - 1
                        overlap_end = e1
                        clip_forward = overlap
                        clip_reverse = 0
                    elif not both_strands and s1 <= s2 and e1 >= e2:
                        overlap = e2 - s2 + 1
                        overlap_start = s2 - 1
                        overlap_end = e2
                        clip_forward = 0
                        clip_reverse = overlap
                    else:
                        raise ToolError(
                            "Read orientation of "
                            + ("forward read " if both_strands else "read1 ")
                            + forward_read.name.decode() + " was not identified.")

                    if verbose:
                        # BamClipOverlap/main.cpp:206-215,271
                        vprint(_read_line("forward", forward_read, overlap))
                        vprint(_read_line("reverse", reverse_read, overlap))
                        vprint(f"forward read bases {forward_read.bases().decode()}")
                        vprint(f"forward read qualities {forward_read.qualities_ascii().decode()}")
                        vprint(f"forward CIGAR {forward_read.cigar_string(True).decode()}")
                        vprint(f"reverse read bases {reverse_read.bases().decode()}")
                        vprint(f"reverse read qualities {reverse_read.qualities_ascii().decode()}")
                        vprint(f"reverse CIGAR {reverse_read.cigar_string(True).decode()}")
                        vprint(f"  clip forward read from position "
                              f"{forward_read.end() - clip_forward + 1} to {forward_read.end()}")
                        vprint(f"  clip reverse read from position "
                              f"{reverse_read.start()} to {reverse_read.start() - 1 + clip_reverse}")
                        vprint(f"  overlap found from {overlap_start} to {overlap_end}")

                    forward_overlap, hi1 = _scan_overlap(
                        forward_read, overlap_start, overlap_end,
                        forward_read.end() - clip_forward, ignore_indels)
                    reverse_overlap, hi2 = _scan_overlap(
                        reverse_read, overlap_start, overlap_end,
                        reverse_read.start() - 1 + clip_reverse, ignore_indels)
                    has_indel = hi1 or hi2
                    if verbose:
                        fb = "".join(forward_overlap.base)
                        fc = "".join(forward_overlap.cigar)
                        rb = "".join(reverse_overlap.base)
                        rc = "".join(reverse_overlap.cigar)
                        vprint(f"  finished reading overlap forward bases {fb}")
                        vprint(f"  finished reading overlap forward cigar {fc}")
                        vprint(f"  finished reading overlap reverse bases {rb}")
                        vprint(f"  finished reading overlap reverse cigar {rc}")

                    # correct for insertions
                    i2 = 0
                    while i2 < len(forward_overlap):
                        if (i2 < len(reverse_overlap)
                                and forward_overlap.cigar[i2] != reverse_overlap.cigar[i2]
                                and forward_overlap.cigar[i2] == "I"
                                and forward_overlap.base[i2] != "+"):
                            reverse_overlap.insert(i2, "+", "I", "0",
                                                   reverse_overlap.genome_pos[i2],
                                                   reverse_overlap.read_pos[i2])
                        if (i2 < len(reverse_overlap)
                                and forward_overlap.cigar[i2] != reverse_overlap.cigar[i2]
                                and reverse_overlap.cigar[i2] == "I"
                                and reverse_overlap.base[i2] != "+"):
                            forward_overlap.insert(i2, "+", "I", "0",
                                                   forward_overlap.genome_pos[i2],
                                                   forward_overlap.read_pos[i2])
                        i2 += 1
                    if verbose:
                        vprint("  finished indel correction forward bases "
                              + "".join(forward_overlap.base))
                        vprint("  finished indel correction forward cigar "
                              + "".join(forward_overlap.cigar))
                        vprint("  finished indel correction reverse bases "
                              + "".join(reverse_overlap.base))
                        vprint("  finished indel correction reverse cigar "
                              + "".join(reverse_overlap.cigar))
                    if len(forward_overlap) != len(reverse_overlap):
                        raise ToolError(
                            f"Length mismatch between forward/reverse overlap - "
                            f"forward:{len(forward_overlap)} reverse:"
                            f"{len(reverse_overlap)} in read with name "
                            f"'{al.name.decode()}'")

                    mm_pos = []
                    for k in range(len(forward_overlap)):
                        if forward_overlap.base[k] != reverse_overlap.base[k]:
                            first = forward_overlap.read_pos[k]
                            second = reverse_overlap.read_pos[k]
                            if forward_overlap.base[k] in ("-", "+"):
                                first = -1
                            if reverse_overlap.base[k] in ("-", "+"):
                                second = -1
                            mm_pos.append((first, second))

                    if verbose and mm_pos:
                        vprint(f"  overlap mismatch for read pair "
                              f"{forward_read.name.decode()} - "
                              + "".join(forward_overlap.base) + " != "
                              + "".join(reverse_overlap.base) + "!")

                    if base_flag or rem_flag or map_flag or basen_flag:
                        if mm_pos and map_flag:
                            forward_read.mapq = 0
                            reverse_read.mapq = 0
                            reads_mismatch += 2
                            if verbose:
                                vprint("  Set mapping quality to 0.")
                        elif mm_pos and rem_flag:
                            reads_mismatch += 2
                            skip_al = True
                            if verbose:
                                vprint("   Removed pair.")
                        elif mm_pos and base_flag:
                            reads_mismatch += 2
                            orig_for = forward_read.qualities_ascii().decode()
                            orig_rev = reverse_read.qualities_ascii().decode()
                            for first, second in mm_pos:
                                if first >= 0:
                                    forward_read.qual[first] = 0  # '!'
                                if second >= 0:
                                    reverse_read.qual[second] = 0
                            if verbose:
                                vprint(f"   changed forward base qualities from "
                                      f"{orig_for} to {forward_read.qualities_ascii().decode()}")
                                vprint(f"   changed reverse base qualities from "
                                      f"{orig_rev} to {reverse_read.qualities_ascii().decode()}")
                        elif mm_pos and basen_flag:
                            reads_mismatch += 2
                            orig_for = forward_read.bases().decode()
                            orig_rev = reverse_read.bases().decode()
                            n_code = ascii2code[ord("N")]
                            for first, second in mm_pos:
                                if first >= 0:
                                    forward_read.seq[first] = n_code
                                if second >= 0:
                                    reverse_read.seq[second] = n_code
                            if verbose:
                                vprint(f"   changed forward sequences from "
                                      f"{orig_for} to {forward_read.bases().decode()}")
                                vprint(f"   changed reverse sequences from "
                                      f"{orig_rev} to {reverse_read.bases().decode()}")
                        else:
                            if verbose:
                                vprint(f"  no overlap mismatch for read pair "
                                      f"{forward_read.name.decode()}")

                    if has_indel:
                        if reads_clipped % 4 == 0:
                            clip_forward = 0
                            clip_reverse = overlap
                        else:
                            clip_forward = overlap
                            clip_reverse = 0

                    if clip_forward > 0:
                        soft_clip_alignment(forward_read,
                                            forward_read.end() - clip_forward + 1,
                                            forward_read.end())
                    if clip_reverse > 0:
                        soft_clip_alignment(reverse_read,
                                            reverse_read.start(),
                                            reverse_read.start() - 1 + clip_reverse)

                    forward_end = forward_read.end()
                    reverse_end = reverse_read.end()
                    if reverse_read.start() == reverse_read.end():
                        reverse_end -= 1
                    if forward_read.start() == forward_read.end():
                        forward_end -= 1
                    forward_read.tlen = reverse_end - forward_read.start() + 1
                    forward_read.mate_pos = reverse_read.start() - 1
                    reverse_read.tlen = forward_read.start() - reverse_end - 1
                    reverse_read.mate_pos = forward_read.start() - 1

                    if verbose:
                        vprint("  clipped "
                              + _read_line("forward", forward_read, overlap,
                                           end=forward_end))
                        vprint("  clipped "
                              + _read_line("reverse", reverse_read, overlap,
                                           end=reverse_end))
                        vprint()

                    bases_clipped += overlap
                    reads_clipped += 2

                reads_saved += 2
                if skip_al:
                    continue
                write_record(writer, forward_read)
                write_record(writer, reverse_read)

        for al in al_map.values():
            write_record(writer, al)
            reads_saved += 1
        writer.close()
        reader.close()

        if reads_saved != reads_count:
            raise ToolError(f"Lost Reads: {reads_count - reads_saved}/{reads_count}")
        pct = lambda a, b: f"{100.0 * a / b:.2f}" if b else "nan"
        sys.stderr.write(f"Overlap mismatch filtering was used for {reads_mismatch} "
                         f"of {reads_count} reads ({pct(reads_mismatch, reads_count)} %).\n")
        sys.stderr.write(f"Softclipped {reads_clipped} of {reads_count} reads "
                         f"({pct(reads_clipped, reads_count)} %).\n")
        sys.stderr.write(f"Softclipped {bases_clipped} of {bases_count} basepairs "
                         f"({pct(bases_clipped, bases_count)} %).\n")


TOOLS = {"BamClipOverlap": BamClipOverlapTool}
