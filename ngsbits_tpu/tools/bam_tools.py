"""BAM utility tools.

Behavioral reference: ngs-bits src/Bam*/main.cpp (BamInfo, BamExtract,
BamFilter, BamDownsample, BamToFastq).
"""

from __future__ import annotations

import os
import sys

import numpy as np

from ..io.bam import (BamBatch, BamReader, BamWriter, CIGAR_CONSUMES_REF,
                      FLAG_DUPLICATE, FLAG_MATE_UNMAPPED, FLAG_PAIRED,
                      FLAG_READ1, FLAG_REVERSE, FLAG_SECONDARY,
                      FLAG_SUPPLEMENTARY, FLAG_UNMAPPED, SEQ_NIBBLE_ASCII)
from ..io.fasta import reverse_complement
from ..io.fastq import FastqEntry, FastqEntryWriter
from ..qc.mapping_stats import _tag_int
from .toolbase import ToolBase, ToolError


def _make_writer(out: str, reader, write_cram: bool):
    """BamWriter, or CramWriter when -write_cram is set regardless of the
    file extension (BamFilter/main.cpp:27)."""
    if write_cram and not str(out).endswith(".cram"):
        from ..io.cram_write import CramWriter
        return CramWriter(str(out), reader)
    return BamWriter(out, reader)




class BamInfoTool(ToolBase):
    name = "BamInfo"
    description = "Basic BAM information."

    def setup(self):
        self.add_infile_list("in", "Input BAM/CRAM files.")
        self.add_outfile("out", "Output TSV file. If unset, writes to STDOUT.", optional=True)
        self.add_flag("name", "Add filename only to output. The default is to add the canonical file path.")
        self.add_infile("ref", "Reference genome for CRAM support (mandatory if CRAM is used).", optional=True)

    def main(self):
        lines = ["#filename\tformat\tgenome_build\tgenome_masked\tgenome_contains_alt\tmapper\tpaired-end"]
        for filename in self.get_infile_list("in"):
            with open(filename, "rb") as fh:
                magic = fh.read(6)
            if magic.startswith(b"CRAM"):
                fmt = f"CRAM {magic[4]}.{magic[5]}"
            else:
                fmt = "BAM"
            reader = BamReader(filename, ref=self.get("ref") or None)
            build = reader.build_from_chr1()
            # false duplications masked: checked region empty for hg38 only;
            # default true (BamReader::info, BamReader.h:342); fresh reader so
            # the index seek does not disturb the paired-end scan below
            masked = "yes"
            if build == "hg38":
                try:
                    with BamReader(filename, ref=self.get("ref") or None) as r2:
                        for batch in r2.region_batches("chr21", 5968000, 6160000):
                            if len(batch):
                                masked = "no"
                                break
                except Exception:
                    pass
            contains_alt = "yes" if any(
                n.lower().endswith(("_alt", "_hap1")) for n in reader.ref_names) else "no"
            # mapper from last @PG line (BamReader::info match order)
            mapper = ""
            mapper_version = ""
            for line in reversed(reader.header_text.splitlines()):
                if not line.startswith("@PG"):
                    continue
                for pn, label in (("PN:bwa-mem2", "bwa-mem2"), ("PN:bwa", "bwa"),
                                  ("ID: DRAGEN SW build", "DRAGEN"),
                                  ("PN:minimap2", "minimap2"), ("PN:STAR", "STAR")):
                    if pn in line:
                        mapper = label
                        for part in line.split("\t"):
                            if part.startswith("VN:"):
                                mapper_version = part[3:].strip()
                                if label == "STAR":
                                    mapper_version = mapper_version.replace("STAR_", "")
                                elif label == "DRAGEN":
                                    mapper_version = ".".join(
                                        mapper_version.split(".")[-3:])
                        break
                if mapper:
                    break
            # paired-end detection from first 100 high-quality reads
            n_all = n_paired = 0
            for batch in reader:
                sel = ((batch.flag & (FLAG_SECONDARY | FLAG_SUPPLEMENTARY | FLAG_DUPLICATE | FLAG_UNMAPPED)) == 0) \
                      & (batch.mapq >= 20)
                for i in np.flatnonzero(sel):
                    n_all += 1
                    if batch.flag[i] & FLAG_PAIRED:
                        n_paired += 1
                    if n_all >= 100:
                        break
                if n_all >= 100:
                    break
            reader.close()
            paired = "yes" if (n_all and n_paired / n_all > 0.1) else "no"
            label = os.path.basename(filename) if self.get_flag("name") else os.path.realpath(filename)
            lines.append(f"{label}\t{fmt}\t{build}\t{masked}\t{contains_alt}\t"
                         f"{(mapper + ' ' + mapper_version).strip()}\t{paired}")
        text = "".join(l + "\n" for l in lines)
        out = self.get("out")
        if out:
            with open(out, "w") as fh:
                fh.write(text)
        else:
            sys.stdout.write(text)


class BamExtractTool(ToolBase):
    name = "BamExtract"
    description = "Extract reads from BAM/CRAM by read name."

    def setup(self):
        self.add_infile("in", "Input BAM/CRAM file.")
        self.add_infile("ids", "Input text file containing read names (one per line).")
        self.add_outfile("out", "Output BAM/CRAM file with matching reads.")
        self.add_outfile("out2", "Output BAM/CRAM file with not matching reads.", optional=True)
        self.add_infile("ref", "Reference genome for CRAM support (mandatory if CRAM is used).", optional=True)

    def main(self):
        ids = set()
        with open(self.get("ids"), "rb") as fh:
            for line in fh:
                line = line.strip()
                if line and not line.startswith(b"#"):
                    ids.add(line)
        print(f"Read IDs: {len(ids)}")
        reader = BamReader(self.get("in"))
        writer = BamWriter(self.get("out"), reader)
        writer2 = BamWriter(self.get("out2"), reader) if self.get("out2") else None
        c_match = c_other = 0
        for batch in reader:
            keep = np.array([batch.name(i) in ids for i in range(len(batch))], dtype=bool)
            writer.write_records(batch, keep)
            c_match += int(keep.sum())
            if writer2 is not None:
                writer2.write_records(batch, ~keep)
                c_other += int((~keep).sum())
        writer.close()
        if writer2 is not None:
            writer2.close()
        reader.close()
        print(f"Reads written to 'out': {c_match}")
        if writer2 is not None:
            print(f"Reads written to 'out2': {c_other}")


class BamFilterTool(ToolBase):
    name = "BamFilter"
    description = "Filter alignments in BAM/CRAM file (no input sorting required)."

    def setup(self):
        self.add_infile("in", "Input BAM/CRAM file.")
        self.add_outfile("out", "Output BAM/CRAM file.")
        self.add_int("minMQ", "Minimum mapping quality.", optional=True, default=30)
        self.add_int("maxMM", "Maximum number of mismatches in aligned read, -1 to disable.", optional=True, default=4)
        self.add_int("maxGap", "Maximum number of gaps (indels) in aligned read, -1 to disable.", optional=True, default=1)
        self.add_int("minDup", "Minimum number of duplicates.", optional=True, default=0)
        self.add_int("maxIS", "Maximum insert size, -1 to disable.", optional=True, default=-1)
        self.add_infile("ref", "Reference genome for CRAM support (mandatory if CRAM is used).", optional=True)
        self.add_flag("write_cram", "Writes a CRAM file as output.")

    def main(self):
        minMQ = self.get_int("minMQ")
        maxMM = self.get_int("maxMM")
        maxGap = self.get_int("maxGap")
        minDup = self.get_int("minDup")
        maxIS = self.get_int("maxIS")
        reader = BamReader(self.get("in"))
        writer = _make_writer(self.get("out"), reader, self.get_flag("write_cram"))

        def passes(batch, i):
            fl = int(batch.flag[i])
            if fl & FLAG_UNMAPPED or not fl & FLAG_PAIRED or fl & FLAG_MATE_UNMAPPED:
                return False
            if batch.mapq[i] < minMQ:
                return False
            cig = batch.cigar_of(i)
            ops = cig & 0xF
            lens = cig >> 4
            indel = (ops == 1) | (ops == 2)
            n_gaps = int(indel.sum())
            indel_size = int(lens[indel].sum())
            tags = batch.tags[batch.tags_off[i]:batch.tags_off[i + 1]]
            n_mismatches = _tag_int(tags, b"NM") - indel_size
            n_dup = _tag_int(tags, b"DP")
            if maxGap != -1 and n_gaps > maxGap:
                return False
            if maxMM != -1 and n_mismatches > maxMM:
                return False
            if n_dup < minDup:
                return False
            if maxIS != -1 and int(batch.tlen[i]) > maxIS:
                return False
            return True

        # pair buffering like the reference (writes pairs when both pass)
        cache: dict = {}
        cache_pass: dict = {}
        count_pass = count_fail = 0
        pending: list = []
        for batch in reader:
            keep = np.zeros(len(batch), dtype=bool)
            for i in range(len(batch)):
                fl = int(batch.flag[i])
                if fl & (FLAG_SECONDARY | FLAG_SUPPLEMENTARY):
                    continue
                name = batch.name(i)
                if name not in cache:
                    cache[name] = (batch, i)
                    cache_pass[name] = passes(batch, i)
                else:
                    if cache_pass[name] and passes(batch, i):
                        pending.append(cache.pop(name))
                        pending.append((batch, i))
                        count_pass += 1
                    else:
                        del cache[name]
                        count_fail += 1
                    cache_pass.pop(name, None)
            # flush pending writes in order
            for b, i in pending:
                m = np.zeros(len(b), dtype=bool)
                m[i] = True
                writer.write_records(b, m)
            pending = []
        writer.close()
        reader.close()
        print(f"pairs passed: {count_pass}")
        print(f"pairs dropped: {count_fail}")


class BamDownsampleTool(ToolBase):
    name = "BamDownsample"
    description = "Downsamples a BAM file to the given percentage of reads."

    def setup(self):
        self.add_infile("in", "Input BAM/CRAM file.")
        self.add_int("percentage", "Percentage of reads to keep.")
        self.add_outfile("out", "Output BAM/CRAM file.")
        self.add_flag("test", "Test mode: fix random number generator seed and write kept read names to STDOUT.")
        self.add_infile("ref", "Reference genome for CRAM support (mandatory if CRAM is used).", optional=True)
        self.add_flag("write_cram", "Writes a CRAM file as output.")

    def main(self):
        perc = self.get_int("percentage")
        test = self.get_flag("test")
        rng = np.random.default_rng(1 if test else None)
        reader = BamReader(self.get("in"))
        writer = _make_writer(self.get("out"), reader, self.get_flag("write_cram"))
        kept_names: set = set()
        c_reads = c_kept = 0
        for batch in reader:
            keep = np.zeros(len(batch), dtype=bool)
            for i in range(len(batch)):
                name = batch.name(i)
                c_reads += 1
                if name in kept_names:
                    keep[i] = True
                    kept_names.discard(name)  # mate handled; free memory
                elif rng.random() * 100.0 < perc:
                    keep[i] = True
                    kept_names.add(name)
            writer.write_records(batch, keep)
            c_kept += int(keep.sum())
        writer.close()
        reader.close()
        print(f"Processed {c_reads} reads, kept {c_kept} reads ({100.0 * c_kept / max(c_reads, 1):.2f}%)")


class BamToFastqTool(ToolBase):
    name = "BamToFastq"
    description = "Converts a coordinate-sorted BAM file to FASTQ files."

    def setup(self):
        self.add_infile("in", "Input BAM/CRAM file.")
        self.add_outfile("out1", "Read 1 output FASTQ.GZ file.")
        self.add_outfile("out2", "Read 2 output FASTQ.GZ file (required for pair-end samples).", optional=True)
        self.add_string("reg", "Export only reads in the given region. Format: chr:start-end.", optional=True)
        self.add_flag("remove_duplicates", "Does not export reads marked as duplicates in SAM flags into the FASTQ file.")
        self.add_int("compression_level", "Output FASTQ compression level from 1 (fastest) to 9 (best compression).", optional=True, default=1)
        self.add_int("write_buffer_size", "Output write buffer size (number of FASTQ entry pairs).", optional=True, default=100)
        self.add_infile("ref", "Reference genome for CRAM support (mandatory if CRAM is used).", optional=True)
        self.add_int("extend", "Extend all reads to the given length. Base 'N' and base qualiy '2' are used for extension.", optional=True, default=0)
        self.add_flag("fix", "Keep only one read pair if several have the same name (note: needs much memory as read names are kept in memory).")

    @staticmethod
    def _to_entry(batch, i, extend):
        bases = bytes(SEQ_NIBBLE_ASCII[c] for c in batch.seq_of(i).tolist())
        quals = bytes(q + 33 for q in batch.qual_of(i).tolist())
        if batch.flag[i] & FLAG_REVERSE:
            bases = reverse_complement(bases)
            quals = quals[::-1]
        if extend > 0 and len(bases) < extend:
            pad = extend - len(bases)
            bases += b"N" * pad
            quals += b"#" * pad  # 33+2
        return FastqEntry(b"@" + batch.name(i), bases, b"+", quals)

    def main(self):
        reader = BamReader(self.get("in"))
        out1 = self.get("out1")
        out2 = self.get("out2")
        is_pe = bool(out2 and out2.strip())
        level = self.get_int("compression_level")
        extend = self.get_int("extend")
        remove_duplicates = self.get_flag("remove_duplicates")
        fix = self.get_flag("fix")
        reg = self.get("reg")
        region = None
        if reg:
            from ..core.chromosome import Chromosome
            chrom, coords = reg.split(":")
            start, end = coords.replace(",", "").split("-")
            region = (Chromosome(chrom).num, int(start), int(end))

        buf_pairs = max(1, self.get_int("write_buffer_size"))
        w1 = FastqEntryWriter(out1, level, flush_entries=buf_pairs)
        w2 = FastqEntryWriter(out2, level, flush_entries=buf_pairs) if is_pe else None

        from ..core.chromosome import Chromosome
        ref_nums = [Chromosome(n).num for n in reader.ref_names]
        c_unpaired = c_paired = c_duplicates = c_single = c_fixed = 0
        cache: dict = {}
        written: dict = {}
        for batch in reader:
            ends = batch.end_positions() if region else None
            for i in range(len(batch)):
                fl = int(batch.flag[i])
                if fl & (FLAG_SECONDARY | FLAG_SUPPLEMENTARY):
                    continue
                if region is not None:
                    rid = batch.ref_id[i]
                    if rid < 0 or ref_nums[rid] != region[0]:
                        continue
                    if int(batch.pos[i]) + 1 > region[2] or int(ends[i]) < region[1]:
                        continue
                if remove_duplicates and fl & FLAG_DUPLICATE:
                    c_duplicates += 1
                    continue
                name = batch.name(i)
                if fix:
                    key = (name, bool(fl & FLAG_READ1))
                    if key in written:
                        c_fixed += 1
                        continue
                    written[key] = True
                if is_pe:
                    if not fl & FLAG_PAIRED:
                        c_unpaired += 1
                        continue
                    if name in cache:
                        mate = cache.pop(name)
                        cur = self._to_entry(batch, i, extend)
                        if fl & FLAG_READ1:
                            w1.write(cur)
                            w2.write(mate)
                        else:
                            w1.write(mate)
                            w2.write(cur)
                        c_paired += 1
                    else:
                        cache[name] = self._to_entry(batch, i, extend)
                else:
                    w1.write(self._to_entry(batch, i, extend))
                    c_single += 1
        w1.close()
        if w2 is not None:
            w2.close()
        reader.close()
        if is_pe:
            print(f"Pair reads (written)            : {c_paired}")
            print(f"Unpaired reads (skipped)        : {c_unpaired}")
            print(f"Unmatched paired reads (skipped): {len(cache)}")
        else:
            print(f"Reads (written)                 : {c_single}")
        if remove_duplicates:
            print(f"Duplicate tagged reads (skipped): {c_duplicates}")
        if fix:
            print(f"Duplicate name reads (skipped)  : {c_fixed}")


class BamCleanHaloplexTool(ToolBase):
    name = "BamCleanHaloplex"
    description = "BAM cleaning for Haloplex."

    def setup(self):
        self.add_infile("in", "Input BAM/CRAM file.")
        self.add_outfile("out", "Output BAM/CRAM file.")
        self.add_int("min_match", "Minimum number of CIGAR matches (M).", optional=True, default=30)
        self.add_infile("ref", "Reference genome for CRAM support (mandatory if CRAM is used).", optional=True)

    def main(self):
        # BamCleanHaloplex/main.cpp:28-69: unmap reads whose summed CIGAR-M
        # length is below min_match; mark them secondary as well.
        min_match = self.get_int("min_match")
        c_reads = c_mapped = c_failed = 0
        reader = BamReader(self.get_infile("in"))
        writer = BamWriter(self.get_outfile("out"), reader)
        for batch in reader:
            n = len(batch)
            c_reads += n
            considered = (batch.flag & (FLAG_UNMAPPED | FLAG_SECONDARY |
                                        FLAG_SUPPLEMENTARY | FLAG_DUPLICATE)) == 0
            c_mapped += int(considered.sum())
            # segment-sum of M op lengths per record
            rec_idx = np.repeat(np.arange(n), batch.n_cigar)
            ops = batch.cigar & 0xF
            lens = (batch.cigar >> 4).astype(np.int64)
            sum_m = np.bincount(rec_idx, weights=np.where(ops == 0, lens, 0),
                                minlength=n).astype(np.int64)
            failed = considered & (sum_m < min_match)
            c_failed += int(failed.sum())
            batch.flag = batch.flag | np.where(failed, FLAG_UNMAPPED | FLAG_SECONDARY, 0).astype(np.uint16)
            writer.write_records(batch)
        writer.close()
        reader.close()
        sys.stdout.write(f"overall reads: {c_reads}\n")
        sys.stdout.write(f"mapped reads : {c_mapped} ({100.0 * c_mapped / c_reads:.2f}%)\n")
        sys.stdout.write(f"removed reads: {c_failed} ({100.0 * c_failed / c_reads:.2f}%)\n")


TOOLS = {
    "BamInfo": BamInfoTool,
    "BamExtract": BamExtractTool,
    "BamFilter": BamFilterTool,
    "BamDownsample": BamDownsampleTool,
    "BamToFastq": BamToFastqTool,
    "BamCleanHaloplex": BamCleanHaloplexTool,
}
