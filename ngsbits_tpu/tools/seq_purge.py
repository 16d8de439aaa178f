"""SeqPurge — adapter trimming for paired-end data.

Behavioral reference: ngs-bits src/SeqPurge/main.cpp:17-104 +
ThreadCoordinator.cpp (pipeline: read -> analyze -> write; here: batched
lockstep readers -> device-count + host-decision engine -> gzip writers).
"""

from __future__ import annotations

import sys

from ..io.fastq import FastqReader, FastqWriter
from ..qc.read_stats import ReadStatistics
from ..qc.seqpurge import SeqPurgeEngine, SeqPurgeParams
from .toolbase import ToolBase, ToolError


class SeqPurgeTool(ToolBase):
    name = "SeqPurge"
    description = "Removes adapter sequences from paired-end sequencing data."

    def setup(self):
        self.add_infile_list("in1", "Forward input gzipped FASTQ file(s).")
        self.add_infile_list("in2", "Reverse input gzipped FASTQ file(s).")
        self.add_outfile("out1", "Forward output gzipped FASTQ file.")
        self.add_outfile("out2", "Reverse output gzipped FASTQ file.")
        self.add_string("a1", "Forward adapter sequence (at least 15 bases).", optional=True, default="AGATCGGAAGAGCACACGTCTGAACTCCAGTCA")
        self.add_string("a2", "Reverse adapter sequence (at least 15 bases).", optional=True, default="AGATCGGAAGAGCGTCGTGTAGGGAAAGAGTGT")
        self.add_float("match_perc", "Minimum percentage of matching bases for sequence/adapter matches.", optional=True, default=80.0)
        self.add_float("mep", "Maximum error probability of insert and adapter matches.", optional=True, default=0.000001)
        self.add_int("qcut", "Quality trimming cutoff for trimming from the end of reads using a sliding window approach. Set to 0 to disable.", optional=True, default=15)
        self.add_int("qwin", "Quality trimming window size.", optional=True, default=5)
        self.add_int("qoff", "Quality trimming FASTQ score offset.", optional=True, default=33)
        self.add_int("ncut", "Number of subsequent Ns to trimmed using a sliding window approach from the front of reads. Set to 0 to disable.", optional=True, default=7)
        self.add_int("min_len", "Minimum read length after adapter trimming. Shorter reads are discarded.", optional=True, default=30)
        self.add_int("threads", "The number of threads used for trimming (up to three additional threads are used for reading and writing).", optional=True, default=1)
        self.add_outfile("out3", "Name prefix of singleton read output files (if only one read of a pair is discarded).", optional=True)
        self.add_outfile("summary", "Write summary/progress to this file instead of STDOUT.", optional=True)
        self.add_outfile("qc", "If set, a read QC file in qcML format is created (just like ReadQC).", optional=True)
        self.add_int("block_size", "Number of FASTQ entries processed in one block.", optional=True, default=10000)
        self.add_int("block_prefetch", "Number of blocks that may be pre-fetched into memory.", optional=True, default=32)
        self.add_flag("ec", "Enable error-correction of adapter-trimmed reads (only those with insert match).")
        self.add_flag("debug", "Enables debug output (use only with one thread).")
        self.add_int("progress", "Enables progress output at the given interval in milliseconds (disabled by default).", optional=True, default=-1)
        self.add_int("compression_level", "Output FASTQ compression level from 1 (fastest) to 9 (best compression).", optional=True, default=1)

    def main(self):
        in1 = self.get_infile_list("in1")
        in2 = self.get_infile_list("in2")
        if len(in1) != len(in2):
            raise ToolError("Input file lists 'in1' and 'in2' differ in counts!")
        a1 = self.get("a1").strip().encode()
        a2 = self.get("a2").strip().encode()
        if len(a1) < 15:
            raise ToolError(f"Forward adapter {a1.decode()} too short!")
        if len(a2) < 15:
            raise ToolError(f"Reverse adapter {a2.decode()} too short!")

        params = SeqPurgeParams(
            a1=a1, a2=a2,
            match_perc=self.get_float("match_perc"),
            mep=self.get_float("mep"),
            qcut=self.get_int("qcut"), qwin=self.get_int("qwin"),
            qoff=self.get_int("qoff"), ncut=self.get_int("ncut"),
            min_len=self.get_int("min_len"), ec=self.get_flag("ec"))

        qc_file = self.get("qc")
        qc = ReadStatistics(single_end=False) if qc_file else None
        engine = SeqPurgeEngine(params, qc=qc,
                                threads=max(1, self.get_int("threads")))

        level = self.get_int("compression_level")
        w1 = FastqWriter(self.get("out1"), level)
        w2 = FastqWriter(self.get("out2"), level)
        out3 = self.get("out3")
        w3 = FastqWriter(out3 + "_R1.fastq.gz", level) if out3 else None
        w4 = FastqWriter(out3 + "_R2.fastq.gz", level) if out3 else None

        block = self.get_int("block_size")
        min_len = params.min_len
        import numpy as np

        # -progress: periodic throughput status lines into the summary
        # stream, like the reference (ThreadCoordinator.cpp:56-81)
        from ..utils.trace import ProgressReporter
        summary_path = self.get("summary")
        summary_stream = open(summary_path, "w") if summary_path else sys.stdout
        progress = ProgressReporter(self.get_int("progress"),
                                    stream=summary_stream)

        from ..utils.prefetch import prefetch_paired

        # -threads: the native C++ kernel threads internally (deterministic
        # static row partition, native/seqpurge.cpp); without it, per-worker
        # engines over a bounded in-order window — the numpy/XLA scans
        # release the GIL so workers genuinely overlap (reference: N
        # analysis threads, SeqPurge/ThreadCoordinator.cpp). Each worker
        # owns its stats; merged after the run (commutative sums).
        # Per-batch QC accumulation stays single-threaded when -qc is given.
        threads = max(1, self.get_int("threads"))
        use_pool = threads > 1 and qc is None and not engine.native_available()
        pool = workers = None
        if use_pool:
            import queue as _queue
            from concurrent.futures import ThreadPoolExecutor
            pool = ThreadPoolExecutor(max_workers=threads)
            workers = _queue.SimpleQueue()
            for _ in range(threads):
                e = SeqPurgeEngine(params)
                e.table = engine.table  # share the probability table
                workers.put(e)

        def trim_pair(pair):
            b1, b2 = pair
            if b1 is None and b2 is None:
                return None
            if b1 is None or b2 is None or len(b1) != len(b2):
                raise ToolError(f"Differing number of reads in file '{f1}' and '{f2}'!")
            if use_pool:
                e = workers.get()
                try:
                    nl1, nl2 = e.process_batch(b1, b2)
                finally:
                    workers.put(e)
            else:
                nl1, nl2 = engine.process_batch(b1, b2)
            return b1, b2, nl1, nl2

        # -block_prefetch bounds the decoded-block window held in memory
        # (reference: ring of block_prefetch AnalysisJob blocks); our unit
        # is one block_size batch per queue slot and stream
        depth = min(64, max(1, self.get_int("block_prefetch") // 2))

        def trimmed_batches(r1, r2):
            source = prefetch_paired(r1, r2, depth=depth)
            if not use_pool:
                for pair in source:
                    res = trim_pair(pair)
                    if res is None:
                        return
                    yield res
                return
            # bounded in-order future window (executor.map would consume
            # the whole decode stream eagerly)
            from collections import deque
            pending = deque()
            for pair in source:
                pending.append(pool.submit(trim_pair, pair))
                if len(pending) > threads + 1:
                    res = pending.popleft().result()
                    if res is None:
                        break
                    yield res
            while pending:
                res = pending.popleft().result()
                if res is None:
                    break
                yield res

        processed_reads = 0
        for f1, f2 in zip(in1, in2):
            r1 = FastqReader(f1, batch_reads=block, keep_headers=True,
                             flat_headers=True)
            r2 = FastqReader(f2, batch_reads=block, keep_headers=True,
                             flat_headers=True)
            # paired decode thread overlaps the device scans (P1 analogue)
            for b1, b2, new_len1, new_len2 in trimmed_batches(r1, r2):
                processed_reads += 2 * len(b1)
                keep_pair = (new_len1 >= min_len) & (new_len2 >= min_len)
                w1.write_batch(b1, keep_pair, new_len1)
                w2.write_batch(b2, keep_pair, new_len2)
                removed = 0
                if w3 is not None:
                    only1 = ~keep_pair & (new_len1 >= min_len)
                    only2 = ~keep_pair & (new_len2 >= min_len)
                    w3.write_batch(b1, only1, new_len1)
                    w4.write_batch(b2, only2, new_len2)
                    removed += int(only1.sum()) + int(only2.sum())
                    removed += 2 * int((~keep_pair & ~only1 & ~only2).sum())
                else:
                    removed += 2 * int((~keep_pair).sum())
                engine.stats.reads_removed += removed
                progress.update(processed_reads=processed_reads)

        w1.close()
        w2.close()
        if w3 is not None:
            w3.close()
            w4.close()
        if use_pool:
            pool.shutdown(wait=True)
            while not workers.empty():
                engine.stats.merge(workers.get().stats)

        out = summary_stream
        engine.write_summary(out, a1, a2)
        if params.ec:
            engine.write_ec_summary(out)
        if summary_path:
            out.close()

        if qc_file:
            # NOTE: the reference's SeqPurge qcML carries no 'source file'
            # entries (pinned by the SeqPurge_out1.qcML golden)
            qc.get_result().store_to_qcml(qc_file, [], "")


TOOLS = {"SeqPurge": SeqPurgeTool}
