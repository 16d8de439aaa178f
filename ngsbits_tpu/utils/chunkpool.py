"""Ordered chunk-parallel line processing (the reference's ChunkProcessor
thread-pool pattern, e.g. VcfAnnotateConsequence/VcfAnnotateFromVcf).

Python's GIL makes threads useless for pure-Python per-line work, so the
pool forks worker processes (state inherited copy-on-write) when jax is not
loaded; otherwise a thread pool at least overlaps IO (tabix/fasta reads use
per-thread fds or pread). Chunk outputs are concatenated in order, so the
result is byte-identical to a sequential pass.
"""

from __future__ import annotations

import sys

_FN = None
_STATE = None


def _run_chunk(chunk):
    return _FN(chunk, _STATE)


def process_chunks(items: list, fn, state, threads: int, block_size: int) -> list:
    """Apply fn(chunk, state) -> list over block_size chunks of items;
    returns the concatenated results in input order."""
    threads = max(1, threads)
    block = max(1, block_size)
    chunks = [items[i:i + block] for i in range(0, len(items), block)]
    out: list = []
    if threads > 1 and len(chunks) > 1 and "jax" not in sys.modules:
        global _FN, _STATE
        import multiprocessing as mp
        try:
            ctx = mp.get_context("fork")
        except ValueError:
            ctx = None  # no fork start method (e.g. Windows) -> thread pool
        if ctx is not None:
            _FN, _STATE = fn, state
            try:
                with ctx.Pool(processes=min(threads, len(chunks))) as pool:
                    for part in pool.imap(_run_chunk, chunks):
                        out.extend(part)
            finally:
                _FN = _STATE = None
            return out
    if threads > 1 and len(chunks) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(threads, len(chunks))) as ex:
            for part in ex.map(lambda c: fn(c, state), chunks):
                out.extend(part)
        return out
    for chunk in chunks:
        out.extend(fn(chunk, state))
    return out
