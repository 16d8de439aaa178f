"""Device-mesh construction + sharded QC reduction steps.

The reference is single-node multi-threaded (QThreadPool fan-out over genomic
chunks / read blocks, SURVEY §2.5). The TPU-native equivalent implemented
here: read batches are sharded over a 1-D `data` mesh axis with
``shard_map``; each device reduces its shard to tiny accumulator partials;
partials are merged with ``psum`` over ICI so the host receives one merged
state per step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import readqc as readqc_ops


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis,))


def distributed_init(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """Multi-host runtime bring-up (jax.distributed.initialize wrapper).

    On a multi-host TPU slice each host calls this once before building the
    global mesh; with no arguments JAX discovers the topology from the TPU
    runtime environment. Safe to call when already initialized.
    """
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as exc:
        if "already" not in str(exc).lower():
            raise


def sharded_coverage_step(mesh: Mesh, starts, ends, genome_bins: int):
    """Data-parallel coverage accumulation over read spans.

    starts/ends: [N] int32 bin indices of read alignment spans (half-open),
    sharded over the mesh batch axis. Each device scatter-adds its shard
    into a local diff array; diffs are psum-merged over ICI and prefix-summed
    on device — the TPU-native analogue of WorkerLowOrHighCoverageChr's
    per-base uint8 arrays (WorkerLowOrHighCoverage.cpp:173-204) without the
    cap-at-254 artifact.

    Returns [genome_bins] int32 coverage.
    """
    axis = mesh.axis_names[0]

    def step(s, e):
        diff = jnp.zeros((genome_bins + 1,), jnp.int32)
        diff = diff.at[s].add(1)
        diff = diff.at[e].add(-1)
        diff = jax.lax.psum(diff, axis)
        return jnp.cumsum(diff)[:genome_bins]

    fn = jax.jit(jax.shard_map(step, mesh=mesh,
                               in_specs=(P(axis), P(axis)),
                               out_specs=P()))
    return fn(jnp.asarray(starts, jnp.int32), jnp.asarray(ends, jnp.int32))


def sharded_insert_scan(mesh: Mesh, seq1, seq2rc, min_len):
    """SeqPurge insert-match scan sharded over read pairs.

    Embarrassingly parallel over the batch axis (SURVEY §2.5 P3): outputs
    stay sharded per pair, no collective needed. Uses the portable XLA
    formulation inside shard_map (the Pallas kernel handles the single-chip
    hot path; this demonstrates the multi-chip layout).
    """
    from ..ops import seqpurge as sp_ops
    axis = mesh.axis_names[0]
    fn = jax.jit(jax.shard_map(
        lambda a, b, c: sp_ops.insert_scan_raw()(a, b, c),
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(axis, None)),
    ))
    return fn(jnp.asarray(seq1), jnp.asarray(seq2rc),
              jnp.asarray(min_len, jnp.int32))


def sharded_readqc_step(mesh: Mesh, bases, quals, lengths):
    """One data-parallel ReadQC reduction step over the mesh.

    bases/quals: [B, L] uint8, lengths: [B] int32 — B divisible by mesh size.
    Returns merged (counts5, qsum_cycle, qhist, read_qsum) with read_qsum
    remaining sharded over the batch axis.
    """
    axis = mesh.axis_names[0]

    def step(b, q, l):
        counts5, qsum_cycle, qhist, read_qsum = readqc_ops.readqc_batch_raw()(b, q, l)
        counts5 = jax.lax.psum(counts5, axis)
        qsum_cycle = jax.lax.psum(qsum_cycle, axis)
        qhist = jax.lax.psum(qhist, axis)
        return counts5, qsum_cycle, qhist, read_qsum

    shard = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis)),
        out_specs=(P(), P(), P(), P(axis)),
    )
    fn = jax.jit(shard)
    return fn(jnp.asarray(bases), jnp.asarray(quals), jnp.asarray(lengths))


def sharded_mapping_counters_step(mesh: Mesh, flags, mapqs, on_target):
    """Data-parallel MappingQC counter reduction.

    flags: [N] uint16 SAM flags, mapqs: [N] int32, on_target: [N] bool —
    sharded over the batch axis; per-shard counter partials are psum-merged
    over ICI (the mesh analogue of the reference's per-thread counter
    accumulation in Statistics::mapping).

    Returns int32 [5]: reads, mapped, duplicates, on-target, mapq0.
    """
    axis = mesh.axis_names[0]

    def step(f, q, t):
        mapped = (f & 0x4) == 0
        counters = jnp.stack([
            jnp.asarray(f.shape[0], jnp.int32),
            mapped.sum().astype(jnp.int32),
            ((f & 0x400) != 0).sum().astype(jnp.int32),
            (mapped & t).sum().astype(jnp.int32),
            (mapped & (q == 0)).sum().astype(jnp.int32),
        ])
        return jax.lax.psum(counters, axis)

    fn = jax.jit(jax.shard_map(step, mesh=mesh,
                               in_specs=(P(axis), P(axis), P(axis)),
                               out_specs=P()))
    return fn(jnp.asarray(flags, jnp.uint16), jnp.asarray(mapqs, jnp.int32),
              jnp.asarray(on_target, bool))


def sharded_correlation_step(mesh: Mesh, x, y):
    """SampleSimilarity correlation with sharded partial-moment merges.

    x/y: [N] float32 genotype/AF vectors sharded over the batch axis; each
    device computes partial (n, sx, sy, sxx, syy, sxy), merged with one psum,
    correlation evaluated on device — the mesh analogue of
    SampleSimilarity::calculateSimilarity's single-pass moment sums.
    """
    axis = mesh.axis_names[0]

    def step(a, b):
        parts = jnp.stack([
            jnp.asarray(a.shape[0], jnp.float32),
            a.sum(), b.sum(), (a * a).sum(), (b * b).sum(), (a * b).sum(),
        ])
        n, sx, sy, sxx, syy, sxy = jax.lax.psum(parts, axis)
        cov = sxy / n - sx / n * sy / n
        var_x = sxx / n - (sx / n) ** 2
        var_y = syy / n - (sy / n) ** 2
        return cov / jnp.sqrt(var_x * var_y)

    fn = jax.jit(jax.shard_map(step, mesh=mesh,
                               in_specs=(P(axis), P(axis)), out_specs=P()))
    return fn(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32))
