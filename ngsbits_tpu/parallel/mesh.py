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


def sharded_readqc_step(mesh: Mesh, bases, quals, lengths):
    """One data-parallel ReadQC reduction step over the mesh.

    bases/quals: [B, L] uint8, lengths: [B] int32 — B divisible by mesh size.
    Returns merged (counts5, qsum_cycle, qhist, read_qsum) with read_qsum
    remaining sharded over the batch axis.
    """
    axis = mesh.axis_names[0]

    def step(b, q, l):
        counts5, qsum_cycle, qhist, read_qsum = readqc_ops.readqc_batch.__wrapped__(b, q, l)
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
