"""Device mesh + sharding helpers.

The reference's only parallelism is DDP data parallelism over NCCL
(SURVEY.md §2.3; utils/torch_dist.py). TPU-natively that is: one
`jax.sharding.Mesh` with a `dp` axis, batch arrays sharded on axis 0,
parameters replicated, gradients `psum`-averaged inside the single jitted
step — no separate DDP machinery. A `bev` axis is reserved for spatial
sharding of the 180×180 grid (stretch goal; reference has no analog).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, dp: Optional[int] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    dp = dp or len(devices)
    return Mesh(np.asarray(devices[:dp]).reshape(dp), (DP_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def interleave_process_results(per_process: Sequence[Sequence], total: Optional[int] = None):
    """Reference eval-gather reconstruction: per-process result lists are
    interleaved [p0[0], p1[0], …, p0[1], …] and truncated to the dataset
    length (ref …base_exp.py:396-417 does the same for DDP ranks, whose
    samplers stride the dataset by rank)."""
    out = []
    for row in zip(*per_process):
        out.extend(row)
    return out if total is None else out[:total]


def all_gather_host_objects(local: Sequence, total: Optional[int] = None):
    """Multi-host eval gather: every process contributes its local prediction
    list; returns the interleaved global list on every process (the TPU-native
    analog of the reference's `all_gather_object`, utils/torch_dist.py:36-52).

    Single-process (this repo's tested deployment — one v5e host) is a
    passthrough. Multi-process uses `multihost_utils.process_allgather` on
    the stacked array pytrees; all processes must hold equally many items of
    identical structure (true for fixed-shape eval batches with drop-less
    padding)."""
    if jax.process_count() == 1:
        return list(local) if total is None else list(local)[:total]
    from jax.experimental import multihost_utils

    stacked = jax.tree.map(lambda *xs: np.stack(xs), *local)
    gathered = multihost_utils.process_allgather(stacked)  # [P, N, ...]
    n_local = len(local)
    per_process = [
        [
            jax.tree.map(lambda g, p=p, i=i: g[p][i], gathered)
            for i in range(n_local)
        ]
        for p in range(jax.process_count())
    ]
    return interleave_process_results(per_process, total)
