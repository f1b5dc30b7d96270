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
