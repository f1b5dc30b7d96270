"""PointPillars feature encoder + BEV scatter (parity components).

ref layers/blocks_3d/det3d/vfe/pillar_vfe.py:8-145 (PFNLayer / PillarVFE) and
layers/blocks_2d/det3d/map_to_bev/pointpillar_scatter.py:5-40. The active exps
use the mean-VFE + sparse ResNet path, but the pillar path is part of the
reference's surface (and the natural dense-2D alternative lidar encoder on
TPU, SURVEY.md §2.2). Fixed-shape: pillars padded to a cap; BN masked over
valid pillars.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from unidistill_tpu.layers.lidar_encoder import MaskedBatchNorm


class PFNLayer(nn.Module):
    out_channels: int
    use_norm: bool = True
    last_layer: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, pillar_mask, point_mask, train: bool):
        """x: [P, N, C]; pillar_mask: [P]; point_mask: [P, N]."""
        out = self.out_channels if self.last_layer else self.out_channels // 2
        x = nn.Dense(out, use_bias=not self.use_norm, dtype=self.dtype,
                     name="linear")(x)
        if self.use_norm:
            P, N, C = x.shape
            x = MaskedBatchNorm(name="norm")(
                x.reshape(1, P * N, C),
                (point_mask & pillar_mask[:, None]).reshape(1, P * N),
                train,
            ).reshape(P, N, C)
        x = nn.relu(x)
        x = jnp.where(point_mask[..., None], x, 0.0)
        x_max = jnp.max(x, axis=1, keepdims=True)
        if self.last_layer:
            return x_max
        return jnp.concatenate(
            [x, jnp.broadcast_to(x_max, x.shape)], axis=-1
        )


class PillarVFE(nn.Module):
    num_filters: Sequence[int] = (64,)
    use_norm: bool = True
    with_distance: bool = False
    use_absolute_xyz: bool = True
    voxel_size: Tuple[float, float, float] = (0.075, 0.075, 8.0)
    point_cloud_range: Tuple[float, ...] = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, voxel_features, voxel_coords, voxel_num_points, train: bool):
        """voxel_features [P, N, C] raw points per pillar; voxel_coords
        [P, 3] (z, y, x); voxel_num_points [P]. Returns [P, num_filters[-1]]."""
        n = jnp.maximum(voxel_num_points, 1).astype(voxel_features.dtype)
        mean = voxel_features[:, :, :3].sum(1, keepdims=True) / n[:, None, None]
        f_cluster = voxel_features[:, :, :3] - mean

        vx, vy, vz = self.voxel_size
        x0 = vx / 2 + self.point_cloud_range[0]
        y0 = vy / 2 + self.point_cloud_range[1]
        z0 = vz / 2 + self.point_cloud_range[2]
        cxyz = jnp.stack(
            [
                voxel_coords[:, 2].astype(voxel_features.dtype) * vx + x0,
                voxel_coords[:, 1].astype(voxel_features.dtype) * vy + y0,
                voxel_coords[:, 0].astype(voxel_features.dtype) * vz + z0,
            ],
            axis=-1,
        )
        f_center = voxel_features[:, :, :3] - cxyz[:, None, :]

        feats = [voxel_features if self.use_absolute_xyz
                 else voxel_features[..., 3:], f_cluster, f_center]
        if self.with_distance:
            feats.append(
                jnp.linalg.norm(voxel_features[:, :, :3], axis=-1, keepdims=True)
            )
        x = jnp.concatenate(feats, axis=-1)

        N = x.shape[1]
        point_mask = (
            jnp.arange(N)[None, :] < voxel_num_points[:, None]
        )
        pillar_mask = voxel_num_points > 0
        x = jnp.where(point_mask[..., None], x, 0.0)
        for i, f in enumerate(self.num_filters):
            x = PFNLayer(
                f, self.use_norm, last_layer=(i == len(self.num_filters) - 1),
                dtype=self.dtype, name=f"pfn{i}",
            )(x, pillar_mask, point_mask, train)
        return x[:, 0, :]  # [P, C]


def pointpillar_scatter(
    pillar_features: jnp.ndarray,
    voxel_coords: jnp.ndarray,
    valid: jnp.ndarray,
    grid_size: Tuple[int, int, int],
) -> jnp.ndarray:
    """Scatter per-sample pillar features to the dense BEV canvas
    (ref pointpillar_scatter.py:13-40). pillar_features [P, C],
    voxel_coords [P, 3] (z, y, x), valid [P] → [ny, nx, C]."""
    nx, ny, nz = grid_size
    assert nz == 1
    idx = jnp.where(valid, voxel_coords[:, 1] * nx + voxel_coords[:, 2], nx * ny)
    canvas = jnp.zeros((nx * ny + 1, pillar_features.shape[-1]),
                       dtype=pillar_features.dtype)
    canvas = canvas.at[idx].set(pillar_features, mode="drop")
    return canvas[: nx * ny].reshape(ny, nx, -1)
