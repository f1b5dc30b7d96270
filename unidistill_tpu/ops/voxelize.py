"""Fixed-shape point-cloud voxelization + mean VFE, fully on device.

Replaces the reference's spconv `PointToVoxel` CUDA voxelizer + `MeanVFE`
(ref data/det3d/preprocess/voxelization.py:8-73, layers/…/vfe/mean_vfe.py:6-34).

Semantics matched:
  * points outside `point_cloud_range` are dropped;
  * at most `max_points_per_voxel` points count per voxel, keeping the FIRST
    arrivals in point order (PointToVoxel truncation rule) — guaranteed here
    by a stable sort on voxel key;
  * voxel features are the mean over the kept points (MeanVFE: sum / max(n,1)).

Known deviation (documented, SURVEY.md §7 hard part #2): when the number of
occupied voxels exceeds `max_voxels`, PointToVoxel keeps voxels in first-
occurrence order while we keep them in ascending linearized-coordinate order.
With the nuScenes grid (1440×1440×40) occupancy is ~60–100k < 120k cap, so
truncation virtually never fires; the kept *set* is identical otherwise.

TPU design: one stable sort over a static [P] key array + segment arithmetic —
no dynamic shapes, no host round-trip. Sorting 2^18 keys is microseconds on a
v5 chip and XLA fuses the downstream segment ops.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class VoxelizedPoints(NamedTuple):
    features: jnp.ndarray  # [V, C] mean point feature per voxel (0 for empty slots)
    coords: jnp.ndarray  # [V, 3] int32 (z, y, x); -1 for empty slots
    num_points: jnp.ndarray  # [V] int32 points per voxel (post-cap)
    num_voxels: jnp.ndarray  # [] int32 number of live voxel slots


def voxelize(
    points: jnp.ndarray,
    points_mask: jnp.ndarray,
    point_cloud_range: Tuple[float, ...],
    voxel_size: Tuple[float, ...],
    grid_size: Tuple[int, int, int],
    max_voxels: int,
    max_points_per_voxel: int,
) -> VoxelizedPoints:
    """Voxelize one frame's padded point cloud.

    Args:
      points: [P, C] float (x, y, z, intensity, dt); padding rows arbitrary.
      points_mask: [P] bool, False for padding rows.
      grid_size: (nx, ny, nz) static.
      max_voxels: static output voxel cap V.
    """
    P = points.shape[0]
    nx, ny, nz = grid_size
    pcr = jnp.asarray(point_cloud_range, dtype=points.dtype)
    vsz = jnp.asarray(voxel_size, dtype=points.dtype)

    xyz = points[:, :3]
    vc = jnp.floor((xyz - pcr[:3]) / vsz).astype(jnp.int32)  # [P, 3] (x, y, z)
    in_range = (
        (vc[:, 0] >= 0)
        & (vc[:, 0] < nx)
        & (vc[:, 1] >= 0)
        & (vc[:, 1] < ny)
        & (vc[:, 2] >= 0)
        & (vc[:, 2] < nz)
        & points_mask
    )
    # xy-major linear key — must match ops/sparse_conv.linear_key so voxel
    # slots arrive column-contiguous in z (one BEV column = consecutive rows)
    key = (vc[:, 1] * nx + vc[:, 0]) * nz + vc[:, 2]
    big = jnp.int32(nx * ny * nz)
    key = jnp.where(in_range, key, big)

    order = jnp.argsort(key, stable=True)  # stable → keeps point order per voxel
    skey = key[order]
    spoints = points[order]

    is_start = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    is_start &= skey < big
    seg_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1  # [P] voxel slot per point
    seg_id = jnp.where(skey < big, seg_id, max_voxels)  # dump invalid

    # rank of each point within its voxel (0-based, in original point order)
    pos = jnp.arange(P, dtype=jnp.int32)
    start_pos = jnp.where(is_start, pos, 0)
    seg_start = jax.ops.segment_max(
        start_pos, jnp.minimum(seg_id, max_voxels), num_segments=max_voxels + 1
    )
    rank = pos - seg_start[jnp.minimum(seg_id, max_voxels)]
    keep = (rank < max_points_per_voxel) & (skey < big) & (seg_id < max_voxels)

    seg_safe = jnp.where(keep, seg_id, max_voxels)
    feat_sum = jax.ops.segment_sum(
        jnp.where(keep[:, None], spoints, 0.0), seg_safe, num_segments=max_voxels + 1
    )[:max_voxels]
    counts = jax.ops.segment_sum(
        keep.astype(jnp.int32), seg_safe, num_segments=max_voxels + 1
    )[:max_voxels]
    feats = feat_sum / jnp.maximum(counts, 1).astype(feat_sum.dtype)[:, None]

    # voxel coords per slot: scatter (z, y, x) from segment starts
    svc = vc[order]
    coords_zyx = jnp.stack([svc[:, 2], svc[:, 1], svc[:, 0]], axis=-1)
    slot_coords = jnp.full((max_voxels + 1, 3), -1, dtype=jnp.int32)
    slot_coords = slot_coords.at[jnp.where(is_start, seg_id, max_voxels)].set(
        jnp.where(is_start[:, None], coords_zyx, -1), mode="drop"
    )
    slot_coords = slot_coords[:max_voxels]

    num_voxels = jnp.sum(is_start.astype(jnp.int32))
    num_voxels = jnp.minimum(num_voxels, max_voxels)
    return VoxelizedPoints(feats, slot_coords, counts, num_voxels)


def voxelize_batched(
    points: jnp.ndarray,
    points_mask: jnp.ndarray,
    point_cloud_range,
    voxel_size,
    grid_size,
    max_voxels: int,
    max_points_per_voxel: int,
):
    """Batched voxelize + mean VFE with flat-global segment indexing.

    Identical outputs to `jax.vmap(voxelize)` (cross-checked in tests and
    on-chip), ~15% faster on v5e: vmapped segment scatters hit batched
    layouts; flattening the batch into global segment ids with
    `indices_are_sorted=True` keeps the scatters on the fast path
    (PROFILE.md). Returns (features [B, V, C], coords [B, V, 3]).
    """
    B, P, _ = points.shape
    nx, ny, nz = grid_size
    V = max_voxels
    pcr = jnp.asarray(point_cloud_range, dtype=points.dtype)
    vsz = jnp.asarray(voxel_size, dtype=points.dtype)

    xyz = points[..., :3]
    vc = jnp.floor((xyz - pcr[:3]) / vsz).astype(jnp.int32)  # [B, P, 3] xyz
    in_range = (
        (vc[..., 0] >= 0) & (vc[..., 0] < nx)
        & (vc[..., 1] >= 0) & (vc[..., 1] < ny)
        & (vc[..., 2] >= 0) & (vc[..., 2] < nz)
        & points_mask
    )
    big = jnp.int32(nx * ny * nz)
    key = jnp.where(
        in_range, (vc[..., 1] * nx + vc[..., 0]) * nz + vc[..., 2], big
    )
    order = jnp.argsort(key, axis=1, stable=True)
    skey = jnp.take_along_axis(key, order, 1)
    spoints = jnp.take_along_axis(points, order[..., None], 1)
    svc = jnp.take_along_axis(vc, order[..., None], 1)

    is_start = jnp.concatenate(
        [jnp.ones((B, 1), bool), skey[:, 1:] != skey[:, :-1]], 1
    ) & (skey < big)
    seg = jnp.cumsum(is_start.astype(jnp.int32), 1) - 1
    seg = jnp.where(skey < big, jnp.minimum(seg, V), V)

    pos = jnp.arange(P, dtype=jnp.int32)[None]
    runstart = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, pos, 0), axis=1
    )
    rank = pos - runstart
    keep = (rank < max_points_per_voxel) & (seg < V)

    boff = jnp.arange(B, dtype=jnp.int32)[:, None] * (V + 1)
    gseg = (seg + boff).reshape(-1)
    data = jnp.where(keep[..., None], spoints, 0.0).reshape(B * P, -1)
    sums = jax.ops.segment_sum(
        data, gseg, num_segments=B * (V + 1), indices_are_sorted=True
    ).reshape(B, V + 1, -1)[:, :V]
    cnts = jax.ops.segment_sum(
        keep.astype(jnp.int32).reshape(-1), gseg,
        num_segments=B * (V + 1), indices_are_sorted=True,
    ).reshape(B, V + 1)[:, :V]
    feats = sums / jnp.maximum(cnts, 1)[..., None].astype(sums.dtype)

    czyx = jnp.stack([svc[..., 2], svc[..., 1], svc[..., 0]], -1)
    gdest = (jnp.where(is_start, seg, V) + boff).reshape(-1)
    slot_coords = jnp.full((B * (V + 1), 3), -1, jnp.int32)
    # NOT indices_are_sorted: the dump index V interleaves between ascending
    # slot ids whenever a voxel holds >1 point (claiming sortedness here is
    # implementation-defined and can corrupt coords under a sorted-scatter
    # lowering; gseg above IS sorted, gdest is not)
    slot_coords = slot_coords.at[gdest].set(
        czyx.reshape(-1, 3), mode="drop"
    )
    slot_coords = slot_coords.reshape(B, V + 1, 3)[:, :V]
    return feats, slot_coords
