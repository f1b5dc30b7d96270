"""RoI-aware 3D pooling — TPU-native replacement for the reference's
`roiaware_pool3d_cuda` forward/backward extension (ref
utils/det3d_utils/roiaware_pool3d_utils.py:140-228 and the OpenPCDet CUDA
kernels it wraps). Only reachable from the reference's dead GT-sampling
path (SURVEY.md §2.2), but part of the stated public surface.

Contract (ref roiaware_pool3d_utils.py:155-173): for each ROI box
(x, y, z, dx, dy, dz, heading), points are rotated into the box's canonical
frame, binned into an (out_x, out_y, out_z) grid spanning the box extent,
and the per-cell features are max- or avg-pooled. The CUDA backward scatters
grad to the argmax point (max) or spreads it over collected points (avg) —
here both fall out of JAX autodiff through `segment_max` / `segment_sum`,
so no custom_vjp is needed.

Differences from the CUDA kernel, documented rather than replicated:
- no `max_pts_each_voxel` cap (ref default 128): the cap exists only because
  the CUDA kernel stores point indices in a fixed buffer; avg pooling here
  averages over *all* points in a cell. Identical whenever a cell holds
  <= 128 points.
- points exactly on the max-edge of the box bin into the last cell instead
  of being dropped (float `floor` boundary; measure-zero set).

Everything is fixed-shape and jit/vmap-safe.
"""
from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp


def _roi_local_coords(
    rois: jnp.ndarray, pts: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rotate points into each ROI's canonical (heading-aligned) frame.

    rois [N, 7], pts [P, 3] -> (lx, ly, lz) each [N, P].
    """
    px = pts[None, :, 0] - rois[:, None, 0]
    py = pts[None, :, 1] - rois[:, None, 1]
    pz = pts[None, :, 2] - rois[:, None, 2]
    c = jnp.cos(-rois[:, None, 6])
    s = jnp.sin(-rois[:, None, 6])
    return px * c - py * s, px * s + py * c, pz


def roiaware_pool3d(
    rois: jnp.ndarray,
    pts: jnp.ndarray,
    pts_feature: jnp.ndarray,
    out_size: Union[int, Tuple[int, int, int]],
    pool_method: str = "max",
) -> jnp.ndarray:
    """rois [N, 7], pts [P, 3], pts_feature [P, C]
    -> pooled [N, out_x, out_y, out_z, C] (empty cells are 0, matching the
    CUDA kernel's zero-initialized output buffer).

    Memory: materializes an [N*P] pair index plus the segment gather — fine
    at GT-sampling scales (tens of ROIs); for huge N*P, chunk over ROIs.
    """
    if pool_method not in ("max", "avg"):
        raise ValueError(f"pool_method must be max|avg, got {pool_method}")
    ox, oy, oz = (
        (out_size,) * 3 if isinstance(out_size, int) else tuple(out_size)
    )
    n, p = rois.shape[0], pts.shape[0]
    c_ch = pts_feature.shape[-1]

    lx, ly, lz = _roi_local_coords(rois, pts)  # [N, P]
    dx = rois[:, None, 3]
    dy = rois[:, None, 4]
    dz = rois[:, None, 5]
    # Bin index along each axis; the CUDA kernel computes
    # floor((local + d/2) / (d / out)) and clamps via an in-box test.
    vx = jnp.floor((lx + dx / 2) / (dx / ox)).astype(jnp.int32)
    vy = jnp.floor((ly + dy / 2) / (dy / oy)).astype(jnp.int32)
    vz = jnp.floor((lz + dz / 2) / (dz / oz)).astype(jnp.int32)
    vx = jnp.clip(vx, 0, ox - 1)
    vy = jnp.clip(vy, 0, oy - 1)
    vz = jnp.clip(vz, 0, oz - 1)
    in_box = (
        (jnp.abs(lx) <= dx / 2)
        & (jnp.abs(ly) <= dy / 2)
        & (jnp.abs(lz) <= dz / 2)
    )

    cells = ox * oy * oz
    roi_ids = jnp.arange(n, dtype=jnp.int32)[:, None]
    flat = roi_ids * cells + (vx * oy + vy) * oz + vz  # [N, P]
    flat = jnp.where(in_box, flat, n * cells)  # dump row for outside points
    flat = flat.reshape(-1)  # [N*P]

    feats = jnp.broadcast_to(pts_feature[None], (n, p, c_ch)).reshape(-1, c_ch)
    num_segments = n * cells + 1
    # counts in f32 regardless of feature dtype: bf16 accumulation saturates
    # at 256 points/cell and silently skews the avg-pool mean
    counts = jax.ops.segment_sum(
        jnp.ones((n * p,), jnp.float32), flat, num_segments=num_segments
    )
    if pool_method == "max":
        pooled = jax.ops.segment_max(
            feats, flat, num_segments=num_segments, indices_are_sorted=False
        )
        pooled = jnp.where(counts[:, None] > 0, pooled, 0.0)
    else:
        # accumulate in f32: a bf16 running sum saturates (ulp ≥ 4 past 512)
        sums = jax.ops.segment_sum(
            feats.astype(jnp.float32), flat, num_segments=num_segments
        )
        pooled = (
            sums / jnp.maximum(counts[:, None], 1.0)
        ).astype(pts_feature.dtype)
    return pooled[: n * cells].reshape(n, ox, oy, oz, c_ch)


def points_in_boxes_index(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Per-point index of the first containing box, -1 = background.
    points [P, 3], boxes [M, 7] -> [P] int32.
    Matches ref `points_in_boxes_gpu` (roiaware_pool3d_utils.py:36-52): the
    CUDA kernel scans boxes in order and stops at the first hit."""
    from unidistill_tpu.ops.points_in_boxes import points_in_boxes_3d

    inside = points_in_boxes_3d(points, boxes)  # [M, P] bool
    first = jnp.argmax(inside, axis=0).astype(jnp.int32)  # first True per point
    any_hit = inside.any(axis=0)
    return jnp.where(any_hit, first, -1)


def bev_in_boxes(
    bev_coords: jnp.ndarray, boxes: jnp.ndarray, bev_range
) -> jnp.ndarray:
    """BEV-grid cell -> index of first box whose rotated BEV rectangle
    contains it (range-clipped), -1 = background.
    bev_coords [X, Y, 2] world xy per cell, boxes [M, 7], bev_range
    (x_min, y_min, z_min, x_max, y_max, z_max).
    Matches ref `bev_in_boxes_cpu/gpu` (roiaware_pool3d_utils.py:55-113)."""
    from unidistill_tpu.ops.points_in_boxes import points_in_boxes_bev

    x_min, y_min, _, x_max, y_max, _ = bev_range
    xdim, ydim = bev_coords.shape[:2]
    flat = bev_coords.reshape(-1, 2)
    inside = points_in_boxes_bev(flat, boxes)  # [M, X*Y]
    in_range = (
        (flat[:, 0] >= x_min)
        & (flat[:, 0] <= x_max)
        & (flat[:, 1] >= y_min)
        & (flat[:, 1] <= y_max)
    )
    first = jnp.argmax(inside, axis=0).astype(jnp.int32)
    hit = inside.any(axis=0) & in_range
    return jnp.where(hit, first, -1).reshape(xdim, ydim)
