"""Points-in-rotated-box tests — TPU-native replacement for the
`roiaware_pool3d_cuda` extension's query ops (ref
utils/det3d_utils/roiaware_pool3d_utils.py:15-100; only reachable from the
dead GT-sampling path in the reference, SURVEY.md §2.2, but part of the
public surface). Fully vectorized jnp; works under jit/vmap."""
from __future__ import annotations

import jax.numpy as jnp


def points_in_boxes_bev(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """points [N, >=2], boxes [M, >=7] (x, y, z, dx, dy, dz, rot).
    Returns [M, N] bool: point inside the rotated BEV rectangle."""
    px = points[None, :, 0] - boxes[:, None, 0]
    py = points[None, :, 1] - boxes[:, None, 1]
    c = jnp.cos(-boxes[:, None, 6])
    s = jnp.sin(-boxes[:, None, 6])
    lx = px * c - py * s
    ly = px * s + py * c
    return (jnp.abs(lx) <= boxes[:, None, 3] / 2) & (
        jnp.abs(ly) <= boxes[:, None, 4] / 2
    )


def points_in_boxes_3d(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """[M, N] bool with the z extent included (box z = center of the box,
    matching OpenPCDet's (x, y, z, dx, dy, dz, heading) with z at the center)."""
    bev = points_in_boxes_bev(points, boxes)
    dz = points[None, :, 2] - boxes[:, None, 2]
    return bev & (jnp.abs(dz) <= boxes[:, None, 5] / 2)


def remove_points_in_boxes(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Mask (True = keep) of points outside every box
    (ref box_utils.remove_points_in_boxes3d, box_utils.py:99)."""
    inside = points_in_boxes_3d(points, boxes).any(axis=0)
    return ~inside
