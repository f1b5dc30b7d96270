"""Rotated-BEV-IoU greedy NMS with fixed shapes, fully on device.

Replaces the `iou3d_nms_cuda.nms_gpu` extension (contract from ref
centerpoint_gen_proposals.py:85-105: boxes [N, 7] (x, y, z, dx, dy, dz, rot)
sorted by score descending, greedy suppression at rotated-BEV IoU > thresh).

TPU design (SURVEY.md §7 hard part #3): the pairwise rotated IoU matrix is
computed via the corner/edge-intersection candidate-point formulation (the
same geometry the CUDA kernel clips with), blocked to bound live memory, then
greedy suppression runs as a `lax.fori_loop` over score rank with a boolean
alive-mask — no dynamic shapes, output is a fixed-size index buffer + count.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def box_corners_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 5] (cx, cy, dx, dy, rot) -> [..., 4, 2] corners (ccw)."""
    cx, cy, dx, dy, r = (boxes[..., i] for i in range(5))
    c, s = jnp.cos(r), jnp.sin(r)
    hx, hy = dx * 0.5, dy * 0.5
    # local corners (±hx, ±hy) rotated by r
    lx = jnp.stack([hx, -hx, -hx, hx], axis=-1)
    ly = jnp.stack([hy, hy, -hy, -hy], axis=-1)
    px = cx[..., None] + lx * c[..., None] - ly * s[..., None]
    py = cy[..., None] + lx * s[..., None] + ly * c[..., None]
    return jnp.stack([px, py], axis=-1)


def _cross(o, a, b):
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _point_in_quad(pts, quad):
    """pts [..., P, 2] inside convex quad [..., 4, 2] (ccw)? -> [..., P] bool."""
    p = pts[..., :, None, :]  # [..., P, 1, 2]
    a = quad[..., None, :, :]  # [..., 1, 4, 2]
    b = jnp.roll(quad, -1, axis=-2)[..., None, :, :]
    cr = (b[..., 0] - a[..., 0]) * (p[..., 1] - a[..., 1]) - (
        b[..., 1] - a[..., 1]
    ) * (p[..., 0] - a[..., 0])
    return jnp.all(cr >= -_EPS, axis=-1)


def _seg_intersections(qa, qb):
    """All 16 edge-edge intersection points of two quads.

    qa, qb: [..., 4, 2]. Returns pts [..., 16, 2], valid [..., 16].
    """
    a0 = qa[..., :, None, :]  # [..., 4, 1, 2]
    a1 = jnp.roll(qa, -1, axis=-2)[..., :, None, :]
    b0 = qb[..., None, :, :]  # [..., 1, 4, 2]
    b1 = jnp.roll(qb, -1, axis=-2)[..., None, :, :]
    da = a1 - a0
    db = b1 - b0
    denom = da[..., 0] * db[..., 1] - da[..., 1] * db[..., 0]
    diff = b0 - a0
    t = (diff[..., 0] * db[..., 1] - diff[..., 1] * db[..., 0]) / (
        jnp.where(jnp.abs(denom) < _EPS, 1.0, denom)
    )
    u = (diff[..., 0] * da[..., 1] - diff[..., 1] * da[..., 0]) / (
        jnp.where(jnp.abs(denom) < _EPS, 1.0, denom)
    )
    valid = (
        (jnp.abs(denom) >= _EPS)
        & (t >= -_EPS)
        & (t <= 1 + _EPS)
        & (u >= -_EPS)
        & (u <= 1 + _EPS)
    )
    pt = a0 + t[..., None] * da
    shp = pt.shape[:-3] + (16, 2)
    return pt.reshape(shp), valid.reshape(shp[:-1])


def rotated_intersection_area(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray):
    """Intersection area of paired rotated BEV boxes.

    boxes_a, boxes_b: [..., 5] (cx, cy, dx, dy, rot), broadcast-compatible.
    Returns [...] areas.
    """
    boxes_a, boxes_b = jnp.broadcast_arrays(boxes_a, boxes_b)
    qa = box_corners_bev(boxes_a)
    qb = box_corners_bev(boxes_b)
    in_b = _point_in_quad(qa, qb)  # corners of a in b [..., 4]
    in_a = _point_in_quad(qb, qa)
    xpts, xval = _seg_intersections(qa, qb)  # [..., 16, 2]

    pts = jnp.concatenate([qa, qb, xpts], axis=-2)  # [..., 24, 2]
    val = jnp.concatenate([in_b, in_a, xval], axis=-1)  # [..., 24]

    n = jnp.sum(val, axis=-1)  # number of polygon vertices
    centroid = jnp.sum(
        jnp.where(val[..., None], pts, 0.0), axis=-2
    ) / jnp.maximum(n, 1)[..., None]
    ang = jnp.arctan2(
        pts[..., 1] - centroid[..., 1:2], pts[..., 0] - centroid[..., 0:1]
    )
    ang = jnp.where(val, ang, jnp.inf)  # invalid last
    order = jnp.argsort(ang, axis=-1)
    spts = jnp.take_along_axis(pts, order[..., None], axis=-2)

    idx = jnp.arange(24)
    nxt = jnp.where(idx + 1 < n[..., None], idx + 1, 0)
    p1 = spts
    p2 = jnp.take_along_axis(spts, nxt[..., None], axis=-2)
    contrib = p1[..., 0] * p2[..., 1] - p1[..., 1] * p2[..., 0]
    contrib = jnp.where(idx < n[..., None], contrib, 0.0)
    area = 0.5 * jnp.abs(jnp.sum(contrib, axis=-1))
    return jnp.where(n >= 3, area, 0.0)


def rotated_iou_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray, block: int = 128):
    """Pairwise rotated BEV IoU matrix [M, N] for [M, 5] x [N, 5], blocked over rows."""
    M = boxes_a.shape[0]
    pad = (-M) % block
    a = jnp.pad(boxes_a, ((0, pad), (0, 0)))

    def row_block(ab):
        inter = rotated_intersection_area(ab[:, None, :], boxes_b[None, :, :])
        area_a = (ab[:, 2] * ab[:, 3])[:, None]
        area_b = (boxes_b[:, 2] * boxes_b[:, 3])[None, :]
        return inter / jnp.maximum(area_a + area_b - inter, _EPS)

    blocks = jax.lax.map(row_block, a.reshape(-1, block, 5))
    return blocks.reshape(-1, boxes_b.shape[0])[:M]


def nms_bev(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    post_max_size: int,
):
    """Greedy rotated-BEV NMS.

    Args:
      boxes: [K, 7] (x, y, z, dx, dy, dz, rot) — K is the pre-NMS cap; rows
        must already be sorted by the NMS score descending.
      scores: [K] the NMS scores (descending).
      valid: [K] bool, False rows are ignored.
      iou_threshold: suppression threshold.
      post_max_size: static output cap.

    Returns:
      keep_idx: [post_max_size] int32 indices into the input (padded with K),
      keep_mask: [post_max_size] bool.
    """
    K = boxes.shape[0]
    bev = jnp.concatenate(
        [boxes[:, 0:2], boxes[:, 3:5], boxes[:, 6:7]], axis=-1
    )  # (cx, cy, dx, dy, rot)
    iou = rotated_iou_bev(bev, bev)

    suppress_from = (iou > iou_threshold) & valid[None, :]

    def body(i, alive):
        keep_i = alive[i]
        return jnp.where(keep_i, alive & ~suppress_from[i].at[i].set(False), alive)

    alive = jax.lax.fori_loop(0, K, body, valid)
    # select first post_max_size alive indices in score order
    rank = jnp.cumsum(alive.astype(jnp.int32)) - 1
    keep_idx = jnp.full((post_max_size,), K, dtype=jnp.int32)
    src = jnp.arange(K, dtype=jnp.int32)
    keep_idx = keep_idx.at[jnp.where(alive, rank, post_max_size)].set(
        src, mode="drop"
    )
    keep_mask = keep_idx < K
    return keep_idx, keep_mask
