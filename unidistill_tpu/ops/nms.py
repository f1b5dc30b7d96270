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


def _clipped_edge_contrib(p0, p1, quad, exclude_boundary=False):
    """Shoelace contribution of the part of segment p0→p1 inside convex quad.

    The boundary of A∩B is (edges of A clipped to B) ∪ (edges of B clipped to
    A), all ccw; Green's theorem sums segment contributions in ANY order, so
    no vertex sorting is needed (the sort in the naive formulation is what
    kills TPU throughput). Liang–Barsky clip against the quad's 4 half-planes.

    p0, p1: [..., 2]; quad: [..., 4, 2] (ccw). Returns [...] cross-term sums.
    """
    d = p1 - p0
    a = quad  # [..., 4, 2]
    # next-vertex (static slicing instead of roll: lowers in Pallas/Mosaic)
    b = jnp.concatenate([quad[..., 1:, :], quad[..., :1, :]], axis=-2)
    e = b - a  # edge vectors
    # inward UNIT normal of ccw edge (a→b); normalizing makes `num` a signed
    # distance in meters and `den` a projection of d, so epsilon thresholds
    # are scale-invariant and deterministic under different XLA fusions.
    elen = jnp.sqrt(e[..., 0] ** 2 + e[..., 1] ** 2) + _EPS
    nx = -(e[..., 1]) / elen
    ny = e[..., 0] / elen
    # (expand-then-index `d[..., None, 0]` lowers to an unsupported >2D
    # gather in Mosaic; index first, then broadcast)
    dx = d[..., 0][..., None]
    dy = d[..., 1][..., None]
    px0 = p0[..., 0][..., None]
    py0 = p0[..., 1][..., None]
    den = nx * dx + ny * dy  # [..., 4]
    num = nx * (a[..., 0] - px0) + ny * (a[..., 1] - py0)
    dlen = jnp.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2)[..., None] + _EPS
    PAR = 1e-5  # |den| below PAR·|d| → treat as parallel to the half-plane
    BND = 1e-5  # boundary tolerance in meters
    is_par = jnp.abs(den) <= PAR * dlen
    t = num / jnp.where(is_par, 1.0, den)
    # den > 0: entering (lower bound), den < 0: leaving (upper bound)
    t_lo = jnp.where(~is_par & (den > 0), t, 0.0)
    t_hi = jnp.where(~is_par & (den < 0), t, 1.0)
    # parallel segment handling: `exclude_boundary` makes edges lying exactly
    # ON the quad boundary count as outside — applied to one polygon's edges
    # only, so coincident edges (e.g. identical boxes) are counted once.
    thresh = -BND if exclude_boundary else BND
    parallel_out = is_par & (num > thresh)
    t0 = jnp.clip(jnp.max(t_lo, axis=-1), 0.0, 1.0)
    t1 = jnp.clip(jnp.min(t_hi, axis=-1), 0.0, 1.0)
    ok = (t1 > t0) & ~jnp.any(parallel_out, axis=-1)
    q0 = p0 + t0[..., None] * d
    q1 = p0 + t1[..., None] * d
    contrib = q0[..., 0] * q1[..., 1] - q0[..., 1] * q1[..., 0]
    return jnp.where(ok, contrib, 0.0)


def rotated_intersection_area(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray):
    """Intersection area of paired rotated BEV boxes — sort-free edge-clipping
    formulation (TPU-friendly: pure element-wise math, no sorts/gathers).

    boxes_a, boxes_b: [..., 5] (cx, cy, dx, dy, rot), broadcast-compatible.
    Returns [...] areas.
    """
    boxes_a, boxes_b = jnp.broadcast_arrays(boxes_a, boxes_b)
    qa = box_corners_bev(boxes_a)  # ccw corners
    qb = box_corners_bev(boxes_b)
    total = 0.0
    for i in range(4):
        total = total + _clipped_edge_contrib(
            qa[..., i, :], qa[..., (i + 1) % 4, :], qb
        )
        total = total + _clipped_edge_contrib(
            qb[..., i, :], qb[..., (i + 1) % 4, :], qa, exclude_boundary=True
        )
    return jnp.maximum(0.5 * total, 0.0)


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


def _iou_block_kernel(a_ref, b_ref, out_ref):
    """One [BA, BB] IoU tile, all intermediates VMEM-resident."""
    a = a_ref[:]  # [BA, 8] padded (cx, cy, dx, dy, rot, 0, 0, 0)
    b = b_ref[:]
    # avoid fancy slicing ([:, None, :5] lowers to an unsupported gather in
    # Mosaic); rotated_intersection_area only reads columns 0..4 statically.
    inter = rotated_intersection_area(a[:, None, :], b[None, :, :])
    area_a = a[:, 2] * a[:, 3]
    area_b = b[:, 2] * b[:, 3]
    out_ref[:] = inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, _EPS)


def rotated_iou_bev_pallas(
    boxes_a: jnp.ndarray,
    boxes_b: jnp.ndarray,
    block: int = 256,
    interpret: bool = False,
):
    """Pallas-tiled pairwise rotated IoU.

    The XLA version materializes [M, N, 4]-shaped clip intermediates in HBM
    (~16 ms for 4×1500² on v5e); tiling pair-blocks into VMEM makes the
    kernel compute-bound. Same tested math — the tile kernel reuses
    `rotated_intersection_area` on VMEM-resident blocks.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, N = boxes_a.shape[0], boxes_b.shape[0]
    pm, pn = (-M) % block, (-N) % block
    a = jnp.pad(boxes_a.astype(jnp.float32), ((0, pm), (0, 3)))
    b = jnp.pad(boxes_b.astype(jnp.float32), ((0, pn), (0, 3)))

    out = pl.pallas_call(
        _iou_block_kernel,
        out_shape=jax.ShapeDtypeStruct((M + pm, N + pn), jnp.float32),
        grid=((M + pm) // block, (N + pn) // block),
        in_specs=[
            pl.BlockSpec((block, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, block), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, b)
    return out[:M, :N]


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
