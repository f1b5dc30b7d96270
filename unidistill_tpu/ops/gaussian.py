"""Vectorized on-device Gaussian response masks for distillation.

The reference draws a Gaussian per GT box on the CPU with a numpy double loop
every training step and copies the mask to the GPU
(ref …camera_exp_distill_lidar.py:100-178: calculate_box_mask_gaussian /
gaussian_radius / draw_umich_gaussian). That loop is on the step's critical
path (SURVEY.md §3 hot loop #5). Here the whole thing is one fused jnp
expression evaluated on the TPU inside the jitted train step.

Semantics matched to the reference:
  * radius = floor(min(r1, r2, r3)) from the CornerNet overlap quadratics with
    min_overlap=0.7, computed on (w, h) in *feature cells*.
  * the Gaussian is centered at the integer cell (int(cx), int(cy)), has
    sigma = (2r+1)/6, is truncated to the |dx|<=r, |dy|<=r patch, and frames
    combine via elementwise max.
  * boxes whose row sums to zero are padding. NOTE the reference *breaks* at
    the first zero row; we skip all zero rows (identical result for
    tail-padded input, which is what the collate produces).
"""
from __future__ import annotations

import jax.numpy as jnp


def gaussian_radius(height: jnp.ndarray, width: jnp.ndarray, min_overlap: float = 0.7):
    """CornerNet radius (ref …camera_exp_distill_lidar.py:131-151). Element-wise."""
    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1**2 - 4 * a1 * c1, 0.0))
    r1 = (b1 + sq1) / 2

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(jnp.maximum(b2**2 - 4 * a2 * c2, 0.0))
    r2 = (b2 + sq2) / 2

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(jnp.maximum(b3**2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def box_mask_gaussian(
    gt_boxes: jnp.ndarray,
    hw: tuple,
    pc_range: tuple,
    voxel_size: tuple,
    out_size_scale: int,
) -> jnp.ndarray:
    """Build the per-frame Gaussian mask, max-composed over boxes.

    Args:
      gt_boxes: [B, G, >=7] (x, y, z, w, l, h, rot, ...); zero rows = padding.
      hw: (H, W) of the response map (e.g. 180, 180).
      pc_range / voxel_size / out_size_scale: grid geometry.

    Returns:
      [B, H, W] float32 mask.
    """
    H, W = hw
    cell_x = voxel_size[0] * out_size_scale
    cell_y = voxel_size[1] * out_size_scale

    valid = jnp.abs(gt_boxes).sum(axis=-1) > 0  # [B, G]
    w = gt_boxes[..., 3] / cell_x
    h = gt_boxes[..., 4] / cell_y
    # ref passes bbox_size=(w, h) into gaussian_radius(height, width) — i.e.
    # "height"=w, "width"=h; the formula is symmetric so it doesn't matter.
    radius = jnp.floor(jnp.maximum(gaussian_radius(w, h), 0.0))  # [B, G]
    # int() center truncation, matching the reference's int() cast
    cx = jnp.trunc((gt_boxes[..., 0] - pc_range[0]) / cell_x)
    cy = jnp.trunc((gt_boxes[..., 1] - pc_range[1]) / cell_y)

    ys = jnp.arange(H, dtype=jnp.float32).reshape(1, 1, H, 1)
    xs = jnp.arange(W, dtype=jnp.float32).reshape(1, 1, 1, W)
    dx = xs - cx[..., None, None]  # [B, G, 1, W] -> broadcast [B, G, H, W]
    dy = ys - cy[..., None, None]

    diameter = 2.0 * radius + 1.0
    sigma = diameter / 6.0
    r = radius[..., None, None]
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma[..., None, None] ** 2 + 1e-12))
    inside = (jnp.abs(dx) <= r) & (jnp.abs(dy) <= r)
    g = jnp.where(inside & valid[..., None, None], g, 0.0)
    return jnp.max(g, axis=1).astype(jnp.float32)  # [B, H, W]
