"""Bilinear grid sampling with `torch.nn.functional.grid_sample` default
semantics (mode='bilinear', padding_mode='zeros', align_corners=False).

The reference's distillation losses sample 9 points per GT box from BEV feature
maps via torch grid_sample (ref …camera_exp_distill_lidar.py:227-233,277-280).
Distill-loss parity therefore requires matching torch's unnormalization and
zero-padding rules exactly (SURVEY.md §7 hard part #4). Pure-jnp gathers — XLA
fuses these fine; no Pallas needed at 9 samples/box.
"""
from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(feat: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Sample `feat` at normalized grid locations.

    Args:
      feat: [N, H, W, C] feature map (NHWC — TPU-native layout; note torch is NCHW).
      grid: [N, Ho, Wo, 2] normalized coords in [-1, 1]; grid[..., 0] is x
        (width axis), grid[..., 1] is y (height axis) — torch convention.

    Returns:
      [N, Ho, Wo, C] sampled features; out-of-range taps contribute zero
      (padding_mode='zeros').
    """
    N, H, W, C = feat.shape
    x = grid[..., 0]
    y = grid[..., 1]
    # align_corners=False unnormalization: pix = ((coord + 1) * size - 1) / 2
    ix = ((x + 1.0) * W - 1.0) * 0.5
    iy = ((y + 1.0) * H - 1.0) * 0.5

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    ix1 = ix0 + 1.0
    iy1 = iy0 + 1.0

    wx1 = ix - ix0
    wx0 = 1.0 - wx1
    wy1 = iy - iy0
    wy0 = 1.0 - wy1

    def tap(iyf, ixf, wy, wx):
        valid = (ixf >= 0) & (ixf <= W - 1) & (iyf >= 0) & (iyf <= H - 1)
        xi = jnp.clip(ixf, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(iyf, 0, H - 1).astype(jnp.int32)
        # gather per batch element
        batch_idx = jnp.arange(N).reshape(N, 1, 1)
        vals = feat[batch_idx, yi, xi]  # [N, Ho, Wo, C]
        w = (wy * wx * valid.astype(feat.dtype))[..., None]
        return vals * w

    out = (
        tap(iy0, ix0, wy0, wx0)
        + tap(iy0, ix1, wy0, wx1)
        + tap(iy1, ix0, wy1, wx0)
        + tap(iy1, ix1, wy1, wx1)
    )
    return out
