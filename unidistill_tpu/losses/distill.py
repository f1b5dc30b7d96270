"""UniDistill's three cross-modality distillation losses, pure JAX.

ref BEVFusion_nuscenes_centerhead_camera_exp_distill_lidar.py:196-385 (and the
3 sibling exps). All three are fixed-shape and jit-fused into the train step —
the reference's per-step numpy corner/Gaussian loops (:100-128, :466-483)
become device code (ops/gaussian.py, gt_corners_bev below).

1. FeatureDistillLoss — L1 between 9 sampled points (4 corners + center +
   4 edge midpoints) per GT box on the low-level BEV features (256 ch).
2. BEVDistillLoss — L1 between the 9×9 Gram ("relation") matrices of
   L2-normalized point features on the high-level BEV map (512 ch).
3. ResponseDistillLoss — L1 on concatenated head responses (66 reg ch +
   max-over-class heatmap) under the GT-centered Gaussian mask.

Replicated asymmetry (SURVEY.md §2.3): the student heatmap arrives ALREADY
sigmoid-clamped (the head loss's in-place sigmoid side effect), while the
teacher heatmap is `clamp(sigmoid(hm / temp))` applied here. Sampling
replicates the reference's grid_sample call including its (x, y) swap — both
maps get identical treatment so the swap is loss-neutral but kept for parity.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from unidistill_tpu.losses.det import pmean
from unidistill_tpu.ops.gaussian import box_mask_gaussian
from unidistill_tpu.ops.grid_sample import grid_sample_2d


def gt_corners_bev(
    gt_boxes: jnp.ndarray,
    pc_range: Tuple[float, ...],
    voxel_size: Tuple[float, ...],
    out_size_factor: int,
) -> jnp.ndarray:
    """GT boxes → BEV corner coords in feature cells (ref :25-97, :466-483).

    gt_boxes: [B, G, >=7]. Returns [B, G, 4, 2] corners ordered
    (x0y0, x0y1, x1y1, x1y0) rotated by heading, in stride-8 cell units.
    """
    c, s = jnp.cos(gt_boxes[..., 6]), jnp.sin(gt_boxes[..., 6])
    # corner offsets (±w/2, ±l/2) in reference corner order
    off = jnp.asarray(
        [[-0.5, -0.5], [-0.5, 0.5], [0.5, 0.5], [0.5, -0.5]], jnp.float32
    )
    dims = gt_boxes[..., 3:5]  # (w, l)
    local = off[None, None] * dims[..., None, :]  # [B, G, 4, 2]
    x = local[..., 0] * c[..., None] - local[..., 1] * s[..., None]
    y = local[..., 0] * s[..., None] + local[..., 1] * c[..., None]
    cx = gt_boxes[..., 0:1] + x
    cy = gt_boxes[..., 1:2] + y
    cx = (cx - pc_range[0]) / (voxel_size[0] * out_size_factor)
    cy = (cy - pc_range[1]) / (voxel_size[1] * out_size_factor)
    return jnp.stack([cx, cy], axis=-1)


def _nine_point_samples(feat_hwc: jnp.ndarray, corners: jnp.ndarray) -> jnp.ndarray:
    """Sample 9 points per box (corners + center + edge midpoints) from an
    NHWC feature map; returns [B, G, 9, C] (ref :200-234)."""
    center = corners.mean(axis=2, keepdims=True)
    e1 = corners[:, :, (0, 1)].mean(axis=2, keepdims=True)
    e2 = corners[:, :, (1, 2)].mean(axis=2, keepdims=True)
    e3 = corners[:, :, (2, 3)].mean(axis=2, keepdims=True)
    e4 = corners[:, :, (0, 3)].mean(axis=2, keepdims=True)
    pts = jnp.concatenate([corners, center, e1, e2, e3, e4], axis=2)  # [B, G, 9, 2]
    H, W = feat_hwc.shape[1:3]
    gx = (pts[..., 0] - W / 2.0) / (W / 2.0)
    gy = (pts[..., 1] - H / 2.0) / (H / 2.0)
    # reference swaps (x, y) before grid_sample (:226) — kept verbatim
    grid = jnp.stack([gy, gx], axis=-1)
    return grid_sample_2d(feat_hwc, grid)  # [B, G, 9, C]


def feature_distill_loss(
    feat_student: jnp.ndarray,
    feat_teacher: jnp.ndarray,
    corners: jnp.ndarray,
    gt_mask: jnp.ndarray,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Low-level feature alignment (ref :196-245). feats NHWC; gt_mask [B, G]."""
    s = _nine_point_samples(feat_student, corners)
    t = _nine_point_samples(feat_teacher, corners)
    l1 = jnp.abs(s - t).mean(axis=-1).mean(axis=-1)  # [B, G]
    m = gt_mask.astype(jnp.float32)
    weight = pmean(m.sum(), axis_name)
    return (l1 * m).sum() / (weight + 1e-4)


def bev_distill_loss(
    bev_student: jnp.ndarray,
    bev_teacher: jnp.ndarray,
    corners: jnp.ndarray,
    gt_mask: jnp.ndarray,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """High-level 9×9 relation (Gram) alignment (ref :248-323)."""

    def gram(feat):
        x = _nine_point_samples(feat, corners)  # [B, G, 9, C]
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-4)
        return jnp.einsum("bgic,bgjc->bgij", x, x)

    gs, gt_ = gram(bev_student), gram(bev_teacher)
    l1 = jnp.abs(gs - gt_).mean(axis=-1).mean(axis=-1)  # [B, G]
    m = gt_mask.astype(jnp.float32)
    weight = pmean(m.sum(), axis_name)
    return (l1 * m).sum() / (weight + 1e-4)


def response_distill_loss(
    resp_student: List[Dict[str, jnp.ndarray]],
    resp_teacher: List[Dict[str, jnp.ndarray]],
    gt_boxes: jnp.ndarray,
    pc_range: Tuple[float, ...],
    voxel_size: Tuple[float, ...],
    out_size_factor: int,
    teacher_hm_temp: float = 2.0,
    teacher_hm_clamp: float = 1e-4,
    axis_name: Optional[str] = None,
):
    """Gaussian-masked response alignment (ref :326-385).

    resp_student: per-task dicts with 'hm' ALREADY sigmoid-clamped (head-loss
    side effect); resp_teacher: raw logits. NHWC maps. Returns (cls, reg) pair.
    """
    def cat_reg(resp):
        return jnp.concatenate(
            [
                jnp.concatenate(
                    [r["reg"], r["height"], r["dim"], r["rot"], r["vel"], r["iou"]],
                    axis=-1,
                )
                for r in resp
            ],
            axis=-1,
        )  # [B, H, W, 66]

    cls_s = jnp.concatenate([r["hm"] for r in resp_student], axis=-1)
    cls_t = jnp.concatenate(
        [
            jnp.clip(
                jnp.asarray(
                    1.0 / (1.0 + jnp.exp(-r["hm"] / teacher_hm_temp))
                ),
                teacher_hm_clamp,
                1.0 - teacher_hm_clamp,
            )
            for r in resp_teacher
        ],
        axis=-1,
    )
    reg_s, reg_t = cat_reg(resp_student), cat_reg(resp_teacher)
    cls_max_s = cls_s.max(axis=-1)
    cls_max_t = cls_t.max(axis=-1)

    H, W = reg_s.shape[1:3]
    mask = box_mask_gaussian(
        gt_boxes, (H, W), pc_range, voxel_size, out_size_factor
    )  # [B, H, W]

    diff_reg = jnp.abs(reg_s - reg_t).mean(axis=-1) * mask
    diff_cls = jnp.abs(cls_max_s - cls_max_t) * mask
    weight = pmean(mask.sum(), axis_name)
    return diff_cls.sum() / (weight + 1e-4), diff_reg.sum() / (weight + 1e-4)
