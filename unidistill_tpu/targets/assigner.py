"""Vectorized FCOS/center target assigner.

ref layers/head/det3d/target_assigner/fcos_assigner.py:9-285 — there, a python
loop over (batch × 6 tasks) runs per training step on the host (SURVEY.md §3
hot loop #4). Here the whole assignment is fixed-shape device code inside the
jitted train step: one [G, ANC] distance matrix per task, `top_k` for the
9-nearest-anchor positives, an argmin for nearest-GT assignment, and scatters
for the heatmap/compacted target buffers.

Semantics matched to the reference:
  * anchors on the stride-8 grid, anchor n = (x=(n%W)·8, y=(n//W)·8) in voxel
    units (generate_anchor_grid, :46-56);
  * positives = union over GTs of the top-9 closest anchors (L2 to GT center);
  * each positive anchor regresses its NEAREST task-GT (:203-204);
  * encoding [dx/8, dy/8, z, log w, log l, log h, sin r, cos r, vx, vy] with
    rot wrapped to [-π, π) (:221-238);
  * heatmap = one-hot at positive anchors for the assigned GT's class;
  * non-finite encodings zeroed — replicating the isinf scrub the reference
    model applies right after assignment (…fusion_exp.py:157-158).

Output layout (fixed shapes; the reference compacts then pads to max_objs):
  per task: heatmap [B, H, W, ncls], ind [B, P], mask [B, P] bool,
  box_encoding [B, P, 10], with P = cfg.max_pos.
"""
from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from unidistill_tpu.configs.nuscenes import AssignerConfig, CLASS_TO_IDX


def limit_period(val, offset=0.5, period=2 * math.pi):
    return val - jnp.floor(val / period + offset) * period


def assign_targets(
    gt_boxes: jnp.ndarray,
    cfg: AssignerConfig,
    tasks: Tuple[Tuple[str, ...], ...],
    grid_size: Tuple[int, int, int],
    pc_range: Tuple[float, ...],
    voxel_size: Tuple[float, ...],
) -> List[Dict[str, jnp.ndarray]]:
    """gt_boxes: [B, G, 10] (x, y, z, w, l, h, rot, vx, vy, cls) with cls
    1-based and zero rows as padding. Returns a list of per-task target dicts."""
    B, G, _ = gt_boxes.shape
    W = grid_size[0] // cfg.out_size_factor
    H = grid_size[1] // cfg.out_size_factor
    ANC = H * W
    P = cfg.max_pos

    n = jnp.arange(ANC, dtype=jnp.int32)
    ax = (n % W).astype(jnp.float32) * cfg.out_size_factor  # voxel units
    ay = (n // W).astype(jnp.float32) * cfg.out_size_factor

    boxes = gt_boxes[..., :9]
    cls = gt_boxes[..., 9].astype(jnp.int32)
    valid = jnp.abs(gt_boxes).sum(-1) > 0  # [B, G]

    cx = (boxes[..., 0] - pc_range[0]) / voxel_size[0]
    cy = (boxes[..., 1] - pc_range[1]) / voxel_size[1]
    rot = limit_period(boxes[..., 6])

    # [B, G, ANC] squared distances (fp32): G=128, ANC=32400 → 16.6M floats/frame
    d2 = (ax[None, None, :] - cx[..., None]) ** 2 + (
        ay[None, None, :] - cy[..., None]
    ) ** 2

    out = []
    for task_classes in tasks:
        ids = jnp.asarray([CLASS_TO_IDX[c] for c in task_classes], jnp.int32)
        local = (cls[..., None] == ids[None, None, :])  # [B, G, ncls]
        is_task = local.any(-1) & valid  # [B, G]
        local_cls = jnp.argmax(local, axis=-1).astype(jnp.int32)  # [B, G]

        # top-9 nearest anchors per task GT → positive anchors.
        # EXACT window reduction: the 9 nearest stride-8 grid points to any
        # center lie inside the 4×4 window bracketing it (9th-best distance
        # ≤ √2.5 grid units < 2.0, the minimum to any point outside the
        # bracketing window — strict, so no cross-boundary ties), and the
        # stable sort over ascending anchor ids reproduces lax.top_k's
        # lowest-index tie order. Replaces a top_k over [B, G, 32400]
        # (~34 ms/step on v5e) with a sort over [B, G, 16].
        osf = float(cfg.out_size_factor)
        gx0 = jnp.clip(jnp.floor(cx / osf - 1.0).astype(jnp.int32), 0, W - 4)
        gy0 = jnp.clip(jnp.floor(cy / osf - 1.0).astype(jnp.int32), 0, H - 4)
        r4 = jnp.arange(4, dtype=jnp.int32)
        wy = gy0[..., None, None] + r4[None, None, :, None]  # [B, G, 4, 1]
        wx = gx0[..., None, None] + r4[None, None, None, :]  # [B, G, 1, 4]
        aid = (wy * W + wx).reshape(B, G, 16)  # ascending anchor ids
        d2w = (
            (wx.astype(jnp.float32) * osf - cx[..., None, None]) ** 2
            + (wy.astype(jnp.float32) * osf - cy[..., None, None]) ** 2
        ).reshape(B, G, 16)
        _, aid_sorted = jax.lax.sort((d2w, aid), dimension=2, num_keys=1)
        topk_idx = aid_sorted[..., : cfg.topk]  # [B, G, topk]
        scat_ok = jnp.broadcast_to(is_task[..., None], topk_idx.shape)
        pos_mask = jnp.zeros((B, ANC), bool)
        pos_mask = pos_mask.at[
            jnp.arange(B)[:, None, None], jnp.where(scat_ok, topk_idx, 0)
        ].max(scat_ok)

        # nearest task-GT per anchor
        d2_task = jnp.where(is_task[:, :, None], d2, jnp.inf)  # [B, G, ANC]
        near_gt = jnp.argmin(d2_task, axis=1).astype(jnp.int32)  # [B, ANC]
        has_gt = is_task.any(axis=1)  # [B] guard: no task GT → no positives
        pos_mask &= has_gt[:, None]

        bidx = jnp.arange(B)[:, None]
        g = near_gt  # [B, ANC]
        a_cat = local_cls[bidx, g]  # [B, ANC]
        # heatmap: one-hot at positive anchors
        hm = jax.nn.one_hot(a_cat, len(task_classes), dtype=jnp.float32)
        hm = hm * pos_mask[..., None]
        heatmap = hm.reshape(B, H, W, len(task_classes))

        # per-anchor encodings for the assigned GT
        gb = boxes[bidx, g]  # [B, ANC, 9]
        enc = jnp.stack(
            [
                (cx[bidx, g] - ax[None, :]) / cfg.out_size_factor,
                (cy[bidx, g] - ay[None, :]) / cfg.out_size_factor,
                gb[..., 2],
                jnp.log(gb[..., 3]),
                jnp.log(gb[..., 4]),
                jnp.log(gb[..., 5]),
                jnp.sin(limit_period(gb[..., 6])),
                jnp.cos(limit_period(gb[..., 6])),
                gb[..., 7],
                gb[..., 8],
            ],
            axis=-1,
        )  # [B, ANC, 10]
        enc = jnp.where(jnp.isfinite(enc), enc, 0.0)  # isinf scrub parity

        # compact positives into [B, P]
        rank = jnp.cumsum(pos_mask, axis=1) - 1  # [B, ANC]
        slot = jnp.where(pos_mask & (rank < P), rank, P)
        ind = jnp.zeros((B, P + 1), jnp.int32).at[bidx, slot].set(
            jnp.broadcast_to(n[None, :], (B, ANC)), mode="drop"
        )[:, :P]
        mask = jnp.zeros((B, P + 1), bool).at[bidx, slot].set(
            pos_mask, mode="drop"
        )[:, :P]
        box_encoding = jnp.zeros((B, P + 1, 10), jnp.float32).at[bidx, slot].set(
            enc, mode="drop"
        )[:, :P]
        cat = jnp.zeros((B, P + 1), jnp.int32).at[bidx, slot].set(
            a_cat, mode="drop"
        )[:, :P]

        out.append(
            dict(heatmap=heatmap, ind=ind, mask=mask, box_encoding=box_encoding,
                 cat=cat)
        )
    return out
