"""Box decoding + IoU-aware rotated NMS → fixed-size ROIs.

ref layers/head/det3d/generate_proposals/{centerpoint_gen_proposals.py:8-340,
iou_aware_gen_proposals.py:6-247}. The reference runs a python loop per
(task, batch) with dynamic-shaped masking and a CUDA NMS; here everything is
fixed-shape: invalid candidates carry -inf NMS scores instead of being
filtered out, and outputs are [B, num_tasks*post_max] padded buffers with a
validity mask (the reference likewise pads its `rois` to
post_max·num_tasks, :300-325).

Decode semantics matched: global top-K over (class, y, x) per task (the
reference's two-stage per-class top-K selects the identical set), sub-cell reg
offsets, exp-clamped dims, atan2 rotation, post-center-range + score-threshold
masks, NMS score = score^(1-α)·iou_norm^α (iou_aware_gen_proposals.py:62-66).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from unidistill_tpu.configs.nuscenes import ProposalConfig
from unidistill_tpu.ops.nms import nms_bev_batched


def decode_task(
    pred: Dict[str, jnp.ndarray],
    cfg: ProposalConfig,
    task_id: int,
    pc_range: Tuple[float, float],
    voxel_size: Tuple[float, float],
    out_size_factor: int,
    training: bool,
):
    """One task's candidates. pred maps head name → [B, H, W, C] (hm = raw logits).

    Returns boxes [B, K, 9], scores [B, K], nms_scores [B, K], labels [B, K],
    valid [B, K] — already sorted by nms_score descending."""
    K = cfg.nms_pre_max_size_train if training else cfg.nms_pre_max_size_test
    hm = jax.nn.sigmoid(pred["hm"])  # [B, H, W, ncls]
    B, H, W, ncls = hm.shape
    K = min(K, ncls * H * W)
    flat = hm.transpose(0, 3, 1, 2).reshape(B, ncls * H * W)
    scores, inds = jax.lax.top_k(flat, K)  # [B, K]
    clses = (inds // (H * W)).astype(jnp.int32)
    pos = (inds % (H * W)).astype(jnp.int32)
    ys = (pos // W).astype(jnp.float32)
    xs = (pos % W).astype(jnp.float32)

    def gat(name):
        return jnp.take_along_axis(
            pred[name].reshape(B, H * W, -1), pos[..., None], axis=1
        )

    reg = gat("reg")
    xs = xs + reg[..., 0]
    ys = ys + reg[..., 1]
    rot = jnp.arctan2(gat("rot")[..., 0], gat("rot")[..., 1])
    hei = gat("height")[..., 0]
    dim = jnp.clip(jnp.exp(gat("dim")), 0.001, 30.0)  # [B, K, 3]
    vel = gat("vel")  # [B, K, 2]
    iouscore = jnp.clip(gat("iou")[..., 0] / 2.0 + 0.5, 0.0, 1.0)

    alpha = cfg.iou_aware_alpha[task_id]
    nms_scores = jnp.power(scores, 1.0 - alpha) * jnp.power(iouscore, alpha)

    xs = xs * out_size_factor * voxel_size[0] + pc_range[0]
    ys = ys * out_size_factor * voxel_size[1] + pc_range[1]
    boxes = jnp.concatenate(
        [xs[..., None], ys[..., None], hei[..., None], dim, rot[..., None], vel],
        axis=-1,
    )  # [B, K, 9]

    pcl = jnp.asarray(cfg.post_center_limit_range)
    in_range = jnp.all(boxes[..., :3] >= pcl[:3], -1) & jnp.all(
        boxes[..., :3] <= pcl[3:], -1
    )
    valid = in_range & (scores > cfg.score_threshold)

    # push invalid to the bottom of the NMS order
    order = jnp.argsort(jnp.where(valid, -nms_scores, jnp.inf), axis=-1)
    take = lambda a: jnp.take_along_axis(
        a, order.reshape(order.shape + (1,) * (a.ndim - 2)), axis=1
    )
    return (
        take(boxes),
        jnp.take_along_axis(scores, order, 1),
        jnp.take_along_axis(nms_scores, order, 1),
        jnp.take_along_axis(clses, order, 1),
        jnp.take_along_axis(valid, order, 1),
    )


def generate_proposals(
    preds: List[Dict[str, jnp.ndarray]],
    cfg: ProposalConfig,
    tasks: Tuple[Tuple[str, ...], ...],
    pc_range: Tuple[float, float],
    voxel_size: Tuple[float, float],
    out_size_factor: int,
    training: bool = False,
):
    """All tasks → merged fixed-size ROI buffers.

    Returns dict: boxes [B, R, 9], scores [B, R], labels [B, R] (global,
    1-based), mask [B, R]; R = num_tasks * post_max."""
    thr = cfg.nms_iou_threshold_train if training else cfg.nms_iou_threshold_test
    post = cfg.nms_post_max_size_train if training else cfg.nms_post_max_size_test

    # Decode every task, then run ONE batched NMS over all (task, sample)
    # lanes: a single suppression loop over [T·B] lanes instead of T
    # sequential vmapped loops — the serial greedy iterations amortize
    # across tasks, and the Pallas IoU kernel sees one big grid.
    dec = [
        decode_task(
            preds[tid], cfg, tid, pc_range, voxel_size, out_size_factor, training
        )
        for tid in range(len(tasks))
    ]
    # per-task K can differ on tiny grids (K clamps to ncls·H·W); pad each
    # task to the common max with invalid rows before stacking into lanes.
    Kmax = max(d[0].shape[1] for d in dec)
    pad = lambda a, t: jnp.pad(
        a, ((0, 0), (0, Kmax - a.shape[1])) + ((0, 0),) * (a.ndim - 2),
        constant_values=t,
    )
    boxes = jnp.stack([pad(d[0], 0.0) for d in dec])  # [T, B, K, 9]
    scores = jnp.stack([pad(d[1], 0.0) for d in dec])
    clses = jnp.stack([pad(d[3], 0) for d in dec])
    valid = jnp.stack([pad(d[4], False) for d in dec])
    T, B, K = boxes.shape[:3]
    lanes = lambda a: a.reshape((T * B,) + a.shape[2:])
    boxes7 = lanes(boxes[..., :7])
    keep_idx, keep_mask = nms_bev_batched(
        boxes7, lanes(valid), thr, post, cap=cfg.nms_cap
    )  # [T*B, post]
    cap = min(cfg.nms_cap, K)
    gidx = jnp.minimum(keep_idx, cap - 1)
    kb = jnp.take_along_axis(lanes(boxes)[:, :cap], gidx[..., None], axis=1)
    ks = jnp.take_along_axis(lanes(scores)[:, :cap], gidx, axis=1)
    kc = jnp.take_along_axis(lanes(clses)[:, :cap], gidx, axis=1)

    # per-task global label offsets (labels start from 1, ref :209)
    offsets = jnp.asarray(
        [1 + sum(len(t) for t in tasks[:tid]) for tid in range(len(tasks))],
        dtype=kc.dtype,
    )
    kl = kc + offsets.repeat(B)[:, None]

    unlane = lambda a: a.reshape((T, B) + a.shape[1:])
    kb, ks, kl, keep_mask = map(unlane, (kb, ks, kl, keep_mask))
    # [T, B, post] -> [B, T*post] (task-major concat, matching the ref merge)
    merge = lambda a: jnp.concatenate([a[t] for t in range(T)], axis=1)
    return dict(
        boxes=merge(jnp.where(keep_mask[..., None], kb, 0.0)),
        scores=merge(jnp.where(keep_mask, ks, 0.0)),
        labels=merge(jnp.where(keep_mask, kl, 0)),
        mask=merge(keep_mask),
    )
