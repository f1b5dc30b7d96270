"""Jitted train / eval / distill steps.

The reference splits each step across PyTorch Lightning hooks, host-side numpy
loops, CUDA kernels and NCCL calls (SURVEY.md §3.1-3.2). Here each step is ONE
jitted function — voxelization, the model, target assignment, all losses and
their cross-replica normalizers (`lax.pmean` over the `dp` mesh axis), the
backward pass and the optimizer — so XLA schedules the whole graph and the
only host↔device traffic is the input batch and the scalar metrics.

Batch layout (all fixed shapes, produced by data/collate.py):
  points      [B, P, 5] float32 + points_mask [B, P] bool     (lidar exps)
  imgs        [B, N_cam, H, W, 3] float32 (normalized)        (camera exps)
  mats        {sensor2ego_mats, intrin_mats, ida_mats [B, N_cam, 4, 4],
               bda_mat [B, 4, 4]}
  gt_boxes    [B, G, 10] (x, y, z, w, l, h, rot, vx, vy, cls 1-based; zero rows pad)
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from unidistill_tpu.configs.nuscenes import DistillConfig, ModelConfig
from unidistill_tpu.decode.proposals import generate_proposals
from unidistill_tpu.losses.det import center_head_loss
from unidistill_tpu.losses.distill import (
    bev_distill_loss,
    feature_distill_loss,
    gt_corners_bev,
    response_distill_loss,
)
from unidistill_tpu.ops.voxelize import voxelize_batched
from unidistill_tpu.targets.assigner import assign_targets
from unidistill_tpu.training.train_state import TrainState


def voxelize_batch(batch: Dict[str, jnp.ndarray], cfg: ModelConfig, training: bool):
    """Device-side voxelization + mean VFE over the padded point batch
    (flat-global batched path; identical to vmapped `voxelize`, ~15% faster
    — PROFILE.md)."""
    caps = cfg.caps
    max_v = caps.max_voxels_train if training else caps.max_voxels_eval
    return voxelize_batched(
        batch["points"], batch["points_mask"], cfg.point_cloud_range,
        cfg.voxel_size, cfg.grid_size, max_voxels=max_v,
        max_points_per_voxel=caps.max_points_per_voxel,
    )


def model_inputs(batch, cfg: ModelConfig, training: bool) -> Dict[str, Any]:
    kw: Dict[str, Any] = {}
    if cfg.with_lidar:
        if "voxel_feats" in batch:
            # loader-side voxelization (data/voxelize_host.py) — overlapped
            # with device compute in the worker pool
            kw.update(
                voxel_feats=batch["voxel_feats"],
                voxel_coords=batch["voxel_coords"],
            )
        else:
            vf, vc = voxelize_batch(batch, cfg, training)
            kw.update(voxel_feats=vf, voxel_coords=vc)
        topo = {
            k[len("topo_"):]: v for k, v in batch.items()
            if k.startswith("topo_")
        }
        if topo:
            # loader-side sparse-topology tables (data/topology_host.py)
            kw.update(lidar_topo=topo)
    if cfg.with_camera:
        kw.update(imgs=batch["imgs"], mats=batch["mats"])
    return kw


def forward(model, params, batch_stats, batch, cfg: ModelConfig, train: bool):
    kw = model_inputs(batch, cfg, training=train)
    if train:
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            **kw, train=True, mutable=["batch_stats"],
        )
        return out, mutated["batch_stats"]
    out = model.apply(
        {"params": params, "batch_stats": batch_stats}, **kw, train=False
    )
    return out, batch_stats


def detector_loss(out, batch, cfg: ModelConfig, axis_name: Optional[str]):
    targets = assign_targets(
        batch["gt_boxes"], cfg.assigner, cfg.tasks, cfg.grid_size,
        cfg.point_cloud_range, cfg.voxel_size,
    )
    loss, metrics, preds_sig = center_head_loss(
        out["multi_head_features"], targets, out["awl_params"],
        cfg.det_head.code_weights, cfg.det_head.iou_weight, cfg.out_size_factor,
        cfg.voxel_size[:2], cfg.det_head.focal_alpha, cfg.det_head.focal_gamma,
        axis_name=axis_name,
    )
    return loss, metrics, preds_sig


def train_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    model,
    tx,
    cfg: ModelConfig,
    axis_name: Optional[str] = None,
    forward_fn=None,
):
    """Single-modality (or fusion) detector step (ref …base_exp.py:360-376).

    forward_fn(params, batch_stats) -> (out, new_stats): override of the
    standard forward — used by parallel/spatial.py to route the model
    through GSPMD sharding constraints without duplicating the
    grad/optimizer/state tail."""

    def loss_fn(params):
        if forward_fn is None:
            out, new_stats = forward(
                model, params, state.batch_stats, batch, cfg, True
            )
        else:
            out, new_stats = forward_fn(params, state.batch_stats)
        loss, metrics, _ = detector_loss(out, batch, cfg, axis_name)
        return loss, (metrics, new_stats)

    (loss, (metrics, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    if axis_name:
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    metrics["loss"] = loss
    return (
        TrainState(state.step + 1, new_params, new_stats, new_opt),
        metrics,
    )


def distill_train_step(
    state: TrainState,
    teacher_params,
    teacher_stats,
    batch: Dict[str, jnp.ndarray],
    student_model,
    teacher_model,
    tx,
    student_cfg: ModelConfig,
    teacher_cfg: ModelConfig,
    dcfg: DistillConfig,
    axis_name: Optional[str] = None,
    student_forward_fn=None,
    teacher_forward_fn=None,
):
    """Teacher→student distillation step (ref …camera_exp_distill_lidar.py:438-513).

    total = det + w_feat·feature + w_rel·bev_rel + w_resp·(resp_cls + resp_reg).
    Teacher runs frozen in eval mode inside the same jit.

    student_forward_fn(params, batch_stats) / teacher_forward_fn(): forward
    overrides used by parallel/spatial.py to add GSPMD sharding constraints
    (same contract as train_step's forward_fn).
    """
    gt = batch["gt_boxes"]
    gt_mask = jnp.abs(gt).sum(-1) > 0  # [B, G]
    corners = gt_corners_bev(
        gt, student_cfg.point_cloud_range, student_cfg.voxel_size,
        student_cfg.out_size_factor,
    )

    if teacher_forward_fn is None:
        t_out, _ = forward(
            teacher_model, teacher_params, teacher_stats, batch, teacher_cfg,
            False,
        )
    else:
        t_out, _ = teacher_forward_fn(teacher_params, teacher_stats)
    t_out = jax.lax.stop_gradient(t_out)

    def loss_fn(params):
        if student_forward_fn is None:
            out, new_stats = forward(
                student_model, params, state.batch_stats, batch, student_cfg,
                True,
            )
        else:
            out, new_stats = student_forward_fn(params, state.batch_stats)
        det_loss, metrics, preds_sig = detector_loss(
            out, batch, student_cfg, axis_name
        )
        l_feat = feature_distill_loss(
            out["model_output"], t_out["model_output"], corners, gt_mask, axis_name
        )
        l_rel = bev_distill_loss(
            out["bev_feature"], t_out["bev_feature"], corners, gt_mask, axis_name
        )
        l_cls, l_reg = response_distill_loss(
            preds_sig, t_out["multi_head_features"], gt,
            student_cfg.point_cloud_range, student_cfg.voxel_size,
            student_cfg.out_size_factor, dcfg.teacher_hm_temp,
            dcfg.teacher_hm_clamp, axis_name,
        )
        total = (
            det_loss
            + dcfg.w_feature * l_feat
            + dcfg.w_rel * l_rel
            + dcfg.w_resp * (l_cls + l_reg)
        )
        metrics.update(
            loss_feature=l_feat, loss_bev_rel=l_rel,
            loss_resp_cls=l_cls, loss_resp_reg=l_reg, loss_det=det_loss,
        )
        return total, (metrics, new_stats)

    (loss, (metrics, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    if axis_name:
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
    metrics["loss"] = loss
    return (
        TrainState(state.step + 1, new_params, new_stats, new_opt),
        metrics,
    )


def eval_step(
    state: TrainState,
    batch: Dict[str, jnp.ndarray],
    model,
    cfg: ModelConfig,
):
    """Eval forward + decode (ref …base_exp.py:419-434 → proposals).
    Returns fixed-size ROI dict; labels are 1-based (caller subtracts 1,
    mirroring …base_exp.py:430)."""
    out, _ = forward(model, state.params, state.batch_stats, batch, cfg, False)
    return generate_proposals(
        out["multi_head_features"], cfg.proposal, cfg.tasks,
        cfg.point_cloud_range[:2], cfg.voxel_size[:2], cfg.out_size_factor,
        training=False,
    )
