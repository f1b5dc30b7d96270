"""Distillation experiment CLI.

ref the 4 distill exp files (…BEVFusion_nuscenes_centerhead_camera_exp_distill_lidar.py:388-524
et al.): teacher built from the parent exp config, loaded from a checkpoint
with shape-mismatch filtering, frozen in eval mode; student trains with
det + feature/relation/response distill losses (weights per teacher/student
pair, SURVEY.md §2.3).

Extra flag vs the single-modality CLI: --teacher_ckpt (the reference hard-codes
`tmp/{lidar,camera,fusion}_model.pth`; we accept an orbax dir or torch .pth).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import numpy as np

from unidistill_tpu.configs import nuscenes as cfgs
from unidistill_tpu.data.collate import DataLoader
from unidistill_tpu.data.dataset import NuScenesDataset
from unidistill_tpu.exps.base_cli import build_parser, parse_exp_options
from unidistill_tpu.models.bevfusion import BEVFusionCenterHead
from unidistill_tpu.training import checkpoint as ckpt_lib
from unidistill_tpu.training.loop import Trainer
from unidistill_tpu.training.steps import model_inputs


def _teacher_cfg(teacher: str) -> cfgs.ModelConfig:
    if teacher == "lidar":
        return cfgs.lidar_exp().model
    if teacher == "camera":
        return cfgs.camera_exp().model
    return cfgs.fusion_exp().model


def load_teacher(teacher_cfg: cfgs.ModelConfig, ckpt_path: Optional[str],
                 sample_batch, seed: int = 0):
    """Init teacher and overlay checkpoint weights with shape filtering
    (ref …distill_lidar.py:403-416)."""
    model = BEVFusionCenterHead(teacher_cfg)
    kw = model_inputs(
        jax.tree.map(lambda x: x[:1], sample_batch), teacher_cfg, training=False
    )
    variables = model.init(jax.random.PRNGKey(seed), **kw, train=True)
    params, stats = variables["params"], variables.get("batch_stats", {})
    if ckpt_path:
        if ckpt_path.endswith((".pth", ".pt")):
            from unidistill_tpu.training.torch_import import load_torch_checkpoint

            loaded_p, loaded_s = load_torch_checkpoint(ckpt_path, teacher_cfg)
        else:
            restored = ckpt_lib.restore_checkpoint_any(ckpt_path)
            loaded_p = restored.get("params", {})
            loaded_s = restored.get("batch_stats", {})
        params, used, skipped = ckpt_lib.shape_filtered_merge(params, loaded_p)
        stats, _, _ = ckpt_lib.shape_filtered_merge(stats, loaded_s)
        print(f"teacher load: {used} tensors used, {skipped} kept from init")
    return model, params, stats


def run_distill_cli(teacher: str, student: str):
    p = build_parser()
    p.add_argument("--teacher_ckpt", type=str, default=None)
    args = p.parse_args()

    exp_cfg = cfgs.distill_exp(teacher, student)
    overrides = parse_exp_options(args.exp_options)
    if args.batch_size_per_device:
        overrides["train.batch_size_per_device"] = args.batch_size_per_device
    if args.max_epochs:
        overrides["train.max_epochs"] = args.max_epochs
    if args.data_root:
        overrides["data.root_path"] = args.data_root
    exp_cfg = cfgs.apply_overrides(exp_cfg, overrides)
    np.random.seed(args.seed)

    trainer = Trainer(exp_cfg)
    global_batch = exp_cfg.train.batch_size_per_device * trainer.n_dev
    # the batch must carry BOTH modalities (student + teacher inputs)
    both_cfg = dataclasses.replace(
        cfgs.fusion_exp().model, with_lidar=True, with_camera=True
    )
    ds = NuScenesDataset(exp_cfg.data, both_cfg, "training", seed=args.seed)
    dl = DataLoader(ds, global_batch, shuffle=True, drop_last=True,
                    num_workers=args.num_workers, seed=args.seed)

    t_cfg = _teacher_cfg(teacher)
    sample = next(iter(dl))
    sample_dev = {k: v for k, v in sample.items() if k not in ("meta", "gt_boxes_raw")}
    t_model, t_params, t_stats = load_teacher(
        t_cfg, args.teacher_ckpt, sample_dev, args.seed
    )
    dcfg = exp_cfg.distill
    val_ds = NuScenesDataset(exp_cfg.data, both_cfg, "validation", seed=args.seed)
    val_dl = DataLoader(val_ds, global_batch, shuffle=False, drop_last=False,
                        num_workers=args.num_workers, seed=args.seed)
    state = trainer.fit(
        dl, exp_cfg.train.max_epochs, resume_from=args.ckpt_path,
        teacher=(t_model, t_cfg, dcfg, t_params, t_stats),
        val_loader=val_dl, val_dataset=val_ds,
        eval_interval=exp_cfg.train.eval_interval,
    )
    ckpt_lib.save_checkpoint(os.path.join(trainer.output_dir, "ckpt"), state)
    return trainer
