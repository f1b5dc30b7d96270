"""Distill CLI end-to-end on synthetic data (VERDICT r1 item 7).

Runs the real `run_distill_cli` wiring — tiny exp configs, both-modality
loader, teacher checkpoint load via orbax AND torch .pth, Trainer.fit with
the jitted shard_map'd distill step over the 8-CPU mesh — for one epoch on
the synthetic mini-nuScenes. This is the only previously-untested L6→L2
path (ref …camera_exp_distill_lidar.py:388-524).
"""
import dataclasses
import os
import sys

import numpy as np
import pytest

import jax

from tests.test_data_pipeline import build_synth_nusc
from unidistill_tpu.configs import nuscenes as cfgs

pytestmark = pytest.mark.slow  # heavy e2e: excluded from the default fast suite


N_FRAMES = 8


@pytest.fixture(scope="module")
def synth_root8(tmp_path_factory):
    return str(build_synth_nusc(tmp_path_factory.mktemp("nusc8"), N_FRAMES))


def _tiny_exp(synth_root, with_lidar, with_camera, name):
    return cfgs.ExpConfig(
        exp_name=name,
        model=cfgs.tiny_model(with_lidar=with_lidar, with_camera=with_camera),
        data=cfgs.DataConfig(
            root_path=synth_root, num_lidar_sweeps=2, use_cbgs=False
        ),
        train=cfgs.TrainConfig(batch_size_per_device=1, max_epochs=1),
    )


def test_run_distill_cli_end_to_end(synth_root8, tmp_path, monkeypatch):
    from unidistill_tpu.exps.distill_cli import load_teacher, run_distill_cli
    from unidistill_tpu.training import checkpoint as ckpt_lib
    from unidistill_tpu.training.train_state import (
        create_train_state, make_optimizer,
    )

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        cfgs, "lidar_exp",
        lambda: _tiny_exp(synth_root8, True, False, "tiny_lidar"),
    )
    monkeypatch.setattr(
        cfgs, "camera_exp",
        lambda: _tiny_exp(synth_root8, False, True, "tiny_camera"),
    )
    monkeypatch.setattr(
        cfgs, "fusion_exp",
        lambda: _tiny_exp(synth_root8, True, True, "tiny_fusion"),
    )

    # --- build a teacher checkpoint the orbax way -------------------------
    from unidistill_tpu.data.collate import DataLoader
    from unidistill_tpu.data.dataset import NuScenesDataset

    both = cfgs.fusion_exp()
    ds = NuScenesDataset(both.data, both.model, "training", seed=0)
    dl = DataLoader(ds, 2, shuffle=False, drop_last=True, num_workers=0)
    sample = next(iter(dl))
    sample_dev = {
        k: v for k, v in sample.items() if k not in ("meta", "gt_boxes_raw")
    }
    t_cfg = cfgs.lidar_exp().model
    t_model, t_params, t_stats = load_teacher(t_cfg, None, sample_dev)
    tx = make_optimizer(1e-3, 1e-7, 0.1)
    t_state = create_train_state(
        {"params": t_params, "batch_stats": t_stats}, tx
    )
    ckpt_dir = str(tmp_path / "teacher_ckpt")
    ckpt_lib.save_checkpoint(ckpt_dir, t_state, step=0)

    # --- torch .pth teacher load path (shape-filtered merge) --------------
    import torch

    pth = str(tmp_path / "teacher.pth")
    sd = {
        "det_head.dense_head.auto_loss.params": torch.ones(12),
        # wrong-shaped tensor must be skipped, not crash
        "det_head.dense_head.shared_conv.0.weight": torch.zeros(64, 999, 3, 3),
    }
    torch.save({"model_state": sd}, pth)
    _, p2, _ = load_teacher(t_cfg, pth, sample_dev)
    np.testing.assert_allclose(np.asarray(p2["awl_params"]), np.ones(12))

    # --- full CLI run: lidar → camera distill, 1 epoch --------------------
    ckpt_step_dir = os.path.join(ckpt_dir, "step_0")
    monkeypatch.setattr(
        sys, "argv",
        ["distill_test", "-b", "1", "--max_epochs", "1",
         "--num_workers", "0", "--teacher_ckpt", ckpt_step_dir,
         "--exp_options", "train.eval_interval=1"],
    )
    trainer = run_distill_cli("lidar", "camera")
    try:
        # a checkpoint was written and metrics were logged
        out = trainer.output_dir
        assert os.path.isdir(os.path.join(out, "ckpt"))
        lines = open(os.path.join(out, "metrics.jsonl")).read().splitlines()
        assert any('"loss"' in ln for ln in lines), lines
        # per-epoch validation ran and logged a REAL val entry — not an
        # eval_error fallback (a latent predict() crash hid behind the old
        # broad except and made this assertion pass vacuously, r2)
        vals = [ln for ln in lines if '"event": "val"' in ln]
        assert vals, lines
        assert not any("eval_error" in ln for ln in vals), vals
    finally:
        trainer.close()


def test_predict_cli_dumps_submission_and_boxes(synth_root8, tmp_path,
                                                monkeypatch):
    """`-p`: writes nuscenes_results.json AND boxes.pkl (ref
    nuscenes_multimodal.py:395-415 dump_inference_results parity)."""
    import json
    import pickle

    from unidistill_tpu.exps.base_cli import run_cli

    monkeypatch.chdir(tmp_path)
    # the synthetic fixture ships train/val infos; -p reads the test split
    import shutil

    test_info = os.path.join(synth_root8, "test_info.pkl")
    if not os.path.exists(test_info):
        shutil.copy(os.path.join(synth_root8, "val_info.pkl"), test_info)
    exp = _tiny_exp(synth_root8, True, False, "tiny_lidar_p")
    monkeypatch.setattr(
        sys, "argv",
        ["exp.py", "-p", "-b", "1", "--num_workers", "0",
         "--data_root", synth_root8],
    )
    trainer = run_cli(exp)
    try:
        sub = os.path.join(trainer.output_dir, "nuscenes_submission")
        with open(os.path.join(sub, "nuscenes_results.json")) as f:
            res = json.load(f)
        assert "results" in res and "meta" in res
        with open(os.path.join(sub, "boxes.pkl"), "rb") as f:
            preds = pickle.load(f)
        assert len(preds) == N_FRAMES
        assert all("scores" in p and "boxes" in p for p in preds)
    finally:
        trainer.close()
