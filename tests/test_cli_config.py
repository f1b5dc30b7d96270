"""Direct tests for the CLI-surface helpers: DictAction-style option
parsing (ref unidistill/utils/__init__.py:4-93), nested frozen-dataclass
overrides, the per-exp remat policies, and the experiment output-dir
layout (ref exps/base_exp.py:142-167). Host-only — no device compiles."""
import dataclasses
import os

import pytest

from unidistill_tpu.configs.nuscenes import (
    apply_overrides,
    camera_exp,
    fusion_exp,
    lidar_exp,
)
from unidistill_tpu.exps.base_cli import parse_exp_options
from unidistill_tpu.training.loop import exp_output_dir


def test_parse_exp_options_literal_eval_semantics():
    out = parse_exp_options([
        "train.lr=0.0002",
        "model.det_head.iou_weight=2",
        "data.use_cbgs=False",
        "model.grid_size=(720,720,1)",
        "data.root_path=/some/path",  # not a literal -> stays a string
    ])
    assert out["train.lr"] == 2e-4 and isinstance(out["train.lr"], float)
    assert out["model.det_head.iou_weight"] == 2
    assert out["data.use_cbgs"] is False
    assert out["model.grid_size"] == (720, 720, 1)
    assert out["data.root_path"] == "/some/path"
    assert parse_exp_options(None) == {}


def test_apply_overrides_nested_and_type_coercion():
    cfg = lidar_exp()
    cfg2 = apply_overrides(cfg, {
        "model.det_head.iou_weight": 2,        # int -> float field
        "model.grid_size": [720, 720, 1],      # list -> tuple field
        "data.use_cbgs": "true",               # string -> bool field
        "train.max_epochs": 7,
    })
    assert cfg2.model.det_head.iou_weight == 2.0
    assert isinstance(cfg2.model.det_head.iou_weight, float)
    assert cfg2.model.grid_size == (720, 720, 1)
    assert cfg2.data.use_cbgs is True
    assert cfg2.train.max_epochs == 7
    # functional: the original is untouched (frozen dataclasses)
    assert cfg.model.det_head.iou_weight == 5.0
    # untouched siblings survive the nested replace
    assert cfg2.model.det_head.loc_weight == cfg.model.det_head.loc_weight


def test_apply_overrides_unknown_key_raises():
    with pytest.raises((TypeError, AttributeError)):
        apply_overrides(lidar_exp(), {"model.det_head.not_a_field": 1})


def test_per_exp_remat_policies():
    """Pins VERDICT r4 item 5: lidar-only affords the +res4 exemption
    (13.71 GiB temps, fits); fusion keeps the default for headroom."""
    assert lidar_exp().model.lidar_encoder.no_remat_stages == (
        "res1", "res2", "res3", "res4")
    assert fusion_exp().model.lidar_encoder.no_remat_stages == (
        "res1", "res2", "res3")
    assert camera_exp().model.with_lidar is False
    assert camera_exp().train.lr == pytest.approx(2e-4)  # ref camera lr


def test_exp_output_dir_layout_and_latest_symlink(tmp_path):
    root = str(tmp_path / "outputs")
    d1 = exp_output_dir("some_exp", root=root)
    assert os.path.isdir(d1)
    latest = os.path.join(root, "some_exp", "latest")
    assert os.path.islink(latest)
    assert os.path.realpath(latest) == os.path.realpath(d1)
    # a second run must repoint `latest` at the newest stamp
    d2 = exp_output_dir("some_exp", root=root)
    assert os.path.realpath(latest) == os.path.realpath(d2)
