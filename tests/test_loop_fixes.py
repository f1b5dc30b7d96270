"""Unit tests for the round-2 Trainer fixes (VERDICT r1 item 7):
resume-epoch accounting, multi-host token plumbing, per-epoch validation
hooks — all without jit (the train step is stubbed) so they run in seconds.
"""
import os

import numpy as np
import pytest

from unidistill_tpu.configs.nuscenes import (
    ExpConfig, TrainConfig, tiny_model,
)
from unidistill_tpu.training import loop as loop_mod
from unidistill_tpu.training.loop import Trainer, _decode_token, _encode_tokens
from unidistill_tpu.training.train_state import TrainState


def test_token_encode_decode_roundtrip():
    metas = [
        {"token": "e3d495d4ac534d54b321f50006683844"},
        {"token": ""},
        None,
        {"token": "x" * 100},  # over-width truncates, not crashes
    ]
    arr = _encode_tokens(metas)
    assert arr.shape == (4, 64) and arr.dtype == np.uint8
    assert _decode_token(arr[0]) == "e3d495d4ac534d54b321f50006683844"
    assert _decode_token(arr[1]) is None
    assert _decode_token(arr[2]) is None
    assert _decode_token(arr[3]) == "x" * 64


class _FakeLoader:
    """len()-able iterable of identical minimal batches."""

    def __init__(self, n, batch):
        self.n, self.batch = n, batch

    def __len__(self):
        return self.n

    def __iter__(self):
        return iter([self.batch] * self.n)


def _stub_trainer(tmp_path, monkeypatch, start_step):
    cfg = ExpConfig(
        exp_name="stub", model=tiny_model(with_lidar=True, with_camera=False),
        train=TrainConfig(batch_size_per_device=1, max_epochs=4),
    )
    out_dir = tmp_path / "out"
    out_dir.mkdir(parents=True, exist_ok=True)
    tr = Trainer(cfg, output_dir=str(out_dir))
    state = TrainState(
        np.asarray(start_step, np.int32),
        {"w": np.zeros(2, np.float32)}, {}, {"opt": np.zeros(1, np.float32)},
    )
    monkeypatch.setattr(
        Trainer, "init_state", lambda self, sample, steps_per_epoch: state
    )
    calls = []

    def fake_compile(self, distill_ctx=None):
        def step_fn(st, batch):
            calls.append(1)
            return (
                TrainState(st.step + 1, st.params, st.batch_stats, st.opt_state),
                {"loss": np.float32(1.0)},
            )

        return step_fn

    monkeypatch.setattr(Trainer, "_compile_train_step", fake_compile)
    monkeypatch.setattr(
        loop_mod.ckpt_lib, "save_checkpoint", lambda *a, **k: None
    )
    return tr, calls


def test_resume_skips_trained_epochs(tmp_path, monkeypatch):
    """A state restored at step 3·L with max_epochs=4 must train exactly
    one more epoch, not four (VERDICT r1 weak §5)."""
    L = 5
    tr, calls = _stub_trainer(tmp_path, monkeypatch, start_step=3 * L)
    loader = _FakeLoader(L, {"points": np.zeros((1, 4, 5), np.float32)})
    try:
        tr.fit(loader, max_epochs=4)
    finally:
        tr.close()
    assert len(calls) == L, f"expected {L} steps, got {len(calls)}"


def test_resume_past_end_trains_nothing(tmp_path, monkeypatch):
    L = 5
    tr, calls = _stub_trainer(tmp_path, monkeypatch, start_step=4 * L + 2)
    loader = _FakeLoader(L, {"points": np.zeros((1, 4, 5), np.float32)})
    try:
        tr.fit(loader, max_epochs=4)
    finally:
        tr.close()
    assert len(calls) == 0


def test_fit_runs_validation_on_interval(tmp_path, monkeypatch):
    L = 2
    tr, calls = _stub_trainer(tmp_path, monkeypatch, start_step=0)
    val_calls = []
    monkeypatch.setattr(
        Trainer, "validate",
        lambda self, state, vl, vd=None, epoch=None: val_calls.append(epoch),
    )
    loader = _FakeLoader(L, {"points": np.zeros((1, 4, 5), np.float32)})
    try:
        tr.fit(loader, max_epochs=4, val_loader=loader, eval_interval=2)
    finally:
        tr.close()
    assert val_calls == [1, 3]


def test_output_dir_broadcast_single_process(tmp_path):
    # single-process passthrough of the stamp broadcast
    assert loop_mod._broadcast_stamp("2026-08-17T00:00:00") == \
        "2026-08-17T00:00:00"


def test_predict_surfaces_s0_drop_stats(tmp_path, monkeypatch):
    """Eval-side slot-cap truncation audit (VERDICT r3 item 6): predict()
    must carry per-frame `s0_dropped` and validate() must summarize it —
    eval frames are where the s0 slot cap binds (configs/nuscenes.py:92-101).
    The cap-binding count itself comes from the host planner and is
    exercised against a genuinely binding cap below."""
    from unidistill_tpu.data.topology_host import plan_frame_topology

    # a frame whose slot count exceeds a tiny s0 cap → planner must report
    # the overflow in s0_dropped
    coords = np.stack(
        [np.zeros(32, np.int64), np.arange(32) // 8, np.arange(32) % 8], 1
    ).astype(np.int32)  # 32 distinct columns/slots
    topo = plan_frame_topology(
        coords, (8, 8, 4), (64, 64, 64), s0_cap=16
    )
    assert int(topo["s0_dropped"]) == 16

    tr, _ = _stub_trainer(tmp_path, monkeypatch, start_step=0)
    B, K = 2, 3
    rois = {
        "boxes": np.zeros((B, K, 9), np.float32),
        "scores": np.full((B, K), 0.5, np.float32),
        "labels": np.ones((B, K), np.int32),
        "mask": np.ones((B, K), bool),
    }
    tr._eval_fn = lambda state, batch: rois
    batch = {
        "points": np.zeros((B, 4, 5), np.float32),
        "topo_s0_dropped": np.asarray([7, 0], np.int32),
        "meta": [{"token": "a"}, {"token": "b"}],
    }
    preds = tr.predict(None, _FakeLoader(1, batch))
    assert [p["s0_dropped"] for p in preds] == [7, 0]
    rec = tr.validate(None, _FakeLoader(1, batch))
    tr.close()
    assert rec["s0_frames_dropping"] == 1
    assert rec["s0_slots_dropped_total"] == 7
    assert rec["s0_slots_dropped_max"] == 7
