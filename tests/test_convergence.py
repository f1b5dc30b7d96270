"""Convergence gate (VERDICT r1 item 2): training must actually LEARN.

Overfits the tiny LiDAR detector on a fixed synthetic scene for a few
hundred steps and asserts (a) the detection loss components collapse and
(b) the decoded detections recover the planted GT boxes (BEV-center
distance + score), plus a distill variant asserting the distill losses
decrease. A wrong sign in any loss term fails this where single-step
"loss is finite" tests cannot. The reference's only QA was full nuScenes
training + eval (ref README.md:62-98, …base_exp.py:360-376); this is the
CI-runnable proxy.

Gate design notes (measured in experiments/, r2):
  * the TOTAL loss is polluted by the AWL log-sigma terms (ref
    det3d.py AutomaticWeightedLoss) which move slowly and can even rise
    while every detection component falls — the gate therefore checks
    task-0 hm/loc component losses, not the total;
  * the tiny config's BEV head cell is 80·1.35/10 = 10.8 m, so the
    box-recovery radius is half a cell (5 m), not an absolute few meters;
  * runs on one CPU core this container provides: B=1, 220 steps
    ≈ 1.6 s/step + one compile. Marked `slow` with the rest of the e2e
    suite; it is the convergence gate, run it with `-m slow`.
"""
import dataclasses
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unidistill_tpu.configs.nuscenes import tiny_model
from unidistill_tpu.data.voxelize_host import voxelize_frame
from unidistill_tpu.models.bevfusion import BEVFusionCenterHead
from unidistill_tpu.training.steps import eval_step, model_inputs, train_step
from unidistill_tpu.training.train_state import create_train_state, make_optimizer

pytestmark = pytest.mark.slow

N_STEPS = 220
CENTERS = [(-15.0, -10.0), (12.0, 8.0), (20.0, -18.0), (-20.0, 16.0)]


def _scene_batch(cfg, B=1, seed=0, clutter=300):
    """Frames with planted boxes; LiDAR points sampled ON the boxes plus a
    light ground-plane clutter, so the detector can (only) learn the real
    pattern."""
    rng = np.random.RandomState(seed)
    P = cfg.caps.max_points
    G = cfg.caps.max_gt_boxes
    pts = np.zeros((B, P, 5), np.float32)
    mask = np.zeros((B, P), bool)
    gt = np.zeros((B, G, 10), np.float32)
    for b in range(B):
        k = 0
        pts[b, k:k + clutter, 0:2] = rng.uniform(-45, 45, (clutter, 2))
        pts[b, k:k + clutter, 2] = rng.uniform(-2.0, -1.8, clutter)
        k += clutter
        for gi, (cx, cy) in enumerate(CENTERS):
            w, l, h = 4.0, 6.0, 2.0
            npb = 250
            pts[b, k:k + npb, 0] = cx + rng.uniform(-l / 2, l / 2, npb)
            pts[b, k:k + npb, 1] = cy + rng.uniform(-w / 2, w / 2, npb)
            pts[b, k:k + npb, 2] = rng.uniform(-1.5, 0.5, npb)
            k += npb
            gt[b, gi] = [cx, cy, -0.5, l, w, h, 0.0, 0.0, 0.0, 1.0]  # class 1
        pts[b, :k, 3] = 128.0
        mask[b, :k] = True
    vfs, vcs = zip(*(voxelize_frame(pts[b], mask[b], cfg, True) for b in range(B)))
    out = {
        "points": pts, "points_mask": mask, "gt_boxes": gt,
        "voxel_feats": np.stack(vfs), "voxel_coords": np.stack(vcs),
    }
    if cfg.with_camera:
        ncam = cfg.camera_encoder.num_cams
        Hc, Wc = cfg.camera_encoder.final_dim
        out["imgs"] = rng.randn(B, ncam, Hc, Wc, 3).astype(np.float32)
        eye = np.broadcast_to(np.eye(4, dtype=np.float32), (B, ncam, 4, 4)).copy()
        intrin = eye.copy()
        intrin[..., 0, 0] = intrin[..., 1, 1] = 500.0
        intrin[..., 0, 2] = Wc / 2
        intrin[..., 1, 2] = Hc / 2
        out["mats"] = dict(
            sensor2ego_mats=eye,
            intrin_mats=intrin,
            ida_mats=eye.copy(),
            bda_mat=np.broadcast_to(
                np.eye(4, dtype=np.float32), (B, 4, 4)
            ).copy(),
        )
    if cfg.with_lidar and cfg.lidar_encoder.encoder_impl == "chunked":
        # loader-side topology (as the real dataset does, data/dataset.py:273)
        # — without it the device rebuilds tables per step, which dominates
        # CPU test time and compile time
        from unidistill_tpu.data.topology_host import plan_frame_topology

        topos = [
            plan_frame_topology(vcs[b], cfg.grid_size,
                                cfg.lidar_encoder.stage_voxel_caps)
            for b in range(B)
        ]
        for k in topos[0]:
            out[f"topo_{k}"] = np.stack([t[k] for t in topos])
    return out


def test_lidar_overfit_recovers_planted_boxes():
    cfg = tiny_model(with_lidar=True, with_camera=False)
    batch = jax.tree.map(jnp.asarray, _scene_batch(cfg))
    model = BEVFusionCenterHead(cfg)
    kw = model_inputs(jax.tree.map(lambda x: x[:1], batch), cfg, training=True)
    variables = model.init(jax.random.PRNGKey(0), **kw, train=True)
    tx = make_optimizer(1e-2, 1e-7, 0.1)
    state = create_train_state(variables, tx)

    step = jax.jit(functools.partial(train_step, model=model, cfg=cfg, tx=tx))
    first = None
    for i in range(N_STEPS):
        state, metrics = step(state, batch)
        if i == 0:
            first = {k: float(metrics[k])
                     for k in ("task_0/hm_loss", "task_0/loc_loss")}
    last = {k: float(metrics[k]) for k in first}
    assert np.isfinite(list(last.values())).all(), last
    # the detection components must collapse on a memorized scene (the
    # TOTAL loss would not: AWL log-sigma terms dominate it — docstring)
    assert last["task_0/loc_loss"] < 0.25 * first["task_0/loc_loss"], (first, last)
    assert last["task_0/hm_loss"] < 0.5 * first["task_0/hm_loss"], (first, last)

    # BatchNorm running stats trail the batch statistics by exp(-steps/100)
    # at the reference-parity momentum (0.99 JAX-style ≡ torch 0.01) — at a
    # few hundred steps eval-mode normalization is still ~10% stale, which
    # wrecks a single-scene overfit. Recover the exact batch statistics
    # from one mutable train-mode apply: updated = 0.99·old + 0.01·batch.
    kw_full = model_inputs(batch, cfg, training=True)
    _, mut = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        **kw_full, train=True, mutable=["batch_stats"],
    )
    exact = jax.tree.map(
        lambda upd, old: (upd - 0.99 * old) / 0.01,
        mut["batch_stats"], state.batch_stats,
    )
    state = state.replace(batch_stats=exact)

    res = jax.jit(functools.partial(eval_step, model=model, cfg=cfg))(
        state, batch
    )
    boxes = np.asarray(res["boxes"])   # [B, K, 9+]
    scores = np.asarray(res["scores"])
    # top-16: at this scale the k-NN-plateau assigner leaves ghost peaks at
    # unsupervised anchors that can outrank true centers for a few hundred
    # steps (measured, experiments log r2) — the gate checks the true boxes
    # are DETECTED with solid scores, not that ghosts are already suppressed
    hits = 0
    for b in range(boxes.shape[0]):
        top = np.argsort(-scores[b])[:16]
        for cx, cy in CENTERS:
            d = np.hypot(boxes[b, top, 0] - cx, boxes[b, top, 1] - cy)
            sc = scores[b, top]
            if np.any((d < 5.4) & (sc > 0.3)):  # half an output cell
                hits += 1
    n = boxes.shape[0] * len(CENTERS)
    assert hits >= 3 * n // 4, f"only {hits}/{n} planted boxes recovered"


def test_distill_losses_decrease():
    from unidistill_tpu.configs.nuscenes import DISTILL_VARIANTS
    from unidistill_tpu.training.steps import distill_train_step

    s_cfg = tiny_model(with_lidar=False, with_camera=True)
    t_cfg = tiny_model(with_lidar=True, with_camera=False)
    both = dataclasses.replace(s_cfg, with_lidar=True, with_camera=True)
    dcfg = DISTILL_VARIANTS[("lidar", "camera")]
    batch = jax.tree.map(jnp.asarray, _scene_batch(both))

    student = BEVFusionCenterHead(s_cfg)
    teacher = BEVFusionCenterHead(t_cfg)
    kw_s = model_inputs(jax.tree.map(lambda x: x[:1], batch), s_cfg, training=True)
    kw_t = model_inputs(jax.tree.map(lambda x: x[:1], batch), t_cfg, training=False)
    sv = student.init(jax.random.PRNGKey(0), **kw_s, train=True)
    tv = teacher.init(jax.random.PRNGKey(1), **kw_t, train=False)
    tx = make_optimizer(1e-3, 1e-7, 0.1)
    state = create_train_state(sv, tx)
    step = jax.jit(functools.partial(
        distill_train_step, student_model=student, teacher_model=teacher,
        tx=tx, student_cfg=s_cfg, teacher_cfg=t_cfg, dcfg=dcfg,
    ))
    t_params = tv["params"]
    t_stats = tv.get("batch_stats", {})
    first = last = None
    for i in range(60):
        state, m = step(state, t_params, t_stats, batch)
        vals = {
            k: float(m[k])
            for k in ("loss_feature", "loss_bev_rel", "loss_resp_cls",
                      "loss_resp_reg")
        }
        if i == 0:
            first = vals
        last = vals
    assert first and last
    # the weighted distill terms must all shrink while training on a fixed
    # teacher (pure optimization sanity — catches sign/masking errors)
    for k in first:
        assert last[k] < first[k], (k, first[k], last[k])
