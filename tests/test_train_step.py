"""End-to-end smoke tests: tiny fusion model through train_step / eval_step /
distill_train_step, single device and 8-device shard_map."""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from unidistill_tpu.configs.nuscenes import DISTILL_VARIANTS, tiny_model
from unidistill_tpu.models.bevfusion import BEVFusionCenterHead
from unidistill_tpu.parallel.mesh import make_mesh
from unidistill_tpu.training.steps import (
    distill_train_step,
    eval_step,
    model_inputs,
    train_step,
)
from unidistill_tpu.training.train_state import create_train_state, make_optimizer

pytestmark = pytest.mark.slow  # heavy e2e: excluded from the default fast suite


def make_batch(rng, cfg, B):
    P_, G = cfg.caps.max_points, cfg.caps.max_gt_boxes
    pts = rng.uniform(-50, 50, (B, P_, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-4, 2, (B, P_))
    pts[..., 4] = 0.0
    mask = rng.uniform(0, 1, (B, P_)) > 0.1
    ncam = cfg.camera_encoder.num_cams
    H, W = cfg.camera_encoder.final_dim
    imgs = rng.randn(B, ncam, H, W, 3).astype(np.float32)
    eye = np.broadcast_to(np.eye(4, dtype=np.float32), (B, ncam, 4, 4)).copy()
    intrin = eye.copy()
    intrin[..., 0, 0] = intrin[..., 1, 1] = 60.0
    intrin[..., 0, 2] = W / 2
    intrin[..., 1, 2] = H / 2
    mats = dict(
        sensor2ego_mats=eye,
        intrin_mats=intrin,
        ida_mats=eye.copy(),
        bda_mat=np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy(),
    )
    gt = np.zeros((B, G, 10), np.float32)
    for b in range(B):
        n = rng.randint(2, 8)
        gt[b, :n, 0:2] = rng.uniform(-40, 40, (n, 2))
        gt[b, :n, 2] = rng.uniform(-2, 1, n)
        gt[b, :n, 3:6] = rng.uniform(1, 6, (n, 3))
        gt[b, :n, 6] = rng.uniform(-3, 3, n)
        gt[b, :n, 9] = rng.randint(1, 11, n)
    return dict(
        points=jnp.asarray(pts), points_mask=jnp.asarray(mask),
        imgs=jnp.asarray(imgs), mats=jax.tree.map(jnp.asarray, mats),
        gt_boxes=jnp.asarray(gt),
    )


def init_model(cfg, batch, B):
    model = BEVFusionCenterHead(cfg)
    kw = model_inputs(batch, cfg, training=True)
    variables = model.init(jax.random.PRNGKey(0), **kw, train=True)
    return model, variables


@pytest.fixture(scope="module")
def fusion_setup():
    cfg = tiny_model()
    rng = np.random.RandomState(0)
    batch = make_batch(rng, cfg, B=2)
    model, variables = init_model(cfg, batch, 2)
    return cfg, batch, model, variables


def test_train_step_runs_and_updates(fusion_setup):
    cfg, batch, model, variables = fusion_setup
    tx = make_optimizer(1e-3, 1e-7, 0.1)
    state = create_train_state(variables, tx)
    step = jax.jit(
        functools.partial(train_step, model=model, tx=tx, cfg=cfg)
    )
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params actually move
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     state.params, new_state.params),
    )
    assert diff > 0
    # second step to exercise donated/updated state path
    new_state2, metrics2 = step(new_state, batch)
    assert np.isfinite(float(metrics2["loss"]))


def test_eval_step_shapes(fusion_setup):
    cfg, batch, model, variables = fusion_setup
    tx = make_optimizer(1e-3, 1e-7, 0.1)
    state = create_train_state(variables, tx)
    out = jax.jit(functools.partial(eval_step, model=model, cfg=cfg))(state, batch)
    R = len(cfg.tasks) * cfg.proposal.nms_post_max_size_test
    assert out["boxes"].shape == (2, R, 9)
    assert out["labels"].shape == (2, R)
    m = np.asarray(out["mask"])
    lab = np.asarray(out["labels"])
    assert ((lab[m] >= 1) & (lab[m] <= 10)).all()


def test_distill_step_runs(fusion_setup):
    cfg_t = tiny_model(with_lidar=True, with_camera=False)
    cfg_s = tiny_model(with_lidar=False, with_camera=True)
    rng = np.random.RandomState(1)
    batch = make_batch(rng, tiny_model(), B=2)
    t_model, t_vars = init_model(cfg_t, batch, 2)
    s_model, s_vars = init_model(cfg_s, batch, 2)
    tx = make_optimizer(2e-4, 1e-7, 0.1)
    state = create_train_state(s_vars, tx)
    dcfg = DISTILL_VARIANTS[("lidar", "camera")]
    step = jax.jit(
        functools.partial(
            distill_train_step,
            student_model=s_model, teacher_model=t_model, tx=tx,
            student_cfg=cfg_s, teacher_cfg=cfg_t, dcfg=dcfg,
        )
    )
    new_state, metrics = step(
        state, t_vars["params"], t_vars.get("batch_stats", {}), batch
    )
    for k in ("loss", "loss_feature", "loss_bev_rel", "loss_resp_cls",
              "loss_resp_reg"):
        assert np.isfinite(float(metrics[k])), k


def test_train_step_sharded_8dev(fusion_setup):
    cfg, batch, model, variables = fusion_setup
    mesh = make_mesh()
    assert mesh.devices.size == 8
    tx = make_optimizer(1e-3, 1e-7, 0.1)
    state = create_train_state(variables, tx)
    rng = np.random.RandomState(2)
    batch8 = make_batch(rng, cfg, B=8)

    fn = functools.partial(train_step, model=model, tx=tx, cfg=cfg, axis_name="dp")
    step = jax.jit(
        jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(), P("dp")),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    new_state, metrics = step(state, batch8)
    assert np.isfinite(float(metrics["loss"]))
