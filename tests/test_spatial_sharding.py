"""BEV spatial sharding (2-D dp×bev mesh, GSPMD halos) vs the replicated
path — 8 virtual CPU devices (conftest)."""
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _synth_batch
from unidistill_tpu.configs.nuscenes import tiny_model
from unidistill_tpu.models.bevfusion import BEVFusionCenterHead
from unidistill_tpu.parallel.spatial import (
    eval_step_spatial,
    forward_spatial,
    make_mesh_2d,
)
from unidistill_tpu.training.steps import eval_step, model_inputs
from unidistill_tpu.training.train_state import (
    create_train_state,
    make_optimizer,
)


pytestmark = pytest.mark.slow  # heavy e2e: excluded from the default fast suite

def test_spatial_eval_matches_replicated():
    cfg = tiny_model()
    B = 4
    batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, B))
    model = BEVFusionCenterHead(cfg)
    kw = model_inputs(jax.tree.map(lambda x: x[:1], batch), cfg, training=False)
    variables = model.init(jax.random.PRNGKey(0), **kw, train=False)
    state = create_train_state(variables, make_optimizer(1e-3, 1e-7, 0.1))

    ref = jax.jit(
        lambda s, b: eval_step(s, b, model=model, cfg=cfg)
    )(state, batch)

    mesh = make_mesh_2d(dp=2, bev=4)
    # no ambient-mesh context needed: constraints use explicit NamedSharding
    got = jax.jit(
        lambda s, b: eval_step_spatial(s, b, model=model, cfg=cfg, mesh=mesh)
    )(state, batch)

    # GSPMD partitioning must be numerically equivalent (same graph, halos
    # inserted by the compiler); bf16 convs reduce in the same order per
    # shard so allow small tolerance. Post-NMS box SLOTS and keep-sets are
    # not compared elementwise: with random-init weights the heatmap scores
    # are near-tied and the NMS keep order is tie-break-unstable across
    # graph variants — compare the sorted kept-score distributions.
    gs = np.sort(np.asarray(got["scores"], np.float32)[np.asarray(got["mask"])])
    rs = np.sort(np.asarray(ref["scores"], np.float32)[np.asarray(ref["mask"])])
    k = min(len(gs), len(rs))
    assert abs(len(gs) - len(rs)) <= max(2, int(0.01 * k)), (len(gs), len(rs))
    np.testing.assert_allclose(gs[-k:], rs[-k:], rtol=2e-2, atol=2e-2)

    # the direct object of the sharding: the dense BEV pipeline's features
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    bev_ref = model.apply(
        variables, **model_inputs(batch, cfg, training=False), train=False
    )["bev_feature"]
    bev_sp = jax.jit(
        lambda v, b: forward_spatial(model, v, b, cfg, mesh)[0]["bev_feature"]
    )(variables, batch)
    np.testing.assert_allclose(
        np.asarray(bev_sp, np.float32), np.asarray(bev_ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_spatial_train_matches_replicated():
    import dataclasses

    from unidistill_tpu.parallel.spatial import train_step_spatial
    from unidistill_tpu.training.steps import train_step

    # f32 compute: the equivalence is then structural, not obscured by bf16
    # reduction-order jitter (train-mode BN batch stats amplify it ~8% at
    # random init)
    cfg = dataclasses.replace(tiny_model(), compute_dtype="float32")
    B = 4
    batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, B, training=True))
    model = BEVFusionCenterHead(cfg)
    kw = model_inputs(jax.tree.map(lambda x: x[:1], batch), cfg, training=True)
    variables = model.init(jax.random.PRNGKey(0), **kw, train=True)
    tx = make_optimizer(1e-3, 1e-7, 0.1)
    state = create_train_state(variables, tx)

    _, m_ref = jax.jit(
        lambda s, b: train_step(s, b, model=model, tx=tx, cfg=cfg)
    )(state, batch)

    mesh = make_mesh_2d(dp=2, bev=4)
    st_sp, m_sp = jax.jit(
        lambda s, b: train_step_spatial(s, b, model=model, tx=tx, cfg=cfg,
                                        mesh=mesh)
    )(state, batch)

    # f32 compute → only partition-order float noise remains
    np.testing.assert_allclose(
        float(m_sp["loss"]), float(m_ref["loss"]), rtol=1e-3
    )
    for k in m_ref:
        np.testing.assert_allclose(
            float(m_sp[k]), float(m_ref[k]), rtol=5e-3, atol=1e-4, err_msg=k
        )
    # parameters actually moved
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), st_sp.params, state.params
    )
    assert max(jax.tree.leaves(moved)) > 0.0


def test_mesh_2d_shape_guard():
    import pytest

    with pytest.raises(AssertionError):
        make_mesh_2d(dp=4, bev=4)  # only 8 virtual devices available


def test_spatial_distill_matches_replicated():
    import dataclasses

    from unidistill_tpu.configs.nuscenes import DISTILL_VARIANTS
    from unidistill_tpu.parallel.spatial import distill_train_step_spatial
    from unidistill_tpu.training.steps import distill_train_step

    # f32 compute for structural equivalence (see the train test)
    s_cfg = dataclasses.replace(
        tiny_model(with_lidar=False, with_camera=True),
        compute_dtype="float32")
    t_cfg = dataclasses.replace(
        tiny_model(with_lidar=True, with_camera=False),
        compute_dtype="float32")
    both = dataclasses.replace(s_cfg, with_lidar=True, with_camera=True)
    dcfg = DISTILL_VARIANTS[("lidar", "camera")]
    batch = jax.tree.map(jnp.asarray, _synth_batch(both, 4, training=True))

    student = BEVFusionCenterHead(s_cfg)
    teacher = BEVFusionCenterHead(t_cfg)
    kw_s = model_inputs(jax.tree.map(lambda x: x[:1], batch), s_cfg, training=True)
    kw_t = model_inputs(jax.tree.map(lambda x: x[:1], batch), t_cfg, training=False)
    sv = student.init(jax.random.PRNGKey(0), **kw_s, train=True)
    tv = teacher.init(jax.random.PRNGKey(1), **kw_t, train=False)
    tx = make_optimizer(1e-3, 1e-7, 0.1)
    state = create_train_state(sv, tx)
    t_params, t_stats = tv["params"], tv.get("batch_stats", {})

    _, m_ref = jax.jit(lambda s, b: distill_train_step(
        s, t_params, t_stats, b, student_model=student, teacher_model=teacher,
        tx=tx, student_cfg=s_cfg, teacher_cfg=t_cfg, dcfg=dcfg,
    ))(state, batch)

    mesh = make_mesh_2d(dp=2, bev=4)
    _, m_sp = jax.jit(lambda s, b: distill_train_step_spatial(
        s, t_params, t_stats, b, student, teacher, tx, s_cfg, t_cfg, dcfg,
        mesh,
    ))(state, batch)

    for k in ("loss", "loss_feature", "loss_bev_rel", "loss_resp_cls",
              "loss_resp_reg", "loss_det"):
        np.testing.assert_allclose(
            float(m_sp[k]), float(m_ref[k]), rtol=5e-3, atol=1e-5, err_msg=k
        )


def test_trainer_spatial_bev_knob(tmp_path):
    """train.spatial_bev=2 routes the Trainer's compiled step through the
    (dp, bev) GSPMD path; one step runs and produces finite loss."""
    import dataclasses

    from unidistill_tpu.configs.nuscenes import ExpConfig, TrainConfig
    from unidistill_tpu.training.loop import Trainer

    cfg = dataclasses.replace(tiny_model(), compute_dtype="float32")
    exp = ExpConfig(
        exp_name="spatial_knob_test", model=cfg,
        train=TrainConfig(spatial_bev=2),
    )
    tr = Trainer(exp, output_dir=str(tmp_path))
    try:
        assert tr.spatial_mesh is not None
        assert tr.spatial_mesh.devices.shape == (4, 2)  # 8 CPU devs / bev=2
        batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, 4, training=True))
        state = tr.init_state(
            jax.tree.map(np.asarray, batch), steps_per_epoch=1
        )
        step = tr._compile_train_step()
        new_state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1
    finally:
        tr.close()
