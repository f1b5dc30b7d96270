"""BEV-grid spatial sharding over a 2-D (dp, bev) device mesh.

SURVEY.md §2.3/§5 stretch goal: the reference has no analog (its only
parallelism is DDP). The spatial analog of sequence parallelism here is the
dense BEV pipeline — the 180×180 grid flowing through the SECOND backbone's
2D convs and the CenterHead. TPU-natively this is pure GSPMD: lay the BEV
tensor out as [B(dp), H(bev), W, C] with `with_sharding_constraint` and let
XLA insert the halo exchanges every 3×3 conv needs at partition boundaries —
no manual `ppermute` ring, no code changes inside the layers.

The loss-side `pmean` normalizers (losses/det.py) are written against a
named `dp` axis from `shard_map`; under jit+GSPMD there are no axis names
and global reductions are already global, so the spatial path exposes
`eval_step_spatial` (decode/NMS stay replicated per dp shard — their inputs
are gathered by GSPMD where needed), `forward_spatial` for feature
extraction, and `train_step_spatial` (replicated params + dp-sharded batch:
XLA's global reductions subsume both the pmean loss normalizers and the
gradient all-reduce). The 8-device CPU test asserts eval AND train
equivalence to the replicated path (tests/test_spatial_sharding.py).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BEV_AXIS = "bev"
DP_AXIS = "dp"


def make_mesh_2d(
    dp: int, bev: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= dp * bev, (len(devices), dp, bev)
    return Mesh(
        np.asarray(devices[: dp * bev]).reshape(dp, bev), (DP_AXIS, BEV_AXIS)
    )


def bev_sharding(mesh: Mesh) -> NamedSharding:
    """[B, H, W, C] activations: batch over dp, grid rows over bev."""
    return NamedSharding(mesh, P(DP_AXIS, BEV_AXIS))


def constrain_bev(x, mesh: Mesh):
    """Pin a [B, H, W, C] activation to the (dp, bev) layout inside jit —
    GSPMD propagates it through the conv stack and inserts halo exchanges."""
    return jax.lax.with_sharding_constraint(x, bev_sharding(mesh))


def forward_spatial(model, variables, batch, cfg, mesh: Mesh, train: bool = False):
    """Model forward with the dense BEV pipeline spatially sharded.

    Returns (output dict, batch_stats): encoder outputs and the BEV features
    are constrained to [dp, bev] so every dense 2D conv (bev backbone,
    heads) runs partitioned with XLA-managed halos. In train mode the
    mutated BatchNorm stats are returned (eval returns the input stats)."""
    from unidistill_tpu.training.steps import model_inputs

    kw = model_inputs(batch, cfg, training=train)
    if "imgs" in kw:
        kw["imgs"] = jax.lax.with_sharding_constraint(
            kw["imgs"], NamedSharding(mesh, P(DP_AXIS))
        )
    stats = variables.get("batch_stats", {})
    v = {"params": variables["params"], "batch_stats": stats}
    if train:
        out, mutated = model.apply(
            v, **kw, train=True, mutable=["batch_stats"]
        )
        stats = mutated["batch_stats"]
    else:
        out = model.apply(v, **kw, train=False)
    out = dict(out)
    out["model_output"] = constrain_bev(out["model_output"], mesh)
    out["bev_feature"] = constrain_bev(out["bev_feature"], mesh)
    return out, stats


def eval_step_spatial(state, batch, model, cfg, mesh: Mesh):
    """Spatially-sharded eval forward + decode. jit with `out_shardings`
    left to GSPMD; call under `jax.jit` with the mesh entered or pass
    sharded inputs."""
    from unidistill_tpu.decode.proposals import generate_proposals

    out, _ = forward_spatial(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        batch, cfg, mesh, train=False,
    )
    return generate_proposals(
        out["multi_head_features"], cfg.proposal, cfg.tasks,
        cfg.point_cloud_range[:2], cfg.voxel_size[:2], cfg.out_size_factor,
        training=False,
    )


def train_step_spatial(state, batch, model, tx, cfg, mesh: Mesh):
    """Training step with the dense BEV pipeline spatially sharded.

    Under jit+GSPMD there is no named axis: with replicated params and a
    dp-sharded batch, the loss normalizers' sums and the parameter
    gradients are ALREADY global reductions (XLA inserts the all-reduces),
    so this is `train_step` with the model forward routed through the
    sharding constraints and `axis_name=None`. Equivalence to the
    replicated step is asserted on the 8-device CPU mesh
    (tests/test_spatial_sharding.py)."""
    from unidistill_tpu.training.steps import train_step

    def forward_fn(params, batch_stats):
        return forward_spatial(
            model, {"params": params, "batch_stats": batch_stats},
            batch, cfg, mesh, train=True,
        )

    return train_step(state, batch, model, tx, cfg, axis_name=None,
                      forward_fn=forward_fn)


def distill_train_step_spatial(state, teacher_params, teacher_stats, batch,
                               student_model, teacher_model, tx,
                               student_cfg, teacher_cfg, dcfg, mesh: Mesh):
    """Distillation step with BOTH forwards spatially sharded — the repo's
    headline workload under the (dp, bev) mesh; same GSPMD reasoning as
    `train_step_spatial` (the distill losses' pmean normalizers become
    ordinary global reductions)."""
    from unidistill_tpu.training.steps import distill_train_step

    def student_fn(params, batch_stats):
        return forward_spatial(
            student_model, {"params": params, "batch_stats": batch_stats},
            batch, student_cfg, mesh, train=True,
        )

    def teacher_fn(params, batch_stats):
        return forward_spatial(
            teacher_model, {"params": params, "batch_stats": batch_stats},
            batch, teacher_cfg, mesh, train=False,
        )

    return distill_train_step(
        state, teacher_params, teacher_stats, batch, student_model,
        teacher_model, tx, student_cfg, teacher_cfg, dcfg, axis_name=None,
        student_forward_fn=student_fn, teacher_forward_fn=teacher_fn,
    )
