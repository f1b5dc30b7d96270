"""Benchmark harness — prints ONE JSON line for the driver.

Measures the camera BEV detector's eval forward (ResNet-50 → LSS lift-splat →
BEV backbone → CenterHead → decode + rotated NMS) at real nuScenes shapes on
the attached TPU chip, reporting frames/sec/chip.

Methodology: the axon relay adds ~30 ms host↔device round-trip per dispatch
and pipelines independent dispatches, so naive wall-clock loops are wrong in
both directions. We chain N steps inside ONE jit with a data dependence
(carry perturbs the input images) and difference N=1 vs N=K+1 timings to get
pure per-step device time.

`vs_baseline`: the reference repo publishes no numbers (BASELINE.md); the
provisional denominator is 25 frames/sec — a representative A100 figure for a
BEVDepth-style R50-LSS CenterPoint detector with CUDA voxel pooling at this
resolution. Replace with a measured reference number when one exists.
"""
import functools
import json
import time

A100_REF_FPS = 25.0
BATCH = 4
CHAIN = 8


def timed_chain(step_fn, state, batch, n):
    """Build a jitted fn running `n` dependent eval steps."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(state, batch):
        def body(i, carry):
            b = dict(batch)
            b["imgs"] = batch["imgs"] + carry * 1e-30
            out = step_fn(state, b)
            return carry + jnp.sum(out["scores"]) * 1e-30

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    return run


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synth_batch
    from unidistill_tpu.configs.nuscenes import camera_exp
    from unidistill_tpu.models.bevfusion import BEVFusionCenterHead
    from unidistill_tpu.training.steps import eval_step, model_inputs
    from unidistill_tpu.training.train_state import (
        create_train_state,
        make_optimizer,
    )

    cfg = camera_exp().model
    batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, BATCH))
    model = BEVFusionCenterHead(cfg)
    kw = model_inputs(jax.tree.map(lambda x: x[:1], batch), cfg, training=False)
    variables = model.init(jax.random.PRNGKey(0), **kw, train=False)
    tx = make_optimizer(1e-3, 1e-7, 0.1)
    state = create_train_state(variables, tx)

    step = functools.partial(eval_step, model=model, cfg=cfg)
    run1 = timed_chain(step, state, batch, 1)
    runk = timed_chain(step, state, batch, CHAIN + 1)
    float(run1(state, batch))  # compile + warm
    float(runk(state, batch))

    def best(fn, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(state, batch))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    d1 = best(run1)
    dk = best(runk)
    per_step = max((dk - d1) / CHAIN, 1e-9)
    fps = BATCH / per_step

    print(
        json.dumps(
            {
                "metric": "camera_bev_eval_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / A100_REF_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
