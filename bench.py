"""Benchmark harness — prints ONE JSON line for the driver.

Measures the camera BEV detector's eval forward (ResNet-50 → LSS lift-splat →
BEV backbone → CenterHead → decode + rotated NMS) at real nuScenes shapes on
the attached TPU chip, reporting frames/sec/chip.

Methodology: the axon relay adds ~30 ms host↔device round-trip per dispatch
and pipelines independent dispatches, so naive wall-clock loops are wrong in
both directions. We time fully-synchronous single dispatches (scalar fetch
forces completion) and subtract the relay overhead measured with a trivial
jitted no-op, reporting the median of several reps.

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
REPS = 7


def median_sync_time(fn, reps=REPS):
    """Median wall time of a fully-synchronous call (fn must fetch a scalar)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


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

    step = jax.jit(functools.partial(eval_step, model=model, cfg=cfg))

    @jax.jit
    def noop(x):
        return x + 1.0

    small = jnp.zeros((8,), jnp.float32)
    float(noop(small)[0])  # compile
    float(jnp.sum(step(state, batch)["scores"]))  # compile + warm

    ovh = median_sync_time(lambda: float(noop(small)[0]))
    d = median_sync_time(lambda: float(jnp.sum(step(state, batch)["scores"])))
    per_step = max(d - ovh, 1e-9)
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
