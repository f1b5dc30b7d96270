"""Benchmark harness — prints ONE JSON line for the driver.

Measures the camera BEV detector's eval forward (ResNet-50 → LSS lift-splat →
BEV backbone → CenterHead → decode) at real nuScenes shapes on the attached
TPU chip and reports frames/sec/chip.

`vs_baseline`: the reference repo publishes no numbers (BASELINE.md); the
provisional denominator is 25 frames/sec — a representative A100 figure for a
BEVDepth-style R50-LSS CenterPoint detector with CUDA voxel-pooling at batch 1
(same family as the reference's camera exp). Replace with a measured reference
number when one exists.
"""
import json
import time

import numpy as np

A100_REF_FPS = 25.0
BATCH = 4


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
    import functools

    cfg = camera_exp().model
    batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, BATCH))
    model = BEVFusionCenterHead(cfg)
    kw = model_inputs(jax.tree.map(lambda x: x[:1], batch), cfg, training=False)
    variables = model.init(jax.random.PRNGKey(0), **kw, train=False)
    tx = make_optimizer(1e-3, 1e-7, 0.1)
    state = create_train_state(variables, tx)

    step = jax.jit(functools.partial(eval_step, model=model, cfg=cfg))
    out = step(state, batch)
    jax.block_until_ready(out)

    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = step(state, batch)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iter
    fps = BATCH / dt

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
