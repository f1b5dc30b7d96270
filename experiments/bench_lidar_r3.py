"""Round-3 focused TPU measurement: lidar eval fps + lidar/fusion train
sec/it with the flat z-folded chunked encoder, plus an optional profiler
trace (UNIDISTILL_TRACE=/tmp/jax_trace_r3).

Writes one JSON line to stdout; used to fill PROFILE.md before the driver's
full bench.py run.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
sys.path.insert(0, "/root/repo")

import bench as B  # repo-root bench.py harness


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax
    import jax.numpy as jnp

    from unidistill_tpu.configs.nuscenes import fusion_exp, lidar_exp

    @jax.jit
    def noop(x):
        return x + 1.0

    small = jnp.zeros((8,), jnp.float32)
    float(noop(small)[0])
    ovh = B.median_sync_time(lambda: float(noop(small)[0]))
    out = {"relay_overhead_ms": round(ovh * 1e3, 1)}

    jobs = []
    if which in ("all", "eval"):
        jobs += [("lidar_eval", lambda: B.bench_eval(lidar_exp, ovh))]
    if which in ("all", "train"):
        jobs += [("lidar_train", lambda: B.bench_train(lidar_exp, ovh))]
    if which in ("all", "fusion"):
        jobs += [("fusion_eval", lambda: B.bench_eval(fusion_exp, ovh)),
                 ("fusion_train", lambda: B.bench_train(fusion_exp, ovh))]
    for name, fn in jobs:
        t0 = time.time()
        try:
            out[name] = fn()
            out[name]["total_s"] = round(time.time() - t0, 1)
        except Exception as e:  # noqa: BLE001
            out[name] = f"failed: {type(e).__name__}: {e}"[:300]
        print(json.dumps({name: out[name]}), flush=True)

    trace_dir = os.environ.get("UNIDISTILL_TRACE")
    if trace_dir:
        import functools

        import jax

        from __graft_entry__ import _synth_batch
        from unidistill_tpu.models.bevfusion import BEVFusionCenterHead
        from unidistill_tpu.training.steps import eval_step, model_inputs
        from unidistill_tpu.training.train_state import (
            create_train_state,
            make_optimizer,
        )

        cfg = lidar_exp().model
        batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, B.BATCH))
        model = BEVFusionCenterHead(cfg)
        kw = model_inputs(jax.tree.map(lambda x: x[:1], batch), cfg,
                          training=False)
        variables = jax.jit(lambda k: model.init(k, **kw, train=False))(
            jax.random.PRNGKey(0))
        jax.block_until_ready(variables)
        state = create_train_state(variables, make_optimizer(1e-3, 1e-7, 0.1))
        step = jax.jit(functools.partial(eval_step, model=model, cfg=cfg))
        float(jnp.sum(step(state, batch)["scores"]))
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                float(jnp.sum(step(state, batch)["scores"]))
        print(json.dumps({"trace": trace_dir}), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
