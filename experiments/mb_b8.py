"""b8-on-one-chip experiment (VERDICT r4 next-round #6).

PARITY.md argues b8 lidar needs spatial sharding (~25 GiB at the b4 remat
policy). But at ~10-12% MFU a bigger batch is the cheapest MFU lever, and
remat policy is a free variable: this script compiles the b8 lidar eval
and train steps under several remat policies, reports XLA's compiled
memory analysis (temps/args/outputs vs the 16 GiB v5e HBM), and — when a
policy fits — measures the step time and fps/chip vs the b4 numbers.

Run: python experiments/mb_b8.py [eval|train|all]
"""
import dataclasses
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
sys.path.insert(0, "/root/repo")

import bench as B  # noqa: E402 — repo-root harness (timing + flops helpers)

BATCH = 8
HBM = 16 * 2**30


def mem_report(compiled):
    try:
        ma = compiled.memory_analysis()
        return {
            "temp_gib": round(ma.temp_size_in_bytes / 2**30, 2),
            "arg_gib": round(ma.argument_size_in_bytes / 2**30, 2),
            "out_gib": round(ma.output_size_in_bytes / 2**30, 2),
            "total_gib": round(
                (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                 + ma.output_size_in_bytes) / 2**30, 2),
        }
    except Exception as e:  # noqa: BLE001
        return {"memory_analysis_failed": str(e)[:120]}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synth_batch
    from unidistill_tpu.configs.nuscenes import lidar_exp
    from unidistill_tpu.models.bevfusion import BEVFusionCenterHead
    from unidistill_tpu.training.steps import eval_step, model_inputs, train_step
    from unidistill_tpu.training.train_state import (
        create_train_state,
        make_optimizer,
    )

    @jax.jit
    def noop(x):
        return x + 1.0

    small = jnp.zeros((8,), jnp.float32)
    float(noop(small)[0])
    ovh = B.median_sync_time(lambda: float(noop(small)[0]))
    print(json.dumps({"relay_overhead_ms": round(ovh * 1e3, 1)}), flush=True)

    base = lidar_exp().model

    def build(cfg, training):
        batch = jax.tree.map(
            jnp.asarray, _synth_batch(cfg, BATCH, training=training))
        model = BEVFusionCenterHead(cfg)
        kw = model_inputs(jax.tree.map(lambda x: x[:1], batch), cfg,
                          training=training)
        variables = jax.jit(
            lambda k: model.init(k, **kw, train=training)
        )(jax.random.PRNGKey(0))
        jax.block_until_ready(variables)
        tx = make_optimizer(1e-3, 1e-7, 0.1)
        state = create_train_state(variables, tx)
        return model, state, batch, tx

    if which in ("all", "eval"):
        cfg = base
        model, state, batch, _ = build(cfg, training=False)
        step = jax.jit(functools.partial(eval_step, model=model, cfg=cfg))
        lowered = step.lower(state, batch)
        compiled = lowered.compile()
        rep = {"b8_eval_memory": mem_report(compiled)}
        try:
            float(jnp.sum(step(state, batch)["scores"]))
            raw = B.median_sync_time(
                lambda: float(jnp.sum(step(state, batch)["scores"])), reps=5)
            net = max(raw - ovh, 1e-9)
            rep["b8_eval"] = {
                "fps": round(BATCH / net, 2),
                "ms_per_batch": round(net * 1e3, 1),
                "ms_per_batch_raw": round(raw * 1e3, 1),
            }
        except Exception as e:  # noqa: BLE001
            rep["b8_eval"] = f"failed: {type(e).__name__}: {e}"[:200]
        print(json.dumps(rep), flush=True)

    if which in ("all", "train"):
        # remat policies, most->least memory-hungry. "bev" additionally
        # remats the BEV backbone via cfg flag when supported.
        policies = [
            ("b4_policy+res4", ("res1", "res2", "res3", "res4")),
            ("b4_policy", ("res1", "res2", "res3")),
            ("remat_all", ()),
        ]
        for pname, stages in policies:
            cfg = dataclasses.replace(
                base,
                lidar_encoder=dataclasses.replace(
                    base.lidar_encoder, no_remat_stages=stages),
            )
            model, state, batch, tx = build(cfg, training=True)
            step = jax.jit(
                functools.partial(train_step, model=model, cfg=cfg, tx=tx))
            t0 = time.time()
            rep = {"policy": pname}
            try:
                compiled = step.lower(state, batch).compile()
                rep["memory"] = mem_report(compiled)
                rep["compile_s"] = round(time.time() - t0, 1)
                fits = rep["memory"].get("total_gib", 99) < 15.5
                if fits:
                    def run():
                        _, m = step(state, batch)
                        return float(m["loss"])
                    run()
                    raw = B.median_sync_time(run, reps=3)
                    net = max(raw - ovh, 1e-9)
                    rep["b8_train"] = {
                        "sec_per_it": round(net, 3),
                        "frames_per_sec": round(BATCH / net, 2),
                    }
            except Exception as e:  # noqa: BLE001
                rep["error"] = f"{type(e).__name__}: {e}"[:300]
            print(json.dumps({f"b8_train[{pname}]": rep}), flush=True)
            if "b8_train" in rep:
                break  # first policy that fits AND runs is the answer

if __name__ == "__main__":
    main()
