"""Focused LiDAR eval + train step timings on the real TPU (chunked path).

Reuses bench.py's protocol: fully synchronous scalar-fetch timing, relay
no-op overhead subtracted, median of reps."""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from __graft_entry__ import _synth_batch
from bench import median_sync_time
from unidistill_tpu.configs.nuscenes import lidar_exp
from unidistill_tpu.models.bevfusion import BEVFusionCenterHead
from unidistill_tpu.training.steps import eval_step, model_inputs, train_step
from unidistill_tpu.training.train_state import create_train_state, make_optimizer

BATCH = int(os.environ.get("BENCH_B", "4"))


def main():
    @jax.jit
    def noop(x):
        return x + 1.0

    small = jnp.zeros((8,), jnp.float32)
    float(noop(small)[0])
    ovh = median_sync_time(lambda: float(noop(small)[0]))
    print(f"overhead {ovh*1e3:.1f} ms")

    cfg = lidar_exp().model
    batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, BATCH))
    model = BEVFusionCenterHead(cfg)
    kw = model_inputs(jax.tree.map(lambda x: x[:1], batch), cfg, training=False)
    t0 = time.time()
    variables = jax.jit(lambda k: model.init(k, **kw, train=False))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(variables)
    print(f"init compiled+ran in {time.time()-t0:.0f}s")
    tx = make_optimizer(1e-3, 1e-7, 0.1)
    state = create_train_state(variables, tx)

    step = jax.jit(functools.partial(eval_step, model=model, cfg=cfg))
    t0 = time.time()
    float(jnp.sum(step(state, batch)["scores"]))
    print(f"eval compiled+ran in {time.time()-t0:.0f}s")
    raw = median_sync_time(lambda: float(jnp.sum(step(state, batch)["scores"])))
    net = max(raw - ovh, 1e-9)
    print(f"LIDAR EVAL: {net*1e3:.1f} ms/batch net ({raw*1e3:.1f} raw) = "
          f"{BATCH/net:.2f} fps  [b={BATCH}]")

    if os.environ.get("BENCH_TRAIN", "1") == "1":
        batch_t = jax.tree.map(
            jnp.asarray, _synth_batch(cfg, BATCH, training=True)
        )
        tstep = jax.jit(functools.partial(train_step, model=model, cfg=cfg, tx=tx))
        t0 = time.time()
        s2, m = tstep(state, batch_t)
        float(m["loss"])
        print(f"train compiled+ran in {time.time()-t0:.0f}s")

        def run():
            s2, m = tstep(state, batch_t)
            return float(m["loss"])

        raw = median_sync_time(run, reps=5)
        net = max(raw - ovh, 1e-9)
        print(f"LIDAR TRAIN: {net*1e3:.1f} ms/it net = {BATCH/net:.2f} fr/s")


if __name__ == "__main__":
    main()
