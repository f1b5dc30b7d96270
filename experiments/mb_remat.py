"""A/B the selective res-block remat knob (cfg.no_remat_stages) on the b4
lidar TRAIN step: s/it + compiled XLA temp bytes per config.

The chunked convs carry custom VJPs that save only their inputs, so block
remat mostly re-buys a forward replay; this measures what dropping it per
stage costs in HBM and saves in time.

Run: python experiments/mb_remat.py [config ...] where config is a comma
list of stages ('' = remat everything), default sweep below.
"""
import dataclasses
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from __graft_entry__ import _synth_batch
from unidistill_tpu.configs.nuscenes import lidar_exp
from unidistill_tpu.models.bevfusion import BEVFusionCenterHead
from unidistill_tpu.training.steps import model_inputs, train_step
from unidistill_tpu.training.train_state import create_train_state, make_optimizer


def run(stages):
    cfg0 = lidar_exp().model
    cfg = dataclasses.replace(
        cfg0,
        lidar_encoder=dataclasses.replace(
            cfg0.lidar_encoder, no_remat_stages=stages),
    )
    batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, 4, training=True))
    model = BEVFusionCenterHead(cfg)
    kw = model_inputs(jax.tree.map(lambda x: x[:1], batch), cfg, training=True)
    variables = jax.jit(lambda k: model.init(k, **kw, train=True))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(variables)
    tx = make_optimizer(1e-3, 1e-7, 0.1)
    state = create_train_state(variables, tx)
    step = jax.jit(functools.partial(train_step, model=model, cfg=cfg, tx=tx))
    t0 = time.time()
    compiled = step.lower(state, batch).compile()
    ct = time.time() - t0
    ma = compiled.memory_analysis()
    temps = getattr(ma, "temp_size_in_bytes", None)
    out = compiled(state, batch)
    jax.block_until_ready(out)
    ts = []
    for _ in range(4):
        t0 = time.time()
        _, m = compiled(state, batch)
        float(m["loss"])
        ts.append(time.time() - t0)
    ts.sort()
    print(f"  no_remat={stages or '()'}: {ts[1]:.3f} s/it  "
          f"temps {temps/2**30 if temps else -1:.2f} GiB  "
          f"(compile {ct:.0f}s)", flush=True)


def main():
    if len(sys.argv) > 1:
        cfgs = [tuple(s for s in a.split(",") if s) for a in sys.argv[1:]]
    else:
        cfgs = [(), ("res1", "res3"), ("res1", "res2", "res3")]
    for c in cfgs:
        try:
            run(c)
        except Exception as e:  # noqa: BLE001
            print(f"  no_remat={c}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
