"""Measure trace+compile time of the LiDAR eval/train step vs batch size.

VERDICT r1 item 8: the batched sparse-conv path statically unrolls python
loops over batch, so graph size grows ~linearly in B. This measures where
that actually hurts (b = 4 / 8 / 16) using AOT lower()+compile() wall times
on the real TPU backend, with the persistent compile cache DISABLED so the
numbers are honest colds.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from __graft_entry__ import _synth_batch
from unidistill_tpu.configs.nuscenes import lidar_exp
from unidistill_tpu.models.bevfusion import BEVFusionCenterHead
from unidistill_tpu.training.steps import eval_step, model_inputs, train_step
from unidistill_tpu.training.train_state import create_train_state, make_optimizer


def main():
    cfg = lidar_exp().model
    model = BEVFusionCenterHead(cfg)
    for B in (4, 8, 16):
        batch_np = _synth_batch(cfg, B, training=True)
        batch = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch_np
        )
        kw = model_inputs(jax.tree.map(lambda x: jnp.asarray(x[:1]), batch_np),
                          cfg, training=True)
        variables = jax.eval_shape(lambda k: model.init(k, **kw, train=True),
                                   jax.random.PRNGKey(0))
        tx = make_optimizer(1e-3, 1e-7, 0.1)
        state = jax.eval_shape(lambda v: create_train_state(v, tx), variables)
        for name, fn in (
            ("eval", functools.partial(eval_step, model=model, cfg=cfg)),
            ("train", functools.partial(train_step, model=model, cfg=cfg,
                                        tx=tx)),
        ):
            t0 = time.perf_counter()
            lowered = jax.jit(fn).lower(state, batch)
            t1 = time.perf_counter()
            hlo_kb = len(lowered.as_text()) // 1024
            t2 = time.perf_counter()
            lowered.compile()
            t3 = time.perf_counter()
            print(
                f"B={B:2d} {name:5s}: trace {t1 - t0:6.1f}s  "
                f"hlo {hlo_kb:7d} KB  compile {t3 - t2:6.1f}s",
                flush=True,
            )


if __name__ == "__main__":
    main()
