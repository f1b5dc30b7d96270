"""Trace the lidar TRAIN step on the TPU (3 reps) into /tmp/jax_trace_train
and dump its compiled HLO for trace_join attribution."""
import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from __graft_entry__ import _synth_batch
from unidistill_tpu.configs.nuscenes import lidar_exp
from unidistill_tpu.models.bevfusion import BEVFusionCenterHead
from unidistill_tpu.training.steps import model_inputs, train_step
from unidistill_tpu.training.train_state import create_train_state, make_optimizer

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace_train"
hlo_out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/train_hlo.txt"

cfg = lidar_exp().model
batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, 4, training=True))
model = BEVFusionCenterHead(cfg)
kw = model_inputs(jax.tree.map(lambda x: x[:1], batch), cfg, training=True)
variables = jax.jit(lambda k: model.init(k, **kw, train=True))(
    jax.random.PRNGKey(0))
jax.block_until_ready(variables)
tx = make_optimizer(1e-3, 1e-7, 0.1)
state = create_train_state(variables, tx)
step = jax.jit(functools.partial(train_step, model=model, cfg=cfg, tx=tx))

with open(hlo_out, "w") as f:
    f.write(step.lower(state, batch).compile().as_text())

new_state, metrics = step(state, batch)
print("loss", float(metrics["loss"]), flush=True)
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        _, metrics = step(state, batch)
        float(metrics["loss"])
print("traced", trace_dir, flush=True)
