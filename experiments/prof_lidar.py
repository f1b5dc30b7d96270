"""Profile the lidar eval step on the TPU; dump trace for op-level analysis."""
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
from unidistill_tpu.training.steps import eval_step, model_inputs
from unidistill_tpu.training.train_state import create_train_state, make_optimizer

cfg = lidar_exp().model
batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, 4))
model = BEVFusionCenterHead(cfg)
kw = model_inputs(jax.tree.map(lambda x: x[:1], batch), cfg, training=False)
variables = jax.jit(lambda k: model.init(k, **kw, train=False))(jax.random.PRNGKey(0))
jax.block_until_ready(variables)
state = create_train_state(variables, make_optimizer(1e-3, 1e-7, 0.1))
trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax_trace"
hlo_out = sys.argv[2] if len(sys.argv) > 2 else None

step = jax.jit(functools.partial(eval_step, model=model, cfg=cfg))
if hlo_out:
    with open(hlo_out, "w") as f:
        f.write(step.lower(state, batch).compile().as_text())
float(jnp.sum(step(state, batch)["scores"]))  # compile+warm

with jax.profiler.trace(trace_dir):
    for _ in range(3):
        float(jnp.sum(step(state, batch)["scores"]))
print("trace done", trace_dir)
