"""Dump the compiled HLO text of the lidar eval/train step to a file (warm
compile cache => fast). Usage: python experiments/dump_hlo.py eval /tmp/eval_hlo.txt
"""
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
from unidistill_tpu.training.steps import eval_step, model_inputs, train_step
from unidistill_tpu.training.train_state import create_train_state, make_optimizer

which = sys.argv[1] if len(sys.argv) > 1 else "eval"
out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/{which}_hlo.txt"

cfg = lidar_exp().model
training = which == "train"
batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, 4, training=training))
model = BEVFusionCenterHead(cfg)
kw = model_inputs(jax.tree.map(lambda x: x[:1], batch), cfg, training=training)
variables = jax.eval_shape(
    lambda: model.init(jax.random.PRNGKey(0), **kw, train=training)
)
variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
tx = make_optimizer(1e-3, 1e-7, 0.1)
state = create_train_state(variables, tx)
if which == "eval":
    step = jax.jit(functools.partial(eval_step, model=model, cfg=cfg))
else:
    step = jax.jit(functools.partial(train_step, model=model, cfg=cfg, tx=tx))
txt = step.lower(state, batch).compile().as_text()
with open(out, "w") as f:
    f.write(txt)
print(out, len(txt))
