"""Map hot HLO op names (from trace_agg) to python source via compiled-HLO
metadata: dumps `<opname> : <metadata op_name/source>` for requested ops.

Usage: python experiments/hlo_attrib.py reshape.1040 fusion.4 slice_select_fusion
(no args: dump the 60 largest-shape reshapes/copies/fusions with source)
"""
import functools
import os
import re
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

names = set(sys.argv[1:])

cfg = lidar_exp().model
batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, 4))
model = BEVFusionCenterHead(cfg)
kw = model_inputs(jax.tree.map(lambda x: x[:1], batch), cfg, training=False)
variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), **kw, train=False))
variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)
state = create_train_state(variables, make_optimizer(1e-3, 1e-7, 0.1))
step = jax.jit(functools.partial(eval_step, model=model, cfg=cfg))
txt = step.lower(state, batch).compile().as_text()

pat = re.compile(r"^\s*(?:ROOT )?%?([\w.\-]+) = (\S+) (.*)$")
for line in txt.splitlines():
    m = pat.match(line)
    if not m:
        continue
    op, shape, rest = m.groups()
    if names:
        if op in names:
            print(f"{op} :: {shape}\n    {rest[:500]}\n")
    else:
        if re.match(r"(reshape|copy|fusion|transpose)", op) and (
            "f32[" in shape or "bf16[" in shape
        ):
            # crude size from shape dims
            dims = re.findall(r"\[([\d,]*)\]", shape)
            size = 1
            if dims and dims[0]:
                for d in dims[0].split(","):
                    size *= int(d)
            if size > 3e8:
                meta = re.search(r'metadata=\{[^}]*op_name="([^"]*)"', rest)
                print(f"{op} :: {shape[:90]}"
                      f"\n    {meta.group(1)[:240] if meta else '?'}")
