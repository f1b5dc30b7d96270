"""Analytic MXU FLOP accounting (VERDICT r3 item 3).

Counts the matmul/conv FLOPs of any jittable function by walking its traced
jaxpr — every `dot_general` and `conv_general_dilated` contributes
``2 · output_elements · reduction_size``. All model shapes are static
(fixed voxel caps, fixed grids), so the traced count IS the analytic count;
no runtime instrumentation, no XLA dependence. Sub-jaxprs (pjit, custom
VJPs, checkpoint/remat, scan/while/cond) are walked recursively; `scan`
bodies multiply by trip count.

This is deliberately the MXU-only number — the roofline numerator for MFU.
Elementwise/gather/scatter work is bandwidth, not FLOPs; XLA's
`compiled.cost_analysis()['flops']` includes (some of) it, so the analytic
count is a LOWER bound on XLA's number. The cross-check in
tests/test_flops.py asserts the two agree within that ordering and a
sanity factor.

The reference has no FLOP accounting of any kind (SURVEY.md §6 — it
publishes no performance numbers at all).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict

import jax
import jax.extend
import numpy as np

_ClosedJaxpr = jax.extend.core.ClosedJaxpr
_Jaxpr = jax.extend.core.Jaxpr


def _dot_flops(eqn) -> float:
    """2 · M·N·B · K for dot_general (batch dims count once in output)."""
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    k = math.prod(lhs.shape[d] for d in lc) or 1
    out = math.prod(eqn.outvars[0].aval.shape) or 1
    return 2.0 * out * k


def _conv_flops(eqn) -> float:
    """2 · output_elements · (C_in/groups · prod(kernel_spatial))."""
    rhs = eqn.invars[1].aval  # kernel
    dn = eqn.params["dimension_numbers"]
    groups = eqn.params.get("feature_group_count", 1)
    k_spatial = math.prod(rhs.shape[d] for d in dn.rhs_spec[2:]) or 1
    c_in = rhs.shape[dn.rhs_spec[1]]  # already C_in/groups in the kernel
    out = math.prod(eqn.outvars[0].aval.shape) or 1
    return 2.0 * out * c_in * k_spatial


def _walk(jaxpr, mult: float, acc: Dict[str, float]) -> None:
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            acc["dot_general"] = acc.get("dot_general", 0.0) + mult * _dot_flops(eqn)
        elif name == "conv_general_dilated":
            acc["conv"] = acc.get("conv", 0.0) + mult * _conv_flops(eqn)
        elif name == "scan":
            _walk(eqn.params["jaxpr"].jaxpr, mult * eqn.params["length"], acc)
        elif name == "while":
            # trip count is dynamic; count one iteration (NMS while-loops do
            # negligible MXU work — this keeps the bound honest without
            # guessing)
            _walk(eqn.params["body_jaxpr"].jaxpr, mult, acc)
        elif name == "cond":
            branches = eqn.params["branches"]
            if branches:  # upper bound: the most expensive branch
                sub = [_collect(b.jaxpr) for b in branches]
                best = max(sub, key=lambda d: sum(d.values()))
                for k, v in best.items():
                    acc[k] = acc.get(k, 0.0) + mult * v
        else:
            for p in eqn.params.values():
                if isinstance(p, _ClosedJaxpr):
                    _walk(p.jaxpr, mult, acc)
                elif isinstance(p, _Jaxpr):
                    _walk(p, mult, acc)
                elif isinstance(p, (tuple, list)):
                    for q in p:
                        if isinstance(q, _ClosedJaxpr):
                            _walk(q.jaxpr, mult, acc)
                        elif isinstance(q, _Jaxpr):
                            _walk(q, mult, acc)


def _collect(jaxpr) -> Dict[str, float]:
    acc: Dict[str, float] = {}
    _walk(jaxpr, 1.0, acc)
    return acc


def matmul_flops(fn: Callable, *args: Any, **kwargs: Any) -> Dict[str, float]:
    """Analytic MXU FLOPs of one call of `fn(*args, **kwargs)`.

    Returns {"dot_general": F, "conv": F, "total": F}. Traces abstractly
    (no compile, no execution)."""
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    acc = _collect(jaxpr.jaxpr)
    acc["total"] = sum(acc.values())
    return acc


def model_flops_per_frame(cfg, training: bool = False, batch: int = 1,
                          with_loss: bool = False) -> Dict[str, float]:
    """Analytic MXU FLOPs per FRAME of the detector forward (optionally
    + loss) at config shapes; batch-linear terms dominate so per-frame is
    flops(batch)/batch."""
    import jax.numpy as jnp

    from __graft_entry__ import _synth_batch
    from unidistill_tpu.models.bevfusion import BEVFusionCenterHead
    from unidistill_tpu.training.steps import detector_loss, model_inputs

    model = BEVFusionCenterHead(cfg)
    b = jax.tree.map(jnp.asarray, _synth_batch(cfg, batch, training=training))
    kw = model_inputs(b, cfg, training=training)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), **kw, train=training)
    )
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)

    def fwd(v):
        out = model.apply(v, **kw, train=training,
                          mutable=["batch_stats"] if training else False)
        out = out[0] if training else out
        if with_loss:
            return detector_loss(out, b, cfg, axis_name=None)[0]
        return out["multi_head_features"]

    acc = matmul_flops(fwd, variables)
    return {k: v / batch for k, v in acc.items()}
