"""Train state + optimizer, mirroring the reference recipe.

ref: AdamW(lr, weight_decay=1e-7) + MultiStepLR(milestones=[10, 15], γ=0.1)
+ grad-norm clip 0.1 (BEVFusion_nuscenes_base_exp.py:436-441; base_cli.py:42
gradient_clip_val=0.1 — PyTorch Lightning clips by global norm by default).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def multistep_lr(base_lr: float, milestones_epochs, gamma: float, steps_per_epoch: int):
    boundaries = {int(m * steps_per_epoch): gamma for m in milestones_epochs}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(
    lr: float,
    weight_decay: float,
    grad_clip: float,
    milestones_epochs=(10, 15),
    gamma: float = 0.1,
    steps_per_epoch: int = 1,
    lr_scale_factor: Optional[Dict[str, float]] = None,
) -> optax.GradientTransformation:
    """AdamW + MultiStepLR + global-norm clip.

    `lr_scale_factor`: per-top-level-module LR multipliers (e.g.
    {"camera_encoder": 0.1}). The reference declares this knob
    (…base_exp.py:290) but never wires it into its optimizer; here it works.
    """
    sched = multistep_lr(lr, milestones_epochs, gamma, steps_per_epoch)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(sched, weight_decay=weight_decay),
    )
    if not lr_scale_factor:
        return tx

    def scale_tree(updates):
        def scale(path, u):
            top = path[0].key if path else ""
            return u * lr_scale_factor.get(top, 1.0)

        import jax

        return jax.tree_util.tree_map_with_path(scale, updates)

    return optax.chain(
        tx,
        optax.stateless(lambda updates, params=None: scale_tree(updates)),
    )


def create_train_state(variables: Dict, tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
