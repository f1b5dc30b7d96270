"""CenterPoint-style multi-task detection head in Flax (NHWC).

ref layers/head/det3d/center_head.py:15-146 (CenterHead + SepHead): one shared
3×3 conv (512→64, BN+ReLU), then per task group a SepHead emitting
{hm, iou, reg, height, dim, rot, vel} — each branch is conv3×3(64→64)+BN+ReLU
followed by conv3×3(64→out). The hm branch's final bias initializes to
init_bias (-2.19); others use kaiming init (flax default variance scaling is
close enough; exactness only matters for from-scratch training dynamics).

This module is pure function approximation — target assignment, losses and
decoding live in targets/, losses/ and decode/ (the TPU build keeps the head
stateless instead of the reference's train/eval branching inside forward).
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


HEAD_ORDER = ("iou", "reg", "height", "dim", "rot", "vel")


class SepHead(nn.Module):
    heads: Tuple[Tuple[str, Tuple[int, int]], ...]  # name -> (out_ch, num_conv)
    num_cls: int
    head_conv: int = 64
    init_bias: float = -2.19
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool) -> Dict[str, jnp.ndarray]:
        out = {}
        all_heads = tuple(self.heads) + (("hm", (self.num_cls, 2)),)
        for name, (ch, num_conv) in all_heads:
            h = x
            for i in range(num_conv - 1):
                h = nn.Conv(self.head_conv, (3, 3), padding=1, use_bias=True,
                            dtype=self.dtype, name=f"{name}_conv{i}")(h)
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32,
                                 name=f"{name}_bn{i}")(h)
                h = nn.relu(h)
            bias_init = (
                nn.initializers.constant(self.init_bias)
                if name == "hm"
                else nn.initializers.zeros_init()
            )
            h = nn.Conv(ch, (3, 3), padding=1, use_bias=True, dtype=self.dtype,
                        bias_init=bias_init, name=f"{name}_out")(h)
            out[name] = h.astype(jnp.float32)
        return out


class CenterHead(nn.Module):
    tasks: Tuple[Tuple[str, ...], ...]
    common_heads: Tuple[Tuple[str, Tuple[int, int]], ...]
    share_conv_channel: int = 64
    init_bias: float = -2.19
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool) -> List[Dict[str, jnp.ndarray]]:
        x = x.astype(self.dtype)
        x = nn.Conv(self.share_conv_channel, (3, 3), padding=1, use_bias=True,
                    dtype=self.dtype, name="shared_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="shared_bn")(x)
        x = nn.relu(x)
        preds = []
        for tid, classes in enumerate(self.tasks):
            preds.append(
                SepHead(
                    heads=self.common_heads,
                    num_cls=len(classes),
                    init_bias=self.init_bias,
                    dtype=self.dtype,
                    name=f"task{tid}",
                )(x, train)
            )
        return preds
