"""SECONDFPN neck in Flax (NHWC).

Semantics of mmdet3d's SECONDFPN as configured by the reference
(ref BEVFusion_nuscenes_centerhead_fusion_exp.py:34-39: in [256,512,1024,2048],
upsample_strides [0.25,0.5,1,2], out [128,128,128,128]): each level gets one
deblock — ConvTranspose(k=s, stride=s) when s >= 1, Conv(k=1/s, stride=1/s)
when s < 1 — followed by BN(eps 1e-3, momentum 0.01) + ReLU, then channel
concat. All levels land on the camera feature stride (16).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class SECONDFPN(nn.Module):
    out_channels: Sequence[int]
    upsample_strides: Sequence[float]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool):
        assert len(feats) == len(self.out_channels)
        ups = []
        for i, (x, c, s) in enumerate(
            zip(feats, self.out_channels, self.upsample_strides)
        ):
            x = x.astype(self.dtype)
            if s >= 1:
                s = int(s)
                x = nn.ConvTranspose(
                    c, (s, s), strides=(s, s), use_bias=False, dtype=self.dtype,
                    name=f"deblock{i}_conv")(x)
            else:
                s = int(np.round(1 / s))
                x = nn.Conv(
                    c, (s, s), strides=(s, s), padding="VALID", use_bias=False,
                    dtype=self.dtype, name=f"deblock{i}_conv")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=jnp.float32, name=f"deblock{i}_bn")(x)
            ups.append(nn.relu(x))
        return jnp.concatenate(ups, axis=-1)
