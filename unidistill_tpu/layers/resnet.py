"""ResNet image backbone in Flax (NHWC, bf16-friendly).

The reference builds its camera backbone through mmdet's registry
(`build_backbone({'type': 'ResNet', 'depth': 50, 'out_indices': [0,1,2,3]})`,
ref BEVFusion_nuscenes_centerhead_fusion_exp.py:24-31, lss_fpn.py:143). This is
a torchvision-compatible ResNet-50 so reference checkpoints can be imported
weight-for-weight; layout is NHWC and compute dtype is configurable (bf16 on
TPU keeps the MXU fed; BN statistics stay fp32).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name=name,
        )
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = norm("bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = norm("bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(out)
        out = norm("bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = norm("downsample_bn")(identity)
        return nn.relu(out + identity.astype(out.dtype))


class ResNet(nn.Module):
    """Returns the feature maps after each stage listed in `out_indices`
    (0→layer1/stride4 … 3→layer4/stride32)."""

    block_counts: Sequence[int] = (3, 4, 6, 3)  # ResNet-50
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = 64
        for stage, n_blocks in enumerate(self.block_counts):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                x = Bottleneck(
                    planes=planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return outs
