"""Self-calibrated convolution (SCNet) blocks for the BEV backbone's optional
`use_scconv` path (ref layers/blocks_2d/det3d/sc_conv.py:6-158; flag off in
the active config, base_nuscenes_cfg.py:173)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                        epsilon=1e-3, dtype=jnp.float32, name=name)


def _avg_pool(x, k, s, pad=0):
    return nn.avg_pool(x, (k, k), strides=(s, s), padding=((pad, pad), (pad, pad)))


def _resize_bilinear(x, hw):
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]), "nearest")


class SCConv(nn.Module):
    planes: int
    stride: int = 1
    pooling_r: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        k2 = _avg_pool(x, self.pooling_r, self.pooling_r)
        k2 = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name="k2_conv")(k2)
        k2 = _bn(train, "k2_bn")(k2)
        k2 = _resize_bilinear(k2, identity.shape[1:3])
        gate = nn.sigmoid(identity + k2.astype(identity.dtype))
        k3 = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                     dtype=self.dtype, name="k3_conv")(x)
        k3 = _bn(train, "k3_bn")(k3)
        out = k3.astype(gate.dtype) * gate
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False, dtype=self.dtype,
                      name="k4_conv")(out)
        return _bn(train, "k4_bn")(out)


class SCBottleneck(nn.Module):
    planes: int
    stride: int = 1
    bottleneck_width: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        gw = int(self.planes * (self.bottleneck_width / 64.0))
        residual = x
        a = nn.Conv(gw, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1_a")(x)
        a = nn.relu(_bn(train, "bn1_a")(a))
        b = nn.Conv(gw, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1_b")(x)
        b = nn.relu(_bn(train, "bn1_b")(b))

        a = nn.Conv(gw, (3, 3), strides=(self.stride, self.stride), padding=1,
                    use_bias=False, dtype=self.dtype, name="k1_conv")(a)
        a = nn.relu(_bn(train, "k1_bn")(a))
        b = nn.relu(SCConv(gw, self.stride, dtype=self.dtype, name="scconv")(b, train))

        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv3")(jnp.concatenate([a, b], axis=-1))
        out = _bn(train, "bn3")(out)
        return nn.relu(out + residual.astype(out.dtype))
