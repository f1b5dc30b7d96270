"""SECOND-style dense 2D BEV backbone in Flax (NHWC).

ref layers/blocks_2d/det3d/base_bev_backbone.py:10-174 with the active config
(base_nuscenes_cfg.py:166-174): two branches — [5 convs @128ch stride1,
5 convs @256ch stride2] — each deconv-upsampled to stride 1× at 256ch and
concatenated into the 512×180×180 map consumed by the head. Returns the fused
map plus the stride pyramid (the reference's `pyramid` dict).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class BaseBEVBackbone(nn.Module):
    layer_nums: Sequence[int] = (5, 5)
    layer_strides: Sequence[int] = (1, 2)
    num_filters: Sequence[int] = (128, 256)
    upsample_strides: Sequence[int] = (1, 2)
    num_upsample_filters: Sequence[int] = (256, 256)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=jnp.float32, name=name)
        x = x.astype(self.dtype)
        in_h = x.shape[1]
        ups = []
        pyramid = {}
        for i, (n, s, f) in enumerate(
            zip(self.layer_nums, self.layer_strides, self.num_filters)
        ):
            x = nn.Conv(f, (3, 3), strides=(s, s), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"block{i}_conv0")(x)
            x = nn.relu(norm(f"block{i}_bn0")(x))
            for k in range(n):
                x = nn.Conv(f, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                            name=f"block{i}_conv{k + 1}")(x)
                x = nn.relu(norm(f"block{i}_bn{k + 1}")(x))
            stride = in_h // x.shape[1]
            pyramid[f"spatial_features_{stride}x"] = x
            us = self.upsample_strides[i]
            if us >= 1:
                u = nn.ConvTranspose(
                    self.num_upsample_filters[i], (us, us), strides=(us, us),
                    use_bias=False, dtype=self.dtype, name=f"deblock{i}_conv")(x)
            else:
                ds = int(np.round(1 / us))
                u = nn.Conv(
                    self.num_upsample_filters[i], (ds, ds), strides=(ds, ds),
                    padding="VALID", use_bias=False, dtype=self.dtype,
                    name=f"deblock{i}_conv")(x)
            ups.append(nn.relu(norm(f"deblock{i}_bn")(u)))
        out = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
        return out, pyramid
