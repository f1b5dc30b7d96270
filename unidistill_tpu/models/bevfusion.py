"""BEVFusion-style multi-sensor detector (CenterHead variant), Flax.

ref BEVFusion_nuscenes_centerhead_fusion_exp.py:130-174 (BEVFusionCenterHead)
and BEVFusion_nuscenes_base_exp.py:107-161 (FusionEncoder, BevEncoder).

Composition (any subset of modalities, same as the reference's exp variants):
  lidar_encoder (sparse voxel encoder → [B, 180, 180, 256])
  camera_encoder (LSS → [B, 180, 180, 256])
  fusion_encoder (concat → channel attention → reduce conv, use_elementwise=False)
  bev_encoder (SECOND 2D backbone → [B, 180, 180, 512])
  det_head (CenterHead → per-task prediction dicts)

The module is a pure function: it returns (model_output, bev_feature,
multi_head_features) — exactly the triple the reference's `return_feature=True`
path yields (:154-155); losses/assignment/decoding are separate functions so
the same apply() serves train, eval and teacher duty.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from unidistill_tpu.configs.nuscenes import ModelConfig
from unidistill_tpu.layers.bev_backbone import BaseBEVBackbone
from unidistill_tpu.layers.center_head import CenterHead
from unidistill_tpu.layers.lidar_encoder import LidarEncoder
from unidistill_tpu.layers.lss import LSSFPN


class FusionEncoder(nn.Module):
    """Concat + squeeze-excite gate + 3×3 reduce (ref …base_exp.py:107-135,
    use_elementwise=False as configured at :254)."""

    out_channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x1, x2, train: bool):
        x = jnp.concatenate([x1, x2], axis=-1).astype(self.dtype)
        att = jnp.mean(x, axis=(1, 2), keepdims=True)
        att = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype,
                      name="att_conv")(att)
        att = nn.sigmoid(att)
        y = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="reduce_conv")(x * att)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="reduce_bn")(y)
        return nn.relu(y)


class BEVFusionCenterHead(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        voxel_feats: Optional[jnp.ndarray] = None,
        voxel_coords: Optional[jnp.ndarray] = None,
        imgs: Optional[jnp.ndarray] = None,
        mats: Optional[Dict[str, jnp.ndarray]] = None,
        train: bool = False,
        lidar_topo: Optional[Dict[str, jnp.ndarray]] = None,
    ):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        lidar_out = camera_out = None
        if cfg.with_lidar:
            lidar_out = LidarEncoder(
                cfg.lidar_encoder, dtype=dtype, name="lidar_encoder"
            )(voxel_feats, voxel_coords, train, lidar_topo)
            model_output = lidar_out
        if cfg.with_camera:
            camera_out = LSSFPN(cfg.camera_encoder, dtype=dtype,
                                name="camera_encoder")(imgs, mats, train)
            model_output = camera_out
        if cfg.with_lidar and cfg.with_camera:
            model_output = FusionEncoder(dtype=dtype, name="fusion_encoder")(
                lidar_out, camera_out, train
            )

        # remat the dense BEV tail: its backward activation temps (≈3 GB at
        # b4) OOM'd the 16 GB v5e on the LiDAR train step, while recompute
        # is ~5 ms of dense 2D convs (VERDICT r1; PROFILE.md train section)
        bev, _pyramid = nn.remat(BaseBEVBackbone, static_argnums=(2,))(
            layer_nums=cfg.bev_encoder.layer_nums,
            layer_strides=cfg.bev_encoder.layer_strides,
            num_filters=cfg.bev_encoder.num_filters,
            upsample_strides=cfg.bev_encoder.upsample_strides,
            num_upsample_filters=cfg.bev_encoder.num_upsample_filters,
            dtype=dtype,
            name="bev_encoder",
        )(model_output, train)

        preds = nn.remat(CenterHead, static_argnums=(2,))(
            tasks=cfg.tasks,
            common_heads=cfg.det_head.common_heads,
            share_conv_channel=cfg.det_head.share_conv_channel,
            init_bias=cfg.det_head.init_bias,
            dtype=dtype,
            name="det_head",
        )(bev, train)

        # AWL uncertainty-weighting params live with the head
        # (ref CenterHeadIouAware.__init__:50-51: num = len(code_weights) + 2)
        awl = self.param(
            "awl_params",
            nn.initializers.ones,
            (len(cfg.det_head.code_weights) + 2,),
        )
        return dict(
            model_output=model_output.astype(jnp.float32),
            bev_feature=bev.astype(jnp.float32),
            multi_head_features=preds,
            awl_params=awl,
        )
