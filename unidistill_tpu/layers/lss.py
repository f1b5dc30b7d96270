"""Lift-Splat-Shoot camera→BEV encoder in Flax (NHWC).

ref layers/blocks_3d/mmdet3d/lss_fpn.py:85-368 (LSSFPN): image backbone + neck
→ 1×1 depth net emitting 112 depth logits + 256 context channels → softmax
depth ⊗ context outer product over the frustum → geometry transform (ida⁻¹,
intrin⁻¹, sensor2ego, bda) → scatter-add into the 180×180 BEV grid.

TPU redesign highlights:
  * geometry is one precomputed frustum einsum against per-camera 4×4s (the
    reference loops matmuls over broadcasted views);
  * the depth⊗context product is NOT materialized at [N, D, fH, fW, C] — the
    fused `bev_pool_outer` scatter consumes depth and context directly
    (BEVPoolv2 formulation; see ops/bev_pool.py);
  * coordinates replicate the reference's `.int()` truncation-toward-zero
    (lss_fpn.py:311-313) rather than floor — a documented quirk that affects
    cells at the lower grid edge.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from unidistill_tpu.configs.nuscenes import CameraEncoderConfig
import jax

from unidistill_tpu.ops.bev_pool import bev_pool_outer, bev_pool_outer_pallas
from unidistill_tpu.layers.resnet import ResNet
from unidistill_tpu.layers.second_fpn import SECONDFPN


def make_frustum(cfg: CameraEncoderConfig) -> np.ndarray:
    """[D, fH, fW, 4] homogeneous (u, v, d, 1) image-space frustum
    (ref lss_fpn.py:173-198)."""
    ogfH, ogfW = cfg.final_dim
    fH, fW = cfg.feat_hw
    d = np.arange(*cfg.d_bound, dtype=np.float32)  # [D]
    D = d.shape[0]
    u = np.linspace(0, ogfW - 1, fW, dtype=np.float32)
    v = np.linspace(0, ogfH - 1, fH, dtype=np.float32)
    uu = np.broadcast_to(u[None, None, :], (D, fH, fW))
    vv = np.broadcast_to(v[None, :, None], (D, fH, fW))
    dd = np.broadcast_to(d[:, None, None], (D, fH, fW))
    ones = np.ones_like(dd)
    return np.stack([uu, vv, dd, ones], axis=-1)


def inv44(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of batched 4×4 matrices (cofactor/adjugate).

    `jnp.linalg.inv` lowers to a LAPACK custom call on CPU, which segfaults
    when a `jax.export`-serialized module is deserialized and compiled in a
    fresh process (reproduced with a toy inv-only export on this stack);
    the camera matrices here are tiny, so the explicit adjugate is both
    export-safe and cheaper than the LU path."""
    a = [[m[..., i, j] for j in range(4)] for i in range(4)]

    def det3(r0, r1, r2, c0, c1, c2):
        return (
            a[r0][c0] * (a[r1][c1] * a[r2][c2] - a[r1][c2] * a[r2][c1])
            - a[r0][c1] * (a[r1][c0] * a[r2][c2] - a[r1][c2] * a[r2][c0])
            + a[r0][c2] * (a[r1][c0] * a[r2][c1] - a[r1][c1] * a[r2][c0])
        )

    rows = (0, 1, 2, 3)
    cof = [[None] * 4 for _ in range(4)]
    for i in range(4):
        ri = tuple(r for r in rows if r != i)
        for j in range(4):
            cj = tuple(c for c in rows if c != j)
            minor = det3(ri[0], ri[1], ri[2], cj[0], cj[1], cj[2])
            cof[i][j] = minor if (i + j) % 2 == 0 else -minor
    det = sum(a[0][j] * cof[0][j] for j in range(4))
    adj = jnp.stack(
        [jnp.stack([cof[i][j] for i in range(4)], axis=-1) for j in range(4)],
        axis=-2,
    )  # transpose of cofactors
    return adj / det[..., None, None]


def get_geometry(
    frustum: jnp.ndarray,
    sensor2ego: jnp.ndarray,
    intrin: jnp.ndarray,
    ida: jnp.ndarray,
    bda: jnp.ndarray | None,
) -> jnp.ndarray:
    """Frustum → ego-frame xyz (ref lss_fpn.py:200-240).

    Args:
      frustum: [D, fH, fW, 4].
      sensor2ego / intrin / ida: [B, N_cam, 4, 4].
      bda: [B, 4, 4] or None.
    Returns: [B, N_cam, D, fH, fW, 3].
    """
    ida_inv = inv44(ida)
    pts = jnp.einsum("bnij,dhwj->bndhwi", ida_inv, frustum)
    pts = jnp.concatenate(
        [pts[..., :2] * pts[..., 2:3], pts[..., 2:]], axis=-1
    )
    combine = sensor2ego @ inv44(intrin)
    pts = jnp.einsum("bnij,bndhwj->bndhwi", combine, pts)
    if bda is not None:
        pts = jnp.einsum("bij,bndhwj->bndhwi", bda, pts)
    return pts[..., :3]


class LSSFPN(nn.Module):
    cfg: CameraEncoderConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        imgs: jnp.ndarray,
        mats: Dict[str, jnp.ndarray],
        train: bool,
        return_depth: bool = False,
    ):
        """Single-sweep (active configs, ref num_cam_sweeps=0):
        imgs [B, N_cam, H, W, 3] normalized; mats: sensor2ego_mats /
        intrin_mats / ida_mats [B, N_cam, 4, 4], bda_mat [B, 4, 4]
        (optional). Returns BEV feature [B, ny, nx, C].

        Multi-sweep (ref lss_fpn.py:244-306 `_forward_single_sweep` + the
        sweeps loop :340-368): imgs [B, S, N_cam, H, W, 3] with per-sweep
        mats [B, S, N_cam, 4, 4]; each sweep runs the full pipeline with
        SHARED weights, sweeps > 0 under stop_gradient (the reference's
        torch.no_grad), and the per-sweep BEV maps concat on the channel
        axis → [B, ny, nx, S·C]."""
        cfg = self.cfg

        # construct shared submodules ONCE; per-sweep calls reuse the params
        if cfg.img_backbone == "swin":
            from unidistill_tpu.layers.swin import SwinTransformer

            backbone = SwinTransformer(dtype=self.dtype, name="img_backbone")
        else:
            backbone = ResNet(dtype=self.dtype, name="img_backbone")
        neck = SECONDFPN(
            out_channels=cfg.img_neck_out_channels,
            upsample_strides=cfg.img_neck_upsample_strides,
            dtype=self.dtype,
            name="img_neck",
        )
        depth_net = nn.Conv(
            cfg.depth_channels + cfg.output_channels, (1, 1), use_bias=True,
            dtype=self.dtype, name="depth_net",
        )

        def single_sweep(imgs_s, mats_s, want_depth):
            B, N, H, W, _ = imgs_s.shape
            x = imgs_s.reshape(B * N, H, W, 3)
            feats = backbone(x, train)
            fpn = neck(feats, train)  # [B*N, fH, fW, 512]
            D = cfg.depth_channels
            C = cfg.output_channels
            dc = depth_net(fpn).astype(jnp.float32)
            depth = jnp.moveaxis(
                nn.softmax(dc[..., :D], axis=-1), -1, 1
            )  # [B*N, D, fH, fW]
            context = dc[..., D:]  # [B*N, fH, fW, C]

            fH, fW = cfg.feat_hw
            depth = depth.reshape(B, N, D, fH, fW)
            context = context.reshape(B, N, fH, fW, C)

            frustum = jnp.asarray(make_frustum(cfg))
            geom = get_geometry(
                frustum,
                mats_s["sensor2ego_mats"],
                mats_s["intrin_mats"],
                mats_s["ida_mats"],
                mats_s.get("bda_mat"),
            )  # [B, N, D, fH, fW, 3]
            lower = jnp.asarray(
                [cfg.x_bound[0], cfg.y_bound[0], cfg.z_bound[0]], jnp.float32
            )
            vsize = jnp.asarray(
                [cfg.x_bound[2], cfg.y_bound[2], cfg.z_bound[2]], jnp.float32
            )
            # .int() truncation toward zero — ref quirk (lss_fpn.py:311-313)
            geom_idx = ((geom - lower) / vsize).astype(jnp.int32)

            ny, nx = cfg.bev_hw
            # Pallas fused scatter on TPU (~0.4 ns/point vs XLA scatter's
            # ~65); XLA path elsewhere (tests/CPU mesh) and for
            # non-128-multiple C.
            ctx_ch = context.shape[-1]
            if jax.default_backend() == "tpu" and ctx_ch % 128 == 0:
                bev = bev_pool_outer_pallas(
                    geom_idx, depth, context, (nx, ny, 1)
                )
            else:
                bev = bev_pool_outer(geom_idx, depth, context, (nx, ny, 1))
            return (bev, depth) if want_depth else bev

        if imgs.ndim == 5:
            return single_sweep(imgs, mats, return_depth)

        # ---- multi-sweep: key frame keeps grads, rest are frozen context
        S = imgs.shape[1]
        sweep_mats = lambda s: {
            k: (v if k == "bda_mat" else v[:, s]) for k, v in mats.items()
        }
        key = single_sweep(imgs[:, 0], sweep_mats(0), return_depth)
        key_bev, key_depth = key if return_depth else (key, None)
        bevs = [key_bev]
        for s in range(1, S):
            bevs.append(jax.lax.stop_gradient(
                single_sweep(imgs[:, s], sweep_mats(s), False)
            ))
        out = jnp.concatenate(bevs, axis=-1)
        if return_depth:
            return out, key_depth
        return out
