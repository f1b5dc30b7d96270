"""Swin Transformer backbone in Flax (NHWC).

The reference's base config uses mmdet's SwinTransformer-Tiny for the camera
branch (ref base_nuscenes_cfg.py:137-157: embed 96, depths [2,2,6,2], heads
[3,6,12,24], window 7, out_indices [1,2,3]); the active CenterHead exps swap
it for ResNet-50 but the Swin path remains part of the reference surface.

Standard Swin-T: patch-embed conv 4×4/4 + LN; per stage, alternating
W-MSA / SW-MSA blocks with relative position bias and 4× MLPs; patch merging
(2×2 concat → LN → linear) between stages; a LayerNorm per emitted output.
Feature maps that don't divide the window size are zero-padded (mmdet
behavior). Attention masks for shifted windows are built statically.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def _window_reverse(wins, ws, B, H, W):
    C = wins.shape[-1]
    x = wins.reshape(B, H // ws, W // ws, ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def _shift_attn_mask(H, W, ws, shift):
    """[-inf/0] additive mask for SW-MSA windows, built in numpy (static)."""
    img = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, h, w, :] = cnt
            cnt += 1
    wins = img.reshape(1, H // ws, ws, W // ws, ws, 1)
    wins = wins.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)  # [nW, N, N]


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, mask=None):
        """x: [nW*B, N, C]; mask: [nW, N, N] or None."""
        ws, nh = self.window_size, self.num_heads
        N = ws * ws
        head_dim = self.dim // nh
        qkv = nn.Dense(self.dim * 3, use_bias=True, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(-1, N, 3, nh, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # [B_, nh, N, hd]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * (head_dim ** -0.5)

        # relative position bias
        rpb = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), nh),
        )
        coords = np.stack(
            np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
        ).reshape(2, -1)
        rel = coords[:, :, None] - coords[:, None, :]
        rel = (rel + ws - 1).transpose(1, 2, 0)
        rel_idx = rel[..., 0] * (2 * ws - 1) + rel[..., 1]  # [N, N]
        bias = rpb[jnp.asarray(rel_idx.reshape(-1))].reshape(N, N, nh)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(-1, nW, nh, N, N) + jnp.asarray(
                mask
            )[None, :, None].astype(attn.dtype)
            attn = attn.reshape(-1, nh, N, N)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v.astype(self.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(-1, N, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, C] (H, W already padded to window multiples)."""
        B, H, W, C = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = _shift_attn_mask(H, W, ws, self.shift)
        else:
            mask = None
        wins = _window_partition(x.astype(self.dtype), ws)
        wins = WindowAttention(self.dim, self.num_heads, ws, self.dtype,
                               name="attn")(wins, mask)
        x = _window_reverse(wins, ws, B, H, W)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x.astype(shortcut.dtype)

        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(y.astype(self.dtype))
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(y)
        return x + y.astype(x.dtype)


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    out_indices: Tuple[int, ...] = (1, 2, 3)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, H, W, 3] → list of NHWC features for out_indices
        (stage i has stride 4·2^i, dim embed·2^i)."""
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="patch_embed")(x.astype(self.dtype))
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="patch_norm")(x)

        outs = []
        dim = self.embed_dim
        for stage, depth in enumerate(self.depths):
            B, H, W, C = x.shape
            ws = self.window_size
            pad_h = (-H) % ws
            pad_w = (-W) % ws
            xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            for blk in range(depth):
                xp = SwinBlock(
                    dim, self.num_heads[stage], ws,
                    shift=0 if blk % 2 == 0 else ws // 2,
                    dtype=self.dtype, name=f"stage{stage}_block{blk}",
                )(xp)
            x = xp[:, :H, :W]
            if stage in self.out_indices:
                outs.append(
                    nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                 name=f"out_norm{stage}")(x)
                )
            if stage < len(self.depths) - 1:
                # patch merging: 2x2 concat → LN → linear to 2C
                ph, pw = (-x.shape[1]) % 2, (-x.shape[2]) % 2
                xm = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
                B2, H2, W2, _ = xm.shape
                xm = xm.reshape(B2, H2 // 2, 2, W2 // 2, 2, C)
                xm = xm.transpose(0, 1, 3, 2, 4, 5).reshape(
                    B2, H2 // 2, W2 // 2, 4 * C
                )
                xm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                  name=f"merge_norm{stage}")(xm)
                x = nn.Dense(2 * dim, use_bias=False, dtype=self.dtype,
                             name=f"merge_reduction{stage}")(xm)
                dim *= 2
        return outs
