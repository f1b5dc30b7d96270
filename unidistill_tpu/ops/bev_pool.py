"""Camera frustum → BEV scatter-add pooling (the `voxel_pooling_ext` CUDA
extension's TPU-native replacement).

Contract (from the reference call sites, lss_fpn.py:13-79, :314-316):
  forward(geom_xyz int32 [B, N, 3], feats [B, N, C], voxel_num (nx, ny, nz))
    -> [B, ny, nx, C] where every point whose (x, y, z) lies inside the voxel
  grid scatter-ADDS its feature into BEV cell (y, x); out-of-grid points are
  dropped. Backward gathers the output gradient back to contributing points
  (zero for dropped points) — exactly what differentiating the scatter gives,
  so no custom VJP is required: `jnp.add`-scatter autodiffs to that gather.

Two paths:
  * `bev_pool`: materialized features (reference-shaped), one scatter-add.
  * `bev_pool_outer`: the fused BEVPoolv2-style entry point — takes depth
    [B, N_cam, D, fH, fW] and context [B, N_cam, fH, fW, C] and pools
    depth⊗context WITHOUT materializing the [B, N, C] outer product by
    scatter-adding depth-weighted context per (cam, d) slab. This keeps HBM
    traffic at O(D·fHW + fHW·C + out) instead of O(D·fHW·C).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _linear_index(geom_xyz: jnp.ndarray, nx: int, ny: int, nz: int) -> jnp.ndarray:
    """[..., 3] int coords -> flat BEV index y*nx+x, or nx*ny (dump slot) if invalid."""
    x, y, z = geom_xyz[..., 0], geom_xyz[..., 1], geom_xyz[..., 2]
    valid = (x >= 0) & (x < nx) & (y >= 0) & (y < ny) & (z >= 0) & (z < nz)
    return jnp.where(valid, y * nx + x, nx * ny)


def bev_pool(
    geom_xyz: jnp.ndarray, feats: jnp.ndarray, voxel_num: tuple
) -> jnp.ndarray:
    """Scatter-add pooled BEV map.

    Args:
      geom_xyz: [B, N, 3] int32 voxel coords (x, y, z).
      feats: [B, N, C].
      voxel_num: (nx, ny, nz) static ints.

    Returns: [B, ny, nx, C] (NHWC; the reference returns NCHW).
    """
    nx, ny, nz = voxel_num
    idx = _linear_index(geom_xyz, nx, ny, nz)  # [B, N]

    def scatter_one(i, f):
        out = jnp.zeros((nx * ny + 1, f.shape[-1]), dtype=f.dtype)
        out = out.at[i].add(f, mode="drop")
        return out[: nx * ny]

    out = jax.vmap(scatter_one)(idx, feats)
    return out.reshape(feats.shape[0], ny, nx, feats.shape[-1])


def bev_pool_outer(
    geom_xyz: jnp.ndarray,
    depth: jnp.ndarray,
    context: jnp.ndarray,
    voxel_num: tuple,
    scan_slabs: bool = False,
) -> jnp.ndarray:
    """Fused depth⊗context BEV pooling (BEVPoolv2 formulation).

    Args:
      geom_xyz: [B, NC, D, fH, fW, 3] int32 voxel coords per frustum point.
      depth: [B, NC, D, fH, fW] softmaxed depth distribution.
      context: [B, NC, fH, fW, C] per-pixel context features.
      voxel_num: (nx, ny, nz).

    Returns: [B, ny, nx, C].

    The scatter target index depends on (cam, d, h, w) but the feature is
    depth[cam, d, h, w] * context[cam, h, w]. One big scatter-add over all
    N = NC·D·fH·fW points is ~5× faster on TPU than a scan of per-depth-slab
    scatters (measured: 32 ms vs 158 ms for the nuScenes camera shapes at
    batch 4); XLA fuses the depth×context multiply into the scatter operand.
    A `scan_slabs=True` fallback bounds live memory at one depth slab for
    memory-constrained configs.
    """
    B, NC, D, fH, fW = depth.shape
    C = context.shape[-1]
    nx, ny, nz = voxel_num
    idx = _linear_index(geom_xyz, nx, ny, nz)  # [B, NC, D, fH, fW]

    if not scan_slabs:
        w = (depth[..., None] * context[:, :, None]).reshape(B, -1, C)

        def scatter_one(i, f):
            acc = jnp.zeros((nx * ny + 1, C), dtype=f.dtype)
            return acc.at[i].add(f, mode="drop")[: nx * ny]

        out = jax.vmap(scatter_one)(idx.reshape(B, -1), w)
        return out.reshape(B, ny, nx, C)

    def per_batch(idx_b, depth_b, ctx_b):
        # scan over depth slabs to bound live memory at [NC*fH*fW, C]
        def body(acc, slab):
            idx_s, depth_s = slab  # [NC, fH, fW]
            w = depth_s[..., None] * ctx_b  # [NC, fH, fW, C]
            acc = acc.at[idx_s.reshape(-1)].add(
                w.reshape(-1, C), mode="drop"
            )
            return acc, None

        init = jnp.zeros((nx * ny + 1, C), dtype=ctx_b.dtype)
        acc, _ = jax.lax.scan(
            body,
            init,
            (jnp.moveaxis(idx_b, 1, 0), jnp.moveaxis(depth_b, 1, 0)),
        )
        return acc[: nx * ny]

    out = jax.vmap(per_batch)(idx, depth, context)
    return out.reshape(B, ny, nx, C)


# ---------------------------------------------------------------------------
# Pallas fused scatter kernel
# ---------------------------------------------------------------------------
#
# XLA's scatter-add on TPU costs ~65 ns per index regardless of row width
# (measured: 31 ms for the nuScenes camera shapes at batch 4 — the eval
# step's single largest op). A Pallas kernel holding the BEV accumulator
# VMEM-resident and streaming point chunks does the same scatter at ~4 ns
# per point (measured: ~8 ms for all 1.9M points at batch 4, max rel err
# 2e-7 vs the XLA scatter). Per point it reads the cell index, ray id and
# depth weight from SMEM, gathers the ray's context row from a VMEM-resident
# table, scales and row-accumulates:
#
#   out[cell[p], :] += depth[p] * ctx[ray[p], :]
#
# so the [NPTS, C] depth⊗context product is never materialized in HBM at
# all (BEVPoolv2's motivation, taken one step further than `bev_pool_outer`).

_POOL_CHUNK = 8192
# channel tile: one full-C pass per point when VMEM allows (the accumulator
# plus context table at C=256 is ~38 MB of the ~100 MB VMEM budget); point
# visits dominate kernel time, so fewer C-passes beat smaller blocks.
_CC_MAX = 256


def _rays_np(NC: int, D: int, fH: int, fW: int) -> np.ndarray:
    """Static ray id (camera, h, w) per flattened [NC·D·fH·fW] point."""
    n = np.arange(NC, dtype=np.int32)[:, None, None, None]
    hw = np.arange(fH * fW, dtype=np.int32).reshape(1, 1, fH, fW)
    return np.broadcast_to(n * (fH * fW) + hw, (NC, D, fH, fW)).reshape(-1)


_POOL_UNROLL = 32  # 22 ms -> 7.8 ms at batch 4: lets Mosaic pipeline the
#                    independent dynamic-row read-modify-writes


def _pool_kernel(idx_ref, ray_ref, depth_ref, ctx_ref, out_ref):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(q, _):
        base = q * _POOL_UNROLL
        for u in range(_POOL_UNROLL):
            p = base + u
            out_ref[0, idx_ref[p], :] += (
                depth_ref[p] * ctx_ref[0, ray_ref[p], :]
            )
        return 0

    jax.lax.fori_loop(0, _POOL_CHUNK // _POOL_UNROLL, body, 0)


def _bev_pool_scatter_pallas(idx, rays, depth_flat, context, ncells: int,
                             interpret: bool = False, dump_rows: int = 1):
    """One fused scatter pass.

    idx / rays / depth_flat: [B, NPT] (NPT a multiple of _POOL_CHUNK; idx
    rows ≥ ncells are dumped), context: [B, NR, C] f32 with C % 128 == 0.
    Returns [B, ncells, C] f32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, NPT = idx.shape
    NR, C = context.shape[1], context.shape[2]
    cc = C if C <= _CC_MAX else _CC_MAX
    nrows = ncells + dump_rows
    nrows += (-nrows) % 8  # sublane-aligned
    pad_r = (-NR) % 8
    if pad_r:
        context = jnp.pad(context, ((0, 0), (0, pad_r), (0, 0)))

    # point streams flattened to 1-D: Mosaic requires 2-D SMEM blocks to be
    # (8k, 128m)-tiled, but 1-D blocks of any size are fine
    nk = NPT // _POOL_CHUNK
    idx = idx.reshape(B * NPT)
    rays = rays.reshape(B * NPT)
    depth_flat = depth_flat.reshape(B * NPT)

    grid = (B, C // cc, nk)
    out = pl.pallas_call(
        _pool_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_POOL_CHUNK,), lambda b, c, k: (b * nk + k,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_POOL_CHUNK,), lambda b, c, k: (b * nk + k,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_POOL_CHUNK,), lambda b, c, k: (b * nk + k,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, NR + pad_r, cc), lambda b, c, k: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nrows, cc), lambda b, c, k: (b, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nrows, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(idx, rays, depth_flat, context)
    return out[:, :ncells]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bev_pool_outer_pallas(geom_xyz, depth, context, voxel_num):
    """Fused depth⊗context BEV pooling, Pallas forward (TPU only).

    Same contract as `bev_pool_outer`; the backward pass reuses the XLA
    formulation's autodiff (scatter-add's VJP is a gather — no scatter in
    the backward graph).
    """
    return _pool_fwd_impl(geom_xyz, depth, context, voxel_num)


_DUMP_ROWS = 64  # invalid points spread over 64 dump rows: funneling them
#                  all to ONE row serializes the kernel's RMW pipeline on
#                  read-after-write hazards (measured 2× slowdown when most
#                  of the frustum is out of range)


def _pool_fwd_impl(geom_xyz, depth, context, voxel_num):
    B, NC, D, fH, fW = depth.shape
    C = context.shape[-1]
    nx, ny, nz = voxel_num
    ncells = nx * ny
    idx = _linear_index(geom_xyz, nx, ny, nz).reshape(B, -1)  # invalid → ncells
    NP = idx.shape[1]
    pad_p = (-NP) % _POOL_CHUNK
    rays = np.broadcast_to(_rays_np(NC, D, fH, fW), (B, NP))
    rays = np.ascontiguousarray(
        np.pad(rays, ((0, 0), (0, pad_p))) if pad_p else rays
    )
    if pad_p:
        idx = jnp.pad(idx, ((0, 0), (0, pad_p)), constant_values=ncells)
        dflat = jnp.pad(
            depth.reshape(B, NP).astype(jnp.float32), ((0, 0), (0, pad_p))
        )
    else:
        dflat = depth.reshape(B, NP).astype(jnp.float32)
    spread = jnp.asarray(
        np.arange(NP + pad_p, dtype=np.int32) % _DUMP_ROWS
    )
    idx = jnp.where(idx >= ncells, ncells + spread[None, :], idx)
    ctx = context.reshape(B, NC * fH * fW, C).astype(jnp.float32)
    out = _bev_pool_scatter_pallas(
        idx, jnp.asarray(rays), dflat, ctx, ncells, dump_rows=_DUMP_ROWS
    )
    return out.reshape(B, ny, nx, C)


def _pool_fwd(geom_xyz, depth, context, voxel_num):
    return _pool_fwd_impl(geom_xyz, depth, context, voxel_num), (
        geom_xyz, depth, context,
    )


def _pool_bwd(voxel_num, res, g):
    geom_xyz, depth, context = res
    _, vjp = jax.vjp(
        lambda d, c: bev_pool_outer(geom_xyz, d, c, voxel_num), depth, context
    )
    gd, gc = vjp(g)
    return jnp.zeros_like(geom_xyz), gd, gc


bev_pool_outer_pallas.defvjp(_pool_fwd, _pool_bwd)
