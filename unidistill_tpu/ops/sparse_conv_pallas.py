"""Pallas key-match sparse convolution — a table-free formulation of the
submanifold 3D convs of the LiDAR middle encoder (ref spconv `SubMConv3d`,
layers/blocks_3d/det3d/spconv_backbone.py:10-58).

Motivation: XLA row gathers cost ~2 ns per index on v5e regardless of row
width (measured, PROFILE.md), so the gather-GEMM formulation pays
27·V·B ≈ 17M indices → ~35 ms *per conv* at nuScenes stage-0 shapes, plus
~65 ms/stage of neighbor-table construction. This kernel removes the
per-voxel gather (and the entire neighbor-table machinery) by exploiting the
sorted-key invariant of `SparseTensor`:

  * Voxel rows are sorted by xy-major linearized key (ops/sparse_conv.py
    `linear_key`), so for a kernel tap with key offset Δ the neighbors of a
    contiguous block of output rows live in a contiguous row WINDOW — found
    with a handful of `searchsorted` calls per block (22k queries per conv
    instead of 17M).
  * Inside the kernel, each (block, xy-tap) DMAs its key/feature window into
    VMEM and matches neighbors by INTEGER KEY EQUALITY: the [block, window]
    one-hot mask — built on the VPU — IS the gather, contracted against the
    feature window on the MXU. A missing neighbor simply matches nothing and
    contributes zero, which is exactly submanifold semantics.
  * Out-of-grid taps (x±1 wrapping to another row, z beyond depth) are
    masked with coordinate bounds decoded from the key on the fly.

Window semantics: the window covers the key range of the block shifted by Δ.
Neighbors beyond `window` rows past the window start are dropped — this can
only happen when voxel density grows by more than window/block between a
block and its shifted range (4× headroom by default; `subm_window_overflow`
measures it, and tests assert 0 on realistic clouds).

Gradients: `subm_conv_keymatch` carries a custom VJP. d/d·features is the
same kernel with reversed taps and transposed weights (the neighbor relation
is symmetric under Δ → -Δ); d/d·weight reuses the XLA gather-GEMM (one-time
cost per training step, off the eval path).

MEASURED STATUS (PROFILE.md): numerically correct at nuScenes s0 scale on
v5e, but per-invocation fixed costs (~20 µs DMA + ~27 µs compute) flatten
the cost surface at ~70-90 ms/conv across block/window configs — slower
end-to-end than the gather-GEMM path with per-stage shared tap tables,
which is what `layers/lidar_encoder.py` uses. Kept as a tested alternative
formulation; revisit if Mosaic grows pipelined BlockSpec windows or a
native vector gather.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# xy-offset order: o = 3*(dy+1) + (dx+1); z handled densely inside
_XY_OFFS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _key_delta(dy: int, dx: int, dz: int, D: int, W: int) -> int:
    return (dy * W + dx) * D + dz


def _tap_window_start(keys, kmin, delta, V, window):
    """Aligned window start for one xy-offset — the SINGLE definition shared
    by the kernel launcher and the overflow diagnostic (they must agree or
    the diagnostic measures a different window than the kernel reads).

    128-row alignment: Mosaic requires dynamic memref slices on the minor
    (lane-tiled) dim to be 128-divisible."""
    q = kmin + delta
    ws = jax.vmap(lambda k, qq: jnp.searchsorted(k, qq, method="sort"))(
        keys, q
    ).astype(jnp.int32)
    return jnp.minimum(jnp.maximum(ws - 1, 0) & ~jnp.int32(127), V - window)


def window_starts(
    keys: jnp.ndarray, spatial_shape: Tuple[int, int, int],
    block: int, window: int,
):
    """Per-(sample, block, xy-offset) aligned window starts.

    keys: [B, V] sorted (BIG = D·H·W on padding). Returns a FLAT
    [B·NB·9] int32 array in (sample, block, offset) order — flattened for
    SMEM scalar prefetch (a trailing dim of 9/16 would be lane-padded to
    128 and blow the 1 MB SMEM budget at nuScenes NB); the kernel indexes
    it as ws[(b·NB + i)·9 + o]."""
    D, H, W = spatial_shape
    B, V = keys.shape
    nb = V // block
    kmin = keys[:, ::block]  # [B, NB] first key of each block
    starts = [
        _tap_window_start(keys, kmin, _key_delta(dy, dx, -1, D, W), V, window)
        for dy, dx in _XY_OFFS
    ]
    return jnp.stack(starts, axis=-1).reshape(-1)


def subm_window_overflow(
    keys: jnp.ndarray, spatial_shape: Tuple[int, int, int],
    block: int, window: int,
) -> jnp.ndarray:
    """Max rows by which any (block, tap) window undershoots its true
    neighbor range (0 = exact). Diagnostic / test helper.

    PESSIMISTIC: ranges use each block's last key INCLUDING BIG padding
    rows, so blocks straddling the valid/pad boundary inflate the metric
    (padding keys need no neighbors). A nonzero value does not by itself
    mean dropped neighbors — cross-check against the gather-GEMM oracle,
    as the tests do."""
    D, H, W = spatial_shape
    B, V = keys.shape
    kmin = keys[:, ::block]
    kmax = keys[:, block - 1::block]
    worst = jnp.int32(0)
    for dy, dx in _XY_OFFS:
        hi = kmax + _key_delta(dy, dx, 1, D, W)
        we = jax.vmap(
            lambda k, q: jnp.searchsorted(k, q, side="right", method="sort")
        )(keys, hi)
        ws = _tap_window_start(
            keys, kmin, _key_delta(dy, dx, -1, D, W), V, window
        )
        worst = jnp.maximum(worst, jnp.max(we - (ws + window)))
    return jnp.maximum(worst, 0)


def _kernel(ws_ref, keys_hbm, feats_hbm, bkeys_ref, w_ref, out_ref,
            wk_s, wf_s, sems, *, D, H, W, block, window, cin, cout, big, nb):
    b = pl.program_id(0)
    i = pl.program_id(1)

    bk = bkeys_ref[0, 0, :].reshape(block, 1)  # [block, 1] int32
    z = bk % D
    col = bk // D
    y = col // W
    x = col % W
    valid = bk < big

    # issue ALL window DMAs before computing: the kernel is latency-bound on
    # the small window copies, so overlap all 18 transfers with each other
    # (and with the first offsets' compute)
    copies = []
    for o in range(9):
        ws = pl.multiple_of(ws_ref[(b * nb + i) * 9 + o], 128)
        ck = pltpu.make_async_copy(
            keys_hbm.at[b, :, pl.ds(ws, window)], wk_s.at[o], sems.at[o, 0]
        )
        cf = pltpu.make_async_copy(
            feats_hbm.at[b, :, pl.ds(ws, window)], wf_s.at[o], sems.at[o, 1]
        )
        ck.start()
        cf.start()
        copies.append((ck, cf))

    # Per-invocation dot count is the cost driver (small-matmul pipeline
    # overhead dominates): fuse the 3 dz taps into ONE [3·block, window]
    # mask + ONE dot per xy offset, and ONE final [block, 27C] GEMM.
    xparts = []
    for o, (dy, dx) in enumerate(_XY_OFFS):
        ck, cf = copies[o]
        ck.wait()
        cf.wait()
        wk = wk_s[o]  # [1, window]
        inb_xy = valid & (y + dy >= 0) & (y + dy < H) & (x + dx >= 0) & (x + dx < W)
        qs, inbs = [], []
        for dz in (-1, 0, 1):
            qs.append(bk + _key_delta(dy, dx, dz, D, W))
            inbs.append(inb_xy & (z + dz >= 0) & (z + dz < D))
        q3 = jnp.concatenate(qs, axis=0)  # [3·block, 1]
        inb3 = jnp.concatenate(inbs, axis=0)
        mask3 = ((q3 == wk) & inb3).astype(jnp.bfloat16)  # [3·block, window]
        # wf_s[o] is [C, window] (features transposed so the DMA slices the
        # 128-aligned minor dim); contract both operands on "window"
        x3r = jax.lax.dot_general(
            mask3, wf_s[o], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [3·block, C] in dz-major order
        # [3·block, C] (dz-major rows) -> [block, 3C]: static sublane slices
        # + lane concat (a reshape/transpose here is an unsupported Mosaic
        # relayout)
        x3 = jnp.concatenate(
            [x3r[dz * block:(dz + 1) * block, :] for dz in range(3)], axis=-1
        )
        xparts.append(x3)
    xcat = jnp.concatenate(xparts, axis=-1).astype(jnp.bfloat16)  # [block, 27C]
    acc = jnp.dot(xcat, w_ref[:, :], preferred_element_type=jnp.float32)
    out_ref[0, :, :] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5)
)
def subm_conv_keymatch(
    features: jnp.ndarray,  # [B, V, C] bf16/f32, zero on invalid rows
    keys: jnp.ndarray,  # [B, V] int32 sorted, BIG pad
    weight: jnp.ndarray,  # [27, Cin, Cout], taps z-major (_kernel_offsets order)
    spatial_shape: Tuple[int, int, int],
    block: int = 256,
    window: int = 1024,
) -> jnp.ndarray:
    """Submanifold 3×3×3 conv on the sorted voxel set. Returns [B, V, Cout]
    (invalid rows produce garbage — mask with `valid` outside, as the
    gather-GEMM path does).

    Caller obligation (ADVICE r1): neighbors outside a (block, tap) window
    are silently dropped — callers MUST size `window` so that
    `subm_window_overflow(keys, spatial_shape, block, window) == 0` for
    their voxel distribution, or verify it in a debug pass; denser-than-
    expected clouds otherwise yield silently wrong convolutions."""
    return _subm_fwd_impl(features, keys, weight, spatial_shape, block, window)


def _subm_fwd_impl(features, keys, weight, spatial_shape, block, window):
    D, H, W = spatial_shape
    B, V, cin = features.shape
    cout = weight.shape[-1]
    block = min(block, V)
    window = min(window, V)
    assert V % block == 0 and V % 128 == 0 and window % 128 == 0, (
        V, block, window)
    nb = V // block
    big = D * H * W

    ws = window_starts(keys, spatial_shape, block, window)
    # weight [27, Cin, Cout] z-major (kz, ky, kx) -> [9(xy), 3*Cin, Cout]
    # with rows ordered [dz=-1 | dz=0 | dz=+1] to match the kernel's concat
    w9 = (
        weight.reshape(3, 3, 3, cin, cout)
        .transpose(1, 2, 0, 3, 4)
        .reshape(27 * cin, cout)  # xy-major, then dz, then Cin
        .astype(jnp.bfloat16)
    )
    keys2d = keys[:, None, :]  # [B, 1, V]
    # [B, C, V]: window DMAs slice the minor (lane) dim, which must be
    # 128-aligned; with [B, V, C] the C-extent slice (<128) is rejected
    ft = features.astype(jnp.bfloat16).transpose(0, 2, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # keys2d (windows via DMA)
            pl.BlockSpec(memory_space=pl.ANY),  # features (windows via DMA)
            pl.BlockSpec(
                (1, 1, block), lambda b, i, ws_ref: (b, 0, i),
                memory_space=pltpu.VMEM,
            ),  # block keys
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights (whole)
        ],
        out_specs=pl.BlockSpec(
            (1, block, cout), lambda b, i, ws_ref: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((9, 1, window), jnp.int32),
            pltpu.VMEM((9, cin, window), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((9, 2)),
        ],
    )
    kern = functools.partial(
        _kernel, D=D, H=H, W=W, block=block, window=window,
        cin=cin, cout=cout, big=big, nb=nb,
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, V, cout), features.dtype),
        grid_spec=grid_spec,
        interpret=jax.devices()[0].platform == "cpu",
    )(ws, keys2d, ft, keys2d, w9)
    return out


def _subm_fwd(features, keys, weight, spatial_shape, block, window):
    out = _subm_fwd_impl(features, keys, weight, spatial_shape, block, window)
    return out, (features, keys, weight)


def _subm_bwd(spatial_shape, block, window, res, g):
    features, keys, weight = res
    # d/d features: transposed conv = same kernel, taps reversed (offset
    # negation == reversing the z-major tap order) and Cin/Cout swapped.
    w_rev = jnp.flip(weight, axis=0).transpose(0, 2, 1)  # [27, Cout, Cin]
    dfeat = _subm_fwd_impl(
        g.astype(features.dtype), keys, w_rev, spatial_shape, block, window
    )
    # d/d weight via the XLA gather formulation: dW[k] = X_k^T @ g where
    # X_k = features gathered at tap k. Off the eval path; per-tap gathers.
    from unidistill_tpu.ops.sparse_conv import (  # local import: cycle-free
        SparseTensor,
        build_subm_rules_batched,
    )

    D, H, W = spatial_shape
    big = D * H * W
    valid = keys < big
    coords = jnp.stack(
        [keys % D, (keys // D) // W, (keys // D) % W], axis=-1
    ).astype(jnp.int32)
    coords = jnp.where(valid[..., None], coords, -1)
    st = SparseTensor(features, coords, keys, valid)
    idx, take = build_subm_rules_batched(st, spatial_shape, 3)
    B = features.shape[0]
    dws = []
    for b in range(B):
        fz = jnp.concatenate(
            [features[b], jnp.zeros((1, features.shape[-1]), features.dtype)]
        )
        nf = fz[jnp.where(take[b], idx[b], features.shape[1]).reshape(-1)]
        nf = nf.reshape(27, features.shape[1], features.shape[-1])
        dws.append(
            jnp.einsum(
                "kvc,vo->kco", nf.astype(jnp.float32), g[b].astype(jnp.float32)
            )
        )
    dweight = sum(dws).astype(weight.dtype)
    return dfeat, None, dweight


subm_conv_keymatch.defvjp(_subm_fwd, _subm_bwd)
