"""Pallas fused select+GEMM for the subm conv offsets path (r5 lever —
MEASURED AND RULED OUT: fused loses 2.2-4.4x to the production select
path at s0/s2/s3; chip A/B ledger at experiments/logs/r5_pallas_ab.log,
analysis in PROFILE.md "Round-5 Pallas fused select+GEMM").

The r4/r5 rule-outs closed the XLA-level case-layout space: the production
path is gather(10C rows) -> 3-way case select (select_n, ~92 ms/step) ->
per-offset skinny GEMM. XLA materializes the select output to HBM between
the two (visible as select_n + fusion round-trips in the trace), costing
~600 MB/conv/sample of avoidable traffic at s2.

This experiment keeps XLA's row gather (its monotone-stream rate of
~1.4 ns/row is hardware-gather territory Pallas per-row DMAs cannot touch;
PROFILE.md r1/r4) and replaces select+GEMM with ONE Pallas kernel that
streams the gathered [8, S, 10C] rows through VMEM, does the case select
as static lane slices + jnp.where in-registers, and feeds the MXU
directly, accumulating all 8 offsets into a revisited f32 out block.

Run: python experiments/mb_pallas_fused.py [smoke] [s0 s2 s3]
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mb_flat_subm import overhead, scan_op, timed
from mb_subm_banded import realistic_stage_inputs
from unidistill_tpu.ops.sparse_conv_chunked import (
    _OFFS8,
    _band_weight,
    _subm_impl,
    _w_zyx,
    _window_table,
    rowgather,
    zmask,
)

TS = 512  # sites per tile; all production caps are multiples of 512


def _fused_kernel(C: int, co: int, g_ref, oh_ref, w_ref, out_ref):
    # case arrives as a one-hot bf16 [TS, 4] block (sublane=TS): an int32
    # [1,1,TS] block violates the (8,128) tiling rule, and any per-lane case
    # layout can't broadcast against the [TS, 10C] rows without a relayout.
    # Multiply-add select instead of where: 3 VPU passes over [TS, 6C].
    o = pl.program_id(2)
    blk = g_ref[0, 0]                       # [TS, 10C] bf16
    oh = oh_ref[0, 0]                       # [TS, 4] bf16 one-hot(case)
    w0 = blk[:, 0:6 * C]
    w1 = blk[:, 4 * C:10 * C]
    w2 = jnp.concatenate(
        [jnp.zeros((blk.shape[0], 4 * C), blk.dtype), blk[:, 0:2 * C]],
        axis=1,
    )
    win = oh[:, 0:1] * w0 + oh[:, 1:2] * w1 + oh[:, 2:3] * w2
    prod = jnp.dot(win, w_ref[o], preferred_element_type=jnp.float32)

    @pl.when(o == 0)
    def _():
        out_ref[0] = prod

    @pl.when(o > 0)
    def _():
        out_ref[0] = out_ref[0] + prod


def fused_offsets(g, case_oh, W8, C, co):
    """g [B, 8, S, 10C] bf16, case_oh [B, 8, S, 4] bf16 one-hot,
    W8 [8, 6C, 4co] bf16 -> [B, S, 4co] f32 = sum_o select(case_o, g_o) @ W8[o]."""
    B, O, S, _ = g.shape
    assert S % TS == 0, S
    kern = functools.partial(_fused_kernel, C, co)
    grid = (B, S // TS, O)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, TS, 10 * C), lambda b, t, o: (b, o, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TS, 4), lambda b, t, o: (b, o, t, 0),
                         memory_space=pltpu.VMEM),
            # whole weight stack resident in VMEM (constant block across the
            # grid — DMA'd once); the kernel picks w_ref[o]
            pl.BlockSpec((8, 6 * C, 4 * co), lambda b, t, o: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TS, 4 * co), lambda b, t, o: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, 4 * co), jnp.float32),
    )(g, case_oh, W8)


def fused_subm(feats, occ_bits, ck, ch, vd, w, tables, C, co, dt):
    """_subm_impl with the offsets path = XLA gather + Pallas select+GEMM."""
    B, S, FC = feats.shape
    tab = _window_table(feats, occ_bits, ck, ch, vd, False, dt)
    W6 = _band_weight(_w_zyx(w), C, co, 6, 1, dt)
    offs = np.asarray(_OFFS8)
    gs, cs = [], []
    for b in range(B):
        idx = tables.nbr_idx[b][offs].reshape(-1)
        gs.append(rowgather(tab[b], idx).reshape(8, S, 10 * C))
        cs.append(tables.nbr_case[b][offs])
    g = jnp.stack(gs)                               # [B, 8, S, 10C]
    # one-hot bf16 [B, 8, S, 4] — in production this is a host-planner
    # output (nbr_case is host numpy, built once per frame per stage); in
    # this harness nbr_case arrives traced (scan perturbation), so build it
    # in-graph — a [B,8,S]->[B,8,S,4] cast, ~3 MB, noise vs the select pass
    case = jnp.stack(cs).astype(jnp.int32)          # [B, 8, S]
    oh = (case[..., None] == jnp.arange(4, dtype=jnp.int32)).astype(dt)
    acc = fused_offsets(g, oh, W6[offs].astype(dt), C, co).astype(dt)
    gc = tab[:, :S, 0:6 * C].reshape(B * S, 6 * C)
    acc = acc + jnp.einsum("bw,wk->bk", gc, W6[4],
                           preferred_element_type=dt).reshape(B, S, 4 * co)
    return zmask(occ_bits, co, acc)


def smoke():
    def k(x_ref, y_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0 + y_ref[:]

    x = jnp.ones((256, 256), jnp.bfloat16)
    y = jnp.full((256, 256), 3.0, jnp.bfloat16)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((256, 256), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, y)
    print("pallas smoke:", float(out[0, 0]), "(want 5.0)", flush=True)


def run_one(stage, variant):
    """One (stage, variant) measurement in its own process, printing a single
    RESULT line. The axon relay occasionally loses an in-flight RPC, leaving
    the client futex-blocked forever (r5: two hangs, one mid-compile, one on
    the first tiny jit) — per-pair subprocesses under `timeout` bound the
    damage to one measurement."""
    ovh = overhead()
    t0 = time.time()
    feats, occ_bits, ck, ch, vd, tb, w, S, C = realistic_stage_inputs(stage)
    co = C
    dt = jnp.bfloat16
    print(f"{stage}: S={S} C={C} ovh {ovh*1e3:.1f} ms "
          f"(tables {time.time()-t0:.0f}s)", flush=True)
    argz = (feats, occ_bits, ck, ch, vd, w, tb)

    def prod(a, c):
        return _subm_impl(a[0] + c.astype(dt) * 0, a[1], a[2], a[3],
                          a[4], a[5], None, a[6], "bfloat16")

    def fused(a, c):
        return fused_subm(a[0] + c.astype(dt) * 0, a[1], a[2], a[3],
                          a[4], a[5], a[6], C, co, dt)

    op = {"prod": prod, "fused": fused}[variant]
    t0 = time.time()
    f = jax.jit(scan_op(op))
    t = timed(f, *argz, ovh=ovh)
    # correctness: fused vs prod on the same inputs, single application
    derr = 0.0
    if variant == "fused":
        y = jax.jit(lambda a: fused(a, jnp.float32(0.0)))(argz)
        r = jax.jit(lambda a: prod(a, jnp.float32(0.0)))(argz)
        derr = float(jnp.max(jnp.abs(
            y.astype(jnp.float32) - r.astype(jnp.float32))))
    print(f"RESULT {stage} {variant}: {t*1e3:7.2f} ms/conv "
          f"(maxerr {derr:.2e}, total {time.time()-t0:.0f}s)", flush=True)


def main():
    args = sys.argv[1:] or ["smoke"]
    if args[0] == "one":
        return run_one(args[1], args[2])
    if "smoke" in args:
        smoke()


if __name__ == "__main__":
    main()
