"""Row-stride ALIASING in the TPU gather path + the pad-stride fix.

RESULT (run 2026-08-20 on the attached v5e, logs/r5_pad_gather_run*.log,
recorded in PROFILE.md r5): the fine sweep confirms the mod-128 aliasing
rule (mod-0 widths 13-20 ns/row; mod-32/64/96 widths 3.5-5.8). But the
pad fix is a no-op unforced (XLA elides gather-of-pad back to the
original stride) and LOSES once an optimization_barrier forces the
padded layout (s3 16.29 vs prod 14.96 ms/conv; down3 21.43 vs 20.00):
realistic planner streams are near-sequential and never excite the
aliasing, so there was nothing to reclaim. Axis closed.

mb_split_gather.py's width sweep found the slow/fast pattern is not a
monotone cliff but an alternation by row width mod 128 elements (bf16):

    W elt : 128   192   256   320   384   448   512   640   832
    ns/row: 9.8   1.7   11.3  1.8   14.4  3.6   16.0  19.3  6.2
    mod128: 0     64    0     64    0     64    0     0     64

Widths that are multiples of 128 lanes (power-of-two byte strides) run
10-19 ns/row; widths == 64 (mod 128) run 1.7-6 — a set-conflict aliasing
signature, not a capacity effect. Production consequences: s2 subm rows
(10C = 320 elt) sit in the fast class by luck; s3 subm rows (640 elt) and
the table's other wide rows sit in the slow class.

Fix under test: PAD the window-table row stride by +C zeros so the row
width lands in the fast class (s3 subm 10C=640 -> 11C=704; down3 13-z
13C=416 (mod128=32) -> 14C=448), gather the padded rows, slice back
before the unchanged select/GEMM. One gather (unlike the split-gather
attempt, which lost by re-paying the index pass), +10% gather bytes,
same math.

Parts:
  1. fine sweep over mod-128 classes {0, 32, 64, 96} x {384..832};
  2. s3 subm A/B at realistic planner tables: prod vs pad-to-11C;
  3. down3 A/B: prod vs pad-to-14C.

Run: python experiments/mb_pad_gather.py [sweep s3 down3 s2]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

from mb_flat_subm import overhead, scan_op, timed
from mb_split_gather import t_op
from mb_subm_banded import (
    _center,
    realistic_down_inputs,
    realistic_stage_inputs,
)
from unidistill_tpu.ops.sparse_conv_chunked import (
    _OFFS8,
    _band_weight,
    _down2_v2_impl,
    _extract_down_window,
    _extract_subm_window,
    _subm_impl,
    _w_zyx,
    _window_table,
    rowgather,
    zmask,
)


def sweep(ovh):
    S = 57344
    rng = np.random.default_rng(0)
    base = np.arange(S)
    idx = np.stack([
        np.where(rng.random(S) < 0.12, S,
                 np.clip(base + rng.integers(-1500, 1500, S), 0, S - 1))
        for _ in range(8)
    ])
    idxj = jnp.asarray(np.sort(idx, axis=1).reshape(-1).astype(np.int32))
    nidx = idxj.shape[0]
    print(f"[sweep] {nidx/1e6:.2f}M rows/pass, table {S+1} rows", flush=True)
    for W in (384, 416, 448, 480, 512, 544, 576, 608, 640, 672, 704, 736,
              768, 832):
        tab = jnp.asarray(
            (rng.standard_normal((S + 1, W)) * 0.1).astype(np.float32)
        ).astype(jnp.bfloat16)

        def gth(a, c):
            tt, ii = a
            return tt[ii + jnp.where(c < -1.0, 1, 0).astype(jnp.int32)]

        ms = t_op(f"W={W:4d} elt mod128={W % 128:3d}", gth, tab, idxj,
                  ovh=ovh)
        if ms is not None:
            print(f"      -> {ms*1e6/nidx:5.2f} ns/row", flush=True)


def subm_pad(feats, occ_bits, ck, ch, vd, w, tables, C, co, dt, pad_c):
    """`_subm_impl` select path with the window-table row stride padded by
    pad_c*C zero lanes (gather-side only; select/GEMM math unchanged)."""
    Bb, S, FC = feats.shape
    tab = _window_table(feats, occ_bits, ck, ch, vd, False, dt)
    W6 = _band_weight(_w_zyx(w).astype(dt), C, co, 6, 1, dt)
    # barrier: without it XLA rewrites gather-of-pad to read the original
    # 10C-stride buffer and the padded physical layout never exists (first
    # run of this file: pad +1C == prod to 0.3 ms)
    tabp = jax.lax.optimization_barrier(
        jnp.pad(tab, ((0, 0), (0, 0), (0, pad_c * C))))
    offs = np.asarray(_OFFS8)
    accs = []
    for b in range(Bb):
        i = tables.nbr_idx[b][offs].reshape(-1)
        g = rowgather(tabp[b], i)[:, :10 * C]
        win = _extract_subm_window(
            g, tables.nbr_case[b][offs].reshape(-1), C
        ).reshape(8, S, 6 * C)
        accs.append(jnp.einsum("osw,owk->osk", win, W6[offs],
                               preferred_element_type=dt).sum(0))
    acc = jnp.stack(accs)
    return zmask(occ_bits, co, _center(tab, W6, Bb, S, C, co, dt, acc))


def bench_subm(stage, pad_c, ovh):
    feats, occ_bits, ck, ch, vd, tables, w, S, C = \
        realistic_stage_inputs(stage)
    co = C
    dt = jnp.bfloat16
    print(f"[{stage}] S={S} C={C} row 10C={10*C} elt -> padded "
          f"{(10+pad_c)*C} elt", flush=True)

    ref = _subm_impl(feats, occ_bits, ck, ch, vd, w, None, tables,
                     "bfloat16")
    new = subm_pad(feats, occ_bits, ck, ch, vd, w, tables, C, co, dt,
                   pad_c)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - new.astype(jnp.float32))))
    print(f"  maxerr pad vs prod: {err:.2e}", flush=True)

    def prod(a, c):
        return _subm_impl(a[0] + c.astype(dt) * 0, a[1], a[2], a[3], a[4],
                          a[5], None, a[6], "bfloat16")

    def pad(a, c):
        return subm_pad(a[0] + c.astype(dt) * 0, a[1], a[2], a[3], a[4],
                        a[5], a[6], C, co, dt, pad_c)

    args = (feats, occ_bits, ck, ch, vd, w, tables)
    t_op("prod (_subm_impl select/auto)", prod, *args, ovh=ovh)
    t_op(f"pad +{pad_c}C", pad, *args, ovh=ovh)


def down_pad(feats, occ_in, ck, ch, vd, w, sites, occ_out, C, co, dt,
             pad_c):
    Bb, S, FC = feats.shape
    tab = _window_table(feats, occ_in, ck, ch, vd, False, dt, rowz=13)
    W9 = _band_weight(_w_zyx(w).astype(dt), C, co, 9, 2, dt)
    tabp = jax.lax.optimization_barrier(
        jnp.pad(tab, ((0, 0), (0, 0), (0, pad_c * C))))
    S2 = sites.colkey.shape[1]
    accs = []
    for b in range(Bb):
        i = sites.nbr_a[b].reshape(-1)
        g = rowgather(tabp[b], i)[:, :13 * C]
        win = _extract_down_window(
            g, sites.case_a[b].reshape(-1), C
        ).reshape(9, S2, 9 * C)
        accs.append(jnp.einsum("osw,owk->osk", win, W9,
                               preferred_element_type=dt).sum(0))
    acc = jnp.stack(accs)
    return zmask(occ_out, co, acc)


def bench_down(which, pad_c, ovh):
    feats, occ_in, ck, ch, vd, sites, occ_out, w = \
        realistic_down_inputs(which)
    C = {"down2": 16, "down3": 32}[which]
    co = {"down2": 32, "down3": 64}[which]
    dt = jnp.bfloat16
    print(f"[{which}] row 13C={13*C} elt -> padded {(13+pad_c)*C} elt",
          flush=True)

    ref = _down2_v2_impl(feats, occ_in, ck, ch, vd, w, None, sites,
                         occ_out, "bfloat16")
    new = down_pad(feats, occ_in, ck, ch, vd, w, sites, occ_out, C, co,
                   dt, pad_c)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - new.astype(jnp.float32))))
    print(f"  maxerr pad vs prod: {err:.2e}", flush=True)

    def prod(a, c):
        return _down2_v2_impl(a[0] + c.astype(dt) * 0, a[1], a[2], a[3],
                              a[4], a[5], None, a[6], a[7], "bfloat16")

    def pad(a, c):
        return down_pad(a[0] + c.astype(dt) * 0, a[1], a[2], a[3], a[4],
                        a[5], a[6], a[7], C, co, dt, pad_c)

    args = (feats, occ_in, ck, ch, vd, w, sites, occ_out)
    t_op("prod (_down2_v2_impl)", prod, *args, ovh=ovh)
    t_op(f"pad +{pad_c}C", pad, *args, ovh=ovh)


def main():
    ovh = overhead()
    print(f"overhead {ovh*1e3:.1f} ms", flush=True)
    which = set(sys.argv[1:]) or {"sweep", "s3", "down3"}
    if "sweep" in which:
        sweep(ovh)
    if "s3" in which:
        bench_subm("s3", 1, ovh)
    if "s2" in which:
        bench_subm("s2", 2, ovh)
    if "down3" in which:
        bench_down("down3", 1, ovh)
    if "down2" in which:
        bench_down("down2", 1, ovh)


if __name__ == "__main__":
    main()
