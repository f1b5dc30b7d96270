"""Row-WIDTH cliff in the TPU gather fast path + the split-gather fix.

RESULT (run 2026-08-20 on the attached v5e, logs/r5_split_gather.log,
recorded in PROFILE.md r5): the width sweep found an ALTERNATION by
width mod 128 elements (mod-0 widths 10-19 ns/row, others 1.7-6), not a
monotone cliff; the split fix LOSES at realistic planner tables (s3
28.46 vs 19.76 ms/conv, down3 53.46 vs 24.54 — the second gather re-pays
the index pass and the barrier'd half-tables cost a copy). Superseded by
the pad-stride test (mb_pad_gather.py), which also lost — see PROFILE.

Measured fact that motivates this (experiments/mb_gather_dtype.py, r5):
at the production monotone index regime, bf16 rows of 320 ELEMENTS gather
at ~1.9 ns/row but 640-element rows fall to ~15 ns/row — and the cliff is
about row elements/bytes (int8 640-elt rows are equally slow, f32 320-elt
rows are equally slow), NOT the table's total size. Production s3 subm
rows are 10C = 640 elt (1280 B, slow regime) and the down3 13-z rows are
416 elt (832 B, borderline); the r4 attribution's "gathers run at 2x the
computed floor" is (at least partly) this — the floor arithmetic
extrapolated the s2-width rate to the wider stages.

Fix under test: gather the SAME rows as 2-3 lane-split pieces, each under
the cliff, from `optimization_barrier`-materialized half-tables, then
concatenate; selects/GEMMs unchanged. The second/third gather re-pays the
index cost, so the win only exists if the cliff factor (~8x) dominates the
extra index passes (~2-3x) — hence measure, at REALISTIC planner tables
(same harness as mb_subm_banded.py).

Parts:
  1. width sweep (synthetic monotone streams) — locate the cliff;
  2. s3 subm conv A/B: prod `_subm_impl` vs split2 (5C + 5C = 320+320 elt);
  3. down3 A/B: prod `_down2_v2_impl` vs split2 (7C + 6C = 224+192 elt);
     down2 rows are 13C = 208 elt (already under the cliff — control only).

Run: python experiments/mb_split_gather.py [sweep s3 down3 down2 s2]
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


def t_op(name, op, *args, ovh=0.0):
    try:
        f = jax.jit(scan_op(op))
        t0 = time.time()
        ms = timed(f, *args, ovh=ovh) * 1e3
        print(f"  {name:34s}: {ms:8.2f} ms (compile {time.time()-t0:.0f}s)",
              flush=True)
        return ms
    except Exception as e:
        print(f"  {name:34s}: FAIL {type(e).__name__}: {str(e)[:130]}",
              flush=True)
        return None


def sweep(ovh):
    """bf16 gather ns/row vs row width, monotone streams, 57345-row table."""
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
    for W in (128, 192, 256, 320, 384, 448, 512, 640, 832):
        tab = jnp.asarray(
            (rng.standard_normal((S + 1, W)) * 0.1).astype(np.float32)
        ).astype(jnp.bfloat16)

        def gth(a, c):
            tt, ii = a
            return tt[ii + jnp.where(c < -1.0, 1, 0).astype(jnp.int32)]

        ms = t_op(f"W={W:4d} elt ({2*W:5d} B)", gth, tab, idxj, ovh=ovh)
        if ms is not None:
            print(f"      -> {ms*1e6/nidx:5.2f} ns/row", flush=True)


def subm_split(feats, occ_bits, ck, ch, vd, w, tables, C, co, dt, cuts):
    """`_subm_impl` select path with the row gather lane-split at `cuts`
    (e.g. (5,) -> pieces [0:5C], [5C:10C]); identical math."""
    Bb, S, FC = feats.shape
    tab = _window_table(feats, occ_bits, ck, ch, vd, False, dt)
    W6 = _band_weight(_w_zyx(w).astype(dt), C, co, 6, 1, dt)
    bounds = (0,) + tuple(c * C for c in cuts) + (10 * C,)
    pieces = [
        jax.lax.optimization_barrier(tab[:, :, a:b])
        for a, b in zip(bounds[:-1], bounds[1:])
    ]
    offs = np.asarray(_OFFS8)
    accs = []
    for b in range(Bb):
        i = tables.nbr_idx[b][offs].reshape(-1)
        g = jnp.concatenate([rowgather(p[b], i) for p in pieces], -1)
        win = _extract_subm_window(
            g, tables.nbr_case[b][offs].reshape(-1), C
        ).reshape(8, S, 6 * C)
        accs.append(jnp.einsum("osw,owk->osk", win, W6[offs],
                               preferred_element_type=dt).sum(0))
    acc = jnp.stack(accs)
    return zmask(occ_bits, co, _center(tab, W6, Bb, S, C, co, dt, acc))


def bench_subm(stage, cuts, ovh):
    feats, occ_bits, ck, ch, vd, tables, w, S, C = \
        realistic_stage_inputs(stage)
    co = C
    dt = jnp.bfloat16
    print(f"[{stage}] S={S} C={C} row 10C={10*C} elt "
          f"({20*C} B); split at {cuts}", flush=True)

    ref = _subm_impl(feats, occ_bits, ck, ch, vd, w, None, tables,
                     "bfloat16")
    new = subm_split(feats, occ_bits, ck, ch, vd, w, tables, C, co, dt,
                     cuts)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - new.astype(jnp.float32))))
    print(f"  maxerr split vs prod: {err:.2e}", flush=True)

    def prod(a, c):
        return _subm_impl(a[0] + c.astype(dt) * 0, a[1], a[2], a[3], a[4],
                          a[5], None, a[6], "bfloat16")

    def split(a, c):
        return subm_split(a[0] + c.astype(dt) * 0, a[1], a[2], a[3], a[4],
                          a[5], a[6], C, co, dt, cuts)

    args = (feats, occ_bits, ck, ch, vd, w, tables)
    t_op("prod (_subm_impl select/auto)", prod, *args, ovh=ovh)
    t_op(f"split{len(cuts)+1} {cuts}", split, *args, ovh=ovh)


def down_split(feats, occ_in, ck, ch, vd, w, sites, occ_out, C, co, dt,
               cuts):
    """`_down2_v2_impl` with the 13-z row gather lane-split at `cuts`."""
    Bb, S, FC = feats.shape
    tab = _window_table(feats, occ_in, ck, ch, vd, False, dt, rowz=13)
    W9 = _band_weight(_w_zyx(w).astype(dt), C, co, 9, 2, dt)
    bounds = (0,) + tuple(c * C for c in cuts) + (13 * C,)
    pieces = [
        jax.lax.optimization_barrier(tab[:, :, a:b])
        for a, b in zip(bounds[:-1], bounds[1:])
    ]
    S2 = sites.colkey.shape[1]
    accs = []
    for b in range(Bb):
        i = sites.nbr_a[b].reshape(-1)
        g = jnp.concatenate([rowgather(p[b], i) for p in pieces], -1)
        win = _extract_down_window(
            g, sites.case_a[b].reshape(-1), C
        ).reshape(9, S2, 9 * C)
        accs.append(jnp.einsum("osw,owk->osk", win, W9,
                               preferred_element_type=dt).sum(0))
    acc = jnp.stack(accs)
    return zmask(occ_out, co, acc)


def bench_down(which, cuts, ovh):
    feats, occ_in, ck, ch, vd, sites, occ_out, w = \
        realistic_down_inputs(which)
    C = {"down2": 16, "down3": 32}[which]
    co = {"down2": 32, "down3": 64}[which]
    dt = jnp.bfloat16
    print(f"[{which}] row 13C={13*C} elt ({26*C} B); split at {cuts}",
          flush=True)

    ref = _down2_v2_impl(feats, occ_in, ck, ch, vd, w, None, sites,
                         occ_out, "bfloat16")
    new = down_split(feats, occ_in, ck, ch, vd, w, sites, occ_out, C, co,
                     dt, cuts)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - new.astype(jnp.float32))))
    print(f"  maxerr split vs prod: {err:.2e}", flush=True)

    def prod(a, c):
        return _down2_v2_impl(a[0] + c.astype(dt) * 0, a[1], a[2], a[3],
                              a[4], a[5], None, a[6], a[7], "bfloat16")

    def split(a, c):
        return down_split(a[0] + c.astype(dt) * 0, a[1], a[2], a[3], a[4],
                          a[5], a[6], a[7], C, co, dt, cuts)

    args = (feats, occ_in, ck, ch, vd, w, sites, occ_out)
    t_op("prod (_down2_v2_impl)", prod, *args, ovh=ovh)
    t_op(f"split{len(cuts)+1} {cuts}", split, *args, ovh=ovh)


def main():
    ovh = overhead()
    print(f"overhead {ovh*1e3:.1f} ms", flush=True)
    which = set(sys.argv[1:]) or {"sweep", "s3", "down3", "down2"}
    if "sweep" in which:
        sweep(ovh)
    if "s3" in which:
        bench_subm("s3", (5,), ovh)
    if "s2" in which:
        bench_subm("s2", (5,), ovh)
    if "down3" in which:
        bench_down("down3", (7,), ovh)
    if "down2" in which:
        bench_down("down2", (7,), ovh)


if __name__ == "__main__":
    main()
