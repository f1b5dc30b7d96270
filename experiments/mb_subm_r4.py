"""Round-4 subm-conv formulation microbench (v5e, encoder stage shapes).

The r4 eval trace (PROFILE.md) splits the 432 ms step into ~133 ms gathers,
~92 ms `select_n`, ~40 ms skinny GEMMs: the levers are (a) killing the
post-gather case select, (b) collapsing the 8 per-offset [S,6C]x[6C,4co]
einsums into one MXU-friendly [S,48C]x[48C,4co] GEMM via s-major gather
index order, (c) keeping every gathered table under the ~80 MB cliff.

Variants (same masked-conv math; winners get productionized + oracle-tested):

  prod       — production `_subm_impl` (auto case-view/select)
  smaj       — s-major 10C gather + case select + ONE [S,48C] GEMM
  smaj_cv    — s-major 3-view case-view gather + ONE [S,48C] GEMM
               (table 18C·S: over the cliff at s2/s3 — included to measure
               how much the single GEMM recovers)
  v2side     — 2-view 6C table (12C·S — under the cliff at s2) + s-major
               gather; case2 rows miss-redirect to the zero row, their
               single live z (neighbor z0 at window pos 5 — see
               sparse_conv_chunked._extract_subm_window) comes from a side
               gather of a [S+1, 2C] table + second skinny GEMM
  sorted8    — per-offset 10C gathers with indices_are_sorted=True (nbr_idx
               is monotone-ish per offset) + select + 8-batch einsum

Run: python experiments/mb_subm_r4.py [stage ...]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from experiments.mb_flat_subm import make_inputs, overhead, scan_op, timed
from unidistill_tpu.ops.sparse_conv_chunked import (
    _OFFS8,
    _band_weight,
    _case_view,
    _extract_subm_window,
    _subm_impl,
    _w_zyx,
    _window_table,
    rowgather,
    zmask,
)

CHUNK = 4


def _center(tab, W6, B, S, C, co, dt, acc):
    gc = tab[:, :S, 0:6 * C].reshape(B * S, 6 * C)
    return acc + jnp.einsum("bw,wk->bk", gc, W6[4],
                            preferred_element_type=dt).reshape(B, S, 4 * co)


def smaj(feats, occ_bits, ck, ch, vd, w, tables, C, co, dt):
    B, S, FC = feats.shape
    tab = _window_table(feats, occ_bits, ck, ch, vd, False, dt)
    W6 = _band_weight(_w_zyx(w), C, co, 6, 1, dt)
    offs = np.asarray(_OFFS8)
    Wcat = W6[offs].reshape(8 * 6 * C, 4 * co)
    accs = []
    for b in range(B):
        idx = tables.nbr_idx[b][offs].T.reshape(-1)      # s-major [S*8]
        case = tables.nbr_case[b][offs].T.reshape(-1)
        g = rowgather(tab[b], idx)
        win = _extract_subm_window(g, case, C).reshape(S, 8 * 6 * C)
        accs.append(jnp.einsum("sw,wk->sk", win, Wcat,
                               preferred_element_type=dt))
    acc = jnp.stack(accs)
    return zmask(occ_bits, co, _center(tab, W6, B, S, C, co, dt, acc))


def smaj_cv(feats, occ_bits, ck, ch, vd, w, tables, C, co, dt):
    B, S, FC = feats.shape
    tab = _window_table(feats, occ_bits, ck, ch, vd, False, dt)
    tabv = _case_view(tab, B, C)
    W6 = _band_weight(_w_zyx(w), C, co, 6, 1, dt)
    offs = np.asarray(_OFFS8)
    Wcat = W6[offs].reshape(8 * 6 * C, 4 * co)
    accs = []
    for b in range(B):
        i3 = (tables.nbr_idx[b][offs] * 3
              + tables.nbr_case[b][offs]).T.reshape(-1)
        win = rowgather(tabv[b], i3).reshape(S, 8 * 6 * C)
        accs.append(jnp.einsum("sw,wk->sk", win, Wcat,
                               preferred_element_type=dt))
    acc = jnp.stack(accs)
    return zmask(occ_bits, co, _center(tab, W6, B, S, C, co, dt, acc))


def v2side(feats, occ_bits, ck, ch, vd, w, tables, C, co, dt):
    B, S, FC = feats.shape
    tab = _window_table(feats, occ_bits, ck, ch, vd, False, dt)
    Sp1 = tab.shape[1]
    v0 = tab[:, :, 0:6 * C]
    v1 = tab[:, :, 4 * C:10 * C]
    tab2 = jnp.stack([v0, v1], axis=2).reshape(B, Sp1 * 2, 6 * C)
    # case-2 window = [zeros 4C | row lanes 0:2C] — only window pos 5
    # (neighbor z0) is ever live; side table = first 2C lanes per row
    tside = tab[:, :, 0:2 * C]
    W6 = _band_weight(_w_zyx(w), C, co, 6, 1, dt)
    offs = np.asarray(_OFFS8)
    Wcat = W6[offs].reshape(8 * 6 * C, 4 * co)
    Wside = W6[offs][:, 4 * C:6 * C].reshape(8 * 2 * C, 4 * co)
    accs = []
    for b in range(B):
        idx = tables.nbr_idx[b][offs].T                   # [S, 8]
        case = tables.nbr_case[b][offs].T
        i2 = jnp.where(case == 2, 2 * Sp1 - 2,            # zero row (v0 of S)
                       idx * 2 + (case == 1)).reshape(-1)
        win = rowgather(tab2[b], i2).reshape(S, 8 * 6 * C)
        acc = jnp.einsum("sw,wk->sk", win, Wcat, preferred_element_type=dt)
        i_s = jnp.where(case == 2, idx, Sp1 - 1).reshape(-1)
        ws = rowgather(tside[b], i_s).reshape(S, 8 * 2 * C)
        acc = acc + jnp.einsum("sw,wk->sk", ws, Wside,
                               preferred_element_type=dt)
        accs.append(acc)
    acc = jnp.stack(accs)
    return zmask(occ_bits, co, _center(tab, W6, B, S, C, co, dt, acc))


def sorted8(feats, occ_bits, ck, ch, vd, w, tables, C, co, dt):
    B, S, FC = feats.shape
    tab = _window_table(feats, occ_bits, ck, ch, vd, False, dt)
    W6 = _band_weight(_w_zyx(w), C, co, 6, 1, dt)
    offs = np.asarray(_OFFS8)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    accs = []
    for b in range(B):
        wins = []
        for j, o in enumerate(offs):
            g = jax.lax.gather(
                tab[b], tables.nbr_idx[b][o][:, None], dn,
                slice_sizes=(1, tab.shape[2]),
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                indices_are_sorted=True,
            )
            wins.append(_extract_subm_window(g, tables.nbr_case[b][o], C))
        win = jnp.stack(wins)
        accs.append(jnp.einsum("osw,owk->osk", win, W6[offs],
                               preferred_element_type=dt).sum(0))
    acc = jnp.stack(accs)
    return zmask(occ_bits, co, _center(tab, W6, B, S, C, co, dt, acc))


SHAPES = {
    "s0": (4, 131072, 16, 16),
    "s2": (4, 98304, 32, 32),
    "s3": (4, 65536, 64, 64),
}


def main():
    ovh = overhead()
    print(f"overhead {ovh*1e3:.1f} ms", flush=True)
    stages = sys.argv[1:] or list(SHAPES)
    for name in stages:
        B, S, C, co = SHAPES[name]
        feats, occ_bits, ck, ch, vd, tb, w = make_inputs(B, S, C, co)
        args = (feats, occ_bits, ck, ch, vd, w, tb)
        dt = jnp.bfloat16

        def prod(a, c):
            return _subm_impl(a[0] + c.astype(dt) * 0, a[1], a[2], a[3],
                              a[4], a[5], None, a[6], "bfloat16")

        variants = {"prod": prod}
        for vn, fn in (("smaj", smaj), ("smaj_cv", smaj_cv),
                       ("v2side", v2side), ("sorted8", sorted8)):
            variants[vn] = (lambda a, c, f=fn: f(
                a[0] + c.astype(dt) * 0, a[1], a[2], a[3], a[4], a[5], a[6],
                C, co, dt))

        ref = None
        for vn, op in variants.items():
            t0 = time.time()
            try:
                f = jax.jit(scan_op(op))
                t = timed(f, *args, ovh=ovh)
                # numeric agreement vs prod (same math)
                y = jax.jit(lambda a: variants[vn](a, jnp.float32(0.0)))(args)
                if ref is None:
                    ref = y
                    derr = 0.0
                else:
                    derr = float(jnp.max(jnp.abs(
                        y.astype(jnp.float32) - ref.astype(jnp.float32))))
                print(f"  {name} {vn:10s}: {t*1e3:7.2f} ms/conv "
                      f"(maxerr {derr:.2e}, compile {time.time()-t0:.0f}s)",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {name} {vn:10s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
