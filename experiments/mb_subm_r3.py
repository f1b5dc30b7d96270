"""Round-3 subm-conv formulation microbench on v5e at encoder stage shapes.

Variants (all compute the same masked conv output; semantics validated
separately by the oracle tests once a winner is productionized):

  prod        — production `_subm_impl` (gather 10C rows + case select)
  caseview    — production with UNIDISTILL_SUBM_CASE_VIEW=1 (3-view table)
  zp14_2d     — zero-prefixed [S+1, 14C] table; ONE lax.gather with 2-D
                start indices (row, lane=case-offset), slice (1, 6C): the
                case select disappears into the gather
  zp14_3row   — same table viewed as [(S+1)·7, 2C]; gather slices (3, 2C)
                at sub-row starts (7·row + {2,4,0}[case])

Run: python experiments/mb_subm_r3.py [stage ...]
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
    _subm_impl,
    _w_zyx,
    _window_table,
    zmask,
)

CHUNK = 4


def _zp14_table(feats, occ_bits, ck, ch, vd, C, dt):
    tab = _window_table(feats, occ_bits, ck, ch, vd, False, dt)
    B, Sp1, _ = tab.shape
    return jnp.concatenate(
        [jnp.zeros((B, Sp1, 4 * C), dt), tab], axis=2
    )  # [B, S+1, 14C]


def zp14_2d(feats, occ_bits, ck, ch, vd, w, tables, C, co, dt):
    B, S, FC = feats.shape
    tab14 = _zp14_table(feats, occ_bits, ck, ch, vd, C, dt)
    W6 = _band_weight(_w_zyx(w), C, co, 6, 1, dt)
    offs = np.asarray(_OFFS8)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,),
        start_index_map=(0, 1),
    )
    accs = []
    for b in range(B):
        rows = tables.nbr_idx[b][offs].reshape(-1)
        case = tables.nbr_case[b][offs].reshape(-1)
        lane = jnp.where(case == 0, 4 * C,
                         jnp.where(case == 1, 8 * C, 0))
        starts = jnp.stack([rows, lane], axis=1)
        win = jax.lax.gather(
            tab14[b], starts, dn, slice_sizes=(1, 6 * C),
            mode=jax.lax.GatherScatterMode.CLIP,
        ).reshape(8, S, 6 * C)
        accs.append(jnp.einsum("osw,owk->osk", win, W6[offs],
                               preferred_element_type=dt).sum(0))
    acc = jnp.stack(accs)
    gc = tab14[:, :S, 4 * C:10 * C].reshape(B * S, 6 * C)
    acc = acc + jnp.einsum("bw,wk->bk", gc, W6[4],
                           preferred_element_type=dt).reshape(B, S, 4 * co)
    return zmask(occ_bits, co, acc)


def zp14_3row(feats, occ_bits, ck, ch, vd, w, tables, C, co, dt):
    B, S, FC = feats.shape
    tab14 = _zp14_table(feats, occ_bits, ck, ch, vd, C, dt)
    Sp1 = tab14.shape[1]
    sub = tab14.reshape(B, Sp1 * 7, 2 * C)
    W6 = _band_weight(_w_zyx(w), C, co, 6, 1, dt)
    offs = np.asarray(_OFFS8)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    accs = []
    for b in range(B):
        rows = tables.nbr_idx[b][offs].reshape(-1)
        case = tables.nbr_case[b][offs].reshape(-1)
        dsub = jnp.where(case == 0, 2, jnp.where(case == 1, 4, 0))
        starts = jnp.stack([rows * 7 + dsub, jnp.zeros_like(rows)], axis=1)
        win = jax.lax.gather(
            sub[b], starts, dn, slice_sizes=(3, 2 * C),
            mode=jax.lax.GatherScatterMode.CLIP,
        ).reshape(8, S, 6 * C)
        accs.append(jnp.einsum("osw,owk->osk", win, W6[offs],
                               preferred_element_type=dt).sum(0))
    acc = jnp.stack(accs)
    gc = tab14[:, :S, 4 * C:10 * C].reshape(B * S, 6 * C)
    acc = acc + jnp.einsum("bw,wk->bk", gc, W6[4],
                           preferred_element_type=dt).reshape(B, S, 4 * co)
    return zmask(occ_bits, co, acc)


def view2(feats, occ_bits, ck, ch, vd, w, tables, C, co, dt):
    """2-view table [S+1, 2, 6C] (v0 = lanes 0:6C, v1 = 4C:10C) + stacked
    weight [W6 | W2']: case0/2 gather v0, case1 gathers v1; case2's window
    ([zeros 4C | row 0:2C]) is W2' = W6 shifted 4C applied to v0. Select
    happens on the 8·co OUTPUT lanes instead of the 6C window."""
    from unidistill_tpu.ops.sparse_conv_chunked import rowgather

    B, S, FC = feats.shape
    tab = _window_table(feats, occ_bits, ck, ch, vd, False, dt)
    Sp1 = tab.shape[1]
    v0 = tab[:, :, 0:6 * C]
    v1 = tab[:, :, 4 * C:10 * C]
    tab2 = jnp.stack([v0, v1], axis=2).reshape(B, Sp1 * 2, 6 * C)
    W6 = _band_weight(_w_zyx(w), C, co, 6, 1, dt)       # [9, 6C, 4co]
    # W2'[o, l, :] = W6[o, l+4C, :] for l < 2C else 0
    W2p = jnp.concatenate(
        [W6[:, 4 * C:6 * C], jnp.zeros((9, 4 * C, 4 * co), dt)], axis=1
    )
    Wst = jnp.concatenate([W6, W2p], axis=2)            # [9, 6C, 8co]
    offs = np.asarray(_OFFS8)
    accs = []
    for b in range(B):
        case = tables.nbr_case[b][offs]
        i2 = (tables.nbr_idx[b][offs] * 2 + (case == 1)).reshape(-1)
        win = rowgather(tab2[b], i2).reshape(8, S, 6 * C)
        y = jnp.einsum("osw,owk->osk", win, Wst[offs],
                       preferred_element_type=dt)       # [8, S, 8co]
        y = jnp.where((case == 2)[..., None], y[..., 4 * co:],
                      y[..., :4 * co])
        accs.append(y.sum(0))
    acc = jnp.stack(accs)
    gc = tab[:, :S, 0:6 * C].reshape(B * S, 6 * C)
    acc = acc + jnp.einsum("bw,wk->bk", gc, W6[4],
                           preferred_element_type=dt).reshape(B, S, 4 * co)
    return zmask(occ_bits, co, acc)


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

        variants = {}

        def prod(a, c, mode):
            os.environ["UNIDISTILL_SUBM_PATH"] = mode
            try:
                return _subm_impl(
                    a[0] + c.astype(dt) * 0, a[1], a[2], a[3], a[4],
                    a[5], None, a[6], "bfloat16")
            finally:
                os.environ.pop("UNIDISTILL_SUBM_PATH", None)

        variants["prod_select"] = lambda a, c: prod(a, c, "select")
        variants["caseview"] = lambda a, c: prod(a, c, "case_view")
        variants["fold"] = lambda a, c: prod(a, c, "fold")
        variants["zp14_2d"] = lambda a, c: zp14_2d(
            a[0] + c.astype(dt) * 0, a[1], a[2], a[3], a[4], a[5], a[6],
            C, co, dt)
        variants["zp14_3row"] = lambda a, c: zp14_3row(
            a[0] + c.astype(dt) * 0, a[1], a[2], a[3], a[4], a[5], a[6],
            C, co, dt)
        variants["view2"] = lambda a, c: view2(
            a[0] + c.astype(dt) * 0, a[1], a[2], a[3], a[4], a[5], a[6],
            C, co, dt)

        for vn, op in variants.items():
            t0 = time.time()
            try:
                f = jax.jit(scan_op(op))
                t = timed(f, *args, ovh=ovh)
                print(f"  {name} {vn:12s}: {t*1e3:7.2f} ms/conv "
                      f"(compile {time.time()-t0:.0f}s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {name} {vn:12s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
