"""Round-4b: 'product-gather' subm formulation microbench.

Idea: the MXU is idle (mb_pieces: the conv's GEMMs cost 0.13 ms) while
gathers+selects dominate. So precompute, per table row r and view v,
P[v,r] = win_v(r) @ W_o for ALL 9 offsets in one dense GEMM
([S+1, 6C] x [6C, 9*4co] per view), then the conv is 8 narrow monotone
row-gathers of 4co lanes (idx = 3*nbr+case — case folds into the index,
select disappears) + an 8-way add. Gather traffic per row drops 10C -> 4co
bytes (640 -> 256 B at s2) and the select_n pass (58 ms/step, PROFILE r4)
vanishes. Center offset is a lane slice of P0 (no gather).

Variants:
  prod      — production `_subm_impl`
  pg_slice  — P interleaved [3(S+1), 9*4co]; gathers read 4co-lane slices
  pg_t      — + transpose to compact per-offset [3(S+1), 4co] tables first

Run: python experiments/mb_subm_r4b.py [stage ...]
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
    _band_weight,
    _subm_impl,
    _w_zyx,
    _window_table,
    rowgather,
    zmask,
)

_OFFS8 = tuple(o for o in range(9) if o != 4)


def _pg(feats, occ_bits, ck, ch, vd, w, tables, C, co, dt, compact):
    B, S, FC = feats.shape
    tab = _window_table(feats, occ_bits, ck, ch, vd, False, dt)
    Sp1 = tab.shape[1]
    W6 = _band_weight(_w_zyx(w), C, co, 6, 1, dt)        # [9, 6C, 4co]
    Wcat = jnp.swapaxes(W6, 0, 1).reshape(6 * C, 9 * 4 * co)
    Wcat2 = Wcat[4 * C:6 * C]                            # case-2 rows
    outs = []
    for b in range(B):
        p0 = jnp.einsum("rw,wk->rk", tab[b, :, 0:6 * C], Wcat,
                        preferred_element_type=dt)
        p1 = jnp.einsum("rw,wk->rk", tab[b, :, 4 * C:10 * C], Wcat,
                        preferred_element_type=dt)
        p2 = jnp.einsum("rw,wk->rk", tab[b, :, 0:2 * C], Wcat2,
                        preferred_element_type=dt)
        i3 = tables.nbr_idx[b] * 3 + tables.nbr_case[b]  # [9, S]
        if compact:
            # [9, 3(S+1), 4co] per-offset compact tables
            P = jnp.stack([p0, p1, p2], 1).reshape(
                3 * Sp1, 9, 4 * co).transpose(1, 0, 2)
            acc = p0[:S, 4 * 4 * co:5 * 4 * co]
            for j, o in enumerate(_OFFS8):
                acc = acc + rowgather(P[o], i3[o])
        else:
            P = jnp.stack([p0, p1, p2], 1).reshape(3 * Sp1, 9 * 4 * co)
            acc = p0[:S, 4 * 4 * co:5 * 4 * co]
            for j, o in enumerate(_OFFS8):
                acc = acc + rowgather(
                    P[:, o * 4 * co:(o + 1) * 4 * co], i3[o])
        outs.append(acc)
    return zmask(occ_bits, co, jnp.stack(outs))


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

        variants = {
            "prod": prod,
            "pg_slice": lambda a, c: _pg(a[0] + c.astype(dt) * 0, a[1],
                                         a[2], a[3], a[4], a[5], a[6],
                                         C, co, dt, False),
            "pg_t": lambda a, c: _pg(a[0] + c.astype(dt) * 0, a[1],
                                     a[2], a[3], a[4], a[5], a[6],
                                     C, co, dt, True),
        }
        ref = None
        for vn, op in variants.items():
            t0 = time.time()
            try:
                f = jax.jit(scan_op(op))
                t = timed(f, *args, ovh=ovh)
                y = jax.jit(lambda a, o=op: o(a, jnp.float32(0.0)))(args)
                if ref is None:
                    ref, derr = y, 0.0
                else:
                    derr = float(jnp.max(jnp.abs(
                        y.astype(jnp.float32) - ref.astype(jnp.float32))))
                print(f"  {name} {vn:9s}: {t*1e3:7.2f} ms/conv "
                      f"(maxerr {derr:.2e}, compile {time.time()-t0:.0f}s)",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {name} {vn:9s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
