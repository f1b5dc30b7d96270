"""Piece-level timing of the flattened subm conv at the s2 shape: where do
the ~73 ms/conv go? (window-table build / case-view build / gather / GEMM)"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from unidistill_tpu.ops.sparse_conv_chunked import ROWZ, _window_table
from experiments.mb_flat_subm import make_inputs, overhead, scan_op, timed

B, S, C, co = 4, 98304, 32, 32


def main():
    ovh = overhead()
    print(f"overhead {ovh*1e3:.1f} ms", flush=True)
    feats, occ_bits, ck, ch, vd, tb, w = make_inputs(B, S, C, co)

    def t(name, op, *args):
        try:
            f = jax.jit(scan_op(op))
            t0 = time.time()
            ms = timed(f, *args, ovh=ovh) * 1e3
            print(f"  {name:28s}: {ms:7.2f} ms (compile {time.time()-t0:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"  {name:28s}: FAIL {type(e).__name__}: {str(e)[:140]}",
                  flush=True)

    # 1. window table build (current shift-based, [B,S+1,10C])
    def wt(a, c):
        f2 = a[0] + c.astype(jnp.bfloat16) * 0
        return _window_table(f2, a[1], a[2], a[3], a[4], False, jnp.bfloat16)

    t("window_table", wt, feats, occ_bits, ck, ch, vd)

    # 2. case-view build given a materialized table
    tab = _window_table(feats, occ_bits, ck, ch, vd, False, jnp.bfloat16)

    def cvb(a, c):
        tb2 = a[0] + c.astype(jnp.bfloat16) * 0
        tt = tb2.reshape(B, -1, ROWZ, C)
        v0 = tt[:, :, 0:6]
        v1 = tt[:, :, 4:10]
        v2 = jnp.concatenate([jnp.zeros_like(tt[:, :, 0:4]), tt[:, :, 0:2]], 2)
        return jnp.stack([v0, v1, v2], 2).reshape(-1, 6 * C)

    t("case_view", cvb, tab)

    # 3. gathers at several row widths / paddings
    rng = np.random.default_rng(0)
    NIDX = 8 * B * S
    for rows, width, name in (
        (B * (S + 1) * 3, 192, "gather 192elt (6C bf16)"),
        (B * (S + 1) * 3, 256, "gather 256elt (padded)"),
        (B * (S + 1) * 3, 128, "gather 128elt (1 tile)"),
        (B * (S + 1), 320, "gather 320elt (10C)"),
    ):
        tabg = jnp.asarray(
            rng.standard_normal((rows, width)).astype(np.float32)
        ).astype(jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, rows, NIDX).astype(np.int32))

        def gth(a, c):
            tt, ii = a
            return tt[ii + jnp.where(c < -1.0, 1, 0).astype(jnp.int32)]

        t(f"{name} x{NIDX//1_000_000}.1M", gth, tabg, idx)

    # 4. the batched GEMM [8, BS, 192] x [8, 192, 128]
    g = jnp.asarray(rng.standard_normal((8, B * S, 192)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    W6 = jnp.asarray(rng.standard_normal((8, 192, 128)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    def gemm(a, c):
        gg, ww = a
        gg = gg + c.astype(jnp.bfloat16) * 0
        return jnp.einsum("obw,owk->obk", gg, ww,
                          preferred_element_type=jnp.bfloat16).sum(0)

    t("batched GEMM + o-reduce", gemm, g, W6)

    # 5. flat-minor window table: src as [B, S, 4C] flat rows, shifts +
    #    minor-dim concat straight to [B, S+1, 10C]
    srcf = feats  # already flat [B, S, 4C], masked
    ckj, chj = ck, ch

    def wt_flat(a, c):
        x, ckey, chk = a
        x = x + c.astype(jnp.bfloat16) * 0
        pad = jnp.zeros_like(x[:, :1])

        def shift(t, k):
            if k == 1:
                return jnp.concatenate([t[:, 1:], jnp.zeros_like(t[:, :1])], 1)
            if k == 2:
                return jnp.concatenate([t[:, 2:], jnp.zeros_like(t[:, :2])], 1)
            return jnp.concatenate([jnp.zeros_like(t[:, :1]), t[:, :-1]], 1)

        def dmask(k):
            ck_k = shift(ckey, k)
            ch_k = shift(chk, k)
            tgt = chk + k if k > 0 else chk - 1
            return (ck_k == ckey) & (ch_k == tgt)

        m_prev = dmask(-1)[..., None]
        m1 = dmask(1)[..., None]
        m2 = dmask(2)[..., None]
        m1s2 = ((shift(ckey, 1) == ckey) & (shift(chk, 1) == chk + 2))[..., None]
        halo_lo = jnp.where(m_prev, shift(x, -1)[:, :, 3 * C:4 * C], 0)
        nxt = jnp.where(m1, shift(x, 1), 0)
        z_s2 = jnp.where(m1s2, shift(x, 1)[:, :, 0:C],
                         jnp.where(m2, shift(x, 2)[:, :, 0:C], 0))
        rows = jnp.concatenate([halo_lo, x, nxt, z_s2], axis=2)
        return jnp.concatenate(
            [rows, jnp.zeros_like(rows[:, :1])], axis=1
        )

    t("window_table flat-minor", wt_flat, srcf, ckj, chj)


if __name__ == "__main__":
    main()
