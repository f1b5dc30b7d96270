"""Microbench: flattened formulations of the chunked submanifold conv.

The current `subm_conv_chunked` (ops/sparse_conv_chunked.py) loops python-side
over batch and the 9 xy offsets: 36 gathers + 108 einsums + selects per conv.
The trace shows these as hundreds of 2-3 ms ops — effective HBM bandwidth
~25-60 GB/s (per-op overheads + small-op scheduling), ~740 GB/step total.

Variants (all mathematically identical to the current conv):
  a_current   : subm_conv_chunked's _subm_impl as-is
  c_flat_z    : ONE gather [8·B·S, 10C] over a batch-global table (+ center
                offset read straight from the table — no gather), 3 batched
                dz einsums over the offset dim, pad-shift-add, case-select
                on the OUTPUT (the Z trick, kept)
  b_caseview  : case-resolved window view-table [B(S+1)·3, 6C] built by
                slicing; ONE gather [8·B·S, 6C] with index 3·nbr+case; ONE
                batched GEMM [8, BS, 6C]x[8, 6C, 4co] (z-band folded into
                the weight); center offset from the table slice directly
  d_perb_cv   : b_caseview but per-sample tables/gathers (per-b tables stay
                under the ~60 MB gather-rate cliff; op count B per conv)

Shapes: s2 (S=98304, C=32) and s0 (S=131072, C=16), B=4, bf16.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from unidistill_tpu.ops.sparse_conv_chunked import (
    CHUNK,
    ROWZ,
    ChunkedTables,
    _subm_impl,
    _window_table,
    _w_zyx,
)

ITERS = 4


def overhead():
    f = jax.jit(lambda x: x + 1.0)
    s = jnp.zeros((8,), jnp.float32)
    float(f(s)[0])
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(f(s)[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[3]


def ci(c):
    return jnp.where(c < -1.0, 1, 0).astype(jnp.int32)


def scan_op(op):
    def f(*args):
        def body(c, _):
            out = op(args, c)
            return jnp.sum(out.astype(jnp.float32)) * 1e-30 + c + 1.0, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    return f


def timed(fn, *args, ovh=0.0, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.sum(r))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return (ts[len(ts) // 2] - ovh) / ITERS


def make_inputs(B, S, C, co, seed=0):
    """Synthetic chunked tensor + banded neighbor tables (monotone ±jitter)."""
    rng = np.random.default_rng(seed)
    feats = (rng.standard_normal((B, S, 4, C)) * 0.1).astype(np.float32)
    occ = rng.random((B, S, 4)) < 0.45
    occ[:, :, 0] |= ~occ.any(-1)  # every slot has >=1 site
    valid = np.ones((B, S), bool)
    colkey = np.sort(rng.integers(0, 1_000_000, (B, S)).astype(np.int32), 1)
    chunk = rng.integers(0, 6, (B, S)).astype(np.int32)
    feats = np.where(occ[..., None], feats, 0.0)

    nbr = np.empty((B, 9, S), np.int32)
    case = rng.integers(0, 3, (B, 9, S)).astype(np.int32)
    base = np.arange(S)
    for b in range(B):
        for o in range(9):
            if o == 4:
                nbr[b, o] = base
                case[b, o] = 0
                continue
            j = base + rng.integers(-1500, 1500, S)
            j = np.clip(j, 0, S - 1)
            miss = rng.random(S) < 0.12
            nbr[b, o] = np.where(miss, S, j)
    w = (rng.standard_normal((27, C, co)) * 0.05).astype(np.float32)
    return (
        jnp.asarray(feats, jnp.bfloat16),
        jnp.asarray(occ),
        jnp.asarray(colkey),
        jnp.asarray(chunk),
        jnp.asarray(valid),
        ChunkedTables(jnp.asarray(nbr), jnp.asarray(case), None),
        jnp.asarray(w),
    )


# --------------------------------------------------------------------------
# variant c: flattened gather + Z trick
# --------------------------------------------------------------------------


def subm_flat_z(feats, occ, colkey, chunk, valid, weight, bias, tables, dt):
    B, S, _, C = feats.shape
    co = weight.shape[-1]
    dt = jnp.dtype(dt)
    w = _w_zyx(weight).astype(dt)  # [3z, 3y, 3x, C, co]
    tab = _window_table(feats, occ, colkey, chunk, valid, False, dt)
    tabf = tab.reshape(B * (S + 1), ROWZ * C)

    boff = (jnp.arange(B, dtype=jnp.int32) * (S + 1))[None, :, None]
    offs = [o for o in range(9) if o != 4]
    gidx = tables.nbr_idx[:, offs].transpose(1, 0, 2) + boff  # [8, B, S]
    g = tabf[gidx.reshape(-1)].reshape(8, B * S, ROWZ, C)

    w8 = jnp.stack([w[:, o // 3, o % 3] for o in offs])  # [8, 3, C, co]
    Z = None
    for dz in range(3):
        f = jnp.einsum("obzc,ock->obzk", g, w8[:, dz],
                       preferred_element_type=dt)
        fp = jnp.pad(f, ((0, 0), (0, 0), (4 - dz, 0), (0, 0)))[:, :, :12]
        Z = fp if Z is None else Z + fp
    cse = tables.nbr_case[:, offs].transpose(1, 0, 2).reshape(8, B * S)
    c = cse[:, :, None, None]
    terms = jnp.where(c == 0, Z[:, :, 4:8],
                      jnp.where(c == 1, Z[:, :, 8:12], Z[:, :, 0:4]))
    acc = jnp.sum(terms, axis=0).reshape(B, S, 4, co)

    # center offset: window = own rows z 0..5 of the table (case always 0);
    # out zi reads window z zi+dz → rows dz..dz+3
    gc = tab[:, :S].reshape(B, S, ROWZ, C)
    Zc = None
    for dz in range(3):
        f = jnp.einsum("bszc,ck->bszk", gc[:, :, dz:dz + 4], w[dz, 1, 1],
                       preferred_element_type=dt)
        Zc = f if Zc is None else Zc + f
    acc = acc + Zc
    if bias is not None:
        acc = acc + bias.astype(dt)
    return jnp.where(occ[..., None], acc, 0.0)


# --------------------------------------------------------------------------
# variant b: case-view table + one gather + one batched GEMM
# --------------------------------------------------------------------------


def _case_view(tab, B, S, C, dt):
    """[B, S+1, 10, C] window rows → [B(S+1)·3, 6C] case-resolved views.

    view j covers window z positions p∈0..5 at row offset {0,+4,−4}:
      j=0: rows 0:6 ; j=1: rows 4:10 ; j=2: [0,0,0,0, rows 0:2]."""
    t = tab.reshape(B, -1, ROWZ, C)
    v0 = t[:, :, 0:6]
    v1 = t[:, :, 4:10]
    v2 = jnp.concatenate([jnp.zeros_like(t[:, :, 0:4]), t[:, :, 0:2]], 2)
    v = jnp.stack([v0, v1, v2], axis=2)  # [B, S+1, 3, 6, C]
    return v.reshape(B * (S + 1) * 3, 6 * C)


def _w6(weight, C, co, dt):
    """[27, C, co] → [9 offsets, 6C, 4co] z-band fold: W6[o][q·C+c, zi·co+k]
    = w[q-zi, oy, ox, c, k] for 0 ≤ q−zi ≤ 2."""
    w3 = _w_zyx(weight)  # [3, 3, 3, C, co]
    out = jnp.zeros((9, 6 * C, 4 * co), weight.dtype)
    for o in range(9):
        blk = jnp.zeros((6, C, 4, co), weight.dtype)
        for zi in range(4):
            for dz in range(3):
                blk = blk.at[zi + dz, :, zi, :].set(w3[dz, o // 3, o % 3])
        out = out.at[o].set(blk.reshape(6 * C, 4 * co))
    return out.astype(dt)


def subm_caseview(feats, occ, colkey, chunk, valid, weight, bias, tables, dt,
                  per_b=False):
    B, S, _, C = feats.shape
    co = weight.shape[-1]
    dt = jnp.dtype(dt)
    tab = _window_table(feats, occ, colkey, chunk, valid, False, dt)
    cv = _case_view(tab, B, S, C, dt)  # [B(S+1)·3, 6C]
    W6 = _w6(weight, C, co, dt)  # [9, 6C, 4co]

    offs = [o for o in range(9) if o != 4]
    if per_b:
        accs = []
        cvb = cv.reshape(B, (S + 1) * 3, 6 * C)
        for b in range(B):
            gi = tables.nbr_idx[b][np.asarray(offs)] * 3 + tables.nbr_case[b][np.asarray(offs)]
            g = cvb[b][gi.reshape(-1)].reshape(8, S, 6 * C)
            accs.append(jnp.einsum("osw,owk->osk", g, W6[np.asarray(offs)],
                                   preferred_element_type=dt).sum(0))
        acc = jnp.stack(accs).reshape(B, S, 4, co)
    else:
        boff = (jnp.arange(B, dtype=jnp.int32) * (S + 1) * 3)[None, :, None]
        gi = (tables.nbr_idx[:, offs] * 3
              + tables.nbr_case[:, offs]).transpose(1, 0, 2) + boff
        g = cv[gi.reshape(-1)].reshape(8, B * S, 6 * C)
        acc = jnp.einsum("obw,owk->obk", g, W6[np.asarray(offs)],
                         preferred_element_type=dt)
        acc = acc.sum(0).reshape(B, S, 4, co)

    # center offset straight from the table (case 0 by construction)
    gc = tab[:, :S].reshape(B, S, ROWZ, C)[:, :, 0:6].reshape(B, S, 6 * C)
    acc = acc + jnp.einsum("bsw,wk->bsk", gc, W6[4],
                           preferred_element_type=dt).reshape(B, S, 4, co)
    if bias is not None:
        acc = acc + bias.astype(dt)
    return jnp.where(occ[..., None], acc, 0.0)


def main():
    ovh = overhead()
    print(f"overhead {ovh*1e3:.1f} ms", flush=True)
    for name, (B, S, C, co) in (
        ("s2", (4, 98304, 32, 32)),
        ("s0", (4, 131072, 16, 16)),
        ("s3", (4, 65536, 64, 64)),
    ):
        feats, occ, ck, ch, vd, tb, w = make_inputs(B, S, C, co)
        args = (feats, occ, ck, ch, vd, w, tb)

        ref = None
        variants = [
            ("a_current", lambda a, c: _subm_impl(
                a[0] + c.astype(jnp.bfloat16) * 0, a[1], a[2], a[3], a[4],
                a[5], None, a[6], "bfloat16")),
            ("c_flat_z", lambda a, c: subm_flat_z(
                a[0] + c.astype(jnp.bfloat16) * 0, a[1], a[2], a[3], a[4],
                a[5], None, a[6], "bfloat16")),
            ("b_caseview", lambda a, c: subm_caseview(
                a[0] + c.astype(jnp.bfloat16) * 0, a[1], a[2], a[3], a[4],
                a[5], None, a[6], "bfloat16")),
            ("d_perb_cv", lambda a, c: subm_caseview(
                a[0] + c.astype(jnp.bfloat16) * 0, a[1], a[2], a[3], a[4],
                a[5], None, a[6], "bfloat16", per_b=True)),
        ]
        for vname, op in variants:
            try:
                # correctness (single call)
                single = jax.jit(lambda *a: op(a, jnp.float32(0.0)))
                t0 = time.time()
                out = np.asarray(single(*args)).astype(np.float32)
                comp = time.time() - t0
                if ref is None:
                    ref = out
                    err = 0.0
                else:
                    err = float(np.max(np.abs(out - ref)))
                f = jax.jit(scan_op(op))
                t0 = time.time()
                t = timed(f, *args, ovh=ovh)
                print(f"  {name} {vname:11s}: {t*1e3:7.2f} ms/conv "
                      f"(maxerr {err:.2e}, compile {comp:.0f}s)", flush=True)
            except Exception as e:
                print(f"  {name} {vname:11s}: FAIL {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
