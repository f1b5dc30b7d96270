"""Microbench: the flat z-folded chunked submanifold conv (production impl).

History (r3): this file's variants prototyped the flat layout that replaced
the round-2 [B,S,4,C] one. Measured on v5e at the s2 shape (B=4, S=98304,
C=co=32) before the production rewrite:

  a_current (r2 layout, per-b loops) : ~73 ms/conv
  c_flat_z  (batch-global, Z trick)  : slower (12-row pad-shift traffic)
  b_caseview (batch-global, 1 GEMM)  : table over the gather cliff at s0
  d_perb_cv (per-sample case-view)   : best — adopted as production

The production `_subm_impl` now IS the flat per-sample formulation (with the
case-view/select A/B via UNIDISTILL_SUBM_CASE_VIEW); this bench times it at
the three encoder stage shapes. Harness helpers (make_inputs/overhead/
scan_op/timed) are shared by mb_pieces.py and mb_subm_ab.py.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from unidistill_tpu.ops.sparse_conv_chunked import (
    ChunkedTables,
    _subm_impl,
    bits_of_occ,
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
    """Synthetic flat chunked tensor + banded neighbor tables (monotone
    ±jitter). feats [B, S, 4·C] bf16, occ_bits [B, S] int32."""
    rng = np.random.default_rng(seed)
    occ = rng.random((B, S, 4)) < 0.45
    occ[:, :, 0] |= ~occ.any(-1)  # every slot has >=1 site
    feats = (rng.standard_normal((B, S, 4, C)) * 0.1).astype(np.float32)
    feats = np.where(occ[..., None], feats, 0.0).reshape(B, S, 4 * C)
    valid = np.ones((B, S), bool)
    colkey = np.sort(rng.integers(0, 1_000_000, (B, S)).astype(np.int32), 1)
    chunk = rng.integers(0, 6, (B, S)).astype(np.int32)

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
        bits_of_occ(jnp.asarray(occ)),
        jnp.asarray(colkey),
        jnp.asarray(chunk),
        jnp.asarray(valid),
        ChunkedTables(jnp.asarray(nbr), jnp.asarray(case), None),
        jnp.asarray(w),
    )


def main():
    ovh = overhead()
    print(f"overhead {ovh*1e3:.1f} ms", flush=True)
    for name, (B, S, C, co) in (
        ("s0", (4, 131072, 16, 16)),
        ("s2", (4, 98304, 32, 32)),
        ("s3", (4, 65536, 64, 64)),
    ):
        feats, occ_bits, ck, ch, vd, tb, w = make_inputs(B, S, C, co)
        args = (feats, occ_bits, ck, ch, vd, w, tb)

        def op(a, c):
            return _subm_impl(
                a[0] + c.astype(jnp.bfloat16) * 0, a[1], a[2], a[3], a[4],
                a[5], None, a[6], "bfloat16")

        single = jax.jit(lambda *a: op(a, jnp.float32(0.0)))
        t0 = time.time()
        jax.block_until_ready(single(*args))
        comp = time.time() - t0
        f = jax.jit(scan_op(op))
        t = timed(f, *args, ovh=ovh)
        print(f"  {name} flat prod : {t*1e3:7.2f} ms/conv "
              f"(compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
