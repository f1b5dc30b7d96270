"""chunked_from_host build variants (s0 shape, C=16): the r4 eval trace
charges it ~11.75 ms/step — 2.1M gathered rows of 32 B (per-z-site rows)
are index-rate-bound. Since a slot's kept voxels are CONSECUTIVE in the
key-sorted voxel list (topology_host src0 construction), one wider gather
at the slot's first voxel + rank-select placement can cut index count 4x.

  cur    — production: one [B·S·4]-row gather of C-wide rows
  g4     — (4, C)-slice gather at first0 + popcount-rank select_n placement
  flat1d — 4C-slice gather from the flattened [R·C] operand (contiguity of
           consecutive rows); tests whether 1-D operand gathers scalarize
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from experiments.mb_flat_subm import overhead, scan_op, timed
from unidistill_tpu.ops.sparse_conv_chunked import rowgather, zmask

B, S, C, V = 4, 131072, 16, 160000
CHUNK = 4


def make():
    rng = np.random.default_rng(0)
    # ~1.09 voxels/slot: mostly single-voxel slots, consecutive runs.
    # occupied zp's of a slot = the k lowest bits of a random 4-bit pattern
    # with popcount >= k, kept vectorized: draw a random start zp0 and take
    # zp0..zp0+k-1 (mod-free: clip so the run fits).
    counts = rng.choice([1, 2, 3, 4], S, p=[0.93, 0.05, 0.015, 0.005])
    zp0 = np.minimum(rng.integers(0, 4, S), 4 - counts)
    f1 = np.minimum(np.concatenate([[0], np.cumsum(counts[:-1])]), V - 4)
    first = np.broadcast_to(f1, (B, S)).astype(np.int32)
    occ1 = (((1 << counts) - 1) << zp0).astype(np.int32)
    occ = np.broadcast_to(occ1, (B, S)).astype(np.int32).copy()
    # src[s, zp0+j] = f1[s] + j
    j4 = np.arange(4)[None, :]
    inrun = (j4 >= zp0[:, None]) & (j4 < (zp0 + counts)[:, None])
    src1 = np.where(inrun, f1[:, None] + (j4 - zp0[:, None]), V)
    src = np.broadcast_to(src1, (B, S, 4)).astype(np.int32).copy()
    vf = (rng.standard_normal((B, V, C)) * 0.1).astype(np.float32)
    return (jnp.asarray(vf, jnp.bfloat16), jnp.asarray(src),
            jnp.asarray(first), jnp.asarray(occ))


def cur(a, c):
    vf, src, first, occ = a
    vf = vf + c.astype(jnp.bfloat16) * 0
    vfp = jnp.concatenate(
        [vf, jnp.zeros((B, 1, C), vf.dtype)], axis=1).reshape(B * (V + 1), C)
    gi = (src.reshape(B, -1)
          + (jnp.arange(B, dtype=jnp.int32) * (V + 1))[:, None])
    return rowgather(vfp, gi.reshape(-1)).reshape(B, S, CHUNK * C)


def g4(a, c):
    vf, src, first, occ = a
    vf = vf + c.astype(jnp.bfloat16) * 0
    vfp = jnp.concatenate(
        [vf, jnp.zeros((B, 4, C), vf.dtype)], axis=1).reshape(B * (V + 4), C)
    gi = (first + (jnp.arange(B, dtype=jnp.int32) * (V + 4))[:, None])
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,))
    g = jax.lax.gather(
        vfp, gi.reshape(-1, 1), dn, slice_sizes=(4, C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).reshape(B, S, 4 * C)
    blocks = [g[..., j * C:(j + 1) * C] for j in range(4)]
    outp = [blocks[0]]
    for p in range(1, 4):
        rank = jax.lax.population_count(occ & ((1 << p) - 1))
        outp.append(jax.lax.select_n(
            jnp.broadcast_to(rank[..., None], blocks[0].shape),
            *blocks[:p + 1]))
    out = jnp.concatenate(outp, axis=-1)
    return zmask(occ, C, out)


def flat1d(a, c):
    vf, src, first, occ = a
    vf = vf + c.astype(jnp.bfloat16) * 0
    vfp = jnp.concatenate(
        [vf, jnp.zeros((B, 4, C), vf.dtype)], axis=1).reshape(B, (V + 4) * C)
    flat = vfp.reshape(B * (V + 4) * C)
    gi = ((first + (jnp.arange(B, dtype=jnp.int32) * (V + 4))[:, None])
          * C).reshape(-1, 1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,))
    g = jax.lax.gather(
        flat, gi, dn, slice_sizes=(4 * C,),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).reshape(B, S, 4 * C)
    blocks = [g[..., j * C:(j + 1) * C] for j in range(4)]
    outp = [blocks[0]]
    for p in range(1, 4):
        rank = jax.lax.population_count(occ & ((1 << p) - 1))
        outp.append(jax.lax.select_n(
            jnp.broadcast_to(rank[..., None], blocks[0].shape),
            *blocks[:p + 1]))
    out = jnp.concatenate(outp, axis=-1)
    return zmask(occ, C, out)


def main():
    ovh = overhead()
    print(f"overhead {ovh*1e3:.1f} ms", flush=True)
    args = make()
    ref = None
    for name, op in (("cur", cur), ("g4", g4), ("flat1d", flat1d)):
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
            print(f"  {name:7s}: {t*1e3:7.2f} ms (maxerr {derr:.2e}, "
                  f"compile {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:7s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
