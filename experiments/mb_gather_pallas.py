"""Microbench: in-kernel VMEM row-gather strategies for the banded sparse conv.

Question: can a Pallas kernel that holds a BAND of the key-sorted slot table
in VMEM gather R arbitrary (band-local) rows per block at <= ~3 ns/row?  If
yes, a fused band-gather+GEMM kernel removes the per-conv HBM window
materialization that dominates the 924 ms LiDAR step (see PROFILE.md).

Variants
  xla    : plain table[idx] under jit (known ~2-2.5 ns/row, full HBM traffic)
  fori   : per-row fori_loop copy from VMEM band scratch
  fori4  : 4x unrolled fori_loop
  take   : jnp.take(band, local_idx, axis=0) — Mosaic dynamic-gather lowering
  onehot : (R,BAND) one-hot matmul on MXU (reference; FLOP-heavy)

Shapes: s2-like. Table [S, 10C]=[65536, 640] bf16, R=2048 rows/block,
BAND=4096, 32 blocks (grid).  All variants checked against the XLA gather.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 65536
W = 640
R = 2048
BAND = 4096
NBLK = S // R


def overhead():
    @jax.jit
    def noop(x):
        return x + 1.0

    small = jnp.zeros((8,), jnp.float32)
    float(noop(small)[0])
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(noop(small)[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(*args)
        float(jnp.sum(r[:8, :8].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    # banded, roughly monotone neighbor indices: idx[i] ~ i + noise
    idx = np.arange(S) + rng.integers(-1500, 1500, size=S)
    idx = np.clip(idx, 0, S - 1).astype(np.int32)
    w = np.zeros(NBLK, np.int32)
    for j in range(NBLK):
        blk = idx[j * R:(j + 1) * R]
        lo = max(0, int(blk.min()) - 16) & ~15
        lo = min(lo, S - BAND)
        w[j] = lo
        np.clip(blk, lo, lo + BAND - 1, out=blk)
    tab = (rng.standard_normal((S, W)) * 0.1).astype(jnp.bfloat16)
    return jnp.asarray(tab), jnp.asarray(idx), jnp.asarray(w)


def variant_xla():
    @jax.jit
    def f(tab, idx):
        return tab[idx]

    return f


def _grid_spec(idx_space):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NBLK,),
        in_specs=[
            pl.BlockSpec((R,), lambda j, w: (j,), memory_space=idx_space),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((R, W), lambda j, w: (j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BAND, W), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
        ],
    )


def variant_fori(unroll=1):
    def kern(w_ref, idx_ref, tab_ref, out_ref, band, sem, sidx, sem2):
        j = pl.program_id(0)
        w = w_ref[j]
        dma = pltpu.make_async_copy(tab_ref.at[pl.ds(w, BAND)], band, sem)
        dma.start()
        d2 = pltpu.make_async_copy(idx_ref, sidx, sem2)
        d2.start()
        d2.wait()
        dma.wait()

        def body(i, _):
            for u in range(unroll):
                k = i * unroll + u
                out_ref[pl.ds(k, 1), :] = band[pl.ds(sidx[k] - w, 1), :]
            return 0

        jax.lax.fori_loop(0, R // unroll, body, 0)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NBLK,),
        in_specs=[
            pl.BlockSpec((R,), lambda j, w: (j,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((R, W), lambda j, w: (j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BAND, W), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SMEM((R,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, W), jnp.bfloat16),
        grid_spec=gs,
    )
    return jax.jit(lambda tab, idx, w: f(w, idx, tab))


def variant_take():
    def kern(w_ref, idx_ref, tab_ref, out_ref, band, sem):
        j = pl.program_id(0)
        w = w_ref[j]
        dma = pltpu.make_async_copy(tab_ref.at[pl.ds(w, BAND)], band, sem)
        dma.start()
        dma.wait()
        lidx = idx_ref[:] - w
        out_ref[:] = jnp.take_along_axis(
            band[:], jnp.broadcast_to(lidx[:, None], (R, W)), axis=0
        )

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, W), jnp.bfloat16),
        grid_spec=_grid_spec(pltpu.VMEM),
    )
    return jax.jit(lambda tab, idx, w: f(w, idx, tab))


def variant_onehot():
    def kern(w_ref, idx_ref, tab_ref, out_ref, band, sem):
        j = pl.program_id(0)
        w = w_ref[j]
        dma = pltpu.make_async_copy(tab_ref.at[pl.ds(w, BAND)], band, sem)
        dma.start()
        dma.wait()
        lidx = idx_ref[:] - w
        oh = (lidx[:, None] ==
              jax.lax.broadcasted_iota(jnp.int32, (R, BAND), 1))
        out_ref[:] = jax.lax.dot_general(
            oh.astype(jnp.bfloat16), band[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, W), jnp.bfloat16),
        grid_spec=_grid_spec(pltpu.VMEM),
    )
    return jax.jit(lambda tab, idx, w: f(w, idx, tab))


def main():
    tab, idx, w = make_inputs()
    oh_ms = overhead() * 1e3
    print(f"relay overhead {oh_ms:.1f} ms", flush=True)
    ref = None
    variants = [
        ("xla", lambda: (lambda f: (lambda t, i, _w: f(t, i)))(variant_xla())),
        ("fori", lambda: variant_fori(1)),
        ("fori4", lambda: variant_fori(4)),
        ("take", variant_take),
        ("onehot", variant_onehot),
    ]
    for name, mk in variants:
        try:
            f = mk()
            t0 = time.time()
            out = f(tab, idx, w)
            jax.block_until_ready(out)
            compile_s = time.time() - t0
            if ref is None:
                ref = np.asarray(out)
            else:
                ok = np.array_equal(np.asarray(out), ref)
                if not ok:
                    bad = (np.asarray(out) != ref).any(1).sum()
                    print(f"  {name}: MISMATCH rows={bad}")
            t = timed(f, tab, idx, w) - oh_ms / 1e3
            print(f"{name:7s} {t*1e3:8.3f} ms  {t/S*1e9:6.2f} ns/row "
                  f"(compile {compile_s:.1f}s)", flush=True)
        except Exception as e:
            print(f"{name:7s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
