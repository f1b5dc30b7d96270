"""Gather rate vs TABLE ELEMENT DTYPE — the precision axis of the gather
floor (layout space is measured-closed; PROFILE.md r4/r5).

Question: do narrower storage dtypes (f8/int8) move gather rows at
byte-proportional speed on this TPU stack, or does the gather pad narrow
lanes back to 32-bit (no byte saving)? If byte-proportional, storing the
subm/down window tables in f8_e4m3 would roughly halve the wide-row
stages' byte floor (s2 640 B rows, s3 1280 B) at a quantization cost; if
lane-padded/index-bound, the precision axis is closed like the layout
axis.

Index regime mirrors experiments/mb_gather_flags.py exactly (the setup
that reproduces the production 1.34-1.49 ns/row rate): PER-BATCH [S+1, W]
table (63 MB at s2/bf16 — what `_fetch_windows` slices per (b, o) pass),
8 monotone per-offset streams with +-1500 jitter, 12% misses to the
sentinel row S. A first revision of this file used a fused B=4 table
(252 MB) with globally-sorted indices and landed in the 14 ns/row
random-regime — dtype-insensitive, index-bound; that measurement is
superseded by this one but preserved in the log.

Two measurements per (shape, dtype):
  1. bare gather of the 8*S rows;
  2. gather -> (upcast to bf16) -> skinny GEMM, which catches the trap
     where XLA materializes the f8->bf16 convert as a full-width HBM
     round-trip and the byte saving evaporates.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from experiments.mb_flat_subm import overhead, scan_op, timed

SHAPES = (
    # name,   S,     C    (rows gathered = 8*S from a [S+1, 10C] table)
    ("s2", 98304, 32),
    ("s3", 57344, 64),
)
DTYPES = (
    ("f32", jnp.float32),
    ("bf16", jnp.bfloat16),
    ("f8e4m3", jnp.float8_e4m3fn),
    ("int8", jnp.int8),
)


def offset_streams(rng, S, miss_frac=0.12):
    """[8, S] per-offset monotone index streams (mb_gather_flags.py:47-54)."""
    base = np.arange(S)
    idx = np.stack([
        np.where(rng.random(S) < miss_frac, S,
                 np.clip(base + rng.integers(-1500, 1500, S), 0, S - 1))
        for _ in range(8)
    ])
    return np.sort(idx, axis=1).astype(np.int32)


def main():
    ovh = overhead()
    print(f"overhead {ovh*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)

    for sname, S, C in SHAPES:
        W = 10 * C
        nidx = 8 * S
        idx = jnp.asarray(offset_streams(rng, S))
        src = (rng.standard_normal((S + 1, W)) * 0.1).astype(np.float32)
        co = C
        w8 = jnp.asarray(
            rng.standard_normal((8, W, co)).astype(np.float32)
        ).astype(jnp.bfloat16)
        print(f"[{sname}] rows {nidx/1e6:.2f}M/pass, width {W} elt, "
              f"table {S + 1} rows", flush=True)

        for dname, dt in DTYPES:
            if dt == jnp.int8:
                tab = jnp.asarray(
                    np.clip(src * 256, -127, 127).astype(np.int8))
            else:
                tab = jnp.asarray(src).astype(dt)
            rowbytes = W * tab.dtype.itemsize

            def gth(a, c):
                tt, ii = a
                return tt[ii.reshape(-1)
                          + jnp.where(c < -1.0, 1, 0).astype(jnp.int32)]

            def gemm(a, c):
                tt, ii = a
                ii = (ii.reshape(-1)
                      + jnp.where(c < -1.0, 1, 0).astype(jnp.int32))
                g = tt[ii].astype(jnp.bfloat16).reshape(8, S, W)
                return jnp.einsum(
                    "obw,owk->obk", g, w8,
                    preferred_element_type=jnp.bfloat16).sum(0)

            for tag, op in (("gather", gth), ("gather+GEMM", gemm)):
                try:
                    f = jax.jit(scan_op(op))
                    t0 = time.time()
                    ms = timed(f, tab, idx, ovh=ovh) * 1e3
                    ns_row = ms * 1e6 / nidx
                    gbs = rowbytes * nidx / (ms * 1e-3) / 1e9
                    print(f"  {dname:7s} {rowbytes:5d} B/row "
                          f"{tag:12s}: {ms:7.2f} ms  {ns_row:5.2f} ns/row "
                          f"{gbs:6.0f} GB/s (compile {time.time()-t0:.0f}s)",
                          flush=True)
                except Exception as e:
                    print(f"  {dname:7s} {tag:12s}: FAIL "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
