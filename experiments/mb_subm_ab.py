"""A/B the subm conv variants on the real TPU at encoder shapes:
select path (UNIDISTILL_SUBM_CASE_VIEW=0) vs case-view (=1) vs auto.

Usage: UNIDISTILL_SUBM_CASE_VIEW=<0|1> python experiments/mb_subm_ab.py
Prints ms/conv at the s0 (S=120000, C=16) and s2 (S=98304, C=32) shapes.
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from unidistill_tpu.ops.sparse_conv_chunked import (
    build_chunked_tables,
    chunked_from_voxels,
    subm_conv_chunked,
)
from experiments.mb_flat_subm import overhead, timed, scan_op


def bench_shape(B, S, C, co, shape, ovh):
    rng = np.random.RandomState(0)
    # realistic-ish skeleton: random sorted columns, 1-2 chunks each
    D, H, W = shape
    n = int(S * 0.92)
    cols = np.sort(rng.choice(H * W, n, replace=False))
    z = rng.randint(0, D - 1, n)
    coords = np.stack([z, cols // W, cols % W], -1).astype(np.int32)
    order = np.lexsort((coords[:, 0], cols))
    coords = coords[order]
    pad = np.full((S - n, 3), -1, np.int32)
    coords = np.concatenate([coords, pad])[None].repeat(B, 0)
    feats = rng.randn(B, S, 5).astype(np.float32)

    st = chunked_from_voxels(jnp.asarray(feats), jnp.asarray(coords), shape)
    tb = build_chunked_tables(st.colkey, st.chunk, st.valid, shape)
    Sref = st.feats.shape[1]
    f = jnp.asarray(rng.randn(B, Sref, 4 * C).astype(np.float32)).astype(
        jnp.bfloat16
    )
    w = jnp.asarray(rng.randn(27, C, co).astype(np.float32))

    def op(a, c):
        ff = a[0] + c.astype(jnp.bfloat16) * 0
        return subm_conv_chunked(ff, a[1], a[2], a[3], a[4], w, None, tb,
                                 "bfloat16")

    fjit = jax.jit(scan_op(op))
    t0 = time.time()
    ms = timed(fjit, f, st.occ_bits, st.colkey, st.chunk, st.valid, ovh=ovh) * 1e3
    mode = os.environ.get("UNIDISTILL_SUBM_CASE_VIEW", "auto")
    print(f"  S={S} C={C} co={co} mode={mode}: {ms:7.2f} ms/conv "
          f"(compile {time.time()-t0:.0f}s)", flush=True)


def main():
    ovh = overhead()
    print(f"overhead {ovh*1e3:.1f} ms", flush=True)
    bench_shape(4, 120000, 16, 16, (41, 1440, 1440), ovh)
    bench_shape(4, 98304, 32, 32, (21, 720, 720), ovh)
    bench_shape(4, 65536, 64, 64, (11, 360, 360), ovh)


if __name__ == "__main__":
    main()
