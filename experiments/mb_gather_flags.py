"""Measure (a) case-view vs select at the PRODUCTION s0 size S=160000
(3-view table 92 MB — cliff-adjacent), (b) whether sorted/promise-in-bounds
gather flags beat plain jnp indexing at the s2 shape (per-offset indices are
monotone by construction — both sides are column-sorted)."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from experiments.mb_flat_subm import make_inputs, overhead, scan_op, timed
from unidistill_tpu.ops.sparse_conv_chunked import _subm_impl


def ab_s0_prod(ovh):
    B, S, C, co = 4, 160000, 16, 16
    feats, occ_bits, ck, ch, vd, tb, w = make_inputs(B, S, C, co)
    args = (feats, occ_bits, ck, ch, vd, w, tb)
    dt = jnp.bfloat16
    for mode in ("0", "1"):
        def op(a, c, m=mode):
            os.environ["UNIDISTILL_SUBM_CASE_VIEW"] = m
            try:
                return _subm_impl(a[0] + c.astype(dt) * 0, a[1], a[2], a[3],
                                  a[4], a[5], None, a[6], "bfloat16")
            finally:
                os.environ["UNIDISTILL_SUBM_CASE_VIEW"] = "auto"
        t0 = time.time()
        f = jax.jit(scan_op(op))
        t = timed(f, *args, ovh=ovh)
        print(f"  s0prod S={S} mode={mode}: {t*1e3:7.2f} ms/conv "
              f"(compile {time.time()-t0:.0f}s)", flush=True)


def gather_flags(ovh):
    B, S, C = 4, 98304, 32
    rng = np.random.default_rng(0)
    tab = jnp.asarray(
        (rng.standard_normal((S + 1, 10 * C)) * 0.1).astype(np.float32)
    ).astype(jnp.bfloat16)
    # monotone per-offset indices with jitter + misses (like real tables)
    base = np.arange(S)
    idx = np.stack([
        np.where(rng.random(S) < 0.12, S,
                 np.clip(base + rng.integers(-1500, 1500, S), 0, S - 1))
        for _ in range(8)
    ])  # [8, S] each row monotone-ish (clip keeps order roughly)
    idx = np.sort(idx, axis=1)
    idxj = jnp.asarray(idx.astype(np.int32))

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))

    def g_plain(a, c):
        t = a[0] + c.astype(jnp.bfloat16) * 0
        return t[a[1].reshape(-1)]

    def g_sorted(a, c):
        t = a[0] + c.astype(jnp.bfloat16) * 0
        return jax.lax.gather(
            t, a[1].reshape(-1, 1), dn, slice_sizes=(1, 10 * C),
            indices_are_sorted=False, unique_indices=False,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    def g_sorted8(a, c):
        t = a[0] + c.astype(jnp.bfloat16) * 0
        outs = [
            jax.lax.gather(
                t, a[1][o][:, None], dn, slice_sizes=(1, 10 * C),
                indices_are_sorted=True,
                mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            )
            for o in range(8)
        ]
        return jnp.stack(outs)

    for name, op in (("plain[idx]", g_plain), ("promise", g_sorted),
                     ("sorted8", g_sorted8)):
        t0 = time.time()
        f = jax.jit(scan_op(op))
        t = timed(f, tab, idxj, ovh=ovh)
        ns = t / (8 * S) * 1e9
        print(f"  gather {name:10s}: {t*1e3:7.2f} ms  ({ns:.2f} ns/row) "
              f"(compile {time.time()-t0:.0f}s)", flush=True)


def main():
    ovh = overhead()
    print(f"overhead {ovh*1e3:.1f} ms", flush=True)
    ab_s0_prod(ovh)
    gather_flags(ovh)


if __name__ == "__main__":
    main()
