"""Gather rate vs index locality: uniform-random indices measured 10-13
ns/row from 250-450 MB tables (mb_pieces), but the real sparse-conv
neighbor indices are BANDED (slot-sorted grid order keeps xy neighbors
within ~±1500 rows). Measure banded vs uniform at the caseview shapes."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from experiments.mb_flat_subm import overhead, scan_op, timed

B, S = 4, 98304
NIDX = 8 * B * S


def run(name, rows, width, idx_np, ovh):
    rng = np.random.default_rng(1)
    tab = jnp.asarray(rng.standard_normal((rows, width)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    idx = jnp.asarray(idx_np)

    def gth(a, c):
        tt, ii = a
        return tt[ii + jnp.where(c < -1.0, 1, 0).astype(jnp.int32)]

    f = jax.jit(scan_op(gth))
    t = timed(f, tab, idx, ovh=ovh)
    print(f"  {name:34s}: {t*1e3:7.2f} ms = {t/len(idx_np)*1e9:5.2f} ns/row",
          flush=True)


def main():
    ovh = overhead()
    print(f"overhead {ovh*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)

    rows3 = B * (S + 1) * 3
    # banded: per (offset, b) block the index walks the diagonal ±1500·3
    base = np.tile(np.arange(S, dtype=np.int64), 8 * B)
    jit = rng.integers(-1500, 1500, NIDX)
    banded = np.clip((base + jit) * 3 + rng.integers(0, 3, NIDX), 0, rows3 - 1)
    bb = np.repeat(np.arange(B, dtype=np.int64), S)
    bb = np.tile(bb, 8) * (S + 1) * 3
    banded = np.clip(banded + bb - bb % 1, 0, rows3 - 1).astype(np.int32)
    run("banded 192elt", rows3, 192, banded, ovh)

    # banded with 12% misses to the zero row of each b block
    miss = rng.random(NIDX) < 0.12
    zrow = (bb + S * 3).astype(np.int64)
    banded_m = np.where(miss, zrow, banded).astype(np.int32)
    run("banded 192elt + 12% miss", rows3, 192, banded_m, ovh)

    uniform = rng.integers(0, rows3, NIDX).astype(np.int32)
    run("uniform 192elt", rows3, 192, uniform, ovh)

    # f32 table comparison, banded
    tabrows = B * (S + 1)
    basef = np.tile(np.arange(S, dtype=np.int64), 8 * B)
    bandf = np.clip(basef + rng.integers(-1500, 1500, NIDX), 0, S - 1)
    bandf = (bandf + np.tile(np.repeat(np.arange(B, dtype=np.int64), S), 8)
             * (S + 1)).astype(np.int32)
    run("banded 192elt idx-unscaled", rows3, 192, np.clip(bandf * 3, 0, rows3 - 1).astype(np.int32), ovh)
    rngf = np.random.default_rng(2)
    tabf = jnp.asarray(rngf.standard_normal((tabrows, 96)).astype(np.float32))
    idxf = jnp.asarray(bandf)

    def gthf(a, c):
        tt, ii = a
        return tt[ii + jnp.where(c < -1.0, 1, 0).astype(jnp.int32)]

    f = jax.jit(scan_op(gthf))
    t = timed(f, tabf, idxf, ovh=ovh)
    print(f"  {'banded 96elt f32 (384B)':34s}: {t*1e3:7.2f} ms = "
          f"{t/NIDX*1e9:5.2f} ns/row", flush=True)


if __name__ == "__main__":
    main()
