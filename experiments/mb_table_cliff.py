"""Gather rate vs table size + zero-row index cost.

mb_banded showed ~11-12 ns/idx from 150-450 MB tables; round-1 measured
~2 ns from <=40 MB tables. Map the cliff, and test whether indices pointing
at one fixed row (the zero row — used as the 'miss'/inactive-case target)
are cheaper than spread indices (DRAM row-buffer hit)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from experiments.mb_flat_subm import overhead, scan_op, timed

NIDX = 3_145_728  # 8 * 4 * 98304


def gmeas(rows, width_elts, idx_np, ovh, label):
    rng = np.random.default_rng(1)
    tab = jnp.asarray(rng.standard_normal((rows, width_elts)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    idx = jnp.asarray(idx_np.astype(np.int32))

    def gth(a, c):
        tt, ii = a
        return tt[ii + jnp.where(c < -1.0, 1, 0).astype(jnp.int32)]

    f = jax.jit(scan_op(gth))
    t = timed(f, tab, idx, ovh=ovh)
    mb = rows * width_elts * 2 / 1e6
    print(f"  {label:42s} ({mb:5.0f} MB): {t*1e3:7.2f} ms = "
          f"{t/len(idx_np)*1e9:5.2f} ns/idx", flush=True)


def main():
    ovh = overhead()
    print(f"overhead {ovh*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)

    # sweep table size at fixed width 192 elts (384 B rows), uniform idx
    for rows in (49_152, 98_304, 131_072, 163_840, 196_608, 294_912):
        idx = rng.integers(0, rows, NIDX)
        gmeas(rows, 192, idx, ovh, f"uniform, {rows} rows x 384B")

    # zero-row fraction test at 98304 rows (37.7 MB)
    rows = 98_304
    real = rng.integers(0, rows, NIDX)
    for frac in (0.0, 0.67, 0.9):
        z = rng.random(NIDX) < frac
        idx = np.where(z, rows - 1, real)
        gmeas(rows, 192, idx, ovh, f"{int(frac*100)}% zero-row, {rows} rows")

    # miss-rate realism: 2/3 zero + banded real
    base = np.tile(np.arange(98_304, dtype=np.int64), NIDX // 98_304)
    band = np.clip(base + rng.integers(-1500, 1500, NIDX), 0, rows - 1)
    z = rng.random(NIDX) < 0.67
    gmeas(rows, 192, np.where(z, rows - 1, band), ovh,
          "67% zero-row + banded real")


if __name__ == "__main__":
    main()
