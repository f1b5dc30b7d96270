"""Microbenchmarks for the chunked sparse-conv design (round 2).

Methodology per PROFILE.md: ops iterated inside one jit via lax.scan with the
carry threaded through the op's inputs (XLA hoists carry-independent work);
fully-synchronous timing via scalar fetch; relay no-op overhead subtracted.

Questions:
  q1: row-gather cost at 408B rows (6*17 f32) from ~50MB and ~150MB tables
  q2: sorted+unique row-scatter cost (the dilated-table build)
  q3: dense conv3d throughput at s3/s4 shapes (NHWDC)
  q4: population_count availability + cost
  q5: voxelize breakdown (sort vs take_along vs segment ops)
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 8


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        r = fn(*args)
        s = float(jnp.sum(r[0] if isinstance(r, tuple) else r))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


@jax.jit
def noop(x):
    return x + 1.0


def overhead():
    small = jnp.zeros((8,), jnp.float32)
    float(noop(small)[0])
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(noop(small)[0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def scan_op(op, carry_probe):
    """Iterate op ITERS times with carry threaded through inputs."""

    def f(x, idx_or_none):
        def body(c, _):
            out = op(x, c)
            # full reduce — consuming a slice lets XLA DCE the bulk of the op
            return jnp.sum(out).astype(jnp.float32) * 1e-30 + c + 1.0, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    return f


def ci(c):
    """Carry → int32 perturbation XLA cannot fold (int mul-by-0 IS folded,
    float is not; a compare on the loop-carried scalar survives)."""
    return jnp.where(c < -1.0, 1, 0).astype(jnp.int32)


def q1_gather(ovh):
    print("== q1: row gathers, 408B rows (6x17 f32) ==")
    for S in (90_000, 120_000, 360_000):
        tab = jnp.asarray(np.random.randn(S + 1, 6 * 17).astype(np.float32))
        nidx = 9 * 120_000  # one conv's gathers per sample
        idx = jnp.asarray(np.random.randint(0, S, size=(nidx,)).astype(np.int32))

        def op(args, c):
            tab, idx = args
            # make gather depend on carry so scan can't hoist
            i2 = idx + ci(c)
            return tab[i2]

        f = jax.jit(lambda tab, idx: scan_op(op, None)((tab, idx), None))
        t = timed(f, tab, idx)
        per = (t - ovh) / ITERS
        print(
            f"  table[{S}+1,102] ({tab.nbytes/1e6:.0f}MB): {per*1e3:.2f} ms "
            f"for {nidx} rows = {per/nidx*1e9:.2f} ns/row"
        )
    # also 4C-wide (68 floats = 272B) and bf16
    S = 120_000
    for w, dt in ((68, jnp.float32), (102, jnp.bfloat16), (128, jnp.float32)):
        tab = jnp.asarray(np.random.randn(S + 1, w)).astype(dt)
        nidx = 9 * 120_000
        idx = jnp.asarray(np.random.randint(0, S, size=(nidx,)).astype(np.int32))

        def op(args, c):
            tab, idx = args
            i2 = idx + ci(c)
            return tab[i2].astype(jnp.float32)

        f = jax.jit(lambda tab, idx: scan_op(op, None)((tab, idx), None))
        t = timed(f, tab, idx)
        per = (t - ovh) / ITERS
        print(f"  width {w} {dt.__name__}: {per/nidx*1e9:.2f} ns/row")


def q2_scatter(ovh):
    print("== q2: sorted+unique row scatter (dilated build) ==")
    S = 120_000
    Sd = 3 * S
    rows = jnp.asarray(np.random.randn(S, 68).astype(np.float32))
    # ascending unique destinations
    dst = jnp.asarray(np.sort(np.random.choice(Sd, S, replace=False)).astype(np.int32))

    def op(args, c):
        rows, dst = args
        base = jnp.zeros((Sd + 1, 68), jnp.float32)
        out = base.at[dst + ci(c)].set(rows + c * 0, mode="drop", indices_are_sorted=True, unique_indices=True)
        return out

    f = jax.jit(lambda rows, dst: scan_op(op, None)((rows, dst), None))
    t = timed(f, rows, dst)
    per = (t - ovh) / ITERS
    print(f"  scatter {S} rows x 272B into [{Sd}]: {per*1e3:.2f} ms = {per/S*1e9:.1f} ns/row")
    # narrow width (17)
    rows17 = jnp.asarray(np.random.randn(S, 17).astype(np.float32))

    def op17(args, c):
        rows, dst = args
        base = jnp.zeros((Sd + 1, 17), jnp.float32)
        out = base.at[dst + ci(c)].set(rows + c * 0, mode="drop", indices_are_sorted=True, unique_indices=True)
        return out

    f = jax.jit(lambda rows, dst: scan_op(op17, None)((rows17, dst), None))
    t = timed(f, rows17, dst)
    per = (t - ovh) / ITERS
    print(f"  scatter {S} rows x 68B: {per*1e3:.2f} ms = {per/S*1e9:.1f} ns/row")


def q3_dense_conv(ovh):
    print("== q3: dense conv3d NHWDC ==")
    cases = [
        ("s3 subm 64->64", (4, 360, 360, 12, 64), (3, 3, 3, 64, 64), (1, 1, 1), "SAME"),
        ("s4 subm 128->128", (4, 180, 180, 8, 128), (3, 3, 3, 128, 128), (1, 1, 1), "SAME"),
        ("down3 32->64 s2", (4, 720, 720, 24, 32), (3, 3, 3, 32, 64), (2, 2, 2), "SAME"),
    ]
    for name, xs, ws, stride, pad in cases:
        x = jnp.asarray(np.random.randn(*xs).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(np.random.randn(*ws).astype(np.float32)).astype(jnp.bfloat16) * 0.05

        def op(args, c):
            x, w = args
            x2 = x + c.astype(jnp.bfloat16) * 0
            return jax.lax.conv_general_dilated(
                x2, w, window_strides=(stride[1], stride[2], stride[0]),
                padding=pad,
                dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        f = jax.jit(lambda x, w: scan_op(op, None)((x, w), None))
        t = timed(f, x, w)
        per = (t - ovh) / ITERS
        flops = (
            np.prod(xs[:3]) * (xs[3] // stride[0]) / (stride[1] * stride[2])
            * np.prod(ws[:3]) * ws[3] * ws[4] * 2
        )
        print(f"  {name}: {per*1e3:.2f} ms  ({flops/per/1e12:.1f} TFLOP/s eff)")


def q4_popcount(ovh):
    print("== q4: population_count ==")
    x = jnp.asarray(np.random.randint(0, 2**30, size=(4 * 120_000,)).astype(np.int32))

    def op(x, c):
        return jax.lax.population_count(x + ci(c))

    f = jax.jit(lambda x: scan_op(op, None)(x, None))
    t = timed(f, x)
    print(f"  popcount 480k int32: {(t-ovh)/ITERS*1e3:.3f} ms")


def q5_voxelize(ovh):
    print("== q5: voxelize breakdown (B=4, P=262144) ==")
    B, P = 4, 262_144
    pts = np.zeros((B, P, 5), np.float32)
    n = P // 2
    rng = np.random.RandomState(0)
    pts[:, :n, 0:2] = rng.uniform(-50, 50, (B, n, 2))
    pts[:, :n, 2] = rng.uniform(-4, 2, (B, n))
    mask = np.zeros((B, P), bool)
    mask[:, :n] = True
    ptsj = jnp.asarray(pts)
    maskj = jnp.asarray(mask)

    from unidistill_tpu.ops.voxelize import voxelize_batched

    def full(args, c):
        pts, mask = args
        f, co = voxelize_batched(
            pts + c * 0, mask, (-54, -54, -5, 54, 54, 3), (0.075, 0.075, 0.2),
            (1440, 1440, 40), 120_000, 10,
        )
        return f

    f = jax.jit(lambda p, m: scan_op(full, None)((p, m), None))
    t = timed(f, ptsj, maskj)
    print(f"  full voxelize_batched V=120k: {(t-ovh)/ITERS*1e3:.1f} ms")

    # pieces
    def keys_only(args, c):
        pts, mask = args
        xyz = pts[..., :3] + c * 0
        vc = jnp.floor((xyz - jnp.asarray([-54.0, -54, -5])) / jnp.asarray([0.075, 0.075, 0.2])).astype(jnp.int32)
        key = (vc[..., 1] * 1440 + vc[..., 0]) * 40 + vc[..., 2]
        return key

    def sort_only(args, c):
        key = keys_only(args, c)
        return jnp.sort(key, axis=1)

    def argsort_take(args, c):
        pts, mask = args
        key = keys_only(args, c)
        order = jnp.argsort(key, axis=1, stable=True)
        sp = jnp.take_along_axis(pts, order[..., None], 1)
        return sp

    for name, op in (("keys", keys_only), ("sort", sort_only), ("argsort+take5", argsort_take)):
        f = jax.jit(lambda p, m, op=op: scan_op(op, None)((p, m), None))
        t = timed(f, ptsj, maskj)
        print(f"  {name}: {(t-ovh)/ITERS*1e3:.1f} ms")


def main():
    ovh = overhead()
    print(f"relay overhead: {ovh*1e3:.1f} ms")
    q4_popcount(ovh)
    q1_gather(ovh)
    q2_scatter(ovh)
    q3_dense_conv(ovh)
    q5_voxelize(ovh)


if __name__ == "__main__":
    main()
