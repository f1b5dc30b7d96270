"""Pallas key-match subm conv vs the XLA gather-GEMM oracle (interpret mode
on the CPU test platform)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidistill_tpu.ops import sparse_conv as sc
from unidistill_tpu.ops.sparse_conv_pallas import (
    subm_conv_keymatch,
    subm_window_overflow,
    window_starts,
)


def _synth_sparse(B, V, shape, density, seed=0):
    """Sorted sparse voxel set with clustered z occupancy."""
    D, H, W = shape
    rng = np.random.RandomState(seed)
    keys = np.full((B, V), D * H * W, np.int32)
    nv = int(V * density)
    for b in range(B):
        cols = rng.choice(H * W, size=max(nv // 2, 1), replace=False)
        ks = []
        for c in cols:
            z0 = rng.randint(0, D)
            for dz in range(rng.randint(1, 4)):
                if z0 + dz < D:
                    ks.append(int(c) * D + z0 + dz)
        ks = np.unique(np.asarray(ks, np.int64))[:nv]
        keys[b, : len(ks)] = ks
    valid = keys < D * H * W
    z = np.where(valid, keys % D, -1)
    col = keys // D
    y = np.where(valid, col // W, -1)
    x = np.where(valid, col % W, -1)
    coords = np.stack([z, y, x], -1).astype(np.int32)
    feats = np.where(
        valid[..., None], rng.randn(B, V, 8).astype(np.float32), 0.0
    )
    return feats, coords, keys, valid


@pytest.mark.parametrize("seed", [0, 1])
def test_keymatch_matches_gather_gemm(seed):
    B, V = 2, 512
    shape = (11, 40, 40)
    feats, coords, keys, valid = _synth_sparse(B, V, shape, 0.7, seed)
    w = np.random.RandomState(7).randn(27, 8, 8).astype(np.float32) * 0.2

    st = sc.SparseTensor(
        jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(keys),
        jnp.asarray(valid),
    )
    rules = sc.build_subm_rules_batched(st, shape, 3)
    ref = sc.subm_conv_batched(st, jnp.asarray(w), rules).features

    assert int(subm_window_overflow(jnp.asarray(keys), shape, 128, 512)) == 0
    got = subm_conv_keymatch(
        jnp.asarray(feats), jnp.asarray(keys), jnp.asarray(w), shape,
        block=128, window=512,
    )
    got = jnp.where(jnp.asarray(valid)[..., None], got, 0.0)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,  # bf16 accumulation in both paths
    )


def test_keymatch_grid_edges_masked():
    """Voxels at x=0 / x=W-1 must not wrap to the neighboring row."""
    shape = (4, 6, 6)
    D, H, W = shape
    V = 128
    # two voxels whose keys are adjacent across the x-wrap: (y=1,x=5,z=2) and
    # (y=2,x=0,z=1) -> keys (1*6+5)*4+2=46 and (2*6+0)*4+1=49: offset dx=+1
    # from the first would be key (1*6+6)*4+2 = 50 (invalid coord)
    keys = np.full((1, V), D * H * W, np.int32)
    keys[0, :2] = [46, 49]
    feats = np.zeros((1, V, 8), np.float32)
    feats[0, 0] = 1.0
    feats[0, 1] = 10.0
    w = np.zeros((27, 8, 8), np.float32)
    # identity on the center tap only -> output = own feature
    w[13] = np.eye(8)
    out = subm_conv_keymatch(
        jnp.asarray(feats), jnp.asarray(keys), jnp.asarray(w), shape,
        block=16, window=128,
    )
    np.testing.assert_allclose(np.asarray(out[0, 0]), feats[0, 0], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out[0, 1]), feats[0, 1], atol=1e-3)


@pytest.mark.slow  # 18 s — backward of a retained ALTERNATE impl (production
# is ops/sparse_conv_chunked); its forward equivalence stays fast above
def test_keymatch_grad_features_and_weight():
    B, V = 1, 256
    shape = (8, 24, 24)
    feats, coords, keys, valid = _synth_sparse(B, V, shape, 0.6, 3)
    w = np.random.RandomState(5).randn(27, 8, 4).astype(np.float32) * 0.3

    def loss_pallas(f, ww):
        out = subm_conv_keymatch(f, jnp.asarray(keys), ww, shape, 128, 256)
        return jnp.sum(
            jnp.where(jnp.asarray(valid)[..., None], out, 0.0) ** 2
        )

    def loss_ref(f, ww):
        st = sc.SparseTensor(
            f, jnp.asarray(coords), jnp.asarray(keys), jnp.asarray(valid)
        )
        rules = sc.build_subm_rules_batched(st, shape, 3)
        return jnp.sum(sc.subm_conv_batched(st, ww, rules).features ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(w))
    gr = jax.grad(loss_ref, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(w))
    gp0 = np.where(valid[..., None], np.asarray(gp[0], np.float32), 0.0)
    gr0 = np.where(valid[..., None], np.asarray(gr[0], np.float32), 0.0)
    # bf16 forward rounding propagates into g = dL/dout; compare at the
    # gradient's own scale (a structural tap/order bug would be O(scale))
    np.testing.assert_allclose(
        gp0, gr0, rtol=5e-2, atol=2e-2 * np.abs(gr0).max()
    )
    dwp = np.asarray(gp[1], np.float32)
    dwr = np.asarray(gr[1], np.float32)
    np.testing.assert_allclose(
        dwp, dwr, rtol=5e-2, atol=2e-2 * np.abs(dwr).max()
    )


def test_window_starts_shapes():
    keys = jnp.asarray(
        np.sort(np.random.RandomState(0).randint(0, 4000, (2, 512))), jnp.int32
    )
    ws = window_starts(keys, (10, 20, 20), 128, 256)
    assert ws.shape == (2 * 4 * 9,)
    assert int(ws.min()) >= 0 and int(ws.max()) <= 512 - 256
