"""Chunked sparse-conv vs dense-conv oracle + VJP checks (SURVEY.md §4:
dense-numpy oracles per kernel). Submanifold/strided sparse convs evaluated
at active sites must equal the dense convolution there, because inactive
cells are zero. The chunked layout additionally has exact occupancy bitmaps
and custom VJPs, both checked against the dense formulation.

Round 3: the layout is flat z-folded — feats [B, S, 4·C] (lane = zp·C + c)
with int32 occ_bits [B, S]; the oracles unfold to [B, S, 4, C] views."""
import pytest

import numpy as np

import jax
import jax.numpy as jnp

from unidistill_tpu.ops.sparse_conv_chunked import (
    build_chunked_tables,
    chunked_from_voxels,
    chunked_to_dense,
    down2_conv_chunked,
    down2_sites,
    occ_of_bits,
    subm_conv_chunked,
)


def _occ4(occ_bits):
    """int32 bitmap [B, S] → bool [B, S, 4] numpy."""
    return np.asarray(occ_of_bits(occ_bits))


def _unfold(a, C):
    """Flat [B, S, 4·C] → [B, S, 4, C] numpy view (zp-major lane fold)."""
    a = np.asarray(a)
    return a.reshape(a.shape[0], a.shape[1], 4, C)


def _random_voxels(rng, shape, n_active, C, cap, B=2):
    """Batched sparse voxel sets sorted by xy-major key (voxelizer order)."""
    D, H, W = shape
    feats = np.zeros((B, cap, C), np.float32)
    coords = np.full((B, cap, 3), -1, np.int32)
    for b in range(B):
        n = n_active - b * 3  # ragged across batch
        lin = rng.choice(D * H * W, size=n, replace=False)
        # xy-major sort: key = (y*W + x)*D + z
        z, y, x = lin % D, lin // (D * W), (lin // D) % W
        key = (y * W + x) * D + z
        o = np.argsort(key)
        coords[b, :n] = np.stack([z[o], y[o], x[o]], -1)
        feats[b, :n] = rng.randn(n, C)
    return jnp.asarray(feats), jnp.asarray(coords)


def _dense_from_voxels(feats, coords, shape):
    D, H, W = shape
    B, V, C = feats.shape
    dense = np.zeros((B, D, H, W, C), np.float32)
    f = np.asarray(feats)
    c = np.asarray(coords)
    for b in range(B):
        for i in range(V):
            z, y, x = c[b, i]
            if z >= 0:
                dense[b, z, y, x] = f[b, i]
    return dense


def _dense_conv(dense, w, stride, padding):
    return jax.lax.conv_general_dilated(
        jnp.asarray(dense), jnp.asarray(w),
        window_strides=stride, padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _gather_dense(dense_np, st, occ4=None):
    """Read dense values at each chunked slot's 4 z positions → [B,S,4,C]."""
    B, S = st.colkey.shape
    D2 = dense_np.shape[1]
    W = dense_np.shape[3]
    out = np.zeros((B, S, 4, dense_np.shape[-1]), np.float32)
    ck = np.asarray(st.colkey)
    chk = np.asarray(st.chunk)
    occ = _occ4(st.occ_bits) if occ4 is None else occ4
    for b in range(B):
        for s in range(S):
            if not st.valid[b, s]:
                continue
            y, x = ck[b, s] // W, ck[b, s] % W
            for zp in range(4):
                z = chk[b, s] * 4 + zp
                if occ[b, s, zp] and z < D2:
                    out[b, s, zp] = dense_np[b, z, y, x]
    return out


def test_roundtrip_to_dense():
    rng = np.random.RandomState(0)
    shape = (9, 10, 12)  # D not a multiple of 4 on purpose
    feats, coords = _random_voxels(rng, shape, 50, 4, cap=64)
    st = chunked_from_voxels(feats, coords, shape)
    dense, occ = chunked_to_dense(st, shape)  # chunk-folded [B,H,W,nch,4C]
    ref = _dense_from_voxels(feats, coords, shape)  # [B, D, H, W, C]
    B_, H_, W_, nch_, _ = dense.shape
    C_ = ref.shape[-1]
    dense = dense.reshape(B_, H_, W_, nch_ * 4, C_)
    got = np.asarray(dense)  # [B, H, W, nch*4, C]
    D = shape[0]
    np.testing.assert_allclose(
        got[:, :, :, :D, :].transpose(0, 3, 1, 2, 4), ref, atol=1e-6
    )
    assert np.abs(got[:, :, :, D:, :]).sum() == 0
    # occ is z-outer [B, nch*4, H, W]
    occ_ref = np.abs(ref).sum(-1) > 0
    got_occ = np.asarray(occ)
    np.testing.assert_array_equal(got_occ[:, :D], occ_ref)
    assert got_occ[:, D:].sum() == 0


@pytest.mark.parametrize("mode", ["select", "case_view"])
def test_subm_conv_matches_dense(mode, monkeypatch):
    monkeypatch.setenv("UNIDISTILL_SUBM_MODE", mode)
    rng = np.random.RandomState(1)
    shape = (9, 10, 12)
    feats, coords = _random_voxels(rng, shape, 60, 4, cap=80)
    st = chunked_from_voxels(feats, coords, shape)
    tb = build_chunked_tables(st.colkey, st.chunk, st.valid, shape)
    w = rng.randn(27, 4, 5).astype(np.float32)
    bias = rng.randn(5).astype(np.float32)

    out = subm_conv_chunked(
        st.feats, st.occ_bits, st.colkey, st.chunk, st.valid, jnp.asarray(w),
        jnp.asarray(bias), tb, "float32"
    )

    dense = _dense_from_voxels(feats, coords, shape)
    ref_slots = _gather_dense(
        np.asarray(
            _dense_conv(dense, w.reshape(3, 3, 3, 4, 5), (1, 1, 1), (1, 1, 1))
        ) + bias[None, None, None, None],
        st,
    )
    got = _unfold(out, 5)
    mask = _occ4(st.occ_bits)[..., None]
    np.testing.assert_allclose(got * mask, ref_slots * mask, rtol=1e-4, atol=1e-4)
    # inactive sites are exactly zero
    assert np.abs(got * (1 - mask)).sum() == 0


@pytest.mark.parametrize("shape", [
    # odd-depth case: ~15 s of its own compiles, redundant-in-fast with the
    # even-depth regression below (which also pins the phantom-site rule)
    pytest.param((9, 10, 12), marks=pytest.mark.slow),
    (10, 10, 12),
])
def test_down2_conv_matches_dense(shape):
    # (10, ...) covers EVEN input depth: an input voxel at z = D-1 falls in
    # the receptive field of out z = D2 (outside the grid) and must NOT
    # activate a phantom site (spconv semantics; regression r2)
    rng = np.random.RandomState(2)
    out_shape = tuple((d + 2 - 3) // 2 + 1 for d in shape)
    feats, coords = _random_voxels(rng, shape, 70, 3, cap=96)
    st = chunked_from_voxels(feats, coords, shape)
    tb = build_chunked_tables(st.colkey, st.chunk, st.valid, shape)
    sites = down2_sites(
        st.colkey, st.chunk, st.valid, tb, shape, out_shape, out_slot_cap=96
    )
    out_tb = build_chunked_tables(sites.colkey, sites.chunk, sites.valid, out_shape)
    w = rng.randn(27, 3, 6).astype(np.float32)
    bias = rng.randn(6).astype(np.float32)

    out, occ_bits_out = down2_conv_chunked(
        st.feats, st.occ_bits, st.colkey, st.chunk, st.valid, jnp.asarray(w),
        jnp.asarray(bias), sites, out_tb, shape, out_shape, "float32",
    )
    occ_out = _occ4(occ_bits_out)

    dense = _dense_from_voxels(feats, coords, shape)
    ref = np.asarray(
        _dense_conv(dense, w.reshape(3, 3, 3, 3, 6), (2, 2, 2), (1, 1, 1))
    )
    # occupancy oracle: out site active iff >=1 input voxel in its field
    occ_in = (np.abs(dense).sum(-1) > 0).astype(np.float32)[..., None]
    occ_ref = np.asarray(
        _dense_conv(occ_in, np.ones((3, 3, 3, 1, 1), np.float32),
                    (2, 2, 2), (1, 1, 1))
    )[..., 0] > 0.5

    out_st = type(st)(out, occ_bits_out, sites.colkey, sites.chunk,
                      sites.valid)
    got_occ = _gather_dense(occ_ref[..., None].astype(np.float32), out_st)
    # every active out site must be inside the generated slot set & flagged
    total_active_ref = occ_ref.sum()
    total_active_got = occ_out.sum()
    assert total_active_got == total_active_ref, (
        total_active_got, total_active_ref
    )
    assert np.all(got_occ[..., 0][occ_out] > 0.5)

    ref_slots = _gather_dense(ref + bias[None, None, None, None], out_st)
    mask = occ_out[..., None]
    np.testing.assert_allclose(
        _unfold(out, 6) * mask, ref_slots * mask, rtol=1e-4, atol=1e-4
    )
    assert np.abs(_unfold(out, 6) * (1 - mask)).sum() == 0


@pytest.mark.parametrize("mode", ["select", "case_view"])
def test_subm_vjp_matches_dense(mode, monkeypatch):
    monkeypatch.setenv("UNIDISTILL_SUBM_MODE", mode)
    rng = np.random.RandomState(3)
    shape = (6, 6, 8)
    feats, coords = _random_voxels(rng, shape, 40, 3, cap=48)
    st = chunked_from_voxels(feats, coords, shape)
    tb = build_chunked_tables(st.colkey, st.chunk, st.valid, shape)
    w = jnp.asarray(rng.randn(27, 3, 4).astype(np.float32))
    bias = jnp.asarray(rng.randn(4).astype(np.float32))
    B, S = st.colkey.shape
    R = jnp.asarray(rng.randn(B, S, 4 * 4).astype(np.float32))
    from unidistill_tpu.ops.sparse_conv_chunked import zmask
    R = zmask(st.occ_bits, 4, R)

    def loss_chunked(f, wt, bi):
        out = subm_conv_chunked(f, st.occ_bits, st.colkey, st.chunk,
                                st.valid, wt, bi, tb, "float32")
        return jnp.sum(out * R)

    gf, gw, gb = jax.grad(loss_chunked, argnums=(0, 1, 2))(st.feats, w, bias)

    # dense reference: same loss through dense conv, R scattered to grid
    dense = jnp.asarray(_dense_from_voxels(feats, coords, shape))
    occ_d = jnp.asarray(_gather_scatter_mask(st, shape))
    Rd = jnp.asarray(_scatter_slots(_unfold(R, 4), st, shape))

    def loss_dense(d, wt, bi):
        out = _dense_conv(d, wt.reshape(3, 3, 3, 3, 4), (1, 1, 1), (1, 1, 1))
        out = (out + bi) * occ_d[..., None]
        return jnp.sum(out * Rd)

    gd, gwd, gbd = jax.grad(loss_dense, argnums=(0, 1, 2))(dense, w, bias)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gwd), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gbd), rtol=1e-3, atol=1e-4)
    # feature grads compared at active sites
    gf_ref = _gather_dense(np.asarray(gd), st)
    mask = _occ4(st.occ_bits)[..., None]
    np.testing.assert_allclose(
        _unfold(gf, 3) * mask, gf_ref * mask, rtol=1e-3, atol=1e-4
    )


def test_down2_vjp_matches_dense():
    rng = np.random.RandomState(4)
    shape = (9, 8, 8)
    out_shape = (5, 4, 4)
    feats, coords = _random_voxels(rng, shape, 50, 3, cap=64)
    st = chunked_from_voxels(feats, coords, shape)
    tb = build_chunked_tables(st.colkey, st.chunk, st.valid, shape)
    sites = down2_sites(
        st.colkey, st.chunk, st.valid, tb, shape, out_shape, out_slot_cap=64
    )
    out_tb = build_chunked_tables(sites.colkey, sites.chunk, sites.valid, out_shape)
    w = jnp.asarray(rng.randn(27, 3, 5).astype(np.float32))
    bias = jnp.asarray(rng.randn(5).astype(np.float32))
    B2, S2 = sites.colkey.shape
    Rnp = rng.randn(B2, S2, 4 * 5)

    def run_sites():
        return down2_conv_chunked(
            st.feats, st.occ_bits, st.colkey, st.chunk, st.valid, w, bias,
            sites, out_tb, shape, out_shape, "float32",
        )

    _, occ_bits_out = run_sites()
    from unidistill_tpu.ops.sparse_conv_chunked import zmask
    R = zmask(occ_bits_out, 5, jnp.asarray(Rnp.astype(np.float32)))

    def loss_chunked(f, wt, bi):
        out, _ = down2_conv_chunked(
            f, st.occ_bits, st.colkey, st.chunk, st.valid, wt, bi, sites,
            out_tb, shape, out_shape, "float32",
        )
        return jnp.sum(out * R)

    gf, gw, gb = jax.grad(loss_chunked, argnums=(0, 1, 2))(st.feats, w, bias)

    dense = jnp.asarray(_dense_from_voxels(feats, coords, shape))
    occ_in = (jnp.abs(dense).sum(-1) > 0).astype(jnp.float32)[..., None]
    occ_d = _dense_conv(
        occ_in, jnp.ones((3, 3, 3, 1, 1)), (2, 2, 2), (1, 1, 1)
    )[..., 0] > 0.5
    out_st = type(st)(
        jnp.zeros(R.shape), occ_bits_out, sites.colkey, sites.chunk,
        sites.valid
    )
    Rd = jnp.asarray(_scatter_slots(_unfold(R, 5), out_st, out_shape))

    def loss_dense(d, wt, bi):
        out = _dense_conv(d, wt.reshape(3, 3, 3, 3, 5), (2, 2, 2), (1, 1, 1))
        out = (out + bi) * occ_d[..., None]
        return jnp.sum(out * Rd)

    gd, gwd, gbd = jax.grad(loss_dense, argnums=(0, 1, 2))(dense, w, bias)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gwd), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gbd), rtol=1e-3, atol=1e-4)
    gf_ref = _gather_dense(np.asarray(gd), st)
    mask = _occ4(st.occ_bits)[..., None]
    np.testing.assert_allclose(
        _unfold(gf, 3) * mask, gf_ref * mask, rtol=1e-3, atol=1e-4
    )


def _scatter_slots(vals, st, shape):
    """[B, S, 4, C] slot values -> dense [B, D, H, W, C] (numpy oracle)."""
    D, H, W = shape
    B, S = np.asarray(st.colkey).shape
    C = vals.shape[-1]
    out = np.zeros((B, D, H, W, C), np.float32)
    ck, chk = np.asarray(st.colkey), np.asarray(st.chunk)
    occ = _occ4(st.occ_bits)
    for b in range(B):
        for s in range(S):
            if not st.valid[b, s]:
                continue
            y, x = ck[b, s] // W, ck[b, s] % W
            for zp in range(4):
                z = chk[b, s] * 4 + zp
                if z < D and occ[b, s, zp]:
                    out[b, z, y, x] = vals[b, s, zp]
    return out


def _gather_scatter_mask(st, shape):
    """Dense bool occupancy from the chunked occ bitmap."""
    D, H, W = shape
    B, S = np.asarray(st.colkey).shape
    m = np.zeros((B, D, H, W), np.float32)
    ck, chk = np.asarray(st.colkey), np.asarray(st.chunk)
    occ = _occ4(st.occ_bits)
    for b in range(B):
        for s in range(S):
            if not st.valid[b, s]:
                continue
            y, x = ck[b, s] // W, ck[b, s] % W
            for zp in range(4):
                z = chk[b, s] * 4 + zp
                if z < D and occ[b, s, zp]:
                    m[b, z, y, x] = 1.0
    return m
