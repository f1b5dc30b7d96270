"""Sparse gather-GEMM conv vs dense-conv oracle (SURVEY.md §4: dense-numpy
oracles per kernel). Because inactive cells are zero, a submanifold/sparse conv
evaluated at its active sites must equal the dense convolution there."""
import numpy as np

import jax
import pytest
import jax.numpy as jnp

from unidistill_tpu.ops.sparse_conv import (
    SparseTensor,
    from_voxels,
    sparse_conv_down,
    subm_conv,
    to_dense,
)


def _random_sparse(rng, shape, n_active, C, cap):
    # sorted by the xy-major key (y·W+x)·D+z like the voxelizer's output
    D, H, W = shape
    lin = rng.choice(D * H * W, size=n_active, replace=False)
    lin.sort()
    z, y, x = lin % D, lin // (D * W), (lin // D) % W
    coords = np.full((cap, 3), -1, np.int32)
    coords[:n_active] = np.stack([z, y, x], -1)
    feats = np.zeros((cap, C), np.float32)
    feats[:n_active] = rng.randn(n_active, C)
    return jnp.asarray(feats), jnp.asarray(coords)


def _dense_conv(dense, w, stride, padding):
    # dense [D,H,W,Cin], w [kz,ky,kx,Cin,Cout] correlation
    return jax.lax.conv_general_dilated(
        dense[None],
        w,
        window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]


def test_subm_conv_matches_dense():
    rng = np.random.RandomState(0)
    shape = (6, 10, 12)
    feats, coords = _random_sparse(rng, shape, 50, 4, cap=64)
    st = from_voxels(feats, coords, shape)
    w = rng.randn(27, 4, 5).astype(np.float32)

    out = subm_conv(st, jnp.asarray(w), shape)

    dense = to_dense(st, shape)
    wd = w.reshape(3, 3, 3, 4, 5)
    ref = _dense_conv(dense, jnp.asarray(wd), (1, 1, 1), (1, 1, 1))
    # compare at active sites
    c = np.asarray(st.coords)
    ours = np.asarray(out.features)
    refn = np.asarray(ref)
    for i in range(50):
        z, y, x = c[i]
        np.testing.assert_allclose(ours[i], refn[z, y, x], rtol=1e-4, atol=1e-4)
    assert np.abs(ours[50:]).sum() == 0


def test_sparse_down_conv_matches_dense():
    rng = np.random.RandomState(1)
    shape = (7, 10, 12)
    out_shape = (4, 5, 6)  # floor((i + 2p - k)/s)+1 with k3 s2 p1
    feats, coords = _random_sparse(rng, shape, 60, 3, cap=80)
    st = from_voxels(feats, coords, shape)
    w = rng.randn(27, 3, 6).astype(np.float32)

    out = sparse_conv_down(
        st, jnp.asarray(w), (3, 3, 3), (2, 2, 2), (1, 1, 1), shape, out_shape, 128
    )

    dense = to_dense(st, shape)
    ref = np.asarray(
        _dense_conv(dense, jnp.asarray(w.reshape(3, 3, 3, 3, 6)), (2, 2, 2), (1, 1, 1))
    )
    occ = (np.abs(np.asarray(dense)).sum(-1, keepdims=True) > 0).astype(np.float32)
    ref_occ = np.asarray(
        _dense_conv(jnp.asarray(occ), jnp.ones((3, 3, 3, 1, 1), jnp.float32),
                    (2, 2, 2), (1, 1, 1))
    )[..., 0]
    active_ref = {
        (z, y, x)
        for z, y, x in zip(*np.nonzero(ref_occ > 0))
    }
    nv = int(np.asarray(out.valid).sum())
    c = np.asarray(out.coords)
    got = {tuple(c[i]) for i in range(nv)}
    assert got == active_ref
    ours = np.asarray(out.features)
    for i in range(nv):
        z, y, x = c[i]
        np.testing.assert_allclose(ours[i], ref[z, y, x], rtol=1e-4, atol=1e-4)


def test_sparse_down_z_only():
    """The final (3,1,1)/(2,1,1)/pad0 z-compression conv (ref spconv_backbone conv_out)."""
    rng = np.random.RandomState(2)
    shape = (5, 6, 6)
    out_shape = (2, 6, 6)
    feats, coords = _random_sparse(rng, shape, 40, 4, cap=48)
    st = from_voxels(feats, coords, shape)
    w = rng.randn(3, 4, 4).astype(np.float32)

    out = sparse_conv_down(
        st, jnp.asarray(w), (3, 1, 1), (2, 1, 1), (0, 0, 0), shape, out_shape, 64
    )

    dense = to_dense(st, shape)
    ref = np.asarray(
        _dense_conv(dense, jnp.asarray(w.reshape(3, 1, 1, 4, 4)), (2, 1, 1), (0, 0, 0))
    )
    nv = int(np.asarray(out.valid).sum())
    c = np.asarray(out.coords)
    ours = np.asarray(out.features)
    assert nv > 0
    for i in range(nv):
        z, y, x = c[i]
        np.testing.assert_allclose(ours[i], ref[z, y, x], rtol=1e-4, atol=1e-4)


def test_subm_grad_flows():
    rng = np.random.RandomState(3)
    shape = (4, 6, 6)
    feats, coords = _random_sparse(rng, shape, 20, 4, cap=32)
    st = from_voxels(feats, coords, shape)
    w = jnp.asarray(rng.randn(27, 4, 4).astype(np.float32))

    def loss(w, f):
        out = subm_conv(SparseTensor(f, st.coords, st.keys, st.valid), w, shape)
        return jnp.sum(out.features ** 2)

    gw, gf = jax.grad(loss, argnums=(0, 1))(w, st.features)
    assert np.isfinite(np.asarray(gw)).all() and np.abs(np.asarray(gw)).sum() > 0
    assert np.isfinite(np.asarray(gf)).all() and np.abs(np.asarray(gf)).sum() > 0


@pytest.mark.slow  # 17 s — per-voxel path oracles remain fast via test_sparse_conv dense checks
def test_batched_ops_match_per_sample():
    """Batched-global (flat-row-index) sparse ops == vmapped per-sample ops."""
    from unidistill_tpu.ops.sparse_conv import (
        build_subm_rules_batched,
        sparse_conv_down_batched,
        subm_conv_batched,
    )

    rng = np.random.RandomState(3)
    shape = (6, 10, 12)
    B, C, cap = 3, 4, 64
    fs, cs = [], []
    for b in range(B):
        f, c = _random_sparse(rng, shape, 30 + 7 * b, C, cap)
        fs.append(f)
        cs.append(c)
    feats_b = jnp.stack(fs)
    coords_b = jnp.stack(cs)
    st_b = from_voxels(feats_b, coords_b, shape)  # elementwise → batched ok

    w = rng.randn(27, C, 5).astype(np.float32)
    bias = rng.randn(5).astype(np.float32)

    ref = jax.vmap(
        lambda st: subm_conv(st, jnp.asarray(w), shape, bias=jnp.asarray(bias))
    )(st_b)
    rules = build_subm_rules_batched(st_b, shape)
    got = subm_conv_batched(st_b, jnp.asarray(w), rules, bias=jnp.asarray(bias))
    np.testing.assert_allclose(
        np.asarray(got.features), np.asarray(ref.features), rtol=1e-5, atol=1e-5
    )

    out_shape = (3, 5, 6)
    wd = rng.randn(27, C, 6).astype(np.float32)
    kw = dict(kernel_size=(3, 3, 3), stride=(2, 2, 2), padding=(1, 1, 1),
              spatial_shape=shape, out_spatial_shape=out_shape, out_cap=48)
    refd = jax.vmap(lambda st: sparse_conv_down(st, jnp.asarray(wd), **kw))(st_b)
    gotd = sparse_conv_down_batched(st_b, jnp.asarray(wd), **kw)
    np.testing.assert_array_equal(np.asarray(gotd.keys), np.asarray(refd.keys))
    np.testing.assert_array_equal(np.asarray(gotd.valid), np.asarray(refd.valid))
    np.testing.assert_allclose(
        np.asarray(gotd.features), np.asarray(refd.features), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow  # 22 s — equivalence of two NON-production alternates; the
# production chunked path keeps its own dense oracles in the fast suite
def test_column_table_convs_match_sort_based():
    """zslot/column-table taps (sort-free) == sort-based batched ops."""
    from unidistill_tpu.ops.sparse_conv import (
        build_stage_tables,
        build_subm_rules_batched,
        column_neighbor_slots,
        down_column_queries,
        downsample_sites_batched,
        gather_gemm_zero_row,
        sparse_conv_down_batched,
        subm_column_queries,
        subm_conv_batched,
        taps_from_tables,
    )

    rng = np.random.RandomState(7)
    shape = (6, 10, 12)
    D, H, W = shape
    B, C, cap, ncol = 3, 4, 64, 48
    fs, cs = [], []
    for b in range(B):
        f, c = _random_sparse(rng, shape, 30 + 7 * b, C, cap)
        fs.append(f)
        cs.append(c)
    st_b = from_voxels(jnp.stack(fs), jnp.stack(cs), shape)
    w = jnp.asarray(rng.randn(27, C, 5).astype(np.float32))

    # reference: sort-based batched subm conv
    rules = build_subm_rules_batched(st_b, shape)
    ref = subm_conv_batched(st_b, w, rules)

    # table-based
    def _w_xykz(wk, kz):
        K, cin, cout = wk.shape
        return wk.reshape(kz, K // kz, cin, cout).transpose(1, 0, 2, 3)

    tb = build_stage_tables(st_b.keys, st_b.valid, shape, ncol)
    q = subm_column_queries(tb, H, W)
    nbr = column_neighbor_slots(tb, q, H * W)
    taps = taps_from_tables(
        tb, nbr, tb.col_of, st_b.coords[..., 0] - 1, 3, 9, D, cap
    )
    got = gather_gemm_zero_row(st_b.features, taps, _w_xykz(w, 3))
    got = jnp.where(st_b.valid[..., None], got, 0.0)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref.features), rtol=1e-5, atol=1e-5
    )

    # down conv: sort-based vs table-based
    out_shape = (3, 5, 6)
    wd = jnp.asarray(rng.randn(27, C, 6).astype(np.float32))
    kw = dict(kernel_size=(3, 3, 3), stride=(2, 2, 2), padding=(1, 1, 1),
              spatial_shape=shape, out_spatial_shape=out_shape, out_cap=48)
    refd = sparse_conv_down_batched(st_b, wd, **kw)

    oc, ok_, ov = downsample_sites_batched(
        st_b, (3, 3, 3), (2, 2, 2), (1, 1, 1), out_shape, 48
    )
    otb = build_stage_tables(ok_, ov, out_shape, ncol)
    qd = down_column_queries(otb, (2, 2), (1, 1), (3, 3), (H, W),
                             (out_shape[1], out_shape[2]))
    nbrd = column_neighbor_slots(tb, qd, H * W)
    zbase = oc[..., 0] * 2 - 1
    tapsd = taps_from_tables(tb, nbrd, otb.col_of, zbase, 3, 9, D, cap)
    gotd = gather_gemm_zero_row(st_b.features, tapsd, _w_xykz(wd, 3))
    gotd = jnp.where(ov[..., None], gotd, 0.0)
    np.testing.assert_array_equal(np.asarray(ok_), np.asarray(refd.keys))
    np.testing.assert_allclose(
        np.asarray(gotd), np.asarray(refd.features), rtol=1e-5, atol=1e-5
    )


def test_gather_gemm_superrow_matches_zero_row():
    from unidistill_tpu.ops.sparse_conv import (
        gather_gemm_superrow, gather_gemm_zero_row,
    )

    rng = np.random.RandomState(11)
    B, V, C, XY, KZ, O = 2, 40, 4, 9, 3, 50
    f = jnp.asarray(rng.randn(B, V, C).astype(np.float32))
    w = jnp.asarray(rng.randn(XY, KZ, C, 6).astype(np.float32))
    # superrow contract: per (xy, site) the valid taps occupy consecutive
    # rows within [r0, r0+2] (guaranteed by xy-major column layout)
    idx = np.full((B, XY, KZ, O), V, np.int32)
    for b in range(B):
        for x in range(XY):
            for o in range(O):
                r0 = rng.randint(0, V - 3)
                present = rng.rand(KZ) > 0.3
                r = r0
                for k in range(KZ):
                    if present[k]:
                        idx[b, x, k, o] = r
                        r += 1
    idx = jnp.asarray(idx)
    ref = gather_gemm_zero_row(f, idx, w)
    got = gather_gemm_superrow(f, idx, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
