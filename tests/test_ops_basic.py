"""Oracle tests for grid_sample / gaussian mask / bev_pool / voxelize.

Oracles: torch CPU (grid_sample parity), numpy reimplementations of the
reference loops (gaussian, scatter-add, PointToVoxel semantics).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unidistill_tpu.ops.grid_sample import grid_sample_2d
from unidistill_tpu.ops.gaussian import box_mask_gaussian
from unidistill_tpu.ops.bev_pool import bev_pool, bev_pool_outer
from unidistill_tpu.ops.voxelize import voxelize


def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    feat = rng.randn(2, 8, 11, 5).astype(np.float32)  # NHWC
    grid = rng.uniform(-1.3, 1.3, size=(2, 4, 9, 2)).astype(np.float32)

    ours = np.asarray(grid_sample_2d(jnp.asarray(feat), jnp.asarray(grid)))

    tfeat = torch.from_numpy(feat).permute(0, 3, 1, 2)  # NCHW
    tref = torch.nn.functional.grid_sample(
        tfeat, torch.from_numpy(grid), align_corners=False
    )
    ref = tref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def _np_gaussian_mask(gt, H, W, pc_range, voxel_size, scale):
    """Faithful numpy port of the reference draw loop
    (…camera_exp_distill_lidar.py:100-178)."""
    B = gt.shape[0]
    out = np.zeros((B, H, W), np.float32)
    for i in range(B):
        for j in range(gt.shape[1]):
            if np.abs(gt[i, j]).sum() == 0:
                continue
            w = gt[i, j, 3] / (voxel_size[0] * scale)
            h = gt[i, j, 4] / (voxel_size[1] * scale)

            def rad(hh, ww, mo=0.7):
                # NB: faithful to the reference (divide by 2, not 2a — the
                # well-known CenterNet quirk, ref …distill_lidar.py:131-151)
                b1 = hh + ww
                c1 = ww * hh * (1 - mo) / (1 + mo)
                r1 = (b1 + np.sqrt(b1**2 - 4 * c1)) / 2
                b2 = 2 * (hh + ww)
                c2 = (1 - mo) * ww * hh
                r2 = (b2 + np.sqrt(b2**2 - 16 * c2)) / 2
                a3 = 4 * mo
                b3 = -2 * mo * (hh + ww)
                c3 = (mo - 1) * ww * hh
                r3 = (b3 + np.sqrt(b3**2 - 4 * a3 * c3)) / 2
                return min(r1, r2, r3)

            r = max(0, int(rad(w, h)))
            cx = int((gt[i, j, 0] - pc_range[0]) / (voxel_size[0] * scale))
            cy = int((gt[i, j, 1] - pc_range[1]) / (voxel_size[1] * scale))
            d = 2 * r + 1
            sig = d / 6.0
            yy, xx = np.ogrid[-r : r + 1, -r : r + 1]
            g = np.exp(-(xx * xx + yy * yy) / (2 * sig * sig))
            left, right = min(cx, r), min(W - cx, r + 1)
            top, bottom = min(cy, r), min(H - cy, r + 1)
            if min(right + left, bottom + top) > 0 and 0 <= cx < W and 0 <= cy < H:
                patch = out[i, cy - top : cy + bottom, cx - left : cx + right]
                gp = g[r - top : r + bottom, r - left : r + right]
                np.maximum(patch, gp, out=patch)
    return out


def test_gaussian_mask_matches_reference_loop():
    rng = np.random.RandomState(1)
    B, G = 2, 6
    pc_range = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    vs = (0.075, 0.075, 0.2)
    scale = 8
    gt = np.zeros((B, G, 9), np.float32)
    for i in range(B):
        n = rng.randint(1, G)
        gt[i, :n, 0] = rng.uniform(-50, 50, n)
        gt[i, :n, 1] = rng.uniform(-50, 50, n)
        gt[i, :n, 3] = rng.uniform(1.0, 8.0, n)
        gt[i, :n, 4] = rng.uniform(1.0, 8.0, n)
        gt[i, :n, 5] = 1.5

    ours = np.asarray(
        box_mask_gaussian(jnp.asarray(gt), (180, 180), pc_range, vs, scale)
    )
    ref = _np_gaussian_mask(gt, 180, 180, pc_range, vs, scale)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_bev_pool_scatter_add():
    rng = np.random.RandomState(2)
    B, N, C = 2, 200, 7
    nx, ny, nz = 10, 12, 3
    geom = rng.randint(-2, 13, size=(B, N, 3)).astype(np.int32)
    feats = rng.randn(B, N, C).astype(np.float32)

    out = np.asarray(bev_pool(jnp.asarray(geom), jnp.asarray(feats), (nx, ny, nz)))

    ref = np.zeros((B, ny, nx, C), np.float32)
    for b in range(B):
        for n in range(N):
            x, y, z = geom[b, n]
            if 0 <= x < nx and 0 <= y < ny and 0 <= z < nz:
                ref[b, y, x] += feats[b, n]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_bev_pool_outer_matches_materialized():
    rng = np.random.RandomState(3)
    B, NC, D, fH, fW, C = 1, 2, 4, 3, 5, 6
    nx, ny, nz = 8, 8, 2
    depth = jax.nn.softmax(jnp.asarray(rng.randn(B, NC, D, fH, fW)), axis=2).astype(
        jnp.float32
    )
    ctx = jnp.asarray(rng.randn(B, NC, fH, fW, C).astype(np.float32))
    geom = jnp.asarray(rng.randint(-1, 9, size=(B, NC, D, fH, fW, 3)).astype(np.int32))

    fused = bev_pool_outer(geom, depth, ctx, (nx, ny, nz))

    feats = (depth[..., None] * ctx[:, :, None]).reshape(B, -1, C)
    ref = bev_pool(geom.reshape(B, -1, 3), feats, (nx, ny, nz))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_bev_pool_gradient_is_gather():
    # backward of scatter-add == gather of grad at scattered cell, 0 if dropped
    geom = jnp.asarray([[[0, 0, 0], [1, 1, 0], [-1, 5, 0]]], dtype=jnp.int32)
    feats = jnp.ones((1, 3, 2), jnp.float32)

    def loss(f):
        out = bev_pool(geom, f, (4, 4, 1))
        return (out * jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)).sum()

    g = jax.grad(loss)(feats)
    np.testing.assert_allclose(np.asarray(g[0, 0]), [0.0, 0.0])  # cell (0,0) weight 0
    np.testing.assert_allclose(np.asarray(g[0, 1]), [5.0, 5.0])  # cell (1,1) weight 5
    np.testing.assert_allclose(np.asarray(g[0, 2]), [0.0, 0.0])  # dropped


def test_voxelize_matches_point_to_voxel_semantics():
    rng = np.random.RandomState(4)
    P = 2000
    pc_range = (0.0, 0.0, 0.0, 8.0, 8.0, 4.0)
    vs = (1.0, 1.0, 1.0)
    grid = (8, 8, 4)
    pts = rng.uniform(-1, 9, size=(P, 5)).astype(np.float32)
    pts[:, 2] = rng.uniform(-1, 5, P)
    mask = np.ones(P, bool)
    mask[-100:] = False  # padding

    out = voxelize(
        jnp.asarray(pts), jnp.asarray(mask), pc_range, vs, grid,
        max_voxels=300, max_points_per_voxel=5,
    )

    # numpy oracle with PointToVoxel rules (first-5-points, mean)
    voxels = {}
    for i in range(P):
        if not mask[i]:
            continue
        c = np.floor(pts[i, :3]).astype(int)
        if not ((0 <= c) & (c < np.array(grid))).all():
            continue
        k = (c[2], c[1], c[0])
        voxels.setdefault(k, [])
        if len(voxels[k]) < 5:
            voxels[k].append(pts[i])

    nv = int(out.num_voxels)
    assert nv == len(voxels)
    got = {}
    coords = np.asarray(out.coords)
    feats = np.asarray(out.features)
    counts = np.asarray(out.num_points)
    for s in range(nv):
        k = tuple(coords[s])
        got[k] = (feats[s], counts[s])
    assert set(got.keys()) == set(voxels.keys())
    for k, plist in voxels.items():
        np.testing.assert_allclose(
            got[k][0], np.mean(plist, axis=0), rtol=1e-5, atol=1e-5
        )
        assert got[k][1] == len(plist)
    # empty slots zeroed / -1
    assert (coords[nv:] == -1).all()


def test_bev_pool_pallas_scatter_matches_xla():
    """Fused Pallas scatter (interpret mode) == XLA bev_pool_outer."""
    import jax.numpy as jnp
    import numpy as np
    from unidistill_tpu.ops.bev_pool import (
        _bev_pool_scatter_pallas, _linear_index, _rays_np, bev_pool_outer,
    )

    rng = np.random.RandomState(0)
    B, NC, D, fH, fW, C = 2, 2, 3, 4, 4, 128
    nx, ny = 8, 8
    geom = rng.randint(-2, 10, (B, NC, D, fH, fW, 3)).astype(np.int32)
    geom[..., 2] = 0
    depth = rng.rand(B, NC, D, fH, fW).astype(np.float32)
    ctx = rng.randn(B, NC, fH, fW, C).astype(np.float32)

    ref = np.asarray(
        bev_pool_outer(jnp.asarray(geom), jnp.asarray(depth),
                       jnp.asarray(ctx), (nx, ny, 1))
    )

    ncells = nx * ny
    idx = _linear_index(jnp.asarray(geom), nx, ny, 1).reshape(B, -1)
    NP = idx.shape[1]
    from unidistill_tpu.ops.bev_pool import _POOL_CHUNK
    pad = (-NP) % _POOL_CHUNK
    idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=ncells)
    dflat = jnp.pad(jnp.asarray(depth).reshape(B, NP), ((0, 0), (0, pad)))
    rays = np.pad(
        np.broadcast_to(_rays_np(NC, D, fH, fW), (B, NP)), ((0, 0), (0, pad))
    )
    got = np.asarray(
        _bev_pool_scatter_pallas(
            idx, jnp.asarray(rays), dflat,
            jnp.asarray(ctx).reshape(B, NC * fH * fW, C), ncells,
            interpret=True,
        )
    ).reshape(B, ny, nx, C)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # ~22 s (two big compiles); the batched path keeps fast
# correctness coverage via test_voxelize_host.test_host_matches_device
def test_voxelize_batched_matches_vmapped():
    """Flat-global batched voxelizer == vmapped per-sample voxelizer
    (the eval/train steps use the batched path; PROFILE.md)."""
    import jax

    from unidistill_tpu.ops.voxelize import voxelize_batched

    rng = np.random.RandomState(3)
    B, P = 3, 2048
    pts = rng.uniform(-12, 12, (B, P, 5)).astype(np.float32)
    mask = rng.rand(B, P) < 0.8
    pcr = (-10.0, -10.0, -3.0, 10.0, 10.0, 3.0)
    vsz = (0.5, 0.5, 0.5)
    grid = (40, 40, 12)

    def one(p, m):
        out = voxelize(jnp.asarray(p), jnp.asarray(m), pcr, vsz, grid,
                       max_voxels=512, max_points_per_voxel=5)
        return out.features, out.coords

    ref_f, ref_c = jax.vmap(one)(jnp.asarray(pts), jnp.asarray(mask))
    got_f, got_c = voxelize_batched(
        jnp.asarray(pts), jnp.asarray(mask), pcr, vsz, grid,
        max_voxels=512, max_points_per_voxel=5,
    )
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f),
                               rtol=1e-5, atol=1e-5)
    assert bool(jnp.all(got_c == ref_c))
