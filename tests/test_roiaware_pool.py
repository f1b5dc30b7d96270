"""RoI-aware 3D pooling vs a dense numpy oracle of the CUDA kernel semantics
(ref utils/det3d_utils/roiaware_pool3d_utils.py:140-228)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidistill_tpu.ops.roiaware_pool import (
    bev_in_boxes,
    points_in_boxes_index,
    roiaware_pool3d,
)


def _oracle(rois, pts, feats, out, method):
    ox, oy, oz = out
    n, c = rois.shape[0], feats.shape[1]
    pooled = np.zeros((n, ox, oy, oz, c), np.float32)
    for i, roi in enumerate(rois):
        cx, cy, cz, dx, dy, dz, r = roi
        lx = (pts[:, 0] - cx) * np.cos(-r) - (pts[:, 1] - cy) * np.sin(-r)
        ly = (pts[:, 0] - cx) * np.sin(-r) + (pts[:, 1] - cy) * np.cos(-r)
        lz = pts[:, 2] - cz
        inb = (np.abs(lx) <= dx / 2) & (np.abs(ly) <= dy / 2) & (np.abs(lz) <= dz / 2)
        vx = np.clip(np.floor((lx + dx / 2) / (dx / ox)), 0, ox - 1).astype(int)
        vy = np.clip(np.floor((ly + dy / 2) / (dy / oy)), 0, oy - 1).astype(int)
        vz = np.clip(np.floor((lz + dz / 2) / (dz / oz)), 0, oz - 1).astype(int)
        for x in range(ox):
            for y in range(oy):
                for z in range(oz):
                    sel = inb & (vx == x) & (vy == y) & (vz == z)
                    if sel.any():
                        f = feats[sel]
                        pooled[i, x, y, z] = (
                            f.max(0) if method == "max" else f.mean(0)
                        )
    return pooled


@pytest.mark.parametrize("method", ["max", "avg"])
def test_roiaware_pool3d_vs_oracle(method):
    rng = np.random.RandomState(0)
    rois = np.array(
        [
            [0.0, 0.0, 0.0, 4.0, 2.0, 2.0, 0.3],
            [3.0, -1.0, 0.5, 2.0, 2.0, 1.5, -1.1],
        ],
        np.float32,
    )
    pts = rng.uniform(-4, 5, size=(300, 3)).astype(np.float32)
    feats = rng.randn(300, 5).astype(np.float32)
    out = (4, 3, 2)
    got = np.asarray(
        jax.jit(
            lambda r, p, f: roiaware_pool3d(r, p, f, out, pool_method=method)
        )(rois, pts, feats)
    )
    want = _oracle(rois, pts, feats, out, method)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_roiaware_pool3d_grads():
    """Backward contract (ref roiaware_pool3d_utils.py:210-228): max routes
    grad to the argmax point per cell, avg spreads it 1/count."""
    rois = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]], jnp.float32)
    pts = jnp.array(
        [[-0.6, -0.6, 0.0], [-0.55, -0.55, 0.0], [0.6, 0.6, 0.0]], jnp.float32
    )
    feats = jnp.array([[1.0], [2.0], [3.0]], jnp.float32)

    g_max = jax.grad(
        lambda f: roiaware_pool3d(rois, pts, f, 2, "max").sum()
    )(feats)
    # points 0,1 share cell (0,0,*): grad goes only to the max (feat=2)
    np.testing.assert_allclose(np.asarray(g_max[:, 0]), [0.0, 1.0, 1.0])

    g_avg = jax.grad(
        lambda f: roiaware_pool3d(rois, pts, f, 2, "avg").sum()
    )(feats)
    np.testing.assert_allclose(np.asarray(g_avg[:, 0]), [0.5, 0.5, 1.0])


def test_points_in_boxes_index_first_hit_and_background():
    boxes = jnp.array(
        [
            [0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0],
            [0.5, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0],  # overlaps box 0
        ],
        jnp.float32,
    )
    pts = jnp.array(
        [[0.4, 0.0, 0.0], [1.3, 0.0, 0.0], [9.0, 9.0, 9.0]], jnp.float32
    )
    idx = np.asarray(points_in_boxes_index(pts, boxes))
    assert idx.tolist() == [0, 1, -1]  # first-hit for the overlap point


def test_bev_in_boxes_range_clip():
    xs = np.linspace(-2, 2, 9, dtype=np.float32)
    grid = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1)
    boxes = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]], jnp.float32)
    out = np.asarray(
        bev_in_boxes(jnp.asarray(grid), boxes, (-1.2, -1.2, -5, 1.2, 1.2, 5))
    )
    # center cell inside, corner outside, in-box-but-out-of-range cell clipped
    assert out[4, 4] == 0 and out[0, 0] == -1
    # grid x=-1.0 is inside the box AND inside the range
    assert out[2, 4] == 0


def test_roiaware_avg_bf16_count_not_saturated():
    """bf16 features with >256 points in one cell: counts must accumulate in
    f32 or the mean is silently inflated (bf16 saturates at 256)."""
    n = 400
    rois = jnp.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]], jnp.float32)
    pts = jnp.zeros((n, 3), jnp.float32)  # all in the center cell
    feats = jnp.ones((n, 1), jnp.bfloat16) * 2.0
    out = roiaware_pool3d(rois, pts, feats, 2, "avg")
    # mean of 400 identical 2.0s must be 2.0, not 400*2/256 = 3.125
    cell = np.asarray(out, np.float32)
    assert abs(cell.max() - 2.0) < 1e-2, cell.max()
