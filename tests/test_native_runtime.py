"""C++ host-runtime kernels vs numpy references (build + numerics)."""
import numpy as np
import pytest

from unidistill_tpu.data import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available():
        pytest.skip("libpointprep.so could not be built")


def test_transform_points_matches_numpy():
    rng = np.random.RandomState(0)
    pts = rng.randn(1000, 5).astype(np.float32)
    m = np.eye(4)
    m[:3, :3] = np.linalg.qr(rng.randn(3, 3))[0]
    m[:3, 3] = [1.0, -2.0, 0.5]
    ref = pts.copy()
    hom = np.ones((1000, 4))
    hom[:, :3] = ref[:, :3]
    ref[:, :3] = (m @ hom.T).T[:, :3].astype(np.float32)
    ref[:, 4] = 0.05
    out = native.transform_points(pts.copy(), m, 0.05)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_range_filter_pad():
    rng = np.random.RandomState(1)
    pts = rng.uniform(-80, 80, (5000, 5)).astype(np.float32)
    rngbox = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
    out, mask, n = native.range_filter_pad(pts, rngbox, cap=4096)
    ref_mask = (
        (pts[:, 0] >= -54) & (pts[:, 0] <= 54)
        & (pts[:, 1] >= -54) & (pts[:, 1] <= 54)
    )
    ref = pts[ref_mask][:4096]
    assert n == len(ref)
    np.testing.assert_allclose(out[:n], ref)
    assert mask[:n].all() and not mask[n:].any()
    assert np.abs(out[n:]).sum() == 0


def test_points_in_rbbox_matches_jax_op():
    import jax.numpy as jnp

    from unidistill_tpu.ops.points_in_boxes import points_in_boxes_bev

    rng = np.random.RandomState(2)
    pts = rng.uniform(-10, 10, (500, 5)).astype(np.float32)
    boxes = np.zeros((7, 7), np.float32)
    boxes[:, 0:2] = rng.uniform(-8, 8, (7, 2))
    boxes[:, 3:6] = rng.uniform(1, 6, (7, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 7)
    ours = native.points_in_rbbox(pts, boxes)
    ref = np.asarray(points_in_boxes_bev(jnp.asarray(pts[:, :3]),
                                         jnp.asarray(boxes)))
    np.testing.assert_array_equal(ours, ref)


def test_host_voxelizer_first_occurrence_order():
    rng = np.random.RandomState(3)
    pts = rng.uniform(0, 8, (3000, 5)).astype(np.float32)
    vox = native.HostVoxelizer(
        (0, 0, 0, 8, 8, 8), (1, 1, 1), (8, 8, 8), max_voxels=600, max_pts=4
    )
    voxels, coords, npts = vox(pts)
    # oracle: python dict insertion order == first occurrence
    lut, order = {}, []
    members = {}
    for p in pts:
        c = tuple(np.floor(p[:3]).astype(int))
        if not all(0 <= v < 8 for v in c):
            continue
        k = (c[2], c[1], c[0])
        if k not in lut:
            lut[k] = len(order)
            order.append(k)
            members[k] = []
        if len(members[k]) < 4:
            members[k].append(p)
    assert len(order) == len(coords)
    for i, k in enumerate(order):
        assert tuple(coords[i]) == k
        assert npts[i] == len(members[k])
        np.testing.assert_allclose(voxels[i, : npts[i]], members[k])
    # reuse works (hash scratch reset)
    v2, c2, n2 = vox(pts)
    np.testing.assert_array_equal(c2, coords)


def test_host_voxelizer_matches_device_voxelizer_sets():
    """Golden cross-check: device (sorted-order) vs host (first-occurrence)
    voxelizers agree on the voxel SET, per-voxel membership and means."""
    import jax.numpy as jnp

    from unidistill_tpu.ops.voxelize import voxelize

    rng = np.random.RandomState(4)
    pts = rng.uniform(-1, 9, (2000, 5)).astype(np.float32)
    host = native.HostVoxelizer(
        (0, 0, 0, 8, 8, 4), (1, 1, 1), (8, 8, 4), max_voxels=300, max_pts=5
    )
    hv, hc, hn = host(pts)
    dv = voxelize(
        jnp.asarray(pts), jnp.ones(2000, bool), (0, 0, 0, 8, 8, 4),
        (1, 1, 1), (8, 8, 4), 300, 5,
    )
    nv = int(dv.num_voxels)
    assert nv == len(hc)
    host_map = {tuple(hc[i]): hv[i, : hn[i]].mean(0) for i in range(len(hc))}
    dev_coords = np.asarray(dv.coords)[:nv]
    dev_feats = np.asarray(dv.features)[:nv]
    for i in range(nv):
        np.testing.assert_allclose(
            dev_feats[i], host_map[tuple(dev_coords[i])], rtol=1e-5, atol=1e-5
        )


def test_normalize_image():
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (16, 20, 3), np.uint8)
    mean = (123.675, 116.28, 103.53)
    std = (58.395, 57.12, 57.375)
    out = native.normalize_image(img, mean, std, swap_channels=True)
    ref = (img[..., ::-1].astype(np.float32) - np.asarray(mean, np.float32)) / \
        np.asarray(std, np.float32)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)
