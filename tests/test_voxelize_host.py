"""Host voxelizer must match the on-device voxelizer bitwise-compatibly
(both implement spconv PointToVoxel + MeanVFE semantics)."""
import numpy as np
import jax.numpy as jnp

from unidistill_tpu.configs.nuscenes import tiny_model
from unidistill_tpu.data.voxelize_host import voxelize_mean_sorted
from unidistill_tpu.ops.voxelize import voxelize_batched


def test_host_matches_device():
    rng = np.random.RandomState(0)
    B, P = 2, 4096
    pts = np.zeros((B, P, 5), np.float32)
    n = 3000
    pts[:, :n, 0:2] = rng.uniform(-55, 55, (B, n, 2))  # some out of range
    pts[:, :n, 2] = rng.uniform(-5.5, 3.5, (B, n))
    pts[:, :n, 3:] = rng.rand(B, n, 2)
    mask = np.zeros((B, P), bool)
    mask[:, :n] = True
    args = ((-54, -54, -5, 54, 54, 3), (1.35, 1.35, 0.2), (80, 80, 40), 2048, 3)

    df, dc = voxelize_batched(jnp.asarray(pts), jnp.asarray(mask), *args)
    for b in range(B):
        hf, hc = voxelize_mean_sorted(pts[b, :n], *args)
        np.testing.assert_array_equal(hc, np.asarray(dc[b]))
        np.testing.assert_allclose(hf, np.asarray(df[b]), rtol=2e-5, atol=2e-5)


def test_native_voxelizer_matches_numpy():
    """C++ voxelize+mean-VFE (runtime/topology.cc) vs the numpy spec:
    identical coords, feats equal to f64-accumulation tolerance."""
    import pytest

    from unidistill_tpu.data import native
    import unidistill_tpu.data.voxelize_host as vh

    if native.voxelize_mean_sorted_native(
        np.zeros((1, 5), np.float32), (0, 0, 0, 1, 1, 1), (1, 1, 1),
        (1, 1, 1), 4, 2,
    ) is None:
        pytest.skip("libpointprep.so not built")

    cfg = tiny_model(with_lidar=True, with_camera=False)
    rng = np.random.RandomState(3)
    for n in (5000, 100):
        pts = np.zeros((n, 5), np.float32)
        pts[:, 0:2] = rng.uniform(-52, 52, (n, 2))
        pts[:, 2] = rng.uniform(-4.5, 2.5, n)
        pts[:, 3] = rng.uniform(0, 255, n)
        args = (pts, cfg.point_cloud_range, cfg.voxel_size, cfg.grid_size,
                cfg.caps.max_voxels_train, cfg.caps.max_points_per_voxel)
        got = vh.voxelize_mean_sorted(*args)
        orig = native.voxelize_mean_sorted_native
        native.voxelize_mean_sorted_native = lambda *a, **k: None
        try:
            ref = vh.voxelize_mean_sorted(*args)
        finally:
            native.voxelize_mean_sorted_native = orig
        np.testing.assert_array_equal(got[1], ref[1])
        np.testing.assert_allclose(got[0], ref[0], rtol=1e-6, atol=1e-6)
