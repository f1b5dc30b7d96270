"""Host voxelizer must match the on-device voxelizer bitwise-compatibly
(both implement spconv PointToVoxel + MeanVFE semantics)."""
import numpy as np
import jax.numpy as jnp

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
