"""Tests for the parity components: pillar VFE path, scatter, SCConv block,
points-in-boxes, registry, sampler, torch weight-layout conversions."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unidistill_tpu.layers.pillar_vfe import PillarVFE, pointpillar_scatter
from unidistill_tpu.layers.sc_conv import SCBottleneck
from unidistill_tpu.ops.points_in_boxes import (
    points_in_boxes_3d,
    points_in_boxes_bev,
    remove_points_in_boxes,
)
from unidistill_tpu.utils.registry import Registry
from unidistill_tpu.data.sampler import InfiniteSampler


def test_pillar_vfe_shapes_and_mask():
    rng = np.random.RandomState(0)
    P, N = 32, 10
    feats = rng.randn(P, N, 5).astype(np.float32)
    coords = rng.randint(0, 8, (P, 3)).astype(np.int32)
    npts = rng.randint(0, N + 1, P).astype(np.int32)
    m = PillarVFE(num_filters=(16,), voxel_size=(1.0, 1.0, 8.0),
                  point_cloud_range=(0, 0, -5, 8, 8, 3), dtype=jnp.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(coords),
               jnp.asarray(npts), False)
    out = m.apply(v, jnp.asarray(feats), jnp.asarray(coords),
                  jnp.asarray(npts), False)
    assert out.shape == (P, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_pointpillar_scatter():
    P, C = 8, 4
    feats = jnp.arange(P * C, dtype=jnp.float32).reshape(P, C)
    coords = jnp.asarray(
        [[0, 1, 2], [0, 0, 0], [0, 3, 1], [0, 2, 2]] + [[-1, -1, -1]] * 4,
        jnp.int32,
    )
    valid = jnp.asarray([True] * 4 + [False] * 4)
    out = pointpillar_scatter(feats, coords, valid, (4, 4, 1))
    assert out.shape == (4, 4, C)
    np.testing.assert_allclose(np.asarray(out[1, 2]), np.asarray(feats[0]))
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(feats[1]))
    assert np.abs(np.asarray(out)).sum() == np.abs(np.asarray(feats[:4])).sum()


@pytest.mark.slow  # ~21 s of compile for a smoke of a component every exp
# config turns OFF (ref base_nuscenes_cfg SCConv=False); parity-only
def test_scbottleneck_runs():
    m = SCBottleneck(planes=32, dtype=jnp.float32)
    x = jnp.ones((1, 16, 16, 32))
    v = m.init(jax.random.PRNGKey(0), x, False)
    y = m.apply(v, x, False)
    assert y.shape == x.shape


def test_points_in_boxes():
    boxes = jnp.asarray([[0.0, 0.0, 0.0, 4.0, 2.0, 2.0, np.pi / 2, 0, 0]])
    # box rotated 90°: extents become (2 along x, 4 along y)
    pts = jnp.asarray(
        [[0.9, 0.0, 0.0], [1.5, 0.0, 0.0], [0.0, 1.9, 0.0], [0.0, 0.0, 1.5]]
    )
    bev = np.asarray(points_in_boxes_bev(pts, boxes))[0]
    assert list(bev) == [True, False, True, True]
    full = np.asarray(points_in_boxes_3d(pts, boxes))[0]
    assert list(full) == [True, False, True, False]
    keep = np.asarray(remove_points_in_boxes(pts, boxes))
    assert list(keep) == [False, True, False, True]


def test_registry():
    r = Registry("test")

    @r.register()
    class Foo:
        pass

    assert r.get("Foo") is Foo
    assert "Foo" in r
    with pytest.raises(KeyError):
        r.get("Bar")


def test_infinite_sampler_rank_shard():
    import itertools

    s0 = list(itertools.islice(iter(InfiniteSampler(10, seed=1, rank=0,
                                                    world_size=2)), 10))
    s1 = list(itertools.islice(iter(InfiniteSampler(10, seed=1, rank=1,
                                                    world_size=2)), 10))
    assert len(set(s0[:5] + s1[:5])) == 10  # first epoch covers all indices


def test_torch_layout_conversions():
    torch = pytest.importorskip("torch")
    from unidistill_tpu.training.torch_import import (
        conv2d,
        conv_transpose2d,
        spconv3d,
    )
    import flax.linen as fnn

    rng = np.random.RandomState(0)
    x = rng.randn(1, 8, 8, 3).astype(np.float32)

    tconv = torch.nn.Conv2d(3, 5, 3, padding=1, bias=False)
    w = tconv.weight.detach().numpy()
    ref = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
    m = fnn.Conv(5, (3, 3), padding=1, use_bias=False)
    ours = m.apply({"params": {"kernel": jnp.asarray(conv2d(w))}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    # ConvTranspose with kernel == stride (the only case the reference uses)
    tdeconv = torch.nn.ConvTranspose2d(3, 5, 2, stride=2, bias=False)
    wd = tdeconv.weight.detach().numpy()
    refd = tdeconv(torch.from_numpy(x).permute(0, 3, 1, 2)).detach().permute(0, 2, 3, 1).numpy()
    md = fnn.ConvTranspose(5, (2, 2), strides=(2, 2), use_bias=False)
    oursd = md.apply(
        {"params": {"kernel": jnp.asarray(conv_transpose2d(wd))}}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(oursd), refd, rtol=1e-4, atol=1e-5)

    # spconv layout detection
    w5 = rng.randn(16, 3, 3, 3, 8).astype(np.float32)  # (O, kz, ky, kx, I)
    out = spconv3d(w5, cin=8, cout=16)
    assert out.shape == (27, 8, 16)
    np.testing.assert_allclose(out[0], w5[:, 0, 0, 0, :].T)


def test_interleave_process_results_matches_reference_semantics():
    """ref …base_exp.py:396-417: rank lists interleave then truncate."""
    from unidistill_tpu.parallel.mesh import (
        all_gather_host_objects,
        interleave_process_results,
    )

    per_rank = [["a0", "a1", "a2"], ["b0", "b1", "b2"]]
    assert interleave_process_results(per_rank, total=5) == [
        "a0", "b0", "a1", "b1", "a2"
    ]
    # single-process gather is a truncating passthrough
    assert all_gather_host_objects([1, 2, 3], total=2) == [1, 2]
