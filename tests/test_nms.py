"""Rotated IoU + greedy NMS tests vs O(N²) numpy references (SURVEY.md §4)."""
import numpy as np

import jax.numpy as jnp

from unidistill_tpu.ops.nms import nms_bev, rotated_iou_bev, rotated_intersection_area


def _mc_intersection(a, b, n=400):
    """Monte-Carlo intersection area of two rotated rects."""
    xs = np.concatenate([_corners(a)[:, 0], _corners(b)[:, 0]])
    ys = np.concatenate([_corners(a)[:, 1], _corners(b)[:, 1]])
    x0, x1, y0, y1 = xs.min(), xs.max(), ys.min(), ys.max()
    gx, gy = np.meshgrid(
        np.linspace(x0, x1, n), np.linspace(y0, y1, n), indexing="ij"
    )
    pts = np.stack([gx.ravel(), gy.ravel()], -1)
    inside = _in_rect(pts, a) & _in_rect(pts, b)
    cell = (x1 - x0) * (y1 - y0) / (n * n)
    return inside.sum() * cell


def _corners(box):
    cx, cy, dx, dy, r = box
    c, s = np.cos(r), np.sin(r)
    local = np.array(
        [[dx / 2, dy / 2], [-dx / 2, dy / 2], [-dx / 2, -dy / 2], [dx / 2, -dy / 2]]
    )
    rot = np.array([[c, -s], [s, c]])
    return local @ rot.T + np.array([cx, cy])


def _in_rect(pts, box):
    cx, cy, dx, dy, r = box
    c, s = np.cos(r), np.sin(r)
    px = (pts[:, 0] - cx) * c + (pts[:, 1] - cy) * s
    py = -(pts[:, 0] - cx) * s + (pts[:, 1] - cy) * c
    return (np.abs(px) <= dx / 2) & (np.abs(py) <= dy / 2)


def test_axis_aligned_iou_exact():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[1.0, 0.0, 2.0, 2.0, 0.0], [5.0, 5.0, 2.0, 2.0, 0.0],
                   [0.0, 0.0, 2.0, 2.0, 0.0]])
    iou = np.asarray(rotated_iou_bev(a, b))[0]
    np.testing.assert_allclose(iou, [2.0 / 6.0, 0.0, 1.0], atol=1e-5)


def test_rotated_identical_45deg():
    a = jnp.array([[0.0, 0.0, 2.0, 4.0, np.pi / 4]])
    iou = np.asarray(rotated_iou_bev(a, a))[0, 0]
    np.testing.assert_allclose(iou, 1.0, atol=1e-4)


def test_rotated_intersection_vs_monte_carlo():
    rng = np.random.RandomState(7)
    boxes_a = np.stack(
        [rng.uniform(-2, 2, 20), rng.uniform(-2, 2, 20),
         rng.uniform(1, 4, 20), rng.uniform(1, 4, 20),
         rng.uniform(-np.pi, np.pi, 20)], -1).astype(np.float32)
    boxes_b = np.stack(
        [rng.uniform(-2, 2, 20), rng.uniform(-2, 2, 20),
         rng.uniform(1, 4, 20), rng.uniform(1, 4, 20),
         rng.uniform(-np.pi, np.pi, 20)], -1).astype(np.float32)
    inter = np.asarray(
        rotated_intersection_area(jnp.asarray(boxes_a), jnp.asarray(boxes_b))
    )
    for i in range(20):
        ref = _mc_intersection(boxes_a[i], boxes_b[i])
        assert abs(inter[i] - ref) < 0.12, (i, inter[i], ref)


def test_pallas_iou_matches_xla():
    from unidistill_tpu.ops.nms import rotated_iou_bev_pallas

    rng = np.random.RandomState(11)
    a = np.stack(
        [rng.uniform(-20, 20, 70), rng.uniform(-20, 20, 70),
         rng.uniform(1, 5, 70), rng.uniform(1, 5, 70),
         rng.uniform(-np.pi, np.pi, 70)], -1).astype(np.float32)
    ref = np.asarray(rotated_iou_bev(jnp.asarray(a), jnp.asarray(a)))
    got = np.asarray(
        rotated_iou_bev_pallas(jnp.asarray(a), jnp.asarray(a), block=64,
                               interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_greedy_nms_matches_numpy():
    rng = np.random.RandomState(8)
    K = 64
    boxes7 = np.zeros((K, 7), np.float32)
    boxes7[:, 0:2] = rng.uniform(-10, 10, (K, 2))
    boxes7[:, 3:5] = rng.uniform(2, 5, (K, 2))
    boxes7[:, 6] = rng.uniform(-np.pi, np.pi, K)
    scores = np.sort(rng.uniform(0, 1, K))[::-1].copy()
    valid = np.ones(K, bool)
    valid[-5:] = False
    thr = 0.2

    keep_idx, keep_mask = nms_bev(
        jnp.asarray(boxes7), jnp.asarray(scores), jnp.asarray(valid), thr, 20
    )
    ours = list(np.asarray(keep_idx)[np.asarray(keep_mask)])

    bev = boxes7[:, [0, 1, 3, 4, 6]]
    iou = np.asarray(rotated_iou_bev(jnp.asarray(bev), jnp.asarray(bev)))
    alive = valid.copy()
    ref = []
    for i in range(K):
        if alive[i]:
            ref.append(i)
            alive &= ~((iou[i] > thr) & valid)
            alive[i] = False
    ref = ref[:20]
    assert ours == ref


def test_pallas_iou_batched_lanes_matches_xla():
    from unidistill_tpu.ops.nms import rotated_iou_bev_pallas
    import jax

    rng = np.random.RandomState(3)
    L, N = 3, 70
    a = np.stack(
        [rng.uniform(-20, 20, (L, N)), rng.uniform(-20, 20, (L, N)),
         rng.uniform(1, 5, (L, N)), rng.uniform(1, 5, (L, N)),
         rng.uniform(-np.pi, np.pi, (L, N))], -1).astype(np.float32)
    ref = np.asarray(jax.vmap(rotated_iou_bev)(jnp.asarray(a), jnp.asarray(a)))
    got = np.asarray(
        rotated_iou_bev_pallas(jnp.asarray(a), jnp.asarray(a), block=64,
                               interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def _rand_sorted_lanes(rng, L, K, n_invalid=5):
    boxes7 = np.zeros((L, K, 7), np.float32)
    boxes7[..., 0:2] = rng.uniform(-10, 10, (L, K, 2))
    boxes7[..., 3:5] = rng.uniform(2, 5, (L, K, 2))
    boxes7[..., 6] = rng.uniform(-np.pi, np.pi, (L, K))
    scores = np.sort(rng.uniform(0, 1, (L, K)), axis=-1)[:, ::-1].copy()
    valid = np.ones((L, K), bool)
    valid[:, -n_invalid:] = False
    return boxes7, scores, valid


def test_batched_blocked_nms_matches_single_lane():
    """nms_bev_batched (blocked greedy, lanes) == nms_bev (row-serial oracle)."""
    import jax
    from unidistill_tpu.ops.nms import nms_bev_batched

    rng = np.random.RandomState(21)
    L, K, post, thr = 4, 128, 30, 0.2
    boxes7, scores, valid = _rand_sorted_lanes(rng, L, K)

    bi, bm = nms_bev_batched(
        jnp.asarray(boxes7), jnp.asarray(valid), thr, post,
        cap=K, use_pallas=False,
    )
    si, sm = jax.vmap(lambda b, s, v: nms_bev(b, s, v, thr, post))(
        jnp.asarray(boxes7), jnp.asarray(scores), jnp.asarray(valid)
    )
    np.testing.assert_array_equal(np.asarray(bm), np.asarray(sm))
    got = np.where(np.asarray(bm), np.asarray(bi), -1)
    ref = np.where(np.asarray(sm), np.asarray(si), -1)
    np.testing.assert_array_equal(got, ref)


def test_batched_nms_cap_slices_top_rows():
    """cap < K must equal running single-lane NMS on the top-cap rows."""
    import jax
    from unidistill_tpu.ops.nms import nms_bev_batched

    rng = np.random.RandomState(5)
    L, K, cap, post, thr = 2, 192, 64, 20, 0.3
    boxes7, scores, valid = _rand_sorted_lanes(rng, L, K)

    bi, bm = nms_bev_batched(
        jnp.asarray(boxes7), jnp.asarray(valid), thr, post,
        cap=cap, use_pallas=False,
    )
    si, sm = jax.vmap(lambda b, s, v: nms_bev(b, s, v, thr, post))(
        jnp.asarray(boxes7[:, :cap]), jnp.asarray(scores[:, :cap]),
        jnp.asarray(valid[:, :cap]),
    )
    np.testing.assert_array_equal(np.asarray(bm), np.asarray(sm))
    got = np.where(np.asarray(bm), np.asarray(bi), -1)
    ref = np.where(np.asarray(sm), np.asarray(si), -1)
    np.testing.assert_array_equal(got, ref)


def test_upper_blocked_iou_matches_full():
    """rotated_iou_upper_blocked == upper triangle of the oracle IoU."""
    import jax
    from unidistill_tpu.ops.nms import rotated_iou_upper_blocked

    rng = np.random.RandomState(9)
    L, C = 3, 128
    b = np.zeros((L, C, 5), np.float32)
    b[..., 0:2] = rng.uniform(-30, 30, (L, C, 2))
    b[..., 2:4] = rng.uniform(1, 6, (L, C, 2))
    b[..., 4] = rng.uniform(-np.pi, np.pi, (L, C))
    # add exact duplicates + touching boxes to hit the boundary paths
    b[:, 1] = b[:, 0]
    b[:, 3, :] = b[:, 2, :]
    b[:, 3, 0] += b[:, 2, 2]  # translated by width: edge-touching

    full = np.asarray(jax.vmap(rotated_iou_bev)(jnp.asarray(b), jnp.asarray(b)))
    tri = np.triu(np.ones((C, C), bool), k=1)
    ref = np.where(tri[None], full, 0.0)
    got = np.asarray(rotated_iou_upper_blocked(jnp.asarray(b), block=64))
    # atol 1e-4: the hoisted plane-offset formulation (c − n·p vs n·(a−p))
    # reassociates fp ops; near-zero sliver intersections differ by ~5e-5
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
