"""nms_cap=512 truncation vs the reference's 1500-candidate semantics
(VERDICT r2 weak #8).

The reference feeds the top nms_pre=1500 score-sorted candidates into greedy
NMS (centerpoint_gen_proposals.py:66,85-105). The TPU build bounds the
quadratic suppression to the top `nms_cap`=512 (configs/nuscenes.py
ProposalConfig) on the argument that score>0.1 survivors needed for the
top-`post_max` kept set always rank inside the cap. This test constructs
dense-detection scenes at REAL feature-map shape (180×180) — hundreds of
overlapping candidate clusters, more above-threshold candidates than the
cap — and asserts the kept set is IDENTICAL to a cap=1500 run (which is
bitwise the reference semantics: every candidate enters suppression).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unidistill_tpu.configs.nuscenes import ProposalConfig
from unidistill_tpu.decode.proposals import generate_proposals

H = W = 180          # real BEV feature map (1440 / 8)
PC_RANGE = (-54.0, -54.0)
VOXEL = (0.075, 0.075)
OSF = 8              # cell = 0.6 m


def _dense_scene(n_side, dup, spacing_cells, seed=0):
    """One-task preds with n_side² clusters of `dup` overlapping candidates.

    Cluster peaks get random logits well above the score threshold; the
    dup candidates sit at adjacent cells with slightly lower logits and
    4 m boxes, so within a cluster IoU ≫ nms_thr (0.1) and across clusters
    IoU = 0. Returns (preds, cluster_centers_xy, peak_scores)."""
    rng = np.random.RandomState(seed)
    hm = np.full((1, H, W, 1), -12.0, np.float32)
    dim = np.full((1, H, W, 3), np.log(4.0), np.float32)  # 4 m cubes
    rot = np.zeros((1, H, W, 2), np.float32)
    rot[..., 1] = 1.0  # yaw 0
    reg = np.zeros((1, H, W, 2), np.float32)
    centers, peaks = [], []
    offs = [(0, 0), (0, 1), (1, 0), (1, 1), (0, 2), (2, 0)][:dup]
    margin = 10
    for iy in range(n_side):
        for ix in range(n_side):
            cy = margin + iy * spacing_cells
            cx = margin + ix * spacing_cells
            if cy >= H - margin or cx >= W - margin:
                continue
            p = rng.uniform(0.5, 4.0)  # sigmoid in (0.62, 0.98)
            for k, (dy, dx) in enumerate(offs):
                hm[0, cy + dy, cx + dx, 0] = p - 0.05 * k
            centers.append(
                (PC_RANGE[0] + (cx + 0.5) * VOXEL[0] * OSF,
                 PC_RANGE[1] + (cy + 0.5) * VOXEL[1] * OSF)
            )
            peaks.append(1.0 / (1.0 + np.exp(-p)))
    preds = [dict(
        hm=jnp.asarray(hm), reg=jnp.asarray(reg),
        height=jnp.zeros((1, H, W, 1)), dim=jnp.asarray(dim),
        rot=jnp.asarray(rot), vel=jnp.zeros((1, H, W, 2)),
        iou=jnp.zeros((1, H, W, 1)),
    )]
    return preds, np.asarray(centers), np.asarray(peaks)


def _run(preds, cap):
    cfg = dataclasses.replace(ProposalConfig(), nms_cap=cap)
    out = jax.jit(
        lambda p: generate_proposals(
            p, cfg, (("car",),), PC_RANGE, VOXEL, OSF, training=False
        )
    )(preds)
    return jax.tree.map(np.asarray, out)


def _kept_set(out):
    m = out["mask"][0]
    b = out["boxes"][0][m]
    order = np.lexsort((b[:, 1], b[:, 0]))
    return b[order], out["scores"][0][m][order], out["labels"][0][m][order]


@pytest.mark.parametrize(
    "n_side,dup,spacing",
    [
        (13, 4, 13),  # 169 clusters × 4 dups = 676 candidates > cap=512
        (16, 3, 10),  # 256 clusters × 3 dups = 768 candidates, tighter packing
    ],
)
def test_nms_cap_matches_reference_1500_semantics(n_side, dup, spacing):
    preds, centers, peaks = _dense_scene(n_side, dup, spacing)
    n_above = int((np.asarray(preds[0]["hm"]) > 0).sum())
    assert n_above > 512, f"scene not dense enough ({n_above} candidates)"

    capped = _run(preds, cap=512)
    full = _run(preds, cap=1500)  # reference semantics: all 1500 enter NMS

    kb, ks, kl = _kept_set(capped)
    fb, fs, fl = _kept_set(full)
    # the kept set saturates post_max (dense scene) and is IDENTICAL
    assert kb.shape[0] == fb.shape[0] == 100
    np.testing.assert_array_equal(kl, fl)
    np.testing.assert_allclose(kb, fb, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(ks, fs, rtol=1e-6, atol=1e-6)

    # and the kept set is the right one: the top-100 clusters by peak score,
    # one detection per cluster at its center
    top = np.argsort(-peaks)[:100]
    want = centers[np.sort(top)]
    got = np.stack([fb[:, 0], fb[:, 1]], -1)
    want = want[np.lexsort((want[:, 1], want[:, 0]))]
    d = np.hypot(got[:, 0] - want[:, 0], got[:, 1] - want[:, 1])
    assert (d < 1.3).all(), d.max()  # within ~2 cells of the planted peak
