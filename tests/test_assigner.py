"""Vectorized FCOS assigner vs a faithful numpy port of the reference loop
(ref fcos_assigner.py:73-285; SURVEY.md §4 'FCOS assigner vs the reference
loop semantics (top-9, nearest-GT)')."""
import math

import numpy as np

import jax.numpy as jnp

from unidistill_tpu.configs.nuscenes import (
    AssignerConfig,
    CLASS_TO_IDX,
    TASKS,
)
from unidistill_tpu.targets.assigner import assign_targets

PC_RANGE = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
VOXEL = (0.075, 0.075, 0.2)
GRID = (1440, 1440, 40)
OSF = 8


def _np_reference_assign(gt_boxes, topk=9):
    """Numpy port of FCOSAssigner.assign_targets (per-task dicts)."""
    W = GRID[0] // OSF
    H = GRID[1] // OSF
    xs = (np.arange(H * W) % W) * OSF
    ys = (np.arange(H * W) // W) * OSF
    anchors = np.stack([xs, ys], -1).astype(np.float64)

    B = gt_boxes.shape[0]
    out = []
    for task_classes in TASKS:
        res = dict(heatmap=[], ind=[], mask=[], box_encoding=[], cat=[])
        for k in range(B):
            cur = gt_boxes[k]
            cnt = len(cur) - 1
            while cnt > 0 and np.abs(cur[cnt]).sum() == 0:
                cnt -= 1
            cur = cur[: cnt + 1]
            cls = cur[:, -1].astype(int)
            boxes = cur[:, :-1].astype(np.float64).copy()

            sel_boxes, sel_cls = [], []
            for off, name in enumerate(task_classes):
                m = cls == CLASS_TO_IDX[name]
                sel_boxes.append(boxes[m])
                sel_cls.append(np.full(m.sum(), off))
            tb = np.concatenate(sel_boxes, 0)
            tc = np.concatenate(sel_cls, 0)

            hm = np.zeros((H * W, len(task_classes)), np.float32)
            if len(tb) == 0:
                res["heatmap"].append(hm.reshape(H, W, -1))
                res["ind"].append(np.zeros(0, int))
                res["mask"].append(np.zeros(0, bool))
                res["box_encoding"].append(np.zeros((0, 10), np.float32))
                res["cat"].append(np.zeros(0, int))
                continue

            tb[:, 0] = (tb[:, 0] - PC_RANGE[0]) / VOXEL[0]
            tb[:, 1] = (tb[:, 1] - PC_RANGE[1]) / VOXEL[1]
            tb[:, 3] = tb[:, 3] / VOXEL[0]
            tb[:, 4] = tb[:, 4] / VOXEL[1]
            tb[:, 6] = tb[:, 6] - np.floor(tb[:, 6] / (2 * math.pi) + 0.5) * 2 * math.pi

            d2 = ((anchors[:, None, :] - tb[None, :, :2]) ** 2).sum(-1)  # [ANC, G]
            topk_inds = np.argsort(d2, axis=0, kind="stable")[:topk].T  # [G, topk]
            pos_mask = np.zeros(H * W, bool)
            pos_mask[topk_inds.ravel()] = True
            gt_ids = d2.argmin(axis=1)
            pos_idx = np.where(pos_mask)[0]
            pg = gt_ids[pos_idx]
            cat = tc[pg]
            hm[pos_idx, cat] = 1.0
            loc = tb[pg]
            pa = anchors[pos_idx]
            enc = np.concatenate(
                [
                    (loc[:, 0:2] - pa) / OSF,
                    loc[:, 2:3],
                    np.log(loc[:, 3:4] * VOXEL[0]),
                    np.log(loc[:, 4:5] * VOXEL[1]),
                    np.log(loc[:, 5:6]),
                    np.sin(loc[:, 6:7]),
                    np.cos(loc[:, 6:7]),
                    loc[:, 7:9],
                ],
                1,
            ).astype(np.float32)
            res["heatmap"].append(hm.reshape(H, W, -1))
            res["ind"].append(pos_idx)
            res["mask"].append(np.ones(len(pos_idx), bool))
            res["box_encoding"].append(enc)
            res["cat"].append(cat)
        out.append(res)
    return out


def _make_gt(rng, B=2, G=24):
    gt = np.zeros((B, G, 10), np.float32)
    for b in range(B):
        n = rng.randint(3, G)
        gt[b, :n, 0:2] = rng.uniform(-50, 50, (n, 2))
        gt[b, :n, 2] = rng.uniform(-2, 1, n)
        gt[b, :n, 3:6] = rng.uniform(0.5, 10, (n, 3))
        gt[b, :n, 6] = rng.uniform(-6, 6, n)
        gt[b, :n, 7:9] = rng.uniform(-3, 3, (n, 2))
        gt[b, :n, 9] = rng.randint(1, 11, n)
    return gt


def test_assigner_matches_reference_loop():
    rng = np.random.RandomState(42)
    gt = _make_gt(rng)
    cfg = AssignerConfig()
    ours = assign_targets(jnp.asarray(gt), cfg, TASKS, GRID, PC_RANGE, VOXEL)
    ref = _np_reference_assign(gt, topk=cfg.topk)

    for tid in range(len(TASKS)):
        o = ours[tid]
        np.testing.assert_allclose(
            np.asarray(o["heatmap"]),
            np.stack(ref[tid]["heatmap"]),
            atol=1e-6,
        )
        for b in range(gt.shape[0]):
            npos = int(np.asarray(o["mask"])[b].sum())
            assert npos == len(ref[tid]["ind"][b]), (tid, b)
            np.testing.assert_array_equal(
                np.asarray(o["ind"])[b, :npos], ref[tid]["ind"][b]
            )
            np.testing.assert_array_equal(
                np.asarray(o["cat"])[b, :npos], ref[tid]["cat"][b]
            )
            np.testing.assert_allclose(
                np.asarray(o["box_encoding"])[b, :npos],
                ref[tid]["box_encoding"][b],
                rtol=2e-4, atol=2e-4,
            )
            # padding is zeroed
            assert np.abs(np.asarray(o["box_encoding"])[b, npos:]).sum() == 0


def test_assigner_empty_frame():
    gt = np.zeros((1, 8, 10), np.float32)
    cfg = AssignerConfig()
    ours = assign_targets(jnp.asarray(gt), cfg, TASKS, GRID, PC_RANGE, VOXEL)
    for t in ours:
        assert np.asarray(t["mask"]).sum() == 0
        assert np.abs(np.asarray(t["heatmap"])).sum() == 0
