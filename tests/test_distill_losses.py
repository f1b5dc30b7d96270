"""Distillation losses vs torch oracles replicating the reference math
(ref …camera_exp_distill_lidar.py:196-385). Validates 9-point sampling
(incl. the grid_sample x/y swap), Gram relation, Gaussian-masked response,
and the corner generation chain."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from unidistill_tpu.losses.distill import (  # noqa: E402
    bev_distill_loss,
    feature_distill_loss,
    gt_corners_bev,
    response_distill_loss,
)

PC_RANGE = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
VOXEL = (0.075, 0.075, 0.2)
OSF = 8


def _torch_nine_point_sample(feat_nchw, corners):
    """ref :200-234 — mean-of-pairs edges, normalize, swap, grid_sample."""
    g = torch.from_numpy(corners.copy())
    center = g.mean(2, keepdim=True)
    e1 = g[:, :, [0, 1]].mean(2, keepdim=True)
    e2 = g[:, :, [1, 2]].mean(2, keepdim=True)
    e3 = g[:, :, [2, 3]].mean(2, keepdim=True)
    e4 = g[:, :, [0, 3]].mean(2, keepdim=True)
    allp = torch.cat([g, center, e1, e2, e3, e4], 2)
    h, w = feat_nchw.shape[-2:]
    allp[..., 0] = (allp[..., 0] - w / 2) / (w / 2)
    allp[..., 1] = (allp[..., 1] - h / 2) / (h / 2)
    allp = allp[..., [1, 0]]
    out = torch.nn.functional.grid_sample(torch.from_numpy(feat_nchw), allp)
    return out.permute(0, 2, 3, 1)  # [B, G, 9, C]


def _torch_feature_loss(fs, ft, corners, idx):
    s = _torch_nine_point_sample(fs, corners)
    t = _torch_nine_point_sample(ft, corners)
    l1 = torch.nn.functional.l1_loss(s[idx], t[idx], reduction="none")
    l1 = l1.mean(2).mean(1).sum()
    w = idx.float().sum()
    return (l1 / (w + 1e-4)).item()


def _torch_bev_loss(fs, ft, corners, idx):
    s = _torch_nine_point_sample(fs, corners)
    t = _torch_nine_point_sample(ft, corners)

    def rel(x):
        x = x.contiguous().view(-1, x.shape[-2], x.shape[-1])
        x = x / (torch.norm(x, dim=-1, keepdim=True) + 1e-4)
        r = torch.bmm(x, x.transpose(1, 2))
        return r.view(corners.shape[0], corners.shape[1], 9, 9)

    l1 = torch.nn.functional.l1_loss(rel(s)[idx], rel(t)[idx], reduction="none")
    l1 = l1.mean(2).mean(1).sum()
    w = idx.float().sum()
    return (l1 / (w + 1e-4)).item()


def _make_data(rng, B=2, G=6, C=8, H=32, W=32):
    gt = np.zeros((B, G, 10), np.float32)
    for b in range(B):
        n = rng.randint(2, G)
        gt[b, :n, 0:2] = rng.uniform(-40, 40, (n, 2))
        gt[b, :n, 3:6] = rng.uniform(2, 8, (n, 3))
        gt[b, :n, 6] = rng.uniform(-3, 3, n)
        gt[b, :n, 9] = rng.randint(1, 11, n)
    mask = np.abs(gt).sum(-1) > 0
    fs = rng.randn(B, C, H, W).astype(np.float32)
    ft = rng.randn(B, C, H, W).astype(np.float32)
    return gt, mask, fs, ft


def _ref_corners(gt, H, W):
    """Reference corner chain (center_to_corner_box2d + cell scaling,
    ref :466-483) in numpy."""
    B, G = gt.shape[:2]
    out = np.zeros((B, G, 4, 2), np.float32)
    corners_norm = np.stack(np.unravel_index(np.arange(4), [2, 2]), 1)[
        [0, 1, 3, 2]
    ] - 0.5
    for b in range(B):
        dims = gt[b, :, 3:5]
        ang = gt[b, :, 6]
        corners = dims.reshape(-1, 1, 2) * corners_norm.reshape(1, 4, 2)
        rs, rc = np.sin(ang), np.cos(ang)
        rot = np.stack([[rc, rs], [-rs, rc]])  # [2, 2, N]
        corners = np.einsum("aij,jka->aik", corners, rot)
        corners += gt[b, :, :2].reshape(-1, 1, 2)
        out[b] = corners
    out[..., 0] = (out[..., 0] - PC_RANGE[0]) / (VOXEL[0] * OSF)
    out[..., 1] = (out[..., 1] - PC_RANGE[1]) / (VOXEL[1] * OSF)
    return out


def test_gt_corners_match_reference_chain():
    rng = np.random.RandomState(0)
    gt, _, _, _ = _make_data(rng)
    ours = np.asarray(gt_corners_bev(jnp.asarray(gt), PC_RANGE, VOXEL, OSF))
    ref = _ref_corners(gt, 180, 180)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_feature_distill_loss_matches_torch():
    rng = np.random.RandomState(1)
    gt, mask, fs, ft = _make_data(rng)
    corners = _ref_corners(gt, 32, 32)
    ref = _torch_feature_loss(fs, ft, corners, torch.from_numpy(mask))
    ours = float(
        feature_distill_loss(
            jnp.asarray(fs.transpose(0, 2, 3, 1)),
            jnp.asarray(ft.transpose(0, 2, 3, 1)),
            jnp.asarray(corners), jnp.asarray(mask),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_bev_distill_loss_matches_torch():
    rng = np.random.RandomState(2)
    gt, mask, fs, ft = _make_data(rng, C=16)
    corners = _ref_corners(gt, 32, 32)
    ref = _torch_bev_loss(fs, ft, corners, torch.from_numpy(mask))
    ours = float(
        bev_distill_loss(
            jnp.asarray(fs.transpose(0, 2, 3, 1)),
            jnp.asarray(ft.transpose(0, 2, 3, 1)),
            jnp.asarray(corners), jnp.asarray(mask),
        )
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_response_distill_loss_matches_torch():
    rng = np.random.RandomState(3)
    B, H, W = 2, 180, 180
    gt, mask, _, _ = _make_data(rng, B=B)
    tasks_ncls = [1, 2, 2, 1, 2, 2]

    def mk(sig=False):
        resp = []
        for n in tasks_ncls:
            hm = rng.randn(B, H, W, n).astype(np.float32)
            if sig:
                hm = np.clip(1 / (1 + np.exp(-hm)), 1e-4, 1 - 1e-4)
            resp.append(
                dict(
                    hm=hm,
                    reg=rng.randn(B, H, W, 2).astype(np.float32),
                    height=rng.randn(B, H, W, 1).astype(np.float32),
                    dim=rng.randn(B, H, W, 3).astype(np.float32),
                    rot=rng.randn(B, H, W, 2).astype(np.float32),
                    vel=rng.randn(B, H, W, 2).astype(np.float32),
                    iou=rng.randn(B, H, W, 1).astype(np.float32),
                )
            )
        return resp

    resp_s = mk(sig=True)  # student hm already sigmoided (head-loss side effect)
    resp_t = mk(sig=False)  # teacher raw logits

    ours_cls, ours_reg = response_distill_loss(
        [
            {k: jnp.asarray(v) for k, v in r.items()} for r in resp_s
        ],
        [
            {k: jnp.asarray(v) for k, v in r.items()} for r in resp_t
        ],
        jnp.asarray(gt), PC_RANGE, VOXEL, OSF,
        teacher_hm_temp=2.0, teacher_hm_clamp=1e-4,
    )

    # torch oracle (ref :326-385)
    def cat_t(resp, key_order=("reg", "height", "dim", "rot", "vel", "iou")):
        outs = []
        for r in resp:
            outs.append(
                torch.cat([torch.from_numpy(r[k]).permute(0, 3, 1, 2)
                           for k in key_order], 1)
            )
        return torch.cat(outs, 1)

    cls_s = torch.cat(
        [torch.from_numpy(r["hm"]).permute(0, 3, 1, 2) for r in resp_s], 1
    )
    cls_t = torch.cat(
        [
            torch.clamp(torch.sigmoid(
                torch.from_numpy(r["hm"]).permute(0, 3, 1, 2) / 2
            ), 1e-4, 1 - 1e-4)
            for r in resp_t
        ],
        1,
    )
    reg_s, reg_t = cat_t(resp_s), cat_t(resp_t)
    cls_max_s = cls_s.max(1)[0]
    cls_max_t = cls_t.max(1)[0]

    from unidistill_tpu.ops.gaussian import box_mask_gaussian

    gmask = torch.from_numpy(np.asarray(
        box_mask_gaussian(jnp.asarray(gt), (H, W), PC_RANGE, VOXEL, OSF)
    ))
    diff_reg = (reg_s - reg_t).abs().mean(1) * gmask
    diff_cls = (cls_max_s - cls_max_t).abs() * gmask
    w = gmask.sum()
    ref_reg = (diff_reg.sum() / (w + 1e-4)).item()
    ref_cls = (diff_cls.sum() / (w + 1e-4)).item()

    np.testing.assert_allclose(float(ours_reg), ref_reg, rtol=1e-4)
    np.testing.assert_allclose(float(ours_cls), ref_cls, rtol=1e-4)
