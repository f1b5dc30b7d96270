"""Loss-function oracle tests + psum-in-loss multi-device semantics
(SURVEY.md §4: reference lines losses/det3d.py:313,353,414) + decode sanity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from unidistill_tpu.configs.nuscenes import ProposalConfig, TASKS
from unidistill_tpu.decode.proposals import generate_proposals
from unidistill_tpu.losses.det import (
    clamped_sigmoid,
    focal_loss,
    gather_feat_2d,
    reg_loss,
)


def test_focal_loss_matches_numpy():
    rng = np.random.RandomState(0)
    pred = np.clip(rng.uniform(0, 1, (2, 8, 8, 3)), 1e-4, 1 - 1e-4).astype(np.float32)
    gt = (rng.uniform(0, 1, (2, 8, 8, 3)) > 0.9).astype(np.float32)
    alpha, gamma = 0.25, 2.0

    ours = float(focal_loss(jnp.asarray(pred), jnp.asarray(gt), alpha, gamma, None))

    pos = (gt == 1).astype(np.float32)
    neg = (gt == 0).astype(np.float32)
    pl = (np.log(pred) * (1 - pred) ** gamma * pos * alpha).sum()
    nl = (np.log(1 - pred + 1e-4) * pred**gamma * neg * (1 - alpha)).sum()
    ref = -(pl + nl) / pos.sum()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_reg_loss_matches_numpy():
    rng = np.random.RandomState(1)
    B, H, W, D, Pn = 2, 6, 6, 4, 5
    pred = rng.randn(B, H, W, D).astype(np.float32)
    ind = rng.randint(0, H * W, (B, Pn))
    target = rng.randn(B, Pn, D).astype(np.float32)
    target[0, 2, 1] = np.nan  # nan targets are ignored (ref det3d.py:403)
    mask = rng.uniform(0, 1, (B, Pn)) > 0.4

    ours = np.asarray(
        reg_loss(jnp.asarray(pred), jnp.asarray(mask), jnp.asarray(ind),
                 jnp.asarray(target), None)
    )

    gathered = pred.reshape(B, H * W, D)[np.arange(B)[:, None], ind]
    m = mask[..., None] * np.isfinite(target)
    t = np.where(np.isfinite(target), target, 0.0)
    ref = np.abs(gathered * m - t * m).sum((0, 1)) / (mask.sum() + 1e-4)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_psum_normalization_multi_device():
    """reduce_mean(num_pos) inside the loss == global positive count / world
    size. Verify shard_map-pmean result equals the single-device computation
    on the concatenated batch."""
    devices = jax.devices()
    assert len(devices) == 8, "conftest must force 8 CPU devices"
    mesh = Mesh(np.array(devices), ("dp",))
    rng = np.random.RandomState(2)
    B, H, W, D, Pn = 8, 4, 4, 2, 3
    pred = rng.randn(B, H, W, D).astype(np.float32)
    ind = rng.randint(0, H * W, (B, Pn))
    target = rng.randn(B, Pn, D).astype(np.float32)
    mask = rng.uniform(0, 1, (B, Pn)) > 0.3

    def sharded(pred, mask, ind, target):
        # per-device loss with pmean normalizer; average across devices gives
        # the same value the reference's DDP all-reduce produces
        l = reg_loss(pred, mask, ind, target, "dp").sum()
        return jax.lax.pmean(l, "dp")

    f = jax.jit(
        jax.shard_map(
            sharded,
            mesh=mesh,
            in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
            out_specs=P(),
        )
    )
    distributed = float(f(pred, mask, ind, target))

    # reference semantics on one device: per-replica sums / mean(num_pos),
    # averaged over replicas
    per = []
    for i in range(8):
        s = slice(i, i + 1)
        gathered = pred[s].reshape(1, H * W, D)[np.arange(1)[:, None], ind[s]]
        m = mask[s][..., None].astype(np.float32)
        num_mean = mask.sum() / 8.0
        per.append(np.abs(gathered * m - target[s] * m).sum() / (num_mean + 1e-4))
    np.testing.assert_allclose(distributed, np.mean(per), rtol=1e-5)


def test_decode_recovers_planted_peak():
    cfg = ProposalConfig()
    B, H, W = 1, 32, 32
    preds = []
    for tid, classes in enumerate(TASKS):
        ncls = len(classes)
        pd = {
            "hm": jnp.full((B, H, W, ncls), -10.0),
            "reg": jnp.zeros((B, H, W, 2)),
            "height": jnp.zeros((B, H, W, 1)),
            "dim": jnp.zeros((B, H, W, 3)),
            "rot": jnp.zeros((B, H, W, 2)),
            "vel": jnp.zeros((B, H, W, 2)),
            "iou": jnp.zeros((B, H, W, 1)),
        }
        if tid == 0:
            pd["hm"] = pd["hm"].at[0, 10, 20, 0].set(6.0)  # one car at (y=10, x=20)
            pd["reg"] = pd["reg"].at[0, 10, 20].set(jnp.asarray([0.25, 0.5]))
            pd["height"] = pd["height"].at[0, 10, 20, 0].set(1.5)
            pd["rot"] = pd["rot"].at[0, 10, 20].set(jnp.asarray([0.0, 1.0]))
        preds.append(pd)

    out = generate_proposals(
        preds, cfg, TASKS, (-54.0, -54.0), (0.075, 0.075), 8, training=False
    )
    mask = np.asarray(out["mask"])
    assert mask.sum() == 1
    box = np.asarray(out["boxes"])[mask][0]
    np.testing.assert_allclose(box[0], (20 + 0.25) * 8 * 0.075 - 54.0, rtol=1e-5)
    np.testing.assert_allclose(box[1], (10 + 0.5) * 8 * 0.075 - 54.0, rtol=1e-5)
    np.testing.assert_allclose(box[2], 1.5, rtol=1e-5)
    np.testing.assert_allclose(box[3:6], np.exp(0.0), rtol=1e-5)
    assert np.asarray(out["labels"])[mask][0] == 1
    s = np.asarray(out["scores"])[mask][0]
    np.testing.assert_allclose(s, 1 / (1 + np.exp(-6.0)), rtol=1e-5)


def test_decode_nms_suppresses_duplicates():
    cfg = ProposalConfig()
    B, H, W = 1, 32, 32
    preds = []
    for tid, classes in enumerate(TASKS):
        ncls = len(classes)
        pd = {
            "hm": jnp.full((B, H, W, ncls), -10.0),
            "reg": jnp.zeros((B, H, W, 2)),
            "height": jnp.zeros((B, H, W, 1)),
            "dim": jnp.full((B, H, W, 3), 1.0),  # exp(1) ≈ 2.7 m boxes
            "rot": jnp.zeros((B, H, W, 2)).at[..., 1].set(1.0),
            "vel": jnp.zeros((B, H, W, 2)),
            "iou": jnp.zeros((B, H, W, 1)),
        }
        if tid == 0:
            # two adjacent cells → heavily overlapping boxes; thresh 0.1 keeps 1
            pd["hm"] = pd["hm"].at[0, 10, 20, 0].set(6.0)
            pd["hm"] = pd["hm"].at[0, 10, 21, 0].set(5.0)
        preds.append(pd)

    out = generate_proposals(
        preds, cfg, TASKS, (-54.0, -54.0), (0.075, 0.075), 8, training=False
    )
    assert np.asarray(out["mask"]).sum() == 1
