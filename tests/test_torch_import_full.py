"""Whole-model torch-import round trip (VERDICT r1 item 5).

Builds a synthetic state dict with the reference's EXACT module paths and
tensor layouts at real nuScenes shapes (module tree from
…BEVFusion_nuscenes_base_exp.py:40-135, spconv_backbone.py:253-343,
center_head.py:58-99/311-375, lss_fpn.py:143-171), runs
`convert_state_dict`, and asserts:

  1. every leaf of our fusion model's param/batch_stats tree is covered
     with the right shape (used == total, skipped == 0 in
     shape_filtered_merge terms) — a key-naming slip would otherwise fall
     silently into the "kept from init" bucket and destroy mAP parity;
  2. every reference tensor was consumed (nothing silently ignored),
     except BN `num_batches_tracked` counters.
"""
import numpy as np
import pytest

import jax

from unidistill_tpu.configs.nuscenes import fusion_exp
from unidistill_tpu.models.bevfusion import BEVFusionCenterHead
from unidistill_tpu.training.torch_import import convert_state_dict

pytestmark = pytest.mark.slow  # heavy e2e: excluded from the default fast suite


class RecordingDict(dict):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.read_keys = set()

    def __getitem__(self, k):
        self.read_keys.add(k)
        return super().__getitem__(k)

    def __contains__(self, k):
        # membership probes don't count as consumption
        return super().__contains__(k)


# weight filler: zeros for the shape-coverage test; test_full_model_golden
# swaps in a random rng-backed filler to drive the composed-numerics golden
_RNG = None


def _fill(*shape):
    if _RNG is None:
        return np.zeros(shape, np.float32)
    # small weights keep activations in a well-conditioned range through
    # the ~60-conv composed pipeline
    fan_in = int(np.prod(shape[1:])) or 1
    return (_RNG.normal(0, 1.0, shape) * (1.2 / np.sqrt(fan_in))).astype(
        np.float32
    )


def _bn(sd, prefix, ch):
    if _RNG is None:
        sd[f"{prefix}.weight"] = np.ones(ch, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(ch, np.float32)
        sd[f"{prefix}.running_mean"] = np.zeros(ch, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(ch, np.float32)
    else:
        sd[f"{prefix}.weight"] = _RNG.normal(1, 0.1, ch).astype(np.float32)
        sd[f"{prefix}.bias"] = _RNG.normal(0, 0.1, ch).astype(np.float32)
        sd[f"{prefix}.running_mean"] = _RNG.normal(0, 0.1, ch).astype(
            np.float32
        )
        sd[f"{prefix}.running_var"] = _RNG.uniform(0.5, 2.0, ch).astype(
            np.float32
        )
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _conv(sd, prefix, cout, cin, k, bias=False):
    sd[f"{prefix}.weight"] = _fill(cout, cin, k, k)
    if bias:
        sd[f"{prefix}.bias"] = _fill(cout)


def _deconv(sd, prefix, cin, cout, k):
    sd[f"{prefix}.weight"] = _fill(cin, cout, k, k)


def _spconv(sd, prefix, cout, cin, ksz, bias=False):
    kz, ky, kx = ksz
    # spconv >= 2.x native layout (O, kz, ky, kx, I)
    sd[f"{prefix}.weight"] = _fill(cout, kz, ky, kx, cin)
    if bias:
        sd[f"{prefix}.bias"] = _fill(cout)


def build_reference_state_dict(cfg, rng=None) -> RecordingDict:
    global _RNG
    _RNG = rng
    sd = RecordingDict()

    # ---- lidar_encoder.backbone_3d (spconv_backbone.py:253-343) ----------
    t = "lidar_encoder.backbone_3d"
    _spconv(sd, f"{t}.conv_input.0", 16, 5, (3, 3, 3))
    _bn(sd, f"{t}.conv_input.1", 16)
    for blk in (0, 1):  # conv1: two SparseBasicBlocks
        tb = f"{t}.conv1.{blk}"
        _spconv(sd, f"{tb}.conv1", 16, 16, (3, 3, 3), bias=True)
        _spconv(sd, f"{tb}.conv2", 16, 16, (3, 3, 3), bias=True)
        _bn(sd, f"{tb}.bn1", 16)
        _bn(sd, f"{tb}.bn2", 16)
    for tname, cin, cout in (("conv2", 16, 32), ("conv3", 32, 64),
                             ("conv4", 64, 128)):
        _spconv(sd, f"{t}.{tname}.0.0", cout, cin, (3, 3, 3))
        _bn(sd, f"{t}.{tname}.0.1", cout)
        for blk in (1, 2):
            tb = f"{t}.{tname}.{blk}"
            _spconv(sd, f"{tb}.conv1", cout, cout, (3, 3, 3), bias=True)
            _spconv(sd, f"{tb}.conv2", cout, cout, (3, 3, 3), bias=True)
            _bn(sd, f"{tb}.bn1", cout)
            _bn(sd, f"{tb}.bn2", cout)
    _spconv(sd, f"{t}.conv_out.0", 128, 128, (3, 1, 1))
    _bn(sd, f"{t}.conv_out.1", 128)

    # ---- camera_encoder.backbone (lss_fpn.py:143-171) --------------------
    cam = "camera_encoder.backbone"
    rb = f"{cam}.img_backbone"
    sd[f"{rb}.conv1.weight"] = np.zeros((64, 3, 7, 7), np.float32)
    _bn(sd, f"{rb}.bn1", 64)
    inplanes = 64
    for stage, (planes, n) in enumerate(zip((64, 128, 256, 512), (3, 4, 6, 3))):
        for blk in range(n):
            tb = f"{rb}.layer{stage + 1}.{blk}"
            cin = inplanes if blk == 0 else planes * 4
            _conv(sd, f"{tb}.conv1", planes, cin, 1)
            _conv(sd, f"{tb}.conv2", planes, planes, 3)
            _conv(sd, f"{tb}.conv3", planes * 4, planes, 1)
            for bn, ch in (("bn1", planes), ("bn2", planes),
                           ("bn3", planes * 4)):
                _bn(sd, f"{tb}.{bn}", ch)
            if blk == 0:
                _conv(sd, f"{tb}.downsample.0", planes * 4, cin, 1)
                _bn(sd, f"{tb}.downsample.1", planes * 4)
        inplanes = planes * 4

    ccfg = cfg.camera_encoder
    for i, (cin, s, cout) in enumerate(zip(
        ccfg.img_neck_in_channels, ccfg.img_neck_upsample_strides,
        ccfg.img_neck_out_channels,
    )):
        if s >= 1:
            _deconv(sd, f"{cam}.img_neck.deblocks.{i}.0", cin, cout, int(s))
        else:
            _conv(sd, f"{cam}.img_neck.deblocks.{i}.0", cout, cin,
                  int(round(1 / s)))
        _bn(sd, f"{cam}.img_neck.deblocks.{i}.1", cout)

    neck_out = sum(ccfg.img_neck_out_channels)
    _conv(sd, f"{cam}.depth_net.0",
          ccfg.depth_channels + ccfg.output_channels, neck_out, 1, bias=True)

    # ---- fusion_encoder (…base_exp.py:107-135) ---------------------------
    _conv(sd, "fusion_encoder.att.1", 512, 512, 1, bias=True)
    _conv(sd, "fusion_encoder.reduce_conv.0", 256, 512, 3)
    _bn(sd, "fusion_encoder.reduce_conv.1", 256)

    # ---- bev_encoder.backbone_2d (base_bev_backbone.py:10-174) -----------
    bev = "bev_encoder.backbone_2d"
    bcfg = cfg.bev_encoder
    cin = cfg.lidar_encoder.map_to_bev_num_features
    for i, (n, f, up) in enumerate(zip(
        bcfg.layer_nums, bcfg.num_filters, bcfg.num_upsample_filters
    )):
        _conv(sd, f"{bev}.blocks.{i}.1", f, cin, 3)
        _bn(sd, f"{bev}.blocks.{i}.2", f)
        for k in range(n):
            _conv(sd, f"{bev}.blocks.{i}.{4 + 3 * k}", f, f, 3)
            _bn(sd, f"{bev}.blocks.{i}.{5 + 3 * k}", f)
        s = bcfg.upsample_strides[i]
        if s >= 1:
            _deconv(sd, f"{bev}.deblocks.{i}.0", f, up, int(s))
        else:
            _conv(sd, f"{bev}.deblocks.{i}.0", up, f, int(round(1 / s)))
        _bn(sd, f"{bev}.deblocks.{i}.1", up)
        cin = f

    # ---- det_head.dense_head (center_head.py:58-99, 311-375) -------------
    dh = "det_head.dense_head"
    _conv(sd, f"{dh}.shared_conv.0", cfg.det_head.share_conv_channel,
          cfg.det_head.input_channels, 3, bias=True)
    _bn(sd, f"{dh}.shared_conv.1", cfg.det_head.share_conv_channel)
    for tid, classes in enumerate(cfg.tasks):
        for name, (ch, _nc) in tuple(cfg.det_head.common_heads) + (
            ("hm", (len(classes), 2)),
        ):
            tb = f"{dh}.tasks.{tid}.{name}"
            _conv(sd, f"{tb}.0", 64, 64, 3, bias=True)
            _bn(sd, f"{tb}.1", 64)
            _conv(sd, f"{tb}.3", ch, 64, 3, bias=True)
    sd["det_head.dense_head.auto_loss.params"] = np.ones(
        len(cfg.det_head.code_weights) + 2, np.float32
    )
    globals()["_RNG"] = None  # reset the module-level filler
    return sd


def test_full_fusion_state_dict_round_trip():
    cfg = fusion_exp().model
    sd = build_reference_state_dict(cfg)
    params, stats = convert_state_dict(sd, cfg)

    # target tree via eval_shape (no FLOPs, real shapes)
    from unidistill_tpu.training.steps import model_inputs
    from __graft_entry__ import _synth_batch

    model = BEVFusionCenterHead(cfg)
    batch = jax.tree.map(jax.numpy.asarray, _synth_batch(cfg, B=1))
    kw = model_inputs(batch, cfg, training=False)
    target = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), **kw, train=False)
    )

    def leaves(tree):
        return {
            jax.tree_util.keystr(p): tuple(np.shape(v))
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    got_p, want_p = leaves(params), leaves(target["params"])
    got_s, want_s = leaves(stats), leaves(target.get("batch_stats", {}))

    missing = sorted(set(want_p) - set(got_p)) + sorted(set(want_s) - set(got_s))
    extra = sorted(set(got_p) - set(want_p)) + sorted(set(got_s) - set(want_s))
    assert not missing, f"params missing from conversion (kept-from-init!): {missing[:10]}"
    assert not extra, f"converted params our model doesn't have: {extra[:10]}"
    bad = [
        (k, got_p[k], want_p[k]) for k in want_p if got_p[k] != want_p[k]
    ] + [(k, got_s[k], want_s[k]) for k in want_s if got_s[k] != want_s[k]]
    assert not bad, f"shape mismatches: {bad[:10]}"

    unread = {
        k for k in sd if k not in sd.read_keys
        and not k.endswith("num_batches_tracked")
    }
    assert not unread, f"reference tensors silently ignored: {sorted(unread)[:10]}"
