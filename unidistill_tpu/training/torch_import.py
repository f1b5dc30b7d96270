"""Torch→JAX weight conversion for reference checkpoints.

The reference ships raw torch `{"model_state": ...}` dicts
(…camera_exp_distill_lidar.py:403-416). This module converts them into our
flax param/batch_stats trees (SURVEY.md §7 hard part #5: includes BN stats and
spconv kernel layouts).

Layout rules:
  * Conv2d  [O, I, kh, kw]            → flax Conv kernel [kh, kw, I, O]
  * ConvTranspose2d [I, O, kh, kw]    → flax ConvTranspose kernel [kh, kw, I, O]
    (all reference deconvs have kernel == stride, where torch and
    lax.conv_transpose agree with a plain transpose — verified in tests)
  * Linear [O, I]                     → [I, O]
  * BatchNorm weight/bias/running_*   → scale/bias + batch_stats mean/var
  * spconv 3D conv [O, kz, ky, kx, I] (spconv ≥2.x KRSC layout)
                                       → our [K=kz·ky·kx, I, O]
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def conv2d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def conv_transpose2d(w: np.ndarray) -> np.ndarray:
    # flax ConvTranspose (lax.conv_transpose) convolves with the kernel as-is
    # while torch's transposed conv applies it mirror-imaged → flip spatial.
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


def spconv3d(w: np.ndarray, cin: int, cout: int) -> np.ndarray:
    """spconv kernel → [K, Cin, Cout], auto-detecting layout by shape."""
    w = np.asarray(w)
    if w.ndim == 5:
        if w.shape[0] == cout and w.shape[-1] == cin:  # (O, kz, ky, kx, I)
            w = np.transpose(w, (1, 2, 3, 4, 0))  # (kz, ky, kx, I, O)
        elif w.shape[-1] == cout and w.shape[-2] == cin:  # (kz, ky, kx, I, O)
            pass
        elif w.shape[0] == cin and w.shape[-1] == cout:  # (I, kz, ky, kx, O)
            w = np.transpose(w, (1, 2, 3, 0, 4))
        else:
            raise ValueError(f"unrecognized spconv layout {w.shape}")
        return w.reshape(-1, cin, cout)
    raise ValueError(f"unexpected spconv weight ndim {w.ndim}")


def _bn(sd: Dict[str, np.ndarray], prefix: str):
    return (
        dict(scale=sd[f"{prefix}.weight"], bias=sd[f"{prefix}.bias"]),
        dict(mean=sd[f"{prefix}.running_mean"], var=sd[f"{prefix}.running_var"]),
    )


class TreeBuilder:
    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.stats: Dict[str, Any] = {}

    def set(self, tree: Dict, path: str, value):
        keys = path.split("/")
        d = tree
        for k in keys[:-1]:
            d = d.setdefault(k, {})
        d[keys[-1]] = np.asarray(value)

    def add_conv(self, sd, tname, jpath, transposed=False, bias=False):
        # missing keys are skipped, not errors: the reference loads teacher
        # checkpoints with strict=False + shape filtering, so partial state
        # dicts must convert partially (…camera_exp_distill_lidar.py:407-416)
        if f"{tname}.weight" not in sd:
            return
        w = sd[f"{tname}.weight"]
        self.set(self.params, f"{jpath}/kernel",
                 conv_transpose2d(w) if transposed else conv2d(w))
        if bias and f"{tname}.bias" in sd:
            self.set(self.params, f"{jpath}/bias", sd[f"{tname}.bias"])

    def add_bn(self, sd, tname, jpath):
        if f"{tname}.weight" not in sd:
            return
        p, s = _bn(sd, tname)
        self.set(self.params, f"{jpath}/scale", p["scale"])
        self.set(self.params, f"{jpath}/bias", p["bias"])
        self.set(self.stats, f"{jpath}/mean", s["mean"])
        self.set(self.stats, f"{jpath}/var", s["var"])

    def add_spconv(self, sd, tname, jpath, cin, cout, bias=False):
        if f"{tname}.weight" not in sd:
            return
        self.set(self.params, f"{jpath}/kernel",
                 spconv3d(sd[f"{tname}.weight"], cin, cout))
        if bias and f"{tname}.bias" in sd:
            self.set(self.params, f"{jpath}/bias", sd[f"{tname}.bias"])

    def add_masked_bn(self, sd, tname, jpath):
        self.add_bn(sd, tname, jpath)


def _import_resnet50(b: TreeBuilder, sd, t: str, j: str):
    b.add_conv(sd, f"{t}.conv1", f"{j}/conv1")
    b.add_bn(sd, f"{t}.bn1", f"{j}/bn1")
    counts = [3, 4, 6, 3]
    for stage, n in enumerate(counts):
        for blk in range(n):
            tb = f"{t}.layer{stage + 1}.{blk}"
            jb = f"{j}/layer{stage + 1}_{blk}"
            for c in ("conv1", "conv2", "conv3"):
                b.add_conv(sd, f"{tb}.{c}", f"{jb}/{c}")
            for bn in ("bn1", "bn2", "bn3"):
                b.add_bn(sd, f"{tb}.{bn}", f"{jb}/{bn}")
            if f"{tb}.downsample.0.weight" in sd:
                b.add_conv(sd, f"{tb}.downsample.0", f"{jb}/downsample_conv")
                b.add_bn(sd, f"{tb}.downsample.1", f"{jb}/downsample_bn")


def _import_second_fpn(b: TreeBuilder, sd, t: str, j: str, strides):
    for i, s in enumerate(strides):
        b.add_conv(sd, f"{t}.deblocks.{i}.0", f"{j}/deblock{i}_conv",
                   transposed=(s >= 1))
        b.add_bn(sd, f"{t}.deblocks.{i}.1", f"{j}/deblock{i}_bn")


def _import_sparse_backbone(b: TreeBuilder, sd, t: str, j: str):
    """VoxelResBackBone8x (ref spconv_backbone.py:253-343)."""
    b.add_spconv(sd, f"{t}.conv_input.0", f"{j}/conv_input", 5, 16)
    b.add_bn(sd, f"{t}.conv_input.1", f"{j}/bn_input")
    # conv1: two SBBs directly
    for blk, name in ((0, "res1a"), (1, "res1b")):
        tb = f"{t}.conv1.{blk}"
        for c, ch in (("conv1", 16), ("conv2", 16)):
            b.add_spconv(sd, f"{tb}.{c}", f"{j}/{name}/{c}", 16, 16, bias=True)
        b.add_masked_bn(sd, f"{tb}.bn1", f"{j}/{name}/bn1")
        b.add_masked_bn(sd, f"{tb}.bn2", f"{j}/{name}/bn2")
    stages = (
        ("conv2", "down2", "bn2", 16, 32, ("res2a", "res2b")),
        ("conv3", "down3", "bn3", 32, 64, ("res3a", "res3b")),
        ("conv4", "down4", "bn4", 64, 128, ("res4a", "res4b")),
    )
    for tname, jdown, jbn, cin, cout, res_names in stages:
        b.add_spconv(sd, f"{t}.{tname}.0.0", f"{j}/{jdown}", cin, cout)
        b.add_masked_bn(sd, f"{t}.{tname}.0.1", f"{j}/{jbn}")
        for blk, name in enumerate(res_names):
            tb = f"{t}.{tname}.{blk + 1}"
            for c in ("conv1", "conv2"):
                b.add_spconv(sd, f"{tb}.{c}", f"{j}/{name}/{c}", cout, cout,
                             bias=True)
            b.add_masked_bn(sd, f"{tb}.bn1", f"{j}/{name}/bn1")
            b.add_masked_bn(sd, f"{tb}.bn2", f"{j}/{name}/bn2")
    b.add_spconv(sd, f"{t}.conv_out.0", f"{j}/conv_out", 128, 128)
    b.add_masked_bn(sd, f"{t}.conv_out.1", f"{j}/bn_out")


def _ln(b: TreeBuilder, sd, tname, jpath):
    if f"{tname}.weight" not in sd:
        return
    b.set(b.params, f"{jpath}/scale", sd[f"{tname}.weight"])
    b.set(b.params, f"{jpath}/bias", sd[f"{tname}.bias"])


def _linear(b: TreeBuilder, sd, tname, jpath, bias=True):
    if f"{tname}.weight" not in sd:
        return
    b.set(b.params, f"{jpath}/kernel", linear(sd[f"{tname}.weight"]))
    if bias and f"{tname}.bias" in sd:
        b.set(b.params, f"{jpath}/bias", sd[f"{tname}.bias"])


def _import_swin(b: TreeBuilder, sd, t: str, j: str, embed_dim=96,
                 depths=(2, 2, 6, 2), out_indices=(1, 2, 3)):
    """mmdet SwinTransformer state dict → our `layers/swin.SwinTransformer`
    (ref base_nuscenes_cfg.py:137-157 configures the swin-tiny variant).

    Key schema: mmdet's (`patch_embed.projection`, `stages.{i}.blocks.{j}`
    with `attn.w_msa.*`, `ffn.layers.0.0` / `ffn.layers.1`,
    `stages.{i}.downsample.{norm,reduction}`, out `norm{i}`). The patch
    merge needs a channel permutation: mmdet's Unfold emits channel-major
    (c·4 + 2ky+kx) 2×2 patches, our reshape/transpose emits position-major
    ((2ky+kx)·C + c)."""
    b.add_conv(sd, f"{t}.patch_embed.projection", f"{j}/patch_embed",
               bias=True)
    _ln(b, sd, f"{t}.patch_embed.norm", f"{j}/patch_norm")
    dim = embed_dim
    for st, depth in enumerate(depths):
        for blk in range(depth):
            tb = f"{t}.stages.{st}.blocks.{blk}"
            jb = f"{j}/stage{st}_block{blk}"
            _ln(b, sd, f"{tb}.norm1", f"{jb}/norm1")
            _ln(b, sd, f"{tb}.norm2", f"{jb}/norm2")
            am = f"{tb}.attn.w_msa"
            if f"{am}.relative_position_bias_table" in sd:
                b.set(b.params, f"{jb}/attn/relative_position_bias_table",
                      sd[f"{am}.relative_position_bias_table"])
            _linear(b, sd, f"{am}.qkv", f"{jb}/attn/qkv")
            _linear(b, sd, f"{am}.proj", f"{jb}/attn/proj")
            _linear(b, sd, f"{tb}.ffn.layers.0.0", f"{jb}/mlp_fc1")
            _linear(b, sd, f"{tb}.ffn.layers.1", f"{jb}/mlp_fc2")
        dkey = f"{t}.stages.{st}.downsample"
        if f"{dkey}.reduction.weight" in sd:
            C = dim
            # flax position-major index (2ky+kx)·C + c ← torch c·4 + 2ky+kx
            perm = np.asarray(
                [c * 4 + p for p in range(4) for c in range(C)]
            )
            nw = sd[f"{dkey}.norm.weight"][perm]
            nb = sd[f"{dkey}.norm.bias"][perm]
            b.set(b.params, f"{j}/merge_norm{st}/scale", nw)
            b.set(b.params, f"{j}/merge_norm{st}/bias", nb)
            rw = linear(sd[f"{dkey}.reduction.weight"])[perm]  # [4C, 2C]
            b.set(b.params, f"{j}/merge_reduction{st}/kernel", rw)
        dim *= 2
    for st in out_indices:
        _ln(b, sd, f"{t}.norm{st}", f"{j}/out_norm{st}")


def _import_bev_backbone(b: TreeBuilder, sd, t: str, j: str, layer_nums,
                         upsample_strides):
    for i, n in enumerate(layer_nums):
        # torch Sequential: [ZeroPad, Conv, BN, ReLU, (Conv, BN, ReLU) * n]
        b.add_conv(sd, f"{t}.blocks.{i}.1", f"{j}/block{i}_conv0")
        b.add_bn(sd, f"{t}.blocks.{i}.2", f"{j}/block{i}_bn0")
        for k in range(n):
            b.add_conv(sd, f"{t}.blocks.{i}.{4 + 3 * k}", f"{j}/block{i}_conv{k + 1}")
            b.add_bn(sd, f"{t}.blocks.{i}.{5 + 3 * k}", f"{j}/block{i}_bn{k + 1}")
        b.add_conv(sd, f"{t}.deblocks.{i}.0", f"{j}/deblock{i}_conv",
                   transposed=(upsample_strides[i] >= 1))
        b.add_bn(sd, f"{t}.deblocks.{i}.1", f"{j}/deblock{i}_bn")


def _import_center_head(b: TreeBuilder, sd, t: str, j: str, tasks, common_heads):
    """Pack the reference's per-branch SepHead weights into our fused layout
    (layers/center_head.py: one conv0 64→G·64, one block-diag out kernel).
    Branch order must match `center_head.branch_list`."""
    from unidistill_tpu.layers.center_head import branch_list

    b.add_conv(sd, f"{t}.shared_conv.0", f"{j}/shared_conv", bias=True)
    b.add_bn(sd, f"{t}.shared_conv.1", f"{j}/shared_bn")

    branches = branch_list(tuple(tasks), tuple(common_heads))
    # fused packing needs every branch present — all-or-nothing (a state
    # dict missing the head falls back to init weights, same as strict=False)
    if any(
        f"{t}.tasks.{tid}.{name}.0.weight" not in sd
        for tid, name, _ch in branches
    ):
        return
    o_max = max(ch for _, _, ch in branches)
    heads_by_name = {n: nc for n, (_c, nc) in common_heads}
    k0, b0, s0, be0, m0, v0, wk, wb = [], [], [], [], [], [], [], []
    for tid, name, ch in branches:
        num_conv = heads_by_name.get(name, 2)
        assert num_conv == 2, (
            f"fused head supports num_conv=2 (ref config value); got "
            f"{num_conv} for {name}"
        )
        tb = f"{t}.tasks.{tid}.{name}"
        # torch Sequential layout: 0 conv, 1 bn, 2 relu, 3 out conv
        k0.append(conv2d(sd[f"{tb}.0.weight"]))
        b0.append(sd[f"{tb}.0.bias"])
        s0.append(sd[f"{tb}.1.weight"])
        be0.append(sd[f"{tb}.1.bias"])
        m0.append(sd[f"{tb}.1.running_mean"])
        v0.append(sd[f"{tb}.1.running_var"])
        wo = conv2d(sd[f"{tb}.3.weight"])  # [3, 3, hc, ch]
        wk.append(np.pad(wo, ((0, 0), (0, 0), (0, 0), (0, o_max - ch))))
        wb.append(np.pad(sd[f"{tb}.3.bias"], (0, o_max - ch)))

    b.set(b.params, f"{j}/branches_conv0/kernel", np.concatenate(k0, axis=-1))
    b.set(b.params, f"{j}/branches_conv0/bias", np.concatenate(b0))
    b.set(b.params, f"{j}/branches_bn0/scale", np.concatenate(s0))
    b.set(b.params, f"{j}/branches_bn0/bias", np.concatenate(be0))
    b.set(b.stats, f"{j}/branches_bn0/mean", np.concatenate(m0))
    b.set(b.stats, f"{j}/branches_bn0/var", np.concatenate(v0))
    b.set(b.params, f"{j}/out_kernel", np.stack(wk, axis=2))
    b.set(b.params, f"{j}/out_bias", np.stack(wb, axis=0))


def convert_state_dict(sd: Dict[str, np.ndarray], cfg) -> Tuple[Dict, Dict]:
    """Reference BEVFusionCenterHead state dict → (params, batch_stats) trees
    named for our flax modules."""
    b = TreeBuilder()
    if cfg.with_lidar and any(k.startswith("lidar_encoder") for k in sd):
        _import_sparse_backbone(
            b, sd, "lidar_encoder.backbone_3d", "lidar_encoder/backbone_3d"
        )
    if cfg.with_camera and any(k.startswith("camera_encoder") for k in sd):
        cam = "camera_encoder.backbone"
        jcam = "camera_encoder"
        if getattr(cfg.camera_encoder, "img_backbone", "resnet50") == "swin":
            _import_swin(b, sd, f"{cam}.img_backbone", f"{jcam}/img_backbone")
        else:
            _import_resnet50(b, sd, f"{cam}.img_backbone",
                             f"{jcam}/img_backbone")
        _import_second_fpn(
            b, sd, f"{cam}.img_neck", f"{jcam}/img_neck",
            cfg.camera_encoder.img_neck_upsample_strides,
        )
        b.add_conv(sd, f"{cam}.depth_net.0", f"{jcam}/depth_net", bias=True)
    if cfg.with_lidar and cfg.with_camera and any(
        k.startswith("fusion_encoder") for k in sd
    ):
        b.add_conv(sd, "fusion_encoder.att.1", "fusion_encoder/att_conv", bias=True)
        b.add_conv(sd, "fusion_encoder.reduce_conv.0", "fusion_encoder/reduce_conv")
        b.add_bn(sd, "fusion_encoder.reduce_conv.1", "fusion_encoder/reduce_bn")
    _import_bev_backbone(
        b, sd, "bev_encoder.backbone_2d", "bev_encoder",
        cfg.bev_encoder.layer_nums, cfg.bev_encoder.upsample_strides,
    )
    _import_center_head(
        b, sd, "det_head.dense_head", "det_head", cfg.tasks,
        cfg.det_head.common_heads,
    )
    if "det_head.dense_head.auto_loss.params" in sd:
        b.set(b.params, "awl_params", sd["det_head.dense_head.auto_loss.params"])
    return b.params, b.stats


def load_torch_checkpoint(path: str, cfg) -> Tuple[Dict, Dict]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state", ckpt.get("state_dict", ckpt))
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    return convert_state_dict(sd, cfg)
