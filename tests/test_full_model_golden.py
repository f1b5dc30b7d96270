"""Full-model torch-replica golden (VERDICT r3 item 4).

A COMPOSED forward golden: one shared random reference-named state dict
(tests/test_torch_import_full.build_reference_state_dict) drives

  * an independent torch functional replica of the reference pipeline —
    voxels → dense masked sparse backbone → height compression
    (spconv_backbone.py:253-343, height_compression.py:4-22), images →
    ResNet-50 → SECONDFPN → depth net → lift-splat → BEV pooling
    (lss_fpn.py:143-316), fusion encoder (…base_exp.py:107-135), BEV
    backbone (base_bev_backbone.py:10-174), center head
    (center_head.py:58-99,311-375);
  * our BEVFusionCenterHead via the production torch importer
    (training/torch_import.convert_state_dict),

and asserts the activations match per stage AND end-to-end (lidar BEV,
camera BEV, fused feature, BEV-backbone feature, every head tensor). The
per-layer goldens (test_torch_golden.py) prove each block; this test proves
every cross-layer seam: voxel coord ordering (z,y,x), the chunked-slot
encoder vs true sparse conv semantics, the c·D+d height fold, LSS geometry
chain + `.int()` quirk + scatter order, channel concat orders, and the
importer's weight-layout transposes — the strongest accuracy proxy
available without /data/dataset (real-checkpoint eval stays blocked
environmentally, VERDICT r3 'what's missing' #1).

Tiny shapes (configs.tiny_model, f32 compute) keep it fast-suite-safe.
"""
import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unidistill_tpu.configs.nuscenes import tiny_model  # noqa: E402
from unidistill_tpu.models.bevfusion import BEVFusionCenterHead  # noqa: E402
from unidistill_tpu.training.steps import model_inputs  # noqa: E402
from unidistill_tpu.training.torch_import import convert_state_dict  # noqa: E402

from tests.test_torch_import_full import build_reference_state_dict  # noqa: E402


def T(a):
    if isinstance(a, torch.Tensor):
        return a  # pass through requires-grad leaves (backward golden)
    return torch.from_numpy(np.ascontiguousarray(np.asarray(a, np.float32)))


def t_bn(x, sd, p, eps):
    shape = (1, -1) + (1,) * (x.dim() - 2)
    w, b = T(sd[f"{p}.weight"]), T(sd[f"{p}.bias"])
    m, v = T(sd[f"{p}.running_mean"]), T(sd[f"{p}.running_var"])
    return (x - m.view(shape)) * torch.rsqrt(v.view(shape) + eps) * w.view(
        shape
    ) + b.view(shape)


def t_conv2d(x, sd, p, stride=1, pad=0):
    b = T(sd[f"{p}.bias"]) if f"{p}.bias" in sd else None
    return F.conv2d(x, T(sd[f"{p}.weight"]), b, stride, pad)


def t_spconv3d(x, sd, p, stride=1, pad=0):
    # spconv native layout (O, kz, ky, kx, I) → torch (O, I, kz, ky, kx)
    w = T(sd[f"{p}.weight"]).permute(0, 4, 1, 2, 3)
    b = T(sd[f"{p}.bias"]) if f"{p}.bias" in sd else None
    return F.conv3d(x, w, b, stride, pad)


# ---------------------------------------------------------------------------
# torch replica: lidar branch (dense masked == sparse, spconv semantics)
# ---------------------------------------------------------------------------


def torch_lidar_forward(sd, voxel_feats, voxel_coords, grid_size):
    """Dense masked replica of VoxelResBackBone8x + HeightCompression.

    With zeros at inactive sites and outputs re-masked to the active set, a
    dense conv3d IS the submanifold conv; for the strided convs the spconv
    site rule (active iff ≥1 input in the receptive field) is the occupancy
    max-pool."""
    nx, ny, nz = grid_size
    D = nz + 1  # ref: sparse_shape = grid_size[::-1] + [1, 0, 0]
    V = voxel_feats.shape[0]
    x = torch.zeros(1, voxel_feats.shape[1], D, ny, nx)
    occ = torch.zeros(1, 1, D, ny, nx)
    for i in range(V):
        z, y, xx = (int(c) for c in voxel_coords[i])
        if z < 0:
            continue
        x[0, :, z, y, xx] = T(voxel_feats[i])
        occ[0, 0, z, y, xx] = 1.0

    t = "lidar_encoder.backbone_3d"

    def block(x, occ, p):
        idn = x
        y = t_spconv3d(x, sd, f"{p}.conv1", 1, 1) * occ
        y = (t_bn(y, sd, f"{p}.bn1", 1e-3) * occ).relu()
        y = t_spconv3d(y, sd, f"{p}.conv2", 1, 1) * occ
        y = t_bn(y, sd, f"{p}.bn2", 1e-3) * occ
        return (y + idn).relu() * occ

    y = t_spconv3d(x, sd, f"{t}.conv_input.0", 1, 1) * occ
    y = (t_bn(y, sd, f"{t}.conv_input.1", 1e-3) * occ).relu()
    y = block(y, occ, f"{t}.conv1.0")
    y = block(y, occ, f"{t}.conv1.1")
    for name, pad in (("conv2", (1, 1, 1)), ("conv3", (1, 1, 1)),
                      ("conv4", (0, 1, 1))):
        occ = (F.max_pool3d(occ, 3, 2, pad) > 0).float()
        y = t_spconv3d(y, sd, f"{t}.{name}.0.0", 2, pad) * occ
        y = (t_bn(y, sd, f"{t}.{name}.0.1", 1e-3) * occ).relu()
        y = block(y, occ, f"{t}.{name}.1")
        y = block(y, occ, f"{t}.{name}.2")
    occ = (F.max_pool3d(occ, (3, 1, 1), (2, 1, 1), 0) > 0).float()
    y = t_spconv3d(y, sd, f"{t}.conv_out.0", (2, 1, 1), 0) * occ
    y = (t_bn(y, sd, f"{t}.conv_out.1", 1e-3) * occ).relu()
    # HeightCompression: [N, C, D, H, W] → view(N, C·D, H, W)
    N, C, Dz, H, W = y.shape
    return y.reshape(N, C * Dz, H, W)


# ---------------------------------------------------------------------------
# torch replica: camera branch (ResNet-50 → SECONDFPN → depth net → LSS)
# ---------------------------------------------------------------------------


def torch_camera_forward(sd, imgs, mats, ccfg):
    B, N, H, W, _ = imgs.shape
    x = T(imgs).permute(0, 1, 4, 2, 3).reshape(B * N, 3, H, W)
    rb = "camera_encoder.backbone.img_backbone"
    x = t_conv2d(x, sd, f"{rb}.conv1", 2, 3)
    x = t_bn(x, sd, f"{rb}.bn1", 1e-5).relu()
    x = F.max_pool2d(x, 3, 2, 1)
    feats = []
    for stage, (planes, n) in enumerate(
        zip((64, 128, 256, 512), (3, 4, 6, 3))
    ):
        stride = 1 if stage == 0 else 2
        for blk in range(n):
            p = f"{rb}.layer{stage + 1}.{blk}"
            idn = x
            y = t_conv2d(x, sd, f"{p}.conv1")
            y = t_bn(y, sd, f"{p}.bn1", 1e-5).relu()
            y = t_conv2d(y, sd, f"{p}.conv2", stride if blk == 0 else 1, 1)
            y = t_bn(y, sd, f"{p}.bn2", 1e-5).relu()
            y = t_conv2d(y, sd, f"{p}.conv3")
            y = t_bn(y, sd, f"{p}.bn3", 1e-5)
            if blk == 0:
                idn = t_conv2d(x, sd, f"{p}.downsample.0", stride)
                idn = t_bn(idn, sd, f"{p}.downsample.1", 1e-5)
            x = (y + idn).relu()
        feats.append(x)

    cam = "camera_encoder.backbone"
    ups = []
    for i, s in enumerate(ccfg.img_neck_upsample_strides):
        z = feats[i]
        wp = f"{cam}.img_neck.deblocks.{i}.0.weight"
        if s >= 1:
            z = F.conv_transpose2d(z, T(sd[wp]), None, int(s))
        else:
            k = int(round(1 / s))
            z = F.conv2d(z, T(sd[wp]), None, k)
        ups.append(t_bn(z, sd, f"{cam}.img_neck.deblocks.{i}.1", 1e-3).relu())
    fpn = torch.cat(ups, 1)

    dc = t_conv2d(fpn, sd, f"{cam}.depth_net.0")
    D = ccfg.depth_channels
    C = ccfg.output_channels
    depth = dc[:, :D].softmax(1)  # [B·N, D, fH, fW]
    context = dc[:, D:]           # [B·N, C, fH, fW]
    fH, fW = ccfg.feat_hw

    # frustum (ref lss_fpn.py:173-198), independent torch derivation
    d = torch.arange(*ccfg.d_bound, dtype=torch.float32)
    u = torch.linspace(0, ccfg.final_dim[1] - 1, fW)
    v = torch.linspace(0, ccfg.final_dim[0] - 1, fH)
    frustum = torch.stack(
        [
            u.view(1, 1, fW).expand(D, fH, fW),
            v.view(1, fH, 1).expand(D, fH, fW),
            d.view(D, 1, 1).expand(D, fH, fW),
            torch.ones(D, fH, fW),
        ],
        -1,
    )  # [D, fH, fW, 4]

    ida_inv = torch.inverse(T(mats["ida_mats"]))
    pts = torch.einsum("bnij,dhwj->bndhwi", ida_inv, frustum)
    pts = torch.cat([pts[..., :2] * pts[..., 2:3], pts[..., 2:]], -1)
    comb = T(mats["sensor2ego_mats"]) @ torch.inverse(T(mats["intrin_mats"]))
    pts = torch.einsum("bnij,bndhwj->bndhwi", comb, pts)
    pts = torch.einsum("bij,bndhwj->bndhwi", T(mats["bda_mat"]), pts)
    geom = pts[..., :3]
    lower = torch.tensor([ccfg.x_bound[0], ccfg.y_bound[0], ccfg.z_bound[0]])
    vsize = torch.tensor([ccfg.x_bound[2], ccfg.y_bound[2], ccfg.z_bound[2]])
    gi = ((geom - lower) / vsize).int()  # trunc toward zero — ref quirk

    ny, nx = ccfg.bev_hw
    depth = depth.reshape(B, N, D, fH, fW)
    context = context.reshape(B, N, C, fH, fW)
    bev = torch.zeros(B, C, ny, nx)
    for b in range(B):
        for n in range(N):
            for di in range(D):
                for hh in range(fH):
                    for ww in range(fW):
                        ix, iy, iz = (int(c) for c in gi[b, n, di, hh, ww])
                        if 0 <= ix < nx and 0 <= iy < ny and iz == 0:
                            bev[b, :, iy, ix] += (
                                depth[b, n, di, hh, ww]
                                * context[b, n, :, hh, ww]
                            )
    return bev


# ---------------------------------------------------------------------------
# torch replica: fusion + BEV backbone + center head
# ---------------------------------------------------------------------------


def torch_fusion_forward(sd, lidar_bev, camera_bev):
    x = torch.cat([lidar_bev, camera_bev], 1)
    att = torch.sigmoid(t_conv2d(x.mean((2, 3), keepdim=True), sd,
                                 "fusion_encoder.att.1"))
    y = t_conv2d(x * att, sd, "fusion_encoder.reduce_conv.0", 1, 1)
    return t_bn(y, sd, "fusion_encoder.reduce_conv.1", 1e-5).relu()


def torch_bev_backbone_forward(sd, x, bcfg):
    t = "bev_encoder.backbone_2d"
    outs = []
    for i, (n, s) in enumerate(zip(bcfg.layer_nums, bcfg.layer_strides)):
        x = t_conv2d(x, sd, f"{t}.blocks.{i}.1", s, 1)
        x = t_bn(x, sd, f"{t}.blocks.{i}.2", 1e-3).relu()
        for k in range(n):
            x = t_conv2d(x, sd, f"{t}.blocks.{i}.{4 + 3 * k}", 1, 1)
            x = t_bn(x, sd, f"{t}.blocks.{i}.{5 + 3 * k}", 1e-3).relu()
        up = int(bcfg.upsample_strides[i])
        z = F.conv_transpose2d(x, T(sd[f"{t}.deblocks.{i}.0.weight"]), None,
                               up)
        outs.append(t_bn(z, sd, f"{t}.deblocks.{i}.1", 1e-3).relu())
    return torch.cat(outs, 1)


def torch_head_forward(sd, x, cfg):
    dh = "det_head.dense_head"
    x = t_conv2d(x, sd, f"{dh}.shared_conv.0", 1, 1)
    x = t_bn(x, sd, f"{dh}.shared_conv.1", 1e-5).relu()
    preds = []
    for tid, classes in enumerate(cfg.tasks):
        out = {}
        for name, (ch, _nc) in tuple(cfg.det_head.common_heads) + (
            ("hm", (len(classes), 2)),
        ):
            tb = f"{dh}.tasks.{tid}.{name}"
            h = t_conv2d(x, sd, f"{tb}.0", 1, 1)
            h = t_bn(h, sd, f"{tb}.1", 1e-5).relu()
            out[name] = t_conv2d(h, sd, f"{tb}.3", 1, 1)
        preds.append(out)
    return preds


# ---------------------------------------------------------------------------
# the test
# ---------------------------------------------------------------------------


def _rich_mats(B, N, H, W):
    """Camera matrices exercising the full geometry chain: per-camera yaw,
    optical-axis-to-ego-x sensor frames, a non-trivial IDA and BDA. Values
    picked so frustum points land well inside BEV cells (the `.int()` trunc
    is bitwise-sensitive at cell boundaries)."""
    cam2img = np.array(  # camera z → ego x, x → −y, y → −z
        [[0, 0, 1, 0], [-1, 0, 0, 0], [0, -1, 0, 0], [0, 0, 0, 1]],
        np.float32,
    )
    s2e = np.zeros((B, N, 4, 4), np.float32)
    for n in range(N):
        a = 2 * np.pi * n / N + 0.37
        rz = np.array(
            [[np.cos(a), -np.sin(a), 0, 0.83], [np.sin(a), np.cos(a), 0, -0.29],
             [0, 0, 1, 0.41], [0, 0, 0, 1]], np.float32)
        s2e[:, n] = rz @ cam2img
    intrin = np.broadcast_to(np.eye(4, dtype=np.float32), (B, N, 4, 4)).copy()
    intrin[..., 0, 0] = intrin[..., 1, 1] = 17.0
    intrin[..., 0, 2] = W / 2 + 0.31
    intrin[..., 1, 2] = H / 2 - 0.17
    ida = np.broadcast_to(np.eye(4, dtype=np.float32), (B, N, 4, 4)).copy()
    ida[..., 0, 0] = 1.03
    ida[..., 1, 1] = 0.97
    ida[..., 0, 3] = 1.7
    ida[..., 1, 3] = -0.9
    th = 0.21
    bda = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    bda[:, 0, 0] = np.cos(th) * 1.05
    bda[:, 0, 1] = -np.sin(th) * 1.05
    bda[:, 1, 0] = np.sin(th) * 1.05
    bda[:, 1, 1] = np.cos(th) * 1.05
    return dict(sensor2ego_mats=s2e, intrin_mats=intrin, ida_mats=ida,
                bda_mat=bda)


def _lidar_batch(cfg, n=600, seed=3):
    """Clustered cloud small enough that NO stage voxel/column cap binds —
    the cap-free regime is where the chunked encoder is exact sparse-conv
    semantics (caps are a documented truncation, tested separately in
    test_topology_host.py); the golden must compare exact vs exact."""
    from unidistill_tpu.data.topology_host import plan_frame_topology
    from unidistill_tpu.data.voxelize_host import voxelize_frame

    rb = np.random.RandomState(seed)
    P = cfg.caps.max_points
    pts = np.zeros((P, 5), np.float32)
    pts[:n, 0:2] = rb.uniform(-30, 30, (n, 2))
    pts[:n, 2] = rb.uniform(-3, 0, (n,))
    pts[:n, 3] = rb.uniform(0, 255, (n,))
    mask = np.zeros(P, bool)
    mask[:n] = True
    vf, vc = voxelize_frame(pts, mask, cfg, training=False)
    topo = plan_frame_topology(
        vc, cfg.grid_size, cfg.lidar_encoder.stage_voxel_caps,
        s0_cap=cfg.lidar_encoder.s0_slot_cap,
    )
    out = {"voxel_feats": vf[None], "voxel_coords": vc[None]}
    for k, v in topo.items():
        out[f"topo_{k}"] = np.asarray(v)[None]
    return out


import functools  # noqa: E402


@functools.lru_cache(maxsize=1)
def _golden_case():
    """Shared (cfg, state dict, batch) for the forward AND backward goldens."""
    from __graft_entry__ import _synth_batch

    base = tiny_model()
    lc = dataclasses.replace(
        base.lidar_encoder,
        # raised so the ~600-voxel cloud sits strictly under every cap
        stage_voxel_caps=(4096, 2048, 1024, 512),
        stage_col_caps=(4096, 2048, 1024, 512, 512),
    )
    cfg = dataclasses.replace(base, compute_dtype="float32",
                              lidar_encoder=lc)
    rng = np.random.RandomState(7)
    sd = build_reference_state_dict(cfg, rng=rng)

    batch = _synth_batch(cfg, B=1, seed=3)
    batch.update(_lidar_batch(cfg))
    H, W = cfg.camera_encoder.final_dim
    batch["mats"] = _rich_mats(1, cfg.camera_encoder.num_cams, H, W)
    return cfg, sd, batch


def test_full_model_matches_torch_replica():
    cfg, sd, batch = _golden_case()
    params, stats = convert_state_dict(sd, cfg)

    # ---- torch replica, stage by stage -----------------------------------
    with torch.no_grad():
        t_lidar = torch_lidar_forward(
            sd, batch["voxel_feats"][0], batch["voxel_coords"][0],
            cfg.grid_size,
        )
        t_cam = torch_camera_forward(
            sd, batch["imgs"], batch["mats"], cfg.camera_encoder
        )
        t_fused = torch_fusion_forward(sd, t_lidar, t_cam)
        t_bev = torch_bev_backbone_forward(sd, t_fused, cfg.bev_encoder)
        t_heads = torch_head_forward(sd, t_bev, cfg)

    # ---- ours (production importer + production forward) ------------------
    model = BEVFusionCenterHead(cfg)
    kw = model_inputs(jax.tree.map(jnp.asarray, batch), cfg, training=False)
    out = jax.jit(
        lambda: model.apply(
            {"params": params, "batch_stats": stats}, **kw, train=False
        )
    )()

    def nchw(t):
        return np.asarray(t.permute(0, 2, 3, 1))

    # per-modality BEV features via modality-subset models sharing the SAME
    # state dict — exactly how the reference builds its lidar/camera exps
    for sub, ref_feat in (("lidar", t_lidar), ("camera", t_cam)):
        scfg = dataclasses.replace(
            cfg, with_lidar=sub == "lidar", with_camera=sub == "camera"
        )
        sp, ss = convert_state_dict(sd, scfg)
        skw = model_inputs(jax.tree.map(jnp.asarray, batch), scfg,
                           training=False)
        sout = jax.jit(
            lambda m=BEVFusionCenterHead(scfg), v={"params": sp,
                                                   "batch_stats": ss},
            k=skw: m.apply(v, **k, train=False)
        )()
        np.testing.assert_allclose(
            np.asarray(sout["model_output"]), nchw(ref_feat),
            rtol=1e-3, atol=2e-3, err_msg=f"{sub} BEV feature",
        )

    np.testing.assert_allclose(
        np.asarray(out["model_output"]), nchw(t_fused),
        rtol=1e-3, atol=2e-3, err_msg="fused BEV feature",
    )
    np.testing.assert_allclose(
        np.asarray(out["bev_feature"]), nchw(t_bev),
        rtol=1e-3, atol=3e-3, err_msg="BEV backbone feature",
    )
    for tid, ref in enumerate(t_heads):
        for name, r in ref.items():
            np.testing.assert_allclose(
                np.asarray(out["multi_head_features"][tid][name]),
                nchw(r), rtol=1e-3, atol=3e-3,
                err_msg=f"head task{tid}/{name}",
            )


def test_full_model_backward_matches_torch_replica():
    """Composed GRADIENT golden (VERDICT r4 next-round #8).

    The forward seams are pinned above; the backward seams — our custom
    sparse-conv VJPs composed across conv_input → res blocks → down convs →
    height fold, then through fusion/BEV/head autodiff — were only per-op
    tested. Here one scalar loss (Σ mean(h²) over every head tensor; layout-
    independent, identical on both sides) is differentiated end-to-end
    against the torch replica, and the grads are compared on three params
    chosen to span the longest custom-VJP chains:

      * conv_input kernel — its grad flows back through EVERY chunked
        sparse-conv VJP in the encoder;
      * depth_net kernel — through the LSS pooling scatter-add backward;
      * head shared_conv kernel — plain autodiff control.

    Torch grads are mapped into our kernel layouts with the SAME importer
    transforms used for weights (linear permutations, so grads transform
    identically). BN stays in eval mode (running stats) on both sides.
    """
    cfg, sd, batch = _golden_case()
    from unidistill_tpu.training import torch_import as ti

    GRAD_KEYS = (
        "lidar_encoder.backbone_3d.conv_input.0.weight",
        "camera_encoder.backbone.depth_net.0.weight",
        "det_head.dense_head.shared_conv.0.weight",
    )
    sd2 = dict(sd)
    leaves = {}
    for k in GRAD_KEYS:
        t = torch.from_numpy(np.asarray(sd[k], np.float32).copy())
        t.requires_grad_(True)
        sd2[k] = t
        leaves[k] = t

    t_lidar = torch_lidar_forward(
        sd2, batch["voxel_feats"][0], batch["voxel_coords"][0], cfg.grid_size
    )
    t_cam = torch_camera_forward(sd2, batch["imgs"], batch["mats"],
                                 cfg.camera_encoder)
    t_fused = torch_fusion_forward(sd2, t_lidar, t_cam)
    t_bev = torch_bev_backbone_forward(sd2, t_fused, cfg.bev_encoder)
    t_heads = torch_head_forward(sd2, t_bev, cfg)
    loss_t = sum(h.pow(2).mean() for out in t_heads for h in out.values())
    loss_t.backward()
    loss_t = loss_t.detach()
    tg = {k: leaves[k].grad.detach().numpy() for k in GRAD_KEYS}

    params, stats = convert_state_dict(sd, cfg)
    model = BEVFusionCenterHead(cfg)
    kw = model_inputs(jax.tree.map(jnp.asarray, batch), cfg, training=False)

    def loss_fn(p):
        out = model.apply({"params": p, "batch_stats": stats}, **kw,
                          train=False)
        return sum(
            jnp.mean(jnp.square(h))
            for task in out["multi_head_features"]
            for h in task.values()
        )

    loss_j, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4,
                               err_msg="composed loss")

    ours = {
        GRAD_KEYS[0]: np.asarray(
            grads["lidar_encoder"]["backbone_3d"]["conv_input"]["kernel"]
        ),
        GRAD_KEYS[1]: np.asarray(
            grads["camera_encoder"]["depth_net"]["kernel"]
        ),
        GRAD_KEYS[2]: np.asarray(grads["det_head"]["shared_conv"]["kernel"]),
    }
    theirs = {
        GRAD_KEYS[0]: ti.spconv3d(tg[GRAD_KEYS[0]], 5, 16),
        GRAD_KEYS[1]: ti.conv2d(tg[GRAD_KEYS[1]]),
        GRAD_KEYS[2]: ti.conv2d(tg[GRAD_KEYS[2]]),
    }
    for k in GRAD_KEYS:
        scale = max(np.abs(theirs[k]).max(), 1e-8)
        np.testing.assert_allclose(
            ours[k] / scale, theirs[k] / scale, atol=2e-3,
            err_msg=f"grad {k}",
        )
