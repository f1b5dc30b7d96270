"""Swin-T backbone: shapes, window masking, and LSS integration."""
import numpy as np

import jax
import pytest
import jax.numpy as jnp

from unidistill_tpu.layers.swin import SwinTransformer, _shift_attn_mask


@pytest.mark.slow  # 33 s — the torch-golden swin test below keeps fast parity coverage
def test_swin_output_shapes():
    m = SwinTransformer(embed_dim=24, depths=(1, 1, 2, 1), num_heads=(2, 2, 4, 4),
                        window_size=7, out_indices=(1, 2, 3), dtype=jnp.float32)
    x = jnp.ones((1, 64, 176, 3))  # nuScenes 256x704 / 4 after patch embed
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    # strides 8, 16, 32 from the input image = 2, 4, 8 from patch grid
    assert outs[0].shape == (1, 8, 22, 48)
    assert outs[1].shape == (1, 4, 11, 96)
    assert outs[2].shape == (1, 2, 6, 192)
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_shift_mask_blocks_cross_region_attention():
    mask = _shift_attn_mask(14, 14, 7, 3)
    assert mask.shape == (4, 49, 49)
    assert (mask <= 0).all() and (mask == 0).any() and (mask < 0).any()
    # diagonal is always attendable
    for w in range(4):
        assert (np.diag(mask[w]) == 0).all()


def test_swin_equivariance_to_padding():
    """Zero-padded window remainder must not change valid-region outputs much
    (LN over channels keeps padding local; sanity: no NaNs, stable scale)."""
    m = SwinTransformer(embed_dim=16, depths=(1,), num_heads=(2,),
                        out_indices=(0,), dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 20, 36, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)[0]
    assert out.shape == (1, 5, 9, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_swin_golden_torch_import():
    """mmdet-style Swin state dict → torch-replica forward vs imported flax
    forward (VERDICT r1 item 9: the shipped Swin path must be
    checkpoint-comparable). The replica reproduces mmdet semantics: Unfold
    (channel-major) patch merging, w_msa attention with relative position
    bias, erf GELU, LN eps 1e-5."""
    import torch
    import torch.nn.functional as F

    from unidistill_tpu.training.torch_import import TreeBuilder, _import_swin

    torch.manual_seed(0)
    ED, DEPTHS, HEADS, WS = 8, (2, 1), (2, 4), 4
    OUT = (0, 1)

    sd = {}

    def T(*shape, scale=0.2):
        return torch.randn(*shape) * scale

    sd["bb.patch_embed.projection.weight"] = T(ED, 3, 4, 4)
    sd["bb.patch_embed.projection.bias"] = T(ED)
    sd["bb.patch_embed.norm.weight"] = 1 + 0.1 * T(ED)
    sd["bb.patch_embed.norm.bias"] = 0.1 * T(ED)
    dim = ED
    for st, depth in enumerate(DEPTHS):
        for blk in range(depth):
            p = f"bb.stages.{st}.blocks.{blk}"
            sd[f"{p}.norm1.weight"] = 1 + 0.1 * T(dim)
            sd[f"{p}.norm1.bias"] = 0.1 * T(dim)
            sd[f"{p}.norm2.weight"] = 1 + 0.1 * T(dim)
            sd[f"{p}.norm2.bias"] = 0.1 * T(dim)
            a = f"{p}.attn.w_msa"
            sd[f"{a}.relative_position_bias_table"] = T(
                (2 * WS - 1) ** 2, HEADS[st]
            )
            sd[f"{a}.qkv.weight"] = T(3 * dim, dim)
            sd[f"{a}.qkv.bias"] = T(3 * dim)
            sd[f"{a}.proj.weight"] = T(dim, dim)
            sd[f"{a}.proj.bias"] = T(dim)
            sd[f"{p}.ffn.layers.0.0.weight"] = T(4 * dim, dim)
            sd[f"{p}.ffn.layers.0.0.bias"] = T(4 * dim)
            sd[f"{p}.ffn.layers.1.weight"] = T(dim, 4 * dim)
            sd[f"{p}.ffn.layers.1.bias"] = T(dim)
        if st < len(DEPTHS) - 1:
            d = f"bb.stages.{st}.downsample"
            sd[f"{d}.norm.weight"] = 1 + 0.1 * T(4 * dim)
            sd[f"{d}.norm.bias"] = 0.1 * T(4 * dim)
            sd[f"{d}.reduction.weight"] = T(2 * dim, 4 * dim)
        dim *= 2
    for st in OUT:
        sd[f"bb.norm{st}.weight"] = 1 + 0.1 * T(ED * 2 ** st)
        sd[f"bb.norm{st}.bias"] = 0.1 * T(ED * 2 ** st)

    # ---- torch-replica forward (mmdet semantics) -------------------------
    def ln(x, p):
        return F.layer_norm(x, (x.shape[-1],), sd[f"{p}.weight"],
                            sd[f"{p}.bias"], eps=1e-5)

    def win_part(x, ws):
        B, H, W, C = x.shape
        x = x.reshape(B, H // ws, ws, W // ws, ws, C)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)

    def win_rev(w, ws, B, H, W):
        C = w.shape[-1]
        x = w.reshape(B, H // ws, W // ws, ws, ws, C)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)

    def attn(x, p, nh, mask):
        B_, N, C = x.shape
        hd = C // nh
        qkv = F.linear(x, sd[f"{p}.qkv.weight"], sd[f"{p}.qkv.bias"])
        qkv = qkv.reshape(B_, N, 3, nh, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = (q @ k.transpose(-2, -1)) * hd ** -0.5
        coords = np.stack(np.meshgrid(np.arange(WS), np.arange(WS),
                                      indexing="ij")).reshape(2, -1)
        rel = (coords[:, :, None] - coords[:, None, :] + WS - 1)
        ridx = rel[0] * (2 * WS - 1) + rel[1]
        bias = sd[f"{p}.relative_position_bias_table"][
            torch.from_numpy(ridx.reshape(-1))
        ].reshape(N, N, nh).permute(2, 0, 1)
        a = a + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            a = a.reshape(-1, nW, nh, N, N) + mask[None, :, None]
            a = a.reshape(-1, nh, N, N)
        a = F.softmax(a, dim=-1)
        out = (a @ v).permute(0, 2, 1, 3).reshape(B_, N, C)
        return F.linear(out, sd[f"{p}.proj.weight"], sd[f"{p}.proj.bias"])

    from unidistill_tpu.layers.swin import _shift_attn_mask

    x = torch.randn(1, 16, 16, 3) * 0.5
    h = F.conv2d(x.permute(0, 3, 1, 2),
                 sd["bb.patch_embed.projection.weight"],
                 sd["bb.patch_embed.projection.bias"], stride=4)
    h = h.permute(0, 2, 3, 1)
    h = ln(h, "bb.patch_embed.norm")
    outs_t = []
    dim = ED
    for st, depth in enumerate(DEPTHS):
        B, H, W, C = h.shape
        ph, pw = (-H) % WS, (-W) % WS
        hp = F.pad(h, (0, 0, 0, pw, 0, ph))
        Hp, Wp = H + ph, W + pw
        for blk in range(depth):
            p = f"bb.stages.{st}.blocks.{blk}"
            shift = 0 if blk % 2 == 0 else WS // 2
            shortcut = hp
            y = ln(hp, f"{p}.norm1")
            if shift:
                y = torch.roll(y, (-shift, -shift), dims=(1, 2))
                mask = torch.from_numpy(_shift_attn_mask(Hp, Wp, WS, shift))
            else:
                mask = None
            w = win_part(y, WS)
            w = attn(w, f"{p}.attn.w_msa", HEADS[st], mask)
            y = win_rev(w, WS, B, Hp, Wp)
            if shift:
                y = torch.roll(y, (shift, shift), dims=(1, 2))
            hp = shortcut + y
            z = ln(hp, f"{p}.norm2")
            z = F.linear(z, sd[f"{p}.ffn.layers.0.0.weight"],
                         sd[f"{p}.ffn.layers.0.0.bias"])
            z = F.gelu(z)
            z = F.linear(z, sd[f"{p}.ffn.layers.1.weight"],
                         sd[f"{p}.ffn.layers.1.bias"])
            hp = hp + z
        h = hp[:, :H, :W]
        if st in OUT:
            outs_t.append(ln(h, f"bb.norm{st}"))
        if st < len(DEPTHS) - 1:
            # mmdet PatchMerging: Unfold(k=2,s=2) → channel-major (c·4+pos)
            B, H, W, C = h.shape
            ph2, pw2 = (-H) % 2, (-W) % 2
            hm = F.pad(h, (0, 0, 0, pw2, 0, ph2))
            u = F.unfold(hm.permute(0, 3, 1, 2), kernel_size=2, stride=2)
            u = u.transpose(1, 2)  # [B, L, C*4] channel-major
            u = ln(u, f"bb.stages.{st}.downsample.norm")
            h = F.linear(u, sd[f"bb.stages.{st}.downsample.reduction.weight"])
            h = h.reshape(B, (H + ph2) // 2, (W + pw2) // 2, 2 * dim)
            dim *= 2

    # ---- import + flax forward ------------------------------------------
    b = TreeBuilder()
    sd_np = {k: v.numpy() for k, v in sd.items()}
    _import_swin(b, sd_np, "bb", "swin", embed_dim=ED, depths=DEPTHS,
                 out_indices=OUT)
    model = SwinTransformer(
        embed_dim=ED, depths=DEPTHS, num_heads=HEADS, window_size=WS,
        out_indices=OUT, dtype=jnp.float32,
    )
    outs_j = model.apply({"params": b.params["swin"]},
                         jnp.asarray(x.numpy()))
    assert len(outs_j) == len(outs_t)
    for oj, ot in zip(outs_j, outs_t):
        np.testing.assert_allclose(
            np.asarray(oj), ot.detach().numpy(), rtol=2e-4, atol=2e-4
        )
