"""LiDAR voxel encoder: voxelize → mean-VFE → sparse ResNet middle encoder →
height compression, in Flax over the gather-GEMM sparse conv ops.

ref pipeline (BEVFusion_nuscenes_base_exp.py:40-85):
  Voxelization (spconv PointToVoxel) → MeanVFE → VoxelResBackBone8x
  (spconv_backbone.py:253-343) → HeightCompression (height_compression.py:4-22).

Architecture matched stage-for-stage:
  conv_input: SubM(5→16) + BN + ReLU
  conv1: 2 × SparseBasicBlock(16)
  conv2: SparseConv(16→32, s2, p1) + BN + ReLU; 2 × SparseBasicBlock(32)
  conv3: SparseConv(32→64, s2, p1) + BN + ReLU; 2 × SparseBasicBlock(64)
  conv4: SparseConv(64→128, s2, p=(0,1,1)) + BN + ReLU; 2 × SparseBasicBlock(128)
  conv_out: SparseConv(128→128, k=(3,1,1), s=(2,1,1), p0) + BN + ReLU
  dense → [B, 180, 180, 256] (C·D channel fold, D=2)

TPU specifics: fixed per-stage voxel capacity (cfg.stage_voxel_caps), masked
batch-norm over valid voxels (spconv BN normalizes over the ragged voxel set;
padding must not pollute statistics), per-sample sparse ops vmapped over batch.
SparseBasicBlock convs carry a bias (a reference quirk — bias=True whenever a
norm follows, spconv_backbone.py:70-77 — kept for checkpoint-import parity).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unidistill_tpu.configs.nuscenes import LidarEncoderConfig
from unidistill_tpu.ops.sparse_conv import (
    SparseTensor,
    build_stage_tables,
    column_neighbor_slots,
    down_column_queries,
    downsample_sites_batched,
    from_voxels,
    gather_gemm_zero_row,
    subm_column_queries,
    taps_from_tables,
)
from unidistill_tpu.ops.sparse_conv_chunked import (
    build_chunked_tables,
    chunked_from_voxels,
    chunked_to_dense,
    down2_conv_chunked,
    down2_conv_v2,
    down2_sites,
    subm_conv_chunked,
    zmask,
)


def _kaiming(key, shape, dtype=jnp.float32):
    # fan_in over (taps * Cin)
    fan_in = shape[0] * shape[1]
    std = (2.0 / fan_in) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over ragged [B, V, C] voxel features with validity mask."""

    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, train: bool):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros, (C,))
        ra_var = self.variable("batch_stats", "var", jnp.ones, (C,))

        if train:
            m = mask.astype(jnp.float32)[..., None]
            cnt = jnp.maximum(m.sum(), 1.0)
            xf = x.astype(jnp.float32)
            mean = (xf * m).sum(axis=(0, 1)) / cnt
            var = (jnp.square(xf - mean) * m).sum(axis=(0, 1)) / cnt
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return jnp.where(mask[..., None], y, 0.0).astype(x.dtype)


def _w_xykz(w, kz: int):
    """[K, Cin, Cout] z-major taps -> [ky·kx, kz, Cin, Cout]."""
    K, cin, cout = w.shape
    return w.reshape(kz, K // kz, cin, cout).transpose(1, 0, 2, 3)


class _SubMConv(nn.Module):
    cin: int
    cout: int
    use_bias: bool
    spatial_shape: Tuple[int, int, int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, st_b, taps_b):
        w = self.param("kernel", _kaiming, (27, self.cin, self.cout))
        b = self.param("bias", nn.initializers.zeros, (self.cout,)) if self.use_bias else None
        out = gather_gemm_zero_row(
            st_b.features, taps_b, _w_xykz(w.astype(self.dtype), 3)
        )
        if b is not None:
            out = out + b.astype(self.dtype)
        out = jnp.where(st_b.valid[..., None], out, 0.0)
        return st_b._replace(features=out)


class _SparseDownConv(nn.Module):
    cin: int
    cout: int
    kernel_size: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    spatial_shape: Tuple[int, int, int]
    out_spatial_shape: Tuple[int, int, int]
    out_cap: int
    out_col_cap: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, st_b, in_tables):
        """Returns (out SparseTensor, out StageTables)."""
        kz, ky, kx = self.kernel_size
        K = kz * ky * kx
        w = self.param("kernel", _kaiming, (K, self.cin, self.cout))
        out_coords, out_keys, out_valid = downsample_sites_batched(
            st_b, self.kernel_size, self.stride, self.padding,
            self.out_spatial_shape, self.out_cap,
        )
        out_tb = build_stage_tables(
            out_keys, out_valid, self.out_spatial_shape, self.out_col_cap
        )
        D_in, H_in, W_in = self.spatial_shape
        _, H_out, W_out = self.out_spatial_shape
        q = down_column_queries(
            out_tb, (self.stride[1], self.stride[2]),
            (self.padding[1], self.padding[2]), (ky, kx),
            (H_in, W_in), (H_out, W_out),
        )
        nbr = column_neighbor_slots(in_tables, q, H_in * W_in)
        zbase = out_coords[..., 0] * self.stride[0] - self.padding[0]
        taps = taps_from_tables(
            in_tables, nbr, out_tb.col_of, zbase, kz, ky * kx,
            D_in, st_b.features.shape[1],
        )
        out = gather_gemm_zero_row(
            st_b.features, taps, _w_xykz(w.astype(self.dtype), kz)
        )
        out = jnp.where(out_valid[..., None], out, 0.0)
        return SparseTensor(out, out_coords, out_keys, out_valid), out_tb


class SparseBasicBlock(nn.Module):
    planes: int
    spatial_shape: Tuple[int, int, int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, st_b, train: bool, rules_b):
        identity = st_b.features
        out = _SubMConv(self.planes, self.planes, True, self.spatial_shape,
                        self.dtype, name="conv1")(st_b, rules_b)
        f = MaskedBatchNorm(name="bn1")(out.features, out.valid, train)
        f = nn.relu(f)
        out = _SubMConv(self.planes, self.planes, True, self.spatial_shape,
                        self.dtype, name="conv2")(
            out._replace(features=f), rules_b
        )
        f = MaskedBatchNorm(name="bn2")(out.features, out.valid, train)
        f = nn.relu(f + identity.astype(f.dtype))
        f = jnp.where(out.valid[..., None], f, 0.0)
        return out._replace(features=f)


class MaskedBatchNormZ(nn.Module):
    """BatchNorm over flat z-folded slot features [B, S, 4·C] with an int32
    per-slot occupancy bitmap. Math-identical to `MaskedBatchNorm` over the
    unfolded [B, S·4, C] view (same param/stat shapes [C] — checkpoint
    compatible), but never materializes a [.., 4, C] lane-padded tensor:
    the round-2 reshape to [B, S·4, C] was a relayout copy on every BN call
    (PROFILE.md r3 trace)."""

    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, occ_bits, train: bool):
        FC = x.shape[-1]
        C = FC // 4
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros, (C,))
        ra_var = self.variable("batch_stats", "var", jnp.ones, (C,))

        # occupancy is integer topology — never differentiated, and
        # population_count has no JVP rule (occ_bits can arrive as a traced
        # custom_vjp output of the down convs)
        occ_bits = jax.lax.stop_gradient(occ_bits)
        if train:
            xm = zmask(occ_bits, C, x.astype(jnp.float32))
            cnt = jnp.maximum(
                jnp.sum(jax.lax.population_count(occ_bits)).astype(
                    jnp.float32
                ), 1.0
            )
            s1 = xm.sum(axis=(0, 1)).reshape(4, C).sum(0)
            s2 = jnp.square(xm).sum(axis=(0, 1)).reshape(4, C).sum(0)
            mean = s1 / cnt
            # Σ m·(x−mean)² = Σ m·x² − cnt·mean²  (identical to the masked
            # two-pass variance of MaskedBatchNorm, in f32)
            var = jnp.maximum(s2 / cnt - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        sc = (jax.lax.rsqrt(var + self.epsilon) * scale)
        y = (x - jnp.tile(mean, 4)) * jnp.tile(sc, 4) + jnp.tile(bias, 4)
        return zmask(occ_bits, C, y).astype(x.dtype)


class _SubMConvChunked(nn.Module):
    """Submanifold 3³ conv in the flat chunked layout; params match
    `_SubMConv`.

    cin_pad widens the INPUT channel axis with zero weight columns so the
    window-table rows stay ≥128 B: at the raw 5-channel input the fused
    gather+select ran on 60 B rows at ~22 ms/sample·conv vs ~4 ms at 16
    channels (r3 trace, PROFILE.md). Params keep the true cin (checkpoint
    parity); the zero columns receive zero gradient through the pad."""

    cin: int
    cout: int
    use_bias: bool
    dtype: Any = jnp.bfloat16
    cin_pad: int = 0

    @nn.compact
    def __call__(self, feats, occ_bits, ck, ch, vd, tables):
        w = self.param("kernel", _kaiming, (27, self.cin, self.cout))
        b = (
            self.param("bias", nn.initializers.zeros, (self.cout,))
            if self.use_bias else None
        )
        if self.cin_pad > self.cin:
            w = jnp.zeros((27, self.cin_pad, self.cout), w.dtype).at[
                :, : self.cin
            ].set(w)
        return subm_conv_chunked(
            feats, occ_bits, ck, ch, vd, w, b, tables,
            jnp.dtype(self.dtype).name
        )


class SparseBasicBlockChunked(nn.Module):
    """spconv SparseBasicBlock (spconv_backbone.py:60-113) on flat chunked
    slots; param tree identical to `SparseBasicBlock` (bias-before-BN quirk
    kept)."""

    planes: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, occ_bits, ck, ch, vd, tables, train: bool):
        identity = feats
        f = _SubMConvChunked(self.planes, self.planes, True, self.dtype,
                             name="conv1")(feats, occ_bits, ck, ch, vd, tables)
        f = MaskedBatchNormZ(name="bn1")(f, occ_bits, train)
        f = nn.relu(f)
        f = _SubMConvChunked(self.planes, self.planes, True, self.dtype,
                             name="conv2")(f, occ_bits, ck, ch, vd, tables)
        f = MaskedBatchNormZ(name="bn2")(f, occ_bits, train)
        f = nn.relu(f + identity.astype(f.dtype))
        return zmask(occ_bits, self.planes, f)


# Rematerialized block aliases: the encoder's res-block activations (window
# tables + per-conv outputs) are the bulk of the LiDAR train step's HBM
# footprint (it exceeded 16 GB by ~5 GB at b4, VERDICT r1 / PROFILE.md);
# checkpointing the blocks trades one extra block-forward in backward for
# dropping those temps. static arg = `train`.
_RematBlockC = nn.remat(SparseBasicBlockChunked, static_argnums=(7,))


class _DenseConv3d(nn.Module):
    """Dense 3D conv over z-outer [B, D, H, W, C], holding a [K, Cin, Cout]
    z-major param (checkpoint-identical to the sparse conv modules it
    replaces). With zero features at inactive sites and occ-masked outputs
    this equals the submanifold / strided sparse conv exactly (oracle-tested).

    Decomposed into kz 2D convs with the z taps folded into the batch dim:
    a direct XLA conv3d at the s2→s3 shape materializes a 25 GB scratch copy
    on v5e (compile-time OOM) and runs the s3 blocks at only 56 TFLOP/s in
    NHWDC; z-sliced NHWC conv2d stays on the fast 2D path (PROFILE.md)."""

    cin: int
    cout: int
    kernel_size: Tuple[int, int, int]  # (kz, ky, kx) — reference order
    stride: Tuple[int, int, int]       # (sz, sy, sx)
    padding: Tuple[int, int, int]      # (pz, py, px)
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kz, ky, kx = self.kernel_size
        K = kz * ky * kx
        w = self.param("kernel", _kaiming, (K, self.cin, self.cout))
        wd = w.reshape(kz, ky, kx, self.cin, self.cout).astype(self.dtype)
        pz, py, px = self.padding
        sz, sy, sx = self.stride
        B, D, H, W, C = x.shape
        x = x.astype(self.dtype)
        if pz:
            x = jnp.pad(x, ((0, 0), (pz, pz), (0, 0), (0, 0), (0, 0)))
        Dp = D + 2 * pz
        Dout = (Dp - kz) // sz + 1
        acc = None
        for t in range(kz):
            xs = x[:, t:t + sz * (Dout - 1) + 1:sz]
            xs = xs.reshape(B * Dout, H, W, C)
            # no preferred_element_type: its f32 cotangent would hit the
            # bf16 weight in the VJP's transposed conv (dtype mismatch);
            # TPU bf16 convs accumulate in f32 regardless
            y = jax.lax.conv_general_dilated(
                xs, wd[t], window_strides=(sy, sx),
                padding=[(py, py), (px, px)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            acc = y if acc is None else acc + y
        out = acc.reshape(B, Dout, acc.shape[1], acc.shape[2], self.cout)
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.cout,)
            ).astype(self.dtype)
        return out


def _maxpool_occ(occ, kernel_zyx, stride_zyx, pad_zyx):
    """Out-site activity of a strided sparse conv on z-outer [B, D, H, W]:
    dilate+stride the occupancy (spconv site rule: active iff ≥1 input in
    the receptive field)."""
    kz, ky, kx = kernel_zyx
    sz, sy, sx = stride_zyx
    pz, py, px = pad_zyx
    return jax.lax.reduce_window(
        occ.astype(jnp.float32), -jnp.inf, jax.lax.max,
        window_dimensions=(1, kz, ky, kx), window_strides=(1, sz, sy, sx),
        padding=((0, 0), (pz, pz), (py, py), (px, px)),
    ) > 0.0


class SparseBasicBlockDense(nn.Module):
    """SparseBasicBlock on a masked dense grid; params match `SparseBasicBlock`
    (incl. the bias-before-BN quirk, spconv_backbone.py:70-77). The conv
    output is occ-masked, which — with zeros at inactive sites — makes the
    dense conv exactly a submanifold conv."""

    planes: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, occ, train: bool):
        """x [B, D, H, W, C] z-outer dense; occ [B, D, H, W]."""
        B = x.shape[0]
        C = self.planes
        mask = occ.reshape(B, -1)

        def bn(name, v):
            return MaskedBatchNorm(name=name)(
                v.reshape(B, -1, C), mask, train
            ).reshape(v.shape)

        identity = x
        f = _DenseConv3d(C, C, (3, 3, 3), (1, 1, 1), (1, 1, 1), True,
                         self.dtype, name="conv1")(x)
        f = nn.relu(bn("bn1", jnp.where(occ[..., None], f, 0.0)))
        f = _DenseConv3d(C, C, (3, 3, 3), (1, 1, 1), (1, 1, 1), True,
                         self.dtype, name="conv2")(f)
        f = bn("bn2", jnp.where(occ[..., None], f, 0.0))
        f = nn.relu(f + identity.astype(f.dtype))
        return jnp.where(occ[..., None], f, 0.0)


_RematBlockD = nn.remat(SparseBasicBlockDense, static_argnums=(3,))


class _FoldConv3d(nn.Module):
    """3D conv reading a chunk-folded dense tensor [B, H, W, NCH, 4·Cin]:
    one 2D conv per output z plane, the 3D kernel's z taps embedded in a
    channel matrix over the ≤2 chunks covering that plane's z window.
    Exact (z positions outside the window get zero weights); param matches
    `_SparseDownConv` ([27, Cin, Cout])."""

    cin: int
    cout: int
    stride: Tuple[int, int, int]   # (sz, sy, sx)
    padding: Tuple[int, int, int]  # (pz, py, px)
    d_in: int   # true input z extent (pre chunk-padding)
    d_out: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, NCH, _ = x.shape
        w = self.param("kernel", _kaiming, (27, self.cin, self.cout))
        w3 = w.reshape(3, 3, 3, self.cin, self.cout)
        sz, sy, sx = self.stride
        pz, py, px = self.padding
        # ONE conv for every output plane: the z-window structure lives in a
        # big channel-matrix weight [3, 3, NCH·4·cin, d_out·cout] (zeros
        # where a plane's window misses a z position). The earlier per-plane
        # formulation spent ~25 ms/step in slice/reshape copies of the
        # folded input at the down4 shape (r3 trace); this reads it once.
        # The ≤1.5× zero-weight FLOP waste is free — the conv is
        # bandwidth-bound at these shapes.
        #
        # Built as ONE einsum against a static 0/1 placement mask: the
        # former per-(zo,kz) `.at[].set()` chain compiled to ~15
        # dynamic-update-slices each rewriting the full wbig buffer
        # (~12 ms/step in the r4 eval trace).
        place = np.zeros((3, NCH * 4, self.d_out), np.float32)  # [kz, z, zo]
        for zo in range(self.d_out):
            for kz in range(3):
                z = sz * zo - pz + kz
                if 0 <= z < self.d_in:
                    place[kz, z, zo] = 1.0
        wbig = jnp.einsum(
            "zyxck,zqo->yxqcok", w3, jnp.asarray(place, w.dtype)
        ).reshape(3, 3, NCH * 4 * self.cin, self.d_out * self.cout)
        xin = x.reshape(B, H, W, NCH * 4 * self.cin)
        y = jax.lax.conv_general_dilated(
            xin.astype(self.dtype), wbig.astype(self.dtype),
            window_strides=(sy, sx), padding=[(py, py), (px, px)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y.reshape(
            B, y.shape[1], y.shape[2], self.d_out, self.cout
        )  # channel order zo·cout + c — identical to the per-plane stack


class _Down2Chunked(nn.Module):
    """Strided k3/s2/p1 sparse conv on chunked slots; params match
    `_SparseDownConv` ([27, Cin, Cout] kernel, no bias — BN follows)."""

    cin: int
    cout: int
    spatial_shape: Tuple[int, int, int]
    out_spatial_shape: Tuple[int, int, int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, occ_bits, colkey, chunk, valid, sites, out_tb):
        w = self.param("kernel", _kaiming, (27, self.cin, self.cout))
        return down2_conv_chunked(
            feats, occ_bits, colkey, chunk, valid, w, None, sites, out_tb,
            self.spatial_shape, self.out_spatial_shape,
            jnp.dtype(self.dtype).name,
        )


class _Down2ChunkedV2(nn.Module):
    """Host-topology down conv (ops.down2_conv_v2): 13-z rows kill the B
    gather, out occupancy comes from the planner. Param tree identical to
    `_Down2Chunked` (checkpoint-compatible)."""

    cin: int
    cout: int
    spatial_shape: Tuple[int, int, int]
    out_spatial_shape: Tuple[int, int, int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, occ_bits, colkey, chunk, valid, sites,
                 occ_bits_out):
        w = self.param("kernel", _kaiming, (27, self.cin, self.cout))
        return down2_conv_v2(
            feats, occ_bits, colkey, chunk, valid, w, None, sites,
            occ_bits_out, self.spatial_shape, self.out_spatial_shape,
            jnp.dtype(self.dtype).name,
        )


class VoxelResBackBone8x(nn.Module):
    """Sparse middle encoder; input [B, V, 5] voxel mean features + coords."""

    cfg: LidarEncoderConfig
    eval_mode_caps: bool = False
    dtype: Any = jnp.bfloat16

    def _chunked_flow(self, feats, coords, train, shapes, caps, topo=None):
        """Round-2 fast path: chunked s0/s2 + masked dense conv3d from s3.

        Math-identical to the per-voxel path (tests/test_lidar_encoder_impls
        cross-checks the full BEV output), ~5× fewer gather rows on s0/s2
        and MXU-dense conv3d where occupancy is high (s3: ~5%, s4: ~20%).

        topo: optional loader-side topology tables (data/topology_host.py)
        — when present, all coords-only slot/table building (~300 ms/step
        on v5e, PROFILE.md) is skipped and the device only gathers."""
        from unidistill_tpu.ops.sparse_conv_chunked import (
            ChunkedSparseTensor,
            chunked_from_host,
            sites_from_host,
            tables_from_host,
        )

        s0, s2, s3, s4, s5 = shapes
        dt = self.dtype
        B = feats.shape[0]

        # widen the 5-channel voxel features to 16 BEFORE building the flat
        # layout: every s0 hot tensor (slot build gather, window rows) then
        # keeps ≥128 B contiguous rows (see _SubMConvChunked.cin_pad)
        cin = feats.shape[-1]
        cin_pad = 16 if cin < 16 else cin
        if cin_pad != cin:
            feats = jnp.pad(feats, ((0, 0), (0, 0), (0, cin_pad - cin)))

        if topo is not None:
            st = chunked_from_host(
                feats.astype(dt), topo["src0"], topo["ck0"], topo["ch0"],
                s0[1] * s0[2],
            )
            tb0 = tables_from_host(topo["nbr0"])
        else:
            st = chunked_from_voxels(
                feats.astype(dt), coords, s0,
                slot_cap=min(feats.shape[1], self.cfg.s0_slot_cap),
            )
            tb0 = build_chunked_tables(st.colkey, st.chunk, st.valid, s0)

        def bn_relu_ch(f, occ_bits, name):
            return nn.relu(MaskedBatchNormZ(name=name)(f, occ_bits, train))

        # selective block remat (cfg.no_remat_stages): the chunked convs'
        # custom VJPs already save only their inputs, so skipping remat on
        # a stage stores just its inter-conv activations while removing a
        # full forward replay from the backward (param trees identical)
        nr = self.cfg.no_remat_stages

        def block_c(stage, planes, name):
            cls = (SparseBasicBlockChunked if stage in nr
                   else _RematBlockC)
            return cls(planes, dt, name=name)

        f = _SubMConvChunked(cin, 16, False, dt, cin_pad=cin_pad,
                             name="conv_input")(
            st.feats, st.occ_bits, st.colkey, st.chunk, st.valid, tb0)
        f = bn_relu_ch(f, st.occ_bits, "bn_input")
        f = block_c("res1", 16, "res1a")(
            f, st.occ_bits, st.colkey, st.chunk, st.valid, tb0, train)
        f = block_c("res1", 16, "res1b")(
            f, st.occ_bits, st.colkey, st.chunk, st.valid, tb0, train)

        if topo is not None:
            sites2 = sites_from_host(topo["ck2"], topo["ch2"], topo["a2"],
                                     topo["b2"], topo["rev2"], s2[1] * s2[2])
            tb2 = tables_from_host(topo["nbr2"])
        else:
            sites2 = down2_sites(st.colkey, st.chunk, st.valid, tb0, s0, s2,
                                 caps[0])
            tb2 = build_chunked_tables(sites2.colkey, sites2.chunk,
                                       sites2.valid, s2)
        if topo is not None and "occ2" in topo:
            occ2 = topo["occ2"]
            f2 = _Down2ChunkedV2(16, 32, s0, s2, dt, name="down2")(
                f, st.occ_bits, st.colkey, st.chunk, st.valid, sites2, occ2
            )
        else:
            f2, occ2 = _Down2Chunked(16, 32, s0, s2, dt, name="down2")(
                f, st.occ_bits, st.colkey, st.chunk, st.valid, sites2, tb2
            )
            occ2 = jax.lax.stop_gradient(occ2)  # integer topology (no JVP)
        f2 = bn_relu_ch(f2, occ2, "bn2")
        f2 = block_c("res2", 32, "res2a")(
            f2, occ2, sites2.colkey, sites2.chunk, sites2.valid, tb2, train)
        f2 = block_c("res2", 32, "res2b")(
            f2, occ2, sites2.colkey, sites2.chunk, sites2.valid, tb2, train)

        # s3 stays chunked too: at the 65k slot cap, 9 row-gathers/slot
        # beat dense conv2d decompositions ~3x (s3 occupancy is ~3-6%)
        if topo is not None:
            sites3 = sites_from_host(topo["ck3"], topo["ch3"], topo["a3"],
                                     topo["b3"], topo["rev3"], s3[1] * s3[2])
            tb3 = tables_from_host(topo["nbr3"])
        else:
            sites3 = down2_sites(sites2.colkey, sites2.chunk, sites2.valid,
                                 tb2, s2, s3, caps[1])
            tb3 = build_chunked_tables(sites3.colkey, sites3.chunk,
                                       sites3.valid, s3)
        if topo is not None and "occ3" in topo:
            occ3 = topo["occ3"]
            f3 = _Down2ChunkedV2(32, 64, s2, s3, dt, name="down3")(
                f2, occ2, sites2.colkey, sites2.chunk, sites2.valid, sites3,
                occ3
            )
        else:
            f3, occ3 = _Down2Chunked(32, 64, s2, s3, dt, name="down3")(
                f2, occ2, sites2.colkey, sites2.chunk, sites2.valid, sites3,
                tb3
            )
            occ3 = jax.lax.stop_gradient(occ3)  # integer topology (no JVP)
        f3 = bn_relu_ch(f3, occ3, "bn3")
        f3 = block_c("res3", 64, "res3a")(
            f3, occ3, sites3.colkey, sites3.chunk, sites3.valid, tb3, train)
        f3 = block_c("res3", 64, "res3b")(
            f3, occ3, sites3.colkey, sites3.chunk, sites3.valid, tb3, train)

        st3 = ChunkedSparseTensor(f3, occ3, sites3.colkey, sites3.chunk,
                                  sites3.valid)
        # chunk-folded dense [B, H3, W3, 3, 4·64] — minor dim 256, no padding
        dense3, occz3 = chunked_to_dense(st3, s3)
        # occz3: [B, 12, H3, W3] z-outer (plane 11 is empty chunk padding)

        def bn_relu_d(x, occ, name):
            C = x.shape[-1]
            x = MaskedBatchNorm(name=name)(
                x.reshape(B, -1, C), occ.reshape(B, -1), train
            ).reshape(x.shape)
            return nn.relu(x)

        d4 = _FoldConv3d(64, 128, (2, 2, 2), (0, 1, 1), s3[0], s4[0], dt,
                         name="down4")(dense3)  # [B, H4, W4, 5, 128]
        occ4 = _maxpool_occ(occz3, (3, 3, 3), (2, 2, 2), (0, 1, 1))
        d4 = jnp.transpose(d4, (0, 3, 1, 2, 4))  # z-outer [B, 5, 180, 180, 128]
        d4 = bn_relu_d(d4, occ4, "bn4")
        d4 = (SparseBasicBlockDense if "res4" in nr else _RematBlockD)(128, dt, name="res4a")(d4, occ4, train)
        d4 = (SparseBasicBlockDense if "res4" in nr else _RematBlockD)(128, dt, name="res4b")(d4, occ4, train)

        d5 = _DenseConv3d(128, 128, (3, 1, 1), (2, 1, 1), (0, 0, 0), False,
                          dt, name="conv_out")(d4)
        occ5 = _maxpool_occ(occ4, (3, 1, 1), (2, 1, 1), (0, 0, 0))
        d5 = bn_relu_d(d5, occ5, "bn_out")

        # HeightCompression: [B, D, H, W, C] → [B, H, W, C·D], channel index
        # c·D + d to match torch's view(N, C·D, H, W) fold. The dense path's
        # z extent equals s5[0] exactly ((5-3)//2+1 = 2 — no chunk padding
        # survives the two strided z convs).
        Bn, Dz, H, W, C = d5.shape
        return jnp.transpose(d5, (0, 2, 3, 4, 1)).reshape(Bn, H, W, C * Dz)

    @nn.compact
    def __call__(self, feats, coords, train: bool, topo=None):
        cfg = self.cfg
        nx, ny, nz = cfg.grid_size
        s0 = (nz + 1, ny, nx)  # ref: grid_size[::-1] + [1, 0, 0] → (41, 1440, 1440)
        s2 = tuple((d + 2 - 3) // 2 + 1 for d in s0)  # (21, 720, 720)
        s3 = tuple((d + 2 - 3) // 2 + 1 for d in s2)  # (11, 360, 360)
        s4 = (
            (s3[0] - 3) // 2 + 1,
            (s3[1] + 2 - 3) // 2 + 1,
            (s3[2] + 2 - 3) // 2 + 1,
        )  # (5, 180, 180)
        s5 = ((s4[0] - 3) // 2 + 1, s4[1], s4[2])  # (2, 180, 180)
        caps = cfg.stage_voxel_caps

        if cfg.encoder_impl == "chunked":
            return self._chunked_flow(
                feats, coords, train, (s0, s2, s3, s4, s5), caps, topo
            )

        # from_voxels is elementwise — batched arrays pass straight through
        st = from_voxels(feats.astype(self.dtype), coords, s0)

        def bn_relu(st_b, name):
            f = MaskedBatchNorm(name=name)(st_b.features, st_b.valid, train)
            return st_b._replace(features=nn.relu(f))

        ccaps = cfg.stage_col_caps

        def subm_taps(tb, st_b, shape):
            # one tap table per voxel set, shared by every SubM conv in the
            # stage (spconv caches per indice_key the same way)
            D, H, W = shape
            q = subm_column_queries(tb, H, W)
            nbr = column_neighbor_slots(tb, q, H * W)
            zbase = st_b.coords[..., 0] - 1
            return taps_from_tables(
                tb, nbr, tb.col_of, zbase, 3, 9, D, st_b.features.shape[1]
            )

        tb = build_stage_tables(st.keys, st.valid, s0, ccaps[0])
        r = subm_taps(tb, st, s0)
        st = _SubMConv(feats.shape[-1], 16, False, s0, self.dtype,
                       name="conv_input")(st, r)
        st = bn_relu(st, "bn_input")
        st = SparseBasicBlock(16, s0, self.dtype, name="res1a")(st, train, r)
        st = SparseBasicBlock(16, s0, self.dtype, name="res1b")(st, train, r)

        st, tb = _SparseDownConv(16, 32, (3, 3, 3), (2, 2, 2), (1, 1, 1), s0,
                                 s2, caps[0], ccaps[1], self.dtype,
                                 name="down2")(st, tb)
        st = bn_relu(st, "bn2")
        r = subm_taps(tb, st, s2)
        st = SparseBasicBlock(32, s2, self.dtype, name="res2a")(st, train, r)
        st = SparseBasicBlock(32, s2, self.dtype, name="res2b")(st, train, r)

        st, tb = _SparseDownConv(32, 64, (3, 3, 3), (2, 2, 2), (1, 1, 1), s2,
                                 s3, caps[1], ccaps[2], self.dtype,
                                 name="down3")(st, tb)
        st = bn_relu(st, "bn3")
        r = subm_taps(tb, st, s3)
        st = SparseBasicBlock(64, s3, self.dtype, name="res3a")(st, train, r)
        st = SparseBasicBlock(64, s3, self.dtype, name="res3b")(st, train, r)

        st, tb = _SparseDownConv(64, 128, (3, 3, 3), (2, 2, 2), (0, 1, 1), s3,
                                 s4, caps[2], ccaps[3], self.dtype,
                                 name="down4")(st, tb)
        st = bn_relu(st, "bn4")
        r = subm_taps(tb, st, s4)
        st = SparseBasicBlock(128, s4, self.dtype, name="res4a")(st, train, r)
        st = SparseBasicBlock(128, s4, self.dtype, name="res4b")(st, train, r)

        st, tb = _SparseDownConv(128, 128, (3, 1, 1), (2, 1, 1), (0, 0, 0),
                                 s4, s5, caps[3], ccaps[4], self.dtype,
                                 name="conv_out")(st, tb)
        st = bn_relu(st, "bn_out")

        # HeightCompression: dense [B, D, H, W, C] → [B, H, W, C*D], channel
        # index c*D + d to match torch's view(N, C*D, H, W) fold.
        D, H, W = s5
        C = st.features.shape[-1]

        # densify through flat global rows (vmapped scatters hit the slow
        # batched-gather layouts; see ops/sparse_conv.py batched section)
        B = st.keys.shape[0]
        span = D * H * W + 1
        idx = jnp.where(st.valid, st.keys, D * H * W)
        gidx = (idx + jnp.arange(B, dtype=idx.dtype)[:, None] * span).reshape(-1)
        flat = jnp.zeros((B * span, C), dtype=st.features.dtype)
        flat = flat.at[gidx].set(st.features.reshape(-1, C), mode="drop")
        dense = flat.reshape(B, span, C)[:, : D * H * W].reshape(
            B, H, W, D, C
        )
        # xy-major keys → dense is [B, H, W, D, C]; fold as channel c·D + d
        bev = jnp.transpose(dense, (0, 1, 2, 4, 3)).reshape(-1, H, W, C * D)
        return bev


class LidarEncoder(nn.Module):
    cfg: LidarEncoderConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, voxel_feats, voxel_coords, train: bool, topo=None):
        """voxel_feats [B, V, 5] (mean VFE output), voxel_coords [B, V, 3] (z,y,x)."""
        return VoxelResBackBone8x(self.cfg, dtype=self.dtype, name="backbone_3d")(
            voxel_feats, voxel_coords, train, topo
        )
