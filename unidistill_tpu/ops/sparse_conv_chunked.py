"""Z-chunked column-dense sparse 3D convolution — the round-2 fast LiDAR path.

Replaces the per-voxel gather-GEMM (`ops/sparse_conv.py`) for the hot s0/s2
stages of the LiDAR encoder (ref layers/blocks_3d/det3d/spconv_backbone.py:
253-343 delegates these to spconv CUDA; this layout has no reference analog —
it is a TPU design driven by the measured ~2 ns/row gather floor, PROFILE.md).

Design
======
A *slot* is an occupied (BEV column, z-chunk) cell, with z-chunks of CHUNK=4
consecutive z levels. Features live as ``[B, S, 4, C]`` with zeros at absent
z positions, plus an exact site-occupancy mask ``occ [B, S, 4]``. Slots are
sorted by (column key = y·W+x, chunk) — the same xy-major order the
voxelizer emits.

A 3³ submanifold conv at voxel (z,y,x) needs inputs from 9 xy-neighbor
columns at z−1..z+1. Here the z dimension is *in-register*: per xy offset
the conv gathers ONE row per slot from a z-dilated window table whose rows
cover z ∈ [4s−1, 4s+4] (6 positions), and the 3 z-taps become static slices
feeding 27 batched matmuls on the MXU. Gather count: 9·S rows/conv instead
of 27·V — row gathers cost ~2 ns each regardless of width ≤512B, so this is
the dominant saving. Neighbor resolution is a *dense packed column map*
(int32 = dilated-base ≪ NCH | chunk-bitmap) + popcount — no searchsorted /
sort in the subm path at all.

Exactness: the window table is built over the *dilated* chunk set
(bits | bits≪1 | bits≫1), so a chunk-s window always finds boundary voxels
living in chunks s±1 even when chunk s itself is empty. Dilated capacity is
statically 3·S — it can never overflow, so the op is exact for any voxel
set that fit the voxel cap (oracle-tested against dense convolution in
tests/test_sparse_conv_chunked.py).

Backward: custom VJPs express grad-of-gather as *reverse-offset gathers*
(the subm neighbor relation is symmetric; the strided conv transposes to a
9-offset parity-masked gather), never as scatter-adds (~65 ns/index on TPU,
30× the gather cost — PROFILE.md).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 4  # z levels per chunk; window rows cover CHUNK + 2 positions


def _nch(D: int) -> int:
    return -(-D // CHUNK)


def _f0(x):
    """float0 cotangent for an int/bool array (custom_vjp convention)."""
    return np.zeros(x.shape, jax.dtypes.float0)


class ChunkedSparseTensor(NamedTuple):
    """Batched z-chunked sparse voxel tensor with static slot capacity S."""

    feats: jnp.ndarray   # [B, S, 4, C]; zeros at absent z positions
    occ: jnp.ndarray     # [B, S, 4] bool — exact site occupancy
    colkey: jnp.ndarray  # [B, S] int32 y·W+x; H·W sentinel on unused slots
    chunk: jnp.ndarray   # [B, S] int32 z-chunk index; 0 on unused slots
    valid: jnp.ndarray   # [B, S] bool


class ChunkedTables(NamedTuple):
    """Per-stage neighbor tables, shared by every conv on the voxel set.

    Window-table row indices address a [Sd+2, ·] buffer: rows [0, Sd) are
    dilated slots, row Sd is the all-zero "absent" row, and Sd+1 is unused
    (scatter sentinels point out of bounds and are dropped)."""

    nbr_dil: jnp.ndarray   # [B, 9, S] int32 dilated-row idx per xy offset
    dil_self: jnp.ndarray  # [B, S] int32 dilated idx of each slot
    dil_lo: jnp.ndarray    # [B, S] int32 dilated idx of (col, chunk-1)
    dil_hi: jnp.ndarray    # [B, S] int32 dilated idx of (col, chunk+1)
    colmap: jnp.ndarray    # [B·(H·W+1)] int32 packed (dilbase<<NCH)|dilbits; -1 empty

    @property
    def sd(self):
        """Dilated capacity — statically 3·S (cannot overflow)."""
        return 3 * self.dil_self.shape[1]


def _column_arrays(colkey, chunk, valid, hw: int):
    """Segment the sorted slot array into columns.

    Returns (colstart [B,S], col_of [B,S] (S on invalid), ckey_c [B,S]
    (hw sentinel), bits_c [B,S] chunk bitmaps, col_valid [B,S])."""
    B, S = colkey.shape
    boff = jnp.arange(B, dtype=jnp.int32)[:, None]
    prev = jnp.concatenate([jnp.full((B, 1), -1, colkey.dtype), colkey[:, :-1]], 1)
    colstart = valid & (colkey != prev)
    col_of = jnp.cumsum(colstart.astype(jnp.int32), 1) - 1
    col_of = jnp.where(valid, col_of, S)
    gcol = (jnp.minimum(col_of, S) + boff * (S + 1)).reshape(-1)
    bits_c = jax.ops.segment_sum(
        jnp.where(valid, 1 << chunk, 0).reshape(-1), gcol,
        num_segments=B * (S + 1), indices_are_sorted=True,
    ).reshape(B, S + 1)[:, :S]
    OOB = B * (S + 1) + 7
    cdest = jnp.where(colstart, col_of + boff * (S + 1), OOB).reshape(-1)
    ckey_c = jnp.full((B * (S + 1),), hw, jnp.int32)
    ckey_c = ckey_c.at[cdest].set(
        colkey.reshape(-1), mode="drop", unique_indices=True
    ).reshape(B, S + 1)[:, :S]
    col_valid = ckey_c < hw
    return colstart, col_of, ckey_c, bits_c, col_valid


def chunked_from_voxels(
    feats: jnp.ndarray,   # [B, V, C] sorted by xy-major key (voxelizer order)
    coords: jnp.ndarray,  # [B, V, 3] int32 (z, y, x); -1 padding
    spatial_shape: Tuple[int, int, int],
    slot_cap: int | None = None,
) -> ChunkedSparseTensor:
    """Build the chunked layout from key-sorted voxel lists.

    slot_cap defaults to V (always sufficient: #slots ≤ #voxels)."""
    D, H, W = spatial_shape
    B, V, C = feats.shape
    S = V if slot_cap is None else slot_cap
    boff = jnp.arange(B, dtype=jnp.int32)[:, None]
    z, y, x = coords[..., 0], coords[..., 1], coords[..., 2]
    ok = (z >= 0) & (z < D) & (y >= 0) & (y < H) & (x >= 0) & (x < W)
    ck = jnp.where(ok, y * W + x, H * W)
    ch = jnp.where(ok, z // CHUNK, 0)
    zp = jnp.where(ok, z % CHUNK, 0)

    prev_ck = jnp.concatenate([jnp.full((B, 1), -1, ck.dtype), ck[:, :-1]], 1)
    prev_ch = jnp.concatenate([jnp.full((B, 1), -1, ch.dtype), ch[:, :-1]], 1)
    start = ok & ((ck != prev_ck) | (ch != prev_ch))
    slot = jnp.cumsum(start.astype(jnp.int32), axis=1) - 1
    keep = ok & (slot < S)

    OOB = B * (S + 1) * CHUNK + 7
    gdest = jnp.where(
        keep, (slot + boff * (S + 1)) * CHUNK + zp, OOB
    ).reshape(-1)
    flat = jnp.zeros((B * (S + 1) * CHUNK, C), feats.dtype)
    flat = flat.at[gdest].set(
        feats.reshape(-1, C), mode="drop", unique_indices=True
    )
    cf = flat.reshape(B, S + 1, CHUNK, C)[:, :S]
    occf = jnp.zeros((B * (S + 1) * CHUNK,), jnp.int8)
    occf = occf.at[gdest].set(
        jnp.ones((B * V,), jnp.int8), mode="drop", unique_indices=True
    )
    occ = occf.reshape(B, S + 1, CHUNK)[:, :S].astype(bool)

    sOOB = B * (S + 1) + 7
    sdest = jnp.where(start & (slot < S), slot + boff * (S + 1), sOOB)
    meta = jnp.zeros((B * (S + 1), 2), jnp.int32)
    meta = meta.at[sdest.reshape(-1)].set(
        jnp.stack([ck, ch], -1).reshape(-1, 2), mode="drop",
        unique_indices=True,
    ).reshape(B, S + 1, 2)[:, :S]
    nslot = jnp.sum((start & (slot < S)).astype(jnp.int32), axis=1)
    valid = jnp.arange(S, dtype=jnp.int32)[None, :] < nslot[:, None]
    colkey = jnp.where(valid, meta[..., 0], H * W)
    chunk = jnp.where(valid, meta[..., 1], 0)
    return ChunkedSparseTensor(cf, occ & valid[..., None], colkey, chunk, valid)


def _decode_pack(pack, chunk, nch: int, sd: int):
    """Packed colmap value + chunk → dilated row idx (sd = zero row when absent)."""
    dbits = pack & ((1 << nch) - 1)
    base = pack >> nch
    hit = (pack >= 0) & (((dbits >> chunk) & 1) == 1)
    below = dbits & ((1 << chunk) - 1)
    return jnp.where(hit, base + jax.lax.population_count(below), sd)


def _offset_packs_yx(yc, xc, col_valid, colmap, H: int, W: int):
    B, S = yc.shape
    boff = jnp.arange(B, dtype=jnp.int32)[:, None]
    packs = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ny, nx_ = yc + dy, xc + dx
            inb = col_valid & (ny >= 0) & (ny < H) & (nx_ >= 0) & (nx_ < W)
            q = jnp.where(inb, ny * W + nx_, H * W)
            packs.append(
                colmap[(q + boff * (H * W + 1)).reshape(-1)].reshape(B, S)
            )
    packs = jnp.stack(packs, -1)  # [B, S, 9]
    packs = jnp.where(col_valid[..., None], packs, -1)
    packs = jnp.pad(packs, ((0, 0), (0, 0), (0, 7)), constant_values=-1)
    return jnp.concatenate(
        [packs, jnp.full((B, 1, 16), -1, jnp.int32)], axis=1
    )  # [B, S+1, 16]


def build_chunked_tables(
    colkey, chunk, valid, spatial_shape: Tuple[int, int, int]
) -> ChunkedTables:
    """Stage tables from the slot skeleton (features not needed)."""
    D, H, W = spatial_shape
    nch = _nch(D)
    B, S = colkey.shape
    sd = 3 * S
    boff = jnp.arange(B, dtype=jnp.int32)[:, None]

    colstart, col_of, ckey_c, bits_c, col_valid = _column_arrays(
        colkey, chunk, valid, H * W
    )
    mask_all = (1 << nch) - 1
    dilbits = (bits_c | (bits_c << 1) | (bits_c >> 1)) & mask_all
    dilbits = jnp.where(col_valid, dilbits, 0)
    ndil = jax.lax.population_count(dilbits)
    dilbase = jnp.cumsum(ndil, axis=1) - ndil  # exclusive, per sample

    packed = (dilbase << nch) | dilbits
    OOB = B * (H * W + 1) + 7
    cdest = jnp.where(col_valid, ckey_c + boff * (H * W + 1), OOB).reshape(-1)
    cmap = jnp.full((B * (H * W + 1),), -1, jnp.int32)
    cmap = cmap.at[cdest].set(
        packed.reshape(-1), mode="drop", unique_indices=True
    )

    yc, xc = ckey_c // W, ckey_c % W
    packs = _offset_packs_yx(yc, xc, col_valid, cmap, H, W)  # [B, S+1, 16]
    slot_packs = jnp.stack(
        [packs[b][jnp.minimum(col_of[b], S)] for b in range(B)]
    )  # [B, S, 16]

    nbr = [
        _decode_pack(slot_packs[..., o], chunk, nch, sd) for o in range(9)
    ]
    nbr_dil = jnp.stack(nbr, axis=1)
    nbr_dil = jnp.where(valid[:, None, :], nbr_dil, sd)

    own = slot_packs[..., 4]
    dil_self = jnp.where(valid, _decode_pack(own, chunk, nch, sd), sd + 2)
    lo_ok = valid & (chunk > 0)
    dil_lo = jnp.where(
        lo_ok, _decode_pack(own, jnp.maximum(chunk - 1, 0), nch, sd), sd + 2
    )
    hi_ok = valid & (chunk < nch - 1)
    dil_hi = jnp.where(
        hi_ok, _decode_pack(own, jnp.minimum(chunk + 1, nch - 1), nch, sd),
        sd + 2,
    )
    return ChunkedTables(nbr_dil, dil_self, dil_lo, dil_hi, cmap)


def _build_window_tables(feats, occ, tables: ChunkedTables, with_occ: bool):
    """[B, S, 4, C](+occ) → per-sample window tables, list of [Sd+2, 6·cw] f32.

    Row p of dilated slot (c, s) holds z = 4s−1+p. Three sorted+unique
    scatters: own 4 z's at positions 1-4, own z3 into (c,s+1) pos 0, own z0
    into (c,s−1) pos 5. Row Sd stays zero (the "absent" gather target)."""
    B, S, _, C = feats.shape
    sd = tables.sd
    cw = C + 1 if with_occ else C
    src = feats.astype(jnp.float32)
    if with_occ:
        src = jnp.concatenate([src, occ.astype(jnp.float32)[..., None]], -1)
    tabs = []
    for b in range(B):
        t = jnp.zeros((sd + 2, 6 * cw), jnp.float32)
        t = t.at[tables.dil_self[b], cw:5 * cw].set(
            src[b].reshape(S, 4 * cw), mode="drop",
            indices_are_sorted=True, unique_indices=True,
        )
        t = t.at[tables.dil_hi[b], 0:cw].set(
            src[b, :, 3], mode="drop", unique_indices=True
        )
        t = t.at[tables.dil_lo[b], 5 * cw:6 * cw].set(
            src[b, :, 0], mode="drop", unique_indices=True
        )
        tabs.append(t)
    return tabs, cw


def _w_zyx(weight: jnp.ndarray):
    """[27, Cin, Cout] (z-major `_kernel_offsets` order) → [3z, 3y, 3x, Ci, Co]."""
    K, ci, co = weight.shape
    return weight.reshape(3, 3, 3, ci, co)


# ---------------------------------------------------------------------------
# Submanifold 3x3x3 conv
# ---------------------------------------------------------------------------


def _subm_impl(feats, occ, weight, bias, tables: ChunkedTables, dtype_str):
    """feats [B,S,4,Cin] → occ-masked [B,S,4,Cout]."""
    B, S, _, C = feats.shape
    dt = jnp.dtype(dtype_str)
    w = _w_zyx(weight).astype(dt)
    tabs, _ = _build_window_tables(feats, occ, tables, with_occ=False)
    outs = []
    for b in range(B):
        acc = None
        for o in range(9):
            dy, dx = o // 3, o % 3
            g = tabs[b][tables.nbr_dil[b, o]].reshape(S, 6, C).astype(dt)
            for dz in range(3):
                # out z-pos zi reads window position zi + dz
                term = jnp.einsum(
                    "szc,co->szo", g[:, dz:dz + 4, :], w[dz, dy, dx],
                    preferred_element_type=dt,
                )
                acc = term if acc is None else acc + term
        outs.append(acc)
    out = jnp.stack(outs)
    if bias is not None:
        out = out + bias.astype(dt)
    return jnp.where(occ[..., None], out, 0.0)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def subm_conv_chunked(feats, occ, weight, bias, tables, dtype_str: str):
    """Submanifold 3³ conv in the chunked layout (matches spconv.SubMConv3d
    semantics: outputs on the same active set; absent neighbors read 0)."""
    return _subm_impl(feats, occ, weight, bias, tables, dtype_str)


def _subm_fwd(feats, occ, weight, bias, tables, dtype_str):
    out = _subm_impl(feats, occ, weight, bias, tables, dtype_str)
    return out, (feats, occ, weight, bias is not None, tables)


def _subm_bwd(dtype_str, res, g):
    feats, occ, weight, has_bias, tables = res
    B, S, _, C = feats.shape
    co = weight.shape[-1]
    g = jnp.where(occ[..., None], g, 0.0).astype(jnp.float32)

    # d feats: subm conv of g with reversed offsets and W^T:
    #   out[v] = Σ_k W[k] f[v + k - 1]  ⇒  df[u] = Σ_k W[k]^T g[u - k + 1]
    wrev = jnp.flip(_w_zyx(weight), axis=(0, 1, 2)).transpose(0, 1, 2, 4, 3)
    dfeats = _subm_impl(
        g, occ, wrev.reshape(27, co, C).astype(jnp.float32), None, tables,
        "float32",
    ).astype(feats.dtype)

    # d weight / d bias: regather input windows, contract with g
    tabs, _ = _build_window_tables(feats, occ, tables, with_occ=False)
    dw = jnp.zeros((3, 3, 3, C, co), jnp.float32)
    for b in range(B):
        for o in range(9):
            dy, dx = o // 3, o % 3
            win = tabs[b][tables.nbr_dil[b, o]].reshape(S, 6, C)
            for dz in range(3):
                dw = dw.at[dz, dy, dx].add(
                    jnp.einsum("szc,szo->co", win[:, dz:dz + 4, :], g[b],
                               preferred_element_type=jnp.float32)
                )
    dweight = dw.reshape(27, C, co).astype(weight.dtype)
    dbias = jnp.sum(g, axis=(0, 1, 2)).astype(weight.dtype) if has_bias else None
    return (dfeats, _f0(occ), dweight, dbias, jax.tree.map(_f0, tables))


subm_conv_chunked.defvjp(_subm_fwd, _subm_bwd)


# ---------------------------------------------------------------------------
# Strided downsample conv (k=3, s=2, p=1 in all dims — the encoder's down2)
# ---------------------------------------------------------------------------


class DownSites(NamedTuple):
    """Output slot skeleton + gather tables of a k3/s2/p1 sparse conv."""

    colkey: jnp.ndarray  # [B, S2] int32 out column key; H2·W2 sentinel
    chunk: jnp.ndarray   # [B, S2] int32 out chunk
    valid: jnp.ndarray   # [B, S2] bool
    nbr_a: jnp.ndarray   # [B, 9, S2] dilated IN row idx at in-chunk 2s
    nbr_b: jnp.ndarray   # [B, 9, S2] dilated IN row idx at in-chunk 2s+1


def down2_sites(
    colkey, chunk, valid,
    in_tables: ChunkedTables,
    spatial_shape: Tuple[int, int, int],
    out_spatial_shape: Tuple[int, int, int],
    out_slot_cap: int,
) -> DownSites:
    """Output slots of the k3/s2/p1 sparse conv + per-slot gather tables.

    Out column (yo,xo) is a candidate iff an input column in its 3×3 strided
    footprint is occupied; out chunk bitmaps are a ≤11-step static transform
    of input chunk bitmaps (in chunk s → out z ∈ [2s, 2s+2]). Dedup of the
    ≤4 column candidates per input column via one banded sort. The emitted
    slot set is a (column-level) superset of the true out sites; exact
    per-site occupancy is computed by the conv itself (zero slots are
    harmless and masked)."""
    D, H, W = spatial_shape
    D2, H2, W2 = out_spatial_shape
    nch_in, nch_out = _nch(D), _nch(D2)
    B, S = colkey.shape
    S2 = out_slot_cap
    boff = jnp.arange(B, dtype=jnp.int32)[:, None]

    _, _, ckey_c, bits_c, col_valid = _column_arrays(colkey, chunk, valid, H * W)

    # out chunk bitmap per input column
    obits = jnp.zeros_like(bits_c)
    for s in range(nch_in):
        lo, hi = 2 * s, min(2 * s + 2, D2 - 1)
        m = 0
        for zo in range(lo, hi + 1):
            m |= 1 << (zo // CHUNK)
        if m:
            obits = obits | jnp.where(((bits_c >> s) & 1) == 1, m, 0)
    obits = jnp.where(col_valid, obits, 0)

    yc, xc = ckey_c // W, ckey_c % W
    SENT = H2 * W2
    cand_keys, cand_bits = [], []
    for ay in (0, 1):
        for ax in (0, 1):
            yo = (yc + 1) // 2 - ay
            xo = (xc + 1) // 2 - ax
            ok = (
                col_valid
                & (2 * yo + 1 >= yc) & (yc >= 2 * yo - 1)
                & (2 * xo + 1 >= xc) & (xc >= 2 * xo - 1)
                & (yo >= 0) & (yo < H2) & (xo >= 0) & (xo < W2)
            )
            cand_keys.append(jnp.where(ok, yo * W2 + xo, SENT))
            cand_bits.append(jnp.where(ok, obits, 0))
    ck4 = jnp.concatenate(cand_keys, axis=1)  # [B, 4S]
    cb4 = jnp.concatenate(cand_bits, axis=1)

    # one banded sort; then per-run OR of bitmaps; compact runs per sample
    band = (ck4 + boff * (SENT + 1)).reshape(-1)
    order = jnp.argsort(band)
    sk = band[order]
    sbits = cb4.reshape(-1)[order]
    is_new = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    run = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    NR = B * S2
    run_c = jnp.minimum(run, NR)
    run_bits = jnp.zeros((NR + 1,), jnp.int32)
    for bpos in range(nch_out):
        has = jax.ops.segment_max(
            ((sbits >> bpos) & 1), run_c, num_segments=NR + 1,
            indices_are_sorted=True,
        )
        run_bits = run_bits | (has << bpos)
    run_key = jax.ops.segment_min(
        sk, run_c, num_segments=NR + 1, indices_are_sorted=True
    )
    run_b = run_key // (SENT + 1)  # sample of run (>= B when empty/sentinel)
    run_valid = (run_b < B) & ((run_key % (SENT + 1)) < SENT) & (run_bits > 0)
    vr = run_valid.astype(jnp.int32)
    gpos = jnp.cumsum(vr) - vr
    sample_base = jax.ops.segment_min(
        jnp.where(run_valid, gpos, NR + 1), jnp.minimum(run_b, B),
        num_segments=B + 1,
    )
    rank = jnp.where(
        run_valid, gpos - sample_base[jnp.minimum(run_b, B)], S2
    )
    OOB = B * (S2 + 1) + 7
    dest = jnp.where(
        run_valid & (rank < S2), jnp.minimum(run_b, B) * (S2 + 1) + rank, OOB
    )
    ocol_key = jnp.full((B * (S2 + 1),), SENT, jnp.int32)
    ocol_key = ocol_key.at[dest].set(
        run_key % (SENT + 1), mode="drop", unique_indices=True
    ).reshape(B, S2 + 1)[:, :S2]
    ocol_bits = jnp.zeros((B * (S2 + 1),), jnp.int32)
    ocol_bits = ocol_bits.at[dest].set(
        run_bits, mode="drop", unique_indices=True
    ).reshape(B, S2 + 1)[:, :S2]
    ocol_valid = ocol_key < SENT
    ocol_bits = jnp.where(ocol_valid, ocol_bits, 0)

    # expand columns to slots
    nsl = jax.lax.population_count(ocol_bits)
    base = jnp.cumsum(nsl, axis=1) - nsl
    out_colkey = jnp.full((B * (S2 + 1),), SENT, jnp.int32)
    out_chunk = jnp.zeros((B * (S2 + 1),), jnp.int32)
    for cc in range(nch_out):
        has = ocol_valid & (((ocol_bits >> cc) & 1) == 1)
        rank_cc = base + jax.lax.population_count(ocol_bits & ((1 << cc) - 1))
        d = jnp.where(
            has & (rank_cc < S2), rank_cc + boff * (S2 + 1), OOB
        ).reshape(-1)
        out_colkey = out_colkey.at[d].set(
            ocol_key.reshape(-1), mode="drop", unique_indices=True
        )
        out_chunk = out_chunk.at[d].set(
            jnp.full((B * S2,), cc, jnp.int32), mode="drop", unique_indices=True
        )
    out_colkey = out_colkey.reshape(B, S2 + 1)[:, :S2]
    out_chunk = out_chunk.reshape(B, S2 + 1)[:, :S2]
    nslots = jnp.minimum(jnp.sum(jnp.where(ocol_valid, nsl, 0), axis=1), S2)
    out_valid = jnp.arange(S2, dtype=jnp.int32)[None] < nslots[:, None]
    out_colkey = jnp.where(out_valid, out_colkey, SENT)
    out_chunk = jnp.where(out_valid, out_chunk, 0)

    # per-out-slot gather tables into the INPUT window-table space
    yo, xo = out_colkey // W2, out_colkey % W2
    nbr_a, nbr_b = [], []
    for ky in range(3):
        for kx in range(3):
            yi = 2 * yo - 1 + ky
            xi = 2 * xo - 1 + kx
            inb = out_valid & (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            q = jnp.where(inb, yi * W + xi, H * W)
            pack = in_tables.colmap[
                (q + boff * (H * W + 1)).reshape(-1)
            ].reshape(B, S2)
            pack = jnp.where(inb, pack, -1)
            sd_in = in_tables.sd
            ca = _decode_pack(
                pack, jnp.minimum(2 * out_chunk, nch_in - 1), nch_in, sd_in
            )
            nbr_a.append(jnp.where(2 * out_chunk <= nch_in - 1, ca, sd_in))
            cb = _decode_pack(
                pack, jnp.minimum(2 * out_chunk + 1, nch_in - 1), nch_in, sd_in
            )
            nbr_b.append(
                jnp.where(2 * out_chunk + 1 <= nch_in - 1, cb, sd_in)
            )
    return DownSites(
        out_colkey, out_chunk, out_valid,
        jnp.stack(nbr_a, axis=1), jnp.stack(nbr_b, axis=1),
    )


def _down2_impl(feats, occ, weight, bias, in_tables, sites, dtype_str):
    """→ (out [B,S2,4,Cout], occ_out [B,S2,4])."""
    B, S, _, C = feats.shape
    S2 = sites.colkey.shape[1]
    co = weight.shape[-1]
    dt = jnp.dtype(dtype_str)
    w = _w_zyx(weight).astype(dt)
    tabs, cw = _build_window_tables(feats, occ, in_tables, with_occ=True)
    outs, occs = [], []
    for b in range(B):
        acc = jnp.zeros((S2, 4, co), dt)
        oacc = jnp.zeros((S2, 4), jnp.float32)
        for o in range(9):
            ky, kx = o // 3, o % 3
            A = tabs[b][sites.nbr_a[b, o]].reshape(S2, 6, cw)
            Bw = tabs[b][sites.nbr_b[b, o]].reshape(S2, 6, cw)
            # out window positions p = z − (8s−1): A covers p 0..5, B p 4..9
            w10 = jnp.concatenate([A, Bw[:, 2:6]], axis=1)  # [S2, 10, cw]
            for kz in range(3):
                sl = w10[:, kz:kz + 7:2, :]  # p = 2zi + kz, zi = 0..3
                acc = acc + jnp.einsum(
                    "szc,co->szo", sl[..., :C].astype(dt), w[kz, ky, kx],
                    preferred_element_type=dt,
                )
                oacc = jnp.maximum(oacc, sl[..., C])
        outs.append(acc)
        occs.append(oacc > 0.5)
    out = jnp.stack(outs)
    occ_out = jnp.stack(occs) & sites.valid[..., None]
    if bias is not None:
        out = out + bias.astype(dt)
    return jnp.where(occ_out[..., None], out, 0.0), occ_out


@partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def down2_conv_chunked(
    feats, occ, in_colkey, in_chunk, weight, bias, in_tables, sites,
    out_tables, spatial_shape, out_spatial_shape, dtype_str: str,
):
    """Strided k3/s2/p1 sparse conv (spconv.SparseConv3d semantics: an out
    site is active iff ≥1 input site lies in its receptive field).

    in_colkey/in_chunk: the input slot coordinates (used by the VJP).
    out_tables: the OUT stage's ChunkedTables (built from the DownSites
    skeleton; also reused by the following subm convs) — the VJP gathers
    from the output-grad window table through them."""
    out, occ_out = _down2_impl(feats, occ, weight, bias, in_tables, sites,
                               dtype_str)
    return out, occ_out


def _down2_fwd(feats, occ, in_colkey, in_chunk, weight, bias, in_tables,
               sites, out_tables, spatial_shape, out_spatial_shape, dtype_str):
    out, occ_out = _down2_impl(feats, occ, weight, bias, in_tables, sites,
                               dtype_str)
    return (out, occ_out), (
        feats, occ, in_colkey, in_chunk, weight, bias is not None, in_tables,
        sites, out_tables, occ_out,
    )


def _down2_bwd(spatial_shape, out_spatial_shape, dtype_str, res, gs):
    """Transpose of the strided conv as a reverse parity-masked gather.

    Input voxel (y, x, z) feeds out voxel (yo, xo, zo) via tap (ky, kx, kz)
    iff y = 2yo−1+ky (etc.) — per tap, yo = (y+1−ky)/2 exists only when the
    parity matches. For a whole input chunk s, the out z range [2s, 2s+2]
    always fits ONE out window row (out chunk s//2), at a static position
    offset selected by the parity of s (even: +1, odd: +3)."""
    (feats, occ, in_colkey, in_chunk, weight, has_bias, in_tables, sites,
     out_tables, occ_out) = res
    g, _g_occ = gs
    D, H, W = spatial_shape
    D2, H2, W2 = out_spatial_shape
    B, S, _, C = feats.shape
    S2 = occ_out.shape[1]
    co = weight.shape[-1]
    g = jnp.where(occ_out[..., None], g, 0.0).astype(jnp.float32)
    w = _w_zyx(weight).astype(jnp.float32)
    boff = jnp.arange(B, dtype=jnp.int32)[:, None]

    gtabs, _ = _build_window_tables(g, occ_out, out_tables, with_occ=False)

    yc, xc = in_colkey // W, in_colkey % W  # per input slot
    spar = (in_chunk % 2).astype(bool)
    nch_out = _nch(D2)
    sd_out = out_tables.sd
    oc0 = jnp.clip(in_chunk // 2, 0, nch_out - 1)
    # valid (zi, kz) pairs: kz ≡ zi+1 (mod 2); window pos = (zi+1-kz)//2 + 1|3
    zk = [(zi, kz) for zi in range(4) for kz in range(3) if (zi + 1 - kz) % 2 == 0]

    dfs = []
    for b in range(B):
        df = jnp.zeros((S, 4, C), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                ny, nx_ = yc[b] + 1 - ky, xc[b] + 1 - kx
                ok = (
                    (ny % 2 == 0) & (nx_ % 2 == 0)
                    & (ny >= 0) & (ny < 2 * H2) & (nx_ >= 0) & (nx_ < 2 * W2)
                    & (in_colkey[b] < H * W)
                )
                q = jnp.where(ok, (ny // 2) * W2 + (nx_ // 2), H2 * W2)
                pack = out_tables.colmap[q + b * (H2 * W2 + 1)]
                row = _decode_pack(pack, oc0[b], nch_out, sd_out)
                grow = gtabs[b][row].reshape(S, 6, co)
                for zi, kz in zk:
                    pbase = (zi + 1 - kz) // 2
                    sel = jnp.where(
                        spar[b][:, None], grow[:, pbase + 3, :],
                        grow[:, pbase + 1, :],
                    )
                    df = df.at[:, zi, :].add(
                        sel @ w[kz, ky, kx].T
                    )
        dfs.append(df)
    dfeats = jnp.where(
        occ[..., None], jnp.stack(dfs), 0.0
    ).astype(feats.dtype)

    # d weight / d bias: regather forward windows, contract with g
    tabs, cw = _build_window_tables(feats, occ, in_tables, with_occ=True)
    dw = jnp.zeros((3, 3, 3, C, co), jnp.float32)
    for b in range(B):
        for o in range(9):
            ky, kx = o // 3, o % 3
            A = tabs[b][sites.nbr_a[b, o]].reshape(S2, 6, cw)
            Bw = tabs[b][sites.nbr_b[b, o]].reshape(S2, 6, cw)
            w10 = jnp.concatenate([A, Bw[:, 2:6]], axis=1)
            for kz in range(3):
                sl = w10[:, kz:kz + 7:2, :C]
                dw = dw.at[kz, ky, kx].add(
                    jnp.einsum("szc,szo->co", sl, g[b],
                               preferred_element_type=jnp.float32)
                )
    dweight = dw.reshape(27, C, co).astype(weight.dtype)
    dbias = jnp.sum(g, axis=(0, 1, 2)).astype(weight.dtype) if has_bias else None
    return (
        dfeats, _f0(occ), _f0(in_colkey), _f0(in_chunk), dweight, dbias,
        jax.tree.map(_f0, in_tables), jax.tree.map(_f0, sites),
        jax.tree.map(_f0, out_tables),
    )


down2_conv_chunked.defvjp(_down2_fwd, _down2_bwd)


def chunked_to_dense(st: ChunkedSparseTensor, spatial_shape):
    """→ dense [B, H, W, NCH·4, C] (z padded to a chunk multiple) + occ mask."""
    D, H, W = spatial_shape
    nch = _nch(D)
    B, S, _, C = st.feats.shape
    boff = jnp.arange(B, dtype=jnp.int32)[:, None]
    span = H * W * nch
    OOB = B * (span + 1) + 7
    dest = jnp.where(
        st.valid, st.colkey * nch + st.chunk + boff * (span + 1), OOB
    ).reshape(-1)
    flat = jnp.zeros((B * (span + 1), 4 * C), st.feats.dtype)
    flat = flat.at[dest].set(
        st.feats.reshape(B * S, 4 * C), mode="drop", unique_indices=True
    )
    dense = flat.reshape(B, span + 1, 4 * C)[:, :span].reshape(
        B, H, W, nch * 4, C
    )
    oflat = jnp.zeros((B * (span + 1), 4), jnp.int8)
    oflat = oflat.at[dest].set(
        st.occ.reshape(B * S, 4).astype(jnp.int8), mode="drop",
        unique_indices=True,
    )
    occ = oflat.reshape(B, span + 1, 4)[:, :span].reshape(
        B, H, W, nch * 4
    ).astype(bool)
    return dense, occ
