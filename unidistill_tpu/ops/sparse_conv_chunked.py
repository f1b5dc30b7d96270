"""Z-chunked column-dense sparse 3D convolution — the fast LiDAR path.

Replaces the per-voxel gather-GEMM (`ops/sparse_conv.py`) for the hot s0/s2
stages of the LiDAR encoder (ref layers/blocks_3d/det3d/spconv_backbone.py:
253-343 delegates these to spconv CUDA; this layout has no reference analog —
it is a TPU design driven by measured v5e gather/scatter costs, PROFILE.md).

Design
======
A *slot* is an occupied (BEV column, z-chunk) cell, with z-chunks of CHUNK=4
consecutive z levels. Slots are sorted by (column key = y·W+x, chunk) — the
xy-major order the voxelizer emits — so a column's chunks are adjacent array
rows.

**Flat z-folded layout (round 3).** Features live as ``[B, S, 4·C]`` with
the z position folded into the channel minor (lane index = zp·C + c) and an
int32 occupancy bitmap ``occ_bits [B, S]``. The round-2 layout ``[B,S,4,C]``
violated the (8,128) bf16 tile rule everywhere: with C ∈ {5,16,32,64} every
elementwise op, gather output and window intermediate was lane-padded
4–32× — a traced eval step spent ~900 of 1104 ms in padded
fusion/copy/reshape traffic (PROFILE.md r3 trace: conv_input's case table
was bf16[4,160001,3,6,5], 25× padded). In the flat layout every hot tensor
keeps a ≥64-lane contiguous minor and z-window extraction is a lane slice.

A 3³ submanifold conv at voxel (z,y,x) needs inputs from 9 xy-neighbor
columns at z−1..z+1. Here the z dimension is in-lane: per xy offset the conv
gathers ONE *double-height halo row* per slot and the 3 z-taps become a
banded weight feeding one batched matmul on the MXU:

  * The gather table ``[S+1, 10·C]`` holds, per slot (c,s), z ∈
    [4s−1, 4s+8]: [z3 of (c,s−1) | own 4C | 4C of (c,s+1) | z0 of (c,s+2)]
    as contiguous lanes. It is built with pure array SHIFTS + lane slices —
    no scatter (measured 56 ns/row for narrow scatters vs ~2 ns/row gathers
    on v5e).
  * Neighbor resolution is a dense packed column map (int32 =
    first-slot-index ≪ NCH | chunk-bitmap) + popcount, with a 3-way
    fallback: resolve chunk s, else s−1, else s+1. The 10-z row makes every
    fallback exact. Gather count: 9·S rows/conv instead of 27·V.

Backward: custom VJPs express grad-of-gather as *reverse-offset gathers*
(the subm neighbor relation is symmetric under offset reversal; the strided
conv transposes to a parity-masked gather), never as scatter-adds.

Exactness: oracle-tested against dense convolution (values, occupancy and
both VJPs) in tests/test_sparse_conv_chunked.py; the full encoder is
cross-checked against the per-voxel implementation in
tests/test_lidar_encoder_impls.py.
"""
from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 4   # z levels per chunk
ROWZ = 10   # z positions per gather row: [4s-1 .. 4s+8]


def _nch(D: int) -> int:
    return -(-D // CHUNK)


def _f0(x):
    """float0 cotangent for an int/bool array (custom_vjp convention)."""
    return np.zeros(x.shape, jax.dtypes.float0)


class ChunkedSparseTensor(NamedTuple):
    """Batched z-chunked sparse voxel tensor with static slot capacity S."""

    feats: jnp.ndarray     # [B, S, 4·C] flat z-folded; zeros at absent z
    occ_bits: jnp.ndarray  # [B, S] int32 — bit zp set iff z site occupied
    colkey: jnp.ndarray    # [B, S] int32 y·W+x; H·W sentinel on unused slots
    chunk: jnp.ndarray     # [B, S] int32 z-chunk index; 0 on unused slots
    valid: jnp.ndarray     # [B, S] bool


class ChunkedTables(NamedTuple):
    """Per-stage neighbor tables, shared by every conv on the voxel set."""

    nbr_idx: jnp.ndarray   # [B, 9, S] int32 slot idx per xy offset; S = miss
    nbr_case: jnp.ndarray  # [B, 9, S] int32 0: row s, 1: row s-1, 2: row s+1
    colmap: jnp.ndarray    # [B·(H·W+1)] int32 (first_slot << NCH) | bits; -1
    # colmap is None when tables come from the host planner
    # (data/topology_host.py) — then DownSites.rev carries the backward
    # resolve that the device VJP would otherwise derive from colmap.


def rowgather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """[R, L] table row gather at idx [N] → [N, L], PROMISE_IN_BOUNDS.

    Every chunked-table index is in [0, R) by construction (miss = the
    all-zero row R−1); skipping the bounds clamp measured ~10% faster at
    stage shapes (experiments/mb_gather_flags.py).

    INVARIANT: host-planner topology (src0/nbr/a/b/rev tables) must be
    built at the SAME V and stage caps the model was traced with — a stale
    cached topo from different caps produces undefined reads here. Set
    UNIDISTILL_CHECK_TOPO_BOUNDS=1 to insert a debug-mode bounds assert
    (jax.debug.callback; works under jit, slow — debugging only)."""
    if os.environ.get("UNIDISTILL_CHECK_TOPO_BOUNDS"):
        def _chk(i, r=table.shape[0]):
            mx, mn = int(i.max()), int(i.min())
            assert 0 <= mn and mx < r, (
                f"topology gather index out of bounds: [{mn}, {mx}] vs "
                f"table rows {r} — stale/mismatched host topo (built at a "
                f"different V or stage cap)?"
            )
        jax.debug.callback(_chk, idx)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )
    return jax.lax.gather(
        table, idx[:, None], dn, slice_sizes=(1, table.shape[1]),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )


def zmask(occ_bits: jnp.ndarray, C: int, x: jnp.ndarray) -> jnp.ndarray:
    """Zero lanes of absent z sites: x [..., 4·C] masked by occ_bits [...].

    Computed from a lane iota so no [.., 4, C]-shaped (lane-padded) mask is
    ever materialized — fuses into the consumer."""
    zi = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1) // C
    return jnp.where(((occ_bits[..., None] >> zi) & 1) == 1, x, 0)


def occ_of_bits(occ_bits: jnp.ndarray, dt=jnp.bool_) -> jnp.ndarray:
    """occ_bits [B, S] → per-z occupancy [B, S, 4]."""
    z4 = jnp.arange(CHUNK, dtype=jnp.int32)
    o = (occ_bits[..., None] >> z4) & 1
    return o.astype(dt)


def bits_of_occ(occ: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] bool/int per-z occupancy → int32 bitmap."""
    w = (1 << jnp.arange(CHUNK, dtype=jnp.int32))
    return jnp.sum(occ.astype(jnp.int32) * w, axis=-1)


def _column_arrays(colkey, chunk, valid, hw: int):
    """Segment the sorted slot array into columns.

    Returns (col_of [B,S] (S on invalid), ckey_c [B,S] (hw sentinel),
    bits_c [B,S] chunk bitmaps, base_c [B,S] first slot idx, col_valid)."""
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
    sidx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    base_c = jnp.zeros((B * (S + 1),), jnp.int32)
    base_c = base_c.at[cdest].set(
        sidx.reshape(-1), mode="drop", unique_indices=True
    ).reshape(B, S + 1)[:, :S]
    col_valid = ckey_c < hw
    return col_of, ckey_c, bits_c, base_c, col_valid


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
    cf = flat.reshape(B, S + 1, CHUNK * C)[:, :S]
    bitsf = jnp.zeros((B * (S + 1),), jnp.int32)
    bdest = jnp.where(keep, slot + boff * (S + 1), B * (S + 1) + 7)
    bitsf = bitsf.at[bdest.reshape(-1)].add(
        jnp.where(keep, 1 << zp, 0).reshape(-1), mode="drop"
    )
    occ_bits = bitsf.reshape(B, S + 1)[:, :S]

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
    occ_bits = jnp.where(valid, occ_bits, 0)
    return ChunkedSparseTensor(cf, occ_bits, colkey, chunk, valid)


def _resolve(pack, s, nch: int, S: int):
    """Packed colmap value + target chunk s → (slot idx [S=miss], case).

    case 0: chunk s exists; 1: fall back to s−1; 2: fall back to s+1."""
    bits = pack & ((1 << nch) - 1)
    base = pack >> nch
    ok = pack >= 0

    def at(q):
        qc = jnp.clip(q, 0, nch - 1)
        hit = ok & (q >= 0) & (q < nch) & (((bits >> qc) & 1) == 1)
        idx = base + jax.lax.population_count(bits & ((1 << qc) - 1))
        return hit, idx

    h0, i0 = at(s)
    h1, i1 = at(s - 1)
    h2, i2 = at(s + 1)
    case = jnp.where(h0, 0, jnp.where(h1, 1, 2))
    idx = jnp.where(h0, i0, jnp.where(h1, i1, jnp.where(h2, i2, S)))
    return idx, case


def build_chunked_tables(
    colkey, chunk, valid, spatial_shape: Tuple[int, int, int]
) -> ChunkedTables:
    """Stage tables from the slot skeleton (features not needed)."""
    D, H, W = spatial_shape
    nch = _nch(D)
    B, S = colkey.shape
    boff = jnp.arange(B, dtype=jnp.int32)[:, None]

    col_of, ckey_c, bits_c, base_c, col_valid = _column_arrays(
        colkey, chunk, valid, H * W
    )
    packed = (base_c << nch) | bits_c
    OOB = B * (H * W + 1) + 7
    cdest = jnp.where(col_valid, ckey_c + boff * (H * W + 1), OOB).reshape(-1)
    cmap = jnp.full((B * (H * W + 1),), -1, jnp.int32)
    cmap = cmap.at[cdest].set(
        packed.reshape(-1), mode="drop", unique_indices=True
    )

    # per-column packed values for the 9 xy offsets, padded to 16 for the
    # per-slot wide-row gather
    yc, xc = ckey_c // W, ckey_c % W
    packs = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ny, nx_ = yc + dy, xc + dx
            inb = col_valid & (ny >= 0) & (ny < H) & (nx_ >= 0) & (nx_ < W)
            q = jnp.where(inb, ny * W + nx_, H * W)
            packs.append(
                cmap[(q + boff * (H * W + 1)).reshape(-1)].reshape(B, S)
            )
    packs = jnp.stack(packs, -1)
    packs = jnp.where(col_valid[..., None], packs, -1)
    packs = jnp.pad(packs, ((0, 0), (0, 0), (0, 7)), constant_values=-1)
    packs = jnp.concatenate(
        [packs, jnp.full((B, 1, 16), -1, jnp.int32)], axis=1
    )  # row S = invalid column
    packsf = packs.reshape(B * (S + 1), 16)
    spi = jnp.minimum(col_of, S) + boff * (S + 1)
    slot_packs = packsf[spi.reshape(-1)].reshape(B, S, 16)

    idxs, cases = [], []
    for o in range(9):
        idx, case = _resolve(slot_packs[..., o], chunk, nch, S)
        idxs.append(jnp.where(valid, idx, S))
        cases.append(case)
    return ChunkedTables(
        jnp.stack(idxs, axis=1), jnp.stack(cases, axis=1), cmap
    )


def _window_table(feats, occ_bits, colkey, chunk, valid, with_occ: bool, dt,
                  rowz: int = ROWZ):
    """→ [B, S+1, 10·C (+10)] double-height halo rows, built by pure shifts
    and lane slices (everything stays in the flat ≥64-lane minor layout).

    Lane block layout: [z3 of (c,s−1) : C | own 4C | 4C of (c,s+1) |
    z0 of (c,s+2) : C]; covering z = 4s−1+q, q ∈ 0..9 at lanes q·C..q·C+C.
    with_occ appends 10 occupancy lanes (values 0/1 in dt) at the tail —
    window position p's occupancy at lane 10·C+p. Row S is zero.

    rowz=13 emits triple-height rows [4s−1 .. 4s+11] (full 4C block of
    chunk s+2 instead of just its z0): the strided down conv can then
    assemble every case's 9-z window from ONE gathered row — no second
    (chunk 2t+1) gather (down-conv v2)."""
    B, S, FC = feats.shape
    C = FC // CHUNK
    src = zmask(occ_bits, C, feats.astype(dt))  # padding/absent z are zero

    def shift(x, k):
        """x [B, S, ...] shifted so out[o] = x[o+k] (zeros rolled in)."""
        pad = jnp.zeros_like(x[:, :1])
        if k == 1:
            return jnp.concatenate([x[:, 1:], pad], axis=1)
        if k == 2:
            return jnp.concatenate([x[:, 2:], pad, pad], axis=1)
        if k == -1:
            return jnp.concatenate([pad, x[:, :-1]], axis=1)
        raise ValueError(k)

    def delta_mask(k):
        ck_k = shift(colkey, k) if k > 0 else shift(colkey, -1)
        ch_k = shift(chunk, k) if k > 0 else shift(chunk, -1)
        if k > 0:
            return (ck_k == colkey) & (ch_k == chunk + k)
        return (ck_k == colkey) & (ch_k == chunk - 1)

    m_prev = delta_mask(-1)[..., None]
    m_next1 = delta_mask(1)[..., None]
    m_next2 = delta_mask(2)[..., None]
    # z0 of (c, s+2): at slot o+1 when (c,s+1) is absent, else at o+2
    m1_is_s2 = (
        (shift(colkey, 1) == colkey) & (shift(chunk, 1) == chunk + 2)
    )[..., None]

    n1 = shift(src, 1)
    n2 = shift(src, 2)
    halo_lo = jnp.where(m_prev, shift(src, -1)[:, :, 3 * C:4 * C], 0.0)
    blk_next = jnp.where(m_next1, n1, 0.0)
    if rowz == 13:
        blk_s2 = jnp.where(m1_is_s2, n1, jnp.where(m_next2, n2, 0.0))
        pieces = [halo_lo, src, blk_next, blk_s2]
    else:
        z_s2 = jnp.where(
            m1_is_s2, n1[:, :, 0:C], jnp.where(m_next2, n2[:, :, 0:C], 0.0)
        )
        pieces = [halo_lo, src, blk_next, z_s2]
    if with_occ:
        o4 = occ_of_bits(occ_bits, dt)  # [B, S, 4]
        o1 = shift(o4, 1)
        o_halo = jnp.where(m_prev, shift(o4, -1)[:, :, 3:4], 0.0)
        o_next = jnp.where(m_next1, o1, 0.0)
        o_s2 = jnp.where(
            m1_is_s2, o1[:, :, 0:1],
            jnp.where(m_next2, shift(o4, 2)[:, :, 0:1], 0.0),
        )
        pieces += [o_halo, o4, o_next, o_s2]
    rows = jnp.concatenate(pieces, axis=2)
    # No valid-mask pass: invalid slots are already all-zero lanes (occ_bits
    # is 0 there, so the zmask above zeroes them) and their colkey is the
    # H·W sentinel, so no valid slot's delta_mask ever matches an invalid
    # neighbor. Invalid ROWS may receive halo lanes from a preceding valid
    # slot, but no gather ever targets them (nbr tables index valid slots or
    # the miss row) and the center path's product is zmask'd by the caller.
    # Dropping the mask removes a full [B,S+1,10C] read+write (~0.9 ms/conv
    # at s2, experiments/mb_pieces.py window_table vs flat-minor).
    return jnp.concatenate(
        [rows, jnp.zeros((B, 1, rows.shape[2]), rows.dtype)], axis=1
    )


def _case_view(tab, B, C):
    """Window table [B, S+1, 10·C] → case-resolved 6-z views
    [B, (S+1)·3, 6·C], so one gather with index 3·row+case fetches the final
    subm window (no per-case select on gathered data). All lane slices; the
    (S+1, 3) merge leaves the minor dim untouched (free reshape).

    View j covers window z positions p ∈ 0..5 at source-lane offset
    {0, +4C, −4C}: j=0 lanes 0:6C; j=1 lanes 4C:10C; j=2 [zeros 4C,
    lanes 0:2C] (case-2 lower positions are provably empty — `_resolve`)."""
    Sp1 = tab.shape[1]
    v0 = tab[:, :, 0:6 * C]
    v1 = tab[:, :, 4 * C:10 * C]
    v2 = jnp.concatenate(
        [jnp.zeros_like(tab[:, :, 0:4 * C]), tab[:, :, 0:2 * C]], axis=2
    )
    v = jnp.stack([v0, v1, v2], axis=2)  # [B, S+1, 3, 6C]
    return v.reshape(B, Sp1 * 3, 6 * C)


def _fetch_windows(tab, tabv, mode, tables, oo, b, S, C):
    """Per-sample window fetch [8, S, 6C] under the chosen subm mode."""
    if mode == "case_view":
        i3 = (tables.nbr_idx[b][oo] * 3
              + tables.nbr_case[b][oo]).reshape(-1)
        return rowgather(tabv[b], i3).reshape(8, S, 6 * C)
    g = rowgather(tab[b], tables.nbr_idx[b][oo].reshape(-1))
    return _extract_subm_window(
        g, tables.nbr_case[b][oo].reshape(-1), C
    ).reshape(8, S, 6 * C)


def _band_weight(w3, C: int, co: int, window: int, zstride: int, dt):
    """Fold the 3 z taps into a banded [9, window·C, 4·co] weight so the
    whole z correlation is ONE batched GEMM per conv:

      W[o][(q, c), (zi, k)] = w3[q − zstride·zi, oy, ox, c, k]
                              when 0 ≤ q − zstride·zi ≤ 2, else 0

    (out z position zi reads window position q = zstride·zi + dz).
    window=6, zstride=1 for the subm conv; window=9, zstride=2 for the
    k3/s2 down conv."""
    wz = w3.reshape(3, 9, C, co)  # [dz, o, c, k] (z-major tap order)
    cols = [
        jnp.pad(wz, ((zstride * zi, window - 3 - zstride * zi),
                     (0, 0), (0, 0), (0, 0)))
        for zi in range(4)
    ]
    W = jnp.stack(cols, axis=3)  # [window, 9, C, 4, co]
    return W.transpose(1, 0, 2, 3, 4).reshape(9, window * C, 4 * co).astype(dt)


def _extract_subm_window(g, case, C):
    """Gathered flat rows [N, 10·C] + per-row case → window [N, 6·C]
    covering z = 4s−1+p, p ∈ 0..5 at lanes p·C. case0: lanes 0:6C;
    case1 (row s−1): lanes 4C:10C; case2 (row s+1): [zeros 4C, lanes 0:2C]
    (those lower z's are provably empty)."""
    w0 = g[:, 0:6 * C]
    w1 = g[:, 4 * C:10 * C]
    w2 = jnp.concatenate(
        [jnp.zeros_like(g[:, 0:4 * C]), g[:, 0:2 * C]], axis=1
    )
    c = case[:, None]
    return jnp.where(c == 0, w0, jnp.where(c == 1, w1, w2))


def _w_zyx(weight: jnp.ndarray):
    """[27, Cin, Cout] (z-major `_kernel_offsets` order) → [3z, 3y, 3x, Ci, Co]."""
    K, ci, co = weight.shape
    return weight.reshape(3, 3, 3, ci, co)


# ---------------------------------------------------------------------------
# Submanifold 3x3x3 conv
# ---------------------------------------------------------------------------


_OFFS8 = tuple(o for o in range(9) if o != 4)  # non-center xy offsets


def _subm_mode(S: int, C: int) -> str:
    """Subm window-fetch mode: how gathered rows become [·, 6C] windows.

      "select"    — gather full 10C rows from the window table, 3-way
                    post-gather case select (`_extract_subm_window`).
      "case_view" — select-free: gather 6C rows from the case-INTERLEAVED
                    3-view table (`_case_view`, idx = 3·row+case). Wins
                    only while the table stays under the ~80 MB locality
                    cliff (measured r3: 2× win at 75.5 MB, 2× loss at
                    92 MB — interleaving dilutes per-offset locality).

    A third "banded" mode (case-CONCATENATED table, idx = case·(S+1)+row,
    built to keep the dominant case-0 stream monotone) was A/B'd on the
    chip at realistic planner tables in r5 and LOST 1.9-2.4× at s2/s3/down
    (only ~3% better at s0, within noise) — crossing bands on the 4-6%
    non-case-0 rows breaks the prefetch stream harder than interleaving
    does; table in PROFILE.md r5, experiment mb_subm_banded.py. Deleted.

    UNIDISTILL_SUBM_MODE forces a mode (tests/perf experiments only — the
    auto rule below is the measured production policy)."""
    import os

    env = os.environ.get("UNIDISTILL_SUBM_MODE", "auto")
    if env in ("select", "case_view"):
        return env
    # r3-measured rule: case-view under the ~80 MB cliff, select above.
    return "case_view" if (S + 1) * 18 * C * 2 < 78 * 2**20 else "select"


def _subm_impl(feats, occ_bits, colkey, chunk, valid, weight, bias,
               tables: ChunkedTables, dtype_str, reverse: bool = False):
    """feats [B,S,4·Cin] flat → occ-masked [B,S,4·Cout] flat.

    Flat formulation: per sample ONE [8·S] row gather from the [S+1, 10C]
    window table, one lane-slice case select, one batched
    [8, S, 6C] × [8, 6C, 4co] GEMM. Measured v5e facts that shape it
    (experiments/mb_table_cliff.py, PROFILE.md):

      * row gathers run at ~3.8 ns/idx from tables ≤ ~75 MB and ~12.4 ns/idx
        above ~110 MB — so the window table is gathered PER SAMPLE rather
        than batch-globally;
      * index count is the wall, so the center offset never gathers
        (identity rows) and the whole z correlation folds into the weight
        (`_band_weight`);
      * minor dims stay ≥ 4·C contiguous lanes — no [.., 4, C] or
        [.., 10, C] intermediates (the (8,128) bf16 tile pads those 4-32×,
        which cost ~900 ms/step in the round-2 layout).

    reverse=True runs the offset-reversed conv (used by the VJP): xy offsets
    flip via o ↔ 8−o through the same tables, z taps via dz ↔ 2−dz."""
    B, S, FC = feats.shape
    C = FC // CHUNK
    co = weight.shape[-1]
    dt = jnp.dtype(dtype_str)
    w3 = _w_zyx(weight).astype(dt)
    if reverse:
        w3 = w3[::-1]  # z-tap flip; with the banded weight this reads
        # win[q]·w[2−(q−zi)] — exactly the reversed conv
    tab = _window_table(feats, occ_bits, colkey, chunk, valid, False, dt)
    W6 = _band_weight(w3, C, co, 6, 1, dt)        # [9, 6C, 4co]

    offs = np.asarray(_OFFS8)
    oo = (8 - offs) if reverse else offs          # gather-side offsets
    mode = _subm_mode(S, C)
    tabv = _case_view(tab, B, C) if mode == "case_view" else None
    accs = []
    for b in range(B):
        win = _fetch_windows(tab, tabv, mode, tables, oo, b, S, C)
        accs.append(jnp.einsum("osw,owk->osk", win, W6[offs],
                               preferred_element_type=dt).sum(0))
    acc = jnp.stack(accs).reshape(B, S, 4 * co)

    # center offset: own table lanes 0:6C, case 0 by construction — no gather
    gc = tab[:, :S, 0:6 * C].reshape(B * S, 6 * C)
    acc = acc + jnp.einsum("bw,wk->bk", gc, W6[4],
                           preferred_element_type=dt).reshape(B, S, 4 * co)
    if bias is not None:
        acc = acc + jnp.tile(bias.astype(dt), CHUNK)
    return zmask(occ_bits, co, acc)


@partial(jax.custom_vjp, nondiff_argnums=(8,))
def subm_conv_chunked(feats, occ_bits, colkey, chunk, valid, weight, bias,
                      tables, dtype_str: str):
    """Submanifold 3³ conv in the flat chunked layout (spconv.SubMConv3d
    semantics: outputs on the same active set; absent neighbors read 0)."""
    return _subm_impl(feats, occ_bits, colkey, chunk, valid, weight, bias,
                      tables, dtype_str)


def _subm_fwd(feats, occ_bits, colkey, chunk, valid, weight, bias, tables,
              dtype_str):
    out = _subm_impl(feats, occ_bits, colkey, chunk, valid, weight, bias,
                     tables, dtype_str)
    return out, (feats, occ_bits, colkey, chunk, valid, weight,
                 bias is not None, tables)


def _subm_bwd(dtype_str, res, g):
    # The backward computes in the FORWARD dtype (bf16 in production, f32 in
    # the oracle tests) with f32 GEMM accumulation.
    #
    # ONE window pass serves both cotangents (r4 — the old backward built a
    # second window table over `feats` and regathered 8·S rows just for
    # dweight; that pass was ~1/3 of the encoder backward, PROFILE.md):
    #   d feats: offset-reversed conv of g with W^T —
    #     out[v] = Σ_k W[k] f[v + k − 1]  ⇒  df[u] = Σ_k W[k]^T g[u − k + 1]
    #   d weight from the SAME reverse-gathered g windows: with
    #     gwin[8−o](u)[p] = g at z = 4·ch(u) − 1 + p (the case mechanism
    #     z-aligns the window to u), re-indexing dW[o] = Σ_s win_x[o,s] ⊗ g[s]
    #     by u = n_o(s) gives
    #       dw[dz, o][c, k] = Σ_u Σ_q' x_own[u][q', c] · gwin[8−o](u)[q'−dz+2, k]
    #     — only u's OWN 4-z rows of x appear, so no x-side table or gather.
    feats, occ_bits, colkey, chunk, valid, weight, has_bias, tables = res
    B, S, FC = feats.shape
    C = FC // CHUNK
    co = weight.shape[-1]
    dt = jnp.dtype(dtype_str)
    g = zmask(occ_bits, co, g).astype(dt)
    x_flat = zmask(occ_bits, C, feats.astype(dt))  # [B, S, 4C]

    wT = jnp.swapaxes(_w_zyx(weight), 3, 4).reshape(27, co, C)
    w3r = _w_zyx(wT.astype(dt))[::-1]  # z-tap flip (reverse conv)
    W6r = _band_weight(w3r, co, C, 6, 1, dt)      # [9, 6co, 4C]

    tab_g = _window_table(g, occ_bits, colkey, chunk, valid, False, dt)
    offs = np.asarray(_OFFS8)
    oo = 8 - offs                                  # gather-side offsets
    mode = _subm_mode(S, co)
    tabv = _case_view(tab_g, B, co) if mode == "case_view" else None
    daccs = []
    dW8n = jnp.zeros((8, 4 * C, 6 * co), jnp.float32)
    for b in range(B):
        win = _fetch_windows(tab_g, tabv, mode, tables, oo, b, S, co)
        daccs.append(jnp.einsum("osw,owk->osk", win, W6r[offs],
                                preferred_element_type=dt).sum(0))
        dW8n = dW8n + jnp.einsum("sw,osk->owk", x_flat[b], win,
                                 preferred_element_type=jnp.float32)
    dacc = jnp.stack(daccs).reshape(B, S, 4 * C)
    gc = tab_g[:, :S, 0:6 * co].reshape(B * S, 6 * co)
    dacc = dacc + jnp.einsum("bw,wk->bk", gc, W6r[4],
                             preferred_element_type=dt).reshape(B, S, 4 * C)
    dfeats = zmask(occ_bits, C, dacc).astype(feats.dtype)

    dWcn = jnp.einsum("bw,bk->wk", x_flat.reshape(B * S, 4 * C), gc,
                      preferred_element_type=jnp.float32)  # [4C, 6co]
    dW9n = jnp.zeros((9, 4 * C, 6 * co), jnp.float32)
    dW9n = dW9n.at[offs].set(dW8n).at[4].set(dWcn)
    dW9n = dW9n.reshape(9, 4, C, 6, co)
    dw = jnp.stack([
        sum(dW9n[:, q, :, q - dz + 2, :] for q in range(4))
        for dz in range(3)
    ])  # [3, 9, C, co] z-major
    dweight = dw.reshape(27, C, co).astype(weight.dtype)
    dbias = (jnp.sum(g.astype(jnp.float32), axis=(0, 1))
             .reshape(CHUNK, co).sum(0).astype(weight.dtype)
             if has_bias else None)
    return (dfeats, _f0(occ_bits), _f0(colkey), _f0(chunk), _f0(valid),
            dweight, dbias, jax.tree.map(_f0, tables))


subm_conv_chunked.defvjp(_subm_fwd, _subm_bwd)


# ---------------------------------------------------------------------------
# Strided downsample conv (k=3, s=2, p=1 in all dims — the encoder's down2)
# ---------------------------------------------------------------------------


class DownSites(NamedTuple):
    """Output slot skeleton + gather tables of a k3/s2/p1 sparse conv."""

    colkey: jnp.ndarray  # [B, S2] int32 out column key; H2·W2 sentinel
    chunk: jnp.ndarray   # [B, S2] int32 out chunk
    valid: jnp.ndarray   # [B, S2] bool
    nbr_a: jnp.ndarray   # [B, 9, S2] IN slot idx covering chunk 2s (3-way)
    case_a: jnp.ndarray  # [B, 9, S2] case of nbr_a
    nbr_b: jnp.ndarray   # [B, 9, S2] IN slot idx at chunk 2s+1 (exact only)
    # host-planner only: [B, 9, S_in] packed out_row·4+case backward resolve
    # (replaces the VJP's colmap lookups); None on the device-built path
    rev: jnp.ndarray = None


def tables_from_host(nbr_pack: jnp.ndarray) -> ChunkedTables:
    """[B, 9, S] packed idx·4+case (data/topology_host.py) → ChunkedTables."""
    return ChunkedTables(nbr_pack >> 2, nbr_pack & 3, None)


def sites_from_host(ck, ch, a_pack, b_idx, rev, out_hw: int) -> DownSites:
    return DownSites(ck, ch, ck < out_hw, a_pack >> 2, a_pack & 3, b_idx, rev)


def chunked_from_host(
    voxel_feats: jnp.ndarray,  # [B, V, C]
    src0: jnp.ndarray,         # [B, S, 4] int32 voxel index; V = empty site
    ck: jnp.ndarray,           # [B, S] int32
    ch: jnp.ndarray,           # [B, S] int32
    hw: int,
) -> ChunkedSparseTensor:
    """Chunked tensor from the host planner's slot map: one row-gather per
    slot-z site + one fold to the flat layout, instead of the device-side
    scatter build (which cost ~28 ms/step at s0 scale)."""
    B, V, C = voxel_feats.shape
    S = src0.shape[1]
    vf = jnp.concatenate(
        [voxel_feats, jnp.zeros((B, 1, C), voxel_feats.dtype)], axis=1
    ).reshape(B * (V + 1), C)
    gi = (src0.reshape(B, -1)
          + (jnp.arange(B, dtype=jnp.int32) * (V + 1))[:, None])
    feats = rowgather(vf, gi.reshape(-1)).reshape(B, S, CHUNK * C)
    valid = ck < hw
    occ_bits = jnp.where(valid, bits_of_occ(src0 < V), 0)
    return ChunkedSparseTensor(feats, occ_bits, ck, ch, valid)


def _resolve_exact(pack, s, nch: int, S: int):
    """Packed colmap value + chunk s → slot idx, no fallback (S = miss)."""
    bits = pack & ((1 << nch) - 1)
    base = pack >> nch
    sc = jnp.clip(s, 0, nch - 1)
    hit = (pack >= 0) & (s >= 0) & (s < nch) & (((bits >> sc) & 1) == 1)
    idx = base + jax.lax.population_count(bits & ((1 << sc) - 1))
    return jnp.where(hit, idx, S)


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
    per-site occupancy is computed by the conv itself (all-zero slots are
    harmless and masked)."""
    D, H, W = spatial_shape
    D2, H2, W2 = out_spatial_shape
    nch_in, nch_out = _nch(D), _nch(D2)
    B, S = colkey.shape
    S2 = out_slot_cap
    # int32 bit-packing limits (fail loudly instead of silently corrupting
    # gather tables on exotic grids): out chunk index uses 3 bits below
    # ((ocol_key << 3) | cc) and packed_cb shifts the column key by nch_out
    assert nch_out <= 8, f"out depth {D2} needs chunk index > 3 bits"
    assert (H2 * W2 + 1) << max(nch_out, 3) < 2**31, (H2, W2, nch_out)
    boff = jnp.arange(B, dtype=jnp.int32)[:, None]

    _, ckey_c, bits_c, _, col_valid = _column_arrays(colkey, chunk, valid,
                                                     H * W)

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

    # per-sample sort (each sample contributes exactly 4S candidates, so
    # per-sample rows are static bands — no banding keys needed), then a
    # segmented-OR scan and a rank-sort compaction. No scatters / segment
    # reduces anywhere: the previous per-bit segment_max formulation cost
    # ~157 ms/step at nuScenes scale (PROFILE.md).
    sk, sbits = jax.lax.sort((ck4, cb4), dimension=1, num_keys=1)
    prev = jnp.concatenate([jnp.full((B, 1), -1, sk.dtype), sk[:, :-1]], 1)
    is_new = sk != prev
    cvalid = sk < SENT

    def comb(a, b):
        fa, va = a
        fb, vb = b
        return fb | fa, jnp.where(fb, vb, va | vb)

    _, orbits = jax.lax.associative_scan(
        comb, (is_new, sbits), axis=1
    )
    nxt = jnp.concatenate([sk[:, 1:], jnp.full((B, 1), -1, sk.dtype)], 1)
    run_end = (sk != nxt) & cvalid
    rank = jnp.cumsum((is_new & cvalid).astype(jnp.int32), axis=1) - 1
    BIG = jnp.int32(2 ** 30)
    sortkey = jnp.where(run_end & (rank < S2), rank, BIG)
    # pack (colkey, bits) into one int32: colkey < H2·W2 ≤ 2^20 for the
    # nuScenes grids, bits < 2^nch_out
    packed_cb = (sk << nch_out) | orbits
    rk, pk = jax.lax.sort((sortkey, packed_cb), dimension=1, num_keys=1)
    got = rk[:, :S2] < BIG
    ocol_key = jnp.where(got, pk[:, :S2] >> nch_out, SENT)
    ocol_bits = jnp.where(got, pk[:, :S2] & ((1 << nch_out) - 1), 0)
    ocol_valid = ocol_key < SENT

    # expand columns to slots — again by rank-sort, not scatter
    nsl = jax.lax.population_count(ocol_bits)
    base = jnp.cumsum(nsl, axis=1) - nsl
    exp_keys, exp_vals = [], []
    for cc in range(nch_out):
        has = ocol_valid & (((ocol_bits >> cc) & 1) == 1)
        rank_cc = base + jax.lax.population_count(ocol_bits & ((1 << cc) - 1))
        exp_keys.append(jnp.where(has & (rank_cc < S2), rank_cc, BIG))
        exp_vals.append((ocol_key << 3) | cc)
    ek = jnp.concatenate(exp_keys, axis=1)
    evv = jnp.concatenate(exp_vals, axis=1)
    rk2, pk2 = jax.lax.sort((ek, evv), dimension=1, num_keys=1)
    got2 = rk2[:, :S2] < BIG
    out_colkey = jnp.where(got2, pk2[:, :S2] >> 3, SENT)
    out_chunk = jnp.where(got2, pk2[:, :S2] & 7, 0)
    out_valid = got2

    # per-out-slot gather tables into the INPUT slot space
    yo, xo = out_colkey // W2, out_colkey % W2
    nbr_a, case_a, nbr_b = [], [], []
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
            ia, ca = _resolve(pack, 2 * out_chunk, nch_in, S)
            nbr_a.append(ia)
            case_a.append(ca)
            nbr_b.append(_resolve_exact(pack, 2 * out_chunk + 1, nch_in, S))
    return DownSites(
        out_colkey, out_chunk, out_valid,
        jnp.stack(nbr_a, axis=1), jnp.stack(case_a, axis=1),
        jnp.stack(nbr_b, axis=1),
    )


def _down2_window_b(tab, sites, b, C, with_occ: bool):
    """One sample's case-assembled down-conv windows, all flat lane slices.

    tab: [S+1, 10·C (+10)] sample window table; returns
    (w9 [9, S2, 9·C], o9 [9, S2, 9] or None) for window positions p ∈ 0..8
    (input z = 8s−1+p). Row A (3-way resolve at chunk 2s) and row B (exact
    chunk 2s+1): case0: A[p]; case1: A[p+4] for p≤5, B[p−4] for p≥6;
    case2: A[p−4] for p≥4 (lower positions provably empty)."""
    S2 = sites.colkey.shape[1]
    A = rowgather(tab, sites.nbr_a[b].reshape(-1))  # [9·S2, 10C(+10)]
    Br = rowgather(tab, sites.nbr_b[b].reshape(-1))
    ca = sites.case_a[b].reshape(-1)[:, None]

    def assemble(off, width_unit):
        u = width_unit
        w0 = A[:, off:off + 9 * u]
        w1 = jnp.concatenate(
            [A[:, off + 4 * u:off + 10 * u], Br[:, off + 2 * u:off + 5 * u]],
            axis=1,
        )
        w2 = jnp.concatenate(
            [jnp.zeros_like(A[:, off:off + 4 * u]),
             A[:, off:off + 5 * u]], axis=1,
        )
        return jnp.where(ca == 0, w0, jnp.where(ca == 1, w1, w2))

    w9 = assemble(0, C).reshape(9, S2, 9 * C)
    o9 = assemble(10 * C, 1).reshape(9, S2, 9) if with_occ else None
    return w9, o9


def _down2_impl(feats, occ_bits, colkey, chunk, valid, weight, bias, sites,
                d_out: int, dtype_str):
    """→ (out [B,S2,4·Cout] flat, occ_bits_out [B,S2])."""
    B, S, FC = feats.shape
    C = FC // CHUNK
    S2 = sites.colkey.shape[1]
    co = weight.shape[-1]
    dt = jnp.dtype(dtype_str)
    tab = _window_table(feats, occ_bits, colkey, chunk, valid, True, dt)
    W9 = _band_weight(_w_zyx(weight).astype(dt), C, co, 9, 2, dt)
    accs, oms = [], []
    for b in range(B):
        w9, o9 = _down2_window_b(tab[b], sites, b, C, True)
        accs.append(jnp.einsum("osw,owk->osk", w9, W9,
                               preferred_element_type=dt).sum(0))
        oms.append(o9.max(0))  # [S2, 9]
    acc = jnp.stack(accs)        # [B, S2, 4co]
    om = jnp.stack(oms)          # [B, S2, 9]
    # out-site occupancy: any occupied input at window p ∈ {2zi, 2zi+1, 2zi+2}
    oacc = jnp.stack(
        [om[:, :, 2 * zi:2 * zi + 3].max(2) for zi in range(CHUNK)], -1
    )
    occ_out = (oacc > 0.5) & sites.valid[..., None]
    # clip chunk-padding sites past the true out depth: for EVEN input
    # depth an input voxel at z = D-1 falls in the receptive field of
    # out z = D2 (outside the grid) — spconv never activates it
    zsite = CHUNK * sites.chunk[..., None] + jnp.arange(CHUNK, dtype=jnp.int32)
    occ_out = occ_out & (zsite < d_out)
    occ_bits_out = bits_of_occ(occ_out)
    if bias is not None:
        acc = acc + jnp.tile(bias.astype(dt), CHUNK)
    return zmask(occ_bits_out, co, acc), occ_bits_out


@partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def down2_conv_chunked(
    feats, occ_bits, colkey, chunk, valid, weight, bias, sites, out_tables,
    spatial_shape, out_spatial_shape, dtype_str: str,
):
    """Strided k3/s2/p1 sparse conv (spconv.SparseConv3d semantics: an out
    site is active iff ≥1 input site lies in its receptive field).

    out_tables: the OUT stage's ChunkedTables (built from the DownSites
    skeleton; also reused by the following subm convs) — the VJP gathers
    from the output-grad window table through its colmap."""
    out, occ_bits_out = _down2_impl(feats, occ_bits, colkey, chunk, valid,
                                    weight, bias, sites,
                                    out_spatial_shape[0], dtype_str)
    return out, occ_bits_out


def _down2_fwd(feats, occ_bits, colkey, chunk, valid, weight, bias, sites,
               out_tables, spatial_shape, out_spatial_shape, dtype_str):
    out, occ_bits_out = _down2_impl(feats, occ_bits, colkey, chunk, valid,
                                    weight, bias, sites,
                                    out_spatial_shape[0], dtype_str)
    return (out, occ_bits_out), (
        feats, occ_bits, colkey, chunk, valid, weight, bias is not None,
        sites, out_tables, occ_bits_out,
    )


def _down2_bwd(spatial_shape, out_spatial_shape, dtype_str, res, gs):
    """Transpose of the strided conv as a reverse parity-masked gather.

    Input voxel (y, x, z) feeds out voxel (yo, xo, zo) via tap (ky, kx, kz)
    iff y = 2yo−1+ky (etc.) — per tap, yo = (y+1−ky)/2 exists only when the
    parity matches. For input chunk s, the needed out z range [2s, 2s+2]
    always fits ONE out window row (3-way resolved at out chunk s//2), at a
    static position offset selected by the parity of s. The per-row window
    position is folded as a predicated sum over the 10 static lane slices
    (flat layout; no take_along_axis over a padded [., 10, co] view)."""
    (feats, occ_bits, colkey, chunk, valid, weight, has_bias, sites,
     out_tables, occ_bits_out) = res
    g, _g_occ = gs
    D, H, W = spatial_shape
    D2, H2, W2 = out_spatial_shape
    nch_out = _nch(D2)
    B, S, FC = feats.shape
    C = FC // CHUNK
    S2 = sites.colkey.shape[1]
    co = weight.shape[-1]
    dt = jnp.dtype(dtype_str)
    g = zmask(occ_bits_out, co, g).astype(dt)
    w = _w_zyx(weight).astype(dt)

    gtab = _window_table(g, occ_bits_out, sites.colkey, sites.chunk,
                         sites.valid, False, dt)

    yc, xc = colkey // W, colkey % W  # per input slot
    spar = chunk % 2
    t = chunk // 2
    # valid (zi, kz) pairs: kz ≡ zi+1 (mod 2); u = (zi+1−kz)//2 ∈ 0..2
    zk = [(zi, kz) for zi in range(4) for kz in range(3)
          if (zi + 1 - kz) % 2 == 0]

    gtabf = gtab.reshape(B * (S2 + 1), ROWZ * co)
    boff2 = (jnp.arange(B, dtype=jnp.int32) * (S2 + 1))[:, None]
    dcols = [jnp.zeros((B * S, C), jnp.float32) for _ in range(CHUNK)]
    wT = jnp.swapaxes(w, 3, 4)  # [kz, ky, kx, co, C]
    # dW from the SAME reverse windows (r4, see _down2_v2_bwd): vals[u]
    # holds g at the out-z feeding this input slot, so no forward-window
    # regather is needed for the weight gradient.
    x_flat = zmask(occ_bits, C, feats.astype(dt)).reshape(B * S, CHUNK * C)
    dWM = jnp.zeros((9, CHUNK * C, 3 * co), jnp.float32)
    for o in range(9):
        ky, kx = o // 3, o % 3
        if sites.rev is not None:
            # host-planned backward resolve (topology_host.py)
            rv = sites.rev[:, o]
            row, case = rv >> 2, rv & 3
        else:
            ny, nx_ = yc + 1 - ky, xc + 1 - kx
            ok = (
                (ny % 2 == 0) & (nx_ % 2 == 0)
                & (ny >= 0) & (ny < 2 * H2)
                & (nx_ >= 0) & (nx_ < 2 * W2)
                & valid
            )
            q = jnp.where(ok, (ny // 2) * W2 + (nx_ // 2), H2 * W2)
            bo = (jnp.arange(B, dtype=jnp.int32) * (H2 * W2 + 1))[:, None]
            pack = out_tables.colmap[(q + bo).reshape(-1)].reshape(B, S)
            row, case = _resolve(pack, t, nch_out, S2)
        gr = rowgather(gtabf, (row + boff2).reshape(-1))  # [B·S, 10·co]
        # window base: q0(u) = u + 1 (s even) | u + 3 (s odd), then
        # case1: +4, case2: −4; out-of-range / missed rows read zero
        dq = jnp.where(case == 0, 0, jnp.where(case == 1, 4, -4))
        base_q = (1 + 2 * spar + dq).reshape(-1)
        row_ok = (row < S2).reshape(-1)
        # predicated lane-slice sum per u (the select covers qq ∉ [0,9] → 0)
        vals = {}
        for u in sorted({(zi + 1 - kz) // 2 for zi, kz in zk}):
            qq = base_q + u
            acc_u = jnp.zeros((B * S, co), dt)
            for q_ in range(ROWZ):
                m = ((qq == q_) & row_ok)[:, None]
                acc_u = acc_u + jnp.where(
                    m, gr[:, q_ * co:(q_ + 1) * co], 0.0
                )
            vals[u] = acc_u
        for zi, kz in zk:
            u = (zi + 1 - kz) // 2
            dcols[zi] = dcols[zi] + jnp.einsum(
                "bo,oc->bc", vals[u], wT[kz, ky, kx],
                preferred_element_type=jnp.float32,
            )
        win3 = jnp.concatenate([vals[0], vals[1], vals[2]], axis=1)
        dWM = dWM.at[o].add(jnp.einsum(
            "nw,nk->wk", x_flat, win3.astype(dt),
            preferred_element_type=jnp.float32,
        ))
    df = jnp.concatenate(dcols, axis=1).reshape(B, S, CHUNK * C)
    dfeats = zmask(occ_bits, C, df).astype(feats.dtype)

    dWM = dWM.reshape(9, CHUNK, C, 3, co)
    dw = jnp.stack([
        sum(dWM[:, zi, :, (zi + 1 - kz) // 2, :] for zi, kz_ in zk
            if kz_ == kz)
        for kz in range(3)
    ])  # [3, 9, C, co] z-major
    dweight = dw.reshape(27, C, co).astype(weight.dtype)
    dbias = (jnp.sum(g.astype(jnp.float32), axis=(0, 1))
             .reshape(CHUNK, co).sum(0).astype(weight.dtype)
             if has_bias else None)
    return (dfeats, _f0(occ_bits), _f0(colkey), _f0(chunk), _f0(valid),
            dweight, dbias, jax.tree.map(_f0, sites),
            jax.tree.map(_f0, out_tables))


down2_conv_chunked.defvjp(_down2_fwd, _down2_bwd)


# ---------------------------------------------------------------------------
# Down conv v2 — host-topology path: 13-z rows, A-only gather, planner occ
# ---------------------------------------------------------------------------


def _extract_down_window(g, case, C):
    """Gathered 13-z rows [N, 13·C] + per-row case → 9-z down windows
    [N, 9·C] (window position p reads input z = 8t−1+p for out chunk t).

    case0 (row = chunk 2t): lanes 0:9C; case1 (row 2t−1): lanes 4C:13C;
    case2 (row 2t+1): [zeros 4C | lanes 0:5C] (positions 0..3 cover chunks
    2t−1/2t which are absent under case2 — provably zero)."""
    w0 = g[:, 0:9 * C]
    w1 = g[:, 4 * C:13 * C]
    w2 = jnp.concatenate(
        [jnp.zeros_like(g[:, 0:4 * C]), g[:, 0:5 * C]], axis=1
    )
    c = case[:, None]
    return jnp.where(c == 0, w0, jnp.where(c == 1, w1, w2))


def _down2_v2_windows(tab13_b, sites, b, C):
    # A case-banded 13-z variant of this gather (band per case, one 9C
    # gather, no select) was A/B'd on-chip at realistic planner tables and
    # lost 2.1-2.4× (down2 70 vs 30 ms, down3 46 vs 22 — PROFILE.md r5,
    # experiments/mb_subm_banded.py); the select path below is the winner.
    S2 = sites.colkey.shape[1]
    g = rowgather(tab13_b, sites.nbr_a[b].reshape(-1))
    return _extract_down_window(
        g, sites.case_a[b].reshape(-1), C
    ).reshape(9, S2, 9 * C)


def _down2_v2_impl(feats, occ_bits, colkey, chunk, valid, weight, bias,
                   sites, occ_bits_out, dtype_str):
    B, S, FC = feats.shape
    C = FC // CHUNK
    co = weight.shape[-1]
    dt = jnp.dtype(dtype_str)
    tab = _window_table(feats, occ_bits, colkey, chunk, valid, False, dt,
                        rowz=13)
    W9 = _band_weight(_w_zyx(weight).astype(dt), C, co, 9, 2, dt)
    accs = [
        jnp.einsum("osw,owk->osk",
                   _down2_v2_windows(tab[b], sites, b, C),
                   W9, preferred_element_type=dt).sum(0)
        for b in range(B)
    ]
    acc = jnp.stack(accs)
    if bias is not None:
        acc = acc + jnp.tile(bias.astype(dt), CHUNK)
    return zmask(occ_bits_out, co, acc)


@partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def down2_conv_v2(
    feats, occ_bits, colkey, chunk, valid, weight, bias, sites,
    occ_bits_out, spatial_shape, out_spatial_shape, dtype_str: str,
):
    """Strided k3/s2/p1 sparse conv, host-topology fast path.

    Differences vs `down2_conv_chunked`: (1) the window table holds 13-z
    rows so every case's 9-z window is assembled from the single 3-way-
    resolved A row — the chunk-2t+1 B gather (half the down conv's gather
    rows) disappears; (2) out-site occupancy comes precomputed from the
    host planner (`topo['occ2'/'occ3']`, data/topology_host.py) instead of
    the in-conv occupancy-lane assembly whose [9·S2, 9] intermediates were
    lane-padded 14× (r3 trace). Requires `sites.rev` (host planner);
    math-equivalence vs `down2_conv_chunked` is oracle-tested."""
    assert sites.rev is not None, "down2_conv_v2 needs host-planned topology"
    return _down2_v2_impl(feats, occ_bits, colkey, chunk, valid, weight,
                          bias, sites, occ_bits_out, dtype_str)


def _down2_v2_fwd(feats, occ_bits, colkey, chunk, valid, weight, bias, sites,
                  occ_bits_out, spatial_shape, out_spatial_shape, dtype_str):
    out = _down2_v2_impl(feats, occ_bits, colkey, chunk, valid, weight, bias,
                         sites, occ_bits_out, dtype_str)
    return out, (feats, occ_bits, colkey, chunk, valid, weight,
                 bias is not None, sites, occ_bits_out)


def _down2_v2_bwd(spatial_shape, out_spatial_shape, dtype_str, res, g):
    """Identical transpose to `_down2_bwd` (reverse parity-masked gather via
    the host `sites.rev` resolve). dW comes from the SAME reverse-gathered
    `win3` windows (r4): win3[u][u_idx] already holds g at the out-z feeding
    input slot u's column, so dW[kz, o] = Σ_u x_own[u][q'] ⊗ win3[u][u_idx]
    over the parity-valid (q', kz, u_idx = (q'+1−kz)/2) pairs — the former
    13-z forward-window table + its 9·S2 regather disappear."""
    (feats, occ_bits, colkey, chunk, valid, weight, has_bias, sites,
     occ_bits_out) = res
    D2, H2, W2 = out_spatial_shape
    B, S, FC = feats.shape
    C = FC // CHUNK
    S2 = sites.colkey.shape[1]
    co = weight.shape[-1]
    dt = jnp.dtype(dtype_str)
    g = zmask(occ_bits_out, co, g).astype(dt)
    w = _w_zyx(weight).astype(dt)

    gtab = _window_table(g, occ_bits_out, sites.colkey, sites.chunk,
                         sites.valid, False, dt)
    spar = chunk % 2
    zk = [(zi, kz) for zi in range(4) for kz in range(3)
          if (zi + 1 - kz) % 2 == 0]
    gtabf = gtab.reshape(B * (S2 + 1), ROWZ * co)
    boff2 = (jnp.arange(B, dtype=jnp.int32) * (S2 + 1))[:, None]
    N = B * S
    wT = jnp.swapaxes(w, 3, 4)  # [kz, ky, kx, co, C]
    x_flat = zmask(occ_bits, C, feats.astype(dt)).reshape(N, CHUNK * C)
    dall = jnp.zeros((N, CHUNK * C), jnp.float32)
    dWM = jnp.zeros((9, CHUNK * C, 3 * co), jnp.float32)
    for o in range(9):
        ky, kx = o // 3, o % 3
        rv = sites.rev[:, o]
        row, case = rv >> 2, rv & 3
        dq = jnp.where(case == 0, 0, jnp.where(case == 1, 4, -4))
        gr = rowgather(gtabf, (row + boff2).reshape(-1))  # [B·S, 10·co]
        # per-row window base q ∈ {−3,−1,1,3,5,7}: with a 3co zero
        # prefix every (spar, case) 3-position window is one of SIX
        # static 3co lane slices — a 6-way select replaces the former
        # 10-position predicated accumulation (≤30 co passes/offset → 6)
        base_q = (1 + 2 * spar + dq).reshape(-1)
        row_ok = (row < S2).reshape(-1)
        grp = jnp.concatenate([jnp.zeros((N, 3 * co), dt), gr], axis=1)
        sel = base_q + 3  # slice start /co ∈ {0, 2, 4, 6, 8, 10}
        win3 = jnp.zeros((N, 3 * co), dt)
        for j in (0, 2, 4, 6, 8, 10):
            m = ((sel == j) & row_ok)[:, None]
            win3 = jnp.where(m, grp[:, j * co:(j + 3) * co], win3)
        # fold (u, zi, kz) into one [3co, 4C] weight: lane u·co+j maps to
        # out lane zi·C+c via wT[kz(u,zi)] where kz = zi+1−2u
        Wc = jnp.zeros((3, co, CHUNK, C), dt)
        for zi, kz in zk:
            u = (zi + 1 - kz) // 2
            Wc = Wc.at[u, :, zi, :].set(wT[kz, ky, kx])
        dall = dall + jnp.einsum(
            "nw,wc->nc", win3, Wc.reshape(3 * co, CHUNK * C),
            preferred_element_type=jnp.float32,
        )
        dWM = dWM.at[o].add(jnp.einsum(
            "nw,nk->wk", x_flat, win3,
            preferred_element_type=jnp.float32,
        ))
    df = dall.reshape(B, S, CHUNK * C)
    dfeats = zmask(occ_bits, C, df).astype(feats.dtype)

    dWM = dWM.reshape(9, CHUNK, C, 3, co)
    dw = jnp.stack([
        sum(dWM[:, zi, :, (zi + 1 - kz) // 2, :] for zi, kz_ in zk
            if kz_ == kz)
        for kz in range(3)
    ])  # [3, 9, C, co] z-major
    dweight = dw.reshape(27, C, co).astype(weight.dtype)
    dbias = (jnp.sum(g.astype(jnp.float32), axis=(0, 1))
             .reshape(CHUNK, co).sum(0).astype(weight.dtype)
             if has_bias else None)
    return (dfeats, _f0(occ_bits), _f0(colkey), _f0(chunk), _f0(valid),
            dweight, dbias, jax.tree.map(_f0, sites), _f0(occ_bits_out))


down2_conv_v2.defvjp(_down2_v2_fwd, _down2_v2_bwd)


def chunked_to_dense(st: ChunkedSparseTensor, spatial_shape):
    """→ dense chunk-FOLDED [B, H, W, NCH, 4·C] + z-outer occupancy
    [B, NCH·4, H, W] bool.

    The 4·C channel fold (z-position-major, channel = zp·C + c) keeps the
    minor dim ≥128 for C=32 (the flat slot layout already stores features
    this way — the scatter rows copy straight through). Occupancy is
    scattered as one int8 bitmap per slot and unpacked on the (cheap,
    well-laid-out) dense side."""
    D, H, W = spatial_shape
    nch = _nch(D)
    B, S, FC = st.feats.shape
    boff = jnp.arange(B, dtype=jnp.int32)[:, None]
    span = H * W * nch
    OOB = B * span + 7  # fully out of bounds — no in-band dump row, so the
    # reshape back to [B, ...] is layout-free (a dump row would force a
    # 3 GB slice copy at the s2 shape)
    dest = jnp.where(
        st.valid, st.colkey * nch + st.chunk + boff * span, OOB
    ).reshape(-1)
    flat = jnp.zeros((B * span, FC), st.feats.dtype)
    flat = flat.at[dest].set(
        st.feats.reshape(B * S, FC), mode="drop", unique_indices=True
    )
    dense = flat.reshape(B, H, W, nch, FC)
    oflat = jnp.zeros((B * span,), jnp.int8)
    oflat = oflat.at[dest].set(
        st.occ_bits.reshape(-1).astype(jnp.int8), mode="drop",
        unique_indices=True,
    )
    obits = jnp.transpose(
        oflat.reshape(B, H, W, nch), (0, 3, 1, 2)
    )  # [B, nch, H, W] int8 — tiny
    z4 = jnp.arange(CHUNK, dtype=jnp.int8)[None, None, :, None, None]
    occz = ((obits[:, :, None] >> z4) & 1).astype(bool)
    return dense, occz.reshape(B, nch * CHUNK, H, W)
