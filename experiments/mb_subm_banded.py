"""Case-BANDED 3-view subm table vs production, on REALISTIC topologies.

RESULT (run 2026-08-20 on the attached v5e, recorded in PROFILE.md r5):
banded LOST everywhere that matters — down2 70.2 vs 29.7 ms, down3 45.9
vs 22.3, s2 50.2 vs 25.3, s3 33.8 vs 17.9; s0 13.97 vs 14.48 (noise).
The banded production paths and their env knobs were deleted; the local
`banded()` / `interleaved_cv()` formulations below are self-contained so
the experiment remains re-runnable for the subm stages (`bench_down`'s
env-knob A/B is obsolete — the production down conv is select-only now).

The r3/r4 case-view rule-outs used the case-INTERLEAVED layout
(idx = 3·row + case), which dilutes per-offset row locality for EVERY
row: consecutive sites land 3 rows apart even when all of them are
case 0. Two facts make a case-CONCATENATED (banded) layout
(idx = case·(S+1) + row) a different beast:

  * measured case distribution on realistic clouds (planner tables,
    this file): s2 hits are 96% case 0, s3 94% — the gather stream
    stays inside band 0 and monotone almost everywhere;
  * misses (32% of s2 lookups, 55% at s0!) all resolve to row S of
    their band, which is a zero row in EVERY band (band 0: tab row S;
    band 1: lanes 4C:10C of row S; band 2: [0⁴ᶜ | lanes 0:2C of row
    S]) — no case masking needed, and same-row gathers are maximally
    local.

Rows shrink 10C → 6C (640 → 384 B at s2) and the post-gather
`_extract_subm_window` select pass (~5 ms/conv) disappears.

Unlike mb_flat_subm.make_inputs (uniform-random case, 12% miss), the
tables here come from the actual host planner on occupancy_profile's
realistic clouds — the case/miss/locality structure is the experiment.

Run: python experiments/mb_subm_banded.py [s0 s2 s3]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

import jax
import jax.numpy as jnp
import numpy as np

from mb_flat_subm import overhead, scan_op, timed
from occupancy_profile import realistic_cloud
from unidistill_tpu.configs.nuscenes import lidar_exp
from unidistill_tpu.data.topology_host import plan_frame_topology
from unidistill_tpu.data.voxelize_host import voxelize_frame
from unidistill_tpu.ops.sparse_conv_chunked import (
    _OFFS8,
    _band_weight,
    _case_view,
    _subm_impl,
    _w_zyx,
    _window_table,
    ChunkedTables,
    bits_of_occ,
    rowgather,
    zmask,
)

B = 4


def realistic_stage_inputs(stage, seed=0):
    """Planner tables for B realistic clouds at one encoder stage."""
    cfg = lidar_exp().model
    rng = np.random.RandomState(seed)
    cks, chs, nbrs, occs = [], [], [], []
    for b in range(B):
        pts = realistic_cloud(rng)
        vf, vc = voxelize_frame(pts, np.ones(len(pts), bool), cfg,
                                training=False)
        topo = plan_frame_topology(
            vc, cfg.grid_size, cfg.lidar_encoder.stage_voxel_caps,
            s0_cap=cfg.lidar_encoder.s0_slot_cap,
        )
        V = vc.shape[0]
        sfx = {"s0": "0", "s2": "2", "s3": "3"}[stage]
        cks.append(topo[f"ck{sfx}"])
        chs.append(topo[f"ch{sfx}"])
        nbrs.append(topo[f"nbr{sfx}"])
        occs.append(
            bits_of_occ(jnp.asarray(topo["src0"] < V)) if stage == "s0"
            else jnp.asarray(topo[f"occ{sfx}"])
        )
    hw = {"s0": 1440 * 1440, "s2": 720 * 720, "s3": 360 * 360}[stage]
    C = {"s0": 16, "s2": 32, "s3": 64}[stage]
    ck = jnp.asarray(np.stack(cks))
    ch = jnp.asarray(np.stack(chs))
    pack = jnp.asarray(np.stack(nbrs))          # [B, 9, S] idx·4 + case
    occ_bits = jnp.stack(occs)
    valid = ck < hw
    S = ck.shape[1]
    nrng = np.random.default_rng(seed + 1)
    feats = jnp.asarray(
        nrng.standard_normal((B, S, 4 * C)) * 0.1, jnp.bfloat16)
    feats = zmask(occ_bits, C, feats)
    w = jnp.asarray(nrng.standard_normal((27, C, C)) * 0.05, jnp.float32)
    return (feats, occ_bits, ck, ch, valid,
            ChunkedTables(pack >> 2, pack & 3, None), w, S, C)


def _center(tab, W6, Bb, S, C, co, dt, acc):
    gc = tab[:, :S, 0:6 * C].reshape(Bb * S, 6 * C)
    return acc + jnp.einsum("bw,wk->bk", gc, W6[4],
                            preferred_element_type=dt).reshape(Bb, S, 4 * co)


def banded(feats, occ_bits, ck, ch, vd, w, tables, C, co, dt):
    Bb, S, FC = feats.shape
    tab = _window_table(feats, occ_bits, ck, ch, vd, False, dt)
    Sp1 = tab.shape[1]
    v0 = tab[:, :, 0:6 * C]
    v1 = tab[:, :, 4 * C:10 * C]
    v2 = jnp.concatenate(
        [jnp.zeros_like(tab[:, :, 0:4 * C]), tab[:, :, 0:2 * C]], axis=2)
    tabb = jnp.concatenate([v0, v1, v2], axis=1)   # [B, 3·(S+1), 6C]
    W6 = _band_weight(_w_zyx(w), C, co, 6, 1, dt)
    offs = np.asarray(_OFFS8)
    accs = []
    for b in range(Bb):
        i = (tables.nbr_case[b][offs] * Sp1
             + tables.nbr_idx[b][offs]).reshape(-1)
        win = rowgather(tabb[b], i).reshape(8, S, 6 * C)
        accs.append(jnp.einsum("osw,owk->osk", win, W6[offs],
                               preferred_element_type=dt).sum(0))
    acc = jnp.stack(accs)
    return zmask(occ_bits, co, _center(tab, W6, Bb, S, C, co, dt, acc))


def interleaved_cv(feats, occ_bits, ck, ch, vd, w, tables, C, co, dt):
    Bb, S, FC = feats.shape
    tab = _window_table(feats, occ_bits, ck, ch, vd, False, dt)
    tabv = _case_view(tab, Bb, C)
    W6 = _band_weight(_w_zyx(w), C, co, 6, 1, dt)
    offs = np.asarray(_OFFS8)
    accs = []
    for b in range(Bb):
        i3 = (tables.nbr_idx[b][offs] * 3
              + tables.nbr_case[b][offs]).reshape(-1)
        win = rowgather(tabv[b], i3).reshape(8, S, 6 * C)
        accs.append(jnp.einsum("osw,owk->osk", win, W6[offs],
                               preferred_element_type=dt).sum(0))
    acc = jnp.stack(accs)
    return zmask(occ_bits, co, _center(tab, W6, Bb, S, C, co, dt, acc))


def realistic_down_inputs(which, seed=0):
    """Planner DownSites + input tensors for down2 (s0→s2) / down3 (s2→s3)."""
    from unidistill_tpu.ops.sparse_conv_chunked import sites_from_host

    cfg = lidar_exp().model
    rng = np.random.RandomState(seed)
    frames = []
    for b in range(B):
        pts = realistic_cloud(rng)
        vf, vc = voxelize_frame(pts, np.ones(len(pts), bool), cfg,
                                training=False)
        topo = plan_frame_topology(
            vc, cfg.grid_size, cfg.lidar_encoder.stage_voxel_caps,
            s0_cap=cfg.lidar_encoder.s0_slot_cap,
        )
        topo["V"] = vc.shape[0]
        frames.append(topo)

    if which == "down2":
        i_sfx, o_sfx, C, co, hw_in, hw_out = "0", "2", 16, 32, 1440**2, 720**2
    else:
        i_sfx, o_sfx, C, co, hw_in, hw_out = "2", "3", 32, 64, 720**2, 360**2
    st = lambda k: jnp.asarray(np.stack([t[k] for t in frames]))  # noqa: E731
    ck_in, ch_in = st(f"ck{i_sfx}"), st(f"ch{i_sfx}")
    occ_in = (jnp.stack([bits_of_occ(jnp.asarray(t["src0"] < t["V"]))
                         for t in frames]) if which == "down2"
              else st(f"occ{i_sfx}"))
    sites = sites_from_host(st(f"ck{o_sfx}"), st(f"ch{o_sfx}"),
                            st(f"a{o_sfx}"), st(f"b{o_sfx}"),
                            st(f"rev{o_sfx}"), hw_out)
    occ_out = st(f"occ{o_sfx}")
    S = ck_in.shape[1]
    nrng = np.random.default_rng(seed + 1)
    feats = zmask(occ_in, C, jnp.asarray(
        nrng.standard_normal((B, S, 4 * C)) * 0.1, jnp.bfloat16))
    w = jnp.asarray(nrng.standard_normal((27, C, co)) * 0.05, jnp.float32)
    return (feats, occ_in, ck_in, ch_in, ck_in < hw_in, sites, occ_out, w)


def bench_down(which):
    import os

    from unidistill_tpu.ops.sparse_conv_chunked import _down2_v2_impl

    ovh = overhead()
    feats, occ_in, ck, ch, vd, sites, occ_out, w = \
        realistic_down_inputs(which)
    dt = jnp.bfloat16
    args = (feats, occ_in, ck, ch, vd, w, sites, occ_out)
    for mode in ("0", "1"):
        os.environ["UNIDISTILL_DOWN_BANDED"] = mode

        def op(a, c, _m=mode):  # _m pins retrace per mode
            return _down2_v2_impl(a[0] + c.astype(dt) * 0, a[1], a[2], a[3],
                                  a[4], a[5], None, a[6], a[7], "bfloat16")

        f = jax.jit(scan_op(op))
        t = timed(f, *args, ovh=ovh)
        label = {"0": "select", "1": "banded"}[mode]
        print(f"  {which} {label:12s}: {t*1e3:7.2f} ms/conv", flush=True)
    del os.environ["UNIDISTILL_DOWN_BANDED"]


def main():
    ovh = overhead()
    print(f"overhead {ovh*1e3:.1f} ms", flush=True)
    stages = sys.argv[1:] or ["s0", "s2", "s3", "down2", "down3"]
    for which in [s for s in stages if s.startswith("down")]:
        bench_down(which)
    for stage in [s for s in stages if not s.startswith("down")]:
        t0 = time.time()
        feats, occ_bits, ck, ch, vd, tb, w, S, C = \
            realistic_stage_inputs(stage)
        co = C
        dt = jnp.bfloat16
        # table stats
        hit = np.mean(np.asarray(tb.nbr_idx)[:, _OFFS8, :] < S)
        c0 = np.mean(np.asarray(tb.nbr_case)[:, _OFFS8, :][
            np.asarray(tb.nbr_idx)[:, _OFFS8, :] < S] == 0)
        print(f"{stage}: S={S} C={C} hit={hit:.2f} case0|hit={c0:.2f} "
              f"(planner tables, {time.time()-t0:.0f}s)", flush=True)
        args = (feats, occ_bits, ck, ch, vd, w, tb)

        def prod(a, c):
            return _subm_impl(a[0] + c.astype(dt) * 0, a[1], a[2], a[3],
                              a[4], a[5], None, a[6], "bfloat16")

        variants = {"prod(auto)": prod}
        for vn, fn in (("interleaved", interleaved_cv), ("banded", banded)):
            variants[vn] = (lambda a, c, f=fn: f(
                a[0] + c.astype(dt) * 0, a[1], a[2], a[3], a[4], a[5], a[6],
                C, co, dt))

        ref = None
        for vn, op in variants.items():
            t0 = time.time()
            try:
                f = jax.jit(scan_op(op))
                t = timed(f, *args, ovh=ovh)
                y = jax.jit(lambda a, op=op: op(a, jnp.float32(0.0)))(args)
                if ref is None:
                    ref = y
                    derr = 0.0
                else:
                    derr = float(jnp.max(jnp.abs(
                        y.astype(jnp.float32) - ref.astype(jnp.float32))))
                print(f"  {stage} {vn:12s}: {t*1e3:7.2f} ms/conv "
                      f"(maxerr {derr:.2e}, compile {time.time()-t0:.0f}s)",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {stage} {vn:12s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
