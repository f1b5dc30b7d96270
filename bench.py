"""Benchmark harness — streams one JSON line per metric for the driver.

Headline metric: camera BEV detector eval forward (ResNet-50 → LSS
lift-splat → Pallas BEV pool → BEV backbone → fused CenterHead → decode +
batched rotated NMS) at real nuScenes shapes on the attached TPU chip,
frames/sec/chip at batch 4. Secondary metrics: LiDAR-only and fusion eval
fps at real voxel caps, train/distill step times, measured under the same
protocol.

Output protocol (round 4 — BENCH_r03 was rc=124/parsed=null because the
single JSON line only printed after ~7 cold compile+measure cycles):
  * The HEADLINE camera-eval line prints FIRST, as soon as it is measured,
    with the full schema — a mid-run kill now truncates the tail, not the
    head.
  * Each subsequent metric prints its own JSON line as it completes.
  * A final cumulative line (same schema, all metrics in "extra") prints
    last, so last-line parsers get the full record.
  * The time budget comes from BENCH_TIME_BUDGET_S (default 1200 s —
    conservative vs the driver's kill window); metrics that don't fit are
    recorded as "skipped: time budget" in the cumulative line.

Methodology: the axon relay adds ~30 ms host↔device round-trip per dispatch
and pipelines independent dispatches, so naive wall-clock loops are wrong in
both directions. We time fully-synchronous single dispatches (scalar fetch
forces completion), subtract the relay overhead measured with a trivial
jitted no-op, and report the median of several reps. Both raw and
overhead-subtracted timings are reported.

MFU: each metric carries the compiled step's XLA flop count
(`compiled.cost_analysis()`) and `mfu_pct` = flops / net-time / chip peak;
the analytic per-modality FLOP model (unidistill_tpu/utils/flops.py)
cross-checks the XLA number in tests/test_flops.py.

`vs_baseline`: the reference repo publishes no numbers (BASELINE.md), so
denominators are CONSTRUCTED per modality from published figures for the
closest public models of the same architecture class (BEVFusion 8.4 fps /
3090, CenterPoint ~11 fps / Titan RTX, BEVDet-R50 16.4 fps / 3090), scaled
by a conservative 1.5-2x A100 uplift — provenance table in BASELINE.md.
Output carries "baseline_constructed": true.

Batches carry loader-side voxelization (data/voxelize_host.py), matching
the real pipeline where worker processes overlap it with device compute.
"""
import functools
import json
import os
import time

# persistent compile cache: the LiDAR/fusion graphs compile in minutes cold,
# seconds warm
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

# constructed per-modality A100 baselines — provenance in BASELINE.md
BASELINES = {"camera": 25.0, "lidar": 18.0, "fusion": 15.0}
A100_REF_FPS = BASELINES["camera"]
BATCH = 4
REPS = 5  # was 7; trimmed r5 so the distill metric fits the budget
TIME_BUDGET_S = float(os.environ.get("BENCH_TIME_BUDGET_S", "1200"))
_T0 = time.time()

# chip peak for MFU (dense matmul units; v5e bf16). Overridable for other
# chips via env.
PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_FLOPS", "1.97e14"))


def _left():
    return TIME_BUDGET_S - (time.time() - _T0)


def _emit(obj):
    print(json.dumps(obj), flush=True)


def median_sync_time(fn, reps=REPS):
    """Median wall time of a fully-synchronous call (fn must fetch a scalar)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def _xla_flops(jitted, *args, **kwargs):
    """Per-call flop count of a jitted fn from XLA's cost analysis."""
    try:
        ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception:  # noqa: BLE001 — cost analysis is best-effort
        return None


def _mfu(flops, net_s):
    if not flops or net_s <= 0:
        return None
    return round(100.0 * flops / net_s / PEAK_FLOPS, 2)


def pipelined_ms_per_step(step, state, batch, K=8, reps=3):
    """Per-step ms of K chained steps in ONE dispatch (lax.scan), validating
    the relay-overhead subtraction: in a pipelined deployment the ~30 ms
    dispatch overhead amortizes over in-flight steps, so per-step time should
    match the overhead-subtracted `net`, not `raw` (VERDICT r4 weak #4). The
    carry perturbs every float input (float x + c*0 is NOT constant-folded;
    PROFILE.md methodology) and the full output reduces into the carry so XLA
    can neither hoist the loop-invariant step nor DCE it."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def body(c, _):
        b = jax.tree.map(
            lambda x: x + c.astype(x.dtype) * 0
            if jnp.issubdtype(x.dtype, jnp.inexact) else x,
            batch,
        )
        out = step(state, b)
        tot = sum(
            jnp.sum(v).astype(jnp.float32)
            for v in jax.tree.leaves(out)
            if jnp.issubdtype(v.dtype, jnp.inexact)
        )
        return c + tot * 0 + 1.0, None

    @jax.jit
    def run_k(c0):
        c, _ = lax.scan(body, c0, None, length=K)
        return c

    float(run_k(jnp.float32(0.0)))  # compile + warm
    t = median_sync_time(lambda: float(run_k(jnp.float32(0.0))), reps=reps)
    return round(t / K * 1e3, 1)


def bench_eval(exp_factory, overhead_s, pipelined=False):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synth_batch
    from unidistill_tpu.models.bevfusion import BEVFusionCenterHead
    from unidistill_tpu.training.steps import eval_step, model_inputs
    from unidistill_tpu.training.train_state import (
        create_train_state,
        make_optimizer,
    )

    cfg = exp_factory().model
    batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, BATCH))
    model = BEVFusionCenterHead(cfg)
    kw = model_inputs(jax.tree.map(lambda x: x[:1], batch), cfg, training=False)
    init_fn = jax.jit(lambda k: model.init(k, **kw, train=False))
    variables = init_fn(jax.random.PRNGKey(0))
    jax.block_until_ready(variables)
    state = create_train_state(variables, make_optimizer(1e-3, 1e-7, 0.1))

    step = jax.jit(functools.partial(eval_step, model=model, cfg=cfg))
    float(jnp.sum(step(state, batch)["scores"]))  # compile + warm
    raw = median_sync_time(lambda: float(jnp.sum(step(state, batch)["scores"])))
    net = max(raw - overhead_s, 1e-9)
    flops = _xla_flops(step, state, batch)
    r = dict(
        fps=round(BATCH / net, 2),
        ms_per_batch=round(net * 1e3, 1),
        ms_per_batch_raw=round(raw * 1e3, 1),
        xla_flops_per_batch=flops,
        mfu_pct=_mfu(flops, net),
    )
    # validate the overhead subtraction when the budget allows: one extra
    # scan-of-K compile + 3 reps of K chained steps. Camera-only since r5:
    # the scan compile is ~minutes for the big lidar/fusion graphs over the
    # relay and burned the budget the train metrics need. One-time r5
    # builder run validated the others: lidar pipelined 432.6 ms vs net
    # 436.4 / raw 463.0 (agrees with net); fusion cannot run — the relay's
    # remote_compile rejects the scan-of-8 program upload (HTTP 413 length
    # limit), a transport cap, not a methodology gap (PROFILE.md r5).
    if pipelined and _left() > 90 + 3 * 8 * raw:
        try:
            r["ms_per_batch_pipelined"] = pipelined_ms_per_step(
                step, state, batch
            )
        except Exception as e:  # noqa: BLE001 — diagnostic, never fatal
            r["ms_per_batch_pipelined"] = (
                f"failed: {type(e).__name__}: {e}"[:160]
            )
    return r


def bench_train(exp_factory, overhead_s):
    """Plain train step sec/it at b=4 — the reference's main workload
    (20-epoch CBGS nuScenes training; VERDICT r1 item 4)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synth_batch
    from unidistill_tpu.models.bevfusion import BEVFusionCenterHead
    from unidistill_tpu.training.steps import model_inputs, train_step
    from unidistill_tpu.training.train_state import (
        create_train_state,
        make_optimizer,
    )

    cfg = exp_factory().model
    batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, BATCH, training=True))
    model = BEVFusionCenterHead(cfg)
    kw = model_inputs(jax.tree.map(lambda x: x[:1], batch), cfg, training=True)
    variables = jax.jit(lambda k: model.init(k, **kw, train=True))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(variables)
    tx = make_optimizer(1e-3, 1e-7, 0.1)
    state = create_train_state(variables, tx)
    step = jax.jit(functools.partial(train_step, model=model, cfg=cfg, tx=tx))

    def run():
        new_state, metrics = step(state, batch)
        return float(metrics["loss"])

    run()  # compile + warm
    raw = median_sync_time(run, reps=5)
    net = max(raw - overhead_s, 1e-9)
    flops = _xla_flops(step, state, batch)
    return dict(
        sec_per_it=round(net, 3),
        sec_per_it_raw=round(raw, 3),
        frames_per_sec=round(BATCH / net, 2),
        xla_flops_per_it=flops,
        mfu_pct=_mfu(flops, net),
    )


def bench_distill_train(overhead_s):
    """Distill train step (camera student ← lidar teacher): sec/it at b=4
    (ref …camera_exp_distill_lidar.py:438-513 is the reference hot loop)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _synth_batch
    from unidistill_tpu.configs.nuscenes import (
        DISTILL_VARIANTS,
        camera_exp,
        lidar_exp,
    )
    from unidistill_tpu.models.bevfusion import BEVFusionCenterHead
    from unidistill_tpu.training.steps import distill_train_step, model_inputs
    from unidistill_tpu.training.train_state import (
        create_train_state,
        make_optimizer,
    )

    s_cfg = camera_exp().model
    t_cfg = lidar_exp().model
    dcfg = DISTILL_VARIANTS[("lidar", "camera")]
    # batch carries both modalities (teacher consumes lidar, student camera)
    both = dataclasses_replace_both(s_cfg, t_cfg)
    batch = jax.tree.map(jnp.asarray, _synth_batch(both, BATCH))

    student = BEVFusionCenterHead(s_cfg)
    teacher = BEVFusionCenterHead(t_cfg)
    kw_s = model_inputs(jax.tree.map(lambda x: x[:1], batch), s_cfg, training=True)
    kw_t = model_inputs(jax.tree.map(lambda x: x[:1], batch), t_cfg, training=False)
    sv = jax.jit(lambda k: student.init(k, **kw_s, train=True))(jax.random.PRNGKey(0))
    tv = jax.jit(lambda k: teacher.init(k, **kw_t, train=False))(jax.random.PRNGKey(1))
    jax.block_until_ready((sv, tv))
    tx = make_optimizer(2e-4, 1e-7, 0.1)
    state = create_train_state(sv, tx)

    step = jax.jit(
        functools.partial(
            distill_train_step,
            student_model=student, teacher_model=teacher, tx=tx,
            student_cfg=s_cfg, teacher_cfg=t_cfg, dcfg=dcfg,
        )
    )
    t_params = tv["params"]
    t_stats = tv.get("batch_stats", {})

    def run():
        new_state, metrics = step(state, t_params, t_stats, batch)
        return float(metrics["loss"])

    run()  # compile + warm
    raw = median_sync_time(run, reps=5)
    net = max(raw - overhead_s, 1e-9)
    flops = _xla_flops(step, state, t_params, t_stats, batch)
    return dict(
        sec_per_it=round(net, 3),
        sec_per_it_raw=round(raw, 3),
        frames_per_sec=round(BATCH / net, 2),
        xla_flops_per_it=flops,
        mfu_pct=_mfu(flops, net),
    )


def dataclasses_replace_both(s_cfg, t_cfg):
    """Config whose caps/flags produce a batch covering both modalities."""
    import dataclasses

    return dataclasses.replace(
        s_cfg if s_cfg.with_lidar or not t_cfg.with_lidar else t_cfg,
        with_lidar=s_cfg.with_lidar or t_cfg.with_lidar,
        with_camera=s_cfg.with_camera or t_cfg.with_camera,
    )


def _wait_for_backend(budget_s: float):
    """The axon relay can be transiently unavailable; probe in a subprocess
    (a failed in-process init can poison the PJRT client) until it answers
    or the budget is spent. Returns True when the backend is usable."""
    import subprocess
    import sys

    probe = (
        "import jax, jax.numpy as jnp;"
        "print(float(jnp.sum(jnp.ones((4,)) + 1)))"
    )
    deadline = time.time() + budget_s
    while time.time() < deadline:
        left = max(30, min(180, int(deadline - time.time())))
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True,
                timeout=left,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(15)
    return False


def _headline(fps, extra):
    return {
        "metric": "camera_bev_eval_frames_per_sec_per_chip",
        "value": fps,
        "unit": "frames/s",
        "vs_baseline": round(fps / A100_REF_FPS, 3),
        "baseline_constructed": True,
        "batch": BATCH,
        "extra": extra,
    }


def main():
    if not _wait_for_backend(min(600.0, TIME_BUDGET_S / 3)):
        _emit({
            "metric": "camera_bev_eval_frames_per_sec_per_chip",
            "value": 0.0,
            "unit": "frames/s",
            "vs_baseline": 0.0,
            "error": "TPU backend unavailable (axon relay down past probe budget)",
        })
        return

    import jax
    import jax.numpy as jnp

    from unidistill_tpu.configs.nuscenes import camera_exp, fusion_exp, lidar_exp

    @jax.jit
    def noop(x):
        return x + 1.0

    small = jnp.zeros((8,), jnp.float32)
    float(noop(small)[0])  # compile
    ovh = median_sync_time(lambda: float(noop(small)[0]))

    extra = {
        "relay_overhead_ms": round(ovh * 1e3, 1),
        "peak_flops_assumed": PEAK_FLOPS,
        "time_budget_s": TIME_BUDGET_S,
    }
    cam_fps = 0.0

    # headline first — its line must land even if everything after is killed
    try:
        r = bench_eval(camera_exp, ovh, pipelined=True)
        r["vs_baseline"] = round(r["fps"] / BASELINES["camera"], 3)
        extra["camera_eval"] = r
        cam_fps = r["fps"]
    except Exception as e:  # noqa: BLE001 — always emit the JSON line
        extra["camera_eval"] = f"failed: {type(e).__name__}: {e}"[:200]
    _emit(_headline(cam_fps, {"camera_eval": extra["camera_eval"],
                              "relay_overhead_ms": extra["relay_overhead_ms"]}))

    # secondary metrics, each streaming its own line as it completes;
    # rough per-metric cost floors (cold compile + reps) gate on the budget
    def eval_metric(name, factory):
        r = bench_eval(factory, ovh)
        r["vs_baseline"] = round(r["fps"] / BASELINES[name], 3)
        return r, {"metric": f"{name}_eval_frames_per_sec_per_chip",
                   "value": r["fps"], "unit": "frames/s",
                   "vs_baseline": r["vs_baseline"],
                   "baseline_constructed": True}

    def train_metric(name, factory):
        r = bench_train(factory, ovh)
        return r, {"metric": f"{name}_train_sec_per_it",
                   "value": r["sec_per_it"], "unit": "s/it"}

    def distill_metric(name, _):
        r = bench_distill_train(ovh)
        return r, {"metric": "distill_train_lidar_to_camera_sec_per_it",
                   "value": r["sec_per_it"], "unit": "s/it"}

    # distill runs FIRST among the secondary metrics: it is the namesake
    # workload and went 4 rounds without a driver-captured number because it
    # sat last in this list (VERDICT r4 next-round #2); lidar/fusion train
    # are the metrics that now risk the budget tail.
    # camera_train last: it is the metric least changed by the r5 per-exp
    # remat policy (lidar/fusion trains carry the fresh policy numbers).
    jobs = [
        ("distill_train_lidar_to_camera", distill_metric, "distill", None, 240),
        ("lidar_eval", eval_metric, "lidar", lidar_exp, 120),
        ("fusion_eval", eval_metric, "fusion", fusion_exp, 120),
        ("lidar_train", train_metric, "lidar", lidar_exp, 150),
        ("fusion_train", train_metric, "fusion", fusion_exp, 150),
        # floor 100 < true ~125 s cost on purpose: it is the last job, its
        # lines stream as they land, and a small overrun past the internal
        # budget beats losing the metric by a few seconds (r5 builder run
        # finished lidar_train at t=1093 leaving 107 s).
        ("camera_train", train_metric, "camera", camera_exp, 100),
    ]
    for key, fn, name, factory, floor_s in jobs:
        if _left() < floor_s:
            extra[key] = "skipped: time budget"
            continue
        try:
            r, line = fn(name, factory)
            extra[key] = r
            line["mfu_pct"] = r.get("mfu_pct")
            line["t_s"] = round(time.time() - _T0, 1)  # budget diagnosability
            _emit(line)
        except Exception as e:  # noqa: BLE001
            extra[key] = f"failed: {type(e).__name__}: {e}"[:200]

    extra["elapsed_s"] = round(time.time() - _T0, 1)
    _emit(_headline(cam_fps, extra))


if __name__ == "__main__":
    main()
