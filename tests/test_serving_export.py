"""AOT serving export: serialize → reload → identical predictions."""
import pytest

import numpy as np

import jax
import jax.numpy as jnp

from __graft_entry__ import _synth_batch
from unidistill_tpu.configs.nuscenes import tiny_model
from unidistill_tpu.models.bevfusion import BEVFusionCenterHead
from unidistill_tpu.serving.export import export_detector, load_detector
from unidistill_tpu.training.steps import eval_step, model_inputs
from unidistill_tpu.training.train_state import (

    create_train_state,
    make_optimizer,
)


pytestmark = pytest.mark.slow  # heavy e2e: excluded from the default fast suite

def test_export_roundtrip(tmp_path):
    cfg = tiny_model()
    B = 2
    batch = jax.tree.map(jnp.asarray, _synth_batch(cfg, B))
    model = BEVFusionCenterHead(cfg)
    kw = model_inputs(jax.tree.map(lambda x: x[:1], batch), cfg, training=False)
    variables = model.init(jax.random.PRNGKey(0), **kw, train=False)
    state = create_train_state(variables, make_optimizer(1e-3, 1e-7, 0.1))

    ref = jax.jit(lambda s, b: eval_step(s, b, model=model, cfg=cfg))(state, batch)

    out_dir = str(tmp_path / "detector")
    export_detector(
        cfg, state.params, state.batch_stats, out_dir, batch_size=B
    )

    det = load_detector(out_dir)
    assert det.meta["with_lidar"] and det.meta["with_camera"]
    got = det.predict(batch)

    # The exported program is compiled independently of the in-process jit;
    # bf16 fusion differences shift near-tied random-init scores, so exact
    # slot equality is not promised. Assert (a) the artifact itself is
    # deterministic, (b) outputs structurally match, (c) the score
    # distributions agree closely.
    again = det.predict(batch)
    for k in got:
        assert (got[k] == again[k]).all(), f"nondeterministic {k}"

    assert got["boxes"].shape == ref["boxes"].shape
    ref_mask = np.asarray(ref["mask"])
    assert abs(int(got["mask"].sum()) - int(ref_mask.sum())) <= 8
    ga = np.sort(got["scores"][got["mask"]])[::-1]
    gr = np.sort(np.asarray(ref["scores"])[ref_mask])[::-1]
    k = min(len(ga), len(gr))
    np.testing.assert_allclose(ga[:k], gr[:k], rtol=5e-2, atol=5e-3)

    # Fresh-process load+predict: the failure mode that motivated the
    # export-safe geometry (LAPACK custom calls segfaulting when a
    # deserialized module compiles in a new process — lss.py inv44
    # docstring) only reproduces outside the exporting process (ADVICE r1).
    import subprocess
    import sys

    import pickle

    pkl = str(tmp_path / "batch.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, dict(batch)), f)
    script = (
        "import sys, pickle, numpy as np\n"
        "import jax\n"
        # the axon sitecustomize force-registers the TPU backend; a fresh
        # process must pin CPU the same way conftest does or it hangs on
        # the relay
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_compilation_cache_dir',"
        " '/root/.cache/jax_comp_cache')\n"
        f"sys.path.insert(0, {repr(str(tmp_path))})\n"
        "from unidistill_tpu.serving.export import load_detector\n"
        f"det = load_detector({repr(out_dir)})\n"
        f"data = pickle.load(open({repr(pkl)}, 'rb'))\n"
        "out = det.predict(data)\n"
        "assert np.isfinite(out['scores']).all()\n"
        "print('SUBPROC_OK', float(out['scores'].sum()))\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "SUBPROC_OK" in proc.stdout


def test_export_host_voxels_fast_path(tmp_path):
    """input_mode='host_voxels' (VERDICT r2 §5): the artifact takes
    loader-voxelized feats/coords + chunked topology tables and must NOT
    contain the device voxelize/table-build prologue; ROIs match the
    in-process eval on the same host-fed batch, and a fresh process can
    load + predict."""
    cfg = tiny_model(with_camera=False)  # lidar-only, chunked encoder
    assert cfg.lidar_encoder.encoder_impl == "chunked"
    B = 2
    batch_np = _synth_batch(cfg, B)
    # the serving host ships voxel/topo tensors, not raw points
    serve_np = {
        k: v for k, v in batch_np.items()
        if k not in ("points", "points_mask")
    }
    batch = jax.tree.map(jnp.asarray, serve_np)
    model = BEVFusionCenterHead(cfg)
    kw = model_inputs(jax.tree.map(lambda x: x[:1], batch), cfg, training=False)
    variables = model.init(jax.random.PRNGKey(0), **kw, train=False)
    state = create_train_state(variables, make_optimizer(1e-3, 1e-7, 0.1))

    ref = jax.jit(lambda s, b: eval_step(s, b, model=model, cfg=cfg))(
        state, batch
    )

    out_dir = str(tmp_path / "detector_hv")
    export_detector(
        cfg, state.params, state.batch_stats, out_dir, batch_size=B,
        input_mode="host_voxels",
    )
    det = load_detector(out_dir)
    assert det.meta["input_mode"] == "host_voxels"
    spec_keys = set(det.meta["batch_spec"])
    assert "voxel_feats" in spec_keys and "points" not in spec_keys
    assert any(k.startswith("topo_") for k in spec_keys), spec_keys

    got = det.predict(serve_np)
    assert got["boxes"].shape == ref["boxes"].shape
    ref_mask = np.asarray(ref["mask"])
    assert abs(int(got["mask"].sum()) - int(ref_mask.sum())) <= 8
    ga = np.sort(got["scores"][got["mask"]])[::-1]
    gr = np.sort(np.asarray(ref["scores"])[ref_mask])[::-1]
    k = min(len(ga), len(gr))
    np.testing.assert_allclose(ga[:k], gr[:k], rtol=5e-2, atol=5e-3)

    # fresh-process load + predict (chunked shapes)
    import pickle
    import subprocess
    import sys

    pkl = str(tmp_path / "hv_batch.pkl")
    with open(pkl, "wb") as f:
        pickle.dump(serve_np, f)
    script = (
        "import sys, pickle, numpy as np\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_compilation_cache_dir',"
        " '/root/.cache/jax_comp_cache')\n"
        "from unidistill_tpu.serving.export import load_detector\n"
        f"det = load_detector({repr(out_dir)})\n"
        f"data = pickle.load(open({repr(pkl)}, 'rb'))\n"
        "out = det.predict(data)\n"
        "assert np.isfinite(out['scores']).all()\n"
        "print('SUBPROC_OK', float(out['scores'].sum()))\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "SUBPROC_OK" in proc.stdout
