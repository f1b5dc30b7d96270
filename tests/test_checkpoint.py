"""orbax save/restore roundtrip + shape-filtered teacher merge + keep_latest
pruning (reference configures num_keep_latest_ckpt but never enforces it)."""
import numpy as np

import jax.numpy as jnp

from unidistill_tpu.training.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
    shape_filtered_merge,
)
from unidistill_tpu.training.train_state import (
    TrainState,
    create_train_state,
    make_optimizer,
)


def _mk_state(scale=1.0):
    params = {"layer": {"kernel": jnp.full((3, 4), scale),
                        "bias": jnp.zeros((4,))}}
    tx = make_optimizer(1e-3, 1e-7, 0.1)
    st = create_train_state({"params": params, "batch_stats": {"bn": {"mean": jnp.ones(4)}}}, tx)
    return st, tx


def test_save_restore_roundtrip(tmp_path):
    st, tx = _mk_state(2.5)
    st = TrainState(jnp.asarray(7, jnp.int32), st.params, st.batch_stats,
                    st.opt_state)
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, st)
    path = latest_checkpoint(d)
    assert path.endswith("step_7")
    tpl = dict(step=np.zeros((), np.int32), params=st.params,
               batch_stats=st.batch_stats, opt_state=st.opt_state)
    restored = restore_checkpoint(path, tpl)
    assert int(restored["step"]) == 7
    np.testing.assert_allclose(
        np.asarray(restored["params"]["layer"]["kernel"]), 2.5
    )
    # opt_state roundtrips too
    flat_a = jnp.concatenate([jnp.ravel(x) for x in
                              jax.tree.leaves(restored["opt_state"])])
    flat_b = jnp.concatenate([jnp.ravel(x) for x in
                              jax.tree.leaves(st.opt_state)])
    np.testing.assert_allclose(np.asarray(flat_a), np.asarray(flat_b))


import jax  # noqa: E402


def test_keep_latest_prunes(tmp_path):
    st, _ = _mk_state()
    d = str(tmp_path / "ckpt")
    for s in (1, 2, 3, 4):
        save_checkpoint(d, st, step=s, keep_latest=2)
    import os

    steps = sorted(x for x in os.listdir(d) if x.startswith("step_"))
    assert steps == ["step_3", "step_4"]


def test_shape_filtered_merge():
    target = {"a": jnp.zeros((2, 2)), "b": jnp.zeros((3,)), "c": jnp.zeros((4,))}
    loaded = {"a": jnp.ones((2, 2)), "b": jnp.ones((5,))}  # b mismatched, c absent
    merged, used, skipped = shape_filtered_merge(target, loaded)
    assert used == 1 and skipped == 2
    np.testing.assert_allclose(np.asarray(merged["a"]), 1.0)
    np.testing.assert_allclose(np.asarray(merged["b"]), 0.0)
    np.testing.assert_allclose(np.asarray(merged["c"]), 0.0)
