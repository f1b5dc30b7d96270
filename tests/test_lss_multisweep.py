"""Multi-sweep LSS forward (ref lss_fpn.py:244-306 `_forward_single_sweep` +
the sweeps loop :340-368): per-sweep BEV maps concat on channels, weights
shared, sweeps > 0 under stop_gradient."""
import numpy as np

import jax
import pytest
import jax.numpy as jnp

from unidistill_tpu.configs.nuscenes import tiny_model
from unidistill_tpu.layers.lss import LSSFPN


def _mats(rng, B, N, Hc, Wc, sweep_shift=0.0):
    eye = np.broadcast_to(np.eye(4, dtype=np.float32), (B, N, 4, 4)).copy()
    intrin = eye.copy()
    intrin[..., 0, 0] = intrin[..., 1, 1] = 500.0
    intrin[..., 0, 2] = Wc / 2
    intrin[..., 1, 2] = Hc / 2
    s2e = eye.copy()
    s2e[..., 0, 3] = sweep_shift  # ego moved between sweeps
    return dict(sensor2ego_mats=s2e, intrin_mats=intrin, ida_mats=eye.copy(),
                bda_mat=np.broadcast_to(np.eye(4, dtype=np.float32),
                                        (B, 4, 4)).copy())


def test_multisweep_concat_matches_single_sweeps():
    ccfg = tiny_model().camera_encoder
    B, S, N = 1, 2, ccfg.num_cams  # smallest shapes proving concat semantics
    Hc, Wc = ccfg.final_dim
    rng = np.random.RandomState(0)
    imgs = rng.randn(B, S, N, Hc, Wc, 3).astype(np.float32)
    mats_s = [_mats(rng, B, N, Hc, Wc, sweep_shift=0.5 * s) for s in range(S)]
    mats_multi = {
        k: (mats_s[0][k] if k == "bda_mat"
            else np.stack([m[k] for m in mats_s], axis=1))
        for k in mats_s[0]
    }

    model = LSSFPN(ccfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(imgs),
        jax.tree.map(jnp.asarray, mats_multi), False,
    )
    multi = model.apply(variables, jnp.asarray(imgs),
                        jax.tree.map(jnp.asarray, mats_multi), False)
    C = ccfg.output_channels
    assert multi.shape[-1] == S * C

    # channel blocks == independent single-sweep forwards with the SAME params
    for s in range(S):
        single = model.apply(
            variables, jnp.asarray(imgs[:, s]),
            jax.tree.map(jnp.asarray, mats_s[s]), False,
        )
        np.testing.assert_allclose(
            np.asarray(multi[..., s * C:(s + 1) * C], np.float32),
            np.asarray(single, np.float32), rtol=1e-4, atol=1e-4,
        )


@pytest.mark.slow  # 32 s — concat-matches-single-sweeps stays in the fast suite
def test_multisweep_only_key_frame_carries_grad():
    ccfg = tiny_model().camera_encoder
    B, S, N = 1, 2, ccfg.num_cams
    Hc, Wc = ccfg.final_dim
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randn(B, S, N, Hc, Wc, 3).astype(np.float32))
    m = _mats(rng, B, N, Hc, Wc)
    mats = {k: (v if k == "bda_mat" else np.stack([v, v], axis=1))
            for k, v in m.items()}
    mats = jax.tree.map(jnp.asarray, mats)

    model = LSSFPN(ccfg)
    variables = model.init(jax.random.PRNGKey(0), imgs, mats, False)

    def loss(params, x):
        out = model.apply(
            {"params": params, **{k: v for k, v in variables.items()
                                  if k != "params"}}, x, mats, False)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=1)(variables["params"], imgs)
    g = np.asarray(g)
    # gradient flows to the key sweep only (ref torch.no_grad for sweep > 0)
    assert np.abs(g[:, 0]).max() > 0
    assert np.abs(g[:, 1]).max() == 0
