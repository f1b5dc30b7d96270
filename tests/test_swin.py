"""Swin-T backbone: shapes, window masking, and LSS integration."""
import numpy as np

import jax
import jax.numpy as jnp

from unidistill_tpu.layers.swin import SwinTransformer, _shift_attn_mask


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
