"""Dynamic softmax temperature: ordering parity with the reference.

The reference scales k by sqrt(log L / log 1040) BEFORE QK-RMSNorm
(`model.py:166-180`). RMSNorm is scale-invariant, so the flag is a
mathematical no-op in the reference — we replicate the ordering, not an
"intended" behavior (SURVEY.md §7.3.1). These tests pin both facts."""

import jax
import jax.numpy as jnp
import numpy as np

from f_lite_tpu.models.dit import DiT, DiTConfig

BASE = dict(
    in_channels=16, patch_size=2, hidden_size=64, depth=2, num_heads=4,
    mlp_ratio=2.0, cross_attn_input_size=32, use_pallas_attention=False,
)


def test_flag_is_noop_through_qknorm():
    m_off = DiT(DiTConfig(**BASE))
    m_on = DiT(DiTConfig(**BASE, dynamic_softmax_temperature=True))
    x = jax.random.normal(jax.random.key(0), (1, 16, 16, 16))
    ctx = jax.random.normal(jax.random.key(1), (1, 8, 32))
    mask = jnp.ones((1, 8), jnp.bool_)
    t = jnp.array([0.5])
    params = m_off.init(jax.random.key(2), x, ctx, mask, t)
    params = jax.tree.map(lambda p: p + 0.02, params)
    a = m_off.apply(params, x, ctx, mask, t)
    b = m_on.apply(params, x, ctx, mask, t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_param_structure_unchanged():
    cfg = DiTConfig(**BASE, dynamic_softmax_temperature=True)
    model = DiT(cfg)
    p = model.init_params(jax.random.key(0), text_len=8, image_size=16)
    assert "blocks_0" in p["params"]  # same tree, no extra params
