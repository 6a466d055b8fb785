"""DiT model tests: shapes, init properties, variant flags, masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f_lite_tpu.models.dit import DiT, DiTConfig

TINY = DiTConfig(
    in_channels=16,
    patch_size=2,
    hidden_size=64,
    depth=3,
    num_heads=4,
    mlp_ratio=2.0,
    cross_attn_input_size=32,
    use_pallas_attention=False,
)


def _inputs(cfg, b=2, hw=16, s=8, seed=0):
    ks = jax.random.split(jax.random.key(seed), 4)
    x = jax.random.normal(ks[0], (b, hw, hw, cfg.in_channels), jnp.float32)
    ctx = jax.random.normal(ks[1], (b, s, cfg.cross_attn_input_size))
    mask = jnp.ones((b, s), jnp.bool_)
    t = jax.random.uniform(ks[2], (b,))
    return x, ctx, mask, t


class TestDiTForward:
    def test_output_shape(self):
        model = DiT(TINY)
        x, ctx, mask, t = _inputs(TINY)
        params = model.init(jax.random.key(0), x, ctx, mask, t)
        out = model.apply(params, x, ctx, mask, t)
        assert out.shape == x.shape
        assert jnp.isfinite(out).all()

    def test_zero_init_output_is_zero(self):
        # final_proj is zero-init (`model.py:478-479`) -> output exactly 0
        model = DiT(TINY)
        x, ctx, mask, t = _inputs(TINY)
        params = model.init(jax.random.key(1), x, ctx, mask, t)
        out = model.apply(params, x, ctx, mask, t)
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_mask_none_equals_full_mask(self):
        model = DiT(TINY)
        x, ctx, mask, t = _inputs(TINY)
        params = model.init(jax.random.key(2), x, ctx, mask, t)
        out_mask = model.apply(params, x, ctx, mask, t)
        out_none = model.apply(params, x, ctx, None, t)
        np.testing.assert_allclose(
            np.asarray(out_mask), np.asarray(out_none), atol=1e-6
        )

    def test_padding_tokens_ignored(self):
        # garbage in masked-out context positions must not change the output
        model = DiT(TINY)
        x, ctx, _, t = _inputs(TINY)
        mask = jnp.array([[1, 1, 1, 1, 0, 0, 0, 0]] * 2, jnp.bool_)
        params = model.init(jax.random.key(3), x, ctx, mask, t)
        # perturb the model so outputs are non-trivial
        params = jax.tree.map(
            lambda p: p + 0.02 * jnp.ones_like(p), params
        )
        out1 = model.apply(params, x, ctx, mask, t)
        ctx2 = ctx.at[:, 4:].set(1e3)
        out2 = model.apply(params, x, ctx2, mask, t)
        np.testing.assert_allclose(
            np.asarray(out1), np.asarray(out2), atol=1e-4
        )

    def test_timestep_changes_output(self):
        model = DiT(TINY)
        x, ctx, mask, t = _inputs(TINY)
        params = model.init(jax.random.key(4), x, ctx, mask, t)
        params = jax.tree.map(lambda p: p + 0.02 * jnp.ones_like(p), params)
        o1 = model.apply(params, x, ctx, mask, jnp.zeros_like(t))
        o2 = model.apply(params, x, ctx, mask, jnp.ones_like(t))
        assert float(jnp.abs(o1 - o2).max()) > 1e-6

    def test_non_square(self):
        model = DiT(TINY)
        x = jnp.ones((1, 8, 12, 16))
        ctx = jnp.ones((1, 8, 32))
        t = jnp.array([0.5])
        params = model.init(jax.random.key(5), x, ctx, None, t)
        out = model.apply(params, x, ctx, None, t)
        assert out.shape == (1, 8, 12, 16)


class TestVariants:
    def test_cross_attn_pattern_v1(self):
        cfg = DiTConfig(depth=16)
        has = [cfg.block_has_cross_attn(i) for i in range(16)]
        # idx % 4 == 0 or idx < 8  (`model.py:464`)
        expected = [i % 4 == 0 or i < 8 for i in range(16)]
        assert has == expected

    def test_param_structure_v1(self):
        model = DiT(TINY)
        x, ctx, mask, t = _inputs(TINY)
        params = model.init(jax.random.key(0), x, ctx, mask, t)["params"]
        # depth=3: blocks 0,1,2 all < first_n -> all cross-attn
        for i in range(3):
            assert "cross_attn" in params[f"blocks_{i}"]
        assert "adaLN_modulation" in params
        assert "final_modulation" in params
        # non-trainable final norm by default (train_bias_and_rms=False)
        assert "final_norm" not in params
        # no qkv bias by default
        assert "bias" not in params["blocks_0"]["self_attn"]["qkv"]

    def test_train_bias_and_rms(self):
        cfg = TINY.__class__(**{**TINY.__dict__, "train_bias_and_rms": True})
        model = DiT(cfg)
        x, ctx, mask, t = _inputs(cfg)
        params = model.init(jax.random.key(0), x, ctx, mask, t)["params"]
        assert "final_norm" in params
        assert "bias" in params["blocks_0"]["self_attn"]["qkv"]

    def test_v2_per_block_adaln(self):
        cfg = TINY.__class__(
            **{
                **TINY.__dict__,
                "adaln_mode": "per_block",
                "cross_attn_all": True,
            }
        )
        model = DiT(cfg)
        x, ctx, mask, t = _inputs(cfg)
        params = model.init(jax.random.key(0), x, ctx, mask, t)["params"]
        assert "adaLN_modulation" not in params
        for i in range(cfg.depth):
            assert f"blocks_{i}_adaLN" in params
            assert "cross_attn" in params[f"blocks_{i}"]
        out = model.apply({"params": params}, x, ctx, mask, t)
        assert out.shape == x.shape

    def test_residual_v(self):
        cfg = TINY.__class__(**{**TINY.__dict__, "residual_v": True})
        model = DiT(cfg)
        x, ctx, mask, t = _inputs(cfg)
        params = model.init(jax.random.key(0), x, ctx, mask, t)["params"]
        # block 0 has no lambda (it defines v_first); later blocks do
        assert "lambda_v" not in params["blocks_0"]["self_attn"]
        assert "lambda_v" in params["blocks_1"]["self_attn"]
        out = model.apply({"params": params}, x, ctx, mask, t)
        assert jnp.isfinite(out).all()

    def test_learned_pos_embed(self):
        cfg = TINY.__class__(**{**TINY.__dict__, "use_rope": False})
        model = DiT(cfg)
        x, ctx, mask, t = _inputs(cfg)
        params = model.init(jax.random.key(0), x, ctx, mask, t)["params"]
        assert "positional_embedding" in params
        out = model.apply({"params": params}, x, ctx, mask, t)
        assert out.shape == x.shape

    def test_bf16_forward(self):
        cfg = TINY.__class__(
            **{**TINY.__dict__, "dtype": jnp.bfloat16,
               "param_dtype": jnp.bfloat16}
        )
        model = DiT(cfg)
        x, ctx, mask, t = _inputs(cfg)
        params = model.init(jax.random.key(0), x, ctx, mask, t)
        out = model.apply(params, x.astype(jnp.bfloat16),
                          ctx.astype(jnp.bfloat16), mask, t)
        assert out.dtype == jnp.bfloat16
        assert jnp.isfinite(out.astype(jnp.float32)).all()


class TestGradients:
    def test_grad_flows(self):
        import flax.linen as nn

        model = DiT(TINY)
        x, ctx, mask, t = _inputs(TINY)
        params = nn.meta.unbox(model.init(jax.random.key(0), x, ctx, mask, t))

        def loss_fn(p):
            out = model.apply(p, x, ctx, mask, t)
            return jnp.mean((out - x) ** 2)

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree.leaves(g)
        assert all(jnp.isfinite(l).all() for l in leaves)
        # zero-init head means most grads are nonzero only through final_proj
        fp = g["params"]["final_proj"]
        assert float(jnp.abs(fp["kernel"]).max()) > 0

    def test_remat_matches(self):
        cfg = TINY.__class__(
            **{**TINY.__dict__, "gradient_checkpoint": True,
               "gradient_checkpoint_from": 1}
        )
        m1, m2 = DiT(TINY), DiT(cfg)
        x, ctx, mask, t = _inputs(TINY)
        params = m1.init(jax.random.key(0), x, ctx, mask, t)

        def loss(m):
            def f(p):
                return jnp.mean(m.apply(p, x, ctx, mask, t) ** 2)
            return f

        g1 = jax.grad(loss(m1))(params)
        g2 = jax.grad(loss(m2))(params)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestNonPrefixContextMask:
    def test_holey_mask_equals_manual_compaction(self):
        """DiT canonicalizes arbitrary context masks to prefix form
        (ops/attention.compact_context) — a holey mask must match running
        with the real tokens pre-compacted."""
        import numpy as np

        from f_lite_tpu.models.dit import DiT, DiTConfig

        cfg = DiTConfig(
            in_channels=16, patch_size=2, hidden_size=64, depth=2,
            num_heads=4, mlp_ratio=2.0, cross_attn_input_size=32,
            use_pallas_attention=False,
        )
        model = DiT(cfg)
        params = model.init_params(jax.random.key(0), text_len=8,
                                   image_size=16)
        params = jax.tree.map(lambda p: p + 0.05, params)
        rs = np.random.RandomState(3)
        x = jnp.asarray(rs.randn(2, 16, 16, 16).astype(np.float32))
        ctx = jnp.asarray(rs.randn(2, 8, 32).astype(np.float32))
        t = jnp.full((2,), 0.5)
        holey = jnp.asarray([
            [True, False, True, True, False, False, True, False],
            [False, True, True, False, True, True, True, True],
        ])
        out_holey = model.apply(params, x, ctx, holey, t)

        from f_lite_tpu.ops.attention import compact_context

        ctx2, mask2 = compact_context(ctx, holey)
        out_prefix = model.apply(params, x, ctx2, mask2, t)
        np.testing.assert_allclose(
            np.asarray(out_holey), np.asarray(out_prefix),
            atol=1e-6, rtol=1e-6,
        )
