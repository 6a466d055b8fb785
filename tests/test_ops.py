"""Unit tests for the math core against independently computed golden values.

Oracles here are written directly from the formulas (numpy/math), not from
either implementation, per SURVEY.md §4's test strategy.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f_lite_tpu.ops import (
    apg_combine,
    apply_rotary,
    cfg_combine,
    euler_timestep_pairs,
    patchify,
    qk_norm,
    resolution_alpha,
    rms_norm,
    rope_2d_freqs,
    sample_train_timesteps,
    shift_t,
    timestep_embedding,
    unpatchify,
)


class TestTimestepEmbedding:
    def test_golden(self):
        t = jnp.array([0.25, 1.0])
        dim = 8
        emb = timestep_embedding(t * 1000, dim)
        # independent numpy oracle
        half = dim // 2
        freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
        args = np.array([250.0, 1000.0])[:, None] * freqs[None]
        expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
        # fp32 trig of large args (t*1000) has ~1e-4 arg-reduction error
        np.testing.assert_allclose(np.asarray(emb), expected, atol=2e-4)

    def test_shape_dtype(self):
        emb = timestep_embedding(jnp.ones((4,)), 512)
        assert emb.shape == (4, 512)
        assert emb.dtype == jnp.float32


class TestShiftMap:
    def test_alpha_1024(self):
        # 1024x1024 image -> 128x128 latent -> alpha = 2*sqrt(128*128/4096) = 4
        assert resolution_alpha(128 * 128) == pytest.approx(4.0)

    def test_alpha_512(self):
        assert resolution_alpha(64 * 64) == pytest.approx(2.0)

    def test_shift_endpoints(self):
        for a in (0.5, 1.0, 2.0, 4.0):
            assert shift_t(0.0, a) == pytest.approx(0.0)
            assert shift_t(1.0, a) == pytest.approx(1.0)

    def test_shift_value(self):
        # t=0.5, a=4: 0.5*4 / (1 + 3*0.5) = 2/2.5 = 0.8
        assert shift_t(0.5, 4.0) == pytest.approx(0.8)

    def test_euler_pairs(self):
        pairs = euler_timestep_pairs(4, 2.0)
        assert pairs.shape == (4, 2)
        # first pair: t = shift(1) = 1, t_next = shift(0.75)
        assert float(pairs[0, 0]) == pytest.approx(1.0)
        assert float(pairs[0, 1]) == pytest.approx(
            0.75 * 2 / (1 + 1 * 0.75), rel=1e-6
        )
        # last pair ends at 0
        assert float(pairs[-1, 1]) == pytest.approx(0.0)
        # consecutive: t_next of step i == t of step i+1
        np.testing.assert_allclose(pairs[:-1, 1], pairs[1:, 0], rtol=1e-6)


class TestTrainTimesteps:
    def test_distribution(self):
        rng = jax.random.key(0)
        t = sample_train_timesteps(rng, 50_000, 64 * 64)
        t = np.asarray(t)
        assert ((t >= 0) & (t <= 1)).all()
        # alpha=2 shifts mass toward 1: E[shift(sigmoid(z), 2)] ~ 0.63
        # with a 10% uniform floor. Mean must land clearly above 0.5.
        assert 0.55 < t.mean() < 0.68
        # uniform mix guarantees low-t coverage
        assert (t < 0.1).mean() > 0.01


class TestRMSNorm:
    def test_golden(self):
        x = np.random.RandomState(0).randn(3, 5).astype(np.float32)
        got = np.asarray(rms_norm(jnp.asarray(x)))
        expected = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6)
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_weight(self):
        x = np.random.RandomState(1).randn(2, 4).astype(np.float32)
        w = np.array([1.0, 2.0, 0.5, -1.0], np.float32)
        got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w)))
        expected = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6) * w
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_bf16_roundtrip_fp32_accum(self):
        x = (np.random.RandomState(2).randn(4, 8) * 100).astype(np.float32)
        xb = jnp.asarray(x, dtype=jnp.bfloat16)
        got = rms_norm(xb)
        assert got.dtype == jnp.bfloat16
        expected = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6)
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            expected.astype(np.float32),
            rtol=0.05, atol=0.05,
        )

    def test_qk_norm_independent(self):
        q = jnp.asarray(np.random.RandomState(3).randn(2, 3, 4), jnp.float32)
        k = q * 7.0  # scale-invariance of RMS norm
        qn, kn = qk_norm(q, k)
        np.testing.assert_allclose(np.asarray(qn), np.asarray(kn), rtol=1e-4)


class TestRope:
    def test_shapes(self):
        cos, sin = rope_2d_freqs(64, 4, 6, n_register_tokens=16)
        assert cos.shape == (16 + 24, 32)
        assert sin.shape == (16 + 24, 32)

    def test_register_identity(self):
        cos, sin = rope_2d_freqs(64, 2, 2, n_register_tokens=3)
        np.testing.assert_array_equal(np.asarray(cos[:3]), 1.0)
        np.testing.assert_array_equal(np.asarray(sin[:3]), 0.0)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 7, 64), jnp.float32)
        y = apply_rotary(x, cos, sin)
        # register tokens unrotated
        np.testing.assert_allclose(
            np.asarray(y[:, :3]), np.asarray(x[:, :3]), rtol=1e-6
        )

    def test_golden_position(self):
        # head_dim=8 -> axis dim=4 -> inv_freq over i in {0, 2}: [1, b^-0.5]
        base = 10000.0
        cos, sin = rope_2d_freqs(8, 3, 5, base=base)
        dim = 4
        inv = np.array([1.0 / base ** (i / dim) for i in (0, 2)])
        # token at grid (r, c) = (2, 3), flattened idx = 2*5 + 3 = 13
        expected_freqs = np.concatenate([2 * inv, 3 * inv])
        np.testing.assert_allclose(
            np.asarray(cos[13]), np.cos(expected_freqs), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(sin[13]), np.sin(expected_freqs), rtol=1e-5
        )

    def test_rotation_is_norm_preserving(self):
        cos, sin = rope_2d_freqs(32, 4, 4)
        x = jnp.asarray(np.random.RandomState(1).randn(2, 16, 32), jnp.float32)
        y = apply_rotary(x, cos, sin)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(y), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-5,
        )


class TestGuidance:
    def test_cfg(self):
        u = jnp.array([1.0, 2.0])
        c = jnp.array([3.0, 0.0])
        np.testing.assert_allclose(
            np.asarray(cfg_combine(u, c, 6.0)), [1 + 6 * 2, 2 + 6 * (-2)]
        )

    def test_cfg_scale_one_is_cond(self):
        u = jnp.array([5.0])
        c = jnp.array([-1.0])
        np.testing.assert_allclose(np.asarray(cfg_combine(u, c, 1.0)), [-1.0])

    def test_apg_golden(self):
        rs = np.random.RandomState(0)
        c = rs.randn(2, 4, 4, 3).astype(np.float32)
        u = rs.randn(2, 4, 4, 3).astype(np.float32)
        g, thr = 6.0, 0.03
        dy, dd = c, c - u
        par = (dy * dd).sum() / (dy * dy).sum() * dy
        orth = dd - par
        scale = min(1.0, thr / orth.std())
        expected = dy + (g - 1) * orth * scale
        got = np.asarray(apg_combine(jnp.asarray(u), jnp.asarray(c), g, thr))
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_apg_parallel_only_returns_cond(self):
        # if (c - u) is exactly parallel to c, APG output == c
        c = jnp.asarray(np.random.RandomState(1).randn(8), jnp.float32)
        u = 0.5 * c  # dd = 0.5 c, fully parallel
        got = np.asarray(apg_combine(u, c, 6.0))
        np.testing.assert_allclose(got, np.asarray(c), atol=1e-5)


class TestPatching:
    def test_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 12, 16), jnp.float32)
        tok = patchify(x, 2)
        assert tok.shape == (2, 4 * 6, 4 * 16)
        back = unpatchify(tok, 4, 6, 2, 16)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_ordering_matches_torch_rearrange(self):
        # compare against einops on a torch-layout tensor:
        # "b c (h p1) (w p2) -> b (h w) (p1 p2 c)"
        import einops

        x_nchw = np.random.RandomState(1).randn(1, 3, 4, 6).astype(np.float32)
        expected = einops.rearrange(
            x_nchw, "b c (h p1) (w p2) -> b (h w) (p1 p2 c)", p1=2, p2=2
        )
        x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1))
        got = np.asarray(patchify(jnp.asarray(x_nhwc), 2))
        np.testing.assert_array_equal(got, expected)
