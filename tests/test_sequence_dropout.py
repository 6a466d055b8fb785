"""Sequence dropout (tech report p.5): token-subset forward + loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f_lite_tpu.models.dit import DiT, DiTConfig
from f_lite_tpu.ops.patching import patchify
from f_lite_tpu.train.loss import flow_matching_loss

CFG = DiTConfig(
    in_channels=16, patch_size=2, hidden_size=64, depth=3, num_heads=4,
    mlp_ratio=2.0, cross_attn_input_size=32, use_pallas_attention=False,
)


def _setup(cfg=CFG, seed=0):
    model = DiT(cfg)
    params = model.init_params(jax.random.key(seed), text_len=8,
                               image_size=16)
    params = jax.tree.map(lambda p: p + 0.02, params)
    ks = jax.random.split(jax.random.key(seed + 1), 3)
    x = jax.random.normal(ks[0], (2, 16, 16, 16))
    ctx = jax.random.normal(ks[1], (2, 8, 32))
    mask = jnp.ones((2, 8), jnp.bool_)
    t = jnp.full((2,), 0.4)
    return model, params, x, ctx, mask, t


class TestTokenSubsetForward:
    def test_full_indices_match_dense(self):
        model, params, x, ctx, mask, t = _setup()
        full = model.apply(params, x, ctx, mask, t)
        n = (16 // 2) ** 2
        idx = jnp.broadcast_to(jnp.arange(n)[None, :], (2, n))
        tok = model.apply(params, x, ctx, mask, t, idx)
        np.testing.assert_allclose(
            np.asarray(tok), np.asarray(patchify(full, 2)),
            atol=1e-5, rtol=1e-5,
        )

    def test_permutation_equivariance(self):
        # attention + gathered rope are permutation-equivariant in tokens
        model, params, x, ctx, mask, t = _setup(seed=2)
        n = 64
        perm = jax.random.permutation(jax.random.key(5), n)
        idx_sorted = jnp.broadcast_to(jnp.arange(n)[None, :], (2, n))
        idx_perm = jnp.broadcast_to(perm[None, :], (2, n))
        out_sorted = model.apply(params, x, ctx, mask, t, idx_sorted)
        out_perm = model.apply(params, x, ctx, mask, t, idx_perm)
        np.testing.assert_allclose(
            np.asarray(out_perm),
            np.asarray(out_sorted[:, perm]),
            atol=1e-5, rtol=1e-5,
        )

    def test_subset_shape(self):
        model, params, x, ctx, mask, t = _setup(seed=3)
        idx = jnp.stack([jnp.arange(10), jnp.arange(20, 30)])
        out = model.apply(params, x, ctx, mask, t, idx)
        assert out.shape == (2, 10, 2 * 2 * 16)

    def test_scan_layers_subset(self):
        import dataclasses

        cfg = DiTConfig(**{**dataclasses.asdict(CFG), "depth": 4,
                           "cross_attn_first_n": 2, "cross_attn_period": 2,
                           "scan_layers": True})
        model, params, x, ctx, mask, t = _setup(cfg, seed=4)
        idx = jnp.broadcast_to(jnp.arange(32)[None, :], (2, 32))
        out = model.apply(params, x, ctx, mask, t, idx)
        assert out.shape == (2, 32, 64)
        assert np.isfinite(np.asarray(out)).all()


class TestLossWithDropout:
    def test_runs_and_matches_count(self):
        model, params, x, ctx, mask, t = _setup(seed=5)
        loss, aux = flow_matching_loss(
            model.apply, params, jax.random.key(6), x, ctx, mask,
            uncond_prob=0.0, token_keep_ratio=0.5,
        )
        assert np.isfinite(float(loss))

    def test_keep_all_equals_dense_loss(self):
        model, params, x, ctx, mask, t = _setup(seed=6)
        noise = jax.random.normal(jax.random.key(9), x.shape)
        kw = dict(uncond_prob=0.0, timesteps=t, noise=noise)
        l1, _ = flow_matching_loss(
            model.apply, params, jax.random.key(7), x, ctx, mask,
            token_keep_ratio=1.0, **kw,
        )
        l2, _ = flow_matching_loss(
            model.apply, params, jax.random.key(7), x, ctx, mask, **kw,
        )
        assert float(l1) == pytest.approx(float(l2), rel=1e-6)

    def test_grads_flow_through_dropout(self):
        model, params, x, ctx, mask, t = _setup(seed=7)

        def loss_fn(p):
            l, _ = flow_matching_loss(
                model.apply, p, jax.random.key(8), x, ctx, mask,
                uncond_prob=0.0, token_keep_ratio=0.25,
            )
            return l

        g = jax.grad(loss_fn)(params)
        assert all(
            np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g)
        )
