"""Training-core tests: flow-matching loss semantics, schedules, train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f_lite_tpu.models.dit import DiT, DiTConfig
from f_lite_tpu.train.loss import flow_matching_loss
from f_lite_tpu.train.optim import build_lr_schedule, build_optimizer
from f_lite_tpu.train.step import (
    TrainState,
    init_train_state,
    make_train_step,
)

CFG = DiTConfig(
    in_channels=16, patch_size=2, hidden_size=64, depth=2, num_heads=4,
    mlp_ratio=2.0, cross_attn_input_size=32, use_pallas_attention=False,
)


def _setup(seed=0):
    model = DiT(CFG)
    params = model.init_params(jax.random.key(seed), text_len=8,
                               image_size=16)
    ks = jax.random.split(jax.random.key(seed + 1), 3)
    latents = jax.random.normal(ks[0], (4, 16, 16, 16))
    ctx = jax.random.normal(ks[1], (4, 8, 32))
    mask = jnp.ones((4, 8), jnp.bool_)
    return model, params, latents, ctx, mask


class TestLoss:
    def test_zero_model_loss_equals_target_norm(self):
        # zero-init head predicts v=0, so loss == mean |x - n|^2 in token
        # space with injected t/noise — checkable in closed form
        model, params, latents, ctx, mask = _setup()
        t = jnp.full((4,), 0.3)
        noise = jax.random.normal(jax.random.key(9), latents.shape)
        loss, aux = flow_matching_loss(
            model.apply, params, jax.random.key(1), latents, ctx, mask,
            uncond_prob=0.0, timesteps=t, noise=noise,
        )
        expected = float(jnp.mean((latents - noise) ** 2))
        assert float(loss) == pytest.approx(expected, rel=1e-5)

    def test_binning_partitions_batch(self):
        model, params, latents, ctx, mask = _setup()
        t = jnp.array([0.05, 0.15, 0.95, 0.999])
        loss, aux = flow_matching_loss(
            model.apply, params, jax.random.key(1), latents, ctx, mask,
            uncond_prob=0.0, timesteps=t,
        )
        counts = np.asarray(aux.bin_counts)
        assert counts[0] == 1 and counts[1] == 1 and counts[9] == 2
        assert counts.sum() == 4
        np.testing.assert_allclose(
            np.asarray(aux.bin_sums).sum(),
            np.asarray(aux.per_sample_loss).sum(), rtol=1e-5,
        )

    def test_uncond_dropout_zeroes_context(self):
        # with uncond_prob=1 every caption drops; loss must equal the loss
        # computed with explicitly zeroed context
        model, params, latents, ctx, mask = _setup()
        params = jax.tree.map(lambda p: p + 0.02, params)
        t = jnp.full((4,), 0.5)
        noise = jax.random.normal(jax.random.key(5), latents.shape)
        rng = jax.random.key(2)
        l1, _ = flow_matching_loss(
            model.apply, params, rng, latents, ctx, mask,
            uncond_prob=1.0, timesteps=t, noise=noise,
        )
        l2, _ = flow_matching_loss(
            model.apply, params, rng, latents, jnp.zeros_like(ctx),
            jnp.ones_like(mask), uncond_prob=0.0, timesteps=t, noise=noise,
        )
        assert float(l1) == pytest.approx(float(l2), rel=1e-6)


class TestSchedules:
    def test_warmup_then_peak(self):
        s = build_lr_schedule("linear", 1e-3, num_warmup_steps=10,
                              max_steps=100)
        assert float(s(0)) == pytest.approx(0.0)
        assert float(s(10)) == pytest.approx(1e-3, rel=1e-6)
        assert float(s(100)) == pytest.approx(0.0, abs=1e-7)

    def test_cosine(self):
        s = build_lr_schedule("cosine", 1e-3, num_warmup_steps=0,
                              max_steps=100)
        assert float(s(0)) == pytest.approx(1e-3)
        assert float(s(50)) == pytest.approx(5e-4, rel=1e-3)

    def test_wsd(self):
        s = build_lr_schedule("wsd", 1e-3, num_warmup_steps=10,
                              max_steps=100)
        # stable segment holds peak; decay kicks in at the last 10%
        assert float(s(50)) == pytest.approx(1e-3, rel=1e-6)
        assert float(s(89)) == pytest.approx(1e-3, rel=1e-6)
        assert float(s(100)) < 2e-4

    def test_constant(self):
        s = build_lr_schedule("constant", 1e-3, num_warmup_steps=5,
                              max_steps=100)
        assert float(s(50)) == pytest.approx(1e-3)
        assert float(s(1000)) == pytest.approx(1e-3)


class TestTrainStep:
    def test_loss_decreases(self):
        model, params, latents, ctx, mask = _setup()
        opt = build_optimizer(learning_rate=1e-3, lr_scheduler="constant",
                              max_steps=100)
        state = init_train_state(params, opt)
        step = make_train_step(model.apply, opt, donate=False,
                               uncond_prob=0.0)
        rng = jax.random.key(0)
        losses = []
        for i in range(8):
            # same batch, same rng -> same noise/t: loss must fall
            state, loss, _ = step(state, rng, latents, ctx, mask)
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_grad_clipping_bounds_norm(self):
        model, params, latents, ctx, mask = _setup()
        opt = build_optimizer(learning_rate=1e-3, max_steps=10,
                              max_grad_norm=1e-8)
        state = init_train_state(params, opt)
        step = make_train_step(model.apply, opt, donate=False)
        state2, _, m = step(state, jax.random.key(1), latents, ctx, mask)
        # params barely move under an extreme clip
        d = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.params, state2.params,
        )
        # adamw normalizes, but clipped grads keep update ~lr-sized
        assert max(jax.tree.leaves(d)) < 0.01


class TestBsRampup:
    def test_weighted_loss_equals_subset_loss(self):
        """bs_rampup is implemented as 0/1 loss weights over a static
        batch; must equal computing the loss on the kept subset."""
        from f_lite_tpu.models.dit import DiT, DiTConfig
        from f_lite_tpu.train.loss import flow_matching_loss

        cfg = DiTConfig(
            in_channels=16, patch_size=2, hidden_size=64, depth=2,
            num_heads=4, mlp_ratio=2.0, cross_attn_input_size=32,
            use_pallas_attention=False,
        )
        model = DiT(cfg)
        params = model.init_params(jax.random.key(0), text_len=8,
                                   image_size=16)
        params = jax.tree.map(lambda p: p + 0.03, params)
        ks = jax.random.split(jax.random.key(1), 4)
        b = 4
        latents = jax.random.normal(ks[0], (b, 16, 16, 16))
        ctx = jax.random.normal(ks[1], (b, 8, 32))
        mask = jnp.ones((b, 8), jnp.bool_)
        t = jax.random.uniform(ks[2], (b,))
        noise = jax.random.normal(ks[3], latents.shape)

        w = jnp.asarray([1.0, 0.0, 1.0, 0.0])
        loss_w, aux_w = flow_matching_loss(
            model.apply, params, jax.random.key(2), latents, ctx, mask,
            uncond_prob=0.0, timesteps=t, noise=noise, sample_weight=w,
        )
        keep = jnp.asarray([0, 2])
        loss_s, _ = flow_matching_loss(
            model.apply, params, jax.random.key(2),
            latents[keep], ctx[keep], mask[keep],
            uncond_prob=0.0, timesteps=t[keep], noise=noise[keep],
        )
        assert float(loss_w) == pytest.approx(float(loss_s), rel=1e-6)
        # dropped samples don't pollute the bins either
        assert float(aux_w.bin_counts.sum()) == 2.0
