"""Multi-chip sharding tests on the virtual 8-device CPU mesh:
fsdp / tp / dp x fsdp (HSDP) param placement, sharded train step, and
sharded inference — the distributed-test story the reference lacks
(SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from f_lite_tpu.models.dit import DiT, DiTConfig
from f_lite_tpu.parallel import (
    batch_sharding,
    create_mesh,
    infer_param_shardings,
    shard_params,
)
from f_lite_tpu.train.optim import build_optimizer
from f_lite_tpu.train.step import init_train_state, make_train_step

CFG = DiTConfig(
    in_channels=16, patch_size=2, hidden_size=128, depth=2, num_heads=4,
    mlp_ratio=2.0, cross_attn_input_size=64, use_pallas_attention=False,
)


def _init_boxed(cfg):
    model = DiT(cfg)
    x = jnp.zeros((1, 16, 16, cfg.in_channels))
    ctx = jnp.zeros((1, 8, cfg.cross_attn_input_size))
    mask = jnp.ones((1, 8), jnp.bool_)
    t = jnp.zeros((1,))
    return model, lambda: model.init(jax.random.key(0), x, ctx, mask, t)


def _materialize(model, cfg):
    import flax.linen as nn

    return nn.meta.unbox(
        model.init(
            jax.random.key(0),
            jnp.zeros((1, 16, 16, cfg.in_channels)),
            jnp.zeros((1, 8, cfg.cross_attn_input_size)),
            jnp.ones((1, 8), jnp.bool_),
            jnp.zeros((1,)),
        )
    )


class TestParamSharding:
    def test_fsdp_shards_embed_dim(self):
        mesh = create_mesh(dp=1, fsdp=8, tp=1)
        model, init_fn = _init_boxed(CFG)
        sh = infer_param_shardings(init_fn, mesh)
        # head-aligned qkv kernel (in, 3, H, D): in-dim on fsdp, H on tp
        qkv = sh["params"]["blocks_0"]["self_attn"]["qkv"]["kernel"]
        assert qkv.spec == P("fsdp", None, "tp", None)
        reg = sh["params"]["register_tokens"]
        assert reg.spec == P(None, None, "fsdp")

    def test_tp_shards_heads(self):
        mesh = create_mesh(dp=1, fsdp=2, tp=4)
        model, init_fn = _init_boxed(CFG)
        sh = infer_param_shardings(init_fn, mesh)
        # column-parallel qkv (per head), row-parallel proj
        assert sh["params"]["blocks_0"]["self_attn"]["qkv"]["kernel"].spec \
            == P("fsdp", None, "tp", None)
        assert sh["params"]["blocks_0"]["self_attn"]["proj"]["kernel"].spec \
            == P("tp", "fsdp")
        assert sh["params"]["blocks_0"]["mlp"]["down_proj"]["kernel"].spec \
            == P("tp", "fsdp")

    def test_placement_and_forward_parity(self):
        # sharded forward must equal single-device forward
        mesh = create_mesh(dp=1, fsdp=2, tp=4)
        model, init_fn = _init_boxed(CFG)
        sh = infer_param_shardings(init_fn, mesh)
        params = _materialize(model, CFG)
        params = jax.tree.map(lambda p: p + 0.02, params)
        sharded = shard_params(params, sh)

        x = jax.random.normal(jax.random.key(1), (4, 16, 16, 16))
        ctx = jax.random.normal(jax.random.key(2), (4, 8, 64))
        mask = jnp.ones((4, 8), jnp.bool_)
        t = jnp.full((4,), 0.5)

        ref = model.apply(params, x, ctx, mask, t)
        xb = jax.device_put(x, batch_sharding(mesh))
        got = jax.jit(model.apply)(sharded, xb, ctx, mask, t)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
        )


class TestShardedTrainStep:
    @pytest.mark.parametrize("dp,fsdp,tp", [(1, 8, 1), (2, 2, 2), (2, 4, 1)])
    def test_step_runs_and_stays_sharded(self, dp, fsdp, tp):
        mesh = create_mesh(dp=dp, fsdp=fsdp, tp=tp)
        model, init_fn = _init_boxed(CFG)
        sh = infer_param_shardings(init_fn, mesh)
        params = shard_params(_materialize(model, CFG), sh)

        opt = build_optimizer(learning_rate=1e-4, max_steps=10)
        state = init_train_state(params, opt)
        step = make_train_step(model.apply, opt, donate=False)

        bs = batch_sharding(mesh)
        latents = jax.device_put(
            jax.random.normal(jax.random.key(3), (8, 16, 16, 16)), bs
        )
        ctx = jax.device_put(
            jax.random.normal(jax.random.key(4), (8, 8, 64)), bs
        )
        mask = jax.device_put(jnp.ones((8, 8), jnp.bool_), bs)

        state2, loss, metrics = step(
            state, jax.random.key(5), latents, ctx, mask
        )
        assert np.isfinite(float(loss))
        assert float(metrics["grad_norm"]) > 0
        # params keep their sharding through the step
        qkv_after = state2.params["params"]["blocks_0"]["self_attn"]["qkv"][
            "kernel"
        ]
        expected = sh["params"]["blocks_0"]["self_attn"]["qkv"]["kernel"]
        assert qkv_after.sharding.is_equivalent_to(expected, qkv_after.ndim)
        assert int(state2.step) == 1

    def test_loss_matches_unsharded(self):
        mesh = create_mesh(dp=1, fsdp=8, tp=1)
        model, init_fn = _init_boxed(CFG)
        sh = infer_param_shardings(init_fn, mesh)
        params = _materialize(model, CFG)
        opt = build_optimizer(learning_rate=0.0, max_steps=10)

        latents = jax.random.normal(jax.random.key(3), (8, 16, 16, 16))
        ctx = jax.random.normal(jax.random.key(4), (8, 8, 64))
        mask = jnp.ones((8, 8), jnp.bool_)
        rng = jax.random.key(6)

        step = make_train_step(model.apply, opt, donate=False,
                               uncond_prob=0.0)
        _, loss_ref, _ = step(init_train_state(params, opt), rng, latents,
                              ctx, mask)
        sharded = shard_params(params, sh)
        bs = batch_sharding(mesh)
        _, loss_sh, _ = step(
            init_train_state(sharded, opt), rng,
            jax.device_put(latents, bs), jax.device_put(ctx, bs),
            jax.device_put(mask, bs),
        )
        np.testing.assert_allclose(
            float(loss_ref), float(loss_sh), rtol=1e-5
        )
