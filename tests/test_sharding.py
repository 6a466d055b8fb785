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

# compile-heavy (virtual-mesh XLA compiles / live servers): run in the
# full tier only; `pytest -m "not slow"` is the fast development tier
pytestmark = pytest.mark.slow

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
        self._loss_parity(rules=None)

    def test_loss_matches_unsharded_sequence_parallel(self):
        from f_lite_tpu.parallel.mesh import SP_RULES

        self._loss_parity(rules=SP_RULES, tp=4)

    def _loss_parity(self, rules, tp=1):
        from f_lite_tpu.parallel.mesh import mesh_rules

        mesh = create_mesh(dp=1, fsdp=8 // tp, tp=tp)
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
        import contextlib

        ctx_mgr = (mesh_rules(mesh, rules) if rules is not None
                   else contextlib.nullcontext())
        with ctx_mgr:
            _, loss_sh, _ = step(
                init_train_state(sharded, opt), rng,
                jax.device_put(latents, bs), jax.device_put(ctx, bs),
                jax.device_put(mask, bs),
            )
        np.testing.assert_allclose(
            float(loss_ref), float(loss_sh), rtol=1e-5
        )


class TestSequenceParallel:
    """Megatron SP (`parallel.mesh.SP_RULES`): the residual stream is
    sequence-sharded over tp between blocks. Exactness: attention/matmul
    math is unchanged — only activation layout moves — so outputs must be
    bit-comparable to the replicated-stream default."""

    def _forward(self, rules, tp, dp=2):
        from f_lite_tpu.parallel.mesh import mesh_rules

        mesh = create_mesh(dp=dp, fsdp=1, tp=tp,
                           devices=jax.devices()[: dp * tp])
        model, init_fn = _init_boxed(CFG)
        params = _materialize(model, CFG)
        x = jax.random.normal(jax.random.key(1), (4, 16, 16, 16))
        ctx = jax.random.normal(jax.random.key(2), (4, 8, 64))
        mask = jnp.ones((4, 8), jnp.bool_)
        t = jnp.full((4,), 0.5)
        with mesh_rules(mesh, rules):
            out = jax.jit(model.apply)(params, x, ctx, mask, t)
        return np.asarray(out)

    @pytest.mark.parametrize("tp", [2, 4])
    def test_forward_matches_default_rules(self, tp):
        from f_lite_tpu.parallel.mesh import LOGICAL_RULES, SP_RULES

        base = self._forward(LOGICAL_RULES, tp)
        sp = self._forward(SP_RULES, tp)
        np.testing.assert_array_equal(sp, base)

    def test_residual_stream_is_sequence_sharded(self):
        # the lowered module must carry seq-dim tp constraints on the
        # (B, L, D) residual stream; the compiled module must keep every
        # collective on tp-only groups (no dp/fsdp traffic) and run the
        # blocks' RMSNorms on L/tp shards
        import re

        from f_lite_tpu.parallel.mesh import SP_RULES, mesh_rules

        mesh = create_mesh(dp=1, fsdp=1, tp=8)
        model, _ = _init_boxed(CFG)
        params = _materialize(model, CFG)
        x = jnp.zeros((1, 16, 16, 16))
        ctx = jnp.zeros((1, 8, 64))
        mask = jnp.ones((1, 8), jnp.bool_)
        t = jnp.zeros((1,))
        with mesh_rules(mesh, SP_RULES):
            lowered = jax.jit(model.apply).lower(params, x, ctx, mask, t)
            compiled = lowered.compile()
        # 16x16 latents, patch 2 -> 64 patches + 16 registers = 80 tokens
        assert re.search(
            r'sharding_constraint[^\n]*\{"tp"\}, \{\}\]>'
            r" : tensor<1x80x128x", lowered.as_text()
        ), "lowered module lost the seq-dim tp constraint"
        hlo = compiled.as_text()
        # RMSNorm reductions on the sharded stream: 80/8 = 10 rows/device
        assert re.search(r"f32\[1,10\]\{1,0\} rsqrt", hlo)
