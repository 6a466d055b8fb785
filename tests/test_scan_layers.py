"""scan_layers: scanned layer stacks must match the unrolled layout
bit-for-bit (same torch state dict through both), incl. v2 and sharding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f_lite_tpu.convert import convert_dit_state_dict
from f_lite_tpu.models.dit import DiT, DiTConfig
from torch_oracle import make_random_state_dict

BASE = dict(
    in_channels=16, patch_size=2, hidden_size=64, depth=10, num_heads=4,
    mlp_ratio=2.0, cross_attn_input_size=48, cross_attn_first_n=2,
    cross_attn_period=4, use_pallas_attention=False,
)


def _variant(cfg, **kw):
    return DiTConfig(**{**dataclasses.asdict(cfg), **kw})


def _inputs(cfg, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    x = jax.random.normal(ks[0], (2, 16, 16, cfg.in_channels))
    ctx = jax.random.normal(ks[1], (2, 8, cfg.cross_attn_input_size))
    mask = jnp.ones((2, 8), jnp.bool_)
    t = jax.random.uniform(ks[2], (2,))
    return x, ctx, mask, t


class TestScanParity:
    @pytest.mark.parametrize("variant_kw", [
        {},                                            # v1 pattern
        {"adaln_mode": "per_block", "cross_attn_all": True},  # v2
        {"cross_attn_all": True},                      # shared + all
    ])
    def test_matches_unrolled(self, variant_kw):
        cfg_u = DiTConfig(**BASE, **variant_kw)
        cfg_s = _variant(cfg_u, scan_layers=True)
        sd = make_random_state_dict(cfg_u, seed=1)
        np_sd = {k: v.numpy() for k, v in sd.items()}

        p_u = convert_dit_state_dict(np_sd, cfg_u)
        p_s = convert_dit_state_dict(np_sd, cfg_s)

        x, ctx, mask, t = _inputs(cfg_u)
        out_u = DiT(cfg_u).apply(jax.tree.map(jnp.asarray, p_u),
                                 x, ctx, mask, t)
        out_s = DiT(cfg_s).apply(jax.tree.map(jnp.asarray, p_s),
                                 x, ctx, mask, t)
        np.testing.assert_allclose(
            np.asarray(out_s), np.asarray(out_u), atol=1e-5, rtol=1e-5
        )

    def test_init_structure_matches_converted(self):
        cfg = DiTConfig(**BASE, scan_layers=True)
        sd = make_random_state_dict(DiTConfig(**BASE), seed=2)
        conv = convert_dit_state_dict(
            {k: v.numpy() for k, v in sd.items()}, cfg
        )
        init = DiT(cfg).init_params(jax.random.key(0), text_len=8,
                                    image_size=16)

        def paths(tree):
            flat = jax.tree_util.tree_flatten_with_path(tree)[0]
            return {
                jax.tree_util.keystr(p): tuple(np.shape(v))
                for p, v in flat
            }

        assert paths(conv) == paths(init)

    def test_leading_layer_axis(self):
        cfg = DiTConfig(**BASE, scan_layers=True)
        p = DiT(cfg).init_params(jax.random.key(0), text_len=8,
                                 image_size=16)["params"]
        qkv_front = p["blocks_front"]["blk_0"]["self_attn"]["qkv"]["kernel"]
        assert qkv_front.shape[0] == 2  # first_n
        qkv_rest = p["blocks_rest"]["blk_0"]["self_attn"]["qkv"]["kernel"]
        assert qkv_rest.shape[0] == 2  # (10-2)/4 units
        assert "cross_attn" not in p["blocks_rest"]["blk_1"]

    def test_residual_v_scan_matches_unrolled(self):
        # released-model architecture: v_first carried through the scan
        cfg_u = DiTConfig(**BASE, residual_v=True)
        cfg_s = _variant(cfg_u, scan_layers=True)
        sd = make_random_state_dict(cfg_u, seed=7)
        np_sd = {k: v.numpy() for k, v in sd.items()}
        p_u = convert_dit_state_dict(np_sd, cfg_u)
        p_s = convert_dit_state_dict(np_sd, cfg_s)
        x, ctx, mask, t = _inputs(cfg_u, seed=8)
        out_u = DiT(cfg_u).apply(jax.tree.map(jnp.asarray, p_u),
                                 x, ctx, mask, t)
        out_s = DiT(cfg_s).apply(jax.tree.map(jnp.asarray, p_s),
                                 x, ctx, mask, t)
        np.testing.assert_allclose(
            np.asarray(out_s), np.asarray(out_u), atol=1e-5, rtol=1e-5
        )

    def test_grads_match_unrolled(self):
        cfg_u = DiTConfig(**BASE)
        cfg_s = _variant(cfg_u, scan_layers=True, gradient_checkpoint=True)
        sd = make_random_state_dict(cfg_u, seed=3)
        np_sd = {k: v.numpy() for k, v in sd.items()}
        p_u = jax.tree.map(jnp.asarray, convert_dit_state_dict(np_sd, cfg_u))
        p_s = jax.tree.map(
            jnp.asarray, convert_dit_state_dict(np_sd, cfg_s)
        )
        x, ctx, mask, t = _inputs(cfg_u, seed=4)

        def loss(model, p):
            return jnp.mean(model.apply(p, x, ctx, mask, t) ** 2)

        g_u = jax.grad(lambda p: loss(DiT(cfg_u), p))(p_u)
        g_s = jax.grad(lambda p: loss(DiT(cfg_s), p))(p_s)
        # compare a front-block and a rest-block leaf
        a = g_u["params"]["blocks_0"]["self_attn"]["qkv"]["kernel"]
        b = g_s["params"]["blocks_front"]["blk_0"]["self_attn"]["qkv"][
            "kernel"][0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
        a = g_u["params"]["blocks_3"]["mlp"]["down_proj"]["kernel"]
        b = g_s["params"]["blocks_rest"]["blk_1"]["mlp"]["down_proj"][
            "kernel"][0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


class TestScanSharding:
    def test_sharded_scan_forward(self):
        from f_lite_tpu.parallel import (
            batch_sharding,
            create_mesh,
            infer_param_shardings,
            shard_params,
        )
        import flax.linen as nn

        cfg = DiTConfig(**{**BASE, "hidden_size": 128}, scan_layers=True)
        model = DiT(cfg)
        mesh = create_mesh(dp=1, fsdp=2, tp=4)

        def init_fn():
            return model.init(
                jax.random.key(0),
                jnp.zeros((1, 16, 16, 16)),
                jnp.zeros((1, 8, cfg.cross_attn_input_size)),
                jnp.ones((1, 8), jnp.bool_), jnp.zeros((1,)),
            )

        sh = infer_param_shardings(init_fn, mesh)
        qkv = sh["params"]["blocks_rest"]["blk_0"]["self_attn"]["qkv"][
            "kernel"]
        from jax.sharding import PartitionSpec as P

        # layers axis replicated; head-aligned kernel (L, in, 3, H, D)
        # shards in-dim over fsdp and the HEAD axis over tp
        assert qkv.spec == P(None, "fsdp", None, "tp", None)
        params = shard_params(nn.meta.unbox(init_fn()), sh)
        x = jax.device_put(
            jax.random.normal(jax.random.key(1), (2, 16, 16, 16)),
            batch_sharding(mesh),
        )
        out = jax.jit(model.apply)(
            params, x, jnp.zeros((2, 8, 48)), jnp.ones((2, 8), jnp.bool_),
            jnp.full((2,), 0.5),
        )
        assert np.isfinite(np.asarray(out)).all()
