"""TP collective audit: the tp-sharded denoise program must be clean
Megatron — per block exactly 3 full-tp-group all-reduces (self proj,
cross proj, mlp down), plus tiny once-per-step modulation gathers; no
collective-permutes, no activation re-gathers, nothing off the tp axis
(SURVEY.md §7.3.6; round-1 weak #3)."""

import sys
from pathlib import Path

import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from tp_compile_check import parse_collectives  # noqa: E402


def _compile_tp_denoise(tp=8, residual_v=False, quantized=False, dp=1):
    import flax.linen as nn

    from f_lite_tpu.models.dit import DiT, DiTConfig
    from f_lite_tpu.parallel import (
        batch_sharding,
        create_mesh,
        infer_param_shardings,
    )
    from f_lite_tpu.parallel.mesh import mesh_rules
    from f_lite_tpu.sampling.euler import DenoiseSettings, denoise

    mesh = create_mesh(dp=dp, fsdp=1, tp=tp,
                       devices=jax.devices()[: dp * tp])
    dtype = jnp.bfloat16
    cfg = DiTConfig(
        in_channels=16, patch_size=2, hidden_size=256, depth=4,
        num_heads=8, mlp_ratio=2.0, cross_attn_input_size=64,
        scan_layers=True, dtype=dtype, param_dtype=dtype,
        use_pallas_attention=False, residual_v=residual_v,
        quantized=quantized,
    )
    lat, text_len = 32, 32
    model = DiT(cfg)

    def boxed_init():
        return model.init(
            jax.random.key(0),
            jnp.zeros((1, lat, lat, cfg.in_channels), dtype),
            jnp.zeros((1, text_len, cfg.cross_attn_input_size), dtype),
            jnp.ones((1, text_len), jnp.bool_),
            jnp.zeros((1,), dtype),
        )

    shardings = infer_param_shardings(boxed_init, mesh)
    abstract = nn.meta.unbox(jax.eval_shape(boxed_init))
    ps = jax.tree.map(
        lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
        abstract, shardings,
    )
    bsh = batch_sharding(mesh)
    args = (
        ps,
        jax.ShapeDtypeStruct((dp, lat, lat, 16), dtype, sharding=bsh),
        jax.ShapeDtypeStruct((dp, text_len, 64), dtype, sharding=bsh),
        jax.ShapeDtypeStruct((dp, text_len, 64), dtype, sharding=bsh),
        jax.ShapeDtypeStruct((dp, text_len), jnp.bool_, sharding=bsh),
    )
    settings = DenoiseSettings(num_inference_steps=4, guidance_scale=6.0)

    def fn(p, z, pos, neg, m):
        return denoise(model.apply, p, z, pos, neg, m, settings)

    with mesh_rules(mesh):
        compiled = jax.jit(fn).lower(*args).compile()
    return compiled.as_text(), tp


@pytest.mark.slow
class TestTPCollectives:
    def _audit(self, hlo, tp, max_collectives):
        collectives = parse_collectives(hlo)
        assert collectives, "no collectives at all — params not tp-sharded?"
        tp_group = [list(range(tp))]
        bad = [(k, g) for k, g in collectives if g != tp_group]
        assert not bad, f"off-tp-axis or permute collectives: {bad}"
        assert len(collectives) <= max_collectives, [
            k for k, _ in collectives
        ]

    def test_denoise_tp8(self):
        hlo, tp = _compile_tp_denoise(tp=8)
        # 3 per-block all-reduces appear once in the scan body (x2 scan
        # groups) + time_embed + 2 modulation gathers = small constant
        self._audit(hlo, tp, max_collectives=12)

    def test_denoise_tp8_residual_v(self):
        hlo, tp = _compile_tp_denoise(tp=8, residual_v=True)
        self._audit(hlo, tp, max_collectives=12)

    def test_denoise_tp8_quantized(self):
        hlo, tp = _compile_tp_denoise(tp=8, quantized=True)
        self._audit(hlo, tp, max_collectives=12)

    def test_denoise_tp2(self):
        hlo, tp = _compile_tp_denoise(tp=2)
        self._audit(hlo, tp, max_collectives=12)

    def test_denoise_dp2_tp2(self):
        """serve --dp: cross-dp communication must be only the CFG row
        exchange (collective-permutes / dp-aligned gathers — a small
        program-wide constant), never per-block activation resharding;
        tp collectives stay on their per-shard groups."""
        hlo, _ = _compile_tp_denoise(tp=2, dp=2)
        collectives = parse_collectives(hlo)
        tp_groups = [[0, 1], [2, 3]]
        dp_groups = [[0, 2], [1, 3]]
        permutes = sum(1 for _, g in collectives if g is None)
        dp_n = sum(1 for _, g in collectives if g == dp_groups)
        bad = [(k, g) for k, g in collectives
               if g is not None and g not in (tp_groups, dp_groups)]
        assert not bad, f"off-axis collectives: {bad}"
        assert any(g == tp_groups for _, g in collectives), \
            "no tp collectives — params not tp-sharded?"
        # the scan body is deduplicated in HLO: a leaked per-block
        # resharding would add tens of dp ops, the CFG exchange adds ~2-4
        assert permutes + dp_n <= 8, (permutes, dp_n)


class TestPaddedHeadsTPExecution:
    def test_padded_tp8_matches_unsharded_unpadded(self):
        """End-to-end numeric: 5-head model padded to 8 heads, sharded
        tp=8, executed on the virtual mesh == unpadded single-device."""
        import dataclasses

        import flax.linen as nn
        import numpy as np

        from f_lite_tpu.convert import convert_dit_state_dict
        from f_lite_tpu.models.dit import DiT, DiTConfig
        from f_lite_tpu.parallel import (
            batch_sharding,
            create_mesh,
            infer_param_shardings,
            shard_params,
        )
        from f_lite_tpu.parallel.mesh import mesh_rules
        from torch_oracle import make_random_state_dict

        cfg = DiTConfig(
            in_channels=16, patch_size=2, hidden_size=80, depth=3,
            num_heads=5, mlp_ratio=2.0, cross_attn_input_size=48,
            use_pallas_attention=False, residual_v=True,
        )
        pcfg = dataclasses.replace(cfg, padded_heads=8)
        sd = {k: v.numpy()
              for k, v in make_random_state_dict(cfg, seed=3).items()}
        rs = np.random.RandomState(4)
        x = jnp.asarray(rs.randn(2, 16, 16, 16).astype(np.float32))
        ctx = jnp.asarray(rs.randn(2, 8, 48).astype(np.float32))
        mask = jnp.ones((2, 8), bool)
        t = jnp.asarray(rs.rand(2).astype(np.float32))

        base = DiT(cfg).apply(
            jax.tree.map(jnp.asarray, convert_dit_state_dict(sd, cfg)),
            x, ctx, mask, t,
        )

        mesh = create_mesh(dp=1, fsdp=1, tp=8)
        model = DiT(pcfg)
        init_fn = lambda: model.init(jax.random.key(0), x, ctx, mask, t)
        sh = infer_param_shardings(init_fn, mesh)
        params = shard_params(
            jax.tree.map(jnp.asarray, convert_dit_state_dict(sd, pcfg)), sh
        )
        with mesh_rules(mesh):
            out = jax.jit(model.apply)(
                params, jax.device_put(x, batch_sharding(mesh)),
                ctx, mask, t,
            )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(base), atol=5e-6, rtol=5e-6
        )
