"""Int8 W8A8 quantization: kernel math, param transform, model
accuracy, pipeline integration, scan-layers stacking."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f_lite_tpu.models.dit import DiT, DiTConfig
from f_lite_tpu.quant import (
    dequantize_dit_params,
    quant_matmul,
    quantize_dit_params,
    quantize_kernel,
)

CFG = DiTConfig(
    in_channels=16, patch_size=2, hidden_size=64, depth=3, num_heads=4,
    mlp_ratio=2.0, cross_attn_input_size=32, use_pallas_attention=False,
)


class TestKernelMath:
    def test_quant_matmul_accuracy(self):
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(8, 64) * 2, jnp.float32)
        w = jnp.asarray(rs.randn(64, 32) * 0.05, jnp.float32)
        q = quantize_kernel(w)
        y = quant_matmul(x, q["w8"], q["scale"])
        ref = x @ w
        rel = float(
            jnp.max(jnp.abs(y - ref)) / jnp.max(jnp.abs(ref))
        )
        assert rel < 0.02, rel

    def test_per_channel_scales(self):
        w = jnp.array([[1.0, 100.0], [-2.0, 50.0]])
        q = quantize_kernel(w)
        np.testing.assert_allclose(
            np.asarray(q["scale"]), [2 / 127, 100 / 127], rtol=1e-6
        )
        assert q["w8"].dtype == jnp.int8

    def test_zero_column_safe(self):
        w = jnp.zeros((4, 3))
        q = quantize_kernel(w)
        y = quant_matmul(jnp.ones((2, 4)), q["w8"], q["scale"])
        np.testing.assert_array_equal(np.asarray(y), 0.0)

    def test_zero_activation_safe(self):
        w = jnp.ones((4, 3))
        q = quantize_kernel(w)
        y = quant_matmul(jnp.zeros((2, 4)), q["w8"], q["scale"])
        assert np.isfinite(np.asarray(y)).all()


class TestModelQuant:
    def test_param_transform_and_forward(self):
        model = DiT(CFG)
        params = model.init_params(jax.random.key(0), text_len=8,
                                   image_size=16)
        params = jax.tree.map(lambda p: p + 0.02, params)
        qcfg = DiTConfig(**{**dataclasses.asdict(CFG), "quantized": True})
        qmodel = DiT(qcfg)
        qparams = quantize_dit_params(params)
        # structure must match the quantized model's init
        qinit = qmodel.init_params(jax.random.key(0), text_len=8,
                                   image_size=16)
        flat_q = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(qparams)[0]}
        flat_i = {jax.tree_util.keystr(p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(qinit)[0]}
        assert flat_q == flat_i, (flat_i - flat_q, flat_q - flat_i)

        ks = jax.random.split(jax.random.key(1), 3)
        x = jax.random.normal(ks[0], (2, 16, 16, 16))
        ctx = jax.random.normal(ks[1], (2, 8, 32))
        mask = jnp.ones((2, 8), jnp.bool_)
        t = jnp.full((2,), 0.5)
        ref = model.apply(params, x, ctx, mask, t)
        got = qmodel.apply(qparams, x, ctx, mask, t)
        # quantization error bounded relative to output scale
        denom = float(jnp.std(ref)) + 1e-6
        rel = float(jnp.max(jnp.abs(got - ref))) / denom
        assert rel < 0.2, rel
        corr = np.corrcoef(
            np.asarray(ref).ravel(), np.asarray(got).ravel()
        )[0, 1]
        assert corr > 0.995, corr

    def test_dequantize_roundtrip_close(self):
        model = DiT(CFG)
        params = model.init_params(jax.random.key(2), text_len=8,
                                   image_size=16)
        deq = dequantize_dit_params(quantize_dit_params(params))
        a = params["params"]["blocks_0"]["self_attn"]["qkv"]["kernel"]
        b = deq["params"]["blocks_0"]["self_attn"]["qkv"]["kernel"]
        rel = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(a)))
        assert rel < 0.01

    def test_scan_layers_quant(self):
        cfg = DiTConfig(**{**dataclasses.asdict(CFG), "depth": 4,
                           "cross_attn_first_n": 2, "cross_attn_period": 2,
                           "scan_layers": True})
        model = DiT(cfg)
        params = model.init_params(jax.random.key(3), text_len=8,
                                   image_size=16)
        qcfg = DiTConfig(**{**dataclasses.asdict(cfg), "quantized": True})
        qparams = quantize_dit_params(params)
        # stacked head-aligned kernels: (layers, in, 3, H, D), quantized
        # per (layer, output-channel) — scale drops the contraction axis
        blk = qparams["params"]["blocks_front"]["blk_0"]["self_attn"]["qkv"]
        assert blk["w8"].ndim == 5 and blk["w8"].dtype == jnp.int8
        assert blk["scale"].shape == blk["w8"].shape[:1] + blk["w8"].shape[2:]
        out = DiT(qcfg).apply(
            qparams,
            jax.random.normal(jax.random.key(4), (1, 16, 16, 16)),
            jnp.zeros((1, 8, 32)), jnp.ones((1, 8), jnp.bool_),
            jnp.full((1,), 0.5),
        )
        assert np.isfinite(np.asarray(out)).all()


class TestPipelineQuant:
    def test_from_pretrained_quantize(self, tmp_path):
        from f_lite_tpu.models.vae import AutoencoderKL, VAEConfig
        from f_lite_tpu.pipeline import FLitePipeline
        from f_lite_tpu.text.encoder import ZeroTextEncoder

        dit = DiT(CFG)
        params = dit.init_params(jax.random.key(0), text_len=8,
                                 image_size=8)
        params = jax.tree.map(lambda p: p + 0.02, params)
        vae = AutoencoderKL(VAEConfig.tiny(latent_channels=16))
        vparams = vae.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)))
        pipe = FLitePipeline(dit, params, vae, vparams,
                             ZeroTextEncoder(32, 8))
        pipe.save_pretrained(tmp_path)

        qpipe = FLitePipeline.from_pretrained(
            tmp_path, dtype=jnp.float32, load_text_encoder=False,
            quantize=True,
        )
        qpipe.text_encoder = ZeroTextEncoder(32, 8)
        assert qpipe.dit_model.config.quantized
        kw = dict(prompt="q", height=16, width=16, num_inference_steps=2,
                  seed=0, output_type="np")
        a = pipe(**kw).images
        b = qpipe(**kw).images
        # same trajectory within quantization noise
        assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99
