"""Scaled-down versions of the BASELINE.json benchmark configs, as tests:
1. tiny random DiT + VAE decode, few Euler steps (config 1 — exact);
2. 512x512-style single-prompt CFG (config 2, tiny);
3. 1344x896-aspect + negative prompt embedding (config 3, tiny);
4. long detailed prompts, batched multi-prompt (config 4, tiny);
5. tensor-parallel precomputed-embedding serving (config 5, virtual mesh
   — exercised in test_serve.py::test_tp_serving).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f_lite_tpu.models.dit import DiT, DiTConfig
from f_lite_tpu.models.vae import AutoencoderKL, VAEConfig
from f_lite_tpu.ops.guidance import APGConfig
from f_lite_tpu.pipeline import FLitePipeline
from f_lite_tpu.text.encoder import ZeroTextEncoder


@pytest.fixture(scope="module")
def pipe():
    cfg = DiTConfig(
        in_channels=4, patch_size=2, hidden_size=64, depth=2, num_heads=4,
        mlp_ratio=2.0, cross_attn_input_size=32, residual_v=True,
        use_pallas_attention=False,
    )
    dit = DiT(cfg)
    params = dit.init_params(jax.random.key(0), text_len=8, image_size=8)
    params = jax.tree.map(lambda p: p + 0.01, params)
    vae = AutoencoderKL(VAEConfig.tiny())
    vparams = vae.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)))
    return FLitePipeline(dit, params, vae, vparams,
                         ZeroTextEncoder(32, seq_len=64))


def test_config1_tiny_e2e(pipe):
    out = pipe(prompt="cfg1", height=32, width=32, num_inference_steps=8,
               guidance_scale=6.0, seed=0)
    assert out.images[0].size == (32, 32)


def test_config2_single_prompt_cfg(pipe):
    out = pipe(prompt="a photo of a cat", height=64, width=64,
               num_inference_steps=4, guidance_scale=6.0, seed=1,
               output_type="np")
    assert out.images.shape == (1, 64, 64, 3)
    assert np.isfinite(out.images).all()


def test_config3_wide_aspect_negative_prompt(pipe):
    # 1344x896 is a 3:2 aspect; tiny-scale equivalent 48x32
    out = pipe(prompt="landscape", negative_prompt="blurry, low quality",
               height=32, width=48, num_inference_steps=3,
               guidance_scale=6.0, seed=2)
    assert out.images[0].size == (48, 32)


def test_config4_long_prompts_batched(pipe):
    long_prompt = ("a highly detailed oil painting of a bustling market "
                   "street at golden hour, intricate architecture, " * 4)
    out = pipe(prompt=[long_prompt, long_prompt + " at night",
                       "minimal"], height=32, width=32,
               num_inference_steps=2, guidance_scale=6.0, seed=3,
               apg_config=APGConfig(enabled=True))
    assert len(out.images) == 3
