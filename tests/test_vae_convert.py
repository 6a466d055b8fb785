"""VAE conversion: diffusers-key state dict -> flax params, structure must
match AutoencoderKL.init exactly; conv weight layout verified numerically."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from f_lite_tpu.convert import convert_vae_state_dict
from f_lite_tpu.models.vae import AutoencoderKL, VAEConfig

CFG = VAEConfig.tiny()


def _diffusers_keys(cfg):
    """Expected diffusers AutoencoderKL key set for this config."""
    keys = {}

    def conv(name, o, i, k=3):
        keys[f"{name}.weight"] = (o, i, k, k)
        keys[f"{name}.bias"] = (o,)

    def gn(name, c):
        keys[f"{name}.weight"] = (c,)
        keys[f"{name}.bias"] = (c,)

    def resnet(base, cin, cout):
        gn(f"{base}.norm1", cin)
        conv(f"{base}.conv1", cout, cin)
        gn(f"{base}.norm2", cout)
        conv(f"{base}.conv2", cout, cout)
        if cin != cout:
            conv(f"{base}.conv_shortcut", cout, cin, k=1)

    def attn(base, c):
        gn(f"{base}.group_norm", c)
        for n in ("to_q", "to_k", "to_v"):
            keys[f"{base}.{n}.weight"] = (c, c)
            keys[f"{base}.{n}.bias"] = (c,)
        keys[f"{base}.to_out.0.weight"] = (c, c)
        keys[f"{base}.to_out.0.bias"] = (c,)

    chans = list(cfg.block_out_channels)
    # encoder
    conv("encoder.conv_in", chans[0], cfg.in_channels)
    prev = chans[0]
    for i, ch in enumerate(chans):
        for j in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                   prev if j == 0 else ch, ch)
        prev = ch
        if i < len(chans) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", ch, ch)
    resnet("encoder.mid_block.resnets.0", chans[-1], chans[-1])
    attn("encoder.mid_block.attentions.0", chans[-1])
    resnet("encoder.mid_block.resnets.1", chans[-1], chans[-1])
    gn("encoder.conv_norm_out", chans[-1])
    conv("encoder.conv_out", 2 * cfg.latent_channels, chans[-1])
    # decoder
    rchans = chans[::-1]
    conv("decoder.conv_in", rchans[0], cfg.latent_channels)
    resnet("decoder.mid_block.resnets.0", rchans[0], rchans[0])
    attn("decoder.mid_block.attentions.0", rchans[0])
    resnet("decoder.mid_block.resnets.1", rchans[0], rchans[0])
    prev = rchans[0]
    for i, ch in enumerate(rchans):
        for j in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                   prev if j == 0 else ch, ch)
        prev = ch
        if i < len(rchans) - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", ch, ch)
    gn("decoder.conv_norm_out", rchans[-1])
    conv("decoder.conv_out", cfg.out_channels, rchans[-1])
    return keys


def test_structure_matches_init():
    rs = np.random.RandomState(0)
    sd = {k: rs.randn(*shape).astype(np.float32)
          for k, shape in _diffusers_keys(CFG).items()}
    conv = convert_vae_state_dict(sd, CFG)

    vae = AutoencoderKL(CFG)
    init = vae.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))

    def paths(tree):
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        return {
            jax.tree_util.keystr(p): tuple(np.shape(v)) for p, v in flat
        }

    pc, pi = paths(conv), paths(init)
    assert pc == pi, (
        sorted(set(pi) - set(pc))[:5], sorted(set(pc) - set(pi))[:5]
    )


def test_conv_weight_layout_numeric():
    # one conv through both stacks: torch conv2d vs converted flax conv
    rs = np.random.RandomState(1)
    w = rs.randn(8, 3, 3, 3).astype(np.float32)
    b = rs.randn(8).astype(np.float32)
    x = rs.randn(1, 3, 10, 10).astype(np.float32)

    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                   torch.from_numpy(b), padding=1).numpy()

    import flax.linen as nn

    conv = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)])
    params = {"params": {
        "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(b),
    }}
    got = conv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
