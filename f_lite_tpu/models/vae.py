"""Flux-Schnell AutoencoderKL (16-ch latent, /8 spatial) in Flax, NHWC.

The reference loads this VAE from diffusers (`/root/reference/f_lite/pt.py:
143-145`; used for latent decode at `pipeline.py:299-307` and encode at
`train.py:399-404`). This is a from-scratch JAX port of the architecture
(standard SD-family KL autoencoder, Flux config: block_out_channels
(128, 256, 512, 512), layers_per_block 2, latent_channels 16, no
quant/post-quant convs, scaling_factor 0.3611, shift_factor 0.1159).

TPU notes: NHWC convolutions; GroupNorm in fp32; the mid-block spatial
attention is a single-head SDPA over h*w tokens (dense, fits MXU). Tiled
decode replaces diffusers' `enable_tiling` for large images
(`pipeline.py:85-93`); sliced (per-sample) decode replaces
`enable_slicing` via `jax.lax.map`.

Module names mirror the diffusers state dict for weight conversion
(convert/torch_to_jax.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.3611
    shift_factor: float = 0.1159
    mid_block_add_attention: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def spatial_scale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @classmethod
    def flux(cls, **overrides) -> "VAEConfig":
        return cls(**overrides)

    @classmethod
    def tiny(cls, **overrides) -> "VAEConfig":
        """2-level toy config for CPU tests (scale /2)."""
        kw = dict(block_out_channels=(8, 16), layers_per_block=1,
                  norm_num_groups=4, latent_channels=4)
        kw.update(overrides)
        return cls(**kw)


def _conv(features, *, kernel=(3, 3), strides=(1, 1), padding=1, name,
          dtype, param_dtype):
    return nn.Conv(
        features, kernel_size=kernel, strides=strides,
        padding=[(padding, padding)] * 2 if isinstance(padding, int)
        else padding,
        name=name, dtype=dtype, param_dtype=param_dtype,
    )


class GroupNorm32(nn.Module):
    """GroupNorm with fp32 accumulation (diffusers eps=1e-6)."""

    groups: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        y = nn.GroupNorm(
            num_groups=self.groups, epsilon=1e-6, dtype=jnp.float32,
            param_dtype=self.param_dtype, name="norm",
        )(x.astype(jnp.float32))
        return y.astype(dtype)


class ResnetBlock(nn.Module):
    config: VAEConfig
    out_ch: int

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        in_ch = x.shape[-1]
        h = GroupNorm32(cfg.norm_num_groups, cfg.param_dtype, name="norm1")(x)
        h = nn.silu(h)
        h = _conv(self.out_ch, name="conv1", dtype=cfg.dtype,
                  param_dtype=cfg.param_dtype)(h)
        h = GroupNorm32(cfg.norm_num_groups, cfg.param_dtype, name="norm2")(h)
        h = nn.silu(h)
        h = _conv(self.out_ch, name="conv2", dtype=cfg.dtype,
                  param_dtype=cfg.param_dtype)(h)
        if in_ch != self.out_ch:
            x = nn.Conv(
                self.out_ch, kernel_size=(1, 1), name="conv_shortcut",
                dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            )(x)
        return x + h


class MidAttention(nn.Module):
    """Single-head spatial self-attention over h*w tokens (diffusers
    `Attention` in the VAE mid block)."""

    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        b, h, w, c = x.shape
        res = x
        y = GroupNorm32(cfg.norm_num_groups, cfg.param_dtype,
                        name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q", dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype)(y)
        k = nn.Dense(c, name="to_k", dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype)(y)
        v = nn.Dense(c, name="to_v", dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype)(y)
        logits = jnp.einsum(
            "bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32
        ) * (c ** -0.5)
        probs = jax.nn.softmax(logits, axis=-1).astype(y.dtype)
        out = jnp.einsum("bqk,bkc->bqc", probs, v,
                         preferred_element_type=jnp.float32).astype(y.dtype)
        out = nn.Dense(c, name="to_out", dtype=cfg.dtype,
                       param_dtype=cfg.param_dtype)(out)
        return res + out.reshape(b, h, w, c)


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        chans = cfg.block_out_channels
        h = _conv(chans[0], name="conv_in", dtype=cfg.dtype,
                  param_dtype=cfg.param_dtype)(x)
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(cfg, ch, name=f"down_{i}_resnet_{j}")(h)
            if i < len(chans) - 1:
                # asymmetric pad (0,1),(0,1) + stride-2 conv, like diffusers
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = _conv(ch, strides=(2, 2), padding=0,
                          name=f"down_{i}_downsample", dtype=cfg.dtype,
                          param_dtype=cfg.param_dtype)(h)
        h = ResnetBlock(cfg, chans[-1], name="mid_resnet_0")(h)
        if cfg.mid_block_add_attention:
            h = MidAttention(cfg, name="mid_attn")(h)
        h = ResnetBlock(cfg, chans[-1], name="mid_resnet_1")(h)
        h = GroupNorm32(cfg.norm_num_groups, cfg.param_dtype,
                        name="conv_norm_out")(h)
        h = nn.silu(h)
        return _conv(2 * cfg.latent_channels, name="conv_out",
                     dtype=cfg.dtype, param_dtype=cfg.param_dtype)(h)


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        chans = list(reversed(cfg.block_out_channels))
        h = _conv(chans[0], name="conv_in", dtype=cfg.dtype,
                  param_dtype=cfg.param_dtype)(z)
        h = ResnetBlock(cfg, chans[0], name="mid_resnet_0")(h)
        if cfg.mid_block_add_attention:
            h = MidAttention(cfg, name="mid_attn")(h)
        h = ResnetBlock(cfg, chans[0], name="mid_resnet_1")(h)
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(cfg, ch, name=f"up_{i}_resnet_{j}")(h)
            if i < len(chans) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = _conv(ch, name=f"up_{i}_upsample", dtype=cfg.dtype,
                          param_dtype=cfg.param_dtype)(h)
        h = GroupNorm32(cfg.norm_num_groups, cfg.param_dtype,
                        name="conv_norm_out")(h)
        h = nn.silu(h)
        return _conv(cfg.out_channels, name="conv_out", dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype)(h)


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar); decode(z) -> image. All NHWC."""

    config: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.config)
        self.decoder = Decoder(self.config)

    def encode_moments(self, x):
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean, logvar

    def encode(self, x, rng=None):
        """Sample from the posterior (rng=None -> mode/mean)."""
        mean, logvar = self.encode_moments(x)
        if rng is None:
            return mean
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x, rng=None):
        z = self.encode(x, rng)
        return self.decode(z)


class IdentityVAE:
    """Pixel-space stand-in: encode and decode are the identity.

    Lets the training driver (and quality-fixture tooling) run the DiT
    directly on RGB pixels — `config` mimics the `VAEConfig` surface with
    spatial_scale 1, latent_channels 3, and shift 0 / scale 1 so
    `normalize_latents`/`denormalize_latents` are no-ops. Used by the
    trainer's `--pixel_space` mode (hermetic trained-checkpoint fixtures:
    samples are directly viewable images, no pretrained VAE needed)."""

    def __init__(self, dtype=jnp.float32):
        self.config = VAEConfig(
            latent_channels=3,
            block_out_channels=(4,),  # spatial_scale == 2**0 == 1
            scaling_factor=1.0,
            shift_factor=0.0,
            dtype=dtype,
        )

    def init(self, *args, **kwargs):
        return {}

    def apply(self, params, x, *args, method=None, **kwargs):
        return x


def normalize_latents(latents: jax.Array, cfg: VAEConfig) -> jax.Array:
    """(z - shift) * scale, the training normalization (`train.py:399-404`)."""
    return (latents - cfg.shift_factor) * cfg.scaling_factor


def denormalize_latents(latents: jax.Array, cfg: VAEConfig) -> jax.Array:
    """z / scale + shift, pre-decode (`pipeline.py:301-304`)."""
    return latents / cfg.scaling_factor + cfg.shift_factor


# "auto" memory mode switches to tiled past this many latents on the long
# side (= 1024px output): the mid-block attention is quadratic in
# pixels/64 on both encode and decode — a full 2048px decode wants 16.5 GB
# of decoder activations, measured HBM OOM on a 16 GB v5e
AUTO_TILE_LATENTS = 128


def resolve_memory_mode(mode: str, lmax: int) -> str:
    """Resolve the VAE memory mode for an image whose LATENT long side is
    `lmax`: explicit modes pass through; "auto" tiles past
    AUTO_TILE_LATENTS. The single source of the threshold for the
    pipeline's encode/decode paths and bench.py."""
    if mode != "auto":
        return mode
    return "tiled" if lmax > AUTO_TILE_LATENTS else "direct"


def decode_sliced(vae: AutoencoderKL, params, z: jax.Array) -> jax.Array:
    """Per-sample decode (memory mode akin to `vae.enable_slicing`)."""
    return jax.lax.map(
        lambda zi: vae.apply(params, zi[None], method=AutoencoderKL.decode)[0],
        z,
    )


def encode_sliced(vae: AutoencoderKL, params, x: jax.Array) -> jax.Array:
    """Per-sample deterministic encode (posterior mean)."""
    return jax.lax.map(
        lambda xi: vae.apply(params, xi[None], method=AutoencoderKL.encode)[0],
        x,
    )


def _blend_h(a, bb, n):
    n = min(n, a.shape[2], bb.shape[2])
    w = (jnp.arange(n, dtype=a.dtype) + 1) / (n + 1)
    mixed = a[:, :, -n:, :] * (1 - w[None, None, :, None]) + \
        bb[:, :, :n, :] * w[None, None, :, None]
    return jnp.concatenate([a[:, :, :-n, :], mixed, bb[:, :, n:, :]],
                           axis=2)


def _blend_v(a, bb, n):
    n = min(n, a.shape[1], bb.shape[1])
    w = (jnp.arange(n, dtype=a.dtype) + 1) / (n + 1)
    mixed = a[:, -n:, :, :] * (1 - w[None, :, None, None]) + \
        bb[:, :n, :, :] * w[None, :, None, None]
    return jnp.concatenate([a[:, :-n, :, :], mixed, bb[:, n:, :, :]],
                           axis=1)


def _merge_tiled(rows, blend):
    merged_rows = []
    for row in rows:
        acc = row[0]
        for tile in row[1:]:
            acc = _blend_h(acc, tile, blend)
        merged_rows.append(acc)
    out = merged_rows[0]
    for r in merged_rows[1:]:
        out = _blend_v(out, r, blend)
    return out


def encode_tiled(
    vae: AutoencoderKL,
    params,
    x: jax.Array,
    *,
    tile_latent_size: int = 64,
    overlap: float = 0.25,
) -> jax.Array:
    """Tiled deterministic encode with blended latent seams.

    The encode analog of `decode_tiled` (the encoder's mid-block attention
    materializes an (hw x hw) logits tensor — ~17 GB fp32 at 2048px — so
    large image-to-image inputs must be encoded in tiles, like diffusers'
    `vae.enable_tiling` encode side). Overlapping PIXEL tiles are encoded
    to the posterior mean and the latent seams are linearly blended."""
    cfg = vae.config
    sf = cfg.spatial_scale
    b, h, w, _ = x.shape
    lh, lw = h // sf, w // sf
    t = tile_latent_size
    if lh <= t and lw <= t:
        return vae.apply(params, x, method=AutoencoderKL.encode)

    stride = int(t * (1 - overlap))
    blend = t - stride  # latent overlap between adjacent tiles

    rows = []
    for i0 in range(0, lh, stride):
        row = []
        for j0 in range(0, lw, stride):
            tile = x[:, i0 * sf : (i0 + t) * sf, j0 * sf : (j0 + t) * sf, :]
            row.append(
                vae.apply(params, tile, method=AutoencoderKL.encode)
            )
            if j0 + t >= lw:
                break
        rows.append(row)
        if i0 + t >= lh:
            break

    return _merge_tiled(rows, blend)[:, :lh, :lw, :]


def decode_tiled(
    vae: AutoencoderKL,
    params,
    z: jax.Array,
    *,
    tile_latent_size: int = 64,
    overlap: float = 0.25,
) -> jax.Array:
    """Tiled decode with blended seams (akin to `vae.enable_tiling`).

    Decodes overlapping latent tiles and linearly blends row/column seams,
    mirroring the diffusers algorithm (blend_v/blend_h) the reference relies
    on for large images.
    """
    cfg = vae.config
    sf = cfg.spatial_scale
    b, lh, lw, c = z.shape
    t = tile_latent_size
    if lh <= t and lw <= t:
        return vae.apply(params, z, method=AutoencoderKL.decode)

    stride = int(t * (1 - overlap))
    blend = (t - stride) * sf  # pixel overlap between adjacent tiles

    rows = []
    for i0 in range(0, lh, stride):
        row = []
        for j0 in range(0, lw, stride):
            tile = z[:, i0 : i0 + t, j0 : j0 + t, :]
            row.append(
                vae.apply(params, tile, method=AutoencoderKL.decode)
            )
            if j0 + t >= lw:
                break
        rows.append(row)
        if i0 + t >= lh:
            break

    return _merge_tiled(rows, blend)[:, : lh * sf, : lw * sf, :]
