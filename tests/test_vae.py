"""VAE tests on the tiny config (architecture invariants, tiling, slicing)."""

import jax
import jax.numpy as jnp
import numpy as np

from f_lite_tpu.models.vae import (
    AutoencoderKL,
    VAEConfig,
    decode_sliced,
    decode_tiled,
    denormalize_latents,
    normalize_latents,
)

CFG = VAEConfig.tiny()


def _init(cfg=CFG, hw=16):
    vae = AutoencoderKL(cfg)
    x = jnp.ones((1, hw, hw, cfg.in_channels))
    params = vae.init(jax.random.key(0), x)
    return vae, params


class TestShapes:
    def test_encode_decode_shapes(self):
        vae, params = _init()
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
        mean, logvar = vae.apply(
            params, x, method=AutoencoderKL.encode_moments
        )
        s = CFG.spatial_scale
        assert mean.shape == (2, 16 // s, 16 // s, CFG.latent_channels)
        assert logvar.shape == mean.shape
        out = vae.apply(params, mean, method=AutoencoderKL.decode)
        assert out.shape == x.shape

    def test_flux_scale_factor(self):
        assert VAEConfig.flux().spatial_scale == 8
        assert CFG.spatial_scale == 2

    def test_encode_sample_vs_mode(self):
        vae, params = _init()
        x = jax.random.normal(jax.random.key(2), (1, 16, 16, 3))
        mode = vae.apply(params, x, method=AutoencoderKL.encode)
        s1 = vae.apply(params, x, jax.random.key(3),
                       method=AutoencoderKL.encode)
        s2 = vae.apply(params, x, jax.random.key(4),
                       method=AutoencoderKL.encode)
        assert not np.allclose(np.asarray(s1), np.asarray(s2))
        # samples scatter around the mode
        assert np.abs(np.asarray(s1) - np.asarray(mode)).mean() < 10.0

    def test_normalize_roundtrip(self):
        z = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 16),
                        jnp.float32)
        cfg = VAEConfig.flux()
        np.testing.assert_allclose(
            np.asarray(denormalize_latents(normalize_latents(z, cfg), cfg)),
            np.asarray(z), rtol=1e-5, atol=1e-6,
        )


class TestMemoryModes:
    def test_resolve_memory_mode(self):
        """Shared auto heuristic: tiled past 1024px-equivalent latents;
        explicit modes always pass through."""
        from f_lite_tpu.models.vae import resolve_memory_mode

        assert resolve_memory_mode("auto", 128) == "direct"
        assert resolve_memory_mode("auto", 129) == "tiled"
        for mode in ("direct", "sliced", "tiled"):
            assert resolve_memory_mode(mode, 4096) == mode
            assert resolve_memory_mode(mode, 8) == mode

    def test_sliced_matches_direct(self):
        vae, params = _init()
        z = jax.random.normal(jax.random.key(5), (3, 8, 8, CFG.latent_channels))
        direct = vae.apply(params, z, method=AutoencoderKL.decode)
        sliced = decode_sliced(vae, params, z)
        np.testing.assert_allclose(
            np.asarray(direct), np.asarray(sliced), atol=1e-5
        )

    def test_tiled_close_to_direct(self):
        vae, params = _init()
        z = jax.random.normal(jax.random.key(6), (1, 24, 24, CFG.latent_channels))
        direct = vae.apply(params, z, method=AutoencoderKL.decode)
        tiled = decode_tiled(vae, params, z, tile_latent_size=16)
        assert tiled.shape == direct.shape
        # tiling is approximate (conv receptive fields are cut at tile
        # borders, like diffusers' enable_tiling) — outputs must correlate
        d = np.asarray(direct).ravel()
        t = np.asarray(tiled).ravel()
        corr = np.corrcoef(d, t)[0, 1]
        assert corr > 0.95, corr
        assert np.isfinite(t).all()

    def test_tiled_noop_when_small(self):
        vae, params = _init()
        z = jax.random.normal(jax.random.key(7), (1, 8, 8, CFG.latent_channels))
        direct = vae.apply(params, z, method=AutoencoderKL.decode)
        tiled = decode_tiled(vae, params, z, tile_latent_size=16)
        np.testing.assert_array_equal(np.asarray(direct), np.asarray(tiled))

    def test_encode_sliced_matches_direct(self):
        from f_lite_tpu.models.vae import encode_sliced

        vae, params = _init()
        x = jax.random.uniform(jax.random.key(8), (3, 16, 16, 3),
                               minval=-1, maxval=1)
        direct = vae.apply(params, x, method=AutoencoderKL.encode)
        sliced = encode_sliced(vae, params, x)
        np.testing.assert_allclose(
            np.asarray(direct), np.asarray(sliced), atol=1e-5
        )

    def test_encode_tiled_close_to_direct(self):
        from f_lite_tpu.models.vae import encode_tiled

        vae, params = _init()
        sf = CFG.spatial_scale
        x = jax.random.uniform(jax.random.key(9), (1, 48 * sf, 48 * sf, 3),
                               minval=-1, maxval=1)
        direct = vae.apply(params, x, method=AutoencoderKL.encode)
        tiled = encode_tiled(vae, params, x, tile_latent_size=32)
        assert tiled.shape == direct.shape
        d = np.asarray(direct).ravel()
        t = np.asarray(tiled).ravel()
        corr = np.corrcoef(d, t)[0, 1]
        assert corr > 0.95, corr
        assert np.isfinite(t).all()

    def test_encode_tiled_noop_when_small(self):
        from f_lite_tpu.models.vae import encode_tiled

        vae, params = _init()
        x = jax.random.uniform(jax.random.key(10), (1, 16, 16, 3),
                               minval=-1, maxval=1)
        direct = vae.apply(params, x, method=AutoencoderKL.encode)
        tiled = encode_tiled(vae, params, x, tile_latent_size=16)
        np.testing.assert_array_equal(np.asarray(direct), np.asarray(tiled))
