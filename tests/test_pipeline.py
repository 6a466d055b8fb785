"""End-to-end pipeline tests: tiny random DiT + VAE, save/load roundtrip,
CLI. This is BASELINE.json config 1 (tiny random-init DiT + VAE decode,
CPU fp32) at reduced size."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from f_lite_tpu.models.dit import DiT, DiTConfig
from f_lite_tpu.models.vae import AutoencoderKL, VAEConfig
from f_lite_tpu.ops.guidance import APGConfig
from f_lite_tpu.pipeline import FLitePipeline, FLitePipelineOutput
from f_lite_tpu.text.encoder import ZeroTextEncoder

DIT_CFG = DiTConfig(
    in_channels=4, patch_size=2, hidden_size=64, depth=2, num_heads=4,
    mlp_ratio=2.0, cross_attn_input_size=32, use_pallas_attention=False,
)
VAE_CFG = VAEConfig.tiny()  # latent_channels=4, /2 spatial


@pytest.fixture(scope="module")
def pipe():
    dit = DiT(DIT_CFG)
    dit_params = dit.init_params(jax.random.key(0), text_len=8, image_size=8)
    dit_params = jax.tree.map(lambda p: p + 0.01, dit_params)
    vae = AutoencoderKL(VAE_CFG)
    vae_params = vae.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)))
    te = ZeroTextEncoder(embed_dim=32, seq_len=8)
    return FLitePipeline(dit, dit_params, vae, vae_params, te)


class TestPipeline:
    def test_generate_pil(self, pipe):
        out = pipe(
            prompt="a cat", height=32, width=32,
            num_inference_steps=2, guidance_scale=6.0, seed=7,
        )
        assert isinstance(out, FLitePipelineOutput)
        assert len(out.images) == 1
        img = out.images[0]
        assert isinstance(img, Image.Image)
        assert img.size == (32, 32)

    def test_on_device_uint8_matches_host_kernel(self, pipe):
        """The PIL path quantizes to uint8 on device (4x smaller fetch);
        it must stay bit-identical to the native host kernel applied to
        the fp32 output (both are half-to-even (x/2+.5).clamp*255)."""
        import numpy as np

        from f_lite_tpu.utils.image import to_pil_images

        kw = dict(prompt="parity", height=32, width=32,
                  num_inference_steps=2, seed=11)
        pil = pipe(**kw).images[0]
        host = to_pil_images(pipe(**kw, output_type="np").images)[0]
        assert np.array_equal(np.asarray(pil), np.asarray(host))

    def test_batch_and_multi_per_prompt(self, pipe):
        out = pipe(
            prompt=["a", "b"], height=16, width=16,
            num_inference_steps=1, num_images_per_prompt=2, seed=1,
        )
        assert len(out.images) == 4

    def test_seed_determinism(self, pipe):
        kw = dict(prompt="x", height=16, width=16, num_inference_steps=2,
                  seed=5, output_type="np")
        a = pipe(**kw).images
        b = pipe(**kw).images
        np.testing.assert_array_equal(a, b)
        c = pipe(**{**kw, "seed": 6}).images
        assert not np.array_equal(a, c)

    def test_sampler_ab2(self, pipe):
        """sampler="ab2" runs end-to-end and integrates differently from
        euler (order-of-convergence proof: tests/test_sampler.py)."""
        kw = dict(prompt="x", height=16, width=16, num_inference_steps=3,
                  seed=4, output_type="np")
        e = pipe(**kw).images
        a = pipe(**kw, sampler="ab2").images
        assert np.asarray(a).shape == np.asarray(e).shape
        assert not np.array_equal(a, e)

    def test_negative_prompt_changes_output(self, pipe):
        kw = dict(prompt="x", height=16, width=16, num_inference_steps=2,
                  seed=3, output_type="np")
        a = pipe(**kw).images
        b = pipe(**kw, negative_prompt="bad").images
        assert not np.array_equal(a, b)

    def test_apg(self, pipe):
        out = pipe(
            prompt="y", height=16, width=16, num_inference_steps=2,
            apg_config=APGConfig(enabled=True), seed=2, output_type="np",
        )
        assert np.isfinite(out.images).all()

    def test_non_square_aspect(self, pipe):
        out = pipe(prompt="z", height=16, width=24, num_inference_steps=1,
                   seed=0)
        assert out.images[0].size == (24, 16)  # PIL (w, h)

    def test_injected_embeddings(self, pipe):
        emb = np.zeros((1, 8, 32), np.float32)
        out = pipe(
            prompt_embeds=emb, height=16, width=16, num_inference_steps=1,
            seed=0,
        )
        assert len(out.images) == 1

    def test_denoise_cache_is_lru_bounded(self, pipe):
        """Cycling more distinct settings than the cache cap must evict,
        not grow without bound (a long-lived server fed many step-count/
        guidance combos), and an evicted key must still work on recall."""
        cache = pipe._denoise_cache
        old_max, old_evictions = cache.maxsize, cache.evictions
        cache.maxsize = 2
        try:
            kw = dict(height=16, width=16, output_type="latent")
            for steps in (2, 3, 4):
                pipe(prompt="x", num_inference_steps=steps, seed=0, **kw)
            assert len(cache) <= 2
            assert cache.evictions > old_evictions
            # evicted earliest key recompiles and still produces output
            out = pipe(prompt="x", num_inference_steps=2, seed=0, **kw)
            assert np.isfinite(np.asarray(out.images)).all()
        finally:
            cache.maxsize = old_max

    def test_return_latents(self, pipe):
        out = pipe(prompt="q", height=16, width=16, num_inference_steps=1,
                   seed=0, return_latents=True)
        assert out.images.shape == (1, 8, 8, 4)  # /2 tiny VAE scale

    def test_pad_context_to_is_exact(self, pipe):
        """Bucketed context padding (HTTP serving's compile-stability
        knob) must not change the result: padded keys carry mask=0 and
        never attend. Encoder emits len 8; the bucket pads to 64."""
        kw = dict(prompt="q", height=16, width=16, num_inference_steps=2,
                  seed=3, return_latents=True)
        base = np.asarray(pipe(**kw).images)
        padded = np.asarray(pipe(**kw, pad_context_to=64).images)
        np.testing.assert_allclose(padded, base, atol=2e-6, rtol=0)
        # rounds UP to the next multiple: a 200-token-equivalent request
        # at bucket 64 would use 256; here 8 -> 64 (shape checked via a
        # second bucket producing the same exact output)
        p2 = np.asarray(pipe(**kw, pad_context_to=16).images)
        np.testing.assert_allclose(p2, base, atol=2e-6, rtol=0)


class TestSaveLoad:
    def test_roundtrip(self, pipe, tmp_path):
        pipe.save_pretrained(tmp_path)
        assert (tmp_path / "model_index.json").exists()
        cfg = json.loads((tmp_path / "dit" / "config.json").read_text())
        assert cfg["hidden_size"] == 64

        pipe2 = FLitePipeline.from_pretrained(
            tmp_path, dtype=jnp.float32, load_text_encoder=False
        )
        pipe2.text_encoder = ZeroTextEncoder(embed_dim=32, seq_len=8)
        kw = dict(prompt="same", height=16, width=16,
                  num_inference_steps=2, seed=9, output_type="np")
        a = pipe(**kw).images
        b = pipe2(**kw).images
        np.testing.assert_allclose(a, b, atol=1e-5)

    def test_load_defaults_to_scan_trunk(self, pipe, tmp_path):
        """Unrolled checkpoints restack to the scan trunk at load (the
        serving fusion context every kernel is tuned in — an unrolled 7B
        program pushed flash attention over the scoped-VMEM limit at
        1024px). scan_layers=False keeps the saved layout, identically."""
        pipe.save_pretrained(tmp_path)
        saved = json.loads((tmp_path / "dit" / "config.json").read_text())
        assert saved["scan_layers"] is False  # the on-disk layout
        kw = dict(dtype=jnp.float32, load_text_encoder=False)
        scan = FLitePipeline.from_pretrained(tmp_path, **kw)
        unrolled = FLitePipeline.from_pretrained(
            tmp_path, scan_layers=False, **kw
        )
        assert scan.dit_model.config.scan_layers is True
        assert unrolled.dit_model.config.scan_layers is False
        assert "blocks_front" in scan.dit_params["params"]
        x = jnp.asarray(
            np.random.RandomState(0).randn(1, 8, 8, 4), jnp.float32)
        c = jnp.asarray(
            np.random.RandomState(1).randn(1, 8, 32), jnp.float32)
        m = jnp.ones((1, 8), bool)
        t = jnp.full((1,), 0.4, jnp.float32)
        va = scan.dit_model.apply(scan.dit_params, x, c, m, t)
        vb = unrolled.dit_model.apply(unrolled.dit_params, x, c, m, t)
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), atol=1e-5, rtol=0)


class TestCLI:
    def test_generate_cli(self, pipe, tmp_path):
        from f_lite_tpu.generate import main

        model_dir = tmp_path / "model"
        pipe.save_pretrained(model_dir)
        out_file = tmp_path / "img.png"
        paths = main([
            "--prompt", "a tiny test", "--model", str(model_dir),
            "--width", "16", "--height", "16",
            "--num_inference_steps", "1", "--num_images", "2",
            "--output_file", str(out_file), "--no_text_encoder",
        ])
        assert len(paths) == 2
        for p in paths:
            assert p.exists()
            assert Image.open(p).size == (16, 16)
        # generation parameters are stamped into the PNG (reproducibility)
        from f_lite_tpu.utils.image import read_metadata

        meta = read_metadata(paths[0])
        assert meta["prompt"] == "a tiny test"
        assert meta["steps"] == 1 and meta["seed"] == 0
        assert "strength" not in meta  # None params are dropped

        # --from_png regenerates from the stamped parameters (incl.
        # num_images=2); explicit flags still override (fresh output
        # file + forced no_text_encoder)
        paths2 = main([
            "--from_png", str(paths[0]),
            "--output_file", str(tmp_path / "again.png"),
            "--no_text_encoder",
        ])
        assert len(paths2) == 2 and paths2[0].exists()
        meta2 = read_metadata(paths2[0])
        assert meta2["prompt"] == "a tiny test"
        assert meta2["steps"] == 1 and meta2["seed"] == 0
        # same parameters + same seed -> pixel-identical regeneration.
        # source was a num_images=2 run: from_png restores num_images, so
        # file k reproduces as the k-th output of the regenerated set
        src_idx = read_metadata(paths[0])["image_index"]
        np.testing.assert_array_equal(
            np.asarray(Image.open(paths2[src_idx - 1])),
            np.asarray(Image.open(paths[0])),
        )

    def test_generate_cli_img2img(self, pipe, tmp_path):
        from f_lite_tpu.generate import main

        model_dir = tmp_path / "model"
        pipe.save_pretrained(model_dir)
        src = tmp_path / "src.png"
        Image.fromarray(np.full((16, 16, 3), 90, np.uint8)).save(src)
        paths = main([
            "--prompt", "restyle", "--model", str(model_dir),
            "--width", "16", "--height", "16",
            "--num_inference_steps", "2", "--no_text_encoder",
            "--image", str(src), "--strength", "0.5",
            "--output_file", str(tmp_path / "out.png"),
        ])
        assert paths and paths[0].exists()


class TestImg2Img:
    def _input(self, h=16, w=16, value=128):
        return Image.fromarray(np.full((h, w, 3), value, np.uint8))

    def test_runs_and_shapes(self, pipe):
        out = pipe(prompt="a cat", height=16, width=16,
                   num_inference_steps=4, seed=3,
                   image=self._input(), strength=0.5, output_type="np")
        assert len(out.images) == 1
        assert np.isfinite(np.asarray(out.images[0])).all()

    def test_deterministic(self, pipe):
        kw = dict(prompt="x", height=16, width=16, num_inference_steps=4,
                  seed=5, image=self._input(), strength=0.5,
                  output_type="np")
        a = pipe(**kw).images
        b = pipe(**kw).images
        np.testing.assert_array_equal(a, b)

    def test_strength_one_is_exactly_t2i(self, pipe):
        # t0 == 1.0 + no mask: the encode is skipped and the start noise
        # is drawn in the model dtype — bitwise the text-to-image path
        kw = dict(prompt="x", height=16, width=16, num_inference_steps=3,
                  seed=9, output_type="np")
        a = pipe(**kw, image=self._input(), strength=1.0).images
        b = pipe(**kw).images
        np.testing.assert_array_equal(a, b)

    def test_low_strength_stays_closer_to_input(self, pipe):
        from f_lite_tpu.models.vae import normalize_latents

        img = self._input(value=200)
        x = (np.asarray(img.convert("RGB"), np.float32) / 255.0) * 2 - 1
        enc = pipe.vae.apply(pipe.vae_params, jnp.asarray(x)[None],
                             method=type(pipe.vae).encode)
        ref = np.asarray(normalize_latents(enc.astype(jnp.float32),
                                           pipe.vae.config))

        def final_latents(strength):
            out = pipe(prompt="x", height=16, width=16,
                       num_inference_steps=8, seed=2, image=img,
                       strength=strength, return_latents=True)
            return np.asarray(out.images, np.float32)

        d_low = np.abs(final_latents(0.25) - ref).mean()
        d_high = np.abs(final_latents(1.0) - ref).mean()
        assert d_low < d_high, (d_low, d_high)

    def test_batch_broadcast_and_list(self, pipe):
        out = pipe(prompt=["a", "b"], height=16, width=16,
                   num_inference_steps=2, seed=1, image=self._input(),
                   strength=0.5)
        assert len(out.images) == 2
        out = pipe(prompt=["a", "b"], height=16, width=16,
                   num_inference_steps=2, seed=1,
                   image=[self._input(), self._input(value=30)],
                   strength=0.5)
        assert len(out.images) == 2

    def test_array_inputs(self, pipe):
        u8 = np.full((16, 16, 3), 60, np.uint8)
        f32 = np.full((16, 16, 3), 60 / 255.0, np.float32)
        kw = dict(prompt="x", height=16, width=16, num_inference_steps=2,
                  seed=4, strength=0.5, output_type="np")
        a = pipe(**kw, image=u8).images
        b = pipe(**kw, image=f32).images
        np.testing.assert_array_equal(a, b)

    def test_signed_float_roundtrip_and_range_check(self, pipe):
        # output_type="np" images are [-1, 1]; feeding one straight back
        # must be detected as signed (not rescaled to [-3, 1])
        kw = dict(prompt="x", height=16, width=16, num_inference_steps=2,
                  seed=4, strength=0.5, output_type="np")
        out = pipe(**kw, image=np.full((16, 16, 3), 60, np.uint8))
        img = np.asarray(out.images[0], np.float32)  # ~[-1, 1] (decoder
        assert img.min() < 0                         # overshoot clipped)
        imgc = np.clip(img, -1.0, 1.0)
        a = pipe(**kw, image=img).images
        b = pipe(**kw, image=((imgc + 1) / 2)).images  # same as [0, 1]
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=1e-5, rtol=1e-5)
        with pytest.raises(ValueError, match="float image values"):
            pipe(**kw, image=np.full((16, 16, 3), 3.7, np.float32))


    def test_errors(self, pipe):
        img = self._input()
        with pytest.raises(ValueError, match="strength"):
            pipe(prompt="x", height=16, width=16, num_inference_steps=2,
                 image=img, strength=0.0)
        with pytest.raises(ValueError, match="not both"):
            pipe(prompt="x", height=16, width=16, num_inference_steps=2,
                 image=img, latents=jnp.zeros((1, 8, 8, 4)))
        with pytest.raises(ValueError, match="got 3 images"):
            # strength 0.5 so the encode path runs (strength 0.8 at 2
            # steps rounds to a full trajectory, which skips the encode)
            pipe(prompt="x", height=16, width=16, num_inference_steps=2,
                 image=[img, img, img], strength=0.5)

    def test_resize_from_other_size(self, pipe):
        out = pipe(prompt="x", height=16, width=24,
                   num_inference_steps=2, seed=0,
                   image=self._input(h=40, w=30), strength=0.6)
        assert out.images[0].size == (24, 16)

    def test_start_step_chunking_consistent(self, pipe):
        # the same start_step through chunked dispatches == single dispatch
        kw = dict(prompt="x", height=16, width=16, num_inference_steps=6,
                  seed=8, image=self._input(), strength=0.5,
                  output_type="np")
        a = pipe(**kw, steps_per_dispatch=0).images     # single dispatch
        b = pipe(**kw, steps_per_dispatch=2).images     # 3-step slice, k=2
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=1e-5, rtol=1e-5)


class TestInpainting:
    def _img(self, value=128):
        return Image.fromarray(np.full((16, 16, 3), value, np.uint8))

    def _mask_left_half(self, size=16):
        # white (repaint) on the left half, black (keep) on the right.
        # size=8 builds it at LATENT resolution: no resize, so the edge
        # stays binary (bilinear downsample bleeds a hard edge)
        m = np.zeros((size, size), np.uint8)
        m[:, : size // 2] = 255
        return Image.fromarray(m, "L")

    def test_float_mask_out_of_range_raises(self, pipe):
        """A 0-255-scaled float/int mask must raise, not silently clip
        every value >= 1 to full repaint (destroying soft blends)."""
        bad = np.full((16, 16), 128.0, np.float32)  # 0-255 scale as float
        with pytest.raises(ValueError, match="mask values"):
            pipe(prompt="x", height=16, width=16, num_inference_steps=2,
                 seed=0, image=self._img(), strength=1.0, mask_image=bad)

    def test_float_mask_in_unit_range_blends(self, pipe):
        """Float masks in [0, 1] are the documented soft-blend input;
        tiny out-of-range ringing from resize/antialias (both signs) is
        tolerated and clipped, not rejected."""
        half = np.zeros((8, 8), np.float32)
        half[:, :4] = 1.0
        half[0, 7] = -1e-6  # antialias undershoot
        half[7, 0] = 1.0 + 1e-6  # overshoot
        out = pipe(prompt="x", height=16, width=16, num_inference_steps=2,
                   seed=0, image=self._img(), strength=1.0,
                   mask_image=half, return_latents=True)
        assert np.asarray(out.images).shape[0] == 1

    def test_kept_region_pins_input_latents_exactly(self, pipe):
        from f_lite_tpu.models.vae import normalize_latents

        img = self._img(value=180)
        out = pipe(prompt="x", height=16, width=16, num_inference_steps=4,
                   seed=6, image=img, strength=1.0,
                   mask_image=self._mask_left_half(size=8),
                   return_latents=True)
        final = np.asarray(out.images, np.float32)

        x = (np.asarray(img.convert("RGB"), np.float32) / 255.0) * 2 - 1
        enc = pipe.vae.apply(pipe.vae_params, jnp.asarray(x)[None],
                             method=type(pipe.vae).encode)
        ref = np.asarray(normalize_latents(enc.astype(jnp.float32),
                                           pipe.vae.config), np.float32)
        # latent grid 8x8: mask left half -> repaint cols 0..3, keep 4..7
        np.testing.assert_array_equal(final[:, :, 4:, :], ref[:, :, 4:, :])
        assert not np.allclose(final[:, :, :4, :], ref[:, :, :4, :])

    def test_deterministic_and_chunking_consistent(self, pipe):
        kw = dict(prompt="x", height=16, width=16, num_inference_steps=6,
                  seed=11, image=self._img(), strength=1.0,
                  mask_image=self._mask_left_half(), output_type="np")
        a = pipe(**kw, steps_per_dispatch=0).images   # single dispatch
        b = pipe(**kw, steps_per_dispatch=0).images
        np.testing.assert_array_equal(a, b)
        c = pipe(**kw, steps_per_dispatch=4).images   # 6 steps, pad to 8
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(c, np.float32),
                                   atol=1e-5, rtol=1e-5)

    def test_soft_and_array_masks(self, pipe):
        m = np.full((16, 16), 0.5, np.float32)  # uniform soft blend
        out = pipe(prompt="x", height=16, width=16, num_inference_steps=2,
                   seed=1, image=self._img(), strength=0.7, mask_image=m,
                   output_type="np")
        assert np.isfinite(np.asarray(out.images)).all()

    def test_mask_without_image_raises(self, pipe):
        with pytest.raises(ValueError, match="requires image"):
            pipe(prompt="x", height=16, width=16, num_inference_steps=2,
                 mask_image=self._mask_left_half())

    def test_legacy_prngkey_seed_chunked(self, pipe):
        # legacy uint32 PRNGKey seeds are (2,)-shaped, not typed keys:
        # the inpaint key split/slicing must stay shape-agnostic through
        # the remainder-chunk path (5 steps @ 2/dispatch -> chunks 2+2+1)
        out = pipe(prompt="x", height=16, width=16, num_inference_steps=5,
                   seed=jax.random.PRNGKey(3), image=self._img(),
                   strength=1.0, mask_image=self._mask_left_half(size=8),
                   steps_per_dispatch=2, output_type="np")
        assert np.isfinite(np.asarray(out.images)).all()


class TestAutoTiledDecode:
    def test_large_latents_auto_tile(self, pipe, monkeypatch):
        """>AUTO_TILE_LATENTS latent (>= ~1024px real-model): the default
        'auto' decode switches to tiled — a full decode at 2048px wants
        16.5 GB of decoder activations (PERF.md). Output must match the
        direct decode at a size where both run (seams blended, not
        bit-equal). The threshold and tile edge are scaled down so the
        test exercises a genuine 3x3 multi-tile blend at 1/13 the pixel
        count of the real 1024px boundary."""
        from f_lite_tpu.models import vae as vae_mod
        from f_lite_tpu.models.vae import denormalize_latents

        monkeypatch.setattr(vae_mod, "AUTO_TILE_LATENTS", 16)
        # pipe is module-scoped: restore the production tile size after
        monkeypatch.setattr(pipe, "_tile_latent_size", 16)
        kw = dict(prompt="t", height=72, width=72, num_inference_steps=1,
                  seed=4, output_type="np")
        assert pipe._decode_mode == "auto"
        imgs = pipe(**kw).images
        assert imgs.shape == (1, 72, 72, 3)
        assert np.isfinite(imgs).all()
        # oracle: direct decode of the same latents
        z = pipe(**{**kw, "return_latents": True}).images
        z = denormalize_latents(
            jnp.asarray(z, jnp.float32), pipe.vae.config
        )
        direct = np.asarray(
            pipe.vae.apply(pipe.vae_params, z,
                           method=type(pipe.vae).decode)
        )
        # tiled decode is approximate BY DESIGN (independent tiles,
        # blended overlap — the diffusers algorithm): a random-weight VAE
        # amplifies seam deltas far beyond what a trained VAE shows, so
        # bound the aggregate error, not the per-pixel max
        err = np.abs(direct - imgs)
        # seam density is ~4x the production 64-latent tiling at this
        # shrunk 16-latent protocol and the random-weight VAE amplifies
        # per-tile context differences, so the aggregate bound is looser
        # than the production-shape one (was mean<0.02 at 260px/64-tile)
        assert err.mean() < 0.08 and err.max() < 0.6, (
            err.mean(), err.max())

    def test_explicit_mode_respected_over_auto(self, pipe, monkeypatch):
        """An explicitly-set decode mode disables the auto override:
        larger-HBM hardware (v4/v5p) can force a full direct decode at
        any size, and the result is the bit-exact non-tiled decode."""
        from f_lite_tpu.models import vae as vae_mod
        from f_lite_tpu.models.vae import denormalize_latents

        monkeypatch.setattr(vae_mod, "AUTO_TILE_LATENTS", 16)
        kw = dict(prompt="t", height=72, width=72, num_inference_steps=1,
                  seed=4, output_type="np")
        pipe._decode_mode = "direct"
        try:
            imgs = pipe(**kw).images
            z = pipe(**{**kw, "return_latents": True}).images
            z = denormalize_latents(
                jnp.asarray(z, jnp.float32), pipe.vae.config
            )
            direct = np.asarray(
                pipe.vae.apply(pipe.vae_params, z,
                               method=type(pipe.vae).decode),
                np.float32,
            )
            np.testing.assert_allclose(imgs, direct, atol=1e-5)
        finally:
            pipe._decode_mode = "auto"


class TestInferenceLoRA:
    def test_lora_path_merges_at_load(self, pipe, tmp_path):
        """from_pretrained(lora_path=...) merges trained factors into the
        base weights — the reference's pt.py:108-136 inference-LoRA path.
        Zero factors are identity; non-zero factors change the output."""
        import jax

        from f_lite_tpu.train.lora import init_lora_params, save_lora_weights

        pipe.save_pretrained(tmp_path / "model")
        lora = init_lora_params(jax.random.key(3), pipe.dit_params, rank=2)
        # fresh factors have lora_b == 0 (identity merge); make them act
        lora = jax.tree.map(lambda x: x + 0.05, lora)
        save_lora_weights(lora, tmp_path)

        kw = dict(prompt="l", height=16, width=16, num_inference_steps=1,
                  seed=9, output_type="np")
        base = FLitePipeline.from_pretrained(
            tmp_path / "model", load_text_encoder=False)
        base.text_encoder = ZeroTextEncoder(embed_dim=32, seq_len=8)
        with_lora = FLitePipeline.from_pretrained(
            tmp_path / "model", load_text_encoder=False,
            lora_path=tmp_path / "lora_weights.safetensors")
        with_lora.text_encoder = ZeroTextEncoder(embed_dim=32, seq_len=8)
        zero_scale = FLitePipeline.from_pretrained(
            tmp_path / "model", load_text_encoder=False,
            lora_path=tmp_path, lora_scale=0.0)  # dir form + identity
        zero_scale.text_encoder = ZeroTextEncoder(embed_dim=32, seq_len=8)

        a = base(**kw).images
        b = with_lora(**kw).images
        c = zero_scale(**kw).images
        assert not np.array_equal(a, b)
        np.testing.assert_array_equal(a, c)


class TestExportTransferVerification:
    """verify_export_transfer: the order-sensitive D2H integrity guard.

    A remote-backend D2H bug was observed (round 5) to silently shuffle
    tensor contents during `np.asarray` on export — same value multiset,
    wrong order — yielding a structurally valid but functionally garbage
    artifact. The guard must accept a faithful host copy and reject a
    within-tensor shuffle (which permutation-invariant checks like norms
    cannot see)."""

    def _tree(self):
        k = jax.random.key(0)
        return {
            "a": {"kernel": jax.random.normal(k, (64, 3, 4, 16))},
            "b": {"bias": jnp.arange(12.0)},
        }

    def test_faithful_copy_passes(self):
        from f_lite_tpu.pipeline import verify_export_transfer

        tree = self._tree()
        host = jax.tree.map(np.asarray, tree)
        verify_export_transfer(tree, host)  # must not raise

    def test_shuffled_leaf_fails(self):
        from f_lite_tpu.pipeline import verify_export_transfer

        tree = self._tree()
        host = jax.tree.map(np.asarray, tree)
        flat = host["a"]["kernel"].ravel().copy()
        rng = np.random.RandomState(0)
        rng.shuffle(flat)  # same multiset, scrambled order
        host["a"]["kernel"] = flat.reshape(host["a"]["kernel"].shape)
        with pytest.raises(RuntimeError, match="scrambled"):
            verify_export_transfer(tree, host)

    def test_save_pretrained_runs_guard(self, tmp_path, monkeypatch):
        # end-to-end: a corrupting np.asarray at export time must abort
        # save_pretrained rather than write a garbage artifact
        import f_lite_tpu.pipeline as plmod

        cfg = DiTConfig(in_channels=4, patch_size=2, hidden_size=64,
                        depth=2, num_heads=2, cross_attn_input_size=32)
        model = DiT(cfg)
        import flax.linen as nn

        params = nn.meta.unbox(model.init(
            jax.random.key(0),
            jnp.zeros((1, 8, 8, 4)), jnp.zeros((1, 8, 32)),
            jnp.ones((1, 8), jnp.bool_), jnp.zeros((1,)),
        ))
        pipe = FLitePipeline(model, params, None, None, None)
        real_tree_map = jax.tree.map

        def corrupting_tree_map(f, tree, *rest):
            out = real_tree_map(f, tree, *rest)
            if f is np.asarray:
                leaves, treedef = jax.tree_util.tree_flatten(out)
                # largest *non-constant* leaf: shuffling a zero-init
                # kernel (e.g. adaLN) would be a no-op corruption
                big = max(range(len(leaves)),
                          key=lambda i: float(np.var(leaves[i]))
                          * leaves[i].size)
                flat = np.asarray(leaves[big]).ravel().copy()
                np.random.RandomState(0).shuffle(flat)
                leaves[big] = flat.reshape(leaves[big].shape)
                out = jax.tree_util.tree_unflatten(treedef, leaves)
            return out

        monkeypatch.setattr(plmod.jax.tree, "map", corrupting_tree_map)
        with pytest.raises(RuntimeError, match="scrambled"):
            pipe.save_pretrained(tmp_path / "exp")
