"""Front-end logic tests: wildcard expansion, prompt composition, dated
paths, generation controller, ComfyUI node plumbing."""

import random
import re
from pathlib import Path

import numpy as np
import pytest

from f_lite_tpu.gui import (
    GenerationController,
    PRESET_RESOLUTIONS,
    compose_prompt,
    dated_output_path,
    expand_wildcards,
)


class TestWildcards:
    def test_choice_expansion(self):
        rng = random.Random(0)
        out = expand_wildcards("a {red|green|blue} car", rng)
        assert out in ("a red car", "a green car", "a blue car")

    def test_nested_choices(self):
        rng = random.Random(1)
        out = expand_wildcards("{a {b|c}|d}", rng)
        assert out in ("a b", "a c", "d")

    def test_file_wildcard(self, tmp_path):
        (tmp_path / "animals.txt").write_text("cat\ndog\n\n")
        rng = random.Random(2)
        out = expand_wildcards(
            "a __animals__ sleeping", rng, wildcard_dir=tmp_path
        )
        assert out in ("a cat sleeping", "a dog sleeping")

    def test_missing_file_left_alone(self):
        out = expand_wildcards("a __nope__ x", random.Random(0),
                               wildcard_dir="/nonexistent")
        assert out == "a __nope__ x"

    def test_no_wildcards_identity(self):
        assert expand_wildcards("plain prompt") == "plain prompt"


class TestPromptCompose:
    def test_all_parts(self):
        assert compose_prompt("cat", "photo of", "4k") == \
            "photo of, cat, 4k"

    def test_empty_parts(self):
        assert compose_prompt("cat") == "cat"
        assert compose_prompt("cat", "", "  ") == "cat"


class TestMisc:
    def test_dated_path(self, tmp_path):
        p = dated_output_path(tmp_path)
        assert p.parent.parent == tmp_path
        assert re.match(r"\d{4}-\d{2}-\d{2}", p.parent.name)
        assert p.suffix == ".png"

    def test_controller(self):
        c = GenerationController()
        assert not c.should_stop
        c.request_stop()
        assert c.should_stop
        c.reset()
        assert not c.should_stop

    def test_presets_sane(self):
        for w, h in PRESET_RESOLUTIONS.values():
            assert w % 16 == 0 and h % 16 == 0


class TestComfyNode:
    def test_node_registration_and_inputs(self):
        from f_lite_tpu.comfyui import (
            NODE_CLASS_MAPPINGS,
            NODE_DISPLAY_NAME_MAPPINGS,
            FLiteNode,
        )

        assert "FLiteTPU" in NODE_CLASS_MAPPINGS
        assert NODE_CLASS_MAPPINGS["FLiteTPU"] is FLiteNode
        spec = FLiteNode.INPUT_TYPES()
        req = spec["required"]
        for key in ("model", "prompt", "width", "height", "steps",
                    "guidance_scale", "seed", "use_apg"):
            assert key in req
        assert FLiteNode.RETURN_TYPES == ("IMAGE",)

    def test_node_generate_with_cached_pipeline(self, tmp_path, monkeypatch):
        # Inject a tiny pipeline into the cache and drive the node
        import jax
        import jax.numpy as jnp

        import f_lite_tpu.comfyui as cnode
        from f_lite_tpu.models.dit import DiT, DiTConfig
        from f_lite_tpu.models.vae import AutoencoderKL, VAEConfig
        from f_lite_tpu.pipeline import FLitePipeline
        from f_lite_tpu.text.encoder import ZeroTextEncoder

        cfg = DiTConfig(
            in_channels=4, patch_size=2, hidden_size=64, depth=2,
            num_heads=4, mlp_ratio=2.0, cross_attn_input_size=32,
            use_pallas_attention=False,
        )
        dit = DiT(cfg)
        params = dit.init_params(jax.random.key(0), text_len=8, image_size=8)
        vae = AutoencoderKL(VAEConfig.tiny())
        vparams = vae.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)))
        pipe = FLitePipeline(dit, params, vae, vparams,
                             ZeroTextEncoder(32, 8))
        cnode._PIPELINE_CACHE[("fake", False)] = pipe

        node = cnode.FLiteNode()
        (img,) = node.generate(
            "fake", "a cat", "", 32, 32, 1, 6.0, 0, False, False
        )
        arr = np.asarray(img)
        assert arr.shape == (1, 32, 32, 3)
        assert arr.min() >= 0.0 and arr.max() <= 1.0

        # img2img: feed the node's own output back as the IMAGE input
        # (ComfyUI (B, H, W, 3) float [0, 1] contract incl. resize)
        (img2,) = node.generate(
            "fake", "a dog", "", 16, 16, 2, 6.0, 1, False, False,
            image=arr, strength=0.5,
        )
        arr2 = np.asarray(img2)
        assert arr2.shape == (1, 16, 16, 3)
        assert arr2.min() >= 0.0 and arr2.max() <= 1.0

        # batched IMAGE (B frames): one variation per frame
        batch_in = np.concatenate([arr2, 1.0 - arr2], axis=0)
        (img3,) = node.generate(
            "fake", "a bird", "", 16, 16, 2, 6.0, 2, False, False,
            image=batch_in, strength=0.5,
        )
        assert np.asarray(img3).shape == (2, 16, 16, 3)

        # inpainting: ComfyUI MASK ((H, W) float [0, 1], 1 = repaint)
        # with the IMAGE input; a single mask broadcasts over B frames
        m = np.zeros((16, 16), np.float32)
        m[:, 8:] = 1.0
        (img4,) = node.generate(
            "fake", "a boat", "", 16, 16, 2, 6.0, 3, False, False,
            image=batch_in, mask=m, strength=1.0,
        )
        assert np.asarray(img4).shape == (2, 16, 16, 3)
        # batched (B, H, W) masks are accepted too
        (img5,) = node.generate(
            "fake", "a boat", "", 16, 16, 2, 6.0, 3, False, False,
            image=batch_in, mask=np.stack([m, 1.0 - m]), strength=1.0,
        )
        assert np.asarray(img5).shape == (2, 16, 16, 3)

    def test_node_mask_without_image_raises(self):
        import f_lite_tpu.comfyui as cnode

        node = cnode.FLiteNode()
        with pytest.raises(ValueError, match="mask requires an image"):
            node.generate("fake", "x", "", 16, 16, 1, 6.0, 0, False,
                          False, mask=np.ones((16, 16), np.float32))
