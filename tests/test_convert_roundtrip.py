"""Conversion round-trip proof: torch -> JAX -> torch is bitwise exact.

Every step of the weight conversion (convert/torch_to_jax.py and its
inverse convert/jax_to_torch.py) is a transpose, reshape, zero-pad/strip,
or stack/unstack of float32 numpy — so the round trip must be EXACT
(max|delta| == 0), not approximately close. Covered layouts: v1 shared
AdaLN, residual_v, v2 per-block AdaLN + cross-everywhere, scan-stacked,
pipeline-stage-stacked, zero-padded heads, and the VAE.

The inverted state dict must also load into the ACTUAL reference model
code (`/root/reference/f_lite/model.py` via tests/ref_stubs.py) with no
unexpected keys — proving exported checkpoints are reference-consumable
(the gap VERDICT round 2 item 1 flagged).
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
import torch

sys.path.insert(0, "tools")

from f_lite_tpu.convert import (
    convert_dit_state_dict,
    convert_vae_state_dict,
    invert_dit_params,
    invert_vae_params,
)
from f_lite_tpu.models.dit import DiTConfig
from f_lite_tpu.models.vae import VAEConfig
from torch_oracle import make_random_state_dict

from test_vae_convert import _diffusers_keys


def _np_sd(sd):
    return {k: v.numpy() if isinstance(v, torch.Tensor) else v
            for k, v in sd.items()}


def _assert_exact(original: dict, recovered: dict):
    assert set(recovered) == set(original), (
        sorted(set(original) - set(recovered))[:5],
        sorted(set(recovered) - set(original))[:5],
    )
    for k, v in original.items():
        got = recovered[k]
        assert got.shape == tuple(v.shape), (k, got.shape, v.shape)
        assert np.array_equal(got, np.asarray(v)), (
            k, float(np.abs(got - np.asarray(v)).max())
        )


V1 = dict(
    in_channels=16, patch_size=2, hidden_size=64, depth=6, num_heads=4,
    mlp_ratio=2.0, cross_attn_input_size=48, cross_attn_first_n=2,
    cross_attn_period=2, train_bias_and_rms=True,
    use_pallas_attention=False,
)


class TestDiTRoundTrip:
    @pytest.mark.parametrize(
        "overrides",
        [
            {},
            {"residual_v": True},
            {"train_bias_and_rms": False},
            {"adaln_mode": "per_block", "cross_attn_all": True, "depth": 4},
            {"scan_layers": True},
            {"scan_layers": True, "residual_v": True},
            {
                "scan_layers": True,
                "adaln_mode": "per_block",
                "cross_attn_all": True,
                "depth": 4,
            },
            {"num_heads": 2, "padded_heads": 8},  # head_dim 32, pad 2->8
            {
                "scan_layers": True,
                "residual_v": True,
                "num_heads": 2,
                "padded_heads": 8,
            },
        ],
        ids=[
            "v1", "residual_v", "no_bias_rms", "v2_per_block", "scan",
            "scan_residual_v", "scan_v2", "padded_heads",
            "scan_residual_padded",
        ],
    )
    def test_exact(self, overrides):
        cfg = DiTConfig(**{**V1, **overrides})
        sd = _np_sd(make_random_state_dict(cfg, seed=11))
        params = convert_dit_state_dict(sd, cfg)
        recovered = invert_dit_params(params, cfg)
        _assert_exact(sd, recovered)

    def test_pipeline_layout_exact(self):
        cfg = DiTConfig(
            **{**V1, "scan_layers": True, "residual_v": True,
               "pipeline_stages": 2, "pipeline_microbatches": 2}
        )
        sd = _np_sd(make_random_state_dict(cfg, seed=7))
        params = convert_dit_state_dict(sd, cfg)  # folds to pipeline layout
        # sanity: the tree really is in pipeline layout
        assert "pipe" in params["params"]["blocks_rest"]
        recovered = invert_dit_params(params, cfg)
        _assert_exact(sd, recovered)

    def test_quantized_params_refuse_export(self):
        cfg = DiTConfig(**V1)
        sd = _np_sd(make_random_state_dict(cfg, seed=0))
        params = convert_dit_state_dict(sd, cfg)
        params["params"]["blocks_0"]["mlp"]["gate_proj"] = {
            "w8": np.zeros((64, 128), np.int8),
            "scale": np.ones((128,), np.float32),
        }
        with pytest.raises(ValueError, match="quantized"):
            invert_dit_params(params, cfg)


class TestVAERoundTrip:
    def test_exact(self):
        cfg = VAEConfig.tiny()
        rs = np.random.RandomState(5)
        sd = {k: rs.randn(*shape).astype(np.float32)
              for k, shape in _diffusers_keys(cfg).items()}
        params = convert_vae_state_dict(sd, cfg)
        recovered = invert_vae_params(params, cfg)
        _assert_exact(sd, recovered)


class TestReferenceLoadability:
    """The inverted state dict drives the REAL reference model code."""

    def _ref(self):
        from ref_stubs import REFERENCE_DIR, load_reference_model

        if not REFERENCE_DIR.exists():
            pytest.skip("reference checkout not mounted")
        return load_reference_model("model")

    def test_strict_load_and_forward(self):
        ref_mod = self._ref()
        kw = dict(
            in_channels=16, patch_size=2, hidden_size=64, depth=6,
            num_heads=4, mlp_ratio=2.0, cross_attn_input_size=48,
            train_bias_and_rms=True, use_rope=True,
        )
        model = ref_mod.DiT(**kw)
        g = torch.Generator().manual_seed(3)
        with torch.no_grad():
            for prm in model.parameters():
                prm.copy_(torch.randn(prm.shape, generator=g) * 0.05)
        model.eval()
        sd0 = {k: v.clone() for k, v in model.state_dict().items()}

        # reference -> JAX -> reference
        jcfg = DiTConfig(
            **kw, cross_attn_first_n=2, cross_attn_period=2,
            scan_layers=True, use_pallas_attention=False,
        )
        # drop non-parameter buffers (rope tables) for conversion; the
        # converter only consumes parameter keys
        param_keys = {k for k, _ in model.named_parameters()}
        sd_params = {k: v.numpy() for k, v in sd0.items() if k in param_keys}
        params = convert_dit_state_dict(sd_params, jcfg)
        recovered = invert_dit_params(params, jcfg)

        missing, unexpected = model.load_state_dict(
            {k: torch.from_numpy(v) for k, v in recovered.items()},
            strict=False,
        )
        assert not unexpected, unexpected
        buffer_keys = {k for k, _ in model.named_buffers()}
        assert set(missing) <= buffer_keys, (missing, buffer_keys)

        # and the reloaded reference model is numerically unchanged
        rs = np.random.RandomState(1)
        x = torch.from_numpy(rs.randn(1, 16, 8, 8).astype(np.float32))
        ctx = torch.from_numpy(rs.randn(1, 8, 48).astype(np.float32))
        mask = torch.ones(1, 8)
        t = torch.from_numpy(rs.rand(1).astype(np.float32))
        with torch.no_grad():
            out1 = model(x, ctx, mask, t)
        model2 = ref_mod.DiT(**kw)
        model2.load_state_dict(sd0)
        model2.eval()
        with torch.no_grad():
            out0 = model2(x, ctx, mask, t)
        assert torch.equal(out0, out1)


class TestParityCheckCheckpoint:
    """tools/parity_check.py --checkpoint: inverted params through the
    real reference model code (the formerly-dead flag, VERDICT r2 item 2)."""

    def test_checkpoint_mode_vs_reference(self, tmp_path):
        from convert_checkpoint import main as convert_main
        from parity_check import main as parity_main

        cfg = DiTConfig(
            in_channels=16, patch_size=2, hidden_size=64, depth=9,
            num_heads=4, mlp_ratio=2.0, cross_attn_input_size=48,
            train_bias_and_rms=True, use_pallas_attention=False,
        )
        sd = make_random_state_dict(cfg, seed=2)
        torch.save(dict(sd), tmp_path / "m.pt")
        convert_main([
            "--pt", str(tmp_path / "m.pt"), "--head_dim", "16",
            "--no_residual_v", "--train_bias_and_rms",
            "--output_dir", str(tmp_path / "ck"),
        ])
        rc = parity_main([
            "--checkpoint", str(tmp_path / "ck"), "--steps", "2",
            "--size", "64", "--oracle", "reference",
            "--json_out", str(tmp_path / "pc.json"),
        ])
        assert rc == 0
        rep = json.loads((tmp_path / "pc.json").read_text())
        assert rep["ok"] and "reference" in rep["oracle"]

    def test_residual_v_falls_back_to_spec_oracle(self, tmp_path):
        from convert_checkpoint import main as convert_main
        from parity_check import main as parity_main

        cfg = DiTConfig(
            in_channels=16, patch_size=2, hidden_size=64, depth=3,
            num_heads=4, mlp_ratio=4.0, cross_attn_input_size=48,
            residual_v=True, use_pallas_attention=False,
        )
        sd = make_random_state_dict(cfg, seed=4)
        torch.save(dict(sd), tmp_path / "m.pt")
        convert_main([
            "--pt", str(tmp_path / "m.pt"), "--head_dim", "16",
            "--output_dir", str(tmp_path / "ck"),
        ])
        rc = parity_main([
            "--checkpoint", str(tmp_path / "ck"), "--steps", "2",
            "--size", "64",
            "--json_out", str(tmp_path / "pc.json"),
        ])
        assert rc == 0
        rep = json.loads((tmp_path / "pc.json").read_text())
        assert rep["ok"] and "spec oracle" in rep["oracle"]


class TestExportCLI:
    """Full CLI cycle: --pt ingest -> --export_torch -> re-ingest."""

    def test_cycle(self, tmp_path):
        from convert_checkpoint import main as convert_main
        from safetensors.numpy import load_file

        cfg = DiTConfig(
            in_channels=16, patch_size=2, hidden_size=64, depth=3,
            num_heads=4, mlp_ratio=4.0, cross_attn_input_size=48,
            residual_v=True, use_pallas_attention=False,
        )
        sd = _np_sd(make_random_state_dict(cfg, seed=3))
        torch.save(
            {k: torch.from_numpy(v) for k, v in sd.items()},
            tmp_path / "model.pt",
        )
        jax_dir = convert_main([
            "--pt", str(tmp_path / "model.pt"), "--head_dim", "16",
            "--output_dir", str(tmp_path / "jax_ck"),
        ])
        hf_dir = convert_main([
            "--export_torch", str(jax_dir),
            "--output_dir", str(tmp_path / "hf_out"),
            "--pt_file", str(tmp_path / "roundtrip.pt"),
        ])

        # (a) exported safetensors == original state dict, bitwise
        exported = load_file(
            str(hf_dir / "dit_model" / "diffusion_pytorch_model.safetensors")
        )
        _assert_exact(sd, dict(exported))

        # (b) the raw .pt round-trips through the reference's own loading
        # convention (`pt.py:78-101`: torch.load + depth inference)
        rt = torch.load(tmp_path / "roundtrip.pt", weights_only=True)
        _assert_exact(sd, {k: v.numpy() for k, v in rt.items()})

        # (c) the exported repo re-ingests to identical flax params
        cfg_json = json.loads(
            (hf_dir / "dit_model" / "config.json").read_text()
        )
        assert cfg_json["residual_v"] is True
        assert cfg_json["depth"] == 3
        jax_dir2 = convert_main([
            "--hf_dir", str(hf_dir),
            "--output_dir", str(tmp_path / "jax_ck2"),
        ])
        p1 = load_file(str(jax_dir / "dit" / "flax_params.safetensors"))
        p2 = load_file(str(jax_dir2 / "dit" / "flax_params.safetensors"))
        _assert_exact(dict(p1), dict(p2))

    def test_model_index_component_classes(self, tmp_path):
        """model_index.json must name loadable transformers classes: a
        tokenizer dir resolves its tokenizer_class (AutoModel would crash
        diffusers' from_pretrained — tokenizer dirs have no weights), a
        text_encoder dir its architectures[0]."""
        from convert_checkpoint import _hf_component_class

        tok = tmp_path / "tokenizer"
        tok.mkdir()
        (tok / "tokenizer_config.json").write_text(
            json.dumps({"tokenizer_class": "T5Tokenizer"})
        )
        assert _hf_component_class(tok) == "T5Tokenizer"
        (tok / "tokenizer_config.json").write_text(json.dumps({}))
        assert _hf_component_class(tok) == "AutoTokenizer"

        enc = tmp_path / "text_encoder"
        enc.mkdir()
        (enc / "config.json").write_text(
            json.dumps({"architectures": ["T5EncoderModel"]})
        )
        assert _hf_component_class(enc) == "T5EncoderModel"
        (enc / "config.json").write_text(json.dumps({}))
        assert _hf_component_class(enc) == "AutoModel"


class TestV2ExportCycle:
    """Non-v1 architectures must survive the full CLI cycle — export
    previously wrote a v1-labeled config for v2 checkpoints, and the
    --pt ingest rebuilt v2 state dicts as v1 silently."""

    def test_v2_config_round_trips(self, tmp_path):
        from convert_checkpoint import main as convert_main
        from safetensors.numpy import load_file

        cfg = DiTConfig(
            in_channels=16, patch_size=2, hidden_size=64, depth=10,
            num_heads=4, mlp_ratio=2.0, cross_attn_input_size=48,
            adaln_mode="per_block", cross_attn_all=True,
            use_pallas_attention=False,
        )
        sd = _np_sd(make_random_state_dict(cfg, seed=7))
        torch.save(
            {k: torch.from_numpy(v) for k, v in sd.items()},
            tmp_path / "m.pt",
        )
        # --pt ingest detects v2 from the key set (per-block adaLN, a
        # cross tower in block 9 which the v1 pattern would skip)
        jax_dir = convert_main([
            "--pt", str(tmp_path / "m.pt"), "--head_dim", "16",
            "--no_residual_v", "--output_dir", str(tmp_path / "ck"),
        ])
        cfg1 = json.loads((Path(jax_dir) / "dit" / "config.json").read_text())
        assert cfg1["adaln_mode"] == "per_block" and cfg1["cross_attn_all"]

        hf_dir = convert_main([
            "--export_torch", str(jax_dir),
            "--output_dir", str(tmp_path / "hf"),
        ])
        ecfg = json.loads((hf_dir / "dit_model" / "config.json").read_text())
        assert ecfg["adaln_mode"] == "per_block" and ecfg["cross_attn_all"]
        # no vae in the source checkpoint -> no vae entry for consumers
        # to resolve (and none written)
        idx = json.loads((hf_dir / "model_index.json").read_text())
        assert "vae" not in idx

        exported = load_file(
            str(hf_dir / "dit_model" / "diffusion_pytorch_model.safetensors")
        )
        _assert_exact(sd, dict(exported))

        jax2 = convert_main([
            "--hf_dir", str(hf_dir), "--head_dim", "16",
            "--output_dir", str(tmp_path / "ck2"),
        ])
        cfg2 = json.loads((Path(jax2) / "dit" / "config.json").read_text())
        assert cfg2["adaln_mode"] == "per_block" and cfg2["cross_attn_all"]
        p1 = load_file(str(Path(jax_dir) / "dit" / "flax_params.safetensors"))
        p2 = load_file(str(Path(jax2) / "dit" / "flax_params.safetensors"))
        _assert_exact(dict(p1), dict(p2))

    def test_hf_mlp_ratio_inferred_when_config_lacks_it(self):
        """An hf config without mlp_ratio must fall back to the width
        visible in the weights, not a hardcoded 4.0."""
        import argparse

        from convert_checkpoint import _dit_config_from_sd

        args = argparse.Namespace(
            width=64, head_dim=16, cross_attn_input_size=48,
            residual_v=False, mlp_ratio=4.0,
        )
        sd = {"blocks.0.mlp.gate_proj.weight": np.zeros((128, 64),
                                                        np.float32)}
        cfg = _dit_config_from_sd(
            sd, args, {"hidden_size": 64, "num_heads": 4, "depth": 2}
        )
        assert cfg.mlp_ratio == 2.0


class TestParityCheckBf16Checkpoint:
    def test_checkpoint_mode_bf16_params(self, tmp_path):
        """A bf16-saved checkpoint (what a bf16-param pipeline writes)
        must invert and run through the torch oracle — ml_dtypes
        bfloat16 arrays crash torch.from_numpy without the cast."""
        import ml_dtypes
        from safetensors.numpy import load_file, save_file

        from convert_checkpoint import main as convert_main
        from parity_check import main as parity_main

        cfg = DiTConfig(
            in_channels=16, patch_size=2, hidden_size=64, depth=3,
            num_heads=4, mlp_ratio=2.0, cross_attn_input_size=48,
            use_pallas_attention=False,
        )
        sd = make_random_state_dict(cfg, seed=9)
        torch.save(dict(sd), tmp_path / "m.pt")
        convert_main([
            "--pt", str(tmp_path / "m.pt"), "--head_dim", "16",
            "--no_residual_v", "--output_dir", str(tmp_path / "ck"),
        ])
        f = tmp_path / "ck" / "dit" / "flax_params.safetensors"
        p = load_file(str(f))
        save_file({k: v.astype(ml_dtypes.bfloat16) for k, v in p.items()},
                  str(f))
        rc = parity_main([
            "--checkpoint", str(tmp_path / "ck"), "--steps", "1",
            "--size", "64", "--bf16",
            "--json_out", str(tmp_path / "pc.json"),
        ])
        assert rc == 0
