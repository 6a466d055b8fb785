"""Key-coverage manifests + strict ingest (VERDICT r4 item 3).

The reference loads released weights with `strict=False`
(`/root/reference/f_lite/pt.py:98-101`) — silent drops. These tests pin the
loud replacement: expected-key enumeration validated against the ACTUAL
reference module tree, checked-in manifests for the three released repos,
and the warn/error behavior of the strict ingest path.
"""

import json
import logging

import numpy as np
import pytest
import torch

from f_lite_tpu.convert.manifest import (
    KeyCoverageError,
    REPO_MANIFESTS,
    build_manifest,
    check_coverage,
    coverage_report,
    expected_torch_keys,
    manifest_for_repo,
    match_manifest,
    released_config,
    validate_against_manifest,
)
from f_lite_tpu.convert.torch_to_jax import convert_dit_state_dict
from f_lite_tpu.models.dit import DiTConfig
from ref_stubs import REFERENCE_DIR, load_reference_model
from torch_oracle import make_random_state_dict

TINY = dict(
    in_channels=16, patch_size=2, hidden_size=64, depth=9, num_heads=4,
    mlp_ratio=2.0, cross_attn_input_size=48,
)


class TestExpectedKeys:
    @pytest.mark.skipif(not REFERENCE_DIR.exists(),
                        reason="reference checkout not mounted")
    @pytest.mark.parametrize("bias_rms", [False, True])
    @pytest.mark.parametrize("use_rope", [True, False])
    def test_matches_actual_reference_module_tree(self, bias_rms, use_rope):
        """expected_torch_keys == the real reference DiT's state_dict keys
        (residual_v=False: the in-repo reference never defines it)."""
        ref = load_reference_model("model")
        model = ref.DiT(
            in_channels=16, patch_size=2, hidden_size=64, depth=9,
            num_heads=4, mlp_ratio=2.0, cross_attn_input_size=48,
            train_bias_and_rms=bias_rms, use_rope=use_rope,
        )
        cfg = DiTConfig(**TINY, train_bias_and_rms=bias_rms,
                        use_rope=use_rope)
        assert expected_torch_keys(cfg) == set(model.state_dict())

    def test_matches_oracle_state_dict(self):
        """...and the test-suite's own synthetic generator (which the
        ingest fixtures are built from), incl. the residual_v keys."""
        cfg = DiTConfig(**TINY, residual_v=True)
        sd = make_random_state_dict(cfg, seed=0)
        assert expected_torch_keys(cfg) == set(sd)

    def test_v2_per_block_adaln(self):
        cfg = DiTConfig(**TINY, adaln_mode="per_block", cross_attn_all=True)
        keys = expected_torch_keys(cfg)
        assert "adaLN_modulation.1.weight" not in keys
        assert "blocks.0.adaLN_modulation.1.weight" in keys
        # cross-attn in EVERY block (model_v2.py:468)
        assert "blocks.5.cross_attn.q.weight" in keys

    def test_lambda_v_not_on_block0(self):
        cfg = DiTConfig(**TINY, residual_v=True)
        keys = expected_torch_keys(cfg)
        assert "blocks.0.self_attn.lambda_v" not in keys
        assert "blocks.1.self_attn.lambda_v" in keys


class TestCoverage:
    def _sd(self, **cfg_kw):
        cfg = DiTConfig(**TINY, residual_v=True, **cfg_kw)
        sd = {k: v.numpy() for k, v in
              make_random_state_dict(cfg, seed=1).items()}
        return cfg, sd

    def test_clean_roundtrip(self):
        cfg, sd = self._sd()
        consumed = set()
        convert_dit_state_dict(sd, cfg, consumed=consumed)
        report = coverage_report(sd, consumed, cfg)
        assert report.clean, report.render()

    def test_unconsumed_key_raises_in_error_mode(self):
        cfg, sd = self._sd()
        sd["blocks.0.self_attn.mystery_param"] = np.zeros(3, np.float32)
        consumed = set()
        convert_dit_state_dict(sd, cfg, consumed=consumed)
        with pytest.raises(KeyCoverageError, match="mystery_param"):
            check_coverage(sd, consumed, cfg, mode="error")

    def test_unconsumed_key_warns_in_warn_mode(self, caplog):
        cfg, sd = self._sd()
        sd["extra.weight"] = np.zeros(3, np.float32)
        consumed = set()
        convert_dit_state_dict(sd, cfg, consumed=consumed)
        logger = logging.getLogger("test_manifest")
        with caplog.at_level(logging.WARNING):
            report = check_coverage(sd, consumed, cfg, mode="warn",
                                    logger=logger)
        assert report.unconsumed == ["extra.weight"]
        assert "extra.weight" in caplog.text

    def test_missing_key_fails_legibly(self, tmp_path):
        """End-to-end through convert_reference_checkpoint: a deleted
        required key surfaces as KeyCoverageError naming the missing keys,
        not a bare KeyError."""
        from f_lite_tpu.convert.ingest import convert_reference_checkpoint

        cfg, sd = self._sd()
        del sd["blocks.1.mlp.gate_proj.weight"]
        pt = tmp_path / "model.pt"
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, pt)
        with pytest.raises(KeyCoverageError,
                           match=r"blocks\.1\.mlp\.gate_proj\.weight"):
            convert_reference_checkpoint(
                tmp_path / "out", pt=pt, width=64, head_dim=16,
                mlp_ratio=2.0, cross_attn_input_size=48,
            )

    def test_probe_does_not_count_as_consumption(self):
        """`k in sd` probes must not mark keys consumed — else residue
        detection breaks. (Every converter probe currently reads on hit,
        so pin the recorder property directly.)"""
        from f_lite_tpu.convert.torch_to_jax import _KeyRecorder

        rec = _KeyRecorder({"a": 1, "b": 2})
        assert "a" in rec and rec.get("b") == 2
        assert rec.consumed == set()
        rec["a"]
        assert rec.consumed == {"a"}


class TestReleasedManifests:
    @pytest.mark.parametrize("repo_id", sorted(REPO_MANIFESTS))
    def test_checked_in_manifest_is_current(self, repo_id):
        """The committed JSON regenerates bit-identically from the config
        — drifts fail here, not at real-weight time."""
        assert manifest_for_repo(repo_id) == build_manifest(repo_id)

    @pytest.mark.parametrize("repo_id", sorted(REPO_MANIFESTS))
    def test_manifest_keys_convert_cleanly(self, repo_id):
        """A synthetic state dict with EXACTLY the manifest's key set (at
        tiny widths, real released depth/pattern) converts with full
        coverage — proves the day-one real-weight key inventory is
        consumable end-to-end."""
        released = released_config(repo_id)
        cfg = DiTConfig(
            in_channels=16, patch_size=2, hidden_size=64, num_heads=4,
            mlp_ratio=4.0, cross_attn_input_size=48,
            depth=released.depth, residual_v=released.residual_v,
            train_bias_and_rms=released.train_bias_and_rms,
            cross_attn_first_n=released.cross_attn_first_n,
            cross_attn_period=released.cross_attn_period,
        )
        # tiny-width key set == released key set (keys don't see width)
        assert expected_torch_keys(cfg) == set(
            manifest_for_repo(repo_id)["keys"])
        sd = {k: v.numpy() for k, v in
              make_random_state_dict(cfg, seed=2).items()}
        consumed = set()
        convert_dit_state_dict(sd, cfg, consumed=consumed)
        assert coverage_report(sd, consumed, cfg).clean

    def test_match_manifest_identifies_repo(self):
        m = manifest_for_repo("Freepik/F-Lite-7B")
        got = match_manifest(m["keys"])
        assert got is not None
        # 10B and 7B share depth/pattern -> identical key sets; any
        # Freepik match is correct, the config diff is in the shapes
        assert got[0] in REPO_MANIFESTS

    def test_validate_against_manifest(self):
        m = manifest_for_repo("Freepik/F-Lite")
        present = set(m["keys"]) - {"blocks.3.norm1.weight"}
        present.add("blocks.3.unexpected")
        missing, unexpected = validate_against_manifest(present, m)
        assert missing == ["blocks.3.norm1.weight"]
        assert unexpected == ["blocks.3.unexpected"]


class TestStrictIngestEnd2End:
    def test_warn_by_default_still_converts(self, tmp_path, caplog):
        cfg = DiTConfig(**TINY, residual_v=True)
        sd = {k: v for k, v in make_random_state_dict(cfg, seed=3).items()}
        sd["stray.weight"] = torch.zeros(4)
        pt = tmp_path / "model.pt"
        torch.save(sd, pt)
        from f_lite_tpu.convert.ingest import convert_reference_checkpoint

        with caplog.at_level(logging.WARNING):
            out = convert_reference_checkpoint(
                tmp_path / "out", pt=pt, width=64, head_dim=16,
                mlp_ratio=2.0, cross_attn_input_size=48,
            )
        assert (out / "dit" / "flax_params.safetensors").exists()
        assert "stray.weight" in caplog.text

    def test_error_mode_rejects_stray_key(self, tmp_path):
        cfg = DiTConfig(**TINY, residual_v=True)
        sd = {k: v for k, v in make_random_state_dict(cfg, seed=3).items()}
        sd["stray.weight"] = torch.zeros(4)
        pt = tmp_path / "model.pt"
        torch.save(sd, pt)
        from f_lite_tpu.convert.ingest import convert_reference_checkpoint

        with pytest.raises(KeyCoverageError, match="stray.weight"):
            convert_reference_checkpoint(
                tmp_path / "out", pt=pt, width=64, head_dim=16,
                mlp_ratio=2.0, cross_attn_input_size=48, strict="error",
            )
