"""Torch-oracle parity: weight conversion + JAX DiT vs reference math.

This is the per-step latent parity harness of SURVEY.md §4(c) — noise and
timesteps injected (not generator-derived), comparing jax vs torch outputs.
North-star bar: per-step latent MSE < 1e-3 (BASELINE.md); at fp32 on tiny
configs we hold a much tighter bound.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from f_lite_tpu.convert import convert_dit_state_dict
from f_lite_tpu.models.dit import DiT, DiTConfig
from torch_oracle import make_random_state_dict, oracle_dit_forward

BASE = dict(
    in_channels=16, patch_size=2, hidden_size=64, depth=5, num_heads=4,
    mlp_ratio=2.0, cross_attn_input_size=48, use_pallas_attention=False,
)


def _run_parity(cfg, seed=0, mask_lens=None):
    sd = make_random_state_dict(cfg, seed=seed)
    rs = np.random.RandomState(seed + 1)
    b, hw, s = 2, 16, 8
    x = rs.randn(b, cfg.in_channels, hw, hw).astype(np.float32)
    ctx = rs.randn(b, s, cfg.cross_attn_input_size).astype(np.float32)
    t = rs.rand(b).astype(np.float32)
    if mask_lens is None:
        mask = np.ones((b, s), bool)
    else:
        mask = np.arange(s)[None, :] < np.asarray(mask_lens)[:, None]

    ref = oracle_dit_forward(
        sd, cfg, torch.from_numpy(x), torch.from_numpy(ctx),
        torch.from_numpy(mask), torch.from_numpy(t),
    ).numpy()

    params = convert_dit_state_dict(
        {k: v.numpy() for k, v in sd.items()}, cfg
    )
    model = DiT(cfg)
    out = model.apply(
        jax.tree.map(jnp.asarray, params),
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(ctx), jnp.asarray(mask), jnp.asarray(t),
    )
    got = np.asarray(out).transpose(0, 3, 1, 2)

    mse = float(((got - ref) ** 2).mean())
    max_err = float(np.abs(got - ref).max())
    assert mse < 1e-9, (mse, max_err)
    return mse, max_err


class TestParity:
    def test_v1_default(self):
        cfg = DiTConfig(**BASE)
        _run_parity(cfg)

    def test_with_bias_and_rms(self):
        cfg = DiTConfig(**BASE, train_bias_and_rms=True)
        _run_parity(cfg, seed=2)

    def test_with_mask(self):
        cfg = DiTConfig(**BASE)
        _run_parity(cfg, seed=3, mask_lens=[8, 5])

    def test_residual_v(self):
        cfg = DiTConfig(**BASE, residual_v=True)
        _run_parity(cfg, seed=4)

    def test_v2_per_block(self):
        cfg = DiTConfig(
            **BASE, adaln_mode="per_block", cross_attn_all=True
        )
        _run_parity(cfg, seed=5)

    def test_deep_cross_pattern(self):
        # depth > first_n so both block kinds are exercised
        cfg = DiTConfig(**{**BASE, "depth": 10, "cross_attn_first_n": 2,
                           "cross_attn_period": 4})
        _run_parity(cfg, seed=6)


class TestConversionDetails:
    def test_depth_inference(self):
        from f_lite_tpu.convert.torch_to_jax import infer_depth

        cfg = DiTConfig(**BASE)
        sd = make_random_state_dict(cfg)
        assert infer_depth(sd) == cfg.depth

    def test_prefix_stripping(self):
        cfg = DiTConfig(**BASE)
        sd = make_random_state_dict(cfg)
        wrapped = {f"module._orig_mod.{k}": v.numpy() for k, v in sd.items()}
        p1 = convert_dit_state_dict(wrapped, cfg)
        p2 = convert_dit_state_dict(
            {k: v.numpy() for k, v in sd.items()}, cfg
        )
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(a, b)

    def test_converted_params_match_init_structure(self):
        cfg = DiTConfig(**BASE)
        sd = make_random_state_dict(cfg)
        conv = convert_dit_state_dict(
            {k: v.numpy() for k, v in sd.items()}, cfg
        )
        model = DiT(cfg)
        init = model.init_params(jax.random.key(0), text_len=8, image_size=16)
        conv_paths = set(
            jax.tree_util.tree_flatten_with_path(conv)[0][i][0].__repr__()
            for i in range(len(jax.tree.leaves(conv)))
        )
        init_paths = set(
            jax.tree_util.tree_flatten_with_path(init)[0][i][0].__repr__()
            for i in range(len(jax.tree.leaves(init)))
        )
        assert conv_paths == init_paths, (
            init_paths - conv_paths, conv_paths - init_paths
        )


class TestPaddedHeads:
    """DiTConfig.padded_heads must be EXACT: zero q/k/v heads produce zero
    attention outputs through zero out-proj rows (the tp-divisibility
    workaround for 7B's 10 / 10B's 12 heads on an 8-chip mesh)."""

    def test_padded_equals_unpadded(self):
        import dataclasses

        cfg = DiTConfig(**BASE)
        sd = make_random_state_dict(cfg, seed=7)
        rs = np.random.RandomState(8)
        b, hw, s = 2, 16, 8
        x = rs.randn(b, cfg.in_channels, hw, hw).astype(np.float32)
        ctx = rs.randn(b, s, cfg.cross_attn_input_size).astype(np.float32)
        t = rs.rand(b).astype(np.float32)
        mask = np.arange(s)[None, :] < np.asarray([8, 5])[:, None]

        def run(c):
            params = convert_dit_state_dict(
                {k: v.numpy() for k, v in sd.items()}, c
            )
            return np.asarray(DiT(c).apply(
                jax.tree.map(jnp.asarray, params),
                jnp.asarray(x.transpose(0, 2, 3, 1)),
                jnp.asarray(ctx), jnp.asarray(mask), jnp.asarray(t),
            ))

        base = run(cfg)
        padded = run(dataclasses.replace(cfg, padded_heads=6))
        np.testing.assert_allclose(padded, base, atol=1e-6, rtol=1e-6)

    def test_load_time_padding_matches_convert_time(self):
        import dataclasses

        from f_lite_tpu.convert.torch_to_jax import pad_head_params

        cfg = DiTConfig(**BASE)
        pcfg = dataclasses.replace(cfg, padded_heads=6)
        sd = {k: v.numpy() for k, v in
              make_random_state_dict(cfg, seed=9).items()}
        at_convert = convert_dit_state_dict(sd, pcfg)
        at_load = pad_head_params(
            convert_dit_state_dict(sd, cfg), cfg.head_dim, 6
        )
        for a, b in zip(
            jax.tree.leaves(at_convert), jax.tree.leaves(at_load)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_scan_layout_padded(self):
        import dataclasses

        cfg = DiTConfig(**{**BASE, "depth": 12})
        sd = make_random_state_dict(cfg, seed=10)
        rs = np.random.RandomState(11)
        x = rs.randn(1, cfg.in_channels, 16, 16).astype(np.float32)
        ctx = rs.randn(1, 8, cfg.cross_attn_input_size).astype(np.float32)
        t = rs.rand(1).astype(np.float32)
        mask = np.ones((1, 8), bool)

        def run(c):
            params = convert_dit_state_dict(
                {k: v.numpy() for k, v in sd.items()}, c
            )
            return np.asarray(DiT(c).apply(
                jax.tree.map(jnp.asarray, params),
                jnp.asarray(x.transpose(0, 2, 3, 1)),
                jnp.asarray(ctx), jnp.asarray(mask), jnp.asarray(t),
            ))

        base = run(cfg)
        padded_scan = run(dataclasses.replace(
            cfg, padded_heads=8, scan_layers=True
        ))
        np.testing.assert_allclose(padded_scan, base, atol=1e-6, rtol=1e-6)


class TestTrajectoryParity:
    """The BASELINE.md bar on the metric it actually names: per-step
    latent MSE over a full injected-noise denoise TRAJECTORY (not a
    single forward), JAX at bf16 vs the torch oracle at fp32, through
    the tools/parity_check.py harness. The recorded 1-2B-scale artifact
    is PARITY_TRAJ.json (30 steps vs the actual reference model code);
    this test runs the same harness at CI size."""

    @pytest.mark.parametrize("oracle_flags", [
        pytest.param(["--no_residual_v"], id="reference_oracle"),
        pytest.param([], id="spec_oracle_residual_v"),
    ])
    def test_bf16_trajectory_under_bar(self, oracle_flags, tmp_path):
        import json
        import sys
        from pathlib import Path

        sys.path.insert(0, str(
            Path(__file__).resolve().parent.parent / "tools"
        ))
        from parity_check import main as parity_main

        out = tmp_path / "traj.json"
        rc = parity_main([
            "--steps", "8", "--size", "128", "--bf16",
            "--width", "128", "--depth", "4",
            "--json_out", str(out), *oracle_flags,
        ])
        assert rc == 0
        rec = json.loads(out.read_text())
        assert rec["ok"] and rec["bf16"]
        assert rec["steps"] == 8 and len(rec["per_step"]) == 8
        assert rec["worst_mse"] < 1e-3
        # cumulative free-running drift is recorded (honest secondary)
        assert rec["final_drift"] == rec["per_step"][-1]["drift_mse"]
        # the reference-code oracle only represents v1 (no residual_v)
        expect_ref = "--no_residual_v" in oracle_flags
        assert ("reference" in rec["oracle"]) == expect_ref
