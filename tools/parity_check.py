"""Per-step latent parity harness: JAX stack vs the torch oracle.

North-star gate (BASELINE.md): per-step latent MSE < 1e-3 vs the PyTorch
reference. Noise and timesteps are injected (not generator-derived) since
torch and JAX RNGs differ (SURVEY.md §7.3).

Runs a full Euler trajectory with the SAME initial noise and reports TWO
curves:

- `per_step` (the BASELINE bar): at each step both frameworks evaluate
  the SAME latent (the fp32 torch oracle's trajectory) and the one-step
  results `z + dt*v` are compared — this is per-step parity, isolated
  from cross-step accumulation. Gated at < 1e-3.
- `drift` (the honest secondary): a free-running JAX trajectory is
  advanced by its own velocities alongside; its distance to the oracle
  trajectory at each step is the cumulative end-to-end divergence
  (VERDICT r3 "lead with final-step drift"). Reported, not gated — over
  many steps it measures trajectory sensitivity as much as parity.

With --bf16 the torch oracle's weights are ALSO rounded to bf16 (both
frameworks load the same bf16 checkpoint in real serving — reference
`pipeline.py` runs torch_dtype=bfloat16) while torch computes in fp32,
so the per-step number measures the JAX bf16 compute path against a
high-precision oracle on identical weights, not weight-storage rounding.

Two modes:
- default: a random tiny model (state dict generated torch-side, converted).
- `--checkpoint DIR`: a converted framework checkpoint. Its flax params are
  INVERTED back to a torch state dict (convert/jax_to_torch.py — the round
  trip is bitwise exact, tests/test_convert_roundtrip.py) and the torch
  side runs that state dict through the ACTUAL reference model code
  (`/root/reference/f_lite/model.py` via tests/ref_stubs.py) when the
  architecture is representable there (the in-repo reference has no
  `residual_v` and hardcodes the v1 cross-attn pattern — SURVEY.md §0.1.2);
  otherwise through tests/torch_oracle.py, which is itself pinned to the
  reference by tests/test_reference_parity.py::TestOracleAgreesWithReference.
  Select explicitly with --oracle reference|spec.

  python tools/parity_check.py --steps 8 --size 256 [--bf16]
  python tools/parity_check.py --checkpoint ./f-lite-7b-tpu --steps 30
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, default=None,
                   help="converted checkpoint dir (default: random tiny)")
    p.add_argument("--oracle", choices=("auto", "reference", "spec"),
                   default="auto",
                   help="torch side: the real reference model code, the "
                        "spec oracle (tests/torch_oracle.py), or auto "
                        "(reference when the config is representable)")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--size", type=int, default=256, help="image px")
    p.add_argument("--guidance_scale", type=float, default=6.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true",
                   help="run the JAX side in bf16 (parity bound loosens)")
    p.add_argument("--context_len", type=int, default=16)
    # random-model architecture knobs (ignored with --checkpoint): the
    # VERDICT-r3 artifact runs a 1-2B-scale width through 30 bf16 steps
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--mlp_ratio", type=float, default=2.0)
    p.add_argument("--residual_v", action="store_true", default=True)
    p.add_argument("--no_residual_v", dest="residual_v",
                   action="store_false")
    p.add_argument("--threshold", type=float, default=1e-3)
    p.add_argument("--json_out", type=str, default=None,
                   help="write per-step MSE records to this JSON file")
    return p.parse_args(argv)


def _reference_representable(cfg) -> bool:
    """Can /root/reference/f_lite/model.py express this architecture?

    The in-repo reference DiT (`model.py:419-433`) has no residual_v
    (SURVEY.md §0.1.2), shared AdaLN only, and hardcodes cross-attn on
    `idx % 4 == 0 or idx < 8` (`model.py:464`).
    """
    return (
        not cfg.residual_v
        and cfg.adaln_mode == "shared"
        and not cfg.cross_attn_all
        and cfg.cross_attn_first_n == 8
        and cfg.cross_attn_period == 4
    )


def _make_reference_fn(sd_np, cfg):
    """Load the inverted state dict into the real reference model."""
    import torch

    from ref_stubs import load_reference_model

    ref_mod = load_reference_model("model")
    model = ref_mod.DiT(
        in_channels=cfg.in_channels,
        patch_size=cfg.patch_size,
        hidden_size=cfg.hidden_size,
        depth=cfg.depth,
        num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio,
        cross_attn_input_size=cfg.cross_attn_input_size,
        train_bias_and_rms=cfg.train_bias_and_rms,
        use_rope=cfg.use_rope,
        rope_base=int(cfg.rope_base),
        dynamic_softmax_temperature=cfg.dynamic_softmax_temperature,
    )
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd_np.items()}, strict=False
    )
    if unexpected:
        raise ValueError(f"unexpected keys for reference model: {unexpected}")
    buffers = {k for k, _ in model.named_buffers()}
    stray = set(missing) - buffers
    if stray:
        raise ValueError(f"missing parameter keys: {sorted(stray)}")
    model.eval()

    @torch.no_grad()
    def fn(z_nchw, ctx, mask, t):
        return model(z_nchw, ctx, mask.float(), t)

    return fn, "reference (/root/reference/f_lite/model.py)"


def _make_spec_fn(sd_np, cfg):
    import torch

    from torch_oracle import oracle_dit_forward

    sd = {k: torch.from_numpy(v) for k, v in sd_np.items()}

    def fn(z_nchw, ctx, mask, t):
        return oracle_dit_forward(sd, cfg, z_nchw, ctx, mask, t)

    return fn, "spec oracle (tests/torch_oracle.py)"


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from f_lite_tpu.convert import convert_dit_state_dict, invert_dit_params
    from f_lite_tpu.models.dit import DiT, DiTConfig
    from f_lite_tpu.ops.timesteps import resolution_alpha, shift_t
    from torch_oracle import make_random_state_dict

    rs = np.random.RandomState(args.seed)

    if args.checkpoint:
        ck = Path(args.checkpoint)
        cfg_d = json.loads((ck / "dit" / "config.json").read_text())
        from f_lite_tpu.pipeline import _config_kwargs, load_params_safetensors

        cfg = DiTConfig(**{
            **_config_kwargs(DiTConfig, cfg_d),
            "use_pallas_attention": False,
        })
        flax_params = {"params": load_params_safetensors(
            ck / "dit" / "flax_params.safetensors")}
        sd_np = invert_dit_params(flax_params, cfg)
        # bf16-saved checkpoints invert to ml_dtypes.bfloat16 arrays,
        # which torch.from_numpy cannot consume — cast like export_torch
        import numpy as _np

        sd_np = {k: _np.asarray(v, _np.float32) for k, v in sd_np.items()}
    else:
        cfg = DiTConfig(
            in_channels=16, patch_size=2, hidden_size=args.width,
            depth=args.depth, num_heads=args.num_heads,
            mlp_ratio=args.mlp_ratio,
            cross_attn_input_size=max(64, args.width // 2),
            residual_v=args.residual_v, use_pallas_attention=False,
        )
        sd = make_random_state_dict(cfg, seed=args.seed)
        sd_np = {k: v.numpy() for k, v in sd.items()}
        flax_params = convert_dit_state_dict(sd_np, cfg)

    oracle = args.oracle
    if oracle == "auto":
        oracle = "reference" if _reference_representable(cfg) else "spec"
    if oracle == "reference" and not _reference_representable(cfg):
        raise SystemExit(
            "--oracle reference: this architecture is not representable in "
            "the in-repo reference model (residual_v / per-block AdaLN / "
            "non-default cross pattern — SURVEY.md §0.1.2); use "
            "--oracle spec"
        )
    if args.bf16:
        # serving stores bf16 weights; round the oracle's copy the same
        # way so both sides compute from identical checkpoint values
        # (torch still COMPUTES in fp32 — the high-precision oracle)
        import ml_dtypes

        sd_np = {
            k: np.asarray(v, ml_dtypes.bfloat16).astype(np.float32)
            for k, v in sd_np.items()
        }
    torch_fn, oracle_desc = (
        _make_reference_fn(sd_np, cfg) if oracle == "reference"
        else _make_spec_fn(sd_np, cfg)
    )
    print(f"torch side: {oracle_desc}")

    lat = args.size // 8
    b, s = 1, args.context_len
    z0 = rs.randn(b, cfg.in_channels, lat, lat).astype(np.float32)
    ctx = rs.randn(b, s, cfg.cross_attn_input_size).astype(np.float32)
    neg = np.zeros_like(ctx)
    mask = np.ones((b, s), bool)

    alpha = resolution_alpha(lat * lat)
    g = args.guidance_scale

    model = DiT(cfg if not args.bf16 else DiTConfig(
        **{**cfg.__dict__, "dtype": jnp.bfloat16}
    ))
    # --bf16 runs the serving configuration: bf16-RESIDENT weights (what
    # from_pretrained(dtype=bf16) loads), not just bf16 compute. Params
    # must be an ARGUMENT of the jitted fn — closing over them captures
    # multi-GB constants into the HLO, which stalls compilation (and the
    # remote-TPU tunnel) at real model sizes.
    pdtype = jnp.bfloat16 if args.bf16 else jnp.float32
    jparams = jax.device_put(
        jax.tree.map(lambda x: jnp.asarray(x, pdtype), flax_params)
    )

    @jax.jit
    def jax_step(params, z, t_scalar):
        z_in = jnp.concatenate([z, z], 0)
        c_in = jnp.concatenate([jnp.asarray(neg), jnp.asarray(ctx)], 0)
        m_in = jnp.concatenate([jnp.asarray(mask)] * 2, 0)
        t_in = jnp.full((2 * b,), t_scalar, z.dtype)
        out = model.apply(params, z_in, c_in, m_in, t_in)
        return out[:b] + g * (out[b:] - out[:b])

    z_o = torch.from_numpy(z0.copy())                # oracle, NCHW
    z_free = np.transpose(z0, (0, 2, 3, 1)).copy()   # free-run jax, NHWC

    records = []
    worst = 0.0
    print(f"{'step':>4} {'t':>8} {'per-step MSE':>13} {'max|d|':>10} "
          f"{'drift MSE':>11}")
    for i in range(args.steps, 0, -1):
        t = shift_t(i / args.steps, alpha)
        t_next = shift_t((i - 1) / args.steps, alpha)
        dt = t - t_next

        # torch CFG velocity at the shared (oracle) latent
        tt = torch.full((b,), float(t))
        v_pos = torch_fn(z_o, torch.from_numpy(ctx),
                         torch.from_numpy(mask), tt)
        v_neg = torch_fn(z_o, torch.from_numpy(neg),
                         torch.from_numpy(mask), tt)
        v_o = (v_neg + g * (v_pos - v_neg)).numpy()

        # JAX velocity at the SAME latent → per-step parity (the bar)
        z_shared_nhwc = np.ascontiguousarray(
            z_o.numpy().transpose(0, 2, 3, 1))
        v_j = np.asarray(
            jax_step(jparams, jnp.asarray(z_shared_nhwc), float(t)),
            np.float32).transpose(0, 3, 1, 2)
        step_diff = dt * (v_j - v_o)
        mse = float((step_diff ** 2).mean())
        worst = max(worst, mse)

        # advance the oracle trajectory, and the free-running JAX one
        z_o = z_o + dt * torch.from_numpy(v_o)
        v_free = jax_step(jparams, jnp.asarray(z_free), float(t))
        z_free = np.asarray(z_free + dt * np.asarray(v_free, np.float32))
        drift = float(((z_free.transpose(0, 3, 1, 2)
                        - z_o.numpy()) ** 2).mean())

        records.append({"step": args.steps - i + 1, "t": float(t),
                        "mse": mse,
                        "max_abs": float(np.abs(step_diff).max()),
                        "drift_mse": drift})
        print(f"{args.steps - i + 1:>4} {t:>8.4f} {mse:>13.3e} "
              f"{np.abs(step_diff).max():>10.3e} {drift:>11.3e}")

    final_drift = records[-1]["drift_mse"]
    ok = worst < args.threshold
    print(f"\nworst per-step latent MSE: {worst:.3e} "
          f"({'PASS' if ok else 'FAIL'} @ {args.threshold}); "
          f"free-running final drift: {final_drift:.3e}")
    if args.json_out:
        n_params = sum(
            int(np.prod(v.shape)) for v in sd_np.values()
        )
        Path(args.json_out).write_text(json.dumps({
            "oracle": oracle_desc, "steps": args.steps, "size": args.size,
            "bf16": args.bf16,
            "config": {"hidden_size": cfg.hidden_size, "depth": cfg.depth,
                       "num_heads": cfg.num_heads,
                       "mlp_ratio": cfg.mlp_ratio,
                       "residual_v": cfg.residual_v,
                       "params": n_params},
            "worst_mse": worst, "final_drift": final_drift,
            "threshold": args.threshold, "ok": ok, "per_step": records,
        }, indent=2))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
