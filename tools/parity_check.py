"""Per-step latent parity harness: JAX stack vs the torch oracle.

North-star gate (BASELINE.md): per-step latent MSE < 1e-3 vs the PyTorch
reference. Noise and timesteps are injected (not generator-derived) since
torch and JAX RNGs differ (SURVEY.md §7.3).

Runs a full Euler trajectory with the SAME initial noise through (a) the
torch oracle denoiser loop and (b) the jitted JAX sampler, reporting
per-step latent MSE. Works on a random checkpoint (default) or a converted
one (--checkpoint).

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
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--size", type=int, default=256, help="image px")
    p.add_argument("--guidance_scale", type=float, default=6.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true",
                   help="run the JAX side in bf16 (parity bound loosens)")
    p.add_argument("--threshold", type=float, default=1e-3)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from f_lite_tpu.convert import convert_dit_state_dict
    from f_lite_tpu.models.dit import DiT, DiTConfig
    from f_lite_tpu.ops.timesteps import resolution_alpha, shift_t
    from torch_oracle import make_random_state_dict, oracle_dit_forward

    rs = np.random.RandomState(args.seed)

    if args.checkpoint:
        ck = Path(args.checkpoint)
        cfg_d = json.loads((ck / "dit" / "config.json").read_text())
        from f_lite_tpu.pipeline import _config_kwargs, load_params_safetensors

        cfg = DiTConfig(**_config_kwargs(DiTConfig, cfg_d),
                        use_pallas_attention=False)
        flax_params = {"params": load_params_safetensors(
            ck / "dit" / "flax_params.safetensors")}
        raise SystemExit(
            "checkpoint mode requires the matching torch state dict for the "
            "oracle side; use tests/test_parity.py patterns for converted "
            "checkpoints, or run without --checkpoint for the random harness"
        )
    cfg = DiTConfig(
        in_channels=16, patch_size=2, hidden_size=128, depth=4,
        num_heads=4, mlp_ratio=2.0, cross_attn_input_size=64,
        residual_v=True, use_pallas_attention=False,
    )
    sd = make_random_state_dict(cfg, seed=args.seed)
    flax_params = convert_dit_state_dict(
        {k: v.numpy() for k, v in sd.items()}, cfg
    )

    lat = args.size // 8
    b, s = 1, 16
    z0 = rs.randn(b, cfg.in_channels, lat, lat).astype(np.float32)
    ctx = rs.randn(b, s, cfg.cross_attn_input_size).astype(np.float32)
    neg = np.zeros_like(ctx)
    mask = np.ones((b, s), bool)

    alpha = resolution_alpha(lat * lat)
    g = args.guidance_scale

    model = DiT(cfg if not args.bf16 else DiTConfig(
        **{**cfg.__dict__, "dtype": jnp.bfloat16}
    ))
    jparams = jax.tree.map(jnp.asarray, flax_params)

    @jax.jit
    def jax_step(z, t_scalar):
        z_in = jnp.concatenate([z, z], 0)
        c_in = jnp.concatenate([jnp.asarray(neg), jnp.asarray(ctx)], 0)
        m_in = jnp.concatenate([jnp.asarray(mask)] * 2, 0)
        t_in = jnp.full((2 * b,), t_scalar, z.dtype)
        out = model.apply(jparams, z_in, c_in, m_in, t_in)
        return out[:b] + g * (out[b:] - out[:b])

    z_t = np.transpose(z0, (0, 2, 3, 1)).copy()      # jax NHWC
    z_o = torch.from_numpy(z0.copy())                # torch NCHW

    worst = 0.0
    print(f"{'step':>4} {'t':>8} {'latent MSE':>12} {'max|d|':>10}")
    for i in range(args.steps, 0, -1):
        t = shift_t(i / args.steps, alpha)
        t_next = shift_t((i - 1) / args.steps, alpha)
        dt = t - t_next

        # torch oracle CFG step
        tt = torch.full((b,), float(t))
        v_pos = oracle_dit_forward(sd, cfg, z_o, torch.from_numpy(ctx),
                                   torch.from_numpy(mask), tt)
        v_neg = oracle_dit_forward(sd, cfg, z_o, torch.from_numpy(neg),
                                   torch.from_numpy(mask), tt)
        v_o = v_neg + g * (v_pos - v_neg)
        z_o = z_o + dt * v_o

        v_j = jax_step(jnp.asarray(z_t), float(t))
        z_t = np.asarray(z_t + dt * np.asarray(v_j, np.float32))

        diff = z_t.transpose(0, 3, 1, 2) - z_o.numpy()
        mse = float((diff ** 2).mean())
        worst = max(worst, mse)
        print(f"{args.steps - i + 1:>4} {t:>8.4f} {mse:>12.3e} "
              f"{np.abs(diff).max():>10.3e}")

    ok = worst < args.threshold
    print(f"\nworst per-step latent MSE: {worst:.3e} "
          f"({'PASS' if ok else 'FAIL'} @ {args.threshold})")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
