"""Serving-dtype quality audit: what 30 steps of bf16/int8 do to the
latent trajectory and the decoded image (VERDICT r2 item 2).

The shipping serving mode is int8 W8A8; round 2's only quality
evidence was per-matmul (~0.8% relative error). This tool runs the SAME
random weights and the SAME initial noise through the full 30-step
1024px CFG denoise in multiple dtype modes on the real chip and records
per-step latent MSE plus decoded-image PSNR/max|delta| between modes:

- `--model 1p9b` (the in-repo slurm ablation recipe, 2048x24): fp32
  reference vs bf16 vs int8 — fp32 weights (7.6 GB) fit the 16 GB chip.
- `--model 7b` (flagship width): bf16 vs int8 — a 7B fp32 reference
  (28 GB) cannot exist on one v5e chip, so the fp32 leg at flagship
  width is out of reach here; the 1p9b run bounds bf16-vs-fp32 drift and
  the 7b run bounds the shipping int8-vs-bf16 drift at flagship width.

Reference points: the north-star parity bar is per-step latent MSE <1e-3
vs the torch reference at fp32 (BASELINE.md; tools/parity_check.py
enforces it); this artifact quantifies the additional serving-dtype
drift on top. Results feed QUALITY.json and the README serving headline.

Run: python tools/quality_audit.py --model 1p9b --out QUALITY_1p9b.json
     python tools/quality_audit.py --model 7b  --out QUALITY_7b.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
from pathlib import Path

# this tool's per-step jit fuses differently from the serving scan and
# lands the default (4096, 128) flash block ~1% over the 16MB scoped
# vmem limit — cap the q block (ops/pallas/flash_attention.py)
os.environ.setdefault("F_LITE_FLASH_MAX_BQ", "2048")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def trajectory(model_apply, params, z0, pos, neg, mask, steps, alpha, g,
               compute_dtype):
    """Per-step latents via an explicitly stepped (jitted) Euler loop —
    mirrors sampling/euler.py math 1:1 but keeps every step's latent."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from f_lite_tpu.ops.timesteps import shift_t

    # params passed as an ARGUMENT: a closure would bake them into the
    # lowered program as multi-GB captured constants
    @jax.jit
    def step(p, z, t_scalar):
        # dtype contract matches the serving sampler exactly
        # (sampling/euler.py:70-81): z and t stay fp32 at the model input
        # — the model casts internally — while the text context arrives at
        # the serving dtype (pipeline encodes to bf16). Casting z/t to
        # bf16 here would charge the audit rounding serving never incurs.
        z_in = jnp.concatenate([z, z], 0)
        c_in = jnp.concatenate([neg, pos], 0).astype(compute_dtype)
        m_in = jnp.concatenate([mask, mask], 0)
        t_in = jnp.full((z_in.shape[0],), t_scalar, z.dtype)
        v = model_apply(p, z_in, c_in, m_in, t_in)
        v = v.astype(jnp.float32)
        b = z.shape[0]
        return v[:b] + g * (v[b:] - v[:b])

    z = jnp.asarray(z0, jnp.float32)
    # warm up: the int8 per-step program compiles ~2 min (quant/dequant
    # ops per projection, no scan dedup) vs seconds for fp32/bf16 —
    # charging that to traj_seconds made int8 look 7x slower per step
    # than it is. Compile is recorded separately.
    c0 = time.time()
    np.asarray(step(params, z, float(shift_t(1.0, alpha))))
    compile_s = time.time() - c0
    lat = []
    t0 = time.time()
    for i in range(steps, 0, -1):
        t = shift_t(i / steps, alpha)
        t_next = shift_t((i - 1) / steps, alpha)
        v = step(params, z, float(t))
        z = z + (t - t_next) * v
        lat.append(np.asarray(z, np.float32))  # forces completion
    return lat, time.time() - t0, compile_s


def quantize_consuming(params):
    """quantize_dit_params, but deletes each source kernel buffer after
    its int8 replacement materializes — peak device memory stays ~the
    bf16 tree (14 GB at 7B) instead of bf16+int8 (21 GB > chip)."""
    import jax
    import jax.numpy as jnp

    from f_lite_tpu.quant import _N_OUT_DIMS, QUANT_TARGETS, quantize_kernel

    def rec(node, name=""):
        if isinstance(node, dict):
            if (
                name in QUANT_TARGETS
                and "kernel" in node
                and not isinstance(node["kernel"], dict)
            ):
                out = dict(node)
                kernel = out.pop("kernel")
                q = quantize_kernel(kernel, _N_OUT_DIMS.get(name, 1))
                # force completion before deleting the source (this
                # platform's block_until_ready returns early — fetch a
                # scalar instead, PERF.md gotcha)
                float(jnp.sum(q["scale"]))
                kernel.delete()
                out.update(q)
                return out
            return {k: rec(v, k) for k, v in node.items()}
        return node

    return rec(params)


def fill_zero_leaves(params, seed):
    """Fresh-init DiT outputs are exactly ZERO — final_proj and the AdaLN
    modulation heads are zero-init (reference model.py:454-479 parity) —
    so a raw-init trajectory never moves and every dtype mode compares
    0 == 0. Fill each all-zero leaf (those heads + ordinary zero biases)
    with small normal noise so the audit drives a live network."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rs = np.random.RandomState(seed)

    def rec(x):
        if hasattr(x, "shape") and x.size and not bool(jnp.any(x)):
            return jnp.asarray(
                rs.standard_normal(x.shape) * 0.02, x.dtype
            )
        return x

    return jax.tree.map(rec, params)


def compare(tr_a, tr_b):
    import numpy as np

    per_step = []
    for a, b in zip(tr_a, tr_b):
        d = a - b
        per_step.append({
            "mse": float((d ** 2).mean()),
            "max_abs": float(np.abs(d).max()),
        })
    return {
        "worst_step_mse": max(s["mse"] for s in per_step),
        "final_mse": per_step[-1]["mse"],
        "final_max_abs": per_step[-1]["max_abs"],
        "per_step": per_step,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="1p9b", choices=("1p9b", "7b"))
    ap.add_argument("--steps", type=int, default=30)  # validated >= 1
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--guidance_scale", type=float, default=6.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--modes", default=None,
                    help="comma subset of the model's modes (debug)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.steps < 1:
        raise SystemExit(f"--steps must be >= 1, got {args.steps}")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from f_lite_tpu.models.dit import DiT, DiTConfig
    from f_lite_tpu.models.vae import AutoencoderKL, VAEConfig
    from f_lite_tpu.ops.timesteps import resolution_alpha

    if args.model == "1p9b":
        base = dict(hidden_size=2048, depth=24, num_heads=8,
                    residual_v=True, cross_attn_input_size=4096)
        master_dtype = jnp.float32
        modes = ["fp32", "bf16", "int8"]
    else:
        base = dict(hidden_size=2560, depth=40, num_heads=10,
                    residual_v=True, cross_attn_input_size=4096)
        master_dtype = jnp.bfloat16  # fp32 7B (28 GB) exceeds the chip
        modes = ["bf16", "int8"]
    common = dict(scan_layers=True, **base)
    if args.modes:
        wanted = args.modes.split(",")
        bad = [m for m in wanted if m not in modes]
        if bad:
            raise SystemExit(
                f"--modes {bad} not available for --model {args.model} "
                f"(valid: {modes}) — a silent intersection would burn "
                "minutes of chip time writing an empty artifact"
            )
        modes = [m for m in modes if m in wanted]

    cfg_master = DiTConfig(dtype=master_dtype, param_dtype=master_dtype,
                           **common)
    model = DiT(cfg_master)
    print(f"init {args.model} params ({np.dtype(master_dtype).name}) ...",
          flush=True)
    params = model.init_params(jax.random.key(args.seed), text_len=128,
                               image_size=64)
    params = fill_zero_leaves(params, args.seed + 2)

    lat = args.size // 8
    rs = np.random.RandomState(args.seed + 1)
    z0 = rs.randn(1, lat, lat, 16).astype(np.float32)
    ctx = jnp.asarray(
        rs.randn(1, 128, base["cross_attn_input_size"]) * 0.5, jnp.float32
    )
    neg = jnp.zeros_like(ctx)
    mask = jnp.ones((1, 128), jnp.bool_)
    alpha = resolution_alpha(lat * lat)
    g = args.guidance_scale

    trajs: dict[str, list] = {}
    times: dict[str, float] = {}
    compiles: dict[str, float] = {}
    for mode in modes:
        if mode == "int8":
            print("quantizing (consuming walk) ...", flush=True)
            params = quantize_consuming(params)
            cfg = DiTConfig(dtype=jnp.bfloat16, param_dtype=master_dtype,
                            quantized=True, **common)
        elif mode == "bf16":
            cfg = DiTConfig(dtype=jnp.bfloat16, param_dtype=master_dtype,
                            **common)
        else:
            cfg = cfg_master
        m = DiT(cfg)
        print(f"[{mode}] {args.steps}-step trajectory ...", flush=True)
        trajs[mode], times[mode], compiles[mode] = trajectory(
            m.apply, params, z0, ctx, neg, mask, args.steps, alpha, g,
            cfg.dtype,
        )
        print(f"  {times[mode]:.1f} s (+{compiles[mode]:.1f} s compile)",
              flush=True)

    finals = {m: trajs[m][-1] for m in modes}
    # free the DiT before the fp32 VAE decode
    jax.tree.map(lambda x: x.delete() if hasattr(x, "delete") else None,
                 params)

    vae_cfg = VAEConfig.flux(dtype=jnp.float32, param_dtype=jnp.float32)
    vae = AutoencoderKL(vae_cfg)
    print("init VAE + decode finals (fp32) ...", flush=True)
    vae_params = vae.init(
        jax.random.key(7), jnp.zeros((1, 32, 32, 3), jnp.float32)
    )
    decode = jax.jit(lambda vp, z: vae.apply(
        vp,
        jnp.asarray(z) / vae_cfg.scaling_factor + vae_cfg.shift_factor,
        method=AutoencoderKL.decode,
    ))
    images = {
        m: np.asarray(decode(vae_params, finals[m]), np.float32)
        for m in modes
    }

    def psnr(a, b, peak=2.0):
        mse = float(((a - b) ** 2).mean())
        if mse == 0:
            return None  # identical decodes; inf is not valid JSON
        return float(10 * np.log10(peak * peak / mse))

    pairs = [(a, b) for i, a in enumerate(modes) for b in modes[i + 1:]]
    record = {
        "model": args.model, "config": {k: v for k, v in base.items()},
        "steps": args.steps, "size_px": args.size,
        "guidance_scale": g, "seed": args.seed,
        "master_dtype": np.dtype(master_dtype).name,
        "traj_seconds": {k: round(v, 1) for k, v in times.items()},
        "compile_seconds": {k: round(v, 1) for k, v in compiles.items()},
        "comparisons": {},
    }
    for a, b in pairs:
        c = compare(trajs[a], trajs[b])
        _p = psnr(images[a], images[b])
        c["decoded_psnr_db"] = None if _p is None else round(_p, 2)
        c["decoded_max_abs"] = float(np.abs(images[a] - images[b]).max())
        record["comparisons"][f"{b}_vs_{a}"] = c
        print(f"{b} vs {a}: worst step MSE {c['worst_step_mse']:.3e}, "
              f"final MSE {c['final_mse']:.3e}, decoded PSNR "
              f"{c['decoded_psnr_db']} dB, decoded max|d| "
              f"{c['decoded_max_abs']:.3f}", flush=True)

    out = args.out or f"QUALITY_{args.model}.json"
    Path(out).write_text(json.dumps(record, indent=2))
    print(f"written {out}")


if __name__ == "__main__":
    main()
