"""Quantify limited-interval CFG (guidance_interval) at flagship width.

The sampler can restrict classifier-free guidance to a (lo, hi) window of
the shifted-t schedule (sampling/euler.py `_interval_segments`): outside
the window each step runs a single (conditional-only) forward instead of
the CFG-batched pair, halving that step's model cost. This is the one
already-implemented algorithmic latency lever the roofline analysis left
unquantified (VERDICT r3 item 4; cf. Kynkaanniemi et al. 2024, "Applying
Guidance in a Limited Interval" — guidance helps mid-trajectory and can
hurt at the extremes).

Methodology mirrors tools/quality_audit.py (same live-random weights,
same initial noise, real chip): run the full 30-step 1024px trajectory
at 7B width with full-range CFG as the baseline, then with candidate
windows, and record per window:
- measured trajectory seconds + speedup vs full CFG (p50 of 3);
- how many of the 30 steps actually ran CFG;
- final-latent MSE and decoded-image PSNR vs the full-CFG baseline
  (the same "operative bound for served pixels" framing as QUALITY_*).

bf16 everywhere: the interval decision is dtype-independent, and bf16
programs compile in seconds (int8 segment programs take ~2 min each;
the int8 serving preset's end-to-end timing is recorded separately via
`F_LITE_BENCH_GI` in bench.py).

Run: python tools/guidance_interval_audit.py --out QUALITY_GI.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--guidance_scale", type=float, default=6.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--width", type=int, default=2560)
    ap.add_argument("--depth", type=int, default=40)
    ap.add_argument("--num_heads", type=int, default=10)
    ap.add_argument("--windows", default="0.1:0.9,0.17:0.87,0.0:0.8,0.3:1.0",
                    help="comma list of lo:hi shifted-t windows")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="QUALITY_GI.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from f_lite_tpu.models.dit import DiT, DiTConfig
    from f_lite_tpu.models.vae import AutoencoderKL, VAEConfig
    from f_lite_tpu.ops.timesteps import resolution_alpha
    from f_lite_tpu.sampling.euler import (
        DenoiseSettings,
        _full_schedule,
        _interval_segments,
        denoise,
    )
    from f_lite_tpu.utils.env import enable_compilation_cache
    from quality_audit import fill_zero_leaves

    enable_compilation_cache()

    cfg = DiTConfig(
        hidden_size=args.width, depth=args.depth, num_heads=args.num_heads,
        residual_v=True, cross_attn_input_size=4096, scan_layers=True,
        dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
    )
    model = DiT(cfg)
    print(f"init {args.width}x{args.depth} params (bf16) ...", flush=True)
    params = model.init_params(jax.random.key(args.seed), text_len=128,
                               image_size=64)
    params = fill_zero_leaves(params, args.seed + 2)

    lat = args.size // 8
    rs = np.random.RandomState(args.seed + 1)
    z0 = jnp.asarray(rs.randn(1, lat, lat, 16), jnp.float32)
    pos = jnp.asarray(
        rs.randn(1, 128, cfg.cross_attn_input_size) * 0.5, jnp.bfloat16
    )
    neg = jnp.zeros_like(pos)
    mask = jnp.ones((1, 128), jnp.bool_)

    windows = [None] + [
        tuple(float(x) for x in w.split(":"))
        for w in args.windows.split(",") if w
    ]

    def run_variant(window):
        settings = DenoiseSettings(
            num_inference_steps=args.steps,
            guidance_scale=args.guidance_scale,
            guidance_interval=window,
        )
        schedule = _full_schedule(settings, lat, lat)
        cfg_steps = sum(
            e - s for s, e, on in _interval_segments(settings, schedule)
            if on
        )

        def run():
            z = denoise(model.apply, params, z0, pos, neg, mask, settings)
            z.block_until_ready()
            return z

        t0 = time.time()
        z = run()  # compile + warmup
        compile_s = time.time() - t0
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            z = run()
            times.append(time.perf_counter() - t0)
        p50 = sorted(times)[len(times) // 2]
        return np.asarray(z, np.float32), p50, compile_s, cfg_steps

    finals, p50s, rec_vars = {}, {}, []
    for w in windows:
        name = "full" if w is None else f"{w[0]:g}-{w[1]:g}"
        print(f"[{name}] {args.steps}-step trajectory ...", flush=True)
        finals[name], p50, compile_s, cfg_steps = run_variant(w)
        p50s[name] = p50
        rec_vars.append({
            "window": list(w) if w else None, "name": name,
            "cfg_steps": cfg_steps, "total_steps": args.steps,
            "traj_seconds_p50": round(p50, 2),
            "compile_seconds": round(compile_s, 1),
        })
        print(f"  {p50:.2f} s p50 (+{compile_s:.1f} s compile), "
              f"CFG on {cfg_steps}/{args.steps} steps", flush=True)

    # free the DiT before the fp32 VAE decode (quality_audit.py pattern)
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
        n: np.asarray(decode(vae_params, z), np.float32)
        for n, z in finals.items()
    }

    def psnr(a, b, peak=2.0):
        mse = float(((a - b) ** 2).mean())
        return None if mse == 0 else float(
            10 * np.log10(peak * peak / mse)
        )

    base = finals["full"]
    for rv in rec_vars:
        n = rv["name"]
        rv["speedup_vs_full"] = round(p50s["full"] / p50s[n], 3)
        if n != "full":
            d = finals[n] - base
            rv["final_latent_mse_vs_full"] = float((d ** 2).mean())
            p = psnr(images[n], images["full"])
            rv["decoded_psnr_db_vs_full"] = (
                None if p is None else round(p, 2)
            )
            rv["decoded_max_abs_vs_full"] = float(
                np.abs(images[n] - images["full"]).max()
            )
            print(
                f"{n}: {rv['speedup_vs_full']}x, latent MSE "
                f"{rv['final_latent_mse_vs_full']:.3e}, decoded PSNR "
                f"{rv['decoded_psnr_db_vs_full']} dB", flush=True,
            )

    record = {
        "model": {"hidden_size": args.width, "depth": args.depth,
                  "num_heads": args.num_heads, "dtype": "bf16"},
        "steps": args.steps, "size_px": args.size,
        "guidance_scale": args.guidance_scale, "seed": args.seed,
        "note": (
            "PSNR/MSE are vs the full-CFG trajectory on live-random "
            "weights (quality_audit.py methodology). A window is a "
            "DIFFERENT sampler, not a numerical approximation - the "
            "reference for actual image quality is the cited "
            "limited-interval guidance literature; this artifact "
            "quantifies the speed/divergence trade-off on-chip."
        ),
        "variants": rec_vars,
    }
    Path(args.out).write_text(json.dumps(record, indent=2))
    print(f"written {args.out}")


if __name__ == "__main__":
    main()
