"""On-chip audit of the ab2 sampler's realized accuracy at scale.

Second-order convergence is proven on smooth synthetic fields
(tests/test_sampler.py). Whether that buys a step-count reduction on a
REAL field depends on the field's smoothness; this tool measures it for
the only at-scale field available offline — random weights — and the
measured answer is NO (see PERF.md "ab2 sampler"): a random-init DiT's
velocity field is rough enough that the multistep correction adds as
much error as it removes at practical step counts. The tool exists so
the same measurement can be re-run on a trained checkpoint, where
multistep samplers of this family conventionally do allow substantially
fewer steps.

Runs the PRODUCT denoise path (sampling.euler.make_denoise_fn, with its
default-style dispatch chunking — so ab2's cross-chunk velocity history
is exercised at scale) on the 1.9B recipe config at 1024px with fp32
master weights (integration accuracy must not be confounded by weight
rounding; fp32 1.9B fits the 16 GB chip, fp32 7B does not). All runs
share one set of random-but-live weights (quality_audit.fill_zero_leaves)
and one initial noise; the reference trajectory is Euler at `--truth`
steps of the same schedule family.

Records final-latent MSE vs truth and decoded-image PSNR vs the decoded
truth for euler/ab2 at `--steps` and `--steps`/2, into SAMPLER_AB2.json.
The headline check: mse(ab2 @ steps/2) <= mse(euler @ steps).

Run: python tools/sampler_order_audit.py --out SAMPLER_AB2.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("F_LITE_FLASH_MAX_BQ", "2048")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--truth", type=int, default=256,
                    help="Euler reference-step count (multiple of the "
                         "chunk size keeps compiled shapes shared)")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--guidance_scale", type=float, default=6.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=32,
                    help="steps per dispatch (watchdog bound; also the "
                         "cross-chunk ab2 history exercise)")
    ap.add_argument("--out", default="SAMPLER_AB2.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from quality_audit import fill_zero_leaves
    from f_lite_tpu.models.dit import DiT, DiTConfig
    from f_lite_tpu.models.vae import AutoencoderKL, VAEConfig
    from f_lite_tpu.sampling.euler import DenoiseSettings, make_denoise_fn
    from f_lite_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()

    base = dict(hidden_size=2048, depth=24, num_heads=8, residual_v=True,
                cross_attn_input_size=4096, scan_layers=True)
    cfg = DiTConfig(dtype=jnp.float32, param_dtype=jnp.float32, **base)
    model = DiT(cfg)
    print("init 1.9B fp32 params ...", flush=True)
    params = model.init_params(jax.random.key(args.seed), text_len=128,
                               image_size=64)
    params = fill_zero_leaves(params, args.seed + 2)

    lat = args.size // 8
    rs = np.random.RandomState(args.seed + 1)
    z0 = jnp.asarray(rs.randn(1, lat, lat, 16), jnp.float32)
    ctx = jnp.asarray(rs.randn(1, 128, 4096) * 0.5, jnp.float32)
    neg = jnp.zeros_like(ctx)
    mask = jnp.ones((1, 128), jnp.bool_)

    def run(method, steps):
        s = DenoiseSettings(num_inference_steps=steps,
                            guidance_scale=args.guidance_scale,
                            method=method)
        fn = make_denoise_fn(model.apply, s, donate=False,
                             steps_per_dispatch=args.chunk)
        t0 = time.time()
        z = fn(params, z0, ctx, neg, mask)
        z = np.asarray(z, np.float32)
        dt = time.time() - t0
        print(f"  [{method}@{steps}] {dt:.1f} s", flush=True)
        return z, dt

    print(f"truth: euler @ {args.truth} steps ...", flush=True)
    truth, truth_s = run("euler", args.truth)

    half = args.steps // 2
    runs = {}
    for method in ("euler", "ab2"):
        for n in (args.steps, half):
            runs[f"{method}@{n}"], _ = run(method, n)

    # decoded-image comparison (fp32 VAE, random weights — the metric is
    # relative fidelity to the decoded truth, not absolute quality)
    del params
    vae_cfg = VAEConfig.flux(dtype=jnp.float32, param_dtype=jnp.float32)
    vae = AutoencoderKL(vae_cfg)
    vae_params = vae.init(jax.random.key(7),
                          jnp.zeros((1, 32, 32, 3), jnp.float32))
    decode = jax.jit(lambda vp, z: vae.apply(
        vp, jnp.asarray(z) / vae_cfg.scaling_factor + vae_cfg.shift_factor,
        method=AutoencoderKL.decode,
    ))
    img_truth = np.asarray(decode(vae_params, truth), np.float32)

    def psnr(a, b, peak=2.0):
        mse = float(((a - b) ** 2).mean())
        if mse == 0:
            return None  # identical decodes; inf is not valid JSON
        return float(10 * np.log10(peak * peak / mse))

    record = {
        "model": "1p9b-fp32", "size_px": args.size,
        "guidance_scale": args.guidance_scale, "seed": args.seed,
        "chunk": args.chunk,
        "truth": {"method": "euler", "steps": args.truth,
                  "seconds": round(truth_s, 1)},
        "runs": {},
    }
    for name, z in runs.items():
        img = np.asarray(decode(vae_params, z), np.float32)
        record["runs"][name] = {
            "final_mse_vs_truth": float(((z - truth) ** 2).mean()),
            "final_max_abs_vs_truth": float(np.abs(z - truth).max()),
            "decoded_psnr_db_vs_truth": (
                lambda v: None if v is None else round(v, 2)
            )(psnr(img, img_truth)),
        }
        print(f"{name}: mse {record['runs'][name]['final_mse_vs_truth']:.3e}"
              f", psnr {record['runs'][name]['decoded_psnr_db_vs_truth']} dB",
              flush=True)

    e_full = record["runs"][f"euler@{args.steps}"]["final_mse_vs_truth"]
    a_half = record["runs"][f"ab2@{half}"]["final_mse_vs_truth"]
    record["headline"] = {
        "observation": (
            f"does ab2@{half} match euler@{args.steps} accuracy on this "
            "field (random weights: expected NO; rerun on a trained "
            "checkpoint before cutting steps)"
        ),
        "holds": bool(a_half <= e_full),
        "mse_ratio_ab2half_over_eulerfull": (
            float(a_half / e_full) if e_full else None
        ),
    }
    Path(args.out).write_text(json.dumps(record, indent=2))
    print(f"ab2-half matches euler-full: {record['headline']['holds']} "
          f"(ratio {record['headline']['mse_ratio_ab2half_over_eulerfull']})"
          f"\nwritten {args.out}")


if __name__ == "__main__":
    main()
