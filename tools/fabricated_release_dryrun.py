"""Day-one real-weight readiness: full-size fabricated released-layout run.

The released `Freepik/F-Lite*` checkpoints are unreachable from this
environment (no egress — REAL_WEIGHT_VALIDATION.json). What IS provable
offline: the entire day-one path works at TRUE scale, not just at the
tiny shapes the ingest tests use. This driver

1. fabricates a full-size RANDOM checkpoint in the exact released
   diffusers layout — DiT state dict from the oracle fabricator
   (tests/torch_oracle.make_random_state_dict, the reference's exact key
   set/shapes, `pt.py:78-95`), key-for-key asserted against the checked-in
   expected-key manifest (convert/manifests/), plus a full FLUX-shape VAE
   in diffusers AutoencoderKL naming;
2. ingests it through `resolve_pretrained` with strict key coverage
   (F_LITE_STRICT_INGEST=error): any unconsumed/missing key aborts;
3. loads the converted dir via `FLitePipeline.from_pretrained`
   (bf16 + int8 W8A8 quantize — the shipped serving mode) and runs the
   30-step 1024 px pipeline on-chip three times;
4. records conversion wall time, p50 seconds/image, and per-device HBM
   stats (when the backend exposes memory_stats).

Artifact: FABRICATED_RELEASE_DRYRUN.json. Ref: `pt.py:15-177`,
`generate.py:61-66` (the path being rehearsed).

Run (needs ~60 GB free RAM + ~60 GB disk for the 7B default):
    python tools/fabricated_release_dryrun.py --manifest freepik-f-lite-7b
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def fabricate_snapshot(manifest: dict, out: Path, seed: int) -> dict:
    """Write a diffusers-layout snapshot with random full-size weights."""
    import torch
    from safetensors.torch import save_file

    from f_lite_tpu.models.dit import DiTConfig
    from f_lite_tpu.models.vae import VAEConfig
    from test_vae_convert import _diffusers_keys
    from torch_oracle import make_random_state_dict

    mc = manifest["config"]
    cfg = DiTConfig(
        hidden_size=mc["hidden_size"], depth=mc["depth"],
        num_heads=mc["num_heads"],
        cross_attn_input_size=mc["cross_attn_input_size"],
        residual_v=mc["residual_v"],
        train_bias_and_rms=mc["train_bias_and_rms"],
    )
    t0 = time.time()
    sd = make_random_state_dict(cfg, seed=seed)
    fabricated = sorted(sd)
    expected = sorted(manifest["keys"])
    if fabricated != expected:
        missing = sorted(set(expected) - set(fabricated))
        extra = sorted(set(fabricated) - set(expected))
        raise SystemExit(
            f"fabricated key set diverges from manifest: "
            f"missing={missing[:5]} extra={extra[:5]}"
        )
    n_params = sum(int(v.numel()) for v in sd.values())
    dit_dir = out / "dit_model"
    dit_dir.mkdir(parents=True, exist_ok=True)
    save_file(sd, dit_dir / "diffusion_pytorch_model.safetensors")
    del sd

    vae_cfg = VAEConfig.flux()
    g = torch.Generator().manual_seed(seed + 1)
    vsd = {
        k: torch.randn(*shape, generator=g) * 0.05
        for k, shape in _diffusers_keys(vae_cfg).items()
    }
    vae_dir = out / "vae"
    vae_dir.mkdir(parents=True, exist_ok=True)
    save_file(vsd, vae_dir / "diffusion_pytorch_model.safetensors")
    vcfg = dataclasses.asdict(vae_cfg)
    for k in ("dtype", "param_dtype"):
        vcfg.pop(k, None)
    vcfg["block_out_channels"] = list(vcfg["block_out_channels"])
    (vae_dir / "config.json").write_text(json.dumps(vcfg, indent=2))
    del vsd

    (out / "model_index.json").write_text(json.dumps({
        "_class_name": "FLitePipeline", "fabricated": True, "seed": seed,
    }, indent=2))
    return {
        "dit_params": n_params,
        "dit_keys": len(expected),
        "fabricate_seconds": round(time.time() - t0, 1),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", default="freepik-f-lite-7b",
                    help="name under f_lite_tpu/convert/manifests/")
    ap.add_argument("--workdir", default="/tmp/fabricated_release")
    ap.add_argument("--out", default="FABRICATED_RELEASE_DRYRUN.json")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--keep", action="store_true",
                    help="keep the fabricated snapshot + converted dir")
    ap.add_argument("--convert_only", action="store_true",
                    help="stop after fabricate + strict ingest (CPU-only "
                         "phases); record partial artifact. Re-run without "
                         "this flag on a chip-healthy host for the serve "
                         "phase (implies --keep).")
    args = ap.parse_args(argv)

    import os

    os.environ["F_LITE_STRICT_INGEST"] = "error"

    manifest_path = (REPO / "f_lite_tpu" / "convert" / "manifests"
                     / f"{args.manifest}.json")
    manifest = json.loads(manifest_path.read_text())
    work = Path(args.workdir)
    snapshot = work / "snapshot"
    reuse = (snapshot / "model_index.json").exists() and not args.convert_only
    if work.exists() and not reuse:
        shutil.rmtree(work)

    report: dict = {
        "manifest": args.manifest,
        "repo_id": manifest.get("repo_id"),
        "config": manifest["config"],
        "strict_ingest": "error",
    }
    if reuse:
        # serve-phase rerun after a --convert_only pass: the fabricated
        # snapshot (and its converted cache) are already on disk
        print(f"reusing fabricated snapshot at {snapshot}", flush=True)
    else:
        print(f"fabricating {args.manifest} at full size ...", flush=True)
        report.update(fabricate_snapshot(manifest, snapshot, args.seed))
        print(f"fabricated in {report['fabricate_seconds']}s "
              f"({report['dit_params'] / 1e9:.2f}B params)", flush=True)

    from f_lite_tpu.convert.ingest import resolve_pretrained

    t0 = time.time()
    converted = resolve_pretrained(snapshot)
    report["convert_seconds"] = round(time.time() - t0, 1)
    print(f"converted (strict) in {report['convert_seconds']}s "
          f"-> {converted}", flush=True)

    if args.convert_only:
        report["status"] = "converted (serve phase pending chip)"
        Path(args.out).write_text(json.dumps(report, indent=1))
        print(json.dumps(report, indent=1))
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from f_lite_tpu.pipeline import FLitePipeline

    t0 = time.time()
    pipe = FLitePipeline.from_pretrained(
        converted, dtype=jnp.bfloat16, quantize=True,
        load_text_encoder=False,
    )
    report["load_seconds"] = round(time.time() - t0, 1)

    cai = pipe.dit_model.config.cross_attn_input_size
    rng = np.random.RandomState(args.seed)
    embeds = rng.randn(1, 128, cai).astype(np.float32) * 0.02

    times = []
    for i in range(args.repeats):
        t0 = time.time()
        out = pipe(
            prompt=None, prompt_embeds=embeds, height=args.size,
            width=args.size, num_inference_steps=args.steps, seed=args.seed,
        )
        dt = time.time() - t0
        times.append(dt)
        print(f"run {i}: {dt:.1f}s", flush=True)
    report["compile_plus_first_s"] = round(times[0], 1)
    rest = sorted(times[1:]) or times
    report["p50_seconds_per_image"] = round(rest[len(rest) // 2], 2)
    png = Path(args.out).resolve().with_name("fabricated_release_sample.png")
    out.images[0].save(png)
    report["sample_png"] = str(png)

    try:
        stats = jax.devices()[0].memory_stats() or {}
        report["hbm"] = {
            k: round(v / 2**30, 2) for k, v in stats.items()
            if "bytes" in k
        }
    except Exception as e:  # noqa: BLE001 — remote backends may not expose it
        report["hbm"] = f"unavailable: {type(e).__name__}: {e}"

    report["status"] = "ok"
    Path(args.out).write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))

    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
