"""Validate the framework on REAL released F-Lite weights when obtainable.

VERDICT r3 "What's missing" #2: every parity artifact uses
random-initialized weights because the bench environment has no hub
egress and no cached snapshots. This driver makes the attempt explicit
and automatic: point it at a repo id / snapshot dir / converted dir and,
when weights resolve, it

1. loads the full pipeline through `convert/ingest.py` (the same path
   `from_pretrained` uses — reference `generate.py:61-66` semantics),
2. generates one 1024px image at a fixed seed and saves the PNG next to
   the JSON artifact,
3. runs the trajectory parity harness (tools/parity_check.py
   --checkpoint) against the actual reference model code at bf16,
   recording the per-step MSE curve on the REAL weights.

When weights cannot be resolved (no egress, nothing cached) it writes
the same artifact with `status: "blocked"` and the resolver's error, so
the attempt and its reason are recorded instead of silently absent.

Run: python tools/real_weight_validation.py [--model Freepik/F-Lite]
Artifact: REAL_WEIGHT_VALIDATION.json (+ real_weight_sample.png)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="Freepik/F-Lite",
                    help="HF repo id | diffusers snapshot dir | converted dir")
    ap.add_argument("--prompt", default=(
        "a photorealistic golden retriever puppy sitting in autumn "
        "leaves, soft afternoon light"))
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--parity_steps", type=int, default=8,
                    help="trajectory steps for the torch-oracle parity leg "
                         "(fp32 torch at 7B on one CPU core is slow)")
    ap.add_argument("--parity_size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--zero_text_encoder", action="store_true",
                    help="hermetic mode: attach a ZeroTextEncoder when the "
                         "checkpoint ships none (tests); real validation "
                         "uses the checkpoint's own encoder")
    ap.add_argument("--out", default=str(REPO / "REAL_WEIGHT_VALIDATION.json"))
    args = ap.parse_args(argv)

    record = {"model": args.model, "status": "blocked",
              "attempted_at": time.strftime("%Y-%m-%d %H:%M:%S")}

    from f_lite_tpu.convert.ingest import resolve_pretrained

    try:
        native = resolve_pretrained(args.model)
    except FileNotFoundError as e:
        record["error"] = str(e)
        Path(args.out).write_text(json.dumps(record, indent=2))
        print(f"BLOCKED: {e}\nrecorded in {args.out}")
        return 2
    record.update(status="resolved", native_dir=str(native))

    # 1-2: load + one real image through the real pipeline
    import jax.numpy as jnp

    from f_lite_tpu.pipeline import FLitePipeline

    pipe = FLitePipeline.from_pretrained(native, dtype=jnp.bfloat16)
    if pipe.text_encoder is None and args.zero_text_encoder:
        from f_lite_tpu.text.encoder import ZeroTextEncoder

        pipe.text_encoder = ZeroTextEncoder(
            pipe.dit_model.config.cross_attn_input_size, 16)
        record["text_encoder"] = "zero (hermetic)"
    t0 = time.perf_counter()
    images = pipe(args.prompt, height=args.size, width=args.size,
                  num_inference_steps=args.steps, guidance_scale=6.0,
                  seed=args.seed).images
    gen_s = time.perf_counter() - t0
    png = Path(args.out).with_name("real_weight_sample.png")
    images[0].save(png)
    record.update(generated_png=str(png),
                  generate_seconds=round(gen_s, 2),
                  steps=args.steps, size_px=args.size)
    print(f"generated {png} in {gen_s:.1f}s")

    # 3: per-step parity vs the reference model code on these weights
    from parity_check import main as parity_main

    traj = Path(args.out).with_name("REAL_WEIGHT_PARITY.json")
    rc = parity_main([
        "--checkpoint", str(native), "--steps", str(args.parity_steps),
        "--size", str(args.parity_size), "--bf16", "--json_out", str(traj),
    ])
    record.update(status="validated" if rc == 0 else "parity_failed",
                  parity_artifact=str(traj),
                  parity_ok=rc == 0)
    Path(args.out).write_text(json.dumps(record, indent=2))
    print(f"recorded in {args.out}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
