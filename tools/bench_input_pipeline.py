"""Host input-pipeline throughput benchmark (VERDICT r2 item 7).

The training step rate measured on one v5e chip is 124 ms/step = 32 img/s
at the slurm-recipe config (PERF.md) — but that was fed synthetic data.
This tool measures whether the REAL host path (file read -> PIL JPEG
decode -> variable center crop -> native normalize -> collate) can feed
that rate, across worker counts and both DataLoader worker types
(threads vs forked processes).

It writes N real ~sqrt(2)-megapixel JPEGs to a temp dir, builds the real
`ImageDataset` over a parquet manifest with the file:// backend, and
iterates the real `DataLoader`. Reference point: the reference uses 4
torch DataLoader workers per rank (`train.py:186-231`).

Run: python tools/bench_input_pipeline.py [--n 256] [--resolution 256]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_jpeg_dataset(root: Path, n: int, px: int) -> Path:
    import numpy as np
    import pandas as pd
    from PIL import Image

    img_dir = root / "images"
    img_dir.mkdir(parents=True)
    rs = np.random.RandomState(0)
    # low-frequency content so JPEGs have realistic size/decode cost
    base = rs.randint(0, 255, (px // 8, px // 8, 3), np.uint8)
    rows = []
    for i in range(n):
        arr = np.asarray(
            Image.fromarray(base).resize((px, px), Image.BILINEAR)
        )
        arr = np.clip(
            arr.astype(np.int16) + rs.randint(-20, 20, arr.shape), 0, 255
        ).astype(np.uint8)
        f = img_dir / f"img_{i}.jpg"
        Image.fromarray(arr).save(f, quality=90)
        rows.append({
            "source_id": f"img{i}",
            "media_path": str(f),
            "captions": [f"caption {i}"],
            "width": px, "height": px,
            "media_source": "bench", "media_type": "real",
        })
    d = root / "coll" / "a" / "b"
    d.mkdir(parents=True)
    pd.DataFrame(rows).to_parquet(d / "p.parquet")
    return root


def bench(ds, batch_size, num_workers, worker_type, n_items) -> float:
    from f_lite_tpu.data.loader import DataLoader

    dl = DataLoader(ds, batch_size=batch_size, num_workers=num_workers,
                    worker_type=worker_type, drop_last=True)
    # warmup one batch (pool spinup, fork cost)
    it = iter(dl)
    next(it)
    t0 = time.perf_counter()
    seen = 0
    for batch in it:
        seen += len(batch["caption"])
        if seen >= n_items:
            break
    dt = time.perf_counter() - t0
    return seen / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256, help="dataset size")
    ap.add_argument("--px", type=int, default=1184,
                    help="source JPEG side (decode cost driver)")
    ap.add_argument("--resolution", type=int, default=256,
                    help="training crop bucket (slurm recipe: 256)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--workers", type=str, default="4,8,16")
    ap.add_argument("--target", type=float, default=32.0,
                    help="img/s the train step consumes (PERF.md)")
    ap.add_argument("--out", default="INPUT_PIPELINE.json")
    args = ap.parse_args()

    from f_lite_tpu.data.dataset import ImageDataset

    tmp = Path(tempfile.mkdtemp(prefix="ipbench_"))
    print(f"writing {args.n} JPEGs at {args.px}px ...", flush=True)
    root = make_jpeg_dataset(tmp, args.n, args.px)
    ds = ImageDataset(
        "coll", base_image_dir=str(root), resolution=args.resolution,
        center_crop=True, base_url="file://", seed=0,
    )

    results = []
    for wt in ("thread", "process"):
        for w in (int(x) for x in args.workers.split(",")):
            rate = bench(ds, args.batch, w, wt, n_items=args.n * 2)
            results.append({
                "worker_type": wt, "workers": w,
                "images_per_s": round(rate, 1),
                "meets_target": rate >= args.target,
            })
            print(f"{wt:>8} x{w:<3} {rate:7.1f} img/s "
                  f"({'OK' if rate >= args.target else 'below target'})",
                  flush=True)

    best = max(results, key=lambda r: r["images_per_s"])
    record = {
        "source_px": args.px, "resolution": args.resolution,
        "batch": args.batch, "target_img_s": args.target,
        "results": results, "best": best,
    }
    Path(args.out).write_text(json.dumps(record, indent=2))
    print(f"\nbest: {best['worker_type']} x{best['workers']} = "
          f"{best['images_per_s']} img/s (target {args.target})")


if __name__ == "__main__":
    main()
