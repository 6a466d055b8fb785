"""Offline precompute: VAE latents + text embeddings cache builder.

Reference: `/root/reference/f_lite/precompute_embeddings.py` (whose imports
are stale at HEAD, SURVEY.md §0.1.3 — this is the working equivalent).
Iterates an ImageDataset, VAE-encodes images (normalized), text-encodes
captions (dedup by caption md5), and writes the cache layout consumed by
`f_lite_tpu.data.precomputed` and `PrecomputedTextEncoder`.

Usage:
  python tools/precompute_embeddings.py \
      --train_data_path coll --base_image_dir /data --resolution 256 \
      --vae_path /ckpt/vae --text_encoder_type t5 \
      --text_encoder_path /ckpt/text_encoder \
      --output_dir /cache
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logger = logging.getLogger("precompute")


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train_data_path", required=True)
    p.add_argument("--base_image_dir", default=None)
    p.add_argument("--image_column", default="media_path")
    p.add_argument("--caption_column", default="captions")
    p.add_argument("--root_dir_type", default="parquet")
    p.add_argument("--base_url", default="dummy://")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--center_crop", action="store_true")
    p.add_argument("--vae_path", default=None)
    p.add_argument("--text_encoder_type", default="zero",
                   choices=["t5", "torch", "zero"])
    p.add_argument("--text_encoder_path", default=None)
    p.add_argument("--cross_attn_input_size", type=int, default=4096,
                   help="embedding dim for the zero/debug text encoder")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from f_lite_tpu.data import DataLoader, ImageDataset
    from f_lite_tpu.data.precomputed import PrecomputedCacheWriter
    from f_lite_tpu.models.vae import AutoencoderKL, normalize_latents
    from f_lite_tpu.train.trainer import build_text_encoder, build_vae

    ds = ImageDataset(
        args.train_data_path,
        base_image_dir=args.base_image_dir,
        image_column=args.image_column,
        caption_column=args.caption_column,
        resolution=args.resolution,
        center_crop=args.center_crop,
        root_dir_type=args.root_dir_type,
        base_url=args.base_url,
    )
    vae, vae_params = build_vae(args, jnp.float32)

    class _TEArgs:
        use_precomputed_data = False
        text_encoder_type = args.text_encoder_type
        text_encoder_path = args.text_encoder_path
        cross_attn_input_size = args.cross_attn_input_size
        precomputed_data_dir = None

    text_encoder = build_text_encoder(_TEArgs())

    encode = jax.jit(
        lambda p, x, r: normalize_latents(
            vae.apply(p, x, r, method=AutoencoderKL.encode), vae.config
        )
    )

    writer = PrecomputedCacheWriter(args.output_dir)
    dl = DataLoader(ds, batch_size=args.batch_size, num_workers=4)
    rng = jax.random.key(args.seed)
    done = 0
    for batch in dl:
        rng, k = jax.random.split(rng)
        latents = np.asarray(
            encode(vae_params, jnp.asarray(batch["image"]), k)
        )
        embs, mask = text_encoder.encode(batch["caption"])
        for i in range(latents.shape[0]):
            n_real = int(mask[i].sum())
            writer.add(
                str(batch["_id"][i]), batch["caption"][i],
                latents[i], embs[i, :n_real],
            )
            done += 1
            if args.limit and done >= args.limit:
                break
        if args.limit and done >= args.limit:
            break
    writer.finalize()
    logger.info("wrote %d entries to %s", done, args.output_dir)
    return done


if __name__ == "__main__":
    main()
