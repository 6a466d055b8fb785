"""Precomputed-embedding training path: cache layout, dataset, loader.

Reference: `/root/reference/f_lite/precompute_embeddings.py` (offline cache
builder) + `precomputed_utils.py` (dataset/loader/forward). Semantics:
- cache dir holds `vae_latents/latent_<md5>.npy`,
  `text_embeddings/embedding_<md5>.npy` and `precomputed_mapping.json`
  listing entries (md5 of the caption keys both files;
  `precompute_embeddings.py:127-197`);
- the training-path dataset loads latent/embedding pairs, optional latent
  h-flip (`precomputed_utils.py:11-70`);
- resolution bucketing groups by latent shape — the reference re-reads
  every latent at startup for its shape (O(N) IO,
  `precomputed_utils.py:72-122`); we store shapes in the mapping at
  precompute time and fall back to file reads for legacy caches;
- loss-side differences vs the online path: 1% caption dropout
  (`precomputed_utils.py:210`), latents already normalized.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

import numpy as np

from f_lite_tpu.text.encoder import caption_cache_key


class PrecomputedCacheWriter:
    """Builds the cache (used by tools/precompute_embeddings.py)."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        (self.root / "vae_latents").mkdir(parents=True, exist_ok=True)
        (self.root / "text_embeddings").mkdir(parents=True, exist_ok=True)
        self.entries: list[dict] = []
        self._caption_seen: set[str] = set()

    def add(self, item_id: str, caption: str, latent: np.ndarray,
            embedding: np.ndarray | None):
        key = caption_cache_key(caption)
        lat_name = f"latent_{caption_cache_key(item_id + caption)}.npy"
        np.save(self.root / "vae_latents" / lat_name, latent)
        if embedding is not None and key not in self._caption_seen:
            # caption-dedup cache (`precompute_embeddings.py:150-160`)
            np.save(
                self.root / "text_embeddings" / f"embedding_{key}.npy",
                embedding,
            )
            self._caption_seen.add(key)
        self.entries.append({
            "id": item_id,
            "caption": caption,
            "latent_file": lat_name,
            "embedding_file": f"embedding_{key}.npy",
            "latent_shape": list(latent.shape),
        })

    def finalize(self):
        (self.root / "precomputed_mapping.json").write_text(
            json.dumps({"entries": self.entries}, indent=2)
        )


class PrecomputedDataset:
    """Latent/embedding pairs (`precomputed_utils.py:11-70`)."""

    def __init__(self, root: str | Path, *, latent_flip: bool = False):
        self.root = Path(root)
        mapping = json.loads(
            (self.root / "precomputed_mapping.json").read_text()
        )
        self.entries = mapping["entries"]
        self.latent_flip = latent_flip

    def __len__(self):
        return len(self.entries)

    def latent_shape(self, idx: int) -> tuple:
        e = self.entries[idx]
        if "latent_shape" in e:
            return tuple(e["latent_shape"])
        return np.load(
            self.root / "vae_latents" / e["latent_file"], mmap_mode="r"
        ).shape

    def setup_latent_buckets(self) -> dict:
        buckets: dict[tuple, list[int]] = {}
        for i in range(len(self)):
            buckets.setdefault(self.latent_shape(i), []).append(i)
        self.aspect_ratio_buckets = buckets
        return buckets

    def __getitem__(self, idx: int) -> dict:
        e = self.entries[idx]
        latent = np.load(self.root / "vae_latents" / e["latent_file"])
        emb = np.load(self.root / "text_embeddings" / e["embedding_file"])
        if emb.ndim == 3:
            emb = emb[0]
        if self.latent_flip and random.random() < 0.5:
            latent = latent[:, ::-1, :].copy()  # h-flip on W axis (NHWC)
        return {
            "vae_latent": latent.astype(np.float32),
            "text_embedding": emb.astype(np.float32),
            "caption": e["caption"],
            "_id": e["id"],
        }

    def collate_fn(self, items: list[dict]) -> dict:
        out: dict = {}
        # pad embeddings to the longest in batch (x8) and build masks
        max_s = max(it["text_embedding"].shape[0] for it in items)
        max_s = -(-max_s // 8) * 8
        embs, masks = [], []
        for it in items:
            e = it["text_embedding"]
            pad = max_s - e.shape[0]
            masks.append(
                np.concatenate([np.ones(e.shape[0], bool),
                                np.zeros(pad, bool)])
            )
            embs.append(np.pad(e, ((0, pad), (0, 0))))
        out["text_embedding"] = np.stack(embs)
        out["text_mask"] = np.stack(masks)
        out["vae_latent"] = np.stack([it["vae_latent"] for it in items])
        out["caption"] = [it["caption"] for it in items]
        out["_id"] = [it["_id"] for it in items]
        return out


def create_precomputed_data_loader(
    root, batch_size, *, num_workers=4, shuffle=True, seed=0,
    use_buckets=True, latent_flip=False, sampler_state=None,
):
    """`precomputed_utils.py:124-164` equivalent."""
    from f_lite_tpu.data.loader import DataLoader
    from f_lite_tpu.data.samplers import (
        ResolutionBucketSampler,
        StatefulDistributedSampler,
    )

    ds = PrecomputedDataset(root, latent_flip=latent_flip)
    if use_buckets:
        ds.setup_latent_buckets()
        sampler = ResolutionBucketSampler(
            ds, batch_size, shuffle=shuffle, seed=seed
        )
        if sampler_state:
            sampler.load_state_dict(sampler_state)
        return DataLoader(ds, batch_sampler=sampler,
                          num_workers=num_workers), sampler
    sampler = StatefulDistributedSampler(
        ds, batch_size, shuffle=shuffle, seed=seed
    )
    if sampler_state:
        sampler.load_state_dict(sampler_state)
    return DataLoader(ds, batch_size=batch_size, sampler=sampler,
                      num_workers=num_workers, drop_last=True), sampler
