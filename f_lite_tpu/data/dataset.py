"""Image dataset: metadata tables, variable center crop, bucket logic,
fault-tolerant fetching — numpy/PIL, host-side (TPU input pipeline).

Reference: `/root/reference/f_lite/data.py`. Semantics preserved:
- crop-size list in patch-16 increments sweeping aspect ratios
  (`generate_crop_size_list`, `data.py:99-111`);
- Lumina-2-style variable center crop: pick the candidate crop maximizing
  retained area ratio, Lanczos resize then center crop
  (`data.py:62-135`);
- normalize to [-1, 1] (`data.py:137-165`) — NHWC here;
- metadata from parquet shards (`glob */*/*.parquet`, `media_source !=
  "laion"` filter) or a JSON array file (`data.py:186-214`);
- backends https / s3 / dummy / file with retries; on failure a
  placeholder image of the right bucket shape, empty caption, _id="-1"
  (`data.py:264-418`); placeholders opportunistically refreshed with real
  images 10% of the time (`data.py:326-332`);
- dataset length rounded down to a multiple of 2048 (`data.py:225-226`);
- collate homogenization: minority-shape samples replaced by majority-shape
  donors (`data.py:434-490`).
"""

from __future__ import annotations

import glob
import io
import json
import logging
import os
import random
from collections import Counter
from pathlib import Path
from typing import Any
from urllib.parse import urlparse

import numpy as np
from PIL import Image

logger = logging.getLogger(__name__)

LENGTH_MULTIPLE = 2048  # `data.py:225-226`


def generate_crop_size_list(image_size: int, max_ratio: float = 2.0):
    """Aspect sweep in patch-16 increments (`data.py:99-111`)."""
    assert max_ratio >= 1
    patch = 16
    assert image_size % patch == 0
    min_p = image_size // patch
    max_p = int(image_size * max_ratio) // patch
    sizes = []
    wp, hp = min_p, max_p
    while wp <= max_p and hp >= min_p:
        sizes.append((round(wp * patch), round(hp * patch)))
        wp += 1
        hp -= 1
    return sizes


def _is_valid_crop(cw, ch, w, h, eps=1e-7):
    down = max(cw / w, ch / h)
    return cw <= w * down + eps and ch <= h * down + eps


def var_center_crop_size_fn(orig_wh, image_size, max_ratio=2.0):
    """Pick the crop size retaining the most area (`data.py:119-135`)."""
    w, h = orig_wh[:2]
    candidates = generate_crop_size_list(image_size, max_ratio)
    scored = []
    for cw, ch in candidates:
        if _is_valid_crop(cw, ch, w, h):
            rem = min(cw / w, ch / h) / max(cw / w, ch / h)
            if rem > 0:
                scored.append((rem, (cw, ch)))
    return sorted(scored, reverse=True)[0][1]


def center_crop_arr_simulator(orig_wh, image_size, max_ratio=1.0):
    """Crop size without touching pixels (`data.py:33-60`)."""
    return var_center_crop_size_fn(orig_wh, image_size, max_ratio)


def center_crop_arr(pil_image: Image.Image, image_size: int,
                    max_ratio: float = 1.0) -> Image.Image:
    """Lanczos resize + center crop to the bucket size (`data.py:62-80`)."""
    cw, ch = var_center_crop_size_fn(pil_image.size, image_size, max_ratio)
    scale = max(cw / pil_image.size[0], ch / pil_image.size[1])
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size),
        resample=Image.LANCZOS, reducing_gap=3.0,
    )
    left = (pil_image.size[0] - cw) // 2
    top = (pil_image.size[1] - ch) // 2
    return pil_image.crop([left, top, left + cw, top + ch])


def normalize_image(pil_image: Image.Image) -> np.ndarray:
    """PIL -> (H, W, 3) float32 in [-1, 1] (`data.py:146-153` semantics).

    Uses the native OpenMP kernel (f_lite_tpu/native) when built — ~8x
    faster than the numpy chain on the host input pipeline."""
    from f_lite_tpu import native

    return native.normalize_u8(np.asarray(pil_image.convert("RGB")))


class ImageDataset:
    """Metadata-table image dataset with bucket-aware fetching."""

    def __init__(
        self,
        data_path: str,
        base_image_dir: str | None = None,
        image_column: str = "media_path",
        caption_column: str = "captions",
        resolution: int = 512,
        center_crop: bool = True,
        random_flip: bool = False,
        root_dir_type: str = "parquet",
        base_url: str = "dummy://",
        retries: int = 3,
        debug: bool = False,
        seed: int = 0,
    ):
        self.image_column = image_column
        self.caption_column = caption_column
        self.resolution = resolution
        self.max_ratio = 1.0 if center_crop else 2.0
        self.random_flip = random_flip
        self.retries = retries
        self.seed = seed
        self.epoch = 0  # advanced by set_epoch (trainer epoch loop)
        self.data = self._load_metadata(
            data_path, base_image_dir, root_dir_type, debug
        )

        self.place_holder_image: dict[tuple, Image.Image] = {
            (w, h): Image.new("RGB", (w, h))
            for w, h in generate_crop_size_list(resolution, self.max_ratio)
        }

        self.base_url = urlparse(base_url)
        scheme = self.base_url.scheme or "file"
        self.client = {
            "https": self._http_client,
            "http": self._http_client,
            "s3": self._s3_client,
            "dummy": self._dummy_client,
            "file": self._file_client,
        }.get(scheme)
        if self.client is None:
            raise ValueError(f"Invalid scheme: {scheme}")
        # the dummy backend fabricates pixels at the row's declared
        # bucket shape, so it alone takes (url, declared_wh); a flag
        # bound at selection time keeps __getitem__'s dispatch uniform
        # (robust to the client later being wrapped/overridden)
        self._client_needs_declared_wh = scheme == "dummy"
        self._session = None
        self._s3 = None
        self.aspect_ratio_buckets: dict | None = None

    def __getstate__(self):
        # picklable for the loader's forkserver process workers: the lazy
        # HTTP session / boto3 client hold sockets and locks — drop them;
        # each worker re-creates its own on first use
        state = self.__dict__.copy()
        state["_session"] = None
        state["_s3"] = None
        return state

    # ---- metadata -------------------------------------------------------
    def _load_metadata(self, data_path, base_dir, kind, debug):
        import pandas as pd

        if kind == "parquet":
            pattern = os.path.join(base_dir or ".", data_path,
                                   "*/*/*.parquet")
            files = sorted(glob.glob(pattern))
            # tolerate flatter layouts too
            if not files:
                files = sorted(
                    glob.glob(os.path.join(base_dir or ".", data_path,
                                           "**/*.parquet"), recursive=True)
                )
            frames = []
            size = 0
            for f in files:
                df = pd.read_parquet(f)
                if "media_source" in df.columns:
                    df = df[df["media_source"] != "laion"]  # `data.py:193`
                frames.append(df)
                size += len(df)
                if debug and size > 10240:
                    break
            if not frames:
                raise FileNotFoundError(f"no parquet under {pattern}")
            return pd.concat(frames, ignore_index=True)
        elif kind == "json":
            p = Path(base_dir or ".") / f"{data_path}.json"
            if not p.exists():
                p = Path(data_path)
            with open(p) as f:
                rows = json.load(f)
            return pd.DataFrame(rows).reset_index()
        else:
            raise ValueError("root_dir_type must be 'parquet' or 'json'")

    def __len__(self):
        # round to a multiple of 2048 like the reference, but never to zero
        n = len(self.data)
        if n >= LENGTH_MULTIPLE:
            return n // LENGTH_MULTIPLE * LENGTH_MULTIPLE
        return n

    # ---- buckets --------------------------------------------------------
    def setup_aspect_ratio_buckets(self, min_side=None, max_ratio=None):
        """(w,h)-cached bucket assignment (`data.py:286-311`)."""
        min_side = min_side or self.resolution
        max_ratio = max_ratio or self.max_ratio
        self.aspect_ratio_buckets = {}
        cache: dict[tuple, tuple] = {}
        wh = self.data[["width", "height"]].to_numpy()
        for idx in range(len(self)):
            key = tuple(wh[idx])
            bucket = cache.get(key)
            if bucket is None:
                bucket = center_crop_arr_simulator(key, min_side, max_ratio)
                cache[key] = bucket
            self.aspect_ratio_buckets.setdefault(bucket, []).append(idx)
        logger.info(
            "created %d aspect buckets: %s",
            len(self.aspect_ratio_buckets),
            list(self.aspect_ratio_buckets),
        )
        return self.aspect_ratio_buckets

    # ---- clients --------------------------------------------------------
    def _http_client(self, url):
        import requests
        from requests.adapters import HTTPAdapter, Retry

        if self._session is None:
            self._session = requests.Session()
            retry = Retry(
                total=self.retries, backoff_factor=0.5,
                status_forcelist=[429, 500, 502, 503, 504],
                allowed_methods=["GET"],
            )
            ad = HTTPAdapter(max_retries=retry, pool_connections=200,
                             pool_maxsize=200)
            self._session.mount("http://", ad)
            self._session.mount("https://", ad)
        try:
            url = urlparse(url)._replace(
                netloc=self.base_url.netloc, scheme=self.base_url.scheme
            ).geturl()
            r = self._session.get(url, timeout=2, stream=True)
            r.raise_for_status()
            img = Image.open(io.BytesIO(r.content)).convert("RGB")
            self._maybe_refresh_placeholder(img)
            return img, True
        except Exception as e:  # noqa: BLE001 — any fetch error -> placeholder
            logger.debug("http fetch failed for %s: %s", url, e)
            return None, False

    def _s3_client(self, url):
        try:
            import boto3
        except ImportError:
            logger.warning("boto3 not installed; s3:// backend unavailable")
            return None, False
        try:
            if self._s3 is None:
                self._s3 = boto3.client(
                    "s3",
                    aws_access_key_id=os.getenv("S3KEY"),
                    aws_secret_access_key=os.getenv("S3SECRET"),
                )
            u = urlparse(url)._replace(
                netloc=self.base_url.netloc, scheme="s3"
            )
            body = self._s3.get_object(
                Bucket=u.netloc, Key=u.path.lstrip("/")
            )["Body"].read()
            img = Image.open(io.BytesIO(body)).convert("RGB")
            self._maybe_refresh_placeholder(img)
            return img, True
        except Exception as e:  # noqa: BLE001
            logger.warning("s3 fetch failed for %s: %s", url, e)
            return None, False

    def _file_client(self, url):
        try:
            p = urlparse(url).path if "://" in str(url) else str(url)
            img = Image.open(p).convert("RGB")
            return img, True
        except Exception as e:  # noqa: BLE001
            logger.debug("file read failed for %s: %s", url, e)
            return None, False

    def _dummy_client(self, url, declared_wh=None):
        """Hermetic fake backend (`data.py:384-385`) — deterministic noise
        fabricated at the row's native bucket resolution (the reference
        keeps placeholders at real bucket shapes), so the downstream
        `center_crop_arr` is an identity crop, not a Lanczos upscale of
        low-res noise."""
        row_seed = abs(hash(str(url))) % (2**31)
        rs = np.random.RandomState(row_seed)
        w, h = center_crop_arr_simulator(
            declared_wh or (self.resolution, self.resolution),
            self.resolution, self.max_ratio,
        )
        arr = rs.randint(0, 255, (h, w, 3), np.uint8)
        return Image.fromarray(arr), True

    def _maybe_refresh_placeholder(self, img):
        if random.random() > 0.9:  # `data.py:326-332`
            bucket = center_crop_arr_simulator(
                (img.width, img.height), self.resolution, self.max_ratio
            )
            self.place_holder_image[bucket] = img

    def set_epoch(self, epoch: int):
        """Refresh per-item augmentation draws (flip, caption choice) for
        the new epoch; called next to the sampler's `set_epoch`."""
        self.epoch = int(epoch)

    # ---- items ----------------------------------------------------------
    def __getitem__(self, idx: int) -> dict[str, Any]:
        sample = self.data.iloc[idx]
        # per-item RNG seeded by (dataset seed, epoch, idx): sample-local
        # choices (caption pick, flip) don't depend on global stream
        # position, so a resumed run replays exactly what the straight run
        # drew (the reference's global `random` here breaks resume
        # determinism) — while the epoch term keeps flips/caption picks
        # fresh per visit (a (seed, idx)-only key would pin every image's
        # flip and caption for the whole run)
        item_rng = random.Random(
            ((self.seed or 0) * 2654435761 + self.epoch) * 1000003 + idx
        )
        caption = sample.get(self.caption_column, "")
        if isinstance(caption, (tuple, list, np.ndarray)):
            caption = list(caption)
            caption = item_rng.choice(caption) if caption else ""
        if not isinstance(caption, str):
            caption = ""

        declared_wh = (
            int(sample.get("width", self.resolution)),
            int(sample.get("height", self.resolution)),
        )
        if self._client_needs_declared_wh:
            img, ok = self.client(sample[self.image_column], declared_wh)
        else:
            img, ok = self.client(sample[self.image_column])
        _id = str(sample.get("source_id", idx))
        if ok:
            img = center_crop_arr(img, self.resolution, self.max_ratio)
            if self.random_flip and item_rng.random() < 0.5:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
            arr = normalize_image(img)
        else:
            ew, eh = center_crop_arr_simulator(
                declared_wh, self.resolution, self.max_ratio,
            )
            ph = self.place_holder_image.get(
                (ew, eh), Image.new("RGB", (ew, eh))
            )
            arr = normalize_image(
                center_crop_arr(ph, self.resolution, self.max_ratio)
            )
            _id = "-1"
            caption = ""

        return {
            "image": arr,  # (H, W, 3) float32 in [-1, 1]
            "index": idx,
            "_id": _id,
            "caption": caption,
            "media_source": sample.get("media_source", ""),
            "media_type": sample.get("media_type", "real"),
        }

    # ---- collate --------------------------------------------------------
    def collate_fn(self, batch: list[dict]) -> dict:
        """Stack, homogenizing stray shapes via majority donors
        (`data.py:434-490`)."""
        shapes = [s["image"].shape for s in batch]
        if len(set(shapes)) > 1:
            counts = Counter(shapes)
            max_freq = max(counts.values())
            majority = random.choice(
                [s for s, c in counts.items() if c == max_freq]
            )
            donors = [i for i, s in enumerate(shapes) if s == majority]
            for i, s in enumerate(shapes):
                if s != majority:
                    batch[i] = batch[random.choice(donors)]
            shapes = [s["image"].shape for s in batch]
            assert len(set(shapes)) == 1, "failed to homogenize batch"
        out: dict[str, Any] = {}
        for k in batch[0]:
            vals = [s[k] for s in batch]
            if isinstance(vals[0], np.ndarray):
                out[k] = np.stack(vals, axis=0)
            else:
                out[k] = vals
        return out
