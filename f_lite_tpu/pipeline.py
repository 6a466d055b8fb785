"""FLitePipeline: text -> image, the diffusers-style public entry point.

API parity with the reference `FLitePipeline` (`/root/reference/f_lite/
pipeline.py:46-330`): `from_pretrained`, `__call__(prompt, height, width,
num_inference_steps, guidance_scale, negative_prompt,
num_images_per_prompt, ...)`, `encode_prompt` with zeros for an absent
negative prompt, APG config, PIL output.

TPU-native differences:
- the denoise trajectory runs as ONE jitted `lax.scan` (sampling/euler.py),
  optionally with the VAE decode fused into the same jit;
- RNG is `jax.random` keyed by an int `seed` (torch Generator parity is
  impossible; the parity harness injects noise instead — SURVEY.md §7.3);
- instead of CPU offload (`pipeline.py:52`) the memory controls are VAE
  sliced/tiled decode — weights are bf16-resident, which fits a v5e chip
  for both released model sizes.

Checkpoint inputs accepted by `from_pretrained` (convert/ingest.py):
an HF hub repo id ("Freepik/F-Lite"), a diffusers-layout snapshot dir
(both converted on first use and cached), or the native layout
(produced by tools/convert_checkpoint.py or by that cache):
  {root}/model_index.json
  {root}/dit/config.json + flax_params.safetensors
  {root}/vae/config.json + flax_params.safetensors
  {root}/text_encoder/... (HF T5 dir, optional)
"""

from __future__ import annotations

import dataclasses
import json
import logging
from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from f_lite_tpu.models.dit import DiT, DiTConfig
from f_lite_tpu.models.vae import (
    AutoencoderKL,
    VAEConfig,
    decode_sliced,
    decode_tiled,
    denormalize_latents,
    normalize_latents,
    resolve_memory_mode,
)
from f_lite_tpu.ops.guidance import APGConfig
from f_lite_tpu.sampling.euler import (
    DenoiseSettings,
    auto_steps_per_dispatch,
    make_denoise_fn,
    schedule_start_time,
)
from f_lite_tpu.utils.image import to_pil_images


@dataclasses.dataclass
class FLitePipelineOutput:
    """Output of FLitePipeline (`pipeline.py:34-43`)."""

    images: list


def _preprocess_image(image, height: int, width: int, _signed=None):
    """PIL image / (H, W, 3) array / list of either -> (B0, H, W, 3) fp32
    in [-1, 1] (the VAE's training range), resized to (height, width).

    uint8 arrays are [0, 255]; float arrays are auto-detected: any
    negative value means the array is already in [-1, 1] (e.g. a
    `output_type="np"` image fed straight back), otherwise [0, 1].
    CAVEAT: an all-non-negative [-1, 1] image is indistinguishable from
    [0, 1] data and is taken as [0, 1] — rescale such inputs yourself
    (x/2+0.5) or pass uint8/PIL. A list is classified as a whole (one
    signed frame makes every float frame signed), so one batch never
    mixes interpretations. Values outside both ranges raise. B0 is NOT
    broadcast here — the caller encodes once and broadcasts latents."""
    if isinstance(image, (list, tuple)):
        float_mins = [
            float(np.asarray(i).min()) for i in image
            if isinstance(i, np.ndarray) and i.dtype.kind == "f"
        ]
        signed_all = bool(float_mins) and min(float_mins) < 0.0
        arrs = [
            _preprocess_image(
                i, height, width,
                _signed=signed_all
                if isinstance(i, np.ndarray) and i.dtype.kind == "f"
                else None,
            )[0]
            for i in image
        ]
        return np.ascontiguousarray(np.stack(arrs), np.float32)
    try:
        from PIL import Image as PILImage

        is_pil = isinstance(image, PILImage.Image)
    except ImportError:  # pragma: no cover
        is_pil = False
    signed = False
    if is_pil:
        image = image.convert("RGB")
        if image.size != (width, height):
            image = image.resize((width, height), 2)  # bilinear
        x = np.asarray(image, np.float32)[None] / 255.0
    else:
        x = np.asarray(image)
        if x.ndim == 3:
            x = x[None]
        if x.shape[1] != height or x.shape[2] != width:
            raise ValueError(
                f"array image {x.shape[1:3]} != requested "
                f"({height}, {width}) — resize it or pass a PIL image"
            )
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 255.0
        else:
            x = x.astype(np.float32)
            mn, mx = float(x.min()), float(x.max())
            if _signed and mn >= 0.0:
                # batch-level classification: a sibling frame was signed,
                # so this all-non-negative frame is [-1, 1] too
                if mx > 1.001:
                    raise ValueError(
                        f"float image values in [{mn:.3g}, {mx:.3g}] in "
                        "a [-1, 1]-classified batch"
                    )
                signed = True
            elif mn < 0.0:
                # already in the VAE's [-1, 1] range (e.g. an
                # output_type="np" image fed back); decoders overshoot
                # the nominal range slightly, so clip rather than reject
                if mn < -2.5 or mx > 2.5:
                    raise ValueError(
                        f"float image values in [{mn:.3g}, {mx:.3g}] — "
                        "expected [0, 1] or [-1, 1]"
                    )
                x = np.clip(x, -1.0, 1.0)
                signed = True
            elif mx > 1.001:
                raise ValueError(
                    f"float image values in [0, {mx:.3g}] — expected "
                    "[0, 1]; pass uint8 (or divide by 255) for [0, 255]"
                )
    if not signed:
        x = x * 2.0 - 1.0
    return np.ascontiguousarray(x, np.float32)


def _preprocess_mask(mask, lh: int, lw: int, batch: int):
    """Inpaint mask -> (B, lh, lw, 1) fp32 in [0, 1] at LATENT resolution.

    White (1) = repaint, black (0) = keep (diffusers convention). Accepts
    a PIL image, an (H, W[, 1]) uint8/float array, or a list of either;
    soft (gray) values blend. Resized with bilinear to the latent grid."""
    from PIL import Image as PILImage

    if isinstance(mask, (list, tuple)):
        arrs = [_preprocess_mask(i, lh, lw, 1)[0] for i in mask]
        x = np.stack(arrs)
    else:
        if not isinstance(mask, PILImage.Image):
            a = np.asarray(mask)
            if a.ndim == 3:
                a = a[..., 0]
            if a.dtype != np.uint8:
                # non-uint8 masks must be in [0, 1]: silently scaling a
                # 0-255 float/int mask would clip every value >= 1 to
                # full repaint and destroy soft blends
                af = a.astype(np.float32)
                mn, mx = float(af.min()), float(af.max())
                # symmetric tolerance: resize/antialias ringing produces
                # tiny out-of-range values on BOTH sides (clip handles
                # them); only a clearly 0-255-scaled mask should raise
                if mn < -0.001 or mx > 1.001:
                    raise ValueError(
                        f"mask values in [{mn:.3g}, {mx:.3g}] — expected "
                        "[0, 1] for float/int masks; pass uint8 (or "
                        "divide by 255) for [0, 255]"
                    )
                a = np.clip(af * 255.0, 0, 255).astype(np.uint8)
            mask = PILImage.fromarray(a, "L")
        else:
            mask = mask.convert("L")
        if mask.size != (lw, lh):
            mask = mask.resize((lw, lh), 2)  # bilinear
        x = np.asarray(mask, np.float32)[None, :, :, None] / 255.0
    if x.shape[0] == 1 and batch > 1:
        x = np.broadcast_to(x, (batch, *x.shape[1:]))
    if x.shape[0] != batch:
        raise ValueError(f"got {x.shape[0]} masks for batch {batch}")
    return np.ascontiguousarray(x, np.float32)


def _flatten_params(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten_params(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten_params(flat):
    tree: dict[str, Any] = {}
    for k, v in flat.items():
        parts = k.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


_CS_CHUNK = 4096


def _order_checksum_chunks(f, xp):
    """Per-4096-chunk order-sensitive weighted sums of a flat fp32 vector.

    Returns (nchunk, 2): [:, 0] = sum(f*w) (the checksum), [:, 1] =
    sum(|f|*w) (the magnitude scale its tolerance is relative to). The
    weight w is a fixed strictly-positive position-dependent vector, so a
    within-tensor shuffle perturbs each chunk's checksum by
    ~sqrt(2*chunk)*rms (percent-level relative to scale) while a faithful
    fp32 transfer reproduces it to ~1e-6 relative — a >100x separation at
    the rtol=1e-4 threshold, independent of leaf size (per-leaf whole-sum
    checksums do NOT have this property: their tolerance grows ~n but the
    shuffle signal only ~sqrt(n))."""
    n = f.shape[0]
    npad = (-n) % _CS_CHUNK
    if npad:
        f = xp.pad(f, (0, npad))
    f = f.reshape(-1, _CS_CHUNK)
    w = xp.sin(xp.arange(_CS_CHUNK, dtype=f.dtype) * 0.7) + 1.5
    return xp.stack([(f * w).sum(axis=1), (xp.abs(f) * w).sum(axis=1)],
                    axis=-1)


def _order_checksums_device(tree):
    """Per-leaf chunked ORDER-SENSITIVE checksums, computed on-device.

    Used to verify device->host transfers during export — a remote-tunnel
    D2H bug was observed to silently scramble some tensors' contents
    (same value multiset, shuffled order), producing a structurally valid
    but functionally garbage artifact."""

    @jax.jit
    def go(t):
        return jax.tree.map(
            lambda x: _order_checksum_chunks(
                x.astype(jnp.float32).ravel(), jnp
            ),
            t,
        )

    return go(tree)


def verify_export_transfer(device_tree, host_tree, *, rtol=1e-4,
                           atol=1e-5, what="params") -> None:
    """Raise if the host copy of `device_tree` is not the same tensor data
    in the same order (see _order_checksum_chunks)."""
    dev = jax.device_get(_order_checksums_device(device_tree))
    leaves_d = jax.tree_util.tree_flatten_with_path(dev)[0]
    leaves_h = {
        jax.tree_util.keystr(p): l
        for p, l in jax.tree_util.tree_flatten_with_path(host_tree)[0]
    }
    bad = []
    for p, d in leaves_d:
        key = jax.tree_util.keystr(p)
        h = _order_checksum_chunks(
            np.asarray(leaves_h[key]).astype(np.float32).ravel(), np
        )
        err = np.abs(np.asarray(d[:, 0], np.float64) - h[:, 0])
        tol = rtol * np.maximum(np.asarray(d[:, 1], np.float64),
                                h[:, 1]) + atol
        if (err > tol).any():
            i = int(np.argmax(err - tol))
            bad.append(
                f"{key}: chunk {i} device {float(d[i, 0]):.6g} "
                f"vs host {float(h[i, 0]):.6g}"
            )
    if bad:
        raise RuntimeError(
            f"export transfer verification FAILED for {len(bad)} {what} "
            "leaves — the device->host copy scrambled tensor contents "
            "(known remote-backend D2H bug). Do NOT trust this export; "
            "re-export from the orbax checkpoint on a CPU host "
            "(restore + FLitePipeline.save_pretrained). First failures:\n  "
            + "\n  ".join(bad[:8])
        )


def save_params_safetensors(params, path: Path):
    from safetensors.numpy import save_file

    save_file(_flatten_params(params), str(path))


def load_params_safetensors(path: Path):
    from safetensors.numpy import load_file

    return _unflatten_params(load_file(str(path)))


logger = logging.getLogger("f_lite_tpu.pipeline")


def _config_kwargs(cls, d: dict) -> dict:
    fields = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in fields}


def _scan_expressible(kw: dict) -> bool:
    """Whether a saved block pattern can run as the scan trunk
    (the `(depth - first_n) % period == 0` ScanUnit constraint —
    convert/torch_to_jax.py `to_scan_layout`)."""
    if kw.get("cross_attn_all", False):
        return True
    depth = kw["depth"]
    first_n = min(kw.get("cross_attn_first_n", 8), depth)
    period = kw.get("cross_attn_period", 4)
    return (depth - first_n) % period == 0


class FLitePipeline:
    """Composes DiT + VAE + text encoder; see module docstring."""

    def __init__(
        self,
        dit_model: DiT,
        dit_params,
        vae: AutoencoderKL | None = None,
        vae_params=None,
        text_encoder=None,
    ):
        self.dit_model = dit_model
        self.dit_params = dit_params
        self.vae = vae
        self.vae_params = vae_params
        self.text_encoder = text_encoder
        self.vae_scale_factor = (
            vae.config.spatial_scale if vae is not None else 8
        )
        self.return_index = -8  # hidden-state index (`pipeline.py:83`)
        from f_lite_tpu.utils.cache import LRUCache

        # LRU-bounded: a long-lived server cycling through many distinct
        # (settings, steps_per_dispatch) keys must not accumulate compiled
        # executables forever; 32 variants ≫ any sane serving config set
        self._denoise_cache = LRUCache(maxsize=32)
        # "auto" = direct decode, switching to tiled past 1024px output
        # (a full 2048px decode wants 16.5 GB of decoder activations —
        # measured HBM OOM on a 16 GB v5e). Calling a memory-mode setter
        # (or assigning _decode_mode) makes the choice explicit and
        # disables the auto override — larger-HBM chips can force
        # "direct" at any size.
        self._decode_mode = "auto"  # auto | direct | sliced | tiled
        # tiled-decode tile edge in LATENT units (64 = the diffusers-
        # equivalent production tile; smaller values shrink test work)
        self._tile_latent_size = 64

    # ---- memory modes (reference `pipeline.py:85-93`) -------------------
    def enable_vae_slicing(self):
        self._decode_mode = "sliced"

    def enable_vae_tiling(self):
        self._decode_mode = "tiled"

    def _encode_image_latents(self, x):
        """VAE-encode (B, H, W, 3) [-1, 1] pixels to raw posterior means,
        honoring the memory mode: the encoder's mid-block attention is
        quadratic in pixels/64 just like the decoder's (a 2048px direct
        encode OOMs a 16 GB chip), so "auto" tiles past 1024px inputs and
        explicit modes are respected, mirroring the decode side."""
        from f_lite_tpu.models.vae import encode_sliced, encode_tiled

        mode = resolve_memory_mode(
            self._decode_mode,
            max(x.shape[1], x.shape[2]) // self.vae_scale_factor,
        )
        if mode == "tiled":
            return encode_tiled(self.vae, self.vae_params, x)
        if mode == "sliced":
            return encode_sliced(self.vae, self.vae_params, x)
        return self.vae.apply(
            self.vae_params, x, method=AutoencoderKL.encode
        )

    def set_progress_bar_config(self, **kwargs):
        """API-compat no-op (`pipeline.py:95-97`): the scan-based sampler
        has no host-visible per-step loop. For progress/cancellation use
        `__call__(callback=...)`, which fires at dispatch boundaries."""
        self._progress_bar_config = kwargs

    def warmup(
        self,
        *,
        resolutions=((1024, 1024),),
        batch_sizes=(1,),
        text_lens=(128,),
        num_inference_steps=30,
        guidance_scale=6.0,
        apg_config=None,
    ):
        """Pre-compile the denoise+decode path for the given static-shape
        keys (resolution x batch x text-length buckets define the jit cache,
        SURVEY.md §7.3.5). Call once before serving to avoid first-request
        compile latency."""
        import numpy as np

        for h, w in resolutions:
            for b in batch_sizes:
                for s in text_lens:
                    emb = np.zeros(
                        (b, s, self.dit_model.config.cross_attn_input_size),
                        np.float32,
                    )
                    self(
                        prompt_embeds=emb,
                        height=h, width=w,
                        num_inference_steps=num_inference_steps,
                        guidance_scale=guidance_scale,
                        apg_config=apg_config,
                        seed=0,
                        output_type="np",
                    )

    # ---- loading --------------------------------------------------------
    @classmethod
    def from_pretrained(
        cls,
        path: str | Path,
        *,
        dtype=jnp.bfloat16,
        text_encoder: Any | None = None,
        load_text_encoder: bool = True,
        quantize: bool = False,
        scan_layers: bool | None = None,
        pad_heads_to: int | None = None,
        lora_path: str | Path | None = None,
        lora_alpha: float | None = None,
        lora_scale: float = 1.0,
    ) -> "FLitePipeline":
        """`quantize=True`: int8 W8A8 projections (dynamic per-token activation quant) (~1.74x matmul
        speedup on v5e, see f_lite_tpu/quant.py).

        `scan_layers=None` (default): serve with the scan-layer trunk
        whenever the saved block pattern allows it (restacking unrolled
        checkpoints at load) — identical math, ~9x faster compile, and
        the program shape the kernels are tuned in. Pass False to keep
        an unrolled checkpoint unrolled; checkpoints with LoRA merges
        stay unrolled automatically (factors attach to unrolled kernels).

        `pad_heads_to=N`: zero-pad attention to N heads (exact; see
        DiTConfig.padded_heads) so a tensor-parallel degree that doesn't
        divide num_heads (7B: 10, 10B: 12 on a v5e-8) shards evenly.

        `lora_path`: LoRA checkpoint (dir or .safetensors from the
        trainer's `--use_lora` run, or a reference-format peft
        `lora_weights.pt` — `model.py:487-495`) merged into the base
        weights at load —
        the reference's `pt.py:108-136` inference-LoRA path. Rank is read
        from the factor shapes; `lora_alpha` defaults to the rank (the
        reference's `lora_alpha=lora_rank`).

        `path` accepts, like the reference pipeline (`generate.py:61-66`,
        `comfyui.py:45-60`), any of: a converted native dir, a
        diffusers-layout snapshot dir (converted on first use and cached
        — convert/ingest.py), or an HF hub repo id such as
        "Freepik/F-Lite" (`snapshot_download` when the hub is
        reachable)."""
        from f_lite_tpu.convert.ingest import resolve_pretrained

        path = resolve_pretrained(path)
        index = json.loads((path / "model_index.json").read_text())

        dit_cfg_d = json.loads((path / "dit" / "config.json").read_text())
        cfg_kwargs = {
            **_config_kwargs(DiTConfig, dit_cfg_d),
            "quantized": quantize,
        }
        if pad_heads_to:
            cfg_kwargs["padded_heads"] = pad_heads_to
        pp_saved = int(cfg_kwargs.pop("pipeline_stages", 1) or 1)
        cfg_kwargs.pop("pipeline_microbatches", None)
        # Serving runs the scan trunk whenever the block pattern allows:
        # identical math to unrolled, ~9x faster XLA compile, and the
        # fusion context every serving benchmark/kernel tuning ran in
        # (bench.py; an unrolled 7B program was measured to push the
        # flash kernel's scoped-VMEM footprint over the 16 MB limit at
        # 1024px). Ingest-converted checkpoints save the unrolled layout,
        # so restack at load. LoRA factors attach to unrolled kernels and
        # must keep the saved layout.
        saved_scan = bool(cfg_kwargs.get("scan_layers", False)) or pp_saved > 1
        if scan_layers is None:
            scan_layers = saved_scan or (
                lora_path is None and _scan_expressible(cfg_kwargs)
            )
        if saved_scan and not scan_layers:
            raise ValueError(
                "checkpoint is saved in the scan-stacked layout; "
                "scan_layers=False would need an unstacking pass that "
                "serving never uses — load with scan_layers=None/True"
            )
        cfg_kwargs["scan_layers"] = bool(scan_layers)
        dit_cfg = DiTConfig(**cfg_kwargs, dtype=dtype, param_dtype=dtype)
        dit = DiT(dit_cfg)
        raw_dit = load_params_safetensors(
            path / "dit" / "flax_params.safetensors"
        )
        if scan_layers and not saved_scan:
            from f_lite_tpu.convert.torch_to_jax import to_scan_layout

            raw_dit = to_scan_layout(raw_dit, dit_cfg)
        dit_params = jax.tree.map(
            lambda x: jnp.asarray(x, dtype), {"params": raw_dit}
        )
        if pp_saved > 1:
            # a checkpoint saved mid-training with --pp (the trainer's
            # --export_pipeline folds this, but hand-saved trees may
            # not be): fold the GPipe layout back to the plain scan
            # trunk so serving never runs the pipeline schedule
            from f_lite_tpu.parallel.pipeline import (
                pipeline_to_scan_params,
            )

            logger.warning(
                "checkpoint was saved in pipeline-parallel layout "
                "(pipeline_stages=%d); folding to the plain scan trunk "
                "for serving", pp_saved,
            )
            dit_params = pipeline_to_scan_params(dit_params)
        if lora_path:
            # merge BEFORE head padding / quantization: factors attach to
            # the raw (in, [3|2,] H, D) kernels they were trained against
            from f_lite_tpu.train.lora import apply_lora, load_lora_weights

            lora = load_lora_weights(lora_path)

            def _find_rank(node):
                for k, v in node.items():
                    if isinstance(v, dict):
                        r = _find_rank(v)
                        if r:
                            return r
                    elif k == "lora_a":
                        return int(v.shape[1])
                return 0

            rank = _find_rank(lora)
            if not rank:
                raise ValueError(f"no lora_a factors in {lora_path}")
            alpha = float(lora_alpha) if lora_alpha is not None else rank
            merged = apply_lora(dit_params, lora, alpha=alpha, rank=rank,
                                scale=lora_scale)
            n_changed = sum(
                int(a is not b) for a, b in zip(
                    jax.tree.leaves(dit_params), jax.tree.leaves(merged)
                )
            )
            if n_changed == 0:
                raise ValueError(
                    "LoRA factors matched no kernels — the checkpoint "
                    "layout (e.g. scan-stacked blocks) differs from the "
                    "unrolled layout the factors were trained against"
                )
            logger.info("merged LoRA (%s): rank %d, alpha %g, %d kernels",
                        lora_path, rank, alpha, n_changed)
            dit_params = merged
        if pad_heads_to:
            from f_lite_tpu.convert.torch_to_jax import pad_head_params

            dit_params = pad_head_params(
                dit_params, dit_cfg.head_dim, pad_heads_to
            )
        if quantize:
            from f_lite_tpu.quant import quantize_dit_params

            dit_params = quantize_dit_params(dit_params)

        vae = vae_params = None
        if (path / "vae" / "config.json").exists():
            vae_cfg_d = json.loads((path / "vae" / "config.json").read_text())
            vae_cfg = VAEConfig(**_config_kwargs(VAEConfig, vae_cfg_d))
            vae = AutoencoderKL(vae_cfg)
            vae_params = jax.tree.map(
                jnp.asarray,
                {"params": load_params_safetensors(
                    path / "vae" / "flax_params.safetensors"
                )},
            )

        if text_encoder is None and load_text_encoder:
            te_dir = path / "text_encoder"
            if (te_dir / "config.json").exists():
                te_type = index.get("text_encoder_type", "t5")
                if te_type == "t5":
                    from f_lite_tpu.text.encoder import T5TextEncoder

                    tok_dir = path / "tokenizer"
                    text_encoder = T5TextEncoder(
                        str(te_dir),
                        str(tok_dir) if tok_dir.exists() else str(te_dir),
                        return_index=index.get("return_index", -8),
                    )
                elif te_type == "qwen2":
                    from f_lite_tpu.text.qwen2 import Qwen2TextEncoder

                    tok_dir = path / "tokenizer"
                    text_encoder = Qwen2TextEncoder(
                        str(te_dir),
                        str(tok_dir) if tok_dir.exists() else str(te_dir),
                        return_index=index.get("return_index", -8),
                    )
                else:
                    from f_lite_tpu.text.encoder import TorchTextEncoder

                    text_encoder = TorchTextEncoder(
                        str(te_dir),
                        return_index=index.get("return_index", -8),
                    )

        return cls(dit, dit_params, vae, vae_params, text_encoder)

    def save_pretrained(self, path: str | Path):
        path = Path(path)
        (path / "dit").mkdir(parents=True, exist_ok=True)
        index = {
            "_class_name": "FLitePipeline",
            "framework": "f-lite-tpu",
        }
        (path / "model_index.json").write_text(json.dumps(index, indent=2))
        cfg = dataclasses.asdict(self.dit_model.config)
        for k in ("dtype", "param_dtype"):
            cfg.pop(k, None)
        (path / "dit" / "config.json").write_text(json.dumps(cfg, indent=2))
        import flax.linen as nn

        # tolerate partitioning-boxed trees (raw model.init output):
        # unbox to plain arrays before serialization
        dit_tree = nn.meta.unbox(self.dit_params)["params"]
        host_dit = jax.tree.map(np.asarray, dit_tree)
        # catches the remote-backend D2H scramble before it can produce a
        # structurally-valid-but-garbage artifact (see verify_export_transfer)
        verify_export_transfer(dit_tree, host_dit, what="dit")
        save_params_safetensors(
            host_dit,
            path / "dit" / "flax_params.safetensors",
        )
        if self.vae is not None:
            (path / "vae").mkdir(exist_ok=True)
            vcfg = dataclasses.asdict(self.vae.config)
            for k in ("dtype", "param_dtype"):
                vcfg.pop(k, None)
            vcfg["block_out_channels"] = list(vcfg["block_out_channels"])
            (path / "vae" / "config.json").write_text(
                json.dumps(vcfg, indent=2)
            )
            vae_tree = nn.meta.unbox(self.vae_params)["params"]
            host_vae = jax.tree.map(np.asarray, vae_tree)
            verify_export_transfer(vae_tree, host_vae, what="vae")
            save_params_safetensors(
                host_vae,
                path / "vae" / "flax_params.safetensors",
            )

    # ---- prompt encoding (`pipeline.py:126-175`) ------------------------
    def encode_prompt(
        self,
        prompt: str | Sequence[str],
        negative_prompt: str | Sequence[str] | None = None,
    ):
        if isinstance(prompt, str):
            prompt = [prompt]
        if self.text_encoder is None:
            raise ValueError(
                "pipeline has no text encoder; pass prompt_embeds instead"
            )
        embeds, mask = self.text_encoder.encode(prompt)
        if negative_prompt is None:
            neg = np.zeros_like(embeds)  # `pipeline.py:161`
            neg_mask = np.ones_like(mask)
        else:
            if isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt]
            neg, neg_mask = self.text_encoder.encode(negative_prompt)
            s = max(embeds.shape[1], neg.shape[1])
            embeds, mask = _pad_seq(embeds, mask, s)
            neg, neg_mask = _pad_seq(neg, neg_mask, s)
        return embeds, neg, mask, neg_mask

    # ---- generation (`pipeline.py:188-329`) -----------------------------
    def __call__(
        self,
        prompt: str | Sequence[str] | None = None,
        height: int = 1024,
        width: int = 1024,
        num_inference_steps: int = 30,
        guidance_scale: float = 6.0,
        negative_prompt: str | Sequence[str] | None = None,
        num_images_per_prompt: int = 1,
        seed: int | jax.Array | None = None,
        alpha: float | None = None,
        apg_config: APGConfig | None = None,
        prompt_embeds: np.ndarray | None = None,
        negative_embeds: np.ndarray | None = None,
        context_mask: np.ndarray | None = None,
        negative_context_mask: np.ndarray | None = None,
        latents: jax.Array | None = None,
        output_type: str = "pil",
        return_latents: bool = False,
        steps_per_dispatch: int | None = None,
        callback: Any = None,
        image: Any = None,
        strength: float = 0.8,
        mask_image: Any = None,
        guidance_interval: tuple | None = None,
        sampler: str = "euler",
        pad_context_to: int | None = None,
    ):
        """Generate images. Beyond the reference surface
        (`pipeline.py:188-202`):

        - `steps_per_dispatch`: None = auto (bound each device dispatch to
          ~a batch-1 1024px 32-step workload — see
          `sampling.euler.auto_steps_per_dispatch`); 0 forces a single
          dispatch; N chunks explicitly.
        - `callback(done_steps, total_steps) -> bool`: progress hook run at
          every dispatch boundary; return truthy to cancel mid-trajectory
          (the GUI forever-mode contract, `f_lite_gradio_gui.py:87-109`).
        - `image` + `strength`: image-to-image (SDEdit). `image` is a PIL
          image, an (H, W, 3) uint8/float array, or a list of them; it is
          resized to (height, width), VAE-encoded (posterior mean —
          deterministic and seed-reproducible), and noised to the
          schedule's t at step `N - round(strength*N)` — the training
          interpolant z = (1-t)·x + t·ε — before denoising the remaining
          steps. strength in (0, 1]: 1.0 ≡ pure text-to-image, small
          values stay close to the input. The schedule slice is a traced
          argument: with dispatch chunking (the default) all full-size
          chunks share one compilation across strengths; a strength whose
          remainder-chunk length is new compiles that one short shape
          once (persistent-cache served afterwards).
        - `mask_image` (with `image`): latent inpainting. White = repaint,
          black = keep (soft values blend); after every Euler step the kept
          region is re-imposed at that step's marginal (fresh noise per
          step), so the final step pins it to the input's latents exactly.
          Use strength=1.0 to fully regenerate the masked region. Kept
          pixels still pass through the VAE encode/decode round trip
          (standard latent-inpainting behavior).
        - `guidance_interval=(lo, hi)`: CFG only while the (shifted)
          schedule t is inside [lo, hi]; other steps run the conditional
          forward alone — half the model cost per step (limited-interval
          guidance, Kynkäänniemi et al. 2024; (0.2, 0.8)-style windows
          typically preserve or improve quality). None = CFG everywhere.
        - `sampler`: "euler" (reference parity, default) or "ab2" —
          second-order multistep integration (variable-step
          Adams-Bashforth 2) of the same flow ODE at the same model cost
          per step. O(h^2) convergence is proven on smooth fields
          (tests/test_sampler.py); how much that lets you cut steps
          depends on the smoothness of the trained model's velocity
          field — measure on your checkpoint before lowering
          num_inference_steps (random-weight fields show no benefit:
          PERF.md "ab2 sampler", tools/sampler_order_audit.py).
        - `pad_context_to`: zero-pad the text context (and its mask) up
          to the next multiple of this bucket, exactly — masked keys do
          not attend — so prompts of any length share a few compiled
          denoise shapes instead of one per padded-to-8 text length
          (serving: `serve.py --text_bucket`). None = reference padding.
        """
        apg = apg_config if (apg_config and apg_config.enabled) else None

        if prompt_embeds is None:
            embeds, neg, mask, neg_mask = self.encode_prompt(
                prompt, negative_prompt
            )
        else:
            embeds = prompt_embeds
            neg = (
                negative_embeds
                if negative_embeds is not None
                else np.zeros_like(embeds)
            )
            mask = (
                context_mask
                if context_mask is not None
                else np.ones(embeds.shape[:2], bool)
            )
            # an asymmetric negative (own length/padding) keeps its own
            # key mask on the embeds path too — the HTTP batcher mixes
            # rows whose negative prompts tokenize to different lengths
            if negative_context_mask is not None:
                neg_mask = negative_context_mask
            elif neg.shape[1] == embeds.shape[1]:
                neg_mask = mask
            else:
                # no mask supplied for a different-length negative: all
                # its keys are real (zero-pad below carries mask=0)
                neg_mask = np.ones(neg.shape[:2], bool)
            if neg.shape[1] != embeds.shape[1]:
                # align like encode_prompt does for the prompt path (a
                # zero-padded key carries mask=0: exact)
                s = max(embeds.shape[1], neg.shape[1])
                embeds, mask = _pad_seq(embeds, mask, s)
                neg, neg_mask = _pad_seq(neg, neg_mask, s)

        if pad_context_to:
            # round the context length up to the next multiple (exact:
            # padded keys carry mask=0, which the attention drops) so
            # arbitrary prompt lengths share a handful of compiled shapes
            # instead of one jit key per padded-to-8 length — the HTTP
            # serving path's compile stability knob
            t = -(-embeds.shape[1] // pad_context_to) * pad_context_to
            embeds, mask = _pad_seq(embeds, mask, t)
            neg, neg_mask = _pad_seq(neg, neg_mask, t)

        if num_images_per_prompt > 1:
            embeds = np.repeat(embeds, num_images_per_prompt, axis=0)
            neg = np.repeat(neg, num_images_per_prompt, axis=0)
            mask = np.repeat(mask, num_images_per_prompt, axis=0)
            neg_mask = np.repeat(neg_mask, num_images_per_prompt, axis=0)

        batch = embeds.shape[0]
        lh, lw = height // self.vae_scale_factor, width // self.vae_scale_factor
        dtype = self.dit_model.config.dtype

        settings = DenoiseSettings(
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            apg=apg,
            alpha=alpha,
            guidance_interval=(
                tuple(guidance_interval) if guidance_interval else None
            ),
            method=sampler,
        )
        rng = (
            seed
            if isinstance(seed, jax.Array)
            else jax.random.key(0 if seed is None else seed)
        )
        lat_shape = (batch, lh, lw, self.dit_model.config.in_channels)
        start_step = 0
        inpaint_args = None
        if mask_image is not None and image is None:
            raise ValueError("mask_image requires image")
        if image is not None:
            if latents is not None:
                raise ValueError("pass image or latents, not both")
            if self.vae is None:
                raise ValueError("image-to-image requires a VAE")
            if not 0.0 < strength <= 1.0:
                raise ValueError(f"strength must be in (0, 1], got {strength}")
            n = num_inference_steps
            start_step = n - max(1, min(n, int(round(strength * n))))
            t0 = schedule_start_time(settings, lh, lw, start_step)
            # validate the inputs on EVERY path (count/size/range errors
            # must not depend on whether strength rounds to a full
            # trajectory); only the encode itself is skippable
            x = _preprocess_image(image, height, width)
            if x.shape[0] not in (1, batch):
                raise ValueError(
                    f"got {x.shape[0]} images for batch {batch}"
                )
            if t0 >= 1.0 and mask_image is None:
                # the encoded image would be multiplied by exactly zero:
                # skip the encode and draw the start noise in `dtype` —
                # strength=1.0 is then BITWISE text-to-image for any dtype
                latents = jax.random.normal(rng, lat_shape, dtype)
            else:
                lat = normalize_latents(
                    self._encode_image_latents(jnp.asarray(x))
                    .astype(jnp.float32),
                    self.vae.config,
                )
                if lat.shape[0] == 1 and batch > 1:
                    # encode once, broadcast the LATENTS over the batch
                    lat = jnp.broadcast_to(lat, (batch, *lat.shape[1:]))
                if lat.shape != lat_shape:
                    raise ValueError(
                        f"encoded image latents {lat.shape} != {lat_shape}"
                    )
                noise = jax.random.normal(rng, lat_shape, jnp.float32)
                latents = ((1.0 - t0) * lat + t0 * noise).astype(dtype)
                if mask_image is not None:
                    m = _preprocess_mask(mask_image, lh, lw, batch)
                    inpaint_args = (lat, jnp.asarray(m),
                                    jax.random.fold_in(rng, 1))
        elif latents is None:
            latents = jax.random.normal(rng, lat_shape, dtype)
        if steps_per_dispatch is None:
            steps_per_dispatch = auto_steps_per_dispatch(
                batch, num_inference_steps, lh * lw
            )
        elif steps_per_dispatch == 0:
            steps_per_dispatch = None
        key = (settings, bool(mask is not None), steps_per_dispatch)
        fn = self._denoise_cache.get(key)
        if fn is None:
            fn = make_denoise_fn(
                self.dit_model.apply, settings, donate=True,
                steps_per_dispatch=steps_per_dispatch,
            )
            self._denoise_cache.put(key, fn)

        # CFG context-mask layout is [neg_mask, pos_mask]: an asymmetric
        # negative prompt keeps its own key mask. (The reference's HF-side
        # forward takes no mask at inference and attends to pads; masking
        # both halves correctly is this framework's varlen equivalence.)
        final = fn(
            self.dit_params,
            latents,
            jnp.asarray(embeds, dtype),
            jnp.asarray(neg, dtype),
            jnp.asarray(mask) if mask is not None else None,
            neg_mask=(
                jnp.asarray(neg_mask)
                if (mask is not None and neg_mask is not None)
                else None
            ),
            callback=callback,
            start_step=start_step,
            inpaint=inpaint_args,
        )

        if return_latents or self.vae is None:
            return FLitePipelineOutput(images=np.asarray(final))

        z = denormalize_latents(
            final.astype(jnp.float32), self.vae.config
        )
        mode = resolve_memory_mode(self._decode_mode, max(z.shape[1:3]))
        if mode == "tiled":
            decoded = decode_tiled(
                self.vae, self.vae_params, z,
                tile_latent_size=self._tile_latent_size,
            )
        elif mode == "sliced":
            decoded = decode_sliced(self.vae, self.vae_params, z)
        else:
            decoded = self.vae.apply(
                self.vae_params, z, method=AutoencoderKL.decode
            )
        if output_type == "np":
            return FLitePipelineOutput(
                images=np.asarray(decoded, dtype=np.float32)
            )
        # PIL path: quantize to uint8 ON DEVICE before the host fetch —
        # 4x less transfer than fetching fp32 and converting on host
        # (PERF.md serving load test: the image fetch dominates the
        # pipeline's non-device overhead). Bit-identical to the native
        # host kernel: same (x/2+0.5).clamp(0,1)*255 with half-to-even
        # rounding (native/image_ops.cpp:54-61, reference
        # pipeline.py:324-326).
        u8 = jnp.round(
            jnp.clip(decoded.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
            * 255.0
        ).astype(jnp.uint8)
        from PIL import Image as PILImage

        return FLitePipelineOutput(
            images=[PILImage.fromarray(a) for a in np.asarray(u8)]
        )


def _pad_seq(emb, mask, target):
    if emb.shape[1] == target:
        return emb, mask
    pad = target - emb.shape[1]
    emb = np.pad(emb, ((0, 0), (0, pad), (0, 0)))
    mask = np.pad(mask, ((0, 0), (0, pad)))
    return emb, mask
