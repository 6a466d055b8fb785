"""Direct loading of reference-format checkpoints (diffusers layout / HF hub).

The reference loads released checkpoints with zero preprocessing:
`FLitePipeline.from_pretrained("Freepik/F-Lite")` resolves the hub repo and
deserializes the diffusers layout in place (`/root/reference/f_lite/
generate.py:61-66` injects f_lite into diffusers' LOADABLE_CLASSES; the
ComfyUI node auto-`snapshot_download`s, `comfyui.py:45-60`). This module
gives the TPU pipeline the same zero-step story:

    resolve_pretrained("Freepik/F-Lite")          # hub id -> snapshot -> convert
    resolve_pretrained("/path/to/hf_snapshot")    # diffusers dir -> convert
    resolve_pretrained("/path/to/converted_dir")  # already native -> passthrough

Diffusers-layout sources are converted ONCE through the existing
torch->jax machinery (convert/torch_to_jax.py) and cached next to the
snapshot (`<dir>/f_lite_tpu_converted/`, falling back to
`~/.cache/f_lite_tpu/converted/<digest>` when the snapshot dir is
read-only, e.g. a mounted HF cache). A fingerprint of the source weight
files invalidates the cache when the snapshot changes.

Also hosts the torch->native conversion core shared with the
`tools/convert_checkpoint.py` CLI (which keeps the argparse surface and
the reverse/export directions).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import logging
import os
import re
import shutil
import uuid
from pathlib import Path

logger = logging.getLogger(__name__)

#: hub repo ids the released reference checkpoints live under
#: (`/root/reference/f_lite/comfyui.py:31-35`)
KNOWN_REPO_IDS = (
    "Freepik/F-Lite",
    "Freepik/F-Lite-Texture",
    "Freepik/F-Lite-7B",
)

_REPO_ID_RE = re.compile(r"^[A-Za-z0-9][\w.\-]*/[\w.\-]+$")

# diffusers puts the DiT under one of these subdir names depending on the
# exporter (`f_lite_to_hf.py` writes dit_model/)
_DIT_SUBDIRS = ("dit_model", "transformer", "dit")


# --------------------------------------------------------------------------
# layout detection
# --------------------------------------------------------------------------

def detect_layout(path: Path) -> str | None:
    """Classify a local checkpoint dir.

    Returns "native" (this framework's converted layout), "diffusers"
    (the reference's save_pretrained / hub snapshot layout), or None.
    """
    path = Path(path)
    if not path.is_dir():
        return None
    if (path / "dit" / "flax_params.safetensors").exists():
        return "native"
    for name in _DIT_SUBDIRS:
        d = path / name
        if d.is_dir() and (
            any(d.glob("*.safetensors")) or any(d.glob("*.bin"))
            or any(d.glob("*.pt"))
            or (d / "diffusion_pytorch_model.safetensors.index.json").exists()
        ):
            return "diffusers"
    return None


def looks_like_repo_id(model: str) -> bool:
    """True for `org/name` strings that are not local paths.

    An existing local path always wins — `./out/dir` style relative paths
    can match the repo-id regex.
    """
    return (
        not Path(model).exists()
        and bool(_REPO_ID_RE.match(model))
        and not model.startswith(".")
    )


# --------------------------------------------------------------------------
# torch->native conversion core (shared with tools/convert_checkpoint.py)
# --------------------------------------------------------------------------

def merge_sharded_safetensors(d: Path, prefix="diffusion_pytorch_model"):
    """Load possibly-sharded safetensors (or legacy .bin/.pt) from a
    diffusers component dir."""
    from safetensors.numpy import load_file

    idx = d / f"{prefix}.safetensors.index.json"
    if idx.exists():
        index = json.loads(idx.read_text())
        files = sorted(set(index["weight_map"].values()))
        sd = {}
        for f in files:
            sd.update(load_file(str(d / f)))
        return sd
    single = d / f"{prefix}.safetensors"
    if single.exists():
        return dict(load_file(str(single)))
    cands = sorted(d.glob("*.safetensors"))
    if cands:
        sd = {}
        for f in cands:
            sd.update(load_file(str(f)))
        return sd
    # legacy .bin
    bins = sorted(d.glob("*.bin")) + sorted(d.glob("*.pt"))
    if bins:
        from f_lite_tpu.convert import load_torch_state_dict

        sd = {}
        for f in bins:
            sd.update(load_torch_state_dict(f))
        return sd
    raise FileNotFoundError(f"no weights found in {d}")


def dit_config_from_state_dict(
    sd,
    hf_config=None,
    *,
    width: int = 3072,
    head_dim: int = 256,
    patch_size: int = 2,
    mlp_ratio: float = 4.0,
    cross_attn_input_size: int = 4096,
    residual_v: bool = True,
    train_bias_and_rms: bool = False,
):
    """Infer a DiTConfig from a reference torch state dict (+ optional HF
    config.json dict). Architecture-flag defaults follow the reference's
    `pt.py:24-33`; everything visible in the weights is read from the
    weights (the flags are fallbacks for exotic layouts)."""
    from f_lite_tpu.convert.torch_to_jax import infer_depth
    from f_lite_tpu.models.dit import DiTConfig

    if hf_config:
        w = hf_config.get("hidden_size", width)
        heads = hf_config.get("num_heads", w // head_dim)
        kw = dict(
            in_channels=hf_config.get("in_channels", 16),
            patch_size=hf_config.get("patch_size", patch_size),
            hidden_size=w,
            depth=hf_config.get("depth", infer_depth(sd)),
            num_heads=heads,
            # fallback: the MLP width is directly visible in the state
            # dict — a hardcoded 4.0 would disagree with the weights and
            # fail apply() with a SwiGLU shape error
            mlp_ratio=hf_config.get("mlp_ratio") or (
                sd["blocks.0.mlp.gate_proj.weight"].shape[0] / w
                if "blocks.0.mlp.gate_proj.weight" in sd else 4.0
            ),
            cross_attn_input_size=hf_config.get(
                "cross_attn_input_size", cross_attn_input_size
            ),
            train_bias_and_rms=hf_config.get("train_bias_and_rms", False),
            use_rope=hf_config.get("use_rope", True),
            rope_base=hf_config.get("rope_base", 10000),
            dynamic_softmax_temperature=hf_config.get(
                "dynamic_softmax_temperature", False
            ),
            residual_v=hf_config.get("residual_v", residual_v),
            # non-v1 fields (emitted by export_torch only when non-
            # default) — without these a re-ingested v2-style export
            # would be silently rebuilt as v1
            adaln_mode=hf_config.get("adaln_mode", "shared"),
            cross_attn_all=hf_config.get("cross_attn_all", False),
            cross_attn_first_n=hf_config.get("cross_attn_first_n", 8),
            cross_attn_period=hf_config.get("cross_attn_period", 4),
        )
        return DiTConfig(**kw)
    w = sd["context_proj.weight"].shape[0]
    return DiTConfig(
        in_channels=sd["patch_embed.patch_proj.weight"].shape[1],
        patch_size=sd["patch_embed.patch_proj.weight"].shape[-1],
        hidden_size=w,
        depth=infer_depth(sd),
        num_heads=w // head_dim,
        # the MLP width is directly visible in the state dict; the flag is
        # only a fallback for exotic layouts
        mlp_ratio=(
            sd["blocks.0.mlp.gate_proj.weight"].shape[0] / w
            if "blocks.0.mlp.gate_proj.weight" in sd else mlp_ratio
        ),
        cross_attn_input_size=sd["context_proj.weight"].shape[1],
        train_bias_and_rms="final_norm.weight" in sd,
        residual_v=residual_v or any(".lambda_v" in k for k in sd),
        # v2-style architectures are visible in the key set: per-block
        # adaLN heads instead of one shared head, and a cross-attn tower
        # in a block the v1 pattern (idx%4==0 or idx<8) would skip
        adaln_mode=(
            "per_block" if "blocks.0.adaLN_modulation.1.weight" in sd
            and "adaLN_modulation.1.weight" not in sd else "shared"
        ),
        cross_attn_all=any(
            f"blocks.{i}.cross_attn.q.weight" in sd
            for i in range(8, infer_depth(sd))
            if i % 4 != 0
        ),
    )


def convert_reference_checkpoint(
    output_dir: Path | str,
    *,
    pt: str | Path | None = None,
    hf_dir: str | Path | None = None,
    vae_dir: str | Path | None = None,
    text_encoder_dir: str | Path | None = None,
    tokenizer_dir: str | Path | None = None,
    strict: str | None = None,
    **arch,
) -> Path:
    """Reference torch checkpoint (raw `.pt` or diffusers-layout dir) ->
    the native layout `FLitePipeline.from_pretrained` reads.

    `arch` forwards architecture fallbacks (width/head_dim/...) to
    dit_config_from_state_dict; they only matter for raw `.pt` inputs
    whose shapes don't pin the value (reference `pt.py:24-33`).

    `strict` (off|warn|error; default env F_LITE_STRICT_INGEST, else warn)
    controls key coverage: unlike the reference's silent `strict=False`
    load (`pt.py:98-101`), any source key the conversion didn't consume or
    any config-implied key the source lacks produces a loud manifest diff
    (convert/manifest.py) — warn logs it, error raises KeyCoverageError.
    """
    import numpy as np

    from f_lite_tpu.convert import (
        convert_dit_state_dict,
        convert_vae_state_dict,
        load_torch_state_dict,
    )
    from f_lite_tpu.convert.torch_to_jax import strip_prefixes
    from f_lite_tpu.models.vae import VAEConfig
    from f_lite_tpu.pipeline import save_params_safetensors

    if (pt is None) == (hf_dir is None):
        raise ValueError("pass exactly one of pt= / hf_dir=")

    out = Path(output_dir)
    (out / "dit").mkdir(parents=True, exist_ok=True)

    vae_src = Path(vae_dir) if vae_dir else None
    te_src = Path(text_encoder_dir) if text_encoder_dir else None
    tok_src = Path(tokenizer_dir) if tokenizer_dir else None
    hf_dit_config = None

    if pt:
        sd = strip_prefixes(load_torch_state_dict(pt))
    else:
        hf = Path(hf_dir)
        dit_dir = next(
            (hf / n for n in _DIT_SUBDIRS if (hf / n).exists()), None
        )
        if dit_dir is None:
            raise FileNotFoundError(f"no dit_model/ under {hf}")
        sd = strip_prefixes(merge_sharded_safetensors(dit_dir))
        cfg_file = dit_dir / "config.json"
        if cfg_file.exists():
            hf_dit_config = json.loads(cfg_file.read_text())
        vae_src = vae_src or (
            (hf / "vae") if (hf / "vae").exists() else None
        )
        te_src = te_src or (
            (hf / "text_encoder") if (hf / "text_encoder").exists() else None
        )
        tok_src = tok_src or (
            (hf / "tokenizer") if (hf / "tokenizer").exists() else None
        )

    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    dit_cfg = dit_config_from_state_dict(sd, hf_dit_config, **arch)
    logger.info(
        "DiT: width=%d depth=%d heads=%d cross=%d residual_v=%s",
        dit_cfg.hidden_size, dit_cfg.depth, dit_cfg.num_heads,
        dit_cfg.cross_attn_input_size, dit_cfg.residual_v,
    )
    from f_lite_tpu.convert.manifest import (
        KeyCoverageError,
        check_coverage,
        coverage_report,
    )

    consumed: set[str] = set()
    src_name = str(pt or hf_dir)
    try:
        params = convert_dit_state_dict(sd, dit_cfg, consumed=consumed)
    except KeyError as e:
        # a missing required key would otherwise surface as a bare
        # KeyError — re-raise with the full expected-vs-present diff so
        # first contact with an unknown layout fails legibly
        report = coverage_report(sd, consumed, dit_cfg)
        raise KeyCoverageError(
            f"conversion of {src_name} failed on missing key {e}; "
            + report.render(src_name)
        ) from e
    check_coverage(sd, consumed, dit_cfg, mode=strict, source=src_name,
                   logger=logger)

    cfg_d = dataclasses.asdict(dit_cfg)
    for k in ("dtype", "param_dtype"):
        cfg_d.pop(k, None)
    (out / "dit" / "config.json").write_text(json.dumps(cfg_d, indent=2))
    save_params_safetensors(
        params["params"], out / "dit" / "flax_params.safetensors"
    )

    index = {"_class_name": "FLitePipeline", "framework": "f-lite-tpu",
             "return_index": -8}

    if vae_src:
        vcfg_d = json.loads((vae_src / "config.json").read_text())
        vae_cfg = VAEConfig(
            latent_channels=vcfg_d.get("latent_channels", 16),
            block_out_channels=tuple(
                vcfg_d.get("block_out_channels", (128, 256, 512, 512))
            ),
            layers_per_block=vcfg_d.get("layers_per_block", 2),
            norm_num_groups=vcfg_d.get("norm_num_groups", 32),
            scaling_factor=vcfg_d.get("scaling_factor", 0.3611),
            shift_factor=vcfg_d.get("shift_factor", 0.1159),
            mid_block_add_attention=vcfg_d.get(
                "mid_block_add_attention", True
            ),
        )
        vsd = merge_sharded_safetensors(vae_src)
        vsd = {k: np.asarray(v, np.float32) for k, v in vsd.items()}
        v_consumed: set[str] = set()
        vparams = convert_vae_state_dict(vsd, vae_cfg, consumed=v_consumed)
        v_unconsumed = sorted(set(vsd) - v_consumed)
        if v_unconsumed:
            from f_lite_tpu.convert.manifest import (
                KeyCoverageError,
                strict_mode,
            )

            msg = (f"VAE conversion from {vae_src} dropped "
                   f"{len(v_unconsumed)} source keys: "
                   + ", ".join(v_unconsumed[:16])
                   + (" ..." if len(v_unconsumed) > 16 else ""))
            if strict_mode(strict) == "error":
                raise KeyCoverageError(msg)
            if strict_mode(strict) == "warn":
                logger.warning("%s", msg)
        (out / "vae").mkdir(exist_ok=True)
        vout = dataclasses.asdict(vae_cfg)
        for k in ("dtype", "param_dtype"):
            vout.pop(k, None)
        vout["block_out_channels"] = list(vout["block_out_channels"])
        (out / "vae" / "config.json").write_text(json.dumps(vout, indent=2))
        save_params_safetensors(
            vparams["params"], out / "vae" / "flax_params.safetensors"
        )
        logger.info("converted VAE from %s", vae_src)

    if te_src:
        shutil.copytree(te_src, out / "text_encoder", dirs_exist_ok=True)
        index["text_encoder_type"] = _text_encoder_type(te_src)
        if tok_src:
            shutil.copytree(tok_src, out / "tokenizer", dirs_exist_ok=True)

    (out / "model_index.json").write_text(json.dumps(index, indent=2))
    logger.info("converted checkpoint written to %s", out)
    return out


def _text_encoder_type(te_src: Path) -> str:
    model_type = json.loads(
        (te_src / "config.json").read_text()
    ).get("model_type", "t5")
    if "t5" in model_type:
        return "t5"
    if "qwen2" in model_type:
        return "qwen2"
    return "torch"


# --------------------------------------------------------------------------
# cache + resolution
# --------------------------------------------------------------------------

_CACHE_SUBDIR = "f_lite_tpu_converted"
_FINGERPRINT_FILE = "source_fingerprint.json"


def _source_fingerprint(hf_dir: Path) -> dict:
    """(relpath -> [size, mtime_ns]) over every weight/config/tokenizer
    file that feeds the conversion (including the text_encoder/ and
    tokenizer/ dirs it copies through) — a snapshot update invalidates
    the cache."""
    fp = {}
    for pat in ("*.safetensors", "*.bin", "*.pt", "*.json", "*.model",
                "*.txt"):
        for sub in ((".",) + _DIT_SUBDIRS
                    + ("vae", "text_encoder", "tokenizer")):
            d = hf_dir / sub
            if not d.is_dir():
                continue
            for f in sorted(d.glob(pat)):
                st = f.stat()
                fp[str(f.relative_to(hf_dir))] = [st.st_size, st.st_mtime_ns]
    return fp


def _default_cache_root() -> Path:
    env = os.environ.get("F_LITE_TPU_CACHE")
    if env:
        return Path(env)
    return Path.home() / ".cache" / "f_lite_tpu" / "converted"


def _cache_dir_for(hf_dir: Path) -> Path:
    """Converted-artifact location for a diffusers snapshot: next to the
    snapshot when its parent is writable, else the user cache."""
    local = hf_dir / _CACHE_SUBDIR
    if os.access(hf_dir, os.W_OK):
        return local
    digest = hashlib.sha1(str(hf_dir.resolve()).encode()).hexdigest()[:16]
    return _default_cache_root() / f"{hf_dir.name}-{digest}"


def _cache_valid(cache: Path, fp: dict) -> bool:
    fp_file = cache / _FINGERPRINT_FILE
    if detect_layout(cache) != "native" or not fp_file.exists():
        return False
    try:
        return json.loads(fp_file.read_text()) == fp
    except (json.JSONDecodeError, OSError):
        return False


def _convert_with_cache(hf_dir: Path) -> Path:
    cache = _cache_dir_for(hf_dir)
    fp = _source_fingerprint(hf_dir)
    if _cache_valid(cache, fp):
        logger.info("using cached conversion at %s", cache)
        return cache
    # Convert into a UNIQUE temp sibling then rename into place: a
    # crashed conversion must not leave a half-written dir that
    # detect_layout classifies native, and concurrent first-use loaders
    # (array jobs sharing a snapshot) must not delete each other's
    # in-progress work — each process owns its own tmp, and a stale
    # cache is moved aside atomically (readers holding open fds keep
    # them) rather than rmtree'd in place under other readers.
    tmp = cache.with_name(f"{cache.name}.tmp-{uuid.uuid4().hex[:8]}")
    try:
        convert_reference_checkpoint(tmp, hf_dir=hf_dir)
        (tmp / _FINGERPRINT_FILE).write_text(json.dumps(fp, indent=2))
        for _ in range(8):  # bounded: alternating racers are pathological
            try:
                tmp.rename(cache)
                logger.info("conversion cached at %s", cache)
                return cache
            except OSError:
                pass
            # target exists: a concurrent converter won the race
            # (fingerprint matches — use theirs) or it is a stale
            # conversion of an older snapshot (move aside, retry)
            if _cache_valid(cache, fp):
                shutil.rmtree(tmp, ignore_errors=True)
                logger.info("using concurrently-built cache at %s", cache)
                return cache
            stale = cache.with_name(
                f"{cache.name}.stale-{uuid.uuid4().hex[:8]}")
            try:
                cache.rename(stale)
            except OSError:
                continue  # raced again; revalidate and retry
            shutil.rmtree(stale, ignore_errors=True)
        raise OSError(
            f"could not install converted checkpoint at {cache}: "
            "persistent contention from concurrent converters"
        )
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def _snapshot_download(repo_id: str) -> Path:
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:  # pragma: no cover - hub ships with transformers
        raise FileNotFoundError(
            f"{repo_id!r} looks like a Hugging Face repo id but "
            "huggingface_hub is not installed; download the snapshot "
            "manually and pass the local directory"
        ) from e
    try:
        return Path(snapshot_download(repo_id=repo_id))
    except Exception as e:
        raise FileNotFoundError(
            f"could not download {repo_id!r} from the Hugging Face hub "
            f"({type(e).__name__}: {e}); if the machine has no egress, "
            "fetch the snapshot elsewhere and pass the local directory "
            "(or a dir already converted with tools/convert_checkpoint.py)"
        ) from e


def resolve_pretrained(model: str | Path) -> Path:
    """Resolve any supported checkpoint reference to a native layout dir.

    Accepts, matching the reference's zero-preprocessing loading story:
    - a native converted dir -> returned as-is;
    - a diffusers-layout snapshot dir (reference `save_pretrained` /
      hub snapshot) -> converted on first use, cached (see module doc);
    - an HF hub repo id (e.g. "Freepik/F-Lite") -> `snapshot_download`
      then the diffusers path above (reference `comfyui.py:45-60`).
    """
    p = Path(model)
    if p.exists():
        layout = detect_layout(p)
        if layout == "native":
            return p
        if layout == "diffusers":
            return _convert_with_cache(p)
        raise FileNotFoundError(
            f"{p} is neither a native f-lite-tpu checkpoint "
            "(dit/flax_params.safetensors) nor a diffusers-layout "
            "snapshot (dit_model|transformer/ with torch weights)"
        )
    if looks_like_repo_id(str(model)):
        snap = _snapshot_download(str(model))
        if detect_layout(snap) != "diffusers":
            raise FileNotFoundError(
                f"downloaded snapshot for {model!r} at {snap} has no "
                "recognizable DiT component dir"
            )
        return _convert_with_cache(snap)
    raise FileNotFoundError(
        f"model {str(model)!r}: no such local path, and it does not look "
        "like a Hugging Face repo id"
    )
