"""Training driver: `python -m f_lite_tpu.train` — pre-train / fine-tune.

Reference: `/root/reference/f_lite/train.py` (arg surface `train.py:61-183`,
loop `train.py:970-1224`). Same capability surface, TPU-shaped:

- model/optimizer state lives sharded on a (dp, fsdp, tp) mesh; one jitted
  train step replaces forward/backward/clip/step (`train.py:1006-1019`);
- VAE encode + text encode are the frozen preprocessing stage: VAE encode
  is jitted on-device, text encoding runs on host (or comes precomputed);
- 10-step scalar logging incl. per-decile bin averages (`train.py:
  1026-1074`) to tensorboard (and wandb when installed+selected);
- checkpoint cadence + retention + sampler-state resume
  (`train.py:1077-1097,906-940`);
- periodic eval-image sampling (`train.py:1100-1155`) and 20-batch
  validation (`train.py:1158-1205`);
- LoRA full / train-only-LoRA modes (`train.py:741-780`);
- gradient accumulation via optax.MultiSteps (the reference flag exists
  but its loop steps every batch — `train.py:1011-1019`; here it works).
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("f_lite_tpu.train")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="DiT fine-tuning/pre-training")
    # Model
    p.add_argument("--pretrained_model_path", type=str, default=None)
    p.add_argument("--vae_path", type=str, default=None)
    p.add_argument("--text_encoder_path", type=str, default=None)
    p.add_argument("--text_encoder_type", type=str, default="zero",
                   choices=["t5", "qwen2", "torch", "zero", "precomputed"])
    p.add_argument("--processor_path", type=str, default=None,
                   help="tokenizer/processor dir when it differs from "
                        "--text_encoder_path (`train.py:71,684`)")
    p.add_argument("--model_width", type=int, default=3072)
    p.add_argument("--model_depth", type=int, default=40)
    p.add_argument("--model_head_dim", type=int, default=256)
    p.add_argument("--in_channels", type=int, default=16,
                   help="DiT input channels (16 for VAE latents; 3 with "
                        "--pixel_space)")
    p.add_argument("--model_patch_size", type=int, default=2)
    p.add_argument("--pixel_space", action="store_true",
                   help="train the DiT directly on RGB pixels (identity "
                        "VAE, spatial_scale 1) — hermetic quality "
                        "fixtures whose samples are viewable images; "
                        "implies --in_channels 3")
    p.add_argument("--rope_base", type=int, default=10_000)
    p.add_argument("--cross_attn_input_size", type=int, default=4096)
    p.add_argument("--mlp_ratio", type=float, default=4.0)
    p.add_argument("--cross_attn_first_n", type=int, default=8)
    p.add_argument("--cross_attn_period", type=int, default=4)
    p.add_argument("--cross_attn_all", action="store_true",
                   help="cross-attention in every block (model_v2 pattern)")
    p.add_argument("--adaln_mode", type=str, default="shared",
                   choices=["shared", "per_block"],
                   help="shared (v1) or per-block (v2) AdaLN heads")
    p.add_argument("--residual_v", action="store_true")
    p.add_argument("--train_bias_and_rms", action="store_true")
    p.add_argument("--scan_layers", action="store_true",
                   help="lax.scan over layer stacks (faster compiles, "
                        "stacked params; incompatible with LoRA)")
    # Data
    p.add_argument("--train_data_path", type=str, default=None)
    p.add_argument("--val_data_path", type=str, default=None)
    p.add_argument("--base_image_dir", type=str, default=None)
    p.add_argument("--image_column", type=str, default="media_path")
    p.add_argument("--caption_column", type=str, default="captions")
    p.add_argument("--root_dir_type", type=str, default="parquet")
    p.add_argument("--base_url", type=str, default="dummy://")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--center_crop", action="store_true")
    p.add_argument("--random_flip", action="store_true")
    p.add_argument("--use_resolution_buckets", action="store_true")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--loader_worker_type", choices=("thread", "process"),
                   default="thread",
                   help="host input-pipeline workers: threads (network-"
                        "backed default) or forked processes (decode-"
                        "bound local data; see PERF.md host-pipeline "
                        "table)")
    # Training
    p.add_argument("--train_batch_size", type=int, default=1)
    p.add_argument("--eval_batch_size", type=int, default=1)
    p.add_argument("--num_epochs", type=int, default=1)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--lr_scheduler", type=str, default="linear",
                   choices=["linear", "cosine", "wsd", "constant"])
    p.add_argument("--num_warmup_steps", type=int, default=0)
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="low-precision (bf16) optimizer moments")
    p.add_argument("--use_precomputed_data", action="store_true")
    p.add_argument("--precomputed_data_dir", type=str, default=None)
    p.add_argument("--batch_multiplicity", type=int, default=1)
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="EMA of trained params (0 = off); eval sampling "
                        "and final export use the EMA when enabled")
    p.add_argument("--ema_dtype", choices=("fp32", "bf16"),
                   default="fp32",
                   help="EMA shadow dtype: bf16 halves the extra param "
                        "memory (a 10B EMA fits beside training on 16 GB "
                        "chips) at ~3 decimal digits of decay resolution")
    p.add_argument("--bs_rampup", type=int, default=None,
                   help="ramp the effective batch size up over this many "
                        "steps (`train.py:428-433`; TPU-native: static "
                        "shapes + 0/1 loss weights, same gradient)")
    p.add_argument("--uncond_prob", type=float, default=0.05)
    p.add_argument("--sequence_dropout", type=float, default=0.0,
                   help="drop this fraction of image tokens per step "
                        "(tech report p.5; 0.5 for hi-res speedup)")
    # Parallelism
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--fsdp", type=int, default=1,
                   help="0 = all remaining local devices")
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--sequence_parallel", action="store_true",
                   help="Megatron SP: shard the residual stream over tp "
                        "along the sequence axis (reduce-scatter/"
                        "all-gather instead of all-reduce; 1/tp "
                        "activation memory). Requires --tp > 1.")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stages (GPipe over the "
                        "periodic block region; requires --scan_layers "
                        "and stage count dividing the region's scan "
                        "units)")
    p.add_argument("--pp_microbatches", type=int, default=1,
                   help="microbatches streamed through the pipeline per "
                        "step; bubble = (pp-1)/(microbatches+pp-1)")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (TPU pods)")
    # LoRA
    p.add_argument("--use_lora", action="store_true")
    p.add_argument("--train_only_lora", action="store_true")
    p.add_argument("--lora_rank", type=int, default=64)
    p.add_argument("--lora_alpha", type=int, default=64)
    p.add_argument("--lora_target_modules", type=str,
                   default="qkv,q,context_kv,proj",
                   help="comma-separated kernel names to attach LoRA "
                        "factors to (`train.py:140,750`)")
    p.add_argument("--lora_dropout", type=float, default=0.0,
                   help="peft branch-input dropout. Only 0.0 (the "
                        "reference default) is supported: LoRA here is "
                        "merged into the base weight inside jit (one "
                        "fused matmul — train/lora.py), and a merged "
                        "weight cannot express per-sample branch-input "
                        "dropout")
    p.add_argument("--lora_checkpoint", type=str, default=None)
    # Other
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--output_dir", type=str, default="dit-finetuned")
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=None)
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--async_checkpoint", action="store_true",
                   help="mid-run checkpoint saves return once state is "
                        "snapshotted to host; the directory write overlaps "
                        "the next training steps (Orbax async). The final "
                        "save always waits.")
    p.add_argument("--graceful_term", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="on SIGTERM/SIGINT finish the in-flight step, save "
                        "a checkpoint, and exit 0 (TPU-pod preemption "
                        "delivers SIGTERM with a grace window); a second "
                        "signal force-kills")
    p.add_argument("--mixed_precision", type=str, default=None,
                   choices=["no", "bf16"])
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument("--remat_policy", choices=("full", "dots"),
                   default="full",
                   help="what --gradient_checkpointing saves: 'full' "
                        "(default) = block inputs only (min memory, the "
                        "reference's torch.utils.checkpoint semantics); "
                        "'dots' = also weight-matmul outputs (+10%% temp "
                        "HBM, skips the bwd's forward recompute — "
                        "measure on your pod, see PERF.md)")
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--debug_nans", action="store_true",
                   help="jax nan-checking (the detect_anomaly analog, "
                        "`distributed.py:74,80`)")
    # Logging / eval
    p.add_argument("--logging_dir", type=str, default="logs")
    p.add_argument("--report_to", type=str, default="tensorboard",
                   choices=["tensorboard", "wandb", "all", "none"])
    p.add_argument("--project_name", type=str, default="dit-finetune")
    p.add_argument("--run_name", type=str, default=None)
    p.add_argument("--sample_every", type=int, default=500)
    p.add_argument("--eval_every", type=int, default=500)
    p.add_argument("--sample_prompts_file", type=str, default=None)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--export_pipeline", action="store_true",
                   help="write a FLitePipeline-layout export (dit config + "
                        "safetensors) at the end of training")
    p.add_argument("--profile_steps", type=str, default=None,
                   help="'start,stop' step range to capture a jax.profiler trace")
    return p.parse_args(argv)


# --------------------------------------------------------------------------
# component builders
# --------------------------------------------------------------------------

def build_dit(args, dtype):
    from f_lite_tpu.models.dit import DiT, DiTConfig

    cfg = DiTConfig(
        in_channels=3 if args.pixel_space else args.in_channels,
        patch_size=args.model_patch_size,
        hidden_size=args.model_width,
        depth=args.model_depth,
        num_heads=args.model_width // args.model_head_dim,
        mlp_ratio=args.mlp_ratio,
        cross_attn_input_size=args.cross_attn_input_size,
        cross_attn_first_n=args.cross_attn_first_n,
        cross_attn_period=args.cross_attn_period,
        cross_attn_all=args.cross_attn_all,
        adaln_mode=args.adaln_mode,
        rope_base=args.rope_base,
        residual_v=args.residual_v,
        train_bias_and_rms=args.train_bias_and_rms,
        scan_layers=args.scan_layers,
        pipeline_stages=max(args.pp, 1),
        pipeline_microbatches=max(args.pp_microbatches, 1),
        gradient_checkpoint=args.gradient_checkpointing,
        remat_policy=args.remat_policy,
        dtype=dtype,
        param_dtype=jnp.float32,  # master weights fp32; compute in `dtype`
    )
    return DiT(cfg)


def build_text_encoder(args):
    if args.use_precomputed_data or args.text_encoder_type == "precomputed":
        from f_lite_tpu.text.encoder import PrecomputedTextEncoder

        return PrecomputedTextEncoder(args.precomputed_data_dir)
    if args.text_encoder_type == "t5" and args.text_encoder_path:
        from f_lite_tpu.text.encoder import T5TextEncoder

        # FLUX-style layouts keep the tokenizer in a sibling subfolder
        # (text_encoder_2/ + tokenizer_2/) — --processor_path points at it
        return T5TextEncoder(
            args.text_encoder_path,
            tokenizer_path=getattr(args, "processor_path", None),
        )
    if args.text_encoder_type == "qwen2" and args.text_encoder_path:
        from f_lite_tpu.text.qwen2 import Qwen2TextEncoder
        from f_lite_tpu.text.templates import training_chat_messages

        return Qwen2TextEncoder(
            args.text_encoder_path,
            processor_path=getattr(args, "processor_path", None),
            message_fn=training_chat_messages,
        )
    if args.text_encoder_type == "torch" and args.text_encoder_path:
        from f_lite_tpu.text.encoder import TorchTextEncoder
        from f_lite_tpu.text.templates import training_chat_messages

        return TorchTextEncoder(
            args.text_encoder_path,
            processor_path=getattr(args, "processor_path", None),
            message_fn=training_chat_messages,
        )
    from f_lite_tpu.text.encoder import ZeroTextEncoder

    return ZeroTextEncoder(embed_dim=args.cross_attn_input_size, seq_len=32)


def build_vae(args, dtype):
    from f_lite_tpu.models.vae import AutoencoderKL, IdentityVAE, VAEConfig
    from f_lite_tpu.pipeline import load_params_safetensors

    if getattr(args, "pixel_space", False):
        return IdentityVAE(dtype=dtype), {}
    if args.vae_path:
        import json

        vp = Path(args.vae_path)
        cfg_d = json.loads((vp / "config.json").read_text())
        from f_lite_tpu.pipeline import _config_kwargs

        cfg = VAEConfig(**_config_kwargs(VAEConfig, cfg_d), dtype=dtype)
        vae = AutoencoderKL(cfg)
        params = jax.tree.map(
            jnp.asarray,
            {"params": load_params_safetensors(
                vp / "flax_params.safetensors")},
        )
    else:
        # hermetic fallback: random-init tiny VAE (for loop testing)
        cfg = VAEConfig.tiny(latent_channels=16, dtype=dtype)
        vae = AutoencoderKL(cfg)
        params = vae.init(
            jax.random.key(0), jnp.zeros((1, 32, 32, 3), dtype)
        )
    return vae, params


def build_dataloader(args, batch_size, train=True, sampler_state=None):
    from f_lite_tpu.data import (
        DataLoader,
        ImageDataset,
        ResolutionBucketSampler,
        StatefulDistributedSampler,
    )

    path = args.train_data_path if train else args.val_data_path
    ds = ImageDataset(
        path,
        base_image_dir=args.base_image_dir,
        image_column=args.image_column,
        caption_column=args.caption_column,
        resolution=args.resolution,
        center_crop=args.center_crop,
        random_flip=args.random_flip and train,
        root_dir_type=args.root_dir_type,
        base_url=args.base_url,
        debug=args.debug,
        seed=args.seed or 0,
    )
    # rank-strided loading across hosts (`sampler.py:96-97` semantics):
    # each process iterates a disjoint slice; single-host this is (1, 0)
    from f_lite_tpu.parallel import process_replica_info

    num_replicas, rank = process_replica_info()
    if args.use_resolution_buckets:
        sampler = ResolutionBucketSampler(
            ds, batch_size, num_replicas=num_replicas, rank=rank,
            shuffle=train, seed=args.seed or 0,
        )
        if sampler_state:
            sampler.load_state_dict(sampler_state)
        dl = DataLoader(ds, batch_sampler=sampler,
                        num_workers=args.num_workers,
                        worker_type=args.loader_worker_type)
        return dl, sampler
    sampler = StatefulDistributedSampler(
        ds, batch_size, num_replicas=num_replicas, rank=rank, shuffle=train,
        seed=args.seed or 0,
    )
    if sampler_state:
        sampler.load_state_dict(sampler_state)
    dl = DataLoader(ds, batch_size=batch_size, sampler=sampler,
                    num_workers=args.num_workers, drop_last=True,
                    worker_type=args.loader_worker_type)
    return dl, sampler


class MetricsLogger:
    """tensorboard (+ optional wandb) scalar logging (`train.py:1026-1074`)."""

    def __init__(self, args):
        self.writers = []
        if args.report_to in ("tensorboard", "all"):
            try:
                from tensorboardX import SummaryWriter

                logdir = Path(args.output_dir) / args.logging_dir
                self.tb = SummaryWriter(str(logdir))
                self.writers.append("tb")
            except ImportError:
                self.tb = None
        else:
            self.tb = None
        self.wandb = None
        if args.report_to in ("wandb", "all"):
            try:
                import wandb

                wandb.init(project=args.project_name, name=args.run_name,
                           config=vars(args))
                self.wandb = wandb
            except ImportError:
                logger.warning("wandb not installed; skipping wandb logging")
        if args.report_to != "none" and self.tb is None \
                and self.wandb is None:
            # never degrade to silence: a long training run with no metrics
            # backend is almost certainly a misconfiguration
            logger.error(
                "NO metrics backend is active (--report_to %s, tensorboardX"
                " %savailable, wandb %savailable) — training metrics will "
                "only appear in stdout logs. Install tensorboardX/wandb or "
                "pass --report_to none to silence this.",
                args.report_to,
                "" if self.tb is not None else "un",
                "" if self.wandb is not None else "un",
            )

    def log(self, scalars: dict, step: int):
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, float(v), step)
        if self.wandb is not None:
            self.wandb.log(scalars, step=step)

    def log_histogram(self, tag, bin_counts, step):
        """Timestep-decile occupancy histogram (`train.py:1040-1057`): the
        reference materializes [bin_idx]*count raw samples and logs a
        wandb.Histogram; same raw-data construction here so the rendered
        distribution is identical."""
        counts = [int(c) for c in bin_counts]
        if not any(counts):
            return
        raw = [i for i, c in enumerate(counts) for _ in range(c)]
        if self.tb is not None:
            self.tb.add_histogram(tag, np.asarray(raw), step, bins=10)
        if self.wandb is not None:
            self.wandb.log(
                {tag: self.wandb.Histogram(raw)}, step=step
            )

    def log_image(self, tag, pil_image, step):
        if self.tb is not None:
            self.tb.add_image(
                tag, np.asarray(pil_image).transpose(2, 0, 1), step
            )
        if self.wandb is not None:
            self.wandb.log(
                {tag: self.wandb.Image(pil_image)}, step=step
            )


DEFAULT_SAMPLE_PROMPTS = [
    "a beautiful photograph of a mountain landscape at sunset",
    "a cute cat playing with a ball of yarn",
    "a futuristic cityscape with flying cars",
    "an oil painting of a flower garden",
]


from f_lite_tpu.utils.cache import LRUCache

_SAMPLE_DENOISE_CACHE = LRUCache(maxsize=8)


def sample_images(
    model, params, vae, vae_params, text_encoder, global_step,
    *, image_size=256, num_inference_steps=50, cfg_scale=6.0,
    prompts=None, prompts_file=None, output_dir=None,
):
    """Eval-time image grid (`train.py:501-615`)."""
    from f_lite_tpu.models.vae import AutoencoderKL, denormalize_latents
    from f_lite_tpu.sampling.euler import DenoiseSettings, make_denoise_fn
    from f_lite_tpu.utils.image import make_image_grid, to_pil_images

    if prompts_file and Path(prompts_file).exists():
        lines = [
            l.strip() for l in Path(prompts_file).read_text().splitlines()
            if l.strip()
        ]
        prompts = lines or prompts
    prompts = prompts or DEFAULT_SAMPLE_PROMPTS

    embeds, mask = text_encoder.encode(prompts)
    dtype = model.config.dtype
    scale = vae.config.spatial_scale
    lh = lw = image_size // scale
    rng = jax.random.key(global_step)
    latents = jax.random.normal(
        rng, (len(prompts), lh, lw, model.config.in_channels), dtype
    )
    settings = DenoiseSettings(
        num_inference_steps=num_inference_steps, guidance_scale=cfg_scale
    )
    # jitted + cached across calls: re-sampling every --sample_every must
    # not re-trace the whole 50-step scan (same-config models share a key)
    key = (model.config, settings)
    fn = _SAMPLE_DENOISE_CACHE.get(key)
    if fn is None:
        fn = make_denoise_fn(model.apply, settings, donate=False)
        _SAMPLE_DENOISE_CACHE.put(key, fn)
    pos = jnp.asarray(embeds, dtype)
    final = fn(params, latents, pos, jnp.zeros_like(pos), jnp.asarray(mask))
    z = denormalize_latents(final.astype(jnp.float32), vae.config)
    imgs = vae.apply(
        vae_params, z.astype(vae.config.dtype), method=AutoencoderKL.decode
    )
    pils = to_pil_images(np.asarray(imgs, np.float32))
    grid = make_image_grid(pils, nrow=3)
    if output_dir is not None:
        out = Path(output_dir) / "samples"
        out.mkdir(parents=True, exist_ok=True)
        grid.save(out / f"step_{global_step}.png")
    return grid


# --------------------------------------------------------------------------
# main driver
# --------------------------------------------------------------------------

def train(args) -> dict:
    import flax.linen as nn
    import optax

    from f_lite_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()

    from f_lite_tpu.models.vae import AutoencoderKL, normalize_latents
    from f_lite_tpu.parallel import (
        batch_sharding,
        create_mesh,
        infer_param_shardings,
        put_global_batch,
        shard_params,
    )
    from f_lite_tpu.train.checkpoint import Checkpointer
    from f_lite_tpu.train.loss import flow_matching_loss
    from f_lite_tpu.train.lora import (
        apply_lora,
        init_lora_params,
        load_lora_weights,
        save_lora_weights,
    )
    from f_lite_tpu.train.optim import build_optimizer
    from f_lite_tpu.train.step import TrainState, init_train_state

    t_start = time.time()
    # S3KEY/S3SECRET etc. from .env (`train.py:46-47`, `data.py:30`)
    from f_lite_tpu.utils.env import load_dotenv

    load_dotenv()
    if args.multihost:
        # multi-host rendezvous comes from the TPU-pod metadata — the
        # torchrun/c10d equivalent (`slurm_pretrain.sbatch:82-87`) is free
        jax.distributed.initialize()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.use_precomputed_data and not args.precomputed_data_dir:
        raise SystemExit(
            "--use_precomputed_data requires --precomputed_data_dir"
        )
    if args.use_lora and args.scan_layers:
        raise SystemExit(
            "--use_lora is incompatible with --scan_layers: LoRA factors "
            "attach to unrolled 2-D kernels (stacked scan kernels would "
            "produce an empty factor tree and train nothing)"
        )
    if args.use_lora and args.lora_dropout:
        raise SystemExit(
            "--lora_dropout > 0 is unsupported: LoRA factors are merged "
            "into the base weights inside jit (train/lora.py), which "
            "cannot express per-sample branch-input dropout. The "
            "reference default is 0.0; use --uncond_prob / "
            "--sequence_dropout for regularization instead."
        )
    if args.seed is not None:
        np.random.seed(args.seed)
    rng = jax.random.key(args.seed or 0)
    dtype = jnp.bfloat16 if args.mixed_precision == "bf16" else jnp.float32

    # mesh
    n_dev = len(jax.devices())
    pp = max(args.pp, 1)
    if pp > 1 and not args.scan_layers:
        raise SystemExit("--pp > 1 requires --scan_layers")
    if pp > 1 and args.sequence_dropout > 0:
        raise SystemExit(
            "--pp > 1 is incompatible with --sequence_dropout "
            "(per-sample rope under token subsetting)"
        )
    if pp == 1 and args.pp_microbatches > 1:
        raise SystemExit(
            "--pp_microbatches > 1 has no effect without --pp > 1 "
            "(microbatches only stream through a multi-stage pipeline)"
        )
    # the model sees the GLOBAL batch: local batch x batch_multiplicity
    # tiling x one slice per process (encode_batch/put_global_batch)
    global_batch = (
        args.train_batch_size * max(args.batch_multiplicity, 1)
        * jax.process_count()
    )
    if pp > 1 and global_batch % max(args.pp_microbatches, 1):
        raise SystemExit(
            f"global batch {global_batch} (= train_batch_size x "
            f"batch_multiplicity x process_count) must be divisible by "
            f"--pp_microbatches {args.pp_microbatches} (the model "
            "degrades off-recipe batches silently, which is meant for "
            "eval sampling, not the training step)"
        )
    fsdp = args.fsdp or max(1, n_dev // (args.dp * args.tp * pp))
    mesh = create_mesh(dp=args.dp, fsdp=fsdp, tp=args.tp, pp=pp,
                      devices=jax.devices()[: args.dp * fsdp * args.tp * pp])
    # activation sharding annotations (models/dit.py _constrain) engage
    # for every trace below
    from f_lite_tpu.parallel.mesh import (
        LOGICAL_RULES,
        SP_RULES,
        use_mesh_rules,
    )

    if args.sequence_parallel and args.tp <= 1:
        raise ValueError("--sequence_parallel requires --tp > 1")
    rules = SP_RULES if args.sequence_parallel else LOGICAL_RULES
    use_mesh_rules(mesh, rules)
    logger.info("mesh: dp=%d pp=%d fsdp=%d tp=%d sp=%s", args.dp, pp, fsdp,
                args.tp, args.sequence_parallel)

    # models
    model = build_dit(args, dtype)
    vae, vae_params = build_vae(args, jnp.float32)
    text_encoder = build_text_encoder(args)

    res = args.resolution
    lat = res // vae.config.spatial_scale
    text_len = getattr(text_encoder, "seq_len", 32)

    def boxed_init():
        return model.init(
            jax.random.key(args.seed or 0),
            jnp.zeros((1, lat, lat, model.config.in_channels), dtype),
            jnp.zeros((1, text_len, args.cross_attn_input_size), dtype),
            jnp.ones((1, text_len), jnp.bool_),
            jnp.zeros((1,), dtype),
        )

    param_shardings = infer_param_shardings(boxed_init, mesh)
    if args.pretrained_model_path:
        from f_lite_tpu.pipeline import FLitePipeline

        pipe = FLitePipeline.from_pretrained(
            args.pretrained_model_path, dtype=jnp.float32,
            load_text_encoder=False,
        )
        params = pipe.dit_params
        if pp > 1 and "pipe" not in params["params"].get(
            "blocks_all", params["params"].get("blocks_rest", {})
        ):
            from f_lite_tpu.parallel.pipeline import scan_to_pipeline_params

            params = scan_to_pipeline_params(params, pp)
        if pipe.vae is not None and args.vae_path is None:
            vae, vae_params = pipe.vae, pipe.vae_params
    else:
        params = nn.meta.unbox(boxed_init())
    params = shard_params(params, param_shardings)

    # LoRA
    lora_params = None
    if args.use_lora:
        lora_params = init_lora_params(
            jax.random.key(7), params, rank=args.lora_rank,
            targets=tuple(
                t.strip() for t in args.lora_target_modules.split(",")
                if t.strip()
            ),
        )
        if args.lora_checkpoint:
            lora_params = {"params": load_lora_weights(args.lora_checkpoint)}

    # data
    if args.use_precomputed_data:
        from f_lite_tpu.data.precomputed import create_precomputed_data_loader

        dl, sampler = create_precomputed_data_loader(
            args.precomputed_data_dir, args.train_batch_size,
            num_workers=args.num_workers, seed=args.seed or 0,
            use_buckets=args.use_resolution_buckets,
            latent_flip=args.random_flip,
        )
    else:
        dl, sampler = build_dataloader(args, args.train_batch_size,
                                       train=True)
    val_dl = None
    if args.val_data_path:
        val_dl, _ = build_dataloader(args, args.eval_batch_size, train=False)

    max_steps = args.max_steps or (
        len(dl) * args.num_epochs // args.gradient_accumulation_steps
    )

    opt = build_optimizer(
        learning_rate=args.learning_rate,
        lr_scheduler=args.lr_scheduler,
        num_warmup_steps=args.num_warmup_steps,
        max_steps=max_steps,
        weight_decay=args.weight_decay,
        max_grad_norm=args.max_grad_norm,
        moment_dtype="bfloat16" if args.use_8bit_adam else None,
    )
    if args.gradient_accumulation_steps > 1:
        opt = optax.MultiSteps(opt, args.gradient_accumulation_steps)

    lr_fn = None  # for logging
    from f_lite_tpu.train.optim import build_lr_schedule

    lr_fn = build_lr_schedule(
        args.lr_scheduler, args.learning_rate,
        num_warmup_steps=args.num_warmup_steps, max_steps=max_steps,
    )

    # With LoRA the base is frozen and only adapters train — same effective
    # behavior as the reference, where peft's add_adapter freezes the base
    # and the optimizer filters requires_grad (`train.py:753-760,899`).
    train_lora_only = args.use_lora

    if train_lora_only:
        state = init_train_state(lora_params, opt)
    else:
        state = init_train_state(params, opt)

    # jitted step (closure differs for lora-only)
    uncond_prob = args.uncond_prob if not args.use_precomputed_data else 0.01

    def loss_for(params_like, rng_, latents, ctx, mask, weight=None):
        if train_lora_only:
            merged = apply_lora(
                params, params_like, alpha=args.lora_alpha,
                rank=args.lora_rank,
            )
        else:
            merged = params_like
        return flow_matching_loss(
            model.apply, merged, rng_, latents, ctx, mask,
            uncond_prob=uncond_prob,
            token_keep_ratio=1.0 - args.sequence_dropout,
            sample_weight=weight,
        )

    def step_fn(state: TrainState, rng_, latents, ctx, mask, weight=None):
        (loss, aux), grads = jax.value_and_grad(
            loss_for, has_aux=True
        )(state.params, rng_, latents, ctx, mask, weight)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "bin_sums": aux.bin_sums,
            "bin_counts": aux.bin_counts,
        }
        return TrainState(state.step + 1, new_params, opt_state), metrics

    train_step = jax.jit(step_fn, donate_argnums=(0,))
    eval_loss = jax.jit(
        lambda p, rng_, lat_, ctx_, m_: loss_for(p, rng_, lat_, ctx_, m_)[0]
    )

    vae_encode = jax.jit(
        lambda vp, imgs, rng_: normalize_latents(
            vae.apply(vp, imgs, rng_, method=AutoencoderKL.encode),
            vae.config,
        )
    )

    # checkpointing / resume
    ckpt = Checkpointer(args.output_dir,
                        total_limit=args.checkpoints_total_limit)
    global_step = 0
    if args.resume_from_checkpoint:
        which = args.resume_from_checkpoint
        step_no = ckpt.last_training_time if which == "latest" else int(
            Path(which).name
        )
        if step_no is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            # restore onto the mesh: params/moments keep their
            # NamedShardings; scalar leaves (step, optax counters) were
            # created off-mesh (uncommitted, single-device) — restoring
            # them committed to device 0 would poison the first jitted
            # step on any multi-device mesh, so pin them replicated
            replicated = NamedSharding(mesh, PartitionSpec())
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(
                    x.shape, x.dtype,
                    sharding=(
                        x.sharding
                        if isinstance(
                            getattr(x, "sharding", None), NamedSharding
                        )
                        else replicated
                    ),
                ),
                state,
            )
            state = ckpt.load(step_no, abstract)
            global_step = int(state.step)
            sstate = ckpt.load_sampler_state(step_no)
            if sstate:
                dl, sampler = build_dataloader(
                    args, args.train_batch_size, train=True,
                    sampler_state=sstate,
                )
            logger.info("resumed from step %d", global_step)

    # EMA of the trained params (full model or LoRA factors) — beyond the
    # reference; sampled/exported weights come from the EMA when enabled
    ema_params = None
    ema_update = None
    if args.ema_decay != 0.0:
        if not 0.0 < args.ema_decay < 1.0:
            # decay == 1.0 would freeze the EMA at the initial weights —
            # and the EMA is what eval sampling and export prefer, so a
            # whole run's export would silently be untrained; negative
            # values are a typo, not a request to disable (that's 0)
            raise ValueError(
                f"--ema_decay must be 0 (off) or in (0, 1), "
                f"got {args.ema_decay}"
            )
        d = float(args.ema_decay)
        ema_dt = jnp.bfloat16 if args.ema_dtype == "bf16" else None

        def _ema_leaf_dtype(x):
            # float leaves follow --ema_dtype; int/bool leaves pass through
            if ema_dt is not None and jnp.issubdtype(x.dtype, jnp.floating):
                return ema_dt
            return x.dtype

        # donate the old EMA tree: without it every step holds two
        # full EMA copies in HBM (multi-GB transient at 7B-10B scale)
        ema_update = jax.jit(
            lambda e, p: jax.tree.map(
                lambda a, b: (
                    a.astype(jnp.float32) * d
                    + b.astype(jnp.float32) * (1.0 - d)
                ).astype(a.dtype),
                e, p,
            ),
            donate_argnums=(0,),
        )
        restored = None
        if args.resume_from_checkpoint and global_step:
            abstract_p = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(
                    x.shape, _ema_leaf_dtype(x),
                    sharding=getattr(x, "sharding", None),
                ),
                state.params,
            )
            restored = ckpt.load_extra(global_step, "ema", abstract_p)
        # deep copy: train_step donates the state, so aliasing
        # state.params would dangle after the first step
        ema_params = (
            restored if restored is not None
            else jax.tree.map(
                # copy=True: train_step donates the state; aliasing
                # state.params (asarray/astype no-op on same dtype)
                # would dangle after the first step
                lambda x: jnp.array(
                    x, dtype=_ema_leaf_dtype(x), copy=True
                ),
                state.params,
            )
        )

    metrics_logger = MetricsLogger(args)
    # device-side accumulators: fetching them with np.asarray every step
    # would block the host on step completion and kill async dispatch
    # pipelining; they are materialized only at log boundaries
    bin_sums = jnp.zeros(10, jnp.float32)
    bin_counts = jnp.zeros(10, jnp.float32)
    bsh = batch_sharding(mesh)

    profile_range = None
    if args.profile_steps:
        a, b = args.profile_steps.split(",")
        profile_range = (int(a), int(b))

    def encode_batch(batch, rng_):
        if args.use_precomputed_data:
            # latents already VAE-encoded + normalized at precompute time
            latents = jnp.asarray(batch["vae_latent"], jnp.float32)
            ctx, mask = batch["text_embedding"], batch["text_mask"]
        else:
            imgs = jnp.asarray(batch["image"], jnp.float32)
            latents = vae_encode(vae_params, imgs, rng_)
            ctx, mask = text_encoder.encode(batch["caption"])
        if args.batch_multiplicity > 1:
            reps = args.batch_multiplicity
            latents = jnp.tile(latents, (reps, 1, 1, 1))
            ctx = np.tile(ctx, (reps, 1, 1))
            mask = np.tile(mask, (reps, 1))
        # put_global_batch: device_put single-host; across hosts each
        # process contributes its slice of the global batch (global batch
        # = train_batch_size * process_count)
        return (
            put_global_batch(latents.astype(dtype), bsh),
            put_global_batch(jnp.asarray(ctx, dtype), bsh),
            put_global_batch(jnp.asarray(mask), bsh),
        )

    logger.info(
        "dataset=%d images, %d batches/epoch, max_steps=%d",
        len(dl.dataset), len(dl), max_steps,
    )

    # Graceful preemption: TPU pods deliver SIGTERM with a grace window on
    # eviction/maintenance. Finish the in-flight step, checkpoint, exit 0 —
    # the resume path (`--resume_from_checkpoint latest`) picks up exactly
    # where the signal landed. Restoring the previous handlers after the
    # loop means a second signal (or one during the final save) gets the
    # default fatal behavior.
    preempt = {"sig": None}
    prev_handlers = {}
    if args.graceful_term:
        import signal as _signal

        def _on_term(signum, frame):
            preempt["sig"] = signum
            logger.warning(
                "signal %d received: will checkpoint and stop at the next "
                "step boundary (send again to force-kill)", signum,
            )
            _signal.signal(signum, prev_handlers.get(
                signum, _signal.SIG_DFL))

        try:
            for _s in (_signal.SIGTERM, _signal.SIGINT):
                prev_handlers[_s] = _signal.signal(_s, _on_term)
        except ValueError:
            prev_handlers = {}  # not the main thread (in-process callers)

    stop = False
    result = {}
    # resume continues inside the epoch the checkpoint was taken in: both
    # samplers persist `epoch` (the shuffle key is seed+epoch), so
    # restarting at 0 would replay epoch-0 sample order and augmentation
    # draws for the remainder of the interrupted epoch
    start_epoch = int(getattr(sampler, "epoch", 0))
    for epoch in range(start_epoch, args.num_epochs):
        if hasattr(sampler, "set_epoch"):
            sampler.set_epoch(epoch)
        if hasattr(dl.dataset, "set_epoch"):
            # fresh per-visit augmentation draws (flip/caption) each epoch
            dl.dataset.set_epoch(epoch)
        epoch_start = time.time()
        for batch in dl:
            if profile_range and global_step == profile_range[0]:
                jax.profiler.start_trace(
                    str(Path(args.output_dir) / "profile")
                )
            # step-keyed (not sequentially split): resume at step N replays
            # exactly the keys the straight-through run used at step N
            k_enc, k_step = jax.random.split(
                jax.random.fold_in(rng, global_step)
            )
            latents, ctx, mask = encode_batch(batch, k_enc)
            weight = None
            if args.bs_rampup and global_step < args.bs_rampup:
                # gradually raise the effective batch (`train.py:428-433`:
                # target rounded up to a multiple of 4); random subset via
                # a 0/1 loss weight so shapes stay static
                bsz = int(latents.shape[0])
                target = min(
                    bsz,
                    -(-(global_step + 1) * bsz // (args.bs_rampup * 4)) * 4,
                )
                if target < bsz:
                    # seeded by (seed, step) so resume-during-rampup
                    # reproduces and every host picks the same subset
                    rs = np.random.RandomState(
                        ((args.seed or 0) * 1000003 + global_step)
                        % (2**32)
                    )
                    perm = rs.permutation(bsz)
                    w = np.zeros(bsz, np.float32)
                    w[perm[:target]] = 1.0
                    # w is GLOBAL-length (bsz = global batch) and
                    # identical on every host (seeded by (seed, step)) —
                    # put_global_batch's local-slice contract does NOT
                    # apply here; build the global array per-shard
                    # instead, each device reading its own rows of the
                    # shared global vector (multi-host safe)
                    weight = jax.make_array_from_callback(
                        (bsz,), bsh, lambda idx: w[idx]
                    )
            state, metrics = train_step(
                state, k_step, latents, ctx, mask, weight
            )
            if ema_update is not None:
                ema_params = ema_update(ema_params, state.params)
            global_step += 1

            if profile_range and global_step == profile_range[1]:
                jax.tree.map(
                    lambda x: x.block_until_ready(), metrics["loss"]
                )
                jax.profiler.stop_trace()

            bin_sums = bin_sums + metrics["bin_sums"]  # lazy, on device
            bin_counts = bin_counts + metrics["bin_counts"]

            if global_step % args.log_every == 0:
                logs = {
                    "train/loss": float(metrics["loss"]),
                    "train/diffusion_loss": float(metrics["loss"]),
                    "train/lr": float(lr_fn(global_step)),
                    "train/epoch": epoch,
                    "train/step": global_step,
                    "train/grad_norm": float(metrics["grad_norm"]),
                }
                bs, bc = np.asarray(bin_sums), np.asarray(bin_counts)
                for i in range(10):
                    if bc[i] > 0:
                        logs[f"metrics/avg_loss_bin_{i}"] = bs[i] / bc[i]
                metrics_logger.log(logs, global_step)
                metrics_logger.log_histogram(
                    "metrics/diffusion_loss_bin_counts", bc, global_step
                )
                logger.info(
                    "step %d loss %.4f lr %.2e grad %.3f",
                    global_step, logs["train/loss"], logs["train/lr"],
                    logs["train/grad_norm"],
                )
                bin_sums = jnp.zeros_like(bin_sums)
                bin_counts = jnp.zeros_like(bin_counts)
                result.update(logs)

            if args.checkpointing_steps and \
                    global_step % args.checkpointing_steps == 0:
                ckpt.save(global_step, state,
                          sampler.state_dict(global_step),
                          wait=not args.async_checkpoint,
                          extra={"ema": ema_params}
                          if ema_params is not None else None)
                logger.info("saved checkpoint @ %d%s", global_step,
                            " (async)" if args.async_checkpoint else "")

            if args.sample_every and global_step % args.sample_every == 0:
                sample_src = (
                    ema_params if ema_params is not None else state.params
                )
                eff = (
                    apply_lora(params, sample_src,
                               alpha=args.lora_alpha, rank=args.lora_rank)
                    if train_lora_only else sample_src
                )
                grid = sample_images(
                    model, eff, vae, vae_params, text_encoder, global_step,
                    image_size=args.resolution,
                    num_inference_steps=8 if args.debug else 50,
                    prompts_file=args.sample_prompts_file,
                    output_dir=args.output_dir,
                )
                metrics_logger.log_image("samples", grid, global_step)

            if val_dl and args.eval_every and \
                    global_step % args.eval_every == 0:
                vlosses = []
                for vi, vbatch in enumerate(val_dl):
                    # derived, not split from `rng`: keeps the train-step
                    # key stream independent of eval cadence
                    k1, k2 = jax.random.split(jax.random.fold_in(
                        rng, (1 << 30) + global_step * 32 + vi
                    ))
                    vl, vc, vm = encode_batch(vbatch, k1)
                    vlosses.append(float(eval_loss(state.params, k2, vl,
                                                   vc, vm)))
                    if vi >= 19:  # `train.py:1192`
                        break
                if vlosses:
                    v = sum(vlosses) / len(vlosses)
                    metrics_logger.log({"val/loss": v,
                                        "val/diffusion_loss": v},
                                       global_step)
                    logger.info("validation loss: %.4f", v)
                    result["val/loss"] = v

            if preempt["sig"] is not None:
                logger.warning(
                    "stopping on signal %d at step %d; saving final "
                    "checkpoint", preempt["sig"], global_step,
                )
                result["preempted_at"] = global_step
                stop = True
                break
            if global_step >= max_steps:
                stop = True
                break
        logger.info("epoch %d done in %.1fs", epoch,
                    time.time() - epoch_start)
        if stop:
            break
        if hasattr(sampler, "reset"):
            # the restored mid-epoch offset applies only to the resumed
            # epoch; later epochs must iterate the full dataset
            sampler.reset(0)

    if args.graceful_term and prev_handlers:
        for _s, _h in prev_handlers.items():
            _signal.signal(_s, _h)

    # final save (`train.py:1228-1245`)
    ckpt.save(global_step, state, sampler.state_dict(global_step),
              extra={"ema": ema_params} if ema_params is not None else None)
    if args.use_lora:
        final_dir = ckpt._dir(global_step)
        lora_final = state.params if train_lora_only else lora_params
        save_lora_weights(lora_final, final_dir)
        logger.info("saved LoRA weights to %s", final_dir)

    if args.export_pipeline:
        from f_lite_tpu.pipeline import FLitePipeline

        export_src = (
            ema_params if ema_params is not None else state.params
        )
        eff = (
            apply_lora(params, export_src, alpha=args.lora_alpha,
                       rank=args.lora_rank)
            if train_lora_only else export_src
        )
        export_model = model
        if pp > 1:
            # fold the GPipe layout back to the portable plain-scan
            # layout: the exported artifact must serve on any mesh (tp
            # only, single chip) without running the pipeline schedule
            import dataclasses as _dc

            from f_lite_tpu.models.dit import DiT
            from f_lite_tpu.parallel.pipeline import pipeline_to_scan_params

            eff = pipeline_to_scan_params(eff)
            export_model = DiT(_dc.replace(
                model.config, pipeline_stages=1, pipeline_microbatches=1
            ))
        # pixel-space runs have no real VAE to serialize: export the DiT
        # alone (consumers treat a missing vae dir as identity decode)
        export_vae = None if args.pixel_space else vae
        export_pipe = FLitePipeline(
            export_model, eff, export_vae,
            None if export_vae is None else vae_params, None)
        export_dir = Path(args.output_dir) / "pipeline"
        export_pipe.save_pretrained(export_dir)
        logger.info("exported pipeline to %s", export_dir)

    result["global_step"] = global_step
    result["wall_s"] = time.time() - t_start
    logger.info("training completed after %d steps (%.1fs)",
                global_step, result["wall_s"])
    return result


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    return train(parse_args(argv))


if __name__ == "__main__":
    main()
