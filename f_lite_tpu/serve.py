"""Batched serving: many prompts -> PNGs at maximum chip utilization.

The north-star serving mode (BASELINE.json): drive the denoiser in fixed-
shape batches straight from precomputed text-embedding caches (the
`precompute_embeddings.py` serving path), optionally tensor-parallel over
an ICI mesh. One jit compilation per (batch, resolution, steps) key; the
denoise trajectory is the scan-under-jit sampler, so steady-state serving
is one dispatch per batch.

  python -m f_lite_tpu.serve --model <dir> --prompts prompts.txt \
      --batch_size 4 --width 1024 --height 1024 --steps 30 \
      [--precomputed_dir <cache>] [--tp 4] [--dp 2] --output_dir outs/

Multi-chip scaling is two orthogonal axes on one mesh: `--tp N` shards
every projection Megatron-style (cuts per-image latency, the <4 s p50
v5e-8 path), `--dp N` shards the batch (throughput: images/min scales
with chips at constant latency — each dp shard denoises batch/dp rows
with no cross-shard communication beyond the CFG row exchange).

HTTP mode (`--http_port`) serves the same pipeline as an endpoint
(stdlib-only, no new dependencies): `POST /generate` with a JSON body
`{"prompt": ..., "width"?, "height"?, "steps"?, "guidance_scale"?,
"seed"?, "negative_prompt"?, "sampler"?, "image"? (base64 PNG/JPEG:
image-to-image), "mask_image"? (base64: latent inpainting),
"strength"?}` returns a parameter-stamped PNG; `GET /healthz` reports readiness; `GET /metrics` serves Prometheus
counters (requests, images, device seconds, batch occupancy, p50/p95).
The default shape is pre-compiled before the port binds, so the first
request is fast; off-default shapes
compile once (persistent cache) and must be multiples of 16, capped at
2048 (the single-chip HBM guardrail — PERF.md 2048px datum). Device work
is serialized by a lock — concurrent requests queue (batch-1 is the
optimal single-chip config, PERF.md). With `--dp N` queued same-shape
requests are instead microbatched into one dp-sharded dispatch
(RequestBatcher): N concurrent requests cost ~one request's latency.

  python -m f_lite_tpu.serve --model <dir> --http_port 8080 --quantize
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path

from f_lite_tpu.utils.image import save_with_metadata

logger = logging.getLogger("f_lite_tpu.serve")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="batched F-Lite serving")
    p.add_argument("--model", required=True)
    p.add_argument("--prompts", default=None,
                   help="batch mode input: a text file (one prompt per "
                        "line, one seed per batch) or a .jsonl file — "
                        "each line {\"prompt\": ..., "
                        "\"negative_prompt\"?, \"seed\"?} gets its own "
                        "latents, so every row is reproducible alone "
                        "(generate --from_png) regardless of batching")
    p.add_argument("--http_port", type=int, default=None,
                   help="serve an HTTP endpoint on this port instead of "
                        "a prompts file (POST /generate, GET /healthz)")
    p.add_argument("--http_host", default="127.0.0.1",
                   help="HTTP bind address (0.0.0.0 to expose)")
    p.add_argument("--text_bucket", type=int, default=128,
                   help="zero-pad the text context up to the next "
                        "multiple of this (exact — masked keys do not "
                        "attend) so any prompt length hits one of a few "
                        "pre-compilable denoise shapes; 0 = pad to the "
                        "per-prompt multiple-of-8 length (reference "
                        "behavior, one compile per distinct length)")
    # batch 1 is the optimal single-chip config (PERF.md: batch-1 already
    # saturates the MXU at 7B/1024px; batching pays off across chips)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--guidance_scale", type=float, default=6.0)
    p.add_argument("--guidance_interval", type=float, nargs=2,
                   default=None, metavar=("LO", "HI"),
                   help="CFG only while the schedule t is inside "
                        "[LO, HI]; other steps run conditional-only at "
                        "half the model cost")
    p.add_argument("--negative_prompt", type=str, default=None,
                   help="one negative prompt applied to every batch-mode "
                        "image (HTTP requests carry their own)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--precomputed_dir", type=str, default=None,
                   help="serve text embeddings from a precompute cache")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways over local devices "
                        "(cuts per-image latency)")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel ways over local devices: the batch "
                        "is sharded --dp ways, so images/min scales with "
                        "chips at batch-1-per-chip latency (throughput "
                        "axis; combines with --tp — dp*tp devices). "
                        "Batch mode: --batch_size must be divisible by "
                        "--dp. HTTP mode: queued same-shape requests are "
                        "microbatched into one dp-sharded dispatch")
    p.add_argument("--warmup_shapes", type=str, default=None,
                   help="HTTP mode: extra WxH shapes to pre-compile "
                        "before the port binds, e.g. "
                        "'1344x896,896x1344' — requests for these "
                        "resolutions then skip the first-hit compile "
                        "spike (the --width x --height default is "
                        "always warmed)")
    p.add_argument("--batch_window_ms", type=float, default=100.0,
                   help="HTTP + --dp > 1: how long the batcher waits for "
                        "more same-shape requests before dispatching a "
                        "partial batch (adds at most this to latency; "
                        "~1%% of a 7B 1024px generation at the default)")
    p.add_argument("--output_dir", type=str, default="outputs")
    p.add_argument("--no_text_encoder", action="store_true")
    p.add_argument("--quantize", action="store_true",
                   help="int8 W8A8 DiT projections (dynamic act quant) (~1.7x matmuls)")
    p.add_argument("--lora_path", type=str, default=None,
                   help="serve a fine-tuned LoRA: trainer --use_lora dir/"
                        ".safetensors or a reference-format peft "
                        "lora_weights.pt — merged into the base weights "
                        "at load, BEFORE head padding / int8 quantization")
    p.add_argument("--lora_scale", type=float, default=1.0)
    p.add_argument("--lora_alpha", type=float, default=None,
                   help="peft lora_alpha of the adapter; default None = "
                        "rank (the reference pt.py's lora_alpha=lora_rank "
                        "convention). Set it when serving an adapter "
                        "trained with alpha != rank, or equivalently pass "
                        "--lora_scale alpha/rank")
    p.add_argument("--steps_per_dispatch", type=int, default=None,
                   help="split the denoise trajectory into dispatches of "
                        "at most N steps; default auto-bounds dispatch "
                        "wall time (long-dispatch watchdogs), 0 forces a "
                        "single dispatch")
    from f_lite_tpu.sampling.euler import SAMPLERS

    p.add_argument("--sampler", choices=SAMPLERS, default="euler",
                   help="'ab2' = second-order multistep integration at "
                        "the same per-step cost (step-count saving "
                        "depends on the trained field's smoothness — "
                        "see PERF.md 'ab2 sampler')")
    return p.parse_args(argv)


def build_pipeline(args):
    """Pipeline construction shared by batch and HTTP modes: load (with
    optional int8 quantization / head padding), wire the text-encoder
    choice, shard over a (dp, tp) mesh when --dp/--tp > 1."""
    import jax

    from f_lite_tpu.pipeline import FLitePipeline
    from f_lite_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()
    if args.dp < 1 or args.tp < 1:
        raise SystemExit("--dp/--tp must be >= 1")
    n_mesh = args.dp * args.tp
    if n_mesh > len(jax.devices()):
        raise SystemExit(
            f"--dp {args.dp} x --tp {args.tp} = {n_mesh} devices, but only "
            f"{len(jax.devices())} are visible"
        )

    pad_heads_to = None
    if args.tp > 1:
        # tp must divide the attention head count; if it doesn't (7B: 10
        # heads, 10B: 12 on a v5e-8), zero-pad heads to the next multiple
        # — exact, see DiTConfig.padded_heads
        dit_cfg = json.loads(
            (Path(args.model) / "dit" / "config.json").read_text()
        )
        heads = dit_cfg.get("num_heads", 12)
        if heads % args.tp:
            pad_heads_to = -(-heads // args.tp) * args.tp
            logger.info("padding %d heads -> %d for tp=%d",
                        heads, pad_heads_to, args.tp)

    pipe = FLitePipeline.from_pretrained(
        args.model,
        load_text_encoder=not (args.precomputed_dir or args.no_text_encoder),
        quantize=args.quantize,
        pad_heads_to=pad_heads_to,
        lora_path=args.lora_path,
        lora_scale=args.lora_scale,
        lora_alpha=args.lora_alpha,
    )
    if args.precomputed_dir:
        from f_lite_tpu.text.encoder import PrecomputedTextEncoder

        pipe.text_encoder = PrecomputedTextEncoder(args.precomputed_dir)
    elif args.no_text_encoder:
        from f_lite_tpu.text.encoder import ZeroTextEncoder

        pipe.text_encoder = ZeroTextEncoder(
            embed_dim=pipe.dit_model.config.cross_attn_input_size
        )

    if n_mesh > 1:
        from f_lite_tpu.parallel import create_mesh, infer_param_shardings, \
            shard_params

        # dp replicates the params (no param logical axis maps to dp) and
        # shards the batch: the `act_batch -> (dp, fsdp)` rule splits every
        # model activation's rows across dp — embarrassingly parallel but
        # for the CFG concat/split at each step's boundary, which exchanges
        # latent-sized rows (~0.5 MB at 1024px: noise on ICI). tp is the
        # Megatron latency axis; the two compose on one mesh.
        mesh = create_mesh(dp=args.dp, fsdp=1, tp=args.tp,
                           devices=jax.devices()[:n_mesh])
        model = pipe.dit_model

        def boxed_init():
            return model.init(jax.random.key(0), *_dummy_inputs(model.config))

        shardings = infer_param_shardings(boxed_init, mesh)
        pipe.dit_params = shard_params(pipe.dit_params, shardings)
        # engage the model's activation sharding annotations for every
        # denoise trace below (clean Megatron collective schedule)
        from f_lite_tpu.parallel.mesh import use_mesh_rules

        use_mesh_rules(mesh)
        logger.info("sharded DiT over %d chips (dp=%d, tp=%d)",
                    n_mesh, args.dp, args.tp)
    return pipe


def _load_jsonl_rows(path: Path, args) -> list[dict]:
    """Parse a .jsonl prompts file into per-row request dicts.

    Each line: {"prompt": str, "negative_prompt"?: str, "seed"?: int}.
    Missing negatives inherit --negative_prompt; missing seeds count up
    from --seed in file order (stable under re-runs)."""
    rows: list[dict] = []
    for ln, line in enumerate(path.read_text().splitlines(), 1):
        if not line.strip():
            continue
        try:
            r = json.loads(line)
        except ValueError as e:
            raise SystemExit(f"{path}:{ln}: invalid JSON ({e})")
        if not isinstance(r, dict) or not isinstance(r.get("prompt"), str) \
                or not r["prompt"].strip():
            raise SystemExit(
                f"{path}:{ln}: each line must be an object with a "
                "non-empty string 'prompt'"
            )
        unknown = sorted(set(r) - {"prompt", "negative_prompt", "seed"})
        if unknown:
            raise SystemExit(
                f"{path}:{ln}: unknown keys {unknown} (width/steps/... "
                "come from the launch flags)"
            )
        neg = r.get("negative_prompt", args.negative_prompt)
        if neg is not None and not isinstance(neg, str):
            raise SystemExit(f"{path}:{ln}: negative_prompt must be a "
                             "string")
        seed = r.get("seed")
        if seed is None:
            seed = args.seed + len(rows)
        elif not isinstance(seed, int) or isinstance(seed, bool) \
                or not 0 <= seed <= 2**31 - 1:
            # same bounds as the HTTP endpoint — an out-of-int64 seed
            # passing here would only crash after the model load
            raise SystemExit(
                f"{path}:{ln}: seed must be an integer in [0, 2^31-1]"
            )
        rows.append({"prompt": r["prompt"], "negative_prompt": neg or None,
                     "seed": seed})
    if not rows:
        raise SystemExit(f"no rows in {path}")
    return rows


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    # `is None` (not truthiness): --http_port 0 = ephemeral port
    if (args.prompts is None) == (args.http_port is None):
        raise SystemExit(
            "pass exactly one of --prompts (batch mode) or "
            "--http_port (HTTP endpoint mode)"
        )

    if args.dp > 1 and args.prompts is not None \
            and args.batch_size % args.dp:
        raise SystemExit(
            f"--batch_size {args.batch_size} must be divisible by "
            f"--dp {args.dp} (each dp shard denoises batch/dp rows)"
        )
    if args.warmup_shapes:
        if args.http_port is None:
            raise SystemExit("--warmup_shapes applies to HTTP mode")
        _parse_warmup_shapes(args.warmup_shapes)  # fail fast, pre-load

    rows = None  # .jsonl mode: per-row prompt/negative/seed dicts
    if args.prompts is not None:
        # read + validate before the (multi-minute at 7B) model load so
        # a typo'd path fails immediately
        if args.prompts.endswith(".jsonl"):
            rows = _load_jsonl_rows(Path(args.prompts), args)
            prompts = [r["prompt"] for r in rows]
        else:
            prompts = [
                l.strip()
                for l in Path(args.prompts).read_text().splitlines()
                if l.strip()
            ]
        if not prompts:
            raise SystemExit(f"no prompts in {args.prompts}")
        if args.precomputed_dir:
            # same fail-fast treatment for the cache: a caption that was
            # never precomputed (negative prompt included) must error
            # here, not after the multi-minute model load
            from f_lite_tpu.text.encoder import PrecomputedTextEncoder

            te = PrecomputedTextEncoder(args.precomputed_dir)
            need = list(prompts)
            if rows is not None:
                need += [r["negative_prompt"] for r in rows
                         if r["negative_prompt"]]
            elif args.negative_prompt:
                need.append(args.negative_prompt)
            missing = [p for p in need if not te.has(p)]
            if missing:
                raise SystemExit(
                    f"{len(missing)} caption(s) not in the precompute "
                    f"cache {args.precomputed_dir} (first: "
                    f"{missing[0]!r}) — run tools/precompute_embeddings"
                    ".py on them first"
                )

    pipe = build_pipeline(args)
    if args.http_port is not None:
        return run_http(pipe, args)

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    # pad the final batch so every dispatch reuses one compiled shape
    bs = args.batch_size
    n = len(prompts)
    items = rows if rows is not None else prompts
    padded = items + [items[-1]] * ((-n) % bs)

    results = []
    # PNG encode+write happens on threads so the chip starts the next
    # batch's denoise while the host serializes the previous images
    from concurrent.futures import ThreadPoolExecutor

    saver = ThreadPoolExecutor(2)
    pending = []
    shared_kwargs = dict(
        height=args.height, width=args.width,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance_scale,
        guidance_interval=args.guidance_interval,
        steps_per_dispatch=args.steps_per_dispatch,
        sampler=args.sampler,
        # without the bucket, the denoise jit key tracks each batch's
        # longest-prompt padded-to-8 text length — N batches could
        # mean N compiles; with it, "one compilation per (batch,
        # resolution, steps) key" (module docstring) actually holds
        pad_context_to=args.text_bucket or None,
    )
    t_start = time.perf_counter()
    for bi in range(0, len(padded), bs):
        chunk = padded[bi : bi + bs]
        t0 = time.perf_counter()
        if rows is not None:
            # .jsonl: per-row negatives + per-row seeded latents (the
            # HTTP batcher's exact-solo-reproduction semantics)
            embeds, mask, nemb, nmask = _encode_rows(
                pipe,
                [r["prompt"] for r in chunk],
                [r["negative_prompt"] for r in chunk],
            )
            out = pipe(
                prompt_embeds=embeds, negative_embeds=nemb,
                context_mask=mask, negative_context_mask=nmask,
                latents=_row_latents(pipe, [r["seed"] for r in chunk],
                                     args.height, args.width),
                **shared_kwargs,
            )
        else:
            out = pipe(
                prompt=chunk,
                negative_prompt=(
                    [args.negative_prompt] * len(chunk)
                    if args.negative_prompt else None
                ),
                seed=args.seed + bi,
                **shared_kwargs,
            )
        dt = time.perf_counter() - t0
        for j, img in enumerate(out.images):
            idx = bi + j
            if idx >= n:
                break
            f = out_dir / f"{idx:05d}.png"
            meta = {
                "prompt": prompts[idx],
                "width": args.width, "height": args.height,
                "steps": args.steps,
                "guidance_scale": args.guidance_scale,
                "guidance_interval": args.guidance_interval,
                "sampler": args.sampler,
                "model": args.model,
                "quantize": args.quantize or None,
            }
            if rows is not None:
                # per-row latents: the row reproduces alone, no batch
                # composition stamp needed
                meta["negative_prompt"] = rows[idx]["negative_prompt"]
                meta["seed"] = rows[idx]["seed"]
            else:
                meta["negative_prompt"] = args.negative_prompt
                meta["seed"] = args.seed + bi
                # one seed draws the whole batch: exact reproduction
                # needs the same batch composition (--from_png warns)
                meta["batch_size"] = bs
                meta["batch_index"] = j
            pending.append(saver.submit(save_with_metadata, img, f, meta))
            entry = {"prompt": prompts[idx], "file": str(f)}
            if rows is not None:
                entry["seed"] = rows[idx]["seed"]
            results.append(entry)
        logger.info("batch %d: %.2fs (%.2fs/image)",
                    bi // bs, dt, dt / len(chunk))
    for fut in pending:
        fut.result()  # surface write errors; all files durable
    saver.shutdown()
    wall = time.perf_counter() - t_start
    manifest = {
        "images": results,
        "wall_s": wall,
        "images_per_min": 60.0 * n / wall,
    }
    (out_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(json.dumps({
        "images": n, "wall_s": round(wall, 2),
        "images_per_min": round(60.0 * n / wall, 2),
    }))
    return manifest


def _encode_rows(pipe, prompts, negs):
    """(embeds, mask, neg_embeds, neg_mask) for per-row prompts with
    OPTIONAL per-row negatives. Rows whose negative is None/"" keep the
    reference zeros semantics exactly like a solo call
    (`pipeline.py:161`), and encoders that cannot encode arbitrary text
    (PrecomputedTextEncoder) never see the absent rows. Shared by the
    HTTP RequestBatcher and the JSONL batch mode."""
    import numpy as np

    embeds, mask = pipe.text_encoder.encode(list(prompts))
    embeds, mask = np.asarray(embeds), np.asarray(mask)
    with_neg = [i for i, x in enumerate(negs) if x]
    if with_neg:
        sub, subm = pipe.text_encoder.encode(
            [negs[i] for i in with_neg]
        )
        sub, subm = np.asarray(sub), np.asarray(subm)
        nemb = np.zeros(
            (len(prompts), sub.shape[1], sub.shape[2]), np.float32
        )
        nmask = np.ones((len(prompts), subm.shape[1]), bool)
        nemb[with_neg] = sub
        nmask[with_neg] = subm
    else:
        nemb = np.zeros_like(embeds)
        nmask = np.ones(mask.shape, bool)
    return embeds, mask, nemb, nmask


def _row_latents(pipe, seeds, height, width):
    """One latent row per seed — each row is the exact draw a solo call
    with that seed makes, so batching never changes what a seed
    produces (and any row is reproducible alone)."""
    import jax
    import jax.numpy as jnp

    cfg = pipe.dit_model.config
    lh = height // pipe.vae_scale_factor
    lw = width // pipe.vae_scale_factor
    return jnp.concatenate([
        jax.random.normal(jax.random.key(s),
                          (1, lh, lw, cfg.in_channels), cfg.dtype)
        for s in seeds
    ], axis=0)


class ServerMetrics:
    """Prometheus-text-format counters for the HTTP endpoint (stdlib).

    Scrape `GET /metrics`. Tracks request counts by status, device
    seconds spent generating, images served, dispatch batch occupancy
    (dp microbatching efficiency), and a p50/p95 latency window.
    """

    def __init__(self):
        import collections
        import threading

        self._lock = threading.Lock()
        self.requests = {}  # (endpoint, status) -> count
        self.device_seconds = 0.0
        self.images = 0
        self.batch_rows = 0
        self.dispatch_count = 0
        self._latency = collections.deque(maxlen=1000)
        # wired to the pipeline's LRU-bounded denoise cache by run_http so
        # operators can watch compiled-variant growth/evictions
        self.compiled_cache = None

    def record_request(self, endpoint: str, status: int):
        with self._lock:
            k = (endpoint, str(status))
            self.requests[k] = self.requests.get(k, 0) + 1

    def record_dispatch(self, device_s: float, rows: int):
        """Once per DEVICE dispatch (the batcher calls this for a shared
        dispatch; the dp=1 path per request) — device_seconds must sum to
        actual device-busy time, not be multiplied by batch sharing."""
        with self._lock:
            self.device_seconds += device_s
            self.batch_rows += rows
            self.dispatch_count += 1
            self._latency.append(device_s)

    def record_image(self):
        with self._lock:
            self.images += 1

    def render(self) -> str:
        with self._lock:
            lines = [
                "# TYPE f_lite_requests_total counter",
            ]
            for (ep, status), n in sorted(self.requests.items()):
                lines.append(
                    f'f_lite_requests_total{{endpoint="{ep}",'
                    f'status="{status}"}} {n}'
                )
            lines += [
                "# TYPE f_lite_images_total counter",
                f"f_lite_images_total {self.images}",
                "# TYPE f_lite_device_seconds_total counter",
                f"f_lite_device_seconds_total {self.device_seconds:.3f}",
                "# TYPE f_lite_dispatches_total counter",
                f"f_lite_dispatches_total {self.dispatch_count}",
                "# TYPE f_lite_batch_rows_avg gauge",
                f"f_lite_batch_rows_avg "
                f"{self.batch_rows / max(self.dispatch_count, 1):.3f}",
            ]
            if self.compiled_cache is not None:
                lines += [
                    "# TYPE f_lite_compiled_variants gauge",
                    f"f_lite_compiled_variants {len(self.compiled_cache)}",
                    "# TYPE f_lite_compiled_evictions_total counter",
                    "f_lite_compiled_evictions_total "
                    f"{self.compiled_cache.evictions}",
                ]
            lat = sorted(self._latency)
            if lat:
                p50 = lat[len(lat) // 2]
                p95 = lat[min(len(lat) - 1, int(len(lat) * 0.95))]
                lines += [
                    "# TYPE f_lite_generate_seconds_p50 gauge",
                    f"f_lite_generate_seconds_p50 {p50:.3f}",
                    "# TYPE f_lite_generate_seconds_p95 gauge",
                    f"f_lite_generate_seconds_p95 {p95:.3f}",
                ]
        return "\n".join(lines) + "\n"


class RequestBatcher:
    """Microbatch queued HTTP requests into one dp-sharded dispatch.

    With `--dp N` the mesh denoises N batch rows at ~batch-1-per-chip
    latency, so requests sharing a compiled shape (width, height, steps,
    sampler, guidance_scale) are grouped: the dispatcher thread takes the
    oldest queued request, waits up to `--batch_window_ms` for more with
    the same key, pads the group to exactly N rows (repeating the last —
    the jit key is always batch=N, one compiled program), and runs ONE
    pipeline call. Per-request seeds are honored by stacking per-row
    latents drawn exactly as a batch-1 call with that seed would, so row
    i reproduces that request's solo image. FIFO head-of-line batching:
    requests with a different shape key wait their turn (each new key is
    a one-time compile, persistent-cache served).
    """

    def __init__(self, pipe, args, max_batch: int, window_s: float):
        import contextvars
        import threading

        self.pipe, self.args = pipe, args
        self.max_batch, self.window = max_batch, window_s
        self.metrics = None  # optional ServerMetrics, set by the server
        self._cv = threading.Condition()
        self._q: list = []  # (key, request, Future)
        self._stop = False
        # contextvars do NOT propagate to new threads, and the dp/tp
        # activation-sharding rules (use_mesh_rules in build_pipeline)
        # live in one: run the dispatcher inside a copy of the
        # CONSTRUCTION context so every denoise traces with the mesh
        # engaged — without this the act_batch->(dp,fsdp) rule is inert
        # and the compiled program silently loses its batch sharding
        self._ctx = contextvars.copy_context()
        self._thread = threading.Thread(
            target=lambda: self._ctx.run(self._loop),
            daemon=True, name="f-lite-batcher",
        )
        self._thread.start()

    @classmethod
    def from_args(cls, pipe, args):
        """The one place the batch size / window derivation lives."""
        return cls(pipe, args, max_batch=args.dp,
                   window_s=args.batch_window_ms / 1000.0)

    @staticmethod
    def _key(r: dict):
        return (r["width"], r["height"], r["steps"], r["sampler"],
                r["guidance_scale"])

    def submit(self, r: dict):
        """Queue a parsed request; returns a Future of
        (png_bytes, device_seconds, batch_rows)."""
        from concurrent.futures import Future

        f: Future = Future()
        with self._cv:
            if self._stop:
                raise RuntimeError("batcher stopped")
            self._q.append((self._key(r), r, f))
            self._cv.notify_all()
        return f

    def stop(self):
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._thread.join(timeout=5)

    def _loop(self):
        while True:
            with self._cv:
                while not self._q and not self._stop:
                    self._cv.wait()
                if self._stop:
                    err = RuntimeError("server shutting down")
                    for _, _, f in self._q:
                        f.set_exception(err)
                    self._q.clear()
                    return
                key = self._q[0][0]
                deadline = time.monotonic() + self.window

                def matching():
                    return [i for i, (k, _, _) in enumerate(self._q)
                            if k == key]

                while len(matching()) < self.max_batch and not self._stop:
                    left = deadline - time.monotonic()
                    if left <= 0:
                        break
                    self._cv.wait(timeout=left)
                if self._stop:
                    # do NOT launch a multi-second dispatch after shutdown
                    # was signalled: push the collected batch back and let
                    # the loop top fail everything queued
                    continue
                idxs = matching()[: self.max_batch]
                batch = [self._q[i] for i in idxs]
                for i in reversed(idxs):
                    del self._q[i]
            try:
                pngs, dt = self._generate(key, [r for _, r, _ in batch])
                if self.metrics is not None:
                    self.metrics.record_dispatch(dt, len(batch))
                for (_, _, f), png in zip(batch, pngs):
                    f.set_result((png, dt, len(batch)))
            except Exception as e:  # surface to every waiter, keep serving
                logger.exception("batched generation failed")
                for _, _, f in batch:
                    if not f.done():
                        f.set_exception(e)

    def _generate(self, key, reqs: list[dict]):
        """-> (list of stamped png bytes, device-work seconds)."""
        from f_lite_tpu.utils.image import png_bytes_with_metadata

        width, height, steps, sampler, g = key
        pipe, args = self.pipe, self.args
        n = len(reqs)
        rows = reqs + [reqs[-1]] * (self.max_batch - n)
        # timer covers text encode + latents + denoise + decode — the
        # same work the dp=1 path times inside its lock (pipe(prompt=...)
        # encodes internally), so X-F-Lite-Seconds and the dispatch
        # metrics compare across modes; only PNG encode stays outside
        t0 = time.perf_counter()
        embeds, mask, nemb, nmask = _encode_rows(
            pipe,
            [r["prompt"] for r in rows],
            [r["negative_prompt"] for r in rows],
        )
        lat = _row_latents(pipe, [r["seed"] for r in rows], height, width)
        out = pipe(
            prompt_embeds=embeds,
            negative_embeds=nemb,
            context_mask=mask,
            negative_context_mask=nmask,
            latents=lat,
            height=height, width=width,
            num_inference_steps=steps,
            guidance_scale=g,
            guidance_interval=args.guidance_interval,
            steps_per_dispatch=args.steps_per_dispatch,
            sampler=sampler,
            pad_context_to=args.text_bucket or None,
        )
        dt = time.perf_counter() - t0
        # NO batch_size/batch_index stamp: per-row seeded latents make a
        # solo `generate --from_png` rerun reproduce a batched row exactly
        # (the stamp would trigger from_png's one-seed-per-batch warning,
        # which is about serve.py's --prompts mode, not this path)
        return [
            png_bytes_with_metadata(img, _request_metadata(r, args))
            for img, r in zip(out.images[:n], reqs)
        ], dt


def make_http_server(pipe, args, host="127.0.0.1", port=0, batcher=None):
    """HTTP endpoint over a loaded pipeline (stdlib ThreadingHTTPServer).

    POST /generate  {"prompt": str, "negative_prompt"?, "width"?,
                     "height"?, "steps"?, "guidance_scale"?, "seed"?,
                     "sampler"?}            -> image/png (tEXt-stamped)
    GET  /healthz                           -> {"status": "ok", ...}
    GET  /metrics                           -> Prometheus text format

    Device work is serialized by a lock (batch-1 is the optimal
    single-chip config); concurrent requests queue on it. With --dp > 1
    a `RequestBatcher` replaces the lock: queued same-shape requests are
    microbatched into one dp-sharded dispatch (images/min scales with
    chips; `X-F-Lite-Batch` reports how many rows shared the dispatch).
    Requests without a seed draw from a process-wide counter so repeated
    identical bodies still produce distinct images — the seed actually
    used is stamped into the PNG for reproduction (`generate
    --from_png`). Returns the server; callers own
    serve_forever()/shutdown() (+ server.batcher.stop() when set).
    """
    import itertools
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from f_lite_tpu.sampling.euler import SAMPLERS
    from f_lite_tpu.utils.image import png_bytes_with_metadata

    from f_lite_tpu.text.encoder import PrecomputedTextEncoder

    # cache-backed server: preflight captions per request so one
    # uncached caption 400s only ITS request, never a whole microbatch
    precomputed_te = (
        pipe.text_encoder
        if isinstance(pipe.text_encoder, PrecomputedTextEncoder) else None
    )
    if batcher is None and args.dp > 1:
        batcher = RequestBatcher.from_args(pipe, args)
    metrics = ServerMetrics()
    # getattr: tests drive the server with duck-typed pipe stubs that
    # have no compiled-fn cache; /metrics then just omits the gauges
    metrics.compiled_cache = getattr(pipe, "_denoise_cache", None)
    if batcher is not None:
        batcher.metrics = metrics
    device_lock = threading.Lock()
    # graceful-drain state (begin_drain/drain_wait): draining servers
    # 503 new work but finish what is in flight — the serving analog of
    # the trainer's SIGTERM preemption checkpoint
    drain = {"on": False, "inflight": 0}
    drain_cv = threading.Condition()
    auto_seed = itertools.count(args.seed)
    seed_lock = threading.Lock()

    class BadRequest(ValueError):
        pass

    def _int_field(req, key, default, lo, hi):
        # only request-supplied values are range-checked: the server's
        # own --width/--height/--steps defaults are trusted as-is (tests
        # and small models legitimately run below the public bounds)
        if key not in req:
            return default
        v = req[key]
        if not isinstance(v, int) or isinstance(v, bool) or not lo <= v <= hi:
            raise BadRequest(f"{key} must be an integer in [{lo}, {hi}]")
        return v

    def _parse_request(req):
        if not isinstance(req, dict):
            raise BadRequest("body must be a JSON object")
        prompt = req.get("prompt")
        if not isinstance(prompt, str) or not prompt.strip():
            raise BadRequest("prompt (non-empty string) is required")
        if len(prompt) > 10_000:
            raise BadRequest("prompt too long (max 10000 chars)")
        neg = req.get("negative_prompt")
        if neg is not None and not isinstance(neg, str):
            raise BadRequest("negative_prompt must be a string")
        width = _int_field(req, "width", args.width, 16, 2048)
        height = _int_field(req, "height", args.height, 16, 2048)
        if width % 16 or height % 16:
            # latent grid = pixels/8, patched by 2 — the same multiple-of-
            # 16 contract as the CLI; reject instead of silently rounding
            raise BadRequest("width/height must be multiples of 16")
        steps = _int_field(req, "steps", args.steps, 1, 200)
        g = req.get("guidance_scale", args.guidance_scale)
        if not isinstance(g, (int, float)) or isinstance(g, bool) \
                or not 0.0 <= float(g) <= 30.0:
            raise BadRequest("guidance_scale must be a number in [0, 30]")
        sampler = req.get("sampler", args.sampler)
        if sampler not in SAMPLERS:
            raise BadRequest(f"sampler must be one of {sorted(SAMPLERS)}")
        image = _image_field(req, "image")
        mask_image = _image_field(req, "mask_image")
        if mask_image is not None and image is None:
            raise BadRequest("mask_image requires image")
        strength = req.get("strength", 0.8)
        if image is not None and (
            not isinstance(strength, (int, float))
            or isinstance(strength, bool)
            or not 0.0 < float(strength) <= 1.0
        ):
            raise BadRequest("strength must be a number in (0, 1]")
        if "seed" in req:
            seed = _int_field(req, "seed", None, 0, 2**31 - 1)
        else:
            with seed_lock:
                seed = next(auto_seed)
        if precomputed_te is not None:
            for cap in filter(None, (prompt, neg)):
                if not precomputed_te.has(cap):
                    raise BadRequest(
                        f"caption not in the precompute cache: {cap!r}"
                    )
        return dict(prompt=prompt, negative_prompt=neg or None,
                    width=width, height=height, steps=steps,
                    guidance_scale=float(g), sampler=sampler, seed=seed,
                    image=image, mask_image=mask_image,
                    strength=float(strength))

    def _image_field(req, key):
        """Optional base64 PNG/JPEG field -> PIL image (RGB), validated
        here so malformed uploads are a 400, not a mid-generation 500."""
        v = req.get(key)
        if v is None:
            return None
        if not isinstance(v, str):
            raise BadRequest(f"{key} must be a base64-encoded image "
                             "string")
        import base64
        import binascii
        import io

        from PIL import Image, UnidentifiedImageError

        try:
            raw = base64.b64decode(v, validate=True)
        except (binascii.Error, ValueError):
            raise BadRequest(f"{key}: invalid base64")
        if len(raw) > 6 << 20:
            raise BadRequest(f"{key}: decoded image too large (max 6 MiB)")
        try:
            img = Image.open(io.BytesIO(raw))
            # check declared dimensions BEFORE decoding pixel data: the
            # 6 MiB compressed cap does not bound decoded size (a tiny
            # PNG can declare gigapixels), and PIL's own decompression-
            # bomb error is far above any size this server resizes from
            if img.width * img.height > 4096 * 4096:
                raise BadRequest(
                    f"{key}: image too large "
                    f"({img.width}x{img.height}, max 4096x4096)"
                )
            img.load()
        except Image.DecompressionBombError:
            raise BadRequest(f"{key}: image too large")
        except (UnidentifiedImageError, OSError):
            raise BadRequest(f"{key}: not a decodable image")
        return img

    class Handler(BaseHTTPRequestHandler):
        # cap on request reads: a client that stops sending mid-body (or
        # never sends one) releases its daemon thread instead of pinning
        # it forever
        timeout = 120

        # one readiness probe shouldn't log; generation requests do.
        # NB: stdlib send_error logs with a non-string first arg
        # (HTTPStatus) — format first, filter on the result
        def log_message(self, fmt, *a):
            msg = fmt % a
            if "/healthz" not in msg and "/metrics" not in msg:
                logger.info("http %s", msg)

        def _endpoint(self):
            p = self.path.split("?", 1)[0].lstrip("/")
            return p if p in ("generate", "healthz", "metrics") else "other"

        def _json(self, code, obj):
            metrics.record_request(self._endpoint(), code)
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                if drain["on"]:
                    # load balancers read this as not-ready and stop
                    # routing; in-flight work still completes
                    return self._json(503, {"status": "draining"})
                self._json(200, {
                    "status": "ok", "model": args.model,
                    "quantize": bool(args.quantize), "tp": args.tp,
                    "dp": args.dp,
                    "default": {"width": args.width, "height": args.height,
                                "steps": args.steps},
                })
            elif self.path == "/metrics":
                body = metrics.render().encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": "unknown path (try /generate)"})

        def do_POST(self):
            if self.path != "/generate":
                return self._json(404, {"error": "POST /generate only"})
            try:
                length = int(self.headers.get("Content-Length") or 0)
            except ValueError:
                return self._json(400, {"error": "bad Content-Length"})
            # 8 MiB bound: enough for a base64 PNG input image (img2img)
            # while still refusing client-declared gigabytes up front
            if not 0 <= length <= 1 << 23:
                # bound the buffered body BEFORE reading it: an exposed
                # server must not allocate client-declared sizes (the
                # 10k prompt cap checks far less than read() would buffer)
                return self._json(413, {"error": "body too large "
                                                 "(max 8 MiB)"})
            try:
                req = json.loads(self.rfile.read(length) or b"{}")
            except (ValueError, UnicodeDecodeError):
                return self._json(400, {"error": "invalid JSON body"})
            try:
                r = _parse_request(req)
            except BadRequest as e:
                return self._json(400, {"error": str(e)})
            # only the flag check / counter update happen under drain_cv:
            # socket writes (the 503 body) can stall on a slow client and
            # must never hold the lock drain_wait and the decrements need
            with drain_cv:
                rejected = drain["on"]
                if not rejected:
                    drain["inflight"] += 1
            if rejected:
                return self._json(503, {
                    "error": "server is draining (shutting down)"
                })
            try:
                return self._generate_locked(r)
            finally:
                with drain_cv:
                    drain["inflight"] -= 1
                    drain_cv.notify_all()

        def _generate_locked(self, r):
            if batcher is not None and r["image"] is not None:
                # the batcher pads to batch=N with shared traced inputs;
                # image rows would change the compiled program per batch
                return self._json(400, {
                    "error": "image inputs are not supported with --dp "
                             "request batching; use a --dp 1 server "
                             "for image-to-image/inpainting"
                })
            rows = 1
            try:
                if batcher is not None:
                    # dp microbatching: the dispatcher thread owns the
                    # device; X-F-Lite-Seconds is the shared dispatch
                    # time (the batcher records the dispatch metrics)
                    png, dt, rows = batcher.submit(r).result()
                else:
                    with device_lock:
                        # timed inside the lock: X-F-Lite-Seconds is
                        # device time, not queue wait
                        t0 = time.perf_counter()
                        out = _serve_generate(pipe, args, r)
                        dt = time.perf_counter() - t0
                    metrics.record_dispatch(dt, 1)
                    png = png_bytes_with_metadata(
                        out.images[0], _request_metadata(r, args)
                    )
            except KeyError as e:
                if precomputed_te is not None:
                    # cache race: the embedding file vanished between the
                    # _parse_request preflight and the encode — still the
                    # caption's problem, not a server fault
                    return self._json(400, {
                        "error": str(e.args[0]) if e.args
                        else "caption not precomputed"
                    })
                # on a normal server no client input legitimately raises
                # KeyError: that's an internal bug — log it, report 500
                logger.exception("generation failed")
                return self._json(500, {"error": "generation failed "
                                                 "(see server log)"})
            except Exception:
                logger.exception("generation failed")
                return self._json(500, {"error": "generation failed "
                                                 "(see server log)"})
            metrics.record_request("generate", 200)
            metrics.record_image()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(png)))
            self.send_header("X-F-Lite-Seed", str(r["seed"]))
            self.send_header("X-F-Lite-Seconds", f"{dt:.2f}")
            if batcher is not None:
                self.send_header("X-F-Lite-Batch", str(rows))
            self.end_headers()
            self.wfile.write(png)

    server = ThreadingHTTPServer((host, port), Handler)
    server.daemon_threads = True
    server.batcher = batcher
    server.metrics = metrics

    def begin_drain():
        """Stop accepting generation work (503 + unhealthy /healthz);
        in-flight requests keep running. Safe from a signal handler."""
        with drain_cv:
            drain["on"] = True
        logger.info("draining: new requests rejected, "
                    "%d in flight", drain["inflight"])

    def drain_wait(timeout_s: float = 600.0) -> bool:
        """Block until in-flight generations finish (True) or timeout."""
        deadline = time.monotonic() + timeout_s
        with drain_cv:
            while drain["inflight"] > 0:
                left = deadline - time.monotonic()
                if left <= 0:
                    return False
                drain_cv.wait(timeout=left)
        return True

    server.begin_drain = begin_drain
    server.drain_wait = drain_wait
    return server


def _serve_generate(pipe, args, r: dict):
    """The one generation call both the HTTP handler and its warmup use —
    identical call = identical jit key, so warming really pre-compiles
    what requests will run (launch-flag sampler/guidance_interval/
    dispatch chunking and the --text_bucket context padding included)."""
    return pipe(
        prompt=r["prompt"],
        negative_prompt=r["negative_prompt"],
        height=r["height"], width=r["width"],
        num_inference_steps=r["steps"],
        guidance_scale=r["guidance_scale"],
        guidance_interval=args.guidance_interval,
        seed=r["seed"],
        steps_per_dispatch=args.steps_per_dispatch,
        sampler=r["sampler"],
        pad_context_to=args.text_bucket or None,
        # img2img/inpainting (HTTP: base64-decoded at parse time;
        # warmup requests carry no image)
        image=r.get("image"),
        mask_image=r.get("mask_image"),
        strength=r.get("strength", 0.8),
    )


def _request_metadata(r: dict, args) -> dict:
    """PNG-stampable metadata for an HTTP request: the PIL image/mask
    objects are not serializable (and not reproducible from a stamp
    anyway — stamp strength/inpaint flags instead, like the GUI)."""
    meta = {k: v for k, v in r.items()
            if k not in ("image", "mask_image", "strength")}
    if r.get("image") is not None:
        meta["strength"] = r["strength"]
        meta["inpaint"] = (r.get("mask_image") is not None) or None
    meta.update(model=args.model, quantize=args.quantize or None,
                guidance_interval=args.guidance_interval)
    return meta


def _parse_warmup_shapes(spec: str) -> list[tuple[int, int]]:
    """--warmup_shapes 'WxH,WxH' -> [(w, h)], validated like requests."""
    shapes = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        try:
            w, h = (int(x) for x in part.lower().split("x"))
        except ValueError:
            raise SystemExit(
                f"--warmup_shapes: bad entry {part!r} (want WxH)"
            )
        if not (16 <= w <= 2048 and 16 <= h <= 2048) or w % 16 or h % 16:
            raise SystemExit(
                f"--warmup_shapes: {part}: sides must be multiples of "
                "16 in [16, 2048]"
            )
        shapes.append((w, h))
    return shapes


def _warm_by_embeds(pipe, args, width=None, height=None):
    """Warm a serving shape WITHOUT the text encoder: a
    --precomputed_dir server has no caption guaranteed cached (the
    literal \"warmup\" certainly isn't), so this drives the
    denoise+decode program directly with zero embeds at the bucketed
    context length and batch = dp rows — the same jit key real requests
    hit (shapes, not values, key the compile)."""
    import numpy as np

    width = width or args.width
    height = height or args.height
    b = max(args.dp, 1)
    s = args.text_bucket or 8
    c = pipe.dit_model.config.cross_attn_input_size
    emb = np.zeros((b, s, c), np.float32)
    mask = np.ones((b, s), bool)
    pipe(
        prompt_embeds=emb, negative_embeds=np.zeros_like(emb),
        context_mask=mask, negative_context_mask=mask,
        latents=_row_latents(pipe, list(range(b)), height, width),
        height=height, width=width,
        num_inference_steps=args.steps,
        guidance_scale=args.guidance_scale,
        guidance_interval=args.guidance_interval,
        steps_per_dispatch=args.steps_per_dispatch,
        sampler=args.sampler,
        pad_context_to=args.text_bucket or None,
    )


def run_http(pipe, args):
    """Warm the serving shapes, then serve until interrupted."""
    # one real request per shape through the exact serving path (text
    # encode -> bucketed context -> denoise -> decode); without
    # --text_bucket the denoise jit key depends on the prompt's padded
    # length and true pre-compilation is impossible (warn below)
    if not args.text_bucket:
        logger.warning(
            "--text_bucket 0: each distinct prompt length compiles its "
            "own denoise program — first requests will be slow")
    shapes = list(dict.fromkeys(
        [(args.width, args.height)]
        + (_parse_warmup_shapes(args.warmup_shapes)
           if args.warmup_shapes else [])
    ))
    batcher = None
    if args.dp > 1 and not args.precomputed_dir:
        # the batcher pads every dispatch to batch=dp: warm THROUGH it so
        # the compiled shapes are the ones requests will hit — still
        # before the port binds
        batcher = RequestBatcher.from_args(pipe, args)
    for w, h in shapes:
        logger.info("pre-compiling %dx%d / %d steps...", w, h, args.steps)
        req = dict(
            prompt="warmup", negative_prompt=None,
            width=w, height=h, steps=args.steps,
            guidance_scale=args.guidance_scale,
            sampler=args.sampler, seed=0,
        )
        if args.precomputed_dir:
            # can't encode an arbitrary warmup caption against a cache:
            # warm the compiled shapes by embeds instead
            _warm_by_embeds(pipe, args, width=w, height=h)
        elif batcher is not None:
            batcher.submit(req).result()
        else:
            _serve_generate(pipe, args, req)
    if args.precomputed_dir and args.dp > 1:
        batcher = RequestBatcher.from_args(pipe, args)
    server = make_http_server(pipe, args, host=args.http_host,
                              port=args.http_port, batcher=batcher)
    logger.info("serving on http://%s:%d (POST /generate)",
                *server.server_address[:2])

    # graceful preemption (the serving analog of the trainer's SIGTERM
    # checkpoint): drain — 503 new work, let in-flight finish — then stop
    import signal as _signal
    import threading as _threading

    def _term(_sig, _frm):
        server.begin_drain()

        def _finish():
            server.drain_wait(600.0)
            server.shutdown()

        _threading.Thread(target=_finish, daemon=True).start()

    prev = _signal.signal(_signal.SIGTERM, _term)
    try:
        server.serve_forever()
        logger.info("drained; shutting down")
    except KeyboardInterrupt:
        logger.info("shutting down")
    finally:
        _signal.signal(_signal.SIGTERM, prev)
        server.server_close()
        if server.batcher is not None:
            server.batcher.stop()
    return None


def _dummy_inputs(cfg):
    import jax.numpy as jnp

    return (
        jnp.zeros((1, 32, 32, cfg.in_channels), cfg.dtype),
        jnp.zeros((1, 32, cfg.cross_attn_input_size), cfg.dtype),
        jnp.ones((1, 32), jnp.bool_),
        jnp.zeros((1,), cfg.dtype),
    )


if __name__ == "__main__":
    main()
