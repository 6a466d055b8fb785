"""Benchmark harness: F-Lite-7B 1024px 30-step generation on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.md north star): 1024px 30-step images/min/chip.
The reference publishes no perf numbers; the north-star target is 7B
1024x1024 30-step < 4 s p50 on v5e-8, i.e. 32 chip-seconds/image ==
1.875 images/min/chip. `vs_baseline` = measured / 1.875 (>1 beats target).

Two timed legs:
1. denoise+decode — the full latent trajectory (30-step CFG-batched Euler
   scan, one jit) + bf16 VAE decode. This is the cached-embedding serving
   path (`precomputed_utils.py` semantics) and the headline metric.
2. text encode — a real-shape T5-XXL (4096 dim, 24 layers, ~4.7B params)
   Flax encoder pass, `hidden_states[-8]`, run as its own phase (the two
   models don't fit one 16 GB chip together — the reference's cpu_offload
   swap has the same sequencing). Reported as
   `p50_seconds_per_image_e2e` = denoise+decode p50 + encode p50, i.e.
   the full prompt->PNG budget. Set F_LITE_BENCH_E2E=0 to skip.

Weights are zero-filled: values don't affect TPU kernel timing.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("F_LITE_BENCH_STEPS", "30")

TARGET_IMAGES_PER_MIN_PER_CHIP = 60.0 / 32.0  # north-star: 4s p50 on 8 chips


def bench_text_encode(batch: int, text_len: int = 128) -> float | None:
    """p50 seconds for one T5-XXL encode pass at real shapes (zero weights).

    Runs BEFORE the DiT phase and releases its params after: 4.7B bf16
    (~9.4 GB) + the 7B DiT don't fit one v5e chip simultaneously.
    """
    import time

    import jax
    import jax.numpy as jnp

    from f_lite_tpu.text.t5 import T5Config, T5EncoderStack

    # T5-XXL (FLUX.1-schnell text_encoder_2 shape), native in-repo stack
    cfg = T5Config(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    model = T5EncoderStack(cfg, return_index=-8)
    ids = jnp.ones((batch, text_len), jnp.int32)
    mask = jnp.ones((batch, text_len), jnp.int32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0), ids, mask)
    )
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    @jax.jit
    def encode(params, ids, mask):
        return model.apply(params, ids, mask).astype(jnp.bfloat16)

    def run():
        return float(jnp.sum(encode(params, ids, mask).astype(jnp.float32)))

    run()  # compile + warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    del params
    return sorted(times)[len(times) // 2]


def _device_watchdog(timeout_s: float) -> None:
    """Fail fast (instead of hanging forever) if the TPU backend is dead.

    Two observed failure modes of the remote axon backend, both blocking
    in native code: jax.devices() never returns when the tunnel is down,
    and — seen live — devices() returns normally but the FIRST
    dispatch/transfer hangs forever. The second hang holds the GIL, so
    an in-process watchdog thread can never fire (measured: a
    threading-based guard slept through it). The guard is therefore a
    subprocess: it shares no GIL, prints a diagnosis to our stderr, and
    SIGKILLs us at `timeout_s` so the caller (the round driver) gets a
    fast nonzero exit, not a silent multi-hour hang."""
    import subprocess
    import sys

    pid = os.getpid()
    guard = subprocess.Popen([
        "/bin/sh", "-c",
        f"sleep {timeout_s:.0f}; "
        f"echo 'bench: TPU device probe (jax.devices + one tiny dispatch"
        f"/D2H) did not finish within {timeout_s:.0f}s — backend hung or"
        f" tunnel down' >&2; kill -9 {pid}",
    ])
    import jax

    jax.devices()
    import jax.numpy as jnp

    ok = float(jnp.sum(jnp.ones((8, 8)))) == 64.0
    guard.kill()
    guard.wait()
    if not ok:
        print("bench: device probe computed a wrong value", file=sys.stderr)
        os._exit(18)


def bench_dit(model_name: str, quantized: bool, gi, *, steps: int,
              height: int, width: int, batch: int) -> dict:
    """p50 for one serving mode: 30-step CFG denoise scan + VAE decode +
    uint8 host copy. Params are zero/one-filled (values don't change TPU
    kernel timing); all device buffers are dropped before returning so
    modes can run back-to-back on one 16 GB chip."""
    import gc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from f_lite_tpu.models.dit import DiT, DiTConfig
    from f_lite_tpu.models.vae import AutoencoderKL, VAEConfig
    from f_lite_tpu.sampling.euler import (
        DenoiseSettings,
        auto_steps_per_dispatch,
        make_denoise_fn,
    )

    dtype = jnp.bfloat16
    # scan_layers: same math/perf as unrolled (verified), 8.8x faster compile
    if os.environ.get("F_LITE_BENCH_TINY") == "1":
        # CI smoke of the full matrix path (CPU-sized model; the numbers
        # are meaningless, the code path is the thing being tested)
        cfg = DiTConfig(
            in_channels=16, patch_size=2, hidden_size=128,
            depth=4 if model_name == "10b" else 2, num_heads=2,
            cross_attn_input_size=64, dtype=dtype, param_dtype=dtype,
            scan_layers=True, quantized=quantized,
            use_pallas_attention=False,
        )
    else:
        preset = (DiTConfig.f_lite_10b if model_name == "10b"
                  else DiTConfig.f_lite_7b)
        cfg = preset(dtype=dtype, param_dtype=dtype,
                     scan_layers=True, quantized=quantized)
    model = DiT(cfg)
    shapes = jax.eval_shape(
        lambda: model.init_params(jax.random.key(0), text_len=128,
                                  image_size=64)
    )
    if quantized:
        # non-zero int8 weights so the MXU path is exercised realistically
        params = jax.tree.map(
            lambda s: (jnp.ones(s.shape, s.dtype) if s.dtype == jnp.int8
                       else jnp.zeros(s.shape, s.dtype)),
            shapes,
        )
    else:
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    vae_cfg = VAEConfig.flux(dtype=dtype, param_dtype=dtype)
    vae = AutoencoderKL(vae_cfg)
    vae_shapes = jax.eval_shape(
        lambda: vae.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3), dtype))
    )
    vae_params = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), vae_shapes
    )

    lh, lw = height // 8, width // 8
    text_len = 128
    latents = jax.random.normal(
        jax.random.key(1), (batch, lh, lw, cfg.in_channels), dtype
    )
    pos = jax.random.normal(
        jax.random.key(2), (batch, text_len, cfg.cross_attn_input_size),
        dtype,
    )
    neg = jnp.zeros_like(pos)
    mask = jnp.ones((batch, text_len), jnp.bool_)

    settings = DenoiseSettings(num_inference_steps=steps, guidance_scale=6.0,
                               guidance_interval=gi)
    spd_env = os.environ.get("F_LITE_BENCH_DISPATCH_STEPS")
    # auto: bound dispatch wall time (the remote worker kills >~40 s
    # dispatches; batch 1 at 1024px stays single-dispatch)
    spd = (int(spd_env) if spd_env
           else auto_steps_per_dispatch(batch, steps, lh * lw))
    denoise = make_denoise_fn(
        model.apply, settings, donate=False, steps_per_dispatch=spd,
    )

    def _decode(p, z):
        z = z / vae_cfg.scaling_factor + vae_cfg.shift_factor
        from f_lite_tpu.models.vae import decode_tiled, resolve_memory_mode

        if resolve_memory_mode("auto", max(lh, lw)) == "tiled":
            # >1024px: full decode exceeds HBM — tiled decode with blended
            # seams, the same memory mode a real deployment uses here
            return decode_tiled(vae, p, z)
        if batch > 1:
            # sliced decode (the `enable_slicing` memory mode): per-sample
            # map keeps peak decoder activations batch-independent
            return jax.lax.map(
                lambda zi: vae.apply(
                    p, zi[None], method=AutoencoderKL.decode
                )[0],
                z,
            )
        return vae.apply(p, z, method=AutoencoderKL.decode)

    decode = jax.jit(_decode)

    to_uint8 = jax.jit(
        lambda img: jnp.clip(
            (img.astype(jnp.float32) + 1.0) * 127.5, 0, 255
        ).astype(jnp.uint8)
    )

    def run():
        z = denoise(params, latents, pos, neg, mask)
        img = decode(vae_params, z)
        # uint8 conversion + host copy: the actual PNG-side boundary
        arr = np.asarray(to_uint8(img))
        return int(arr.sum())

    run()  # compile + warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2]
    images_per_min = 60.0 * batch / p50

    mode = "int8-w8a8" if quantized else "bf16"
    if gi:
        mode += f"+gi{gi[0]:g}-{gi[1]:g}"
    record = {
        "metric": (
            f"F-Lite-{model_name.upper()} {height}px {steps}-step "
            f"images/min/chip ({mode})"
        ),
        "value": round(images_per_min, 4),
        "unit": "images/min/chip",
        "vs_baseline": round(
            images_per_min / TARGET_IMAGES_PER_MIN_PER_CHIP, 4
        ),
        "p50_seconds_per_image": round(p50 / batch, 3),
        "mode": mode,
        "model": model_name,
    }
    # release device buffers before the next mode claims HBM
    del params, vae_params, latents, pos, neg, denoise, decode
    gc.collect()
    return record


def _parse_gi(gi_env: str):
    try:  # accept "lo,hi" or the audit tool's "lo:hi"
        gi = tuple(float(x) for x in gi_env.replace(":", ",").split(","))
    except ValueError:
        gi = ()
    if len(gi) != 2 or not 0.0 <= gi[0] < gi[1] <= 1.0:
        raise SystemExit(
            f"F_LITE_BENCH_GI={gi_env!r}: expected 'lo,hi' with "
            "0 <= lo < hi <= 1 (e.g. F_LITE_BENCH_GI=0.1,0.9)"
        )
    return gi


def main():
    _device_watchdog(float(os.environ.get("F_LITE_BENCH_DEVICE_TIMEOUT",
                                          "600")))
    from f_lite_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()

    steps = int(os.environ["F_LITE_BENCH_STEPS"])
    height = width = int(os.environ.get("F_LITE_BENCH_SIZE", "1024"))
    batch = int(os.environ.get("F_LITE_BENCH_BATCH", "1"))

    # text-encode leg first (own phase; params released before the DiT)
    encode_p50 = None
    if os.environ.get("F_LITE_BENCH_E2E", "1") == "1":
        encode_p50 = bench_text_encode(batch)

    # headline mode (env-overridable, default 7B int8 W8A8 full-CFG)
    quantized = os.environ.get("F_LITE_BENCH_QUANT", "1") == "1"
    model_name = os.environ.get("F_LITE_BENCH_MODEL", "7b")
    gi_env = os.environ.get("F_LITE_BENCH_GI")
    # F_LITE_BENCH_GI="lo,hi": limited-interval CFG serving preset —
    # single forward outside the window (quality trade-off quantified in
    # QUALITY_GI.json via tools/guidance_interval_audit.py)
    gi = _parse_gi(gi_env) if gi_env else None

    record = bench_dit(model_name, quantized, gi,
                       steps=steps, height=height, width=width, batch=batch)
    if encode_p50 is not None:
        # full prompt->PNG budget: T5-XXL encode + denoise + decode + host
        record["p50_seconds_text_encode"] = round(encode_p50 / batch, 3)
        record["p50_seconds_per_image_e2e"] = round(
            record["p50_seconds_per_image"] + encode_p50 / batch, 3
        )

    # the full honest matrix: every supported serving mode, so the driver
    # artifact mechanically guards non-headline modes too (VERDICT r4 #6).
    # F_LITE_BENCH_MATRIX=0 restores the single-row bench.
    if os.environ.get("F_LITE_BENCH_MATRIX", "1") == "1":
        rows = [record]
        headline_key = (model_name, quantized, gi)
        for name, quant, row_gi in (
            ("7b", True, None),          # headline default
            ("7b", False, None),         # bf16 parity-exact serving
            ("7b", True, (0.1, 0.9)),    # int8 + limited-interval CFG
            ("10b", True, None),         # the larger released model
        ):
            if (name, quant, row_gi) == headline_key:
                continue
            try:
                rows.append(bench_dit(name, quant, row_gi, steps=steps,
                                      height=height, width=width,
                                      batch=batch))
            except Exception as e:  # noqa: BLE001 — a failed non-headline
                # row must not kill the headline artifact; record it
                rows.append({
                    "model": name,
                    "mode": ("int8-w8a8" if quant else "bf16")
                    + (f"+gi{row_gi[0]:g}-{row_gi[1]:g}" if row_gi else ""),
                    "error": f"{type(e).__name__}: {e}",
                })
        record["rows"] = [
            {k: r.get(k) for k in ("model", "mode", "value",
                                   "p50_seconds_per_image", "error")
             if k in r}
            for r in rows
        ]
    print(json.dumps(record))


if __name__ == "__main__":
    main()
