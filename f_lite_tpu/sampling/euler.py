"""CFG-batched Euler flow-matching sampler as one `lax.scan` under `jit`.

Reference hot loop: `f_lite/pipeline.py:250-297` — a Python loop launching a
CUDA graph per step. TPU-native design (SURVEY.md §7.1, BASELINE.json north
star): the entire denoise trajectory is a `lax.scan` over the precomputed
(t, t_next) schedule inside a single jit — one compilation, zero host
round-trips, latents donated.

Semantics preserved:
- descending schedule i = N..1 with the resolution-shift map
  (`pipeline.py:252-257`);
- CFG batched in ONE forward: latents duplicated, context = [neg, pos]
  (`pipeline.py:262-274`) — uncond first, like the reference; the context
  mask is batched [neg_mask, pos_mask] so an asymmetric negative prompt
  keeps its own key mask;
- APG or standard CFG combine (`pipeline.py:276-290`);
- update z += (t - t_next) * v (`pipeline.py:296-297`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from f_lite_tpu.ops.guidance import APGConfig, guidance_combine
from f_lite_tpu.ops.timesteps import euler_timestep_pairs, resolution_alpha

# valid `DenoiseSettings.method` values — the single source for the CLI
# choices (generate/serve) and the ComfyUI combo input
SAMPLERS = ("euler", "ab2")


@dataclasses.dataclass(frozen=True)
class DenoiseSettings:
    """Static sampler settings (part of the jit cache key)."""

    num_inference_steps: int = 30
    guidance_scale: float = 6.0
    apg: APGConfig | None = None
    alpha: float | None = None  # None: derive from latent h*w
    # CFG only while t (the SHIFTED schedule time) is inside [lo, hi]:
    # limited-interval guidance (Kynkäänniemi et al. 2024). Steps outside
    # run the conditional forward alone — half the model cost per step.
    # None = CFG on every step (the reference behavior).
    guidance_interval: tuple | None = None
    # "euler" (reference parity) or "ab2": variable-step Adams-Bashforth 2
    # — second-order multistep integration of the SAME flow ODE at the
    # SAME model cost per step (the velocity history is free); the first
    # step of a trajectory (no history) is Euler. O(h^2) needs a smooth
    # velocity field: proven in tests on synthetic fields, while random-
    # WEIGHT fields measure too rough to benefit (SAMPLER_AB2.json) —
    # validate the step-count saving on your trained checkpoint.
    method: str = "euler"

    def __post_init__(self):
        if self.method not in SAMPLERS:
            raise ValueError(
                f"method must be one of {SAMPLERS}, got {self.method!r}"
            )


def _full_schedule(settings: DenoiseSettings, lh: int, lw: int):
    alpha = settings.alpha
    if alpha is None:
        alpha = resolution_alpha(lh * lw)
    return euler_timestep_pairs(settings.num_inference_steps, alpha)


def _denoise_schedule(
    dit_apply, params, latents, prompt_embeds, negative_embeds,
    context_mask, negative_mask, schedule, settings: DenoiseSettings,
    inpaint=None, carry_in=None,
):
    """Core scan over an explicit (t, t_next) schedule slice.

    latents are fp32 (integration accumulator); context mask batched
    [neg_mask, pos_mask] under CFG (`pipeline.py:266` context order).

    `inpaint`: optional (x_lat, repaint_mask, keys) — after every Euler
    update the kept region (repaint_mask == 0) is re-imposed at the
    step's own marginal: z <- m·z + (1-m)·((1-t_next)·x + t_next·ε),
    fresh ε per step (one key per schedule row). The final step has
    t_next == 0, so the kept region lands on x exactly.

    `settings.method == "ab2"` (variable-step Adams-Bashforth 2): the
    step extrapolates the velocity to the step midpoint from the previous
    step's velocity, v_mid = v + (h/(2·h_prev))·(v − v_prev) — second
    order in h at zero extra model cost. `carry_in = (v_prev, h_prev)`
    threads the history across dispatch chunks (zeros/0 ≡ no history →
    plain Euler first step); the return value is then
    `(z_final, (v_last, h_last))` instead of bare z. The scan carry stays
    z-only for "euler" so the reference-parity program is unchanged.
    """
    b = latents.shape[0]
    ab2 = settings.method == "ab2"
    do_cfg = settings.guidance_scale >= 1.0
    if do_cfg:
        context = jnp.concatenate([negative_embeds, prompt_embeds], axis=0)
        if context_mask is not None:
            nm = negative_mask if negative_mask is not None else context_mask
            context_mask = jnp.concatenate([nm, context_mask], axis=0)
    else:
        context = prompt_embeds

    def velocity(z, t):
        if do_cfg:
            z_in = jnp.concatenate([z, z], axis=0)
            t_in = jnp.full((2 * b,), t, z.dtype)
            out = dit_apply(params, z_in, context, context_mask, t_in)
            return guidance_combine(
                out[:b], out[b:], settings.guidance_scale, settings.apg
            ).astype(jnp.float32)
        t_in = jnp.full((b,), t, z.dtype)
        return dit_apply(params, z, context, context_mask, t_in).astype(
            jnp.float32
        )

    def step(carry, t_pair):
        z, v_prev, h_prev = carry
        t, t_next = t_pair[0], t_pair[1]
        dt = (t - t_next).astype(jnp.float32)
        v = velocity(z, t)
        if ab2:
            # midpoint extrapolation; h_prev == 0 (no history) -> Euler
            c = jnp.where(
                h_prev > 0.0, dt / (2.0 * jnp.maximum(h_prev, 1e-20)), 0.0
            )
            v_eff = v + c * (v - v_prev)
        else:
            v_eff = v
        return (z + dt * v_eff, v, dt), None

    if ab2:
        v0, h0 = carry_in if carry_in is not None else (
            jnp.zeros_like(latents, jnp.float32), jnp.float32(0.0)
        )
        v0 = v0.astype(jnp.float32)
        h0 = jnp.asarray(h0, jnp.float32)
    else:
        # z-only carry: wrap/unwrap so the compiled euler program is
        # byte-identical to the historical one
        v0 = h0 = None

    def scan(body, z0, xs):
        if ab2:
            (z, v, h), _ = jax.lax.scan(body, (z0, v0, h0), xs)
            return z, (v, h)
        (z, _, _), _ = jax.lax.scan(
            lambda c, x: (
                (body((c[0], None, None), x)[0][0], None, None), None
            ),
            (z0, None, None), xs,
        )
        return z, None

    z0 = latents.astype(jnp.float32)
    if inpaint is None:
        z_final, carry_out = scan(step, z0, schedule)
        return (z_final, carry_out) if ab2 else z_final

    x_lat, m, keys = inpaint  # (B,h,w,C) fp32, (B,h,w,1) fp32, (N,) keys

    def step_inpaint(carry, xs):
        t_pair, k = xs
        if ab2:
            # inpainting re-imposes FRESH noise on the kept region every
            # step — an O(1) state discontinuity per step, not an O(h)
            # flow increment — so the multistep extrapolation would
            # amplify the model's response to that jump. Pin the history
            # empty (h_prev = 0): every masked step takes the plain
            # Euler update (ab2+mask == euler+mask by construction).
            carry = (carry[0], carry[1], jnp.float32(0.0))
        (z_new, v, h), _ = step(carry, t_pair)
        z = carry[0]
        t_next = t_pair[1].astype(jnp.float32)
        eps = jax.random.normal(k, x_lat.shape, jnp.float32)
        known = (1.0 - t_next) * x_lat + t_next * eps
        mixed = m * z_new + (1.0 - m) * known
        # defensive: any zero-dt row (t == t_next) must be a FULL no-op —
        # re-mixing is not idempotent for soft mask values (m^2 != m),
        # and the velocity history must not absorb a zero-h sample
        pos = t_pair[0] > t_pair[1]
        if ab2:
            v = jnp.where(pos, v, carry[1])
            h = jnp.where(pos, h, carry[2])
        return (jnp.where(pos, mixed, z), v, h), None

    z_final, carry_out = scan(step_inpaint, z0, (schedule, keys))
    return (z_final, carry_out) if ab2 else z_final


def _interval_segments(settings: DenoiseSettings, schedule) -> list:
    """[(start, end, use_cfg)] consecutive same-mode runs of the schedule
    under `settings.guidance_interval` (one all-CFG segment when the
    interval is unset or CFG is off entirely)."""
    n = schedule.shape[0]
    if (settings.guidance_interval is None
            or settings.guidance_scale < 1.0):
        return [(0, n, True)]
    lo, hi = settings.guidance_interval
    t_host = jax.device_get(schedule[:, 0])
    on = [bool(lo <= float(t) <= hi) for t in t_host]
    segs = []
    s = 0
    while s < n:
        e = s + 1
        while e < n and on[e] == on[s]:
            e += 1
        segs.append((s, e, on[s]))
        s = e
    return segs


def denoise(
    dit_apply: Callable,
    params: Any,
    latents: jax.Array,
    prompt_embeds: jax.Array,
    negative_embeds: jax.Array,
    context_mask: jax.Array | None,
    settings: DenoiseSettings,
    negative_mask: jax.Array | None = None,
) -> jax.Array:
    """Run the full Euler denoise loop. latents: (B, h, w, C) NHWC.

    `dit_apply(params, x, context, context_mask, t)` is the model forward
    (typically `DiT(config).apply`). prompt/negative embeds: (B, S, Ctx).
    `negative_mask` defaults to `context_mask` (all-ones negative embeds
    use the positive mask, `train.py:561-562` semantics).
    Honors `settings.guidance_interval` (same segmentation as
    `make_denoise_fn`).
    """
    b, lh, lw, _ = latents.shape
    schedule = _full_schedule(settings, lh, lw)
    nocfg = dataclasses.replace(settings, guidance_scale=0.0, apg=None,
                                guidance_interval=None)
    z = latents
    for s, e, use_cfg in _interval_segments(settings, schedule):
        # ab2 history resets at each segment boundary (carry_in=None):
        # the cfg<->nocfg switch changes the integrated velocity field
        # discontinuously, so extrapolating across it would be wrong
        out = _denoise_schedule(
            dit_apply, params, z, prompt_embeds, negative_embeds,
            context_mask, negative_mask, schedule[s:e],
            settings if use_cfg else nocfg,
        )
        z = out[0] if settings.method == "ab2" else out
    return z.astype(latents.dtype)


def schedule_start_time(
    settings: DenoiseSettings, lh: int, lw: int, start_step: int
) -> float:
    """t at schedule index `start_step` for an (lh, lw) latent grid.

    The image-to-image noising level: z = (1 - t)·x + t·ε is the training
    interpolant (train/loss.py), so partially noising a clean latent to
    the schedule's own t at `start_step` puts it exactly on the marginal
    the model saw in training. start_step == 0 gives t == 1 (pure noise):
    shift_t(1, α) == 1 mathematically for every α, but the fp32 α/(1+(α-1))
    rounds off 1.0 for non-pow2 α — return the exact value so strength=1.0
    image-to-image is EXACTLY text-to-image."""
    if start_step == 0:
        return 1.0
    return float(_full_schedule(settings, lh, lw)[start_step, 0])


def auto_steps_per_dispatch(
    batch: int, steps: int, latent_tokens: int = 16384
) -> int | None:
    """Default trajectory chunking: bound single-dispatch wall time.

    Some runtimes kill device dispatches that exceed ~40 s (observed on the
    remote v5e worker: a batch-4 1024px 30-step single dispatch ~60 s died
    as a "kernel fault"; the same trajectory chunked at 5 steps/dispatch
    ran clean at 15.2 s/image — tools/probe_batch_crash.py). Chunking is
    bit-identical (the schedule slice is a traced argument: ONE compilation)
    and costs ~30 ms/dispatch, so default to dispatches of roughly a
    batch-1 1024px workload x32 steps (~15 s on v5e): scale allowed steps
    by batch and by latent tokens relative to 1024px (128x128 latents).

    Returns None (single dispatch) when the whole trajectory fits.
    """
    units = batch * max(latent_tokens, 1) / 16384.0
    k = int(32.0 / max(units, 1e-9))
    if k >= steps:
        return None
    return max(1, k)


def make_denoise_fn(
    dit_apply: Callable,
    settings: DenoiseSettings,
    donate: bool = True,
    steps_per_dispatch: int | None = None,
):
    """jit-compiled denoise closure.

    Returns `fn(params, latents, prompt_embeds, negative_embeds,
    context_mask, neg_mask=None, callback=None, start_step=0,
    inpaint=None)`.

    `steps_per_dispatch`: split the trajectory into several device
    dispatches of at most this many steps (the schedule slice is a traced
    argument: one compilation for the full-size chunks plus at most one
    more for a shorter remainder chunk). Use when a single long dispatch
    is undesirable (execution watchdogs, host-side progress); None =
    whole trajectory in one dispatch. See `auto_steps_per_dispatch`.

    `callback(done_steps, total_steps) -> bool`: invoked after every
    dispatch (once, at completion, for the single-dispatch path); return
    truthy to cancel — the current latents are returned early. This is the
    cooperative-cancellation hook the reference GUI uses for forever-mode
    (`f_lite_gradio_gui.py:87-109`).

    `start_step`: begin the trajectory at this schedule index (image-to-
    image: the caller noises its latents to `schedule_start_time(...,
    start_step)` first). The schedule slice is a traced argument, so all
    full-size chunks share one compilation across strengths; each distinct
    remainder length `(steps - start_step) % k` adds one (small, cheaper)
    compiled shape, served from the persistent cache thereafter.

    `inpaint`: optional (x_lat, repaint_mask, base_key) — latent
    inpainting; see `_denoise_schedule`. Adds one compiled variant (the
    extra traced inputs change the program).

    `settings.guidance_interval`: steps whose t falls outside [lo, hi]
    run WITHOUT CFG (conditional forward only). The trajectory is split
    host-side into consecutive same-mode segments, each chunked from its
    own start — every distinct (slice length, mode) pair is its own
    compiled program (a 3-segment window at k=16 can reach ~4 shapes).
    All one-time, served by the persistent compilation cache.
    """

    is_ab2 = settings.method == "ab2"

    def make_runner(s):
        if s.method == "ab2":
            # extra traced (v_prev, h_prev) in, (z, v_last, h_last) out —
            # the velocity history crosses dispatch-chunk boundaries;
            # v_prev is donated (each chunk's output v replaces it)
            return jax.jit(
                lambda params, z, pos, neg, mask, nmask, schedule, x_lat, \
                    m, keys, v_prev, h_prev: (
                    lambda r: (r[0], r[1][0], r[1][1])
                )(
                    _denoise_schedule(
                        dit_apply, params, z, pos, neg, mask, nmask,
                        schedule, s,
                        inpaint=None if x_lat is None else (x_lat, m, keys),
                        carry_in=(v_prev, h_prev),
                    )
                ),
                donate_argnums=(1, 10),
            )
        return jax.jit(
            lambda params, z, pos, neg, mask, nmask, schedule, x_lat, m, \
                keys: (
                _denoise_schedule(
                    dit_apply, params, z, pos, neg, mask, nmask, schedule,
                    s,
                    inpaint=None if x_lat is None else (x_lat, m, keys),
                )
            ),
            donate_argnums=(1,),
        )

    runner = make_runner(settings)
    runner_nocfg = None
    if (settings.guidance_interval is not None
            and settings.guidance_scale >= 1.0):
        runner_nocfg = make_runner(
            dataclasses.replace(settings, guidance_scale=0.0, apg=None,
                                guidance_interval=None)
        )

    def fn(params, latents, prompt_embeds, negative_embeds, context_mask,
           neg_mask=None, callback=None, start_step=0, inpaint=None):
        lh, lw = latents.shape[1], latents.shape[2]
        schedule = _full_schedule(settings, lh, lw)
        n = settings.num_inference_steps
        if start_step:
            if not 0 <= start_step < n:
                raise ValueError(
                    f"start_step {start_step} outside [0, {n})"
                )
            schedule = schedule[start_step:]
            n = n - start_step
        k = steps_per_dispatch or n
        x_lat = m = keys = None
        if inpaint is not None:
            # one fresh-noise key per schedule row
            x_lat, m, base_key = inpaint
            x_lat = jnp.asarray(x_lat, jnp.float32)
            m = jnp.asarray(m, jnp.float32)
            keys = jax.random.split(base_key, n)
        out_dtype = latents.dtype
        if donate and steps_per_dispatch is None:
            z = latents.astype(jnp.float32)  # single dispatch: safe to alias
        else:
            # explicit copy: the runner donates its z argument
            z = jnp.array(latents, jnp.float32, copy=True)
        # exact chunks: a remainder (n % k) runs as its own shorter slice.
        # That is a second compiled shape (vs padding the schedule with
        # zero-dt rows), but padded rows are NOT free — every no-op row
        # still pays a full model forward (6.7% of the whole trajectory
        # at 30 steps / k=16), while the extra compile is one-time and
        # served by the persistent compilation cache.
        # limited-interval guidance: consecutive same-mode segments, each
        # chunked at k (the schedule values are host-concrete); one
        # all-CFG segment when no interval is set
        windows = []
        for s, e, use_cfg in _interval_segments(settings, schedule):
            rn = runner if (use_cfg or runner_nocfg is None) \
                else runner_nocfg
            for cs in range(s, e, k):
                # last element: does this window START a segment (ab2
                # velocity history resets there — the cfg<->nocfg switch
                # changes the integrated field discontinuously)
                windows.append((cs, min(cs + k, e), rn, cs == s))
        v_prev = h_prev = None
        for s, e, rn, seg_start in windows:
            kslice = keys[s:e] if keys is not None else None
            if is_ab2:
                if seg_start:  # first window of every segment
                    v_prev = jnp.zeros_like(z)
                    h_prev = jnp.float32(0.0)
                z, v_prev, h_prev = rn(
                    params, z, prompt_embeds, negative_embeds,
                    context_mask, neg_mask, schedule[s:e],
                    x_lat, m, kslice, v_prev, h_prev)
            else:
                z = rn(params, z, prompt_embeds, negative_embeds,
                       context_mask, neg_mask, schedule[s:e],
                       x_lat, m, kslice)
            if callback is not None and callback(e, n):
                break
        return z.astype(out_dtype)

    return fn
