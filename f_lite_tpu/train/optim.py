"""Optimizer + LR schedules (optax), matching the reference trainer.

Reference: AdamW betas (0.9, 0.95), weight_decay, fused
(`train.py:856-862` — XLA fuses optax's update chain for free), grad-norm
clipping at max_grad_norm (`train.py:1014`), schedules linear / cosine /
wsd / constant-with-warmup (`train.py:871-895`). WSD decay = final 10% of
steps, stable = the rest after warmup. An 8-bit-Adam analog is available as
bf16 second moments (`use_8bit_adam` -> `moment_dtype='bfloat16'`).
"""

from __future__ import annotations

import optax


def build_lr_schedule(
    name: str,
    learning_rate: float,
    *,
    num_warmup_steps: int = 0,
    max_steps: int = 10_000,
):
    warmup = optax.linear_schedule(
        0.0, learning_rate, max(num_warmup_steps, 1)
    )
    if name == "linear":
        decay = optax.linear_schedule(
            learning_rate, 0.0, max(max_steps - num_warmup_steps, 1)
        )
    elif name == "cosine":
        decay = optax.cosine_decay_schedule(
            learning_rate, max(max_steps - num_warmup_steps, 1)
        )
    elif name == "wsd":
        decay_steps = max_steps // 10
        stable_steps = max(max_steps - num_warmup_steps - decay_steps, 0)
        stable = optax.constant_schedule(learning_rate)
        final = optax.linear_schedule(
            learning_rate, 0.0, max(decay_steps, 1)
        )
        decay = optax.join_schedules([stable, final], [stable_steps])
    elif name == "constant":
        decay = optax.constant_schedule(learning_rate)
    else:
        raise ValueError(f"unknown lr schedule: {name}")
    return optax.join_schedules([warmup, decay], [num_warmup_steps])


def build_optimizer(
    *,
    learning_rate: float = 1e-4,
    lr_scheduler: str = "linear",
    num_warmup_steps: int = 0,
    max_steps: int = 10_000,
    weight_decay: float = 0.01,
    betas: tuple[float, float] = (0.9, 0.95),
    max_grad_norm: float | None = 1.0,
    moment_dtype=None,  # 'bfloat16' = 8-bit-Adam analog (low-prec moments)
) -> optax.GradientTransformation:
    schedule = build_lr_schedule(
        lr_scheduler, learning_rate,
        num_warmup_steps=num_warmup_steps, max_steps=max_steps,
    )
    adam = optax.adamw(
        schedule, b1=betas[0], b2=betas[1],
        weight_decay=weight_decay, mu_dtype=moment_dtype,
    )
    parts = []
    if max_grad_norm is not None:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    parts.append(adam)
    return optax.chain(*parts)
