"""Qwen2-family text encoder in Flax — native TPU path for the HEAD
pipeline's Qwen2.5-VL conditioning (`/root/reference/f_lite/pipeline.py:14,
153-154`): chat-template-wrapped captions -> hidden_states[-8].

Only the language tower matters for F-Lite (text-only prompts). For
text-only inputs Qwen2.5-VL's multimodal rope (3 equal position streams)
degenerates to standard 1D RoPE, so this module is exact for the
captioning use-case. Causal attention with right-padding; padded positions
produce garbage that the DiT's cross-attention mask never reads.

Weight conversion handles plain Qwen2 (`model.layers...`) and the VL
checkpoints' language-tower prefixes.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from f_lite_tpu.ops.norms import rms_norm


@dataclasses.dataclass(frozen=True)
class Qwen2Config:
    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    head_dim: int | None = None
    rope_theta: float = 1e6
    rms_norm_eps: float = 1e-6
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @classmethod
    def from_hf(cls, d: dict, **overrides) -> "Qwen2Config":
        # Qwen2.5-VL nests the LM config under text_config in new formats
        if "text_config" in d:
            d = d["text_config"]
        kw = dict(
            vocab_size=d.get("vocab_size", 152064),
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=d["num_attention_heads"],
            num_key_value_heads=d.get(
                "num_key_value_heads", d["num_attention_heads"]
            ),
            head_dim=d.get("head_dim"),
            rope_theta=d.get("rope_theta", 1e6),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
        )
        kw.update(overrides)
        return cls(**kw)


def _rope_1d(head_dim, positions, theta):
    inv = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv  # (B, S, hd/2)
    return jnp.cos(freqs), jnp.sin(freqs)


def _apply_rope_interleaved_half(x, cos, sin):
    # HF llama/qwen convention: rotate_half with contiguous halves
    d = x.shape[-1] // 2
    x1, x2 = x[..., :d], x[..., d:]
    # cos/sin: (B, S, d) -> broadcast over heads (B, H, S, d)
    cos = cos[:, None, :, :]
    sin = sin[:, None, :, :]
    y1 = x1 * cos - x2 * sin
    y2 = x2 * cos + x1 * sin
    return jnp.concatenate([y1, y2], axis=-1)


class Qwen2Layer(nn.Module):
    config: Qwen2Config

    @nn.compact
    def __call__(self, x, cos, sin, attn_bias):
        cfg = self.config
        h, kvh, d = (cfg.num_attention_heads, cfg.num_key_value_heads,
                     cfg.head_dim_)
        b, s, _ = x.shape

        w = self.param(
            "input_layernorm",
            nn.initializers.ones, (cfg.hidden_size,), cfg.param_dtype,
        )
        y = rms_norm(x, w, eps=cfg.rms_norm_eps)

        q = nn.Dense(h * d, use_bias=True, name="q_proj", dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype)(y)
        k = nn.Dense(kvh * d, use_bias=True, name="k_proj", dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype)(y)
        v = nn.Dense(kvh * d, use_bias=True, name="v_proj", dtype=cfg.dtype,
                     param_dtype=cfg.param_dtype)(y)
        q = q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, kvh, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, kvh, d).transpose(0, 2, 1, 3)

        qf = _apply_rope_interleaved_half(
            q.astype(jnp.float32), cos, sin
        ).astype(cfg.dtype)
        kf = _apply_rope_interleaved_half(
            k.astype(jnp.float32), cos, sin
        ).astype(cfg.dtype)

        # GQA: repeat kv heads
        reps = h // kvh
        kf = jnp.repeat(kf, reps, axis=1)
        vv = jnp.repeat(v, reps, axis=1)

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, kf, preferred_element_type=jnp.float32
        ) * (d ** -0.5)
        logits = logits + attn_bias  # causal (+ padding) bias
        probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, vv,
                       preferred_element_type=jnp.float32).astype(cfg.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        o = nn.Dense(cfg.hidden_size, use_bias=False, name="o_proj",
                     dtype=cfg.dtype, param_dtype=cfg.param_dtype)(o)
        x = x + o

        w2 = self.param(
            "post_attention_layernorm",
            nn.initializers.ones, (cfg.hidden_size,), cfg.param_dtype,
        )
        y = rms_norm(x, w2, eps=cfg.rms_norm_eps)
        gate = nn.Dense(cfg.intermediate_size, use_bias=False,
                        name="gate_proj", dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype)(y)
        up = nn.Dense(cfg.intermediate_size, use_bias=False, name="up_proj",
                      dtype=cfg.dtype, param_dtype=cfg.param_dtype)(y)
        down = nn.Dense(cfg.hidden_size, use_bias=False, name="down_proj",
                        dtype=cfg.dtype, param_dtype=cfg.param_dtype)(
            nn.silu(gate) * up
        )
        return x + down


class Qwen2Encoder(nn.Module):
    """Returns hidden_states[return_index] like HF `output_hidden_states`
    (index 0 = embeddings; i = output of layer i)."""

    config: Qwen2Config
    return_index: int = -8

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        cfg = self.config
        b, s = input_ids.shape
        emb = self.param(
            "embed_tokens",
            nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.hidden_size), cfg.param_dtype,
        )
        x = jnp.take(emb, input_ids, axis=0).astype(cfg.dtype)

        positions = jnp.broadcast_to(jnp.arange(s)[None, :], (b, s))
        cos, sin = _rope_1d(cfg.head_dim_, positions, cfg.rope_theta)

        causal = jnp.tril(jnp.ones((s, s), jnp.bool_))
        mask = causal[None, None, :, :]
        if attention_mask is not None:
            key_ok = attention_mask[:, None, None, :].astype(jnp.bool_)
            mask = jnp.logical_and(mask, key_ok)
        attn_bias = jnp.where(mask, 0.0, -1e30).astype(jnp.float32)

        hidden_states = [x]
        for i in range(cfg.num_hidden_layers):
            x = Qwen2Layer(cfg, name=f"layers_{i}")(x, cos, sin, attn_bias)
            hidden_states.append(x)
        # final norm applies only to the LAST hidden state in HF semantics;
        # intermediate indices (like -8) are pre-norm residuals
        w = self.param("norm", nn.initializers.ones,
                       (cfg.hidden_size,), cfg.param_dtype)
        hidden_states[-1] = rms_norm(x, w, eps=cfg.rms_norm_eps)
        return hidden_states[self.return_index]


_PREFIXES = (
    "model.language_model.", "language_model.model.", "language_model.",
    "model.", "",
)


def convert_qwen2_state_dict(sd: dict, config: Qwen2Config) -> dict:
    """HF Qwen2 / Qwen2.5-VL-language-tower state dict -> flax params."""

    def find(key):
        for p in _PREFIXES:
            if p + key in sd:
                return np.asarray(sd[p + key], np.float32)
        raise KeyError(key)

    params: dict[str, Any] = {
        "embed_tokens": find("embed_tokens.weight"),
        "norm": find("norm.weight"),
    }
    for i in range(config.num_hidden_layers):
        base = f"layers.{i}"
        layer: dict[str, Any] = {
            "input_layernorm": find(f"{base}.input_layernorm.weight"),
            "post_attention_layernorm": find(
                f"{base}.post_attention_layernorm.weight"
            ),
        }
        for name in ("q_proj", "k_proj", "v_proj"):
            layer[name] = {
                "kernel": find(f"{base}.self_attn.{name}.weight").T.copy(),
                "bias": find(f"{base}.self_attn.{name}.bias"),
            }
        layer["o_proj"] = {
            "kernel": find(f"{base}.self_attn.o_proj.weight").T.copy()
        }
        for name in ("gate_proj", "up_proj", "down_proj"):
            layer[name] = {
                "kernel": find(f"{base}.mlp.{name}.weight").T.copy()
            }
        params[f"layers_{i}"] = layer
    return {"params": params}


class Qwen2TextEncoder:
    """TextEncoder-protocol wrapper: tokenize (chat template) -> Flax
    Qwen2 -> hidden_states[-8]. Native-TPU replacement for
    `TorchTextEncoder` on Qwen checkpoints."""

    def __init__(
        self,
        model_path: str,
        processor_path: str | None = None,
        *,
        return_index: int = -8,
        max_sequence_length: int = 512,
        pad_to_multiple_of: int = 8,
        dtype=None,
        message_fn=None,
    ):
        import json
        from pathlib import Path

        from transformers import AutoTokenizer

        from f_lite_tpu.text.templates import inference_chat_messages

        mp = Path(model_path)
        self.tokenizer = AutoTokenizer.from_pretrained(
            processor_path or model_path
        )
        cfg_d = json.loads((mp / "config.json").read_text())
        self.config = Qwen2Config.from_hf(
            cfg_d, dtype=dtype or jnp.bfloat16,
            param_dtype=dtype or jnp.bfloat16,
        )
        self.model = Qwen2Encoder(self.config, return_index=return_index)
        sd = _load_any_weights(mp)
        self.params = jax.tree.map(
            lambda x: jnp.asarray(x, dtype or jnp.bfloat16),
            convert_qwen2_state_dict(sd, self.config),
        )
        self.max_sequence_length = max_sequence_length
        self.pad_to_multiple_of = pad_to_multiple_of
        self.message_fn = message_fn or inference_chat_messages
        self.embed_dim = self.config.hidden_size
        self._apply = jax.jit(self.model.apply)

    def _render(self, prompt):
        if getattr(self.tokenizer, "chat_template", None):
            return self.tokenizer.apply_chat_template(
                self.message_fn(prompt), tokenize=False,
                add_generation_prompt=True,
            )
        return prompt

    def encode(self, prompts):
        enc = self.tokenizer(
            [self._render(p) for p in prompts],
            padding="longest",
            pad_to_multiple_of=self.pad_to_multiple_of,
            max_length=self.max_sequence_length,
            truncation=True,
            return_tensors="np",
        )
        out = self._apply(
            self.params, jnp.asarray(enc["input_ids"]),
            jnp.asarray(enc["attention_mask"]),
        )
        return (
            np.asarray(out, np.float32),
            enc["attention_mask"].astype(bool),
        )


def _load_any_weights(path):
    from f_lite_tpu.convert.torch_to_jax import load_hf_weights

    return load_hf_weights(path)
