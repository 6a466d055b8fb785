"""T5 encoder stack in Flax — the RELEASED F-Lite models' conditioning
path, natively on TPU.

The released checkpoints condition on hidden layer -8 of T5-XXL loaded
from the FLUX.1-schnell text_encoder subfolders
(`/root/reference/f_lite/pt.py:150-155`, README:166). Round 2 rode
transformers' `FlaxT5EncoderModel`, which is deprecated and scheduled for
removal in transformers v5 — this module replaces it with an in-repo
~300-line stack (like text/qwen2.py for the Qwen path), parity-tested
against torch `T5EncoderModel` (tests/test_t5.py).

Architecture facts replicated exactly (HF t5/modeling_t5.py semantics):
- T5LayerNorm == RMSNorm (no mean subtraction, no bias, fp32 island);
- attention scores are NOT scaled by 1/sqrt(d) — T5 folds the scale into
  the initialization; inner dim = num_heads * d_kv (may differ from
  d_model);
- a single learned relative-position-bias embedding lives in block 0 and
  is shared by every layer (bidirectional bucketing for the encoder);
- FF is either DenseReluDense (`relu`: wi -> relu -> wo) or the v1.1
  gated variant (`gated-gelu`: wo(gelu_new(wi_0(x)) * wi_1(x))) — T5-XXL
  from FLUX.1-schnell is v1.1 gated-gelu;
- `output_hidden_states` list = [embeddings, block_0_out, ...,
  block_{N-2}_out, final_layer_norm(block_{N-1}_out)] — intermediate
  indices like -8 are pre-final-norm residuals.
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
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    feed_forward_proj: str = "gated-gelu"
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @property
    def is_gated(self) -> bool:
        return self.feed_forward_proj.startswith("gated-")

    @property
    def act_fn(self):
        act = self.feed_forward_proj.removeprefix("gated-")
        if self.is_gated and act == "gelu":
            # HF remaps ONLY the "gated-gelu" spelling to gelu_new (tanh
            # approximation) — T5Config.__init__; plain "gelu" stays the
            # exact erf GELU (ACT2FN["gelu"] = GELUActivation)
            act = "gelu_new"
        return {
            "relu": nn.relu,
            "gelu": lambda x: nn.gelu(x, approximate=False),
            "gelu_new": lambda x: nn.gelu(x, approximate=True),
            "silu": nn.silu,
        }[act]

    @classmethod
    def from_hf(cls, d: dict, **overrides) -> "T5Config":
        kw = dict(
            vocab_size=d.get("vocab_size", 32128),
            d_model=d["d_model"],
            d_kv=d.get("d_kv", 64),
            d_ff=d["d_ff"],
            num_layers=d["num_layers"],
            num_heads=d["num_heads"],
            relative_attention_num_buckets=d.get(
                "relative_attention_num_buckets", 32
            ),
            relative_attention_max_distance=d.get(
                "relative_attention_max_distance", 128
            ),
            layer_norm_epsilon=d.get("layer_norm_epsilon", 1e-6),
            feed_forward_proj=d.get("feed_forward_proj", "relu"),
        )
        kw.update(overrides)
        return cls(**kw)


def _relative_position_bucket(rel_pos, num_buckets: int, max_distance: int):
    """Bidirectional bucketing (encoder side), HF semantics: half the
    buckets for positive offsets, log-spaced beyond num_buckets//4 exact
    positions out to max_distance."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5Block(nn.Module):
    config: T5Config

    @nn.compact
    def __call__(self, x, position_bias):
        cfg = self.config
        h, dk = cfg.num_heads, cfg.d_kv
        b, s, _ = x.shape
        inner = h * dk
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, name=name, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
        )

        w = self.param(
            "attn_layer_norm", nn.initializers.ones,
            (cfg.d_model,), cfg.param_dtype,
        )
        y = rms_norm(x, w, eps=cfg.layer_norm_epsilon)
        q = dense(inner, "q")(y).reshape(b, s, h, dk).transpose(0, 2, 1, 3)
        k = dense(inner, "k")(y).reshape(b, s, h, dk).transpose(0, 2, 1, 3)
        v = dense(inner, "v")(y).reshape(b, s, h, dk).transpose(0, 2, 1, 3)
        # NO 1/sqrt(d) scale — T5 semantics
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        scores = scores + position_bias  # bias already includes the pad mask
        probs = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        o = jnp.einsum(
            "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
        ).astype(cfg.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, inner)
        x = x + dense(cfg.d_model, "o")(o)

        w2 = self.param(
            "ff_layer_norm", nn.initializers.ones,
            (cfg.d_model,), cfg.param_dtype,
        )
        y = rms_norm(x, w2, eps=cfg.layer_norm_epsilon)
        if cfg.is_gated:
            ff = dense(cfg.d_ff, "wi_0")(y)
            ff = cfg.act_fn(ff) * dense(cfg.d_ff, "wi_1")(y)
        else:
            ff = cfg.act_fn(dense(cfg.d_ff, "wi")(y))
        return x + dense(cfg.d_model, "wo")(ff)


class T5EncoderStack(nn.Module):
    """Returns hidden_states[return_index] like HF `output_hidden_states`
    (index 0 = embeddings; -1 = final-layer-norm output; intermediate
    indices are pre-norm block outputs)."""

    config: T5Config
    return_index: int = -8

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        cfg = self.config
        b, s = input_ids.shape
        emb = self.param(
            "embed_tokens", nn.initializers.normal(1.0),
            (cfg.vocab_size, cfg.d_model), cfg.param_dtype,
        )
        x = jnp.take(emb, input_ids, axis=0).astype(cfg.dtype)

        # shared relative position bias, computed once (HF: block 0 owns it)
        rel = jnp.arange(s)[None, :] - jnp.arange(s)[:, None]  # key - query
        buckets = _relative_position_bucket(
            rel, cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance,
        )
        bias_emb = self.param(
            "relative_attention_bias", nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
            cfg.param_dtype,
        )
        position_bias = jnp.take(bias_emb, buckets, axis=0)  # (S, S, H)
        position_bias = position_bias.transpose(2, 0, 1)[None].astype(
            jnp.float32
        )  # (1, H, S, S)
        if attention_mask is not None:
            key_ok = attention_mask[:, None, None, :].astype(jnp.bool_)
            position_bias = position_bias + jnp.where(key_ok, 0.0, -1e30)

        hidden_states = [x]
        for i in range(cfg.num_layers):
            x = T5Block(cfg, name=f"blocks_{i}")(x, position_bias)
            hidden_states.append(x)
        w = self.param(
            "final_layer_norm", nn.initializers.ones,
            (cfg.d_model,), cfg.param_dtype,
        )
        hidden_states[-1] = rms_norm(x, w, eps=cfg.layer_norm_epsilon)
        return hidden_states[self.return_index]


def convert_t5_state_dict(sd: dict, config: T5Config) -> dict:
    """HF torch `T5EncoderModel` state dict -> flax params."""

    def find(key):
        for p in ("encoder.", "", "text_encoder.encoder."):
            if p + key in sd:
                return np.asarray(sd[p + key], np.float32)
        raise KeyError(key)

    def emb(key):
        for k in ("shared.weight", "encoder.embed_tokens.weight",
                  "embed_tokens.weight"):
            if k in sd:
                return np.asarray(sd[k], np.float32)
        raise KeyError(key)

    params: dict[str, Any] = {
        "embed_tokens": emb("shared.weight"),
        "relative_attention_bias": find(
            "block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ),
        "final_layer_norm": find("final_layer_norm.weight"),
    }
    for i in range(config.num_layers):
        a = f"block.{i}.layer.0"
        f = f"block.{i}.layer.1"
        layer: dict[str, Any] = {
            "attn_layer_norm": find(f"{a}.layer_norm.weight"),
            "ff_layer_norm": find(f"{f}.layer_norm.weight"),
        }
        for n in ("q", "k", "v", "o"):
            layer[n] = {
                "kernel": find(f"{a}.SelfAttention.{n}.weight").T.copy()
            }
        names = ("wi_0", "wi_1") if config.is_gated else ("wi",)
        for n in (*names, "wo"):
            layer[n] = {
                "kernel": find(f"{f}.DenseReluDense.{n}.weight").T.copy()
            }
        params[f"blocks_{i}"] = layer
    return {"params": params}


def load_t5_encoder(
    model_path, *, return_index: int = -8, dtype=jnp.bfloat16
):
    """Build (T5EncoderStack, params) from an HF model dir (config.json +
    torch safetensors/bin shards) — no transformers Flax classes."""
    import json
    from pathlib import Path

    model_path = Path(model_path)
    cfg = T5Config.from_hf(
        json.loads((model_path / "config.json").read_text()),
        dtype=dtype, param_dtype=dtype,
    )
    from f_lite_tpu.convert.torch_to_jax import load_hf_weights

    sd = load_hf_weights(model_path)
    # materialize straight at param_dtype: the conversion path's np.float32
    # intermediates are host-side only — without this cast T5-XXL would
    # land as ~19 GB of fp32 on a 16 GB chip
    params = jax.tree.map(
        lambda a: jnp.asarray(a, cfg.param_dtype),
        convert_t5_state_dict(sd, cfg),
    )
    return T5EncoderStack(cfg, return_index=return_index), params, cfg
