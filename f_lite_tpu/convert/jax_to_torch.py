"""JAX pytree -> torch/HF checkpoint conversion (inverse of torch_to_jax).

The reference ecosystem consumes two formats:
- raw `.pt` DiT state dicts (`/root/reference/f_lite/pt.py:78-101`);
- diffusers `save_pretrained` repos produced by the reference converter
  (`/root/reference/f_lite/f_lite_to_hf.py:57-132`: `dit_model/`, `vae/`,
  `text_encoder/`, `tokenizer/`, `model_index.json`).

A model fine-tuned in this framework must be exportable back to both, and
the inverse map is the offline proof that conversion is correct:
convert -> invert -> bitwise compare (every step here is a transpose,
reshape, pad-strip, or stack/unstack of float32 numpy — all exact), and the
inverted state dict loads strict into the actual reference model code
(tests/test_convert_roundtrip.py, tools/parity_check.py --checkpoint).

Layout inversions, mirroring torch_to_jax.py one-to-one:
- flax Dense kernel (in, out)            -> torch Linear weight (out, in);
- head-aligned kernels (in, *split, H, D)-> fused torch (prod(split)*H*D, in),
  with zero-padded heads (DiTConfig.padded_heads) sliced off first;
- attention out-proj (Hpad*D, hidden)    -> rows beyond num_heads*D dropped;
- patch-embed matmul kernel (p*p*C, D)   -> Conv2d weight (D, C, p, p);
- scan-stacked layouts (`to_scan_layout`) unstacked back to `blocks.{i}.*`,
  dropping block 0's inert `lambda_v` (the unrolled reference layout has
  lambda_v only for i > 0 — see `to_scan_layout`);
- pipeline layouts folded to plain scan first (parallel/pipeline.py).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from f_lite_tpu.models.dit import DiTConfig
from f_lite_tpu.models.vae import VAEConfig


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _inv_dense(d: Mapping[str, Any], torch_name: str, out: dict) -> None:
    out[f"{torch_name}.weight"] = _t(d["kernel"])
    if "bias" in d:
        out[f"{torch_name}.bias"] = _np(d["bias"])


def _inv_head_dense(d, torch_name, heads, head_dim, out) -> None:
    """(in, *split, Hc, D) head-aligned kernel -> fused torch weight,
    stripping any zero-padded heads beyond `heads` (exact: the pads are
    write-only zeros, see DiTConfig.padded_heads)."""
    k = _np(d["kernel"])[..., :heads, :]
    out[f"{torch_name}.weight"] = _t(k.reshape(k.shape[0], -1))
    if "bias" in d:
        b = _np(d["bias"])[..., :heads, :]
        out[f"{torch_name}.bias"] = np.ascontiguousarray(b.reshape(-1))


def _inv_proj(d, torch_name, heads, head_dim, out) -> None:
    k = _np(d["kernel"])[: heads * head_dim, :]
    out[f"{torch_name}.weight"] = _t(k)
    if "bias" in d:
        out[f"{torch_name}.bias"] = _np(d["bias"])


def _check_not_quantized(p: dict) -> None:
    def rec(node):
        if isinstance(node, Mapping):
            if "w8" in node:
                raise ValueError(
                    "cannot export int8-quantized params to torch — "
                    "quantization is lossy; export the source bf16/fp32 "
                    "checkpoint instead"
                )
            for v in node.values():
                rec(v)

    rec(p)


def from_scan_layout(p: dict, config: DiTConfig) -> dict:
    """Inverse of `to_scan_layout`: unstack `blocks_front`/`blocks_rest`/
    `blocks_all` (leading `layers` axis) back into per-block `blocks_{i}`
    entries. Drops block 0's inert residual_v lambda (gated off by the scan
    `mix` selector, never read or trained — Attention.__call__)."""
    import jax

    p = dict(p)
    per_block = config.adaln_mode == "per_block"

    def emit(unit_stacked, unit_indices_per_step):
        n_steps = len(unit_indices_per_step)
        unstacked = [
            jax.tree.map(lambda x, s=s: _np(x)[s], unit_stacked)
            for s in range(n_steps)
        ]
        for step, indices in enumerate(unit_indices_per_step):
            u = unstacked[step]
            for j, i in enumerate(indices):
                blk = u[f"blk_{j}"]
                if i == 0 and config.residual_v:
                    blk = {
                        **blk,
                        "self_attn": {
                            k: v
                            for k, v in blk["self_attn"].items()
                            if k != "lambda_v"
                        },
                    }
                p[f"blocks_{i}"] = blk
                if per_block:
                    p[f"blocks_{i}_adaLN"] = u[f"blk_{j}_adaLN"]

    if config.cross_attn_all:
        emit(p.pop("blocks_all"), [[i] for i in range(config.depth)])
        return p
    first_n = min(config.cross_attn_first_n, config.depth)
    rest = config.depth - first_n
    if "blocks_front" in p:
        emit(p.pop("blocks_front"), [[i] for i in range(first_n)])
    if "blocks_rest" in p:
        n_units = rest // config.cross_attn_period
        emit(
            p.pop("blocks_rest"),
            [
                [first_n + u * config.cross_attn_period + j
                 for j in range(config.cross_attn_period)]
                for u in range(n_units)
            ],
        )
    return p


def invert_dit_params(
    params: Mapping[str, Any], config: DiTConfig
) -> dict[str, np.ndarray]:
    """Flax DiT params -> the reference's torch state dict (key set and
    shapes of `pt.py:78-101` / `make_random_state_dict`)."""
    p = dict(params.get("params", params))
    _check_not_quantized(p)

    if any(
        isinstance(p.get(n), Mapping) and "pipe" in p[n]
        for n in ("blocks_all", "blocks_rest")
    ):
        from f_lite_tpu.parallel.pipeline import pipeline_to_scan_params

        p = pipeline_to_scan_params({"params": p})["params"]
    if any(n in p for n in ("blocks_all", "blocks_front", "blocks_rest")):
        p = from_scan_layout(p, config)

    heads, head_dim = config.num_heads, config.head_dim
    sd: dict[str, np.ndarray] = {}

    _inv_dense(p["context_proj"], "context_proj", sd)
    sd["context_norm.weight"] = _np(p["context_norm"]["weight"])

    k = _np(p["patch_proj"]["kernel"])  # (p*p*C, D) in (ki, kj, c) order
    ps, d_model = config.patch_size, k.shape[-1]
    c = k.shape[0] // (ps * ps)
    sd["patch_embed.patch_proj.weight"] = np.ascontiguousarray(
        k.reshape(ps, ps, c, d_model).transpose(3, 2, 0, 1)
    )  # (D, C, p, p)
    sd["patch_embed.patch_proj.bias"] = _np(p["patch_proj"]["bias"])

    sd["register_tokens"] = _np(p["register_tokens"])
    if "positional_embedding" in p:
        sd["positional_embedding"] = _np(p["positional_embedding"])

    _inv_dense(p["time_embed"]["linear_1"], "time_embed.0", sd)
    _inv_dense(p["time_embed"]["linear_2"], "time_embed.2", sd)
    if "adaLN_modulation" in p:
        _inv_dense(p["adaLN_modulation"]["linear"], "adaLN_modulation.1", sd)

    for i in range(config.depth):
        blk = p[f"blocks_{i}"]
        b = f"blocks.{i}"
        sd[f"{b}.norm1.weight"] = _np(blk["norm1"]["weight"])
        sd[f"{b}.norm3.weight"] = _np(blk["norm3"]["weight"])
        sa = blk["self_attn"]
        _inv_head_dense(sa["qkv"], f"{b}.self_attn.qkv", heads, head_dim, sd)
        _inv_proj(sa["proj"], f"{b}.self_attn.proj", heads, head_dim, sd)
        if "lambda_v" in sa:
            sd[f"{b}.self_attn.lambda_v"] = _np(sa["lambda_v"])
        mlp = blk["mlp"]
        _inv_dense(mlp["gate_proj"], f"{b}.mlp.gate_proj", sd)
        _inv_dense(mlp["up_proj"], f"{b}.mlp.up_proj", sd)
        _inv_dense(mlp["down_proj"], f"{b}.mlp.down_proj", sd)
        if "norm2" in blk:
            sd[f"{b}.norm2.weight"] = _np(blk["norm2"]["weight"])
            ca = blk["cross_attn"]
            _inv_head_dense(ca["q"], f"{b}.cross_attn.q", heads, head_dim, sd)
            _inv_head_dense(
                ca["context_kv"], f"{b}.cross_attn.context_kv",
                heads, head_dim, sd,
            )
            _inv_proj(ca["proj"], f"{b}.cross_attn.proj", heads, head_dim, sd)
        if f"blocks_{i}_adaLN" in p:
            _inv_dense(
                p[f"blocks_{i}_adaLN"]["linear"],
                f"{b}.adaLN_modulation.1", sd,
            )

    _inv_dense(p["final_modulation"]["linear"], "final_modulation.1", sd)
    if "final_norm" in p:
        sd["final_norm.weight"] = _np(p["final_norm"]["weight"])
    _inv_dense(p["final_proj"], "final_proj", sd)
    return sd


def _inv_conv(d, torch_name, out) -> None:
    # flax (kh, kw, I, O) -> torch (O, I, kh, kw)
    out[f"{torch_name}.weight"] = np.ascontiguousarray(
        _np(d["kernel"]).transpose(3, 2, 0, 1)
    )
    if "bias" in d:
        out[f"{torch_name}.bias"] = _np(d["bias"])


def _inv_groupnorm(d, torch_name, out) -> None:
    out[f"{torch_name}.weight"] = _np(d["norm"]["scale"])
    out[f"{torch_name}.bias"] = _np(d["norm"]["bias"])


def _inv_resnet(d, base, out) -> None:
    _inv_groupnorm(d["norm1"], f"{base}.norm1", out)
    _inv_conv(d["conv1"], f"{base}.conv1", out)
    _inv_groupnorm(d["norm2"], f"{base}.norm2", out)
    _inv_conv(d["conv2"], f"{base}.conv2", out)
    if "conv_shortcut" in d:
        _inv_conv(d["conv_shortcut"], f"{base}.conv_shortcut", out)


def _inv_mid_attn(d, base, out) -> None:
    _inv_groupnorm(d["group_norm"], f"{base}.group_norm", out)
    _inv_dense(d["to_q"], f"{base}.to_q", out)
    _inv_dense(d["to_k"], f"{base}.to_k", out)
    _inv_dense(d["to_v"], f"{base}.to_v", out)
    _inv_dense(d["to_out"], f"{base}.to_out.0", out)


def invert_vae_params(
    params: Mapping[str, Any], config: VAEConfig
) -> dict[str, np.ndarray]:
    """Flax VAE params -> diffusers AutoencoderKL state dict."""
    p = params.get("params", params)
    enc, dec = p["encoder"], p["decoder"]
    n_blocks = len(config.block_out_channels)
    sd: dict[str, np.ndarray] = {}

    _inv_conv(enc["conv_in"], "encoder.conv_in", sd)
    for i in range(n_blocks):
        for j in range(config.layers_per_block):
            _inv_resnet(
                enc[f"down_{i}_resnet_{j}"],
                f"encoder.down_blocks.{i}.resnets.{j}", sd,
            )
        if f"down_{i}_downsample" in enc:
            _inv_conv(
                enc[f"down_{i}_downsample"],
                f"encoder.down_blocks.{i}.downsamplers.0.conv", sd,
            )
    _inv_resnet(enc["mid_resnet_0"], "encoder.mid_block.resnets.0", sd)
    _inv_resnet(enc["mid_resnet_1"], "encoder.mid_block.resnets.1", sd)
    if "mid_attn" in enc:
        _inv_mid_attn(enc["mid_attn"], "encoder.mid_block.attentions.0", sd)
    _inv_groupnorm(enc["conv_norm_out"], "encoder.conv_norm_out", sd)
    _inv_conv(enc["conv_out"], "encoder.conv_out", sd)

    _inv_conv(dec["conv_in"], "decoder.conv_in", sd)
    _inv_resnet(dec["mid_resnet_0"], "decoder.mid_block.resnets.0", sd)
    _inv_resnet(dec["mid_resnet_1"], "decoder.mid_block.resnets.1", sd)
    if "mid_attn" in dec:
        _inv_mid_attn(dec["mid_attn"], "decoder.mid_block.attentions.0", sd)
    for i in range(n_blocks):
        for j in range(config.layers_per_block + 1):
            _inv_resnet(
                dec[f"up_{i}_resnet_{j}"],
                f"decoder.up_blocks.{i}.resnets.{j}", sd,
            )
        if f"up_{i}_upsample" in dec:
            _inv_conv(
                dec[f"up_{i}_upsample"],
                f"decoder.up_blocks.{i}.upsamplers.0.conv", sd,
            )
    _inv_groupnorm(dec["conv_norm_out"], "decoder.conv_norm_out", sd)
    _inv_conv(dec["conv_out"], "decoder.conv_out", sd)
    return sd


def reference_dit_config(config: DiTConfig) -> dict:
    """The reference DiT's constructor args / diffusers `config.json`
    fields for this architecture (`model.py:419-433`, `pt.py:85-95`)."""
    out = {
        "_class_name": "DiT",
        "in_channels": config.in_channels,
        "patch_size": config.patch_size,
        "hidden_size": config.hidden_size,
        "depth": config.depth,
        "num_heads": config.num_heads,
        "mlp_ratio": config.mlp_ratio,
        "cross_attn_input_size": config.cross_attn_input_size,
        "train_bias_and_rms": config.train_bias_and_rms,
        "use_rope": config.use_rope,
        "rope_base": config.rope_base,
        "dynamic_softmax_temperature": config.dynamic_softmax_temperature,
        "residual_v": config.residual_v,
        "gradient_checkpoint": False,
    }
    # non-v1 architecture fields are emitted ONLY when they differ from
    # the v1 defaults: a v1 export stays byte-identical to the reference
    # layout, while v2-style configs (per-block AdaLN / non-default
    # cross-attn pattern) round-trip through re-ingest instead of being
    # silently mislabeled as v1 (the in-repo reference model.py can't
    # express them anyway — its v2 lives in model_v2.py)
    if config.adaln_mode != "shared":
        out["adaln_mode"] = config.adaln_mode
    if config.cross_attn_all:
        out["cross_attn_all"] = True
    if config.cross_attn_first_n != 8:
        out["cross_attn_first_n"] = config.cross_attn_first_n
    if config.cross_attn_period != 4:
        out["cross_attn_period"] = config.cross_attn_period
    return out


def reference_vae_config(config: VAEConfig) -> dict:
    """diffusers AutoencoderKL `config.json` for the Flux-Schnell VAE
    shape (the fields `pt.py:143-145` / our VAE port depend on)."""
    n = len(config.block_out_channels)
    return {
        "_class_name": "AutoencoderKL",
        "in_channels": 3,
        "out_channels": 3,
        "down_block_types": ["DownEncoderBlock2D"] * n,
        "up_block_types": ["UpDecoderBlock2D"] * n,
        "block_out_channels": list(config.block_out_channels),
        "layers_per_block": config.layers_per_block,
        "act_fn": "silu",
        "latent_channels": config.latent_channels,
        "norm_num_groups": config.norm_num_groups,
        "sample_size": 1024,
        "scaling_factor": config.scaling_factor,
        "shift_factor": config.shift_factor,
        "mid_block_add_attention": config.mid_block_add_attention,
        "use_quant_conv": False,
        "use_post_quant_conv": False,
    }
