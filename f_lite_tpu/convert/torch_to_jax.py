"""Torch/HF checkpoint -> JAX pytree conversion.

Covers the reference's checkpoint surfaces:
- raw `.pt` DiT state dicts (`/root/reference/f_lite/pt.py:78-101`), incl.
  `module.` / `_orig_mod.` prefix stripping and depth inference from block
  indices (`pt.py:81`);
- HF-format safetensors shards (diffusers `save_pretrained` layout used by
  the released Freepik/F-Lite repos);
- the diffusers AutoencoderKL (Flux VAE) state dict.

Layout contracts (must match models/dit.py and models/vae.py):
- torch Linear weight (out, in) -> flax Dense kernel (in, out): transpose;
- torch fused qkv / context_kv / q weights are (which, heads, head_dim)-
  major on the output dim; the jax model keeps them HEAD-ALIGNED as
  (in, *split, H, D) (models/dit.py HeadProj, so tensor parallelism can
  shard the H axis) — transpose then a pure reshape, no reordering;
- torch Conv2d weight (O, I, kh, kw) -> flax Conv kernel (kh, kw, I, O);
- the patch embed Conv2d (D, C, p, p) becomes a matmul kernel (p*p*C, D)
  flattened in (ki, kj, c) patch order (see ops/patching.py docstring).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Any, Mapping

import numpy as np

from f_lite_tpu.models.dit import DiTConfig
from f_lite_tpu.models.vae import VAEConfig


def load_torch_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    """Load a `.pt`/`.bin` (torch.load) or `.safetensors` file to numpy."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    import torch  # torch (cpu) is only needed for legacy .pt checkpoints

    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


def strip_prefixes(sd: Mapping[str, Any]) -> dict[str, Any]:
    """Strip `module.` / `_orig_mod.` like `pt.py:98-101`."""
    return {
        k.replace("module.", "").replace("_orig_mod.", ""): v
        for k, v in sd.items()
    }


def infer_depth(sd: Mapping[str, Any]) -> int:
    """Max block index + 1 (`pt.py:81`)."""
    idxs = [
        int(m.group(1))
        for k in sd
        if (m := re.match(r"blocks\.(\d+)\.", k))
    ]
    if not idxs:
        raise ValueError("no `blocks.N.` keys in state dict")
    return max(idxs) + 1


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _dense(sd, torch_name, *, transpose=True):
    out = {"kernel": _t(sd[f"{torch_name}.weight"]) if transpose
           else sd[f"{torch_name}.weight"]}
    if f"{torch_name}.bias" in sd:
        out["bias"] = sd[f"{torch_name}.bias"]
    return out


def _pad_axis(a: np.ndarray, axis: int, to: int) -> np.ndarray:
    if a.shape[axis] == to:
        return a
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, to - a.shape[axis])
    return np.pad(a, pad)


def _head_dense(sd, torch_name, split, heads, head_dim, pad_to=None):
    """Fused attention projection -> head-aligned (in, *split, H, D).

    `pad_to`: zero-pad the head axis to this count (DiTConfig.padded_heads
    — exact: zero q/k/v heads attend to zero values and their out-proj
    rows are zero-padded in `_proj_padded`)."""
    w = _t(sd[f"{torch_name}.weight"])  # (in, prod(split)*H*D)
    kernel = w.reshape(w.shape[0], *split, heads, head_dim)
    out = {}
    if pad_to:
        kernel = _pad_axis(kernel, kernel.ndim - 2, pad_to)
    out["kernel"] = np.ascontiguousarray(kernel)
    if f"{torch_name}.bias" in sd:
        bias = sd[f"{torch_name}.bias"].reshape(*split, heads, head_dim)
        if pad_to:
            bias = _pad_axis(bias, bias.ndim - 2, pad_to)
        out["bias"] = np.ascontiguousarray(bias)
    return out


def _proj_padded(sd, torch_name, heads, head_dim, pad_to=None):
    """Attention out-proj (H*D, hidden): zero-pad input rows for padded
    heads (row-major per head, so padding appends whole zero heads)."""
    out = _dense(sd, torch_name)
    if pad_to:
        out["kernel"] = _pad_axis(out["kernel"], 0, pad_to * head_dim)
    return out


def pad_head_params(params: dict, head_dim: int, pad_to: int) -> dict:
    """Zero-pad an already-converted flax DiT tree to `pad_to` heads.

    Exact (see DiTConfig.padded_heads): pads the H axis (-2) of
    qkv/q/context_kv kernels+biases and the input rows of the attention
    out-projs. Handles both unrolled and scan-stacked (leading `layers`
    axis) layouts — the padded axes are fixed distances from the end.
    """
    import jax.numpy as jnp

    def pad(a, axis, to):
        if a.shape[axis] == to:
            return a
        widths = [(0, 0)] * a.ndim
        widths[axis] = (0, to - a.shape[axis])
        return jnp.pad(a, widths)

    def rec(node, parent=""):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if isinstance(v, dict) and k in ("qkv", "q", "context_kv"):
                d = {**v, "kernel": pad(v["kernel"], -2, pad_to)}
                if "bias" in v:
                    d["bias"] = pad(v["bias"], -2, pad_to)
                out[k] = d
            elif (
                isinstance(v, dict) and k == "proj"
                and parent in ("self_attn", "cross_attn")
            ):
                out[k] = {
                    **v,
                    "kernel": pad(v["kernel"], -2, pad_to * head_dim),
                }
            else:
                out[k] = rec(v, k)
        return out

    return rec(params)


class _KeyRecorder(dict):
    """Dict that records which keys a conversion actually reads.

    Only `sd[k]` counts as consumption — `k in sd` probes (how the
    converter detects optional params) must not mark a key consumed, or
    coverage would report keys as read that were merely sniffed."""

    def __init__(self, base):
        super().__init__(base)
        self.consumed: set[str] = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)


def convert_dit_state_dict(
    sd: Mapping[str, np.ndarray],
    config: DiTConfig,
    *,
    consumed: set[str] | None = None,
) -> dict:
    """Torch DiT state dict -> flax params dict (matches models/dit.py).

    `consumed`, if given, is filled with the (prefix-stripped) source keys
    the conversion actually read — the key-coverage input for
    convert/manifest.py (the loud replacement for the reference's silent
    `strict=False` load, `pt.py:98-101`)."""
    sd = strip_prefixes(sd)
    if consumed is not None:
        sd = _KeyRecorder(sd)
        sd.consumed = consumed  # record straight into the caller's set
    p: dict[str, Any] = {}

    p["context_proj"] = _dense(sd, "context_proj")
    p["context_norm"] = {"weight": sd["context_norm.weight"]}

    w = sd["patch_embed.patch_proj.weight"]  # (D, C, p, p)
    d_model = w.shape[0]
    kernel = np.ascontiguousarray(
        w.transpose(2, 3, 1, 0).reshape(-1, d_model)
    )  # (p*p*C, D) in (ki, kj, c) order
    p["patch_proj"] = {
        "kernel": kernel, "bias": sd["patch_embed.patch_proj.bias"]
    }

    p["register_tokens"] = sd["register_tokens"]
    if "positional_embedding" in sd:
        p["positional_embedding"] = sd["positional_embedding"]

    p["time_embed"] = {
        "linear_1": _dense(sd, "time_embed.0"),
        "linear_2": _dense(sd, "time_embed.2"),
    }
    if "adaLN_modulation.1.weight" in sd:
        p["adaLN_modulation"] = {
            "linear": _dense(sd, "adaLN_modulation.1")
        }

    heads, head_dim = config.num_heads, config.head_dim
    pad_to = (
        config.compute_heads if config.compute_heads != heads else None
    )
    for i in range(config.depth):
        b = f"blocks.{i}"
        blk: dict[str, Any] = {
            "norm1": {"weight": sd[f"{b}.norm1.weight"]},
            "norm3": {"weight": sd[f"{b}.norm3.weight"]},
            "self_attn": {
                "qkv": _head_dense(sd, f"{b}.self_attn.qkv", (3,),
                                   heads, head_dim, pad_to),
                "proj": _proj_padded(sd, f"{b}.self_attn.proj",
                                     heads, head_dim, pad_to),
            },
            "mlp": {
                "gate_proj": _dense(sd, f"{b}.mlp.gate_proj"),
                "up_proj": _dense(sd, f"{b}.mlp.up_proj"),
                "down_proj": _dense(sd, f"{b}.mlp.down_proj"),
            },
        }
        if f"{b}.self_attn.lambda_v" in sd:
            blk["self_attn"]["lambda_v"] = sd[f"{b}.self_attn.lambda_v"]
        if f"{b}.norm2.weight" in sd:
            blk["norm2"] = {"weight": sd[f"{b}.norm2.weight"]}
            blk["cross_attn"] = {
                "q": _head_dense(sd, f"{b}.cross_attn.q", (),
                                 heads, head_dim, pad_to),
                "context_kv": _head_dense(sd, f"{b}.cross_attn.context_kv",
                                          (2,), heads, head_dim, pad_to),
                "proj": _proj_padded(sd, f"{b}.cross_attn.proj",
                                     heads, head_dim, pad_to),
            }
        p[f"blocks_{i}"] = blk
        # per-block AdaLN (v2: `model_v2.py:269-271`)
        if f"{b}.adaLN_modulation.1.weight" in sd:
            p[f"blocks_{i}_adaLN"] = {
                "linear": _dense(sd, f"{b}.adaLN_modulation.1")
            }

    p["final_modulation"] = {"linear": _dense(sd, "final_modulation.1")}
    if "final_norm.weight" in sd:
        p["final_norm"] = {"weight": sd["final_norm.weight"]}
    p["final_proj"] = _dense(sd, "final_proj")
    if config.scan_layers:
        p = to_scan_layout(p, config)
    out = {"params": p}
    if config.pipeline_stages > 1:
        from f_lite_tpu.parallel.pipeline import scan_to_pipeline_params

        out = scan_to_pipeline_params(out, config.pipeline_stages)
    return out


def _stack_trees(trees):
    import jax

    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *trees)


def to_scan_layout(p: dict, config: DiTConfig) -> dict:
    """Re-stack unrolled per-block params into the `scan_layers` layout
    (models/dit.py ScanUnit): `blocks_front`/`blocks_rest` for the v1
    pattern, `blocks_all` for cross_attn_all — leaves gain a leading
    `layers` axis."""
    per_block = config.adaln_mode == "per_block"

    def unit(indices):
        u: dict = {}
        for j, i in enumerate(indices):
            blk = p.pop(f"blocks_{i}")
            if config.residual_v and "lambda_v" not in blk["self_attn"]:
                # block 0 has no lambda in the unrolled layout; under scan
                # every block owns one (block 0's is inert — `mix` gates it)
                blk["self_attn"]["lambda_v"] = np.ones(1, np.float32)
            u[f"blk_{j}"] = blk
            if per_block:
                u[f"blk_{j}_adaLN"] = p.pop(f"blocks_{i}_adaLN")
        return u

    if config.cross_attn_all:
        p["blocks_all"] = _stack_trees(
            [unit([i]) for i in range(config.depth)]
        )
        return p
    first_n = min(config.cross_attn_first_n, config.depth)
    rest = config.depth - first_n
    if rest % config.cross_attn_period != 0:
        raise ValueError(
            "scan layout requires (depth - first_n) % period == 0"
        )
    p["blocks_front"] = _stack_trees([unit([i]) for i in range(first_n)])
    n_units = rest // config.cross_attn_period
    if n_units:
        p["blocks_rest"] = _stack_trees([
            unit([first_n + u * config.cross_attn_period + j
                  for j in range(config.cross_attn_period)])
            for u in range(n_units)
        ])
    return p


def _conv(sd, torch_name):
    w = sd[f"{torch_name}.weight"]  # (O, I, kh, kw)
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if f"{torch_name}.bias" in sd:
        out["bias"] = sd[f"{torch_name}.bias"]
    return out


def _groupnorm(sd, torch_name):
    return {"norm": {
        "scale": sd[f"{torch_name}.weight"],
        "bias": sd[f"{torch_name}.bias"],
    }}


def _resnet(sd, base):
    out = {
        "norm1": _groupnorm(sd, f"{base}.norm1"),
        "conv1": _conv(sd, f"{base}.conv1"),
        "norm2": _groupnorm(sd, f"{base}.norm2"),
        "conv2": _conv(sd, f"{base}.conv2"),
    }
    if f"{base}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{base}.conv_shortcut")
    return out


def _mid_attn(sd, base):
    # diffusers Attention: to_q/to_k/to_v/to_out.0 Linears + group_norm
    return {
        "group_norm": _groupnorm(sd, f"{base}.group_norm"),
        "to_q": _dense(sd, f"{base}.to_q"),
        "to_k": _dense(sd, f"{base}.to_k"),
        "to_v": _dense(sd, f"{base}.to_v"),
        "to_out": _dense(sd, f"{base}.to_out.0"),
    }


def convert_vae_state_dict(
    sd: Mapping[str, np.ndarray],
    config: VAEConfig,
    *,
    consumed: set[str] | None = None,
) -> dict:
    """diffusers AutoencoderKL state dict -> flax params (models/vae.py).

    `consumed` records read keys like convert_dit_state_dict's — catches
    e.g. a quant_conv/post_quant_conv pair (non-Flux AutoencoderKLs) that
    this Flux-shaped converter would otherwise silently drop."""
    sd = strip_prefixes(sd)
    if consumed is not None:
        sd = _KeyRecorder(sd)
        sd.consumed = consumed
    n_blocks = len(config.block_out_channels)
    enc: dict[str, Any] = {"conv_in": _conv(sd, "encoder.conv_in")}
    for i in range(n_blocks):
        for j in range(config.layers_per_block):
            enc[f"down_{i}_resnet_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}"
            )
        ds = f"encoder.down_blocks.{i}.downsamplers.0.conv"
        if f"{ds}.weight" in sd:
            enc[f"down_{i}_downsample"] = _conv(sd, ds)
    enc["mid_resnet_0"] = _resnet(sd, "encoder.mid_block.resnets.0")
    enc["mid_resnet_1"] = _resnet(sd, "encoder.mid_block.resnets.1")
    if config.mid_block_add_attention:
        enc["mid_attn"] = _mid_attn(sd, "encoder.mid_block.attentions.0")
    enc["conv_norm_out"] = _groupnorm(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec: dict[str, Any] = {"conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid_resnet_0"] = _resnet(sd, "decoder.mid_block.resnets.0")
    dec["mid_resnet_1"] = _resnet(sd, "decoder.mid_block.resnets.1")
    if config.mid_block_add_attention:
        dec["mid_attn"] = _mid_attn(sd, "decoder.mid_block.attentions.0")
    for i in range(n_blocks):
        for j in range(config.layers_per_block + 1):
            dec[f"up_{i}_resnet_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}"
            )
        us = f"decoder.up_blocks.{i}.upsamplers.0.conv"
        if f"{us}.weight" in sd:
            dec[f"up_{i}_upsample"] = _conv(sd, us)
    dec["conv_norm_out"] = _groupnorm(sd, "decoder.conv_norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    return {"params": {"encoder": enc, "decoder": dec}}


def load_hf_weights(path):
    """Every weight in an HF model dir as a flat {name: numpy} dict.

    Order of preference: model.safetensors.index.json shards ->
    model.safetensors -> any *.safetensors shards -> pytorch_model*.bin
    (NEVER a bare *.bin glob: Trainer dirs contain training_args.bin, a
    pickled non-tensor object that crashes torch.load). The single
    loader shared by the T5 and Qwen2 towers — their copies had already
    diverged on exactly these rules."""
    import json
    from pathlib import Path

    path = Path(path)
    idx = path / "model.safetensors.index.json"
    if idx.exists():
        from safetensors.numpy import load_file

        sd = {}
        for f in sorted(set(
            json.loads(idx.read_text())["weight_map"].values()
        )):
            sd.update(load_file(str(path / f)))
        return sd
    single = path / "model.safetensors"
    if single.exists():
        from safetensors.numpy import load_file

        return dict(load_file(str(single)))
    st_files = sorted(path.glob("*.safetensors"))
    if st_files:
        from safetensors.numpy import load_file

        sd = {}
        for f in st_files:
            sd.update(load_file(str(f)))
        return sd
    sd = {}
    for f in sorted(path.glob("pytorch_model*.bin")):
        sd.update(load_torch_state_dict(f))
    if not sd:
        raise FileNotFoundError(f"no weights under {path}")
    return sd
