"""LoRA as a pytree of low-rank deltas over attention projections.

Reference wires peft adapters onto `qkv, q, context_kv, proj`
(`/root/reference/f_lite/train.py:140,753-760`; rank/alpha 64 default,
gaussian init) and saves them separately as `lora_weights.pt`
(`model.py:487-495`). TPU-native equivalent: a parallel pytree of (A, B)
factors; the merged weight `W + (alpha/r) * A @ B` is materialized inside
jit (one fused matmul-add per target — negligible against the forward),
so the base model code stays untouched. `train_only_lora` trains the
factor pytree alone; full finetune trains both.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TARGETS = ("qkv", "q", "context_kv", "proj")


def _iter_kernels(params: dict, path=()):
    for k, v in params.items():
        if isinstance(v, dict):
            if "kernel" in v and not isinstance(v["kernel"], dict):
                yield path + (k,), v["kernel"]
            else:
                yield from _iter_kernels(v, path + (k,))


def init_lora_params(
    rng: jax.Array,
    params: dict,
    *,
    rank: int = 64,
    targets: Sequence[str] = DEFAULT_TARGETS,
    stddev: float = 0.02,
) -> dict:
    """Build the LoRA factor pytree for matching Dense kernels."""
    tree = params.get("params", params)
    lora: dict[str, Any] = {}
    keys = {}
    stacked = []
    for path, kernel in _iter_kernels(tree):
        if path[-1] in targets:
            # scan_layers stacks per-block params under blocks_front /
            # blocks_rest / blocks_all with a leading `layers` axis —
            # LoRA factors attach to unrolled kernels only
            if path[0] in ("blocks_front", "blocks_rest", "blocks_all"):
                stacked.append(path)
            else:
                # kernel (in, *out_dims): head-aligned attention kernels
                # (models/dit.py HeadProj) are (in, [3|2,] H, D)
                keys[path] = kernel.shape
    if stacked and not keys:
        raise ValueError(
            "LoRA found only stacked (scan_layers) kernels, e.g. "
            f"{'/'.join(stacked[0])} — LoRA requires the unrolled layout; "
            "drop --scan_layers for LoRA training (otherwise the factor "
            "tree would be empty and training would silently optimize "
            "nothing)."
        )
    rngs = jax.random.split(rng, max(len(keys), 1))
    for i, (path, shape) in enumerate(sorted(keys.items())):
        d_in, d_out = shape[0], int(np.prod(shape[1:]))
        node = lora
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {
            "lora_a": jax.random.normal(
                rngs[i], (d_in, rank), jnp.float32
            ) * stddev,  # gaussian init (`pt.py:124`)
            "lora_b": jnp.zeros((rank, d_out), jnp.float32),
        }
    return {"params": lora} if "params" in params else lora


def apply_lora(params: dict, lora: dict, *, alpha: float = 64.0,
               rank: int = 64, scale: float = 1.0) -> dict:
    """Merged params: W + scale * (alpha/rank) * A @ B. Jit-safe."""
    factor = scale * alpha / rank

    def merge(p_node, l_node):
        out = {}
        for k, v in p_node.items():
            l_sub = l_node.get(k) if isinstance(l_node, dict) else None
            if isinstance(v, dict):
                if l_sub is not None and "lora_a" in l_sub:
                    delta = (
                        l_sub["lora_a"] @ l_sub["lora_b"]
                    ).astype(v["kernel"].dtype)
                    # head-aligned kernels are (in, *out): fold the flat
                    # low-rank delta back to the kernel's shape
                    delta = delta.reshape(v["kernel"].shape)
                    out[k] = {**v, "kernel": v["kernel"] + factor * delta}
                elif l_sub is not None:
                    out[k] = merge(v, l_sub)
                else:
                    out[k] = v
            else:
                out[k] = v
        return out

    p_tree = params.get("params", params)
    l_tree = lora.get("params", lora)
    merged = merge(p_tree, l_tree)
    return {"params": merged} if "params" in params else merged


def save_lora_weights(lora: dict, directory) -> None:
    """`{dir}/lora_weights.safetensors` (reference: lora_weights.pt,
    `model.py:487-490`)."""
    from pathlib import Path

    from safetensors.numpy import save_file

    flat = {}

    def rec(node, prefix):
        for k, v in node.items():
            key = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                rec(v, key)
            else:
                flat[key] = np.asarray(v)

    rec(lora.get("params", lora), "")
    save_file(flat, str(Path(directory) / "lora_weights.safetensors"))


def load_lora_weights(directory) -> dict:
    """`directory` may be the checkpoint dir, the framework
    `.safetensors` file, or a reference-format peft `lora_weights.pt`
    (`model.py:487-495`) — the torch route converts key names and factor
    layout via `convert.lora_torch` so a reference-trained LoRA drops
    straight into `FLitePipeline.from_pretrained(lora_path=...)`."""
    from pathlib import Path

    from safetensors.numpy import load_file

    p = Path(directory)
    if p.is_dir():
        st = p / "lora_weights.safetensors"
        pt = p / "lora_weights.pt"
        if not st.exists() and not pt.exists():
            raise FileNotFoundError(
                f"no LoRA weights in {p}: expected {st.name} (framework "
                f"format) or {pt.name} (reference peft format)"
            )
        p = st if st.exists() else pt
    if p.suffix == ".pt":
        import torch

        from f_lite_tpu.convert.lora_torch import lora_from_peft_state_dict

        sd = torch.load(str(p), map_location="cpu", weights_only=True)
        return jax.tree.map(jnp.asarray, lora_from_peft_state_dict(sd))
    flat = load_file(str(p))
    tree: dict[str, Any] = {}
    for k, v in flat.items():
        node = tree
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return tree
