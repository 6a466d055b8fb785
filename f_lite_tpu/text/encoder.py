"""Text encoders producing (embeddings (B, S, C), mask (B, S)) pairs.

The DiT conditions on hidden layer -8 of a large frozen text encoder
(reference `pipeline.py:83,153-154`; tech report p.3: intermediate layers
converge 25-30% faster). Implementations:

- `T5TextEncoder` — the released models' T5-XXL path (`pt.py:150-155`),
  running transformers' Flax T5 natively on TPU, hidden_states[-8].
- `TorchTextEncoder` — generic torch-CPU fallback for encoders without a
  Flax port (Qwen2.5-VL at HEAD, `pipeline.py:14`), chat-template wrapped.
- `PrecomputedTextEncoder` — serves cached embeddings keyed by caption md5,
  matching `precompute_embeddings.py:127-197` cache semantics.
- `ZeroTextEncoder` — deterministic hermetic encoder for tests/benchmarks.

All pad to a multiple of `pad_to_multiple_of` (reference: 8, `pipeline.py:
147`) and truncate at `max_sequence_length` (512). Padding is right-side,
so attention masks are prefix masks — the contract the Pallas flash kernel
relies on (ops/pallas/flash_attention.py).
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Protocol, Sequence

import numpy as np

from f_lite_tpu.text.templates import inference_chat_messages


class TextEncoder(Protocol):
    embed_dim: int

    def encode(
        self, prompts: Sequence[str]
    ) -> tuple[np.ndarray, np.ndarray]:
        """-> (embeddings (B, S, C) float32, mask (B, S) bool)."""
        ...


def _pad_to_multiple(ids_list, pad_id, multiple, max_len):
    longest = min(max(len(i) for i in ids_list), max_len)
    target = -(-longest // multiple) * multiple
    ids = np.full((len(ids_list), target), pad_id, np.int32)
    mask = np.zeros((len(ids_list), target), bool)
    for r, seq in enumerate(ids_list):
        seq = seq[:max_len]
        ids[r, : len(seq)] = seq
        mask[r, : len(seq)] = True
    return ids, mask


class T5TextEncoder:
    """Native Flax T5 encoder (e.g. T5-XXL from FLUX.1-schnell subfolders).

    Loads the HF dir's torch weights into the in-repo `text/t5.py` stack —
    no transformers Flax classes (they are deprecated for removal in v5).
    """

    def __init__(
        self,
        model_path: str,
        tokenizer_path: str | None = None,
        *,
        return_index: int = -8,
        max_sequence_length: int = 512,
        pad_to_multiple_of: int = 8,
        dtype=None,
    ):
        import jax
        import jax.numpy as jnp
        from transformers import AutoTokenizer

        from f_lite_tpu.text.t5 import load_t5_encoder

        self.tokenizer = AutoTokenizer.from_pretrained(
            tokenizer_path or model_path
        )
        self.model, self.params, cfg = load_t5_encoder(
            model_path, return_index=return_index,
            dtype=dtype or jnp.bfloat16,
        )
        # NOTE: the index is baked into the loaded module; unlike
        # TorchTextEncoder there is no mutable per-call attribute
        self.max_sequence_length = max_sequence_length
        self.pad_to_multiple_of = pad_to_multiple_of
        self.embed_dim = cfg.d_model
        self._apply = jax.jit(self.model.apply)

    def encode(self, prompts):
        import jax.numpy as jnp

        enc = self.tokenizer(
            list(prompts),
            padding="longest",
            pad_to_multiple_of=self.pad_to_multiple_of,
            max_length=self.max_sequence_length,
            truncation=True,
            return_tensors="np",
        )
        out = self._apply(
            self.params,
            jnp.asarray(enc["input_ids"]),
            jnp.asarray(enc["attention_mask"]),
        )
        emb = np.asarray(out, dtype=np.float32)
        return emb, enc["attention_mask"].astype(bool)


class TorchTextEncoder:
    """torch-CPU encoder for models without a Flax port (Qwen2.5-VL path).

    Wraps prompts in the chat template when the tokenizer has one
    (`pipeline.py:105-124`); raw captions otherwise.
    """

    def __init__(
        self,
        model_path: str,
        processor_path: str | None = None,
        *,
        return_index: int = -8,
        max_sequence_length: int = 512,
        pad_to_multiple_of: int = 8,
        use_chat_template: bool = True,
        message_fn=inference_chat_messages,
    ):
        import torch
        from transformers import AutoModel, AutoProcessor

        self.processor = AutoProcessor.from_pretrained(
            processor_path or model_path
        )
        self.model = AutoModel.from_pretrained(
            model_path, torch_dtype=torch.float32
        )
        self.model.eval()
        self.return_index = return_index
        self.max_sequence_length = max_sequence_length
        self.pad_to_multiple_of = pad_to_multiple_of
        self.use_chat_template = use_chat_template
        self.message_fn = message_fn
        self.embed_dim = self.model.config.hidden_size

    def _render(self, prompt: str) -> str:
        if self.use_chat_template and hasattr(
            self.processor, "apply_chat_template"
        ):
            return self.processor.apply_chat_template(
                self.message_fn(prompt),
                tokenize=False,
                add_generation_prompt=True,
            )
        return prompt

    def encode(self, prompts):
        import torch

        texts = [self._render(p) for p in prompts]
        inputs = self.processor(
            text=texts,
            padding="longest",
            pad_to_multiple_of=self.pad_to_multiple_of,
            max_length=self.max_sequence_length,
            truncation=True,
            return_attention_mask=True,
            return_tensors="pt",
        )
        with torch.no_grad():
            out = self.model(
                **inputs, use_cache=False, return_dict=True,
                output_hidden_states=True,
            )
        emb = out.hidden_states[self.return_index].float().numpy()
        return emb, inputs["attention_mask"].numpy().astype(bool)


def caption_cache_key(caption: str) -> str:
    """md5 of the caption — the precompute cache key
    (`precompute_embeddings.py:127-145` uses md5-named .pt files)."""
    return hashlib.md5(caption.encode("utf-8")).hexdigest()


class PrecomputedTextEncoder:
    """Serves embeddings from a precompute cache directory.

    Layout (precomputed by tools/precompute_embeddings.py, mirroring the
    reference's `text_embeddings/embedding_<md5>` + mapping json):
      {root}/text_embeddings/embedding_<md5>.npy
      {root}/precomputed_mapping.json
    """

    def __init__(self, root: str | Path, embed_dim: int | None = None):
        self.root = Path(root)
        mapping_file = self.root / "precomputed_mapping.json"
        self.mapping = (
            json.loads(mapping_file.read_text()) if mapping_file.exists()
            else {}
        )
        self.embed_dim = embed_dim or self._infer_dim()

    def _infer_dim(self):
        d = self.root / "text_embeddings"
        for f in sorted(d.glob("embedding_*.npy")):
            return int(np.load(f, mmap_mode="r").shape[-1])
        raise FileNotFoundError(f"no embeddings under {d}")

    def has(self, prompt: str) -> bool:
        """Whether `prompt` is cached — existence only, nothing loaded
        (serve.py's fail-fast preflight before the multi-minute model
        load)."""
        return (self.root / "text_embeddings" / (
            f"embedding_{caption_cache_key(prompt)}.npy"
        )).exists()

    def encode(self, prompts):
        embs = []
        for p in prompts:
            f = self.root / "text_embeddings" / (
                f"embedding_{caption_cache_key(p)}.npy"
            )
            if not f.exists():
                raise KeyError(
                    f"no precomputed embedding for caption {p!r} ({f.name})"
                )
            e = np.load(f).astype(np.float32)
            if e.ndim == 3:
                e = e[0]
            embs.append(e)
        longest = max(e.shape[0] for e in embs)
        target = -(-longest // 8) * 8
        out = np.zeros((len(embs), target, self.embed_dim), np.float32)
        mask = np.zeros((len(embs), target), bool)
        for i, e in enumerate(embs):
            out[i, : e.shape[0]] = e
            mask[i, : e.shape[0]] = True
        return out, mask


class ZeroTextEncoder:
    """Deterministic hermetic encoder: hash-seeded pseudo-embeddings.

    For tests and text-free benchmarks (the uncond path in the reference is
    literally a zeros context, `pipeline.py:161` — so zero/pseudo contexts
    are in-distribution for the model's CFG branch).
    """

    def __init__(self, embed_dim: int = 4096, seq_len: int = 128,
                 random: bool = True):
        self.embed_dim = embed_dim
        self.seq_len = seq_len
        self.random = random

    def encode(self, prompts):
        b = len(prompts)
        out = np.zeros((b, self.seq_len, self.embed_dim), np.float32)
        if self.random:
            for i, p in enumerate(prompts):
                seed = int(
                    hashlib.md5(p.encode()).hexdigest()[:8], 16
                )
                rs = np.random.RandomState(seed)
                out[i] = rs.randn(self.seq_len, self.embed_dim) * 0.02
        mask = np.ones((b, self.seq_len), bool)
        return out, mask
