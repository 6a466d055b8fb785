"""Text-encoder tests: T5 (tiny random Flax), Zero, Precomputed."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


class TestT5Encoder:
    @pytest.fixture(scope="class")
    def t5_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("t5")
        # torch weights, like real HF text-encoder dirs (the native
        # text/t5.py loader consumes torch safetensors directly)
        from transformers import T5Config, T5EncoderModel

        cfg = T5Config(
            vocab_size=256, d_model=32, d_kv=8, d_ff=64, num_layers=4,
            num_heads=4, dropout_rate=0.0,
        )
        import torch

        torch.manual_seed(0)
        model = T5EncoderModel(cfg)
        model.save_pretrained(d, safe_serialization=True)
        # minimal whitespace tokenizer files aren't needed: use a real
        # small tokenizer class — bert's basic tokenizer needs vocab; use
        # a trivial PreTrainedTokenizerFast built from scratch
        from tokenizers import Tokenizer, models, pre_tokenizers
        from transformers import PreTrainedTokenizerFast

        vocab = {chr(c): i for i, c in enumerate(range(97, 123))}
        vocab["[UNK]"] = len(vocab)
        vocab["[PAD]"] = len(vocab)
        tok = Tokenizer(models.WordLevel(vocab, unk_token="[UNK]"))
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        fast = PreTrainedTokenizerFast(
            tokenizer_object=tok, unk_token="[UNK]", pad_token="[PAD]"
        )
        fast.save_pretrained(d)
        return d

    def test_encode_shapes_and_mask(self, t5_dir):
        import jax.numpy as jnp

        from f_lite_tpu.text.encoder import T5TextEncoder

        te = T5TextEncoder(str(t5_dir), return_index=-2,
                           dtype=jnp.float32)
        emb, mask = te.encode(["a b c", "a"])
        assert emb.shape[0] == 2
        assert emb.shape[2] == 32  # d_model
        assert emb.shape[1] % 8 == 0  # pad_to_multiple_of
        assert mask.dtype == bool
        assert mask[0].sum() >= mask[1].sum()
        # prefix-mask contract (right padding)
        for row in mask:
            n = row.sum()
            assert row[:n].all() and not row[n:].any()

    def test_return_index_changes_output(self, t5_dir):
        import jax.numpy as jnp

        from f_lite_tpu.text.encoder import T5TextEncoder

        a = T5TextEncoder(str(t5_dir), return_index=-1, dtype=jnp.float32)
        b = T5TextEncoder(str(t5_dir), return_index=-3, dtype=jnp.float32)
        ea, _ = a.encode(["a b"])
        eb, _ = b.encode(["a b"])
        assert not np.allclose(ea, eb)


class TestZeroEncoder:
    def test_deterministic_per_prompt(self):
        from f_lite_tpu.text.encoder import ZeroTextEncoder

        te = ZeroTextEncoder(embed_dim=16, seq_len=8)
        a, _ = te.encode(["hello"])
        b, _ = te.encode(["hello"])
        c, _ = te.encode(["world"])
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)


class TestPrecomputedEncoder:
    def test_cache_roundtrip(self, tmp_path):
        from f_lite_tpu.data.precomputed import PrecomputedCacheWriter
        from f_lite_tpu.text.encoder import (
            PrecomputedTextEncoder,
            caption_cache_key,
        )

        w = PrecomputedCacheWriter(tmp_path)
        rs = np.random.RandomState(0)
        emb = rs.randn(5, 16).astype(np.float32)
        w.add("id1", "a red cat", rs.randn(8, 8, 4).astype(np.float32), emb)
        w.finalize()

        te = PrecomputedTextEncoder(tmp_path)
        got, mask = te.encode(["a red cat"])
        assert got.shape[2] == 16
        np.testing.assert_allclose(got[0, :5], emb)
        assert mask[0, :5].all() and not mask[0, 5:].any()

    def test_missing_caption_raises(self, tmp_path):
        from f_lite_tpu.data.precomputed import PrecomputedCacheWriter
        from f_lite_tpu.text.encoder import PrecomputedTextEncoder

        w = PrecomputedCacheWriter(tmp_path)
        w.add("x", "known", np.zeros((4, 4, 4), np.float32),
              np.zeros((3, 8), np.float32))
        w.finalize()
        te = PrecomputedTextEncoder(tmp_path)
        with pytest.raises(KeyError):
            te.encode(["unknown caption"])
