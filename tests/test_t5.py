"""Native Flax T5 encoder vs transformers' torch T5EncoderModel (random
tiny configs): hidden-state parity for both FF variants (relu, v1.1
gated-gelu), multiple return indices, and right padding. Replaces the
deprecated FlaxT5EncoderModel dependency (VERDICT r2 weak #2)."""

import numpy as np
import pytest
import torch

from f_lite_tpu.text.t5 import (
    T5Config,
    T5EncoderStack,
    convert_t5_state_dict,
)

transformers = pytest.importorskip("transformers")

TINY = dict(
    vocab_size=96,
    d_model=64,
    d_kv=16,
    d_ff=128,
    num_layers=4,
    num_heads=4,
    relative_attention_num_buckets=8,
    relative_attention_max_distance=20,
)


def _torch_model(feed_forward_proj):
    from transformers import T5Config as HFConfig
    from transformers import T5EncoderModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        **TINY, feed_forward_proj=feed_forward_proj,
        dropout_rate=0.0, is_encoder_decoder=False, use_cache=False,
    )
    m = T5EncoderModel(hf_cfg)
    m.eval()
    return m


def _flax_from(torch_model, feed_forward_proj, return_index):
    import jax
    import jax.numpy as jnp

    cfg = T5Config(**TINY, feed_forward_proj=feed_forward_proj)
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_t5_state_dict(sd, cfg))
    return T5EncoderStack(cfg, return_index=return_index), params


@pytest.mark.parametrize("ff", ["relu", "gelu", "gated-gelu"])
@pytest.mark.parametrize("return_index", [-1, -2, -3])
def test_hidden_state_parity(ff, return_index):
    import jax.numpy as jnp

    m = _torch_model(ff)
    rs = np.random.RandomState(0)
    ids = rs.randint(0, 96, (2, 10))
    mask = np.ones((2, 10), np.int64)

    with torch.no_grad():
        out = m(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            output_hidden_states=True,
        )
    assert len(out.hidden_states) == TINY["num_layers"] + 1
    ref = out.hidden_states[return_index].numpy()

    model, params = _flax_from(m, ff, return_index)
    got = np.asarray(
        model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_right_padding_parity():
    import jax.numpy as jnp

    m = _torch_model("gated-gelu")
    rs = np.random.RandomState(1)
    ids = rs.randint(0, 96, (2, 12))
    mask = np.zeros((2, 12), np.int64)
    mask[0, :12] = 1
    mask[1, :7] = 1

    with torch.no_grad():
        out = m(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            output_hidden_states=True,
        )
    ref = out.hidden_states[-2].numpy()

    model, params = _flax_from(m, "gated-gelu", -2)
    got = np.asarray(
        model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got[0], ref[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got[1, :7], ref[1, :7], atol=2e-4, rtol=1e-3)


def test_long_sequence_buckets():
    """Sequences past max_distance exercise the log-spaced bucket branch."""
    import jax.numpy as jnp

    m = _torch_model("relu")
    rs = np.random.RandomState(2)
    ids = rs.randint(0, 96, (1, 48))  # > max_distance=20
    mask = np.ones((1, 48), np.int64)

    with torch.no_grad():
        out = m(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            output_hidden_states=True,
        )
    ref = out.hidden_states[-1].numpy()

    model, params = _flax_from(m, "relu", -1)
    got = np.asarray(
        model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_load_t5_encoder_from_dir(tmp_path):
    """load_t5_encoder consumes an HF-style dir (config.json + torch
    safetensors) without any transformers Flax classes."""
    import json

    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from f_lite_tpu.text.t5 import load_t5_encoder

    m = _torch_model("gated-gelu")
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    save_file(sd, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        **TINY, "feed_forward_proj": "gated-gelu",
        "model_type": "t5",
    }))

    model, params, cfg = load_t5_encoder(
        tmp_path, return_index=-1, dtype=jnp.float32
    )
    assert cfg.d_ff == 128 and cfg.is_gated

    rs = np.random.RandomState(3)
    ids = rs.randint(0, 96, (1, 8))
    mask = np.ones((1, 8), np.int64)
    with torch.no_grad():
        ref = m(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_load_t5_encoder_bin_dir_ignores_non_weight_bins(tmp_path):
    """A Trainer-style dir has pytorch_model.bin PLUS training_args.bin
    (a pickled non-tensor): the loader must only read pytorch_model*.bin
    — a bare *.bin glob crashed torch.load on the args pickle."""
    import json

    import jax.numpy as jnp

    from f_lite_tpu.text.t5 import load_t5_encoder

    m = _torch_model("relu")
    torch.save(m.state_dict(), tmp_path / "pytorch_model.bin")
    torch.save({"not": "weights"}, tmp_path / "training_args.bin")
    (tmp_path / "config.json").write_text(json.dumps({
        **TINY, "feed_forward_proj": "relu", "model_type": "t5",
    }))

    model, params, cfg = load_t5_encoder(
        tmp_path, return_index=-1, dtype=jnp.float32
    )
    rs = np.random.RandomState(5)
    ids = rs.randint(0, 96, (1, 6))
    mask = np.ones((1, 6), np.int64)
    with torch.no_grad():
        ref = m(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_load_t5_encoder_materializes_at_param_dtype(tmp_path):
    """Serving default (bf16) must land on device AT bf16: T5-XXL as fp32
    would be ~19 GB on a 16 GB chip. The np.float32 conversion
    intermediates are host-side only."""
    import json

    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from f_lite_tpu.text.t5 import load_t5_encoder

    m = _torch_model("gated-gelu")
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    save_file(sd, str(tmp_path / "model.safetensors"))
    (tmp_path / "config.json").write_text(json.dumps({
        **TINY, "feed_forward_proj": "gated-gelu", "model_type": "t5",
    }))

    _, params, cfg = load_t5_encoder(tmp_path, dtype=jnp.bfloat16)
    assert cfg.param_dtype == jnp.bfloat16
    dtypes = {a.dtype for a in jax.tree.leaves(params)}
    assert dtypes == {jnp.dtype(jnp.bfloat16)}, dtypes
