"""Flax Qwen2 encoder vs transformers' torch Qwen2Model (random tiny
config): hidden-state parity incl. GQA, rope, padding masks."""

import numpy as np
import pytest
import torch

from f_lite_tpu.text.qwen2 import (
    Qwen2Config,
    Qwen2Encoder,
    convert_qwen2_state_dict,
)

transformers = pytest.importorskip("transformers")

TINY = dict(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=4,
    num_attention_heads=4,
    num_key_value_heads=2,
    rope_theta=1e6,
    rms_norm_eps=1e-6,
)


@pytest.fixture(scope="module")
def torch_model():
    from transformers import Qwen2Config as HFConfig
    from transformers.models.qwen2 import Qwen2Model

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        **TINY, max_position_embeddings=256, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    m = Qwen2Model(hf_cfg)
    m.eval()
    return m


def _flax_from_torch(torch_model, return_index):
    import jax

    cfg = Qwen2Config(**TINY)
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = jax.tree.map(
        __import__("jax.numpy", fromlist=["asarray"]).asarray,
        convert_qwen2_state_dict(sd, cfg),
    )
    return Qwen2Encoder(cfg, return_index=return_index), params


@pytest.mark.parametrize("return_index", [-1, -3])
def test_hidden_state_parity(torch_model, return_index):
    import jax.numpy as jnp

    rs = np.random.RandomState(0)
    ids = rs.randint(0, 128, (2, 12))
    mask = np.ones((2, 12), np.int32)

    with torch.no_grad():
        out = torch_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            output_hidden_states=True,
        )
    ref = out.hidden_states[return_index].numpy()

    model, params = _flax_from_torch(torch_model, return_index)
    got = np.asarray(
        model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_padding_parity(torch_model):
    import jax.numpy as jnp

    rs = np.random.RandomState(1)
    ids = rs.randint(0, 128, (2, 16))
    mask = np.zeros((2, 16), np.int32)
    mask[0, :16] = 1
    mask[1, :9] = 1

    with torch.no_grad():
        out = torch_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            output_hidden_states=True,
        )
    ref = out.hidden_states[-2].numpy()

    model, params = _flax_from_torch(torch_model, -2)
    got = np.asarray(
        model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    )
    # compare only real (unpadded) positions
    np.testing.assert_allclose(got[0], ref[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got[1, :9], ref[1, :9], atol=2e-4, rtol=1e-3)


def test_vl_prefix_conversion(torch_model):
    cfg = Qwen2Config(**TINY)
    sd = {
        f"model.language_model.{k}": v.detach().numpy()
        for k, v in torch_model.state_dict().items()
    }
    params = convert_qwen2_state_dict(sd, cfg)
    assert "layers_0" in params["params"]
    assert params["params"]["layers_0"]["q_proj"]["kernel"].shape == (64, 64)


class TestQwen25VLOracle:
    """Parity against the ACTUAL Qwen2.5-VL language tower class.

    The HEAD reference conditions on Qwen2.5-VL
    (`/root/reference/f_lite/pipeline.py:14,153-154`), whose text model
    uses multimodal rope (mrope). The Flax tower's correctness argument —
    "for text-only inputs the 3 mrope position streams are equal, so mrope
    collapses to 1D rope" (text/qwen2.py docstring) — is tested here
    against a tiny random `Qwen2_5_VLTextModel` instead of being assumed.
    """

    @pytest.fixture(scope="class")
    def vl_model(self):
        from transformers.models.qwen2_5_vl import Qwen2_5_VLTextConfig
        from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
            Qwen2_5_VLTextModel,
        )

        torch.manual_seed(1)
        cfg = Qwen2_5_VLTextConfig(
            **TINY, max_position_embeddings=256, tie_word_embeddings=False,
            # head_dim 16 -> half 8; sections sum to 8 like the real
            # [16, 24, 24] sums to half of head_dim 128
            rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
            attn_implementation="eager",
        )
        m = Qwen2_5_VLTextModel(cfg)
        m.eval()
        return m

    @pytest.mark.parametrize("return_index", [-1, -3])
    def test_text_only_hidden_state_parity(self, vl_model, return_index):
        import jax
        import jax.numpy as jnp

        rs = np.random.RandomState(7)
        ids = rs.randint(0, 128, (2, 12))
        mask = np.ones((2, 12), np.int32)

        with torch.no_grad():
            out = vl_model(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask),
                output_hidden_states=True,
            )
        ref = out.hidden_states[return_index].numpy()

        cfg = Qwen2Config(**TINY)
        sd = {k: v.detach().numpy() for k, v in vl_model.state_dict().items()}
        params = jax.tree.map(
            jnp.asarray, convert_qwen2_state_dict(sd, cfg)
        )
        model = Qwen2Encoder(cfg, return_index=return_index)
        got = np.asarray(
            model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
        )
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)

    def test_right_padding_parity(self, vl_model):
        import jax
        import jax.numpy as jnp

        rs = np.random.RandomState(8)
        ids = rs.randint(0, 128, (2, 16))
        mask = np.zeros((2, 16), np.int32)
        mask[0, :16] = 1
        mask[1, :11] = 1

        with torch.no_grad():
            out = vl_model(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask),
                output_hidden_states=True,
            )
        ref = out.hidden_states[-2].numpy()

        cfg = Qwen2Config(**TINY)
        sd = {k: v.detach().numpy() for k, v in vl_model.state_dict().items()}
        params = jax.tree.map(
            jnp.asarray, convert_qwen2_state_dict(sd, cfg)
        )
        model = Qwen2Encoder(cfg, return_index=-2)
        got = np.asarray(
            model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
        )
        np.testing.assert_allclose(got[0], ref[0], atol=2e-4, rtol=1e-3)
        np.testing.assert_allclose(
            got[1, :11], ref[1, :11], atol=2e-4, rtol=1e-3
        )
