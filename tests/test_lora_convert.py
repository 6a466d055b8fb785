"""Bidirectional LoRA conversion vs the reference's peft format.

Oracle is the real thing: a reference DiT (loaded from
/root/reference/f_lite/model.py through the torch stubs) with a peft
adapter injected exactly like the reference does it
(`train.py:753-763` / `pt.py:108-136` — diffusers' PeftAdapterMixin
delegates to `peft.inject_adapter_in_model`). The exported
`lora_weights.pt` must load through `set_peft_model_state_dict` and make
the torch forward match this framework's `apply_lora` forward; a
torch-trained adapter saved with `get_peft_model_state_dict`
(`model.py:487-490`) must load back through `load_lora_weights` and
match the other way.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from f_lite_tpu.convert import (
    convert_dit_state_dict,
    lora_from_peft_state_dict,
    lora_to_peft_state_dict,
)
from f_lite_tpu.models.dit import DiT, DiTConfig
from f_lite_tpu.train.lora import apply_lora, load_lora_weights
from ref_stubs import REFERENCE_DIR, load_reference_model

peft = pytest.importorskip("peft")

pytestmark = pytest.mark.skipif(
    not REFERENCE_DIR.exists(), reason="reference checkout not mounted"
)

# depth 10: blocks 0..7 cross (idx<8), 8 cross (8%4==0), 9 self-only —
# the LoRA tree sees both attention layouts (test_reference_parity BASE)
KW = dict(
    in_channels=16, patch_size=2, hidden_size=64, depth=10, num_heads=4,
    mlp_ratio=2.0, cross_attn_input_size=48, train_bias_and_rms=True,
)
RANK, ALPHA = 4, 8.0
TARGETS = ["qkv", "q", "context_kv", "proj"]


def _rand_lora_tree(seed, depth, hidden, heads, head_dim):
    """Framework-layout factor tree with gaussian A AND B (nonzero so a
    round-trip/forward mismatch cannot hide behind zero deltas)."""
    rs = np.random.RandomState(seed)
    d = heads * head_dim
    out_flat = {"qkv": 3 * d, "q": d, "context_kv": 2 * d, "proj": hidden}
    # context_kv consumes the POST-context_proj stream (hidden wide) in
    # both implementations — not the raw cross_attn_input_size context
    in_dim = {"qkv": hidden, "q": hidden, "context_kv": hidden, "proj": d}
    tree = {}
    for i in range(depth):
        attns = {"self_attn": ("qkv", "proj")}
        if i < 8 or i % 4 == 0:
            attns["cross_attn"] = ("q", "context_kv", "proj")
        blk = {}
        for attn, targets in attns.items():
            blk[attn] = {
                t: {
                    "lora_a": rs.randn(in_dim[t], RANK).astype(
                        np.float32) * 0.1,
                    "lora_b": rs.randn(RANK, out_flat[t]).astype(
                        np.float32) * 0.1,
                }
                for t in targets
            }
        tree[f"blocks_{i}"] = blk
    return tree


def _adapted_ref_model(seed):
    ref_mod = load_reference_model("model")
    model = ref_mod.DiT(**KW, use_rope=True)
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    model.eval()
    base_sd = {k: v.clone() for k, v in model.state_dict().items()}
    cfg = peft.LoraConfig(
        r=RANK, lora_alpha=ALPHA, target_modules=TARGETS, bias="none",
        init_lora_weights="gaussian",
    )
    peft.inject_adapter_in_model(cfg, model)
    model.peft_config = {"default": cfg}  # get_peft_model_state_dict needs it
    return model, base_sd


def _inputs(seed, b=2, hw=16, s=8):
    rs = np.random.RandomState(seed)
    return (
        rs.randn(b, KW["in_channels"], hw, hw).astype(np.float32),
        rs.randn(b, s, KW["cross_attn_input_size"]).astype(np.float32),
        np.ones((b, s), np.float32),
        rs.rand(b).astype(np.float32),
    )


def _jax_forward_with_lora(base_sd, lora_tree, x, ctx, mask, t):
    jcfg = DiTConfig(**KW, use_pallas_attention=False)
    params = convert_dit_state_dict(
        {k: v.numpy() for k, v in base_sd.items()}, jcfg
    )
    merged = apply_lora(
        jax.tree.map(jnp.asarray, params),
        jax.tree.map(jnp.asarray, lora_tree),
        alpha=ALPHA, rank=RANK,
    )
    out = DiT(jcfg).apply(
        merged,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(ctx),
        jnp.asarray(mask.astype(bool)),
        jnp.asarray(t),
    )
    return np.asarray(out).transpose(0, 3, 1, 2)


def _assert_close(got, ref):
    assert np.isfinite(ref).all()
    mse = float(((got - ref) ** 2).mean())
    max_err = float(np.abs(got - ref).max())
    assert mse < 1e-6, (mse, max_err)
    assert max_err < 1e-3, (mse, max_err)


class TestRoundTrip:
    def test_bitwise_both_directions(self):
        tree = _rand_lora_tree(0, KW["depth"], KW["hidden_size"], 4, 16)
        sd = lora_to_peft_state_dict(tree)
        back = lora_from_peft_state_dict(sd)
        flat_a = jax.tree_util.tree_leaves_with_path(tree)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
        assert len(flat_a) == len(flat_b)
        for path, leaf in flat_a:
            np.testing.assert_array_equal(np.asarray(leaf), flat_b[path])
        # and peft-side: sd -> tree -> sd is the identity too
        sd2 = lora_to_peft_state_dict(back)
        assert set(sd) == set(sd2)
        for k in sd:
            np.testing.assert_array_equal(sd[k], sd2[k])

    def test_params_wrapper_accepted(self):
        tree = _rand_lora_tree(1, 1, KW["hidden_size"], 4, 16)
        assert set(lora_to_peft_state_dict({"params": tree})) == set(
            lora_to_peft_state_dict(tree)
        )

    def test_peft_model_prefix_stripped(self):
        tree = _rand_lora_tree(2, 1, KW["hidden_size"], 4, 16)
        sd = lora_to_peft_state_dict(tree)
        prefixed = {f"base_model.model.{k}": v for k, v in sd.items()}
        back = lora_from_peft_state_dict(prefixed)
        np.testing.assert_array_equal(
            back["blocks_0"]["self_attn"]["qkv"]["lora_a"],
            tree["blocks_0"]["self_attn"]["qkv"]["lora_a"],
        )

    def test_unknown_key_raises(self):
        with pytest.raises(ValueError, match="unrecognized"):
            lora_from_peft_state_dict(
                {"blocks.0.mlp.gate_proj.lora_A.weight": np.zeros((4, 8))}
            )
        with pytest.raises(ValueError, match="unexpected"):
            lora_to_peft_state_dict(
                {"final_proj": {"lora_a": np.zeros((8, 4)),
                                "lora_b": np.zeros((4, 8))}}
            )

    def test_rank_mismatch_raises(self):
        with pytest.raises(ValueError, match="rank mismatch"):
            lora_from_peft_state_dict({
                "blocks.0.self_attn.qkv.lora_A.weight": np.zeros((4, 8)),
                "blocks.0.self_attn.qkv.lora_B.weight": np.zeros((16, 3)),
            })

    def test_mixed_rank_adapter_rejected(self):
        # peft rank_pattern adapters carry per-module ranks; the merge
        # applies one alpha/rank to every target, so ingest must refuse
        with pytest.raises(ValueError, match="mixed-rank"):
            lora_from_peft_state_dict({
                "blocks.0.self_attn.qkv.lora_A.weight": np.zeros((4, 8)),
                "blocks.0.self_attn.qkv.lora_B.weight": np.zeros((24, 4)),
                "blocks.0.self_attn.proj.lora_A.weight": np.zeros((8, 8)),
                "blocks.0.self_attn.proj.lora_B.weight": np.zeros((8, 8)),
            })

    def test_missing_b_factor_raises(self):
        with pytest.raises(ValueError, match="lora_a and lora_b"):
            lora_to_peft_state_dict(
                {"blocks_0": {"self_attn": {"qkv": {
                    "lora_a": np.zeros((8, 4))
                }}}}
            )

    def test_empty_lora_dir_message(self, tmp_path):
        from f_lite_tpu.train.lora import load_lora_weights

        with pytest.raises(FileNotFoundError, match="no LoRA weights"):
            load_lora_weights(tmp_path)


class TestPeftOracle:
    def test_export_loads_into_reference_adapter(self):
        """exported lora_weights.pt -> set_peft_model_state_dict -> the
        torch forward must equal apply_lora's merged jax forward."""
        model, base_sd = _adapted_ref_model(seed=10)
        tree = _rand_lora_tree(11, KW["depth"], KW["hidden_size"], 4, 16)
        sd = {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in lora_to_peft_state_dict(tree).items()
        }
        result = peft.set_peft_model_state_dict(model, sd)
        assert not result.unexpected_keys
        x, ctx, mask, t = _inputs(12)
        with torch.no_grad():
            ref = model(
                torch.from_numpy(x), torch.from_numpy(ctx),
                torch.from_numpy(mask), torch.from_numpy(t),
            ).numpy()
        got = _jax_forward_with_lora(base_sd, tree, x, ctx, mask, t)
        _assert_close(got, ref)

    def test_ingest_reference_trained_adapter(self, tmp_path):
        """a torch-side adapter saved the reference way (model.py:487-490)
        loads through load_lora_weights and reproduces the torch
        forward after apply_lora."""
        model, base_sd = _adapted_ref_model(seed=20)
        g = torch.Generator().manual_seed(21)
        with torch.no_grad():
            for name, p in model.named_parameters():
                if "lora" in name:  # gaussian A and B, both nonzero
                    p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        sd = peft.get_peft_model_state_dict(model)
        torch.save(sd, tmp_path / "lora_weights.pt")

        tree = load_lora_weights(tmp_path)  # dir resolves the .pt
        x, ctx, mask, t = _inputs(22)
        with torch.no_grad():
            ref = model(
                torch.from_numpy(x), torch.from_numpy(ctx),
                torch.from_numpy(mask), torch.from_numpy(t),
            ).numpy()
        got = _jax_forward_with_lora(base_sd, tree, x, ctx, mask, t)
        _assert_close(got, ref)


class TestCLI:
    def test_export_lora_cli(self, tmp_path):
        import sys
        sys.path.insert(0, "tools")
        from convert_checkpoint import main
        from f_lite_tpu.train.lora import save_lora_weights

        tree = _rand_lora_tree(30, 2, KW["hidden_size"], 4, 16)
        src = tmp_path / "ckpt"
        src.mkdir()
        save_lora_weights(
            jax.tree.map(jnp.asarray, tree), src
        )
        out = tmp_path / "export"
        main(["--export_lora", str(src), "--output_dir", str(out)])
        sd = torch.load(
            out / "lora_weights.pt", map_location="cpu", weights_only=True
        )
        want = lora_to_peft_state_dict(tree)
        assert set(sd) == set(want)
        for k, v in want.items():
            np.testing.assert_array_equal(sd[k].numpy(), v)
