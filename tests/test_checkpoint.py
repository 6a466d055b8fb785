"""Checkpointer + LoRA tests: save/load roundtrip, latest, retention,
sharded restore, LoRA init/apply/train-only/save-load."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f_lite_tpu.models.dit import DiT, DiTConfig
from f_lite_tpu.parallel import create_mesh, infer_param_shardings, shard_params
from f_lite_tpu.train.checkpoint import Checkpointer, abstract_like
from f_lite_tpu.train.lora import (
    apply_lora,
    init_lora_params,
    load_lora_weights,
    init_lora_params as _ilp,
    save_lora_weights,
)
from f_lite_tpu.train.optim import build_optimizer
from f_lite_tpu.train.step import init_train_state

CFG = DiTConfig(
    in_channels=16, patch_size=2, hidden_size=64, depth=2, num_heads=4,
    mlp_ratio=2.0, cross_attn_input_size=32, use_pallas_attention=False,
)


def _state(seed=0):
    model = DiT(CFG)
    params = model.init_params(jax.random.key(seed), text_len=8,
                               image_size=16)
    opt = build_optimizer(learning_rate=1e-4, max_steps=10)
    return model, init_train_state(params, opt)


class TestCheckpointer:
    def test_save_load_roundtrip(self, tmp_path):
        model, state = _state()
        ck = Checkpointer(tmp_path)
        ck.save(100, state, sampler_state={"start_index": 42})
        restored = ck.load(100, abstract_like(state))
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert ck.load_sampler_state(100) == {"start_index": 42}

    def test_latest(self, tmp_path):
        model, state = _state()
        ck = Checkpointer(tmp_path)
        for s in (10, 500, 50):
            ck.save(s, state)
        assert ck.last_training_time == 500
        r = ck.load("latest", abstract_like(state))
        assert int(r.step) == int(state.step)

    def test_retention(self, tmp_path):
        model, state = _state()
        ck = Checkpointer(tmp_path, total_limit=2)
        for s in (1, 2, 3, 4):
            ck.save(s, state)
        assert ck.steps() == [3, 4]

    def test_sharded_restore(self, tmp_path):
        # save unsharded, restore directly onto an 8-device mesh
        model, state = _state()
        ck = Checkpointer(tmp_path)
        ck.save(7, state)

        mesh = create_mesh(dp=1, fsdp=8, tp=1)
        init_fn = lambda: model.init(
            jax.random.key(0),
            jnp.zeros((1, 16, 16, 16)), jnp.zeros((1, 8, 32)),
            jnp.ones((1, 8), jnp.bool_), jnp.zeros((1,)),
        )
        param_sh = infer_param_shardings(init_fn, mesh)
        opt = build_optimizer(learning_rate=1e-4, max_steps=10)
        target = init_train_state(shard_params(state.params, param_sh), opt)
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=x.sharding),
            target,
        )
        restored = ck.load(7, abstract)
        qkv = restored.params["params"]["blocks_0"]["self_attn"]["qkv"]["kernel"]
        assert len(qkv.sharding.device_set) == 8
        np.testing.assert_array_equal(
            np.asarray(qkv),
            np.asarray(
                state.params["params"]["blocks_0"]["self_attn"]["qkv"]["kernel"]
            ),
        )


class TestLoRA:
    def test_init_targets(self):
        model, state = _state()
        lora = init_lora_params(jax.random.key(1), state.params, rank=4)
        blk = lora["params"]["blocks_0"]
        assert "lora_a" in blk["self_attn"]["qkv"]
        assert "lora_a" in blk["self_attn"]["proj"]
        assert "lora_a" in blk["cross_attn"]["context_kv"]
        assert "mlp" not in blk  # not a target
        a = blk["self_attn"]["qkv"]["lora_a"]
        assert a.shape == (64, 4)
        np.testing.assert_array_equal(
            np.asarray(blk["self_attn"]["qkv"]["lora_b"]), 0.0
        )

    def test_apply_identity_at_init(self):
        # B=0 at init -> merged == base
        model, state = _state()
        lora = init_lora_params(jax.random.key(1), state.params, rank=4)
        merged = apply_lora(state.params, lora, alpha=4, rank=4)
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(merged)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_apply_changes_targets_only(self):
        model, state = _state()
        lora = init_lora_params(jax.random.key(1), state.params, rank=4)
        lora = jax.tree.map(lambda x: x + 0.1, lora)
        merged = apply_lora(state.params, lora, alpha=4, rank=4)
        base_qkv = state.params["params"]["blocks_0"]["self_attn"]["qkv"]["kernel"]
        merged_qkv = merged["params"]["blocks_0"]["self_attn"]["qkv"]["kernel"]
        assert not np.array_equal(np.asarray(base_qkv), np.asarray(merged_qkv))
        base_mlp = state.params["params"]["blocks_0"]["mlp"]["gate_proj"]["kernel"]
        merged_mlp = merged["params"]["blocks_0"]["mlp"]["gate_proj"]["kernel"]
        np.testing.assert_array_equal(
            np.asarray(base_mlp), np.asarray(merged_mlp)
        )

    def test_train_only_lora_grads(self):
        model, state = _state()
        lora = init_lora_params(jax.random.key(1), state.params, rank=4)
        x = jax.random.normal(jax.random.key(2), (2, 16, 16, 16))
        ctx = jax.random.normal(jax.random.key(3), (2, 8, 32))
        mask = jnp.ones((2, 8), jnp.bool_)
        t = jnp.full((2,), 0.5)

        def loss(lora_p):
            merged = apply_lora(state.params, lora_p, alpha=4, rank=4)
            return jnp.mean(model.apply(merged, x, ctx, mask, t) ** 2)

        g = jax.grad(loss)(lora)
        leaves = jax.tree.leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        ga = g["params"]["blocks_0"]["self_attn"]["qkv"]["lora_a"]
        # grad through A is zero at init only because B=0; grad of B nonzero
        gb = g["params"]["blocks_0"]["self_attn"]["qkv"]["lora_b"]
        assert float(jnp.abs(gb).max()) >= 0  # exists and finite

    def test_save_load(self, tmp_path):
        model, state = _state()
        lora = init_lora_params(jax.random.key(1), state.params, rank=4)
        lora = jax.tree.map(lambda x: x + 0.5, lora)
        save_lora_weights(lora, tmp_path)
        assert (tmp_path / "lora_weights.safetensors").exists()
        loaded = {"params": load_lora_weights(tmp_path)}
        for a, b in zip(jax.tree.leaves(lora), jax.tree.leaves(loaded)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestLoRAScanGuard:
    def test_stacked_kernels_raise(self):
        """LoRA over scan_layers params must raise, not silently train
        nothing (round-1 weak #7)."""
        from f_lite_tpu.models.dit import DiT, DiTConfig

        cfg = DiTConfig(
            in_channels=16, patch_size=2, hidden_size=64, depth=8,
            num_heads=4, mlp_ratio=2.0, cross_attn_input_size=32,
            scan_layers=True, use_pallas_attention=False,
        )
        params = DiT(cfg).init_params(
            jax.random.key(0), text_len=8, image_size=16
        )
        with pytest.raises(ValueError, match="scan_layers"):
            _ilp(jax.random.key(1), params, rank=4)

    def test_trainer_flag_combination_raises(self):
        from f_lite_tpu.train.trainer import parse_args, train

        args = parse_args([
            "--train_data_path", "x", "--output_dir", "/tmp/na",
            "--use_lora", "--scan_layers",
        ])
        with pytest.raises(SystemExit, match="scan_layers"):
            train(args)


class TestAsyncCheckpoint:
    def test_wait_false_overlaps_and_commits(self, tmp_path):
        """`wait=False` saves (trainer `--async_checkpoint`) return early;
        back-to-back saves self-drain; everything restores bit-exact."""
        model, state = _state()
        ck = Checkpointer(tmp_path, total_limit=2)
        for step in (10, 20, 30):  # immediate successor saves must drain
            ck.save(step, state, sampler_state={"start_index": step},
                    wait=False)
        ck.wait_until_finished()
        assert ck.steps() == [20, 30]  # retention applied across async saves
        restored = ck.load("latest", abstract_like(state))
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert ck.load_sampler_state(30) == {"start_index": 30}

    def test_uncommitted_dir_invisible_to_latest_and_prune(self, tmp_path):
        """A step dir without a committed `state` (in-flight async write
        or torn crash leftover) must not resolve as `latest`, must not
        count toward retention, and resume must fall back to the last
        good step."""
        model, state = _state()
        ck = Checkpointer(tmp_path, total_limit=1)
        ck.save(10, state, sampler_state={"start_index": 10})
        # simulate an in-flight/torn write: dir + sampler json, no state
        torn = ck.root / "20"
        torn.mkdir()
        (torn / "sampler_state.json").write_text("{}")
        (torn / "state.orbax-checkpoint-tmp-123").mkdir()
        assert ck.steps() == [10]
        assert ck.last_training_time == 10
        ck.prune()  # limit=1 must keep step 10, not count torn 20
        assert (ck.root / "10" / "state").exists()
        restored = ck.load("latest", abstract_like(state))
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_extras_written_before_commit_marker(self, tmp_path):
        """Extras (ema) must be written BEFORE the state tree: `steps()`
        treats `{step}/state` as the commit marker, so state-first left a
        window where a crash during the ema write produced a "committed"
        checkpoint with no EMA — silently reinitialized on resume. It
        also made `wait=False` drain the multi-GB state write
        synchronously inside the (small) ema save."""
        model, state = _state()
        ck = Checkpointer(tmp_path)
        order = []
        orig = ck._ckptr.save

        def recording_save(path, *a, **k):
            order.append(path.name)
            return orig(path, *a, **k)

        ck._ckptr.save = recording_save
        ema = jax.tree.map(np.asarray, state.params)
        ck.save(5, state, extra={"ema": ema})
        assert order == ["ema", "state"]
        # torn-crash simulation: extras present, no state -> uncommitted
        d = ck.root / "7"
        d.mkdir()
        (d / "ema").mkdir()
        assert ck.steps() == [5]
