"""Pipeline parallelism (models/dit.py PipelineTrunk) on the virtual
8-device CPU mesh: forward/grad parity against the plain scan trunk,
param layout round-trips, sharding placement, and the GPipe
collective-permute schedule. The reference has no pipeline parallelism
(FSDP only, `distributed.py:83-100`) — this is TPU-pod capability beyond
the reference's parallelism menu."""

import dataclasses
import re

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f_lite_tpu.models.dit import DiT, DiTConfig
from f_lite_tpu.parallel import (
    batch_sharding,
    create_mesh,
    infer_param_shardings,
    pipeline_to_scan_params,
    scan_to_pipeline_params,
    shard_params,
)
from f_lite_tpu.parallel.mesh import mesh_rules

# compile-heavy (virtual-mesh XLA compiles / live servers): run in the
# full tier only; `pytest -m "not slow"` is the fast development tier
pytestmark = pytest.mark.slow

V2_CFG = DiTConfig(
    in_channels=16, patch_size=2, hidden_size=64, depth=4, num_heads=4,
    mlp_ratio=2.0, cross_attn_input_size=32, cross_attn_all=True,
    adaln_mode="per_block", residual_v=True, scan_layers=True,
    use_pallas_attention=False,
)
V1_CFG = DiTConfig(
    in_channels=16, patch_size=2, hidden_size=64, depth=6, num_heads=4,
    mlp_ratio=2.0, cross_attn_input_size=32, cross_attn_first_n=2,
    cross_attn_period=2, residual_v=True, scan_layers=True,
    use_pallas_attention=False,
)


def _data(b=4):
    return (
        jax.random.normal(jax.random.key(1), (b, 8, 8, 16)),
        jax.random.normal(jax.random.key(2), (b, 8, 32)),
        jnp.ones((b, 8), jnp.bool_),
        jnp.full((b,), 0.5),
    )


def _plain(cfg):
    model = DiT(cfg)
    x, c, m, t = _data()
    params = flax.linen.meta.unbox(
        model.init(jax.random.key(0), x, c, m, t)
    )
    return model, params


class TestParity:
    @pytest.mark.parametrize("pp,nmb", [(2, 2), (2, 4), (4, 1)])
    def test_v2_forward_matches_plain_scan(self, pp, nmb):
        model, params = _plain(V2_CFG)
        x, c, m, t = _data()
        ref = model.apply(params, x, c, m, t)

        cfg = dataclasses.replace(
            V2_CFG, pipeline_stages=pp, pipeline_microbatches=nmb
        )
        pp_params = scan_to_pipeline_params(params, pp)
        mesh = create_mesh(dp=1, fsdp=1, tp=1, pp=pp,
                           devices=jax.devices()[:pp])
        with mesh_rules(mesh):
            got = jax.jit(DiT(cfg).apply)(pp_params, x, c, m, t)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_v1_forward_on_full_mesh(self):
        # v1 pattern: front cross blocks outside the pipe, periodic region
        # pipelined; all four mesh axes live
        model, params = _plain(V1_CFG)
        x, c, m, t = _data()
        ref = model.apply(params, x, c, m, t)

        cfg = dataclasses.replace(
            V1_CFG, pipeline_stages=2, pipeline_microbatches=2
        )
        pp_params = scan_to_pipeline_params(params, 2)
        mesh = create_mesh(dp=2, fsdp=1, tp=2, pp=2)
        with mesh_rules(mesh):
            got = jax.jit(DiT(cfg).apply)(
                shard_params(pp_params, infer_param_shardings(
                    lambda: DiT(cfg).init(jax.random.key(0), x, c, m, t),
                    mesh,
                )),
                jax.device_put(x, batch_sharding(mesh)), c, m, t,
            )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_grads_match_plain_scan(self):
        cfg_remat = dataclasses.replace(
            V2_CFG, gradient_checkpoint=True, gradient_checkpoint_from=0
        )
        model, params = _plain(cfg_remat)
        x, c, m, t = _data()
        tgt = jax.random.normal(jax.random.key(3), x.shape)

        def loss_plain(p):
            return jnp.mean((model.apply(p, x, c, m, t) - tgt) ** 2)

        g_ref = scan_to_pipeline_params(jax.grad(loss_plain)(params), 2)

        cfg = dataclasses.replace(
            cfg_remat, pipeline_stages=2, pipeline_microbatches=2
        )
        pmodel = DiT(cfg)

        def loss_pp(p):
            return jnp.mean((pmodel.apply(p, x, c, m, t) - tgt) ** 2)

        mesh = create_mesh(dp=1, fsdp=2, tp=2, pp=2)
        with mesh_rules(mesh):
            g_pp = jax.jit(jax.grad(loss_pp))(
                scan_to_pipeline_params(params, 2)
            )
        for path, a in flax.traverse_util.flatten_dict(g_pp).items():
            b = flax.traverse_util.flatten_dict(g_ref)[path]
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6,
                err_msg="/".join(path),
            )


class TestComposition:
    def test_pp_with_sequence_parallel(self):
        # PP (stage axis) composes with Megatron SP (seq-sharded residual
        # stream inside each stage) — both opt-in features, still exact
        from f_lite_tpu.parallel.mesh import SP_RULES

        model, params = _plain(V2_CFG)
        x, c, m, t = _data()
        ref = model.apply(params, x, c, m, t)

        cfg = dataclasses.replace(
            V2_CFG, pipeline_stages=2, pipeline_microbatches=2
        )
        mesh = create_mesh(dp=1, fsdp=1, tp=4, pp=2)
        with mesh_rules(mesh, SP_RULES):
            got = jax.jit(DiT(cfg).apply)(
                scan_to_pipeline_params(params, 2), x, c, m, t
            )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestLayout:
    def test_param_layout_round_trip(self):
        _, params = _plain(V1_CFG)
        pipe = scan_to_pipeline_params(params, 2)
        qkv = pipe["params"]["blocks_rest"]["pipe"]["stages"]["blocks"][
            "blk_0"]["self_attn"]["qkv"]["kernel"]
        assert qkv.shape[:2] == (2, 1)  # (pp, units/stage)
        # front blocks untouched
        assert "pipe" not in pipe["params"]["blocks_front"]
        back = pipeline_to_scan_params(pipe)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(a, b), back, params
        )

    def test_stage_axis_sharded_over_pp(self):
        cfg = dataclasses.replace(
            V2_CFG, pipeline_stages=2, pipeline_microbatches=2
        )
        model = DiT(cfg)
        x, c, m, t = _data()
        mesh = create_mesh(dp=1, fsdp=2, tp=2, pp=2)
        sh = infer_param_shardings(
            lambda: model.init(jax.random.key(0), x, c, m, t), mesh
        )
        qkv = sh["params"]["blocks_all"]["pipe"]["stages"]["blocks"][
            "blk_0"]["self_attn"]["qkv"]["kernel"]
        # (stage, layers, embed, 3, heads, head_dim)
        assert qkv.spec[0] == "pp"
        assert qkv.spec[2] == "fsdp"

    def test_from_pretrained_folds_pipeline_layout(self, tmp_path):
        # a hand-saved pipeline-layout checkpoint (trainer exports fold
        # this, but save_pretrained of a live pp model does not) loads as
        # the plain scan trunk — serving never runs the GPipe schedule
        from f_lite_tpu.models.vae import AutoencoderKL, VAEConfig
        from f_lite_tpu.pipeline import FLitePipeline

        model, params = _plain(V2_CFG)
        x, c, m, t = _data(2)
        ref = model.apply(params, x, c, m, t)

        pcfg = dataclasses.replace(
            V2_CFG, pipeline_stages=2, pipeline_microbatches=2
        )
        vae = AutoencoderKL(VAEConfig())
        vp = vae.init(jax.random.key(3), jnp.zeros((1, 16, 16, 3)),
                      jax.random.key(4), method=AutoencoderKL.encode)
        FLitePipeline(
            DiT(pcfg), scan_to_pipeline_params(params, 2), vae, vp, None
        ).save_pretrained(tmp_path / "ckpt")
        loaded = FLitePipeline.from_pretrained(
            tmp_path / "ckpt", dtype=jnp.float32, load_text_encoder=False
        )
        assert loaded.dit_model.config.pipeline_stages == 1
        out = loaded.dit_model.apply(loaded.dit_params, x, c, m, t)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    def test_rejects_unpipelineable_configs(self):
        x, c, m, t = _data()
        bad = dataclasses.replace(V2_CFG, scan_layers=False,
                                  pipeline_stages=2)
        with pytest.raises(ValueError, match="requires scan_layers"):
            DiT(bad).init(jax.random.key(0), x, c, m, t)
        bad = dataclasses.replace(V2_CFG, pipeline_stages=3)
        with pytest.raises(ValueError, match="divide"):
            DiT(bad).init(jax.random.key(0), x, c, m, t)

    def test_off_recipe_batch_degrades_microbatching(self):
        # batches not divisible by pipeline_microbatches (init traces,
        # eval-time sampling with a few prompts) fall back to the largest
        # dividing microbatch count — still exact
        model, params = _plain(V2_CFG)
        cfg = dataclasses.replace(
            V2_CFG, pipeline_stages=2, pipeline_microbatches=4
        )
        pp_params = scan_to_pipeline_params(params, 2)
        mesh = create_mesh(dp=1, fsdp=1, tp=1, pp=2,
                           devices=jax.devices()[:2])
        for b in (1, 3, 6):
            x, c, m, t = _data(b)
            ref = model.apply(params, x, c, m, t)
            with mesh_rules(mesh):
                got = jax.jit(DiT(cfg).apply)(pp_params, x, c, m, t)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestTrainingAudit:
    def test_pp_train_step_collective_audit_tiny(self, tmp_path):
        # tools/pp_compile_check.py: the full training step (loss ->
        # grad -> clip -> AdamW) on a (dp,pp,fsdp,tp) mesh must compile
        # with >=1 pipeline permute and only axis-aligned collective
        # groups (PP_CHECK.json is the 10B artifact of the same audit)
        import json
        import subprocess
        import sys
        from pathlib import Path

        out = tmp_path / "pp_check.json"
        root = Path(__file__).resolve().parent.parent
        r = subprocess.run(
            [sys.executable, str(root / "tools" / "pp_compile_check.py"),
             "--tiny", "--out", str(out)],
            capture_output=True, text=True, timeout=580,
        )
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
        rec = json.loads(out.read_text())
        assert rec["ok"] and rec["pipeline_permutes"] >= 1
        assert rec["bad_collectives"] == []


class TestSchedule:
    def test_stage_shift_is_collective_permute(self):
        cfg = dataclasses.replace(
            V2_CFG, pipeline_stages=2, pipeline_microbatches=2
        )
        model = DiT(cfg)
        x, c, m, t = _data()
        _, params = _plain(V2_CFG)
        pp_params = scan_to_pipeline_params(params, 2)
        mesh = create_mesh(dp=2, fsdp=1, tp=2, pp=2)
        with mesh_rules(mesh):
            hlo = (
                jax.jit(model.apply)
                .lower(pp_params, x, c, m, t)
                .compile()
                .as_text()
            )
        # the per-tick stage shift must lower to collective-permute(s)
        # (x and v_first may share one op — XLA permutes tuples)
        assert len(re.findall(r"= \S+ collective-permute\(", hlo)) >= 1
