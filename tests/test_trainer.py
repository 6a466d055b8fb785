"""Hermetic end-to-end trainer tests: dummy data backend, tiny model,
checkpoint/resume, LoRA mode, precompute -> precomputed training."""

import json

import numpy as np
import pandas as pd
import pytest

from f_lite_tpu.train.trainer import parse_args, train


def _write_parquet_dataset(tmp_path, n=24, res_uniform=True):
    rows = []
    for i in range(n):
        rows.append({
            "source_id": f"img{i}",
            "media_path": f"dummy://b/img_{i}.jpg",
            "captions": [f"caption {i}"],
            "width": 512 if res_uniform else (512 if i % 2 else 640),
            "height": 512 if res_uniform else (512 if i % 2 else 480),
            "media_source": "freepik",
            "media_type": "real",
        })
    d = tmp_path / "coll" / "x" / "y"
    d.mkdir(parents=True)
    pd.DataFrame(rows).to_parquet(d / "p.parquet")
    return tmp_path


def _base_argv(tmp_path, out):
    return [
        "--train_data_path", "coll",
        "--base_image_dir", str(tmp_path),
        "--base_url", "dummy://",
        "--resolution", "64",
        "--center_crop",
        "--model_width", "64",
        "--model_depth", "2",
        "--model_head_dim", "16",
        "--cross_attn_input_size", "32",
        "--train_batch_size", "4",
        "--learning_rate", "1e-3",
        "--output_dir", str(out),
        "--num_workers", "2",
        "--seed", "0",
        "--log_every", "2",
        "--sample_every", "0",
        "--eval_every", "0",
        "--report_to", "none",
        "--debug",
    ]


class TestTrainLoop:
    def test_steps_and_checkpoint(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        out = tmp_path / "out"
        args = parse_args(_base_argv(root, out) + [
            "--max_steps", "4", "--checkpointing_steps", "2",
        ])
        result = train(args)
        assert result["global_step"] == 4
        assert np.isfinite(result["train/loss"])
        ckpts = sorted(
            int(d.name) for d in (out / "checkpoints").iterdir()
            if d.name.isdigit()
        )
        assert 2 in ckpts and 4 in ckpts

    def test_resume(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        out = tmp_path / "out"
        args = parse_args(_base_argv(root, out) + [
            "--max_steps", "2", "--checkpointing_steps", "2",
        ])
        train(args)
        args2 = parse_args(_base_argv(root, out) + [
            "--max_steps", "4", "--checkpointing_steps", "2",
            "--resume_from_checkpoint", "latest",
        ])
        result = train(args2)
        assert result["global_step"] == 4

    def test_resume_mid_epoch_continues_that_epoch(self, tmp_path):
        """Preempted in epoch 1 of 3, the resumed run must (a) continue
        inside epoch 1 (not replay epoch 0's shuffle) and (b) iterate
        later epochs in FULL (the restored mid-epoch offset must not
        leak into them). 24 imgs / batch 4 = 6 batches per epoch;
        stopping at step 8 leaves 4 batches of epoch 1 + 6 of epoch 2
        = exactly 18 total steps."""
        root = _write_parquet_dataset(tmp_path)
        out = tmp_path / "out"
        args = parse_args(_base_argv(root, out) + [
            "--num_epochs", "3", "--max_steps", "8",
            "--checkpointing_steps", "8",
        ])
        train(args)
        ckpt_state = json.loads(
            (out / "checkpoints" / "8" / "sampler_state.json").read_text()
        )
        assert ckpt_state["epoch"] == 1  # saved mid-epoch-1
        args2 = parse_args(_base_argv(root, out) + [
            "--num_epochs", "3", "--max_steps", "100",
            "--checkpointing_steps", "100",
            "--resume_from_checkpoint", "latest",
        ])
        result = train(args2)
        assert result["global_step"] == 18

    def test_resume_pipeline_parallel(self, tmp_path):
        # Orbax save/restore round-trips the pipeline param layout
        # ((pp, units/stage, ...) leaves under <trunk>/pipe/stages) and
        # eval-time sampling shares the pipelined model
        root = _write_parquet_dataset(tmp_path)
        out = tmp_path / "out"
        pp_argv = [
            "--model_depth", "4", "--scan_layers", "--cross_attn_all",
            "--residual_v", "--train_batch_size", "8",
            "--dp", "1", "--fsdp", "2", "--tp", "2", "--pp", "2",
            "--pp_microbatches", "2",
        ]
        args = parse_args(_base_argv(root, out) + pp_argv + [
            "--max_steps", "2", "--checkpointing_steps", "2",
        ])
        train(args)
        args2 = parse_args(_base_argv(root, out) + pp_argv + [
            "--max_steps", "4", "--checkpointing_steps", "2",
            "--num_epochs", "2",
            "--resume_from_checkpoint", "latest",
            "--sample_every", "4", "--export_pipeline",
        ])
        result = train(args2)
        assert result["global_step"] == 4
        assert np.isfinite(result["train/loss"])
        assert (out / "samples" / "step_4.png").exists()
        # the exported artifact is folded back to the portable plain-scan
        # layout: no GPipe schedule baked into the servable pipeline
        cfg = json.loads(
            (out / "pipeline" / "dit" / "config.json").read_text()
        )
        assert cfg.get("pipeline_stages", 1) == 1
        from f_lite_tpu.pipeline import FLitePipeline

        pipe = FLitePipeline.from_pretrained(
            out / "pipeline", load_text_encoder=False
        )
        trunk = pipe.dit_params["params"]["blocks_all"]
        assert "pipe" not in trunk and "blk_0" in trunk

    def test_lora_training(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        out = tmp_path / "out"
        args = parse_args(_base_argv(root, out) + [
            "--max_steps", "2", "--checkpointing_steps", "100",
            "--use_lora", "--train_only_lora", "--lora_rank", "4",
            "--lora_alpha", "4",
        ])
        result = train(args)
        assert result["global_step"] == 2
        final = out / "checkpoints" / "2"
        assert (final / "lora_weights.safetensors").exists()

    def test_validation_and_sampling(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        out = tmp_path / "out"
        args = parse_args(_base_argv(root, out) + [
            "--max_steps", "2",
            "--checkpointing_steps", "100",
            "--val_data_path", "coll",
            "--eval_every", "2",
            "--sample_every", "2",
        ])
        result = train(args)
        assert "val/loss" in result
        assert (out / "samples" / "step_2.png").exists()

    def test_resolution_buckets(self, tmp_path):
        root = _write_parquet_dataset(tmp_path, res_uniform=False)
        out = tmp_path / "out"
        args = parse_args(_base_argv(root, out) + [
            "--max_steps", "3", "--checkpointing_steps", "100",
            "--use_resolution_buckets",
        ])
        # remove --center_crop to allow aspect buckets
        result = train(args)
        assert result["global_step"] == 3

    def test_export_pipeline(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        out = tmp_path / "out"
        args = parse_args(_base_argv(root, out) + [
            "--max_steps", "1", "--checkpointing_steps", "100",
            "--export_pipeline",
        ])
        train(args)
        from f_lite_tpu.pipeline import FLitePipeline
        from f_lite_tpu.text.encoder import ZeroTextEncoder

        pipe = FLitePipeline.from_pretrained(
            out / "pipeline", load_text_encoder=False
        )
        pipe.text_encoder = ZeroTextEncoder(embed_dim=32, seq_len=8)
        o = pipe(prompt="t", height=16, width=16, num_inference_steps=1,
                 seed=0)
        assert len(o.images) == 1

    def test_pixel_space(self, tmp_path):
        # --pixel_space: identity VAE, DiT trains directly on RGB pixels
        # (the trained-quality-fixture path; tools/make_shapes_dataset.py)
        root = _write_parquet_dataset(tmp_path)
        out = tmp_path / "out"
        args = parse_args(_base_argv(root, out) + [
            "--max_steps", "2", "--checkpointing_steps", "100",
            "--pixel_space", "--export_pipeline",
        ])
        result = train(args)
        assert result["global_step"] == 2
        cfg = json.loads(
            (out / "pipeline" / "dit" / "config.json").read_text()
        )
        assert cfg["in_channels"] == 3
        # no VAE to serialize in pixel space: consumers treat the missing
        # vae dir as identity decode
        assert not (out / "pipeline" / "vae").exists()
        from f_lite_tpu.pipeline import FLitePipeline

        pipe = FLitePipeline.from_pretrained(
            out / "pipeline", load_text_encoder=False
        )
        assert pipe.vae is None
        assert pipe.dit_model.config.in_channels == 3

    def test_grad_accumulation(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        out = tmp_path / "out"
        args = parse_args(_base_argv(root, out) + [
            "--max_steps", "4", "--checkpointing_steps", "100",
            "--gradient_accumulation_steps", "2",
        ])
        result = train(args)
        assert result["global_step"] == 4


class TestPrecomputedPath:
    def test_precompute_then_train(self, tmp_path):
        import sys
        sys.path.insert(0, "tools")
        from precompute_embeddings import main as precompute_main

        root = _write_parquet_dataset(tmp_path, n=16)
        cache = tmp_path / "cache"
        n = precompute_main([
            "--train_data_path", "coll",
            "--base_image_dir", str(root),
            "--resolution", "64",
            "--center_crop",
            "--cross_attn_input_size", "32",
            "--output_dir", str(cache),
            "--batch_size", "4",
        ])
        assert n == 16
        mapping = json.loads(
            (cache / "precomputed_mapping.json").read_text()
        )
        assert len(mapping["entries"]) == 16

        out = tmp_path / "out"
        args = parse_args(_base_argv(root, out) + [
            "--max_steps", "2", "--checkpointing_steps", "100",
            "--use_precomputed_data",
            "--precomputed_data_dir", str(cache),
            "--sample_every", "0",
        ])
        result = train(args)
        assert result["global_step"] == 2
        assert np.isfinite(result["train/loss"])


class TestEmaAndRampup:
    @pytest.mark.parametrize("decay", ["1.0", "1.5", "-0.1"])
    def test_ema_decay_out_of_range_raises(self, tmp_path, decay):
        """decay == 1 freezes the EMA at init (exports would silently be
        untrained); negatives are typos, not a disable request (0 is)."""
        root = _write_parquet_dataset(tmp_path)
        args = parse_args(_base_argv(root, tmp_path / "out") + [
            "--max_steps", "1", "--checkpointing_steps", "0",
            "--ema_decay", decay,
        ])
        with pytest.raises(ValueError, match="ema_decay"):
            train(args)

    def test_ema_saved_and_resumed(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        out = tmp_path / "out"
        args = parse_args(_base_argv(root, out) + [
            "--max_steps", "3", "--checkpointing_steps", "2",
            "--ema_decay", "0.5",
        ])
        result = train(args)
        assert np.isfinite(result["train/loss"])
        assert (out / "checkpoints" / "3" / "ema").exists()

        args2 = parse_args(_base_argv(root, out) + [
            "--max_steps", "5", "--checkpointing_steps", "5",
            "--ema_decay", "0.5",
            "--resume_from_checkpoint", "latest",
        ])
        result2 = train(args2)
        assert result2["global_step"] == 5
        assert (out / "checkpoints" / "5" / "ema").exists()

    def test_bs_rampup_runs(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        out = tmp_path / "out"
        args = parse_args(_base_argv(root, out) + [
            "--max_steps", "3", "--checkpointing_steps", "0",
            # batch 8: target = ceil((gs+1)*8/400)*4 = 4 < 8 for every
            # tested step, so the WEIGHTED path actually runs (at the
            # default batch 4 the multiple-of-4 rounding keeps target ==
            # batch and the rampup branch is silently never entered)
            "--train_batch_size", "8", "--bs_rampup", "100",
        ])
        result = train(args)
        assert np.isfinite(result["train/loss"])

    def test_ema_bf16_dtype(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        out = tmp_path / "out"
        args = parse_args(_base_argv(root, out) + [
            "--max_steps", "3", "--checkpointing_steps", "2",
            "--ema_decay", "0.5", "--ema_dtype", "bf16",
        ])
        result = train(args)
        assert np.isfinite(result["train/loss"])
        assert (out / "checkpoints" / "3" / "ema").exists()

        # resume restores the bf16 shadow without dtype clashes
        args2 = parse_args(_base_argv(root, out) + [
            "--max_steps", "4", "--checkpointing_steps", "4",
            "--ema_decay", "0.5", "--ema_dtype", "bf16",
            "--resume_from_checkpoint", "latest",
        ])
        result2 = train(args2)
        assert result2["global_step"] == 4

    def test_rampup_resume_reproduces(self, tmp_path):
        """Resume during bs_rampup replays the same 0/1 subset stream
        (the selection is keyed on (seed, global_step), not on global
        np.random state) -> straight-through and resumed runs converge to
        bit-identical losses."""
        root = _write_parquet_dataset(tmp_path)
        common = [
            # batch 8 so target (4) < batch and the weighted subset is
            # really drawn each step (see test_bs_rampup_runs); two
            # epochs because batch 8 leaves only 3 batches per epoch
            "--train_batch_size", "8", "--num_epochs", "2",
            "--bs_rampup", "100", "--seed", "7",
            # constant LR: decaying schedules are a function of max_steps
            # (reference semantics), which differs between the phases here
            "--lr_scheduler", "constant",
        ]
        out_a = tmp_path / "straight"
        res_a = train(parse_args(_base_argv(root, out_a) + common + [
            "--max_steps", "4", "--checkpointing_steps", "0",
        ]))

        out_b = tmp_path / "resumed"
        train(parse_args(_base_argv(root, out_b) + common + [
            "--max_steps", "2", "--checkpointing_steps", "2",
        ]))
        res_b = train(parse_args(_base_argv(root, out_b) + common + [
            "--max_steps", "4", "--checkpointing_steps", "4",
            "--resume_from_checkpoint", "latest",
        ]))
        assert res_a["global_step"] == res_b["global_step"] == 4
        assert res_a["train/loss"] == res_b["train/loss"]


class TestReferenceFlagParity:
    """The last reference train.py flags without counterparts
    (`train.py:71,138,140`): --processor_path, --lora_target_modules,
    --lora_dropout."""

    def test_lora_target_modules_selects_kernels(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        out = tmp_path / "out"
        res = train(parse_args(_base_argv(root, out) + [
            "--max_steps", "1", "--checkpointing_steps", "0",
            "--use_lora", "--lora_rank", "4",
            "--lora_target_modules", "proj",
        ]))
        assert res["global_step"] == 1
        # only `proj` kernels got factors: saved lora tree mentions no qkv
        import safetensors.numpy as stn

        ck = out / "checkpoints" / "1"
        files = list(ck.glob("lora_weights.safetensors"))
        assert files, list(ck.iterdir())
        keys = list(stn.load_file(files[0]).keys())
        assert keys and all("proj" in k for k in keys), keys[:5]
        assert not any("qkv" in k for k in keys)

    def test_lora_dropout_nonzero_rejected(self, tmp_path):
        root = _write_parquet_dataset(tmp_path)
        import pytest as _pytest

        with _pytest.raises(SystemExit, match="lora_dropout"):
            train(parse_args(
                _base_argv(root, tmp_path / "out2")
                + ["--use_lora", "--lora_dropout", "0.1"]
            ))

    def test_processor_path_flag_parses(self):
        a = parse_args([
            "--train_data_path", "x", "--processor_path", "/p",
            "--lora_dropout", "0.0",
        ])
        assert a.processor_path == "/p" and a.lora_dropout == 0.0


class TestMetricsLogger:
    def test_histogram_logged_to_tensorboard(self, tmp_path):
        """The per-decile occupancy histogram (`train.py:1040-1057`) must
        reach the backend with the reference's [bin_idx]*count raw-data
        construction."""
        import types

        from f_lite_tpu.train.trainer import MetricsLogger

        args = types.SimpleNamespace(
            report_to="tensorboard", output_dir=str(tmp_path),
            logging_dir="logs", project_name="t", run_name="t",
        )
        ml = MetricsLogger(args)
        if ml.tb is None:
            import pytest as _pytest

            _pytest.skip("tensorboardX unavailable")
        counts = [0, 3, 0, 0, 2, 0, 0, 0, 0, 1]
        ml.log_histogram("metrics/diffusion_loss_bin_counts", counts, 10)
        ml.log({"train/loss": 1.0}, 10)
        ml.tb.flush()
        event_files = list((tmp_path / "logs").glob("events.*"))
        assert event_files and event_files[0].stat().st_size > 0
        # all-zero counts are a no-op, not a crash
        ml.log_histogram("metrics/diffusion_loss_bin_counts",
                         [0] * 10, 11)

    def test_training_run_with_tensorboard_histogram(self, tmp_path):
        """End-to-end: a short hermetic run with --report_to tensorboard
        writes event files including the histogram path."""
        root = _write_parquet_dataset(tmp_path)
        out = tmp_path / "out_tb"
        argv = _base_argv(root, out) + ["--max_steps", "4"]
        argv[argv.index("--report_to") + 1] = "tensorboard"
        res = train(parse_args(argv))
        assert res["global_step"] == 4
        logs = out / "logs"
        assert list(logs.glob("events.*"))
