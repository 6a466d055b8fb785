"""Graceful preemption: SIGTERM mid-training -> checkpoint + exit 0.

TPU pods deliver SIGTERM with a grace window on eviction/maintenance;
the reference has no handling (`train.py` dies mid-step and loses
everything since the last cadence save). The trainer here finishes the
in-flight step, writes a final checkpoint, and exits cleanly so
`--resume_from_checkpoint latest` continues from the exact signal point.

Runs the real CLI in a subprocess (forced onto CPU like the rest of the
suite) and kills it from outside — the same delivery path a pod
scheduler uses.
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd


def _write_parquet_dataset(tmp_path, n=24):
    rows = []
    for i in range(n):
        rows.append({
            "source_id": f"img{i}",
            "media_path": f"dummy://b/img_{i}.jpg",
            "captions": [f"caption {i}"],
            "width": 512,
            "height": 512,
            "media_source": "freepik",
            "media_type": "real",
        })
    d = tmp_path / "coll" / "x" / "y"
    d.mkdir(parents=True)
    pd.DataFrame(rows).to_parquet(d / "p.parquet")
    return tmp_path


def test_sigterm_checkpoints_and_exits_zero(tmp_path):
    _write_parquet_dataset(tmp_path)
    out = tmp_path / "out"
    argv = [
        sys.executable, "-m", "f_lite_tpu.train.trainer",
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
        "--log_every", "1",
        "--sample_every", "0",
        "--eval_every", "0",
        "--report_to", "none",
        "--debug",
        # far more steps than the grace window allows: only the signal
        # can end this run
        "--max_steps", "100000",
        "--num_epochs", "100000",
        "--checkpointing_steps", "0",
    ]
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    log = tmp_path / "run.log"
    with open(log, "w") as lf:
        proc = subprocess.Popen(
            argv, stdout=lf, stderr=subprocess.STDOUT, env=env,
            cwd=str(Path(__file__).resolve().parent.parent),
        )
    try:
        # wait until at least one optimizer step has logged
        deadline = time.time() + 300
        while time.time() < deadline:
            if proc.poll() is not None:
                raise AssertionError(
                    "trainer exited before signal:\n" + log.read_text()
                )
            if " loss " in log.read_text():
                break
            time.sleep(1.0)
        else:
            raise AssertionError(
                "no training step within 300s:\n" + log.read_text()
            )
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    text = log.read_text()
    assert rc == 0, f"exit code {rc}:\n{text}"
    assert "will checkpoint and stop" in text
    ckpts = sorted(
        int(d.name) for d in (out / "checkpoints").iterdir()
        if d.is_dir() and d.name.isdigit()
    )
    assert ckpts and ckpts[-1] >= 1, f"no checkpoint saved: {ckpts}"
    final = out / "checkpoints" / str(ckpts[-1])
    assert (final / "state").exists()
    sampler_state = json.loads((final / "sampler_state.json").read_text())
    assert isinstance(sampler_state, dict) and sampler_state
