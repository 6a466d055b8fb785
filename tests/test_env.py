"""Minimal .env loader (utils/env.py) — reference dotenv parity."""

import os


def test_load_dotenv(tmp_path, monkeypatch):
    from f_lite_tpu.utils.env import load_dotenv

    f = tmp_path / ".env"
    f.write_text(
        "# comment\n"
        "S3KEY=abc123\n"
        'S3SECRET="s3cr3t with spaces"\n'
        "export REGION='us-east-1'\n"
        "ALREADY_SET=new\n"
        "malformed line\n"
    )
    monkeypatch.setenv("ALREADY_SET", "old")
    monkeypatch.delenv("S3KEY", raising=False)
    monkeypatch.delenv("S3SECRET", raising=False)
    monkeypatch.delenv("REGION", raising=False)
    parsed = load_dotenv(f)
    assert parsed["S3KEY"] == "abc123"
    assert os.environ["S3KEY"] == "abc123"
    assert os.environ["S3SECRET"] == "s3cr3t with spaces"
    assert os.environ["REGION"] == "us-east-1"
    assert os.environ["ALREADY_SET"] == "old"  # env wins


def test_load_dotenv_missing(tmp_path):
    from f_lite_tpu.utils.env import load_dotenv

    assert load_dotenv(tmp_path / "nope.env") == {}
