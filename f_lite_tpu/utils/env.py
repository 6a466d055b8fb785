"""Minimal .env loader (reference: python-dotenv at `train.py:46-47`,
`data.py:30` for S3KEY/S3SECRET credentials).

python-dotenv isn't a baked dependency here, and the needed subset is
trivial: KEY=VALUE lines, #-comments, optional single/double quotes,
existing environment wins.
"""

from __future__ import annotations

import os
from pathlib import Path


def load_dotenv(path: str | Path = ".env") -> dict[str, str]:
    """Load KEY=VALUE pairs from `path` into os.environ (no overwrite).

    Returns the parsed mapping (empty if the file doesn't exist).
    """
    path = Path(path)
    if not path.is_file():
        return {}
    parsed: dict[str, str] = {}
    for raw in path.read_text().splitlines():
        line = raw.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, value = line.partition("=")
        key = key.strip()
        if key.startswith("export "):
            key = key[len("export "):].strip()
        value = value.strip()
        if len(value) >= 2 and value[0] == value[-1] and value[0] in "\"'":
            value = value[1:-1]
        parsed[key] = value
        os.environ.setdefault(key, value)
    return parsed


def enable_compilation_cache(cache_dir: str | Path | None = None) -> str:
    """Turn on JAX's persistent compilation cache (VERDICT r2 item 6).

    Every process restart otherwise pays 17-84 s of XLA compilation before
    the first image (PERF.md compile matrix). Priority: explicit arg >
    `F_LITE_COMPILE_CACHE` env > `JAX_COMPILATION_CACHE_DIR` env >
    `~/.cache/f_lite_tpu/xla`. Set `F_LITE_COMPILE_CACHE=0` to disable.
    Safe to call multiple times; must run before the first compilation to
    help that compilation.
    """
    import jax

    env = os.environ.get("F_LITE_COMPILE_CACHE")
    if env == "0":
        return ""
    cache_dir = str(
        cache_dir
        or env
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or Path.home() / ".cache" / "f_lite_tpu" / "xla"
    )
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every compilation that takes >= 1 s (default threshold skips
    # small programs; serving/training programs are all far above this)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
