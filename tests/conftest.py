"""Test configuration (CPU forcing happens in the root conftest, which
re-execs pytest before jax can bind the remote TPU backend)."""

import os
from pathlib import Path

import jax
import pytest

jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache across test processes (VERDICT r4 #7:
# the fast tier is dominated by recompiling the same virtual-mesh
# programs every run). Warm-cache reruns load AOT results instead of
# recompiling (measured 2.7x on the compile-heavy path). XLA logs a
# noisy machine-feature-mismatch line per load (hash includes tuning
# flags like +prefer-no-scatter); it still executes the same-host code.
# Set F_LITE_TEST_COMPILE_CACHE=0 to disable.
if os.environ.get("F_LITE_TEST_COMPILE_CACHE", "1") != "0":
    _cache = (os.environ.get("F_LITE_TEST_COMPILE_CACHE_DIR")
              or str(Path.home() / ".cache" / "f_lite_tpu" / "xla_tests"))
    Path(_cache).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(autouse=True)
def _isolate_mesh_rules():
    """`use_mesh_rules` (parallel/mesh.py) is deliberately sticky for
    long-lived trainer/serving loops — but a test that engages it (e.g.
    serve's tp path) must not leak its mesh into later tests' traces."""
    from f_lite_tpu.parallel import mesh as mesh_mod

    token = mesh_mod._ACTIVE_MESH_RULES.set(None)
    yield
    mesh_mod._ACTIVE_MESH_RULES.reset(token)
