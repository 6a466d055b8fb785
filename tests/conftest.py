"""Test configuration (CPU forcing happens in the root conftest, which
re-execs pytest before jax can bind the remote TPU backend)."""

import jax
import pytest

jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(autouse=True)
def _isolate_mesh_rules():
    """`use_mesh_rules` (parallel/mesh.py) is deliberately sticky for
    long-lived trainer/serving loops — but a test that engages it (e.g.
    serve's tp path) must not leak its mesh into later tests' traces."""
    from f_lite_tpu.parallel import mesh as mesh_mod

    token = mesh_mod._ACTIVE_MESH_RULES.set(None)
    yield
    mesh_mod._ACTIVE_MESH_RULES.reset(token)
