"""Test configuration (CPU forcing happens in the root conftest, which
re-execs pytest before jax can bind the remote TPU backend)."""

import jax

jax.config.update("jax_default_matmul_precision", "highest")
