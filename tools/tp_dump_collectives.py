"""Dump collective ops (with op names) from the tiny TP denoise HLO.

Debug companion to tp_compile_check.py.
"""

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

tp = int(os.environ.get("TP", "8"))
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={tp}"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import flax.linen as nn  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from f_lite_tpu.models.dit import DiT, DiTConfig  # noqa: E402
from f_lite_tpu.parallel import (  # noqa: E402
    batch_sharding,
    create_mesh,
    infer_param_shardings,
)
from f_lite_tpu.parallel.mesh import mesh_rules  # noqa: E402
from f_lite_tpu.sampling.euler import (  # noqa: E402
    DenoiseSettings,
    denoise,
)

mesh = create_mesh(dp=1, fsdp=1, tp=tp)
dtype = jnp.bfloat16
cfg = DiTConfig(
    in_channels=16, patch_size=2, hidden_size=256, depth=4, num_heads=8,
    mlp_ratio=2.0, cross_attn_input_size=64, scan_layers=True,
    dtype=dtype, param_dtype=dtype, use_pallas_attention=False,
    residual_v=os.environ.get("RESIDUAL_V") == "1",
)
lat, text_len = 32, 32
model = DiT(cfg)


def boxed_init():
    return model.init(
        jax.random.key(0),
        jnp.zeros((1, lat, lat, cfg.in_channels), dtype),
        jnp.zeros((1, text_len, cfg.cross_attn_input_size), dtype),
        jnp.ones((1, text_len), jnp.bool_),
        jnp.zeros((1,), dtype),
    )


shardings = infer_param_shardings(boxed_init, mesh)
abstract = nn.meta.unbox(jax.eval_shape(boxed_init))
ps = jax.tree.map(
    lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
    abstract, shardings,
)
bsh = batch_sharding(mesh)
a = (
    ps,
    jax.ShapeDtypeStruct((1, lat, lat, 16), dtype, sharding=bsh),
    jax.ShapeDtypeStruct((1, text_len, 64), dtype, sharding=bsh),
    jax.ShapeDtypeStruct((1, text_len, 64), dtype, sharding=bsh),
    jax.ShapeDtypeStruct((1, text_len), jnp.bool_, sharding=bsh),
)
settings = DenoiseSettings(num_inference_steps=4, guidance_scale=6.0)


def fn(p, z, pos, neg, m):
    return denoise(model.apply, p, z, pos, neg, m, settings)


with mesh_rules(mesh):
    c = jax.jit(fn).lower(*a).compile()
for line in c.as_text().splitlines():
    if re.search(
        r"= \S+ (all-gather|all-reduce|reduce-scatter|collective-permute"
        r"|all-to-all)\(", line
    ):
        line = line.strip()
        m = re.search(r'metadata=\{op_name="([^"]*)"', line)
        head = re.sub(r"\{\d[^}]*\}", "", line.split(" metadata")[0])
        print(head[:130], "||", (m.group(1)[-70:] if m else ""))
