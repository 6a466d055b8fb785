"""Subprocess driver for the 2-process multihost test (test_multihost.py).

Each of two processes owns 4 virtual CPU devices; together they form the
8-device (dp=2, fsdp=2, tp=2) mesh. Exercises the real multihost wiring:
`process_replica_info` -> rank-strided sampler slices, and
`put_global_batch` -> `jax.make_array_from_process_local_data` feeding one
sharded train step. Prints one JSON line {rank, indices, loss} for the
parent test to assert on (disjoint streams, identical finite loss).

Replaces the reference's only multi-node verification — running on the real
cluster (`slurm_pretrain.sbatch`) — with a hermetic CI-able harness
(SURVEY.md §4 consequence (d)).
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    port = sys.argv[1]
    pid = int(sys.argv[2])

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("JAX_PLATFORMS", None)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp

    from f_lite_tpu.data.samplers import StatefulDistributedSampler
    from f_lite_tpu.models.dit import DiT, DiTConfig
    from f_lite_tpu.parallel import (
        batch_sharding,
        create_mesh,
        infer_param_shardings,
        process_replica_info,
        put_global_batch,
        shard_params,
    )
    from f_lite_tpu.train.optim import build_optimizer
    from f_lite_tpu.train.step import init_train_state, make_train_step

    num_replicas, rank = process_replica_info()
    assert num_replicas == 2
    sampler = StatefulDistributedSampler(
        list(range(64)), batch_size=4, num_replicas=num_replicas,
        rank=rank, shuffle=True, seed=0,
    )
    indices = [int(i) for i in list(iter(sampler))[:16]]

    mesh = create_mesh(dp=2, fsdp=2, tp=2)

    cfg = DiTConfig(
        in_channels=16, patch_size=2, hidden_size=128, depth=2, num_heads=4,
        mlp_ratio=2.0, cross_attn_input_size=64,
        use_pallas_attention=False,
    )
    model = DiT(cfg)
    x0 = jnp.zeros((1, 16, 16, cfg.in_channels))
    c0 = jnp.zeros((1, 8, cfg.cross_attn_input_size))
    m0 = jnp.ones((1, 8), jnp.bool_)
    t0 = jnp.zeros((1,))
    init_fn = lambda: model.init(jax.random.key(0), x0, c0, m0, t0)

    import flax.linen as nn

    shardings = infer_param_shardings(init_fn, mesh)
    params = shard_params(nn.meta.unbox(init_fn()), shardings)

    opt = build_optimizer(learning_rate=1e-4, max_steps=10)
    state = init_train_state(params, opt)
    step = make_train_step(model.apply, opt, donate=False)

    bsh = batch_sharding(mesh)
    # per-process local slice; values depend on rank so a device_put-style
    # duplication bug would change the (global) loss between configurations
    import numpy as np

    rs = np.random.RandomState(100 + rank)
    local_b = 4  # global batch 8
    latents = put_global_batch(
        rs.randn(local_b, 16, 16, 16).astype(np.float32), bsh
    )
    ctx = put_global_batch(
        rs.randn(local_b, 8, 64).astype(np.float32), bsh
    )
    mask = put_global_batch(np.ones((local_b, 8), bool), bsh)

    state2, loss, metrics = step(state, jax.random.key(3), latents, ctx, mask)

    # rampup-style loss weight: a GLOBAL-length 0/1 vector, identical on
    # every host (trainer seeds it by (seed, step)), placed per-shard via
    # make_array_from_callback — put_global_batch's local-slice contract
    # does NOT apply to it. The weighted dot with a known global probe
    # detects any duplication/misordering across the process-spanning
    # batch axis.
    rs3 = np.random.RandomState(4242)  # same seed on both ranks
    wg = np.zeros(8, np.float32)
    wg[rs3.permutation(8)[:5]] = 1.0
    weight = jax.make_array_from_callback((8,), bsh, lambda idx: wg[idx])
    probe = jnp.arange(8, dtype=jnp.float32)
    wdot = float(jax.jit(jnp.vdot)(weight, probe))
    rampup_expected = float(np.dot(wg, np.arange(8, dtype=np.float32)))

    # second leg: pipeline parallelism ACROSS the process boundary —
    # mesh (dp=1, pp=2, fsdp=2, tp=2) puts stage 0 on process 0's four
    # devices and stage 1 on process 1's, so the GPipe stage shift is a
    # real cross-host collective-permute
    import dataclasses

    from f_lite_tpu.parallel.mesh import use_mesh_rules
    from f_lite_tpu.parallel.pipeline import scan_to_pipeline_params

    pp_mesh = create_mesh(dp=1, fsdp=2, tp=2, pp=2)
    use_mesh_rules(pp_mesh)
    pcfg = dataclasses.replace(
        cfg, cross_attn_all=True, scan_layers=True, residual_v=True,
        pipeline_stages=2, pipeline_microbatches=2,
    )
    pmodel = DiT(pcfg)
    pinit = lambda: pmodel.init(jax.random.key(0), x0, c0, m0, t0)
    psh = infer_param_shardings(pinit, pp_mesh)
    pparams = shard_params(nn.meta.unbox(pinit()), psh)
    pstate = init_train_state(pparams, opt)
    pstep = make_train_step(pmodel.apply, opt, donate=False)
    pbsh = batch_sharding(pp_mesh)
    # the batch axis spans only (dp, fsdp) — all local to each process —
    # so every host supplies the SAME full global batch (seeded
    # identically); put_global_batch infers this from the sharding
    rs2 = np.random.RandomState(7)
    gb = 8
    pl = put_global_batch(
        rs2.randn(gb, 16, 16, 16).astype(np.float32), pbsh
    )
    pc = put_global_batch(rs2.randn(gb, 8, 64).astype(np.float32), pbsh)
    pm = put_global_batch(np.ones((gb, 8), bool), pbsh)
    _, pp_loss, pp_metrics = pstep(pstate, jax.random.key(4), pl, pc, pm)

    out = {
        "rank": rank,
        "indices": indices,
        "loss": float(loss),
        "grad_norm": float(metrics["grad_norm"]),
        "step": int(state2.step),
        "pp_loss": float(pp_loss),
        "pp_grad_norm": float(pp_metrics["grad_norm"]),
        "rampup_wdot": wdot,
        "rampup_expected": rampup_expected,
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
