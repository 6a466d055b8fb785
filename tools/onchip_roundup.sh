#!/usr/bin/env bash
# One-shot on-chip validation + measurement after a tunnel outage:
#   1. kernel correctness smoke on the REAL Mosaic compile path
#      (CI runs interpret-mode on CPU only)
#   2. flash fwd+bwd timing at the training shape (FA2 backward)
#   3. small backward block sweep (FA2 changed VMEM pressure)
#   4. the headline bench (one JSON line)
# Usage: bash tools/onchip_roundup.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/onchip}
mkdir -p "$LOG"

echo "== 1. on-chip kernel smoke =="
timeout 1200 python - <<'EOF' 2>&1 | tee "$LOG/smoke.log" | tail -5
import jax, jax.numpy as jnp
from f_lite_tpu.ops.pallas.flash_attention import flash_attention
from f_lite_tpu.ops.attention import attention_xla

b, h, l, d = 2, 10, 4112, 256
ks = jax.random.split(jax.random.key(0), 3)
q = jax.random.normal(ks[0], (b, h, l, d), jnp.bfloat16)
k = jax.random.normal(ks[1], (b, h, l, d), jnp.bfloat16)
v = jax.random.normal(ks[2], (b, h, l, d), jnp.bfloat16)

@jax.jit
def both(q, k, v):
    def lp(q, k, v):
        return jnp.sum(flash_attention(q, k, v).astype(jnp.float32) ** 2)
    def lx(q, k, v):
        qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
        return jnp.sum(attention_xla(qf, kf, vf) ** 2)
    gp = jax.grad(lp, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lx, argnums=(0, 1, 2))(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    return [jnp.max(jnp.abs(a.astype(jnp.float32) - b_)) for a, b_ in zip(gp, gx)]

for name, val in zip("dq dk dv".split(), both(q, k, v)):
    print(f"on-chip bwd {name} max|diff| vs fp32 dense: {float(val):.4f}")
EOF

echo "== 2. flash fwd+bwd timing (FA2) =="
timeout 1200 python tools/bench_flash_bwd.py 2>&1 | tee "$LOG/bwd.log" | tail -2

echo "== 3. backward block sweep =="
for cfg in "512 256" "512 512" "1024 256" "1024 512" "2048 256"; do
  set -- $cfg
  echo "-- bwd blocks ($1, $2)"
  timeout 1200 python tools/bench_flash_bwd.py --bwd_bq "$1" --bwd_bk "$2" \
    2>&1 | tail -1
done 2>&1 | tee "$LOG/sweep.log"

echo "== 4. headline bench =="
timeout 3600 python bench.py 2>&1 | tee "$LOG/bench.log" | tail -2

echo "== 5. (optional) sampler order audit — refresh SAMPLER_AB2.json =="
echo "   run manually: python tools/sampler_order_audit.py (~10 min)"
