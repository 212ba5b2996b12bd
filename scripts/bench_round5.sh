#!/bin/bash
# Round-5 on-chip measurement sequence — ONE job at a time through the
# tunneled chip (relay wedges under concurrency). Each phase appends to
# outputs/bench_r5/<name>.log; rerun phases individually by commenting
# others out. Ordered cheapest/most-load-bearing first so a relay wedge
# mid-sequence still leaves the headline captured.
#
# Before every phase a bounded probe (90 s subprocess, small matmul + host
# fetch) gates entry with backoff — scripts without bench.py's built-in
# probe machinery would otherwise burn their whole timeout on a wedged
# relay.
set -x
cd "$(dirname "$0")/.."
mkdir -p outputs/bench_r5

probe() {
  for i in 1 2 3 4 5 6 7 8; do
    if timeout 90 python - <<'EOF'
import numpy as np, jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
print("probe ok", float(np.asarray((x @ x).sum())))
EOF
    then return 0; fi
    echo "probe failed (try $i), backing off $((i * 60))s"
    sleep $((i * 60))
  done
  return 1
}

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  probe || { echo "RELAY DEAD, skipping $name" | tee -a outputs/bench_r5/$name.log; return 1; }
  echo "=== $name $(date) ===" | tee -a outputs/bench_r5/$name.log
  timeout "$tmo" "$@" 2>&1 | tee -a outputs/bench_r5/$name.log
  echo "rc=${PIPESTATUS[0]} $(date)" | tee -a outputs/bench_r5/$name.log
}

# 1. delivered-peak calibration (cheap; anchors every ×-off-ideal claim)
run peak 600 python scripts/peak_probe.py
# 2. headline W8 decode, full kernel stack default-on — the BENCH_r05 metric
run decode_w8 1800 env BENCH_QUANT=w8 python bench.py
# 3. constrained-classic tax isolation (VERDICT r4 item 5)
run profile_serve_s8 1800 env PROF_STATES=8 python scripts/profile_serve.py
run profile_serve_s320 1800 env PROF_STATES=320 python scripts/profile_serve.py
# 4. serve brackets (classic / structured-classic / structured+spec) + SLA
run serve_classic 1800 env BENCH_MODE=serve python bench.py
run serve_struct_classic 1800 env BENCH_MODE=serve BENCH_SERVE_STRUCT=1 python bench.py
run serve_spec_struct 1800 env BENCH_MODE=serve BENCH_SERVE_SPEC=1 python bench.py
run serve_sla 2400 env BENCH_MODE=serve_sla python bench.py
# 5. QA pipeline throughput refresh
run qa 1800 env BENCH_MODE=qa python bench.py
# 6. latency modes refresh (decode tail rides the new matmul kernels)
run e2e 1800 env BENCH_MODE=e2e python bench.py
run spec 1800 env BENCH_MODE=spec python bench.py
# 7. full 7,231-sample QA soak (VERDICT r4 item 6) — longest last
run qa_soak 5400 python scripts/qa_soak.py
