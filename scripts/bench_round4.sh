#!/bin/bash
# Round-4 on-chip measurement sequence — run ONE at a time through the
# tunneled chip (relay wedges under concurrency; memory notes). Each phase
# appends to outputs/bench_r4/<name>.log; rerun phases individually by
# commenting others out. Order: cheapest/most-load-bearing first so a relay
# wedge mid-sequence still leaves the headline captured.
set -x
mkdir -p outputs/bench_r4
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> env...
  local name=$1 tmo=$2; shift 2
  echo "=== $name $(date) ===" | tee -a outputs/bench_r4/$name.log
  timeout "$tmo" env "$@" python bench.py 2>&1 | tee -a outputs/bench_r4/$name.log
  echo "rc=$? $(date)" | tee -a outputs/bench_r4/$name.log
}

# 1. headline W8 decode, kernel ON (default) — the BENCH_r04 metric
run decode_w8_kernel 1800 BENCH_QUANT=w8
# 2. A/B: kernel OFF (XLA head-major einsum path)
run decode_w8_xla 1800 BENCH_QUANT=w8 VGGT_DECODE_KERNEL=0
# 3. W8A8 pair
run decode_w8a8_kernel 1800 BENCH_QUANT=w8a8
run decode_w8a8_xla 1800 BENCH_QUANT=w8a8 VGGT_DECODE_KERNEL=0
# 4. measured train cycle (QLoRA + 8-bit Adam + quantized towers)
run train 3600 BENCH_MODE=train
# 5. serve: classic, spec free-text (guard on), structured spec
run serve_classic 1800 BENCH_MODE=serve
run serve_spec_free 1800 BENCH_MODE=serve BENCH_SERVE_SPEC=1
run serve_spec_struct 1800 BENCH_MODE=serve BENCH_SERVE_SPEC=1 BENCH_SERVE_STRUCT=1
# 6. latency modes
run e2e 1800 BENCH_MODE=e2e
run spec 1800 BENCH_MODE=spec
run ring 1800 BENCH_MODE=ring
