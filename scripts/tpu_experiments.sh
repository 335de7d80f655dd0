#!/bin/bash
# Sequential TPU experiment matrix: each attempt is an isolated subprocess
# under a hard timeout (CLAUDE.md: the tunneled backend can wedge a process;
# never retry in-process).  Appends one line per attempt to the log.
#
#   bash scripts/tpu_experiments.sh [logfile]
#
# One process at a time on the tunnel -- do not run concurrently with any
# other TPU user.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_experiments.log}"
ATTEMPT_TIMEOUT="${OCTPROZ_EXP_TIMEOUT:-900}"

probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; print(jnp.ones(4).sum())" >/dev/null 2>&1
}

run_one() {  # name, env assignments..., spec
  local name="$1"; shift
  echo "=== $name $(date +%H:%M:%S)" | tee -a "$LOG"
  if ! probe; then
    echo "$name: tunnel dead, skipping" | tee -a "$LOG"
    return 1
  fi
  local out
  out=$(env "$@" OCTPROZ_BENCH_ATTEMPT_TIMEOUT="$ATTEMPT_TIMEOUT" \
        timeout "$ATTEMPT_TIMEOUT" python bench.py 2>/tmp/exp_stderr.log)
  local rc=$?
  if [ $rc -eq 0 ] && [ -n "$out" ]; then
    echo "$name $out" | tee -a "$LOG"
  else
    echo "$name FAILED rc=$rc $(tail -1 /tmp/exp_stderr.log | cut -c1-160)" \
      | tee -a "$LOG"
  fi
  sleep 5
}

echo "### experiment run $(date)" | tee -a "$LOG"

# 0. refresh the TPU pallas smoke record (gate was relaxed after the last run)
if probe; then
  timeout 900 python scripts/tpu_smoke.py --out TPU_SMOKE.json 2>/dev/null \
    | tee -a "$LOG"
else
  echo "smoke: tunnel dead" | tee -a "$LOG"
fi
sleep 5

# 1. current best, re-measured with pipelined chunk sync
run_one "base16"    OCTPROZ_BENCH_ATTEMPT=pallas:16:bfloat16
# 2. larger chunks: fewer host round-trips per buffer
run_one "base32"    OCTPROZ_BENCH_ATTEMPT=pallas:32:bfloat16
# 3. single-GEMM concat operator
run_one "concat16"  OCTPROZ_FOLD_CONCAT=1 OCTPROZ_BENCH_ATTEMPT=pallas:16:bfloat16
run_one "concat32"  OCTPROZ_FOLD_CONCAT=1 OCTPROZ_BENCH_ATTEMPT=pallas:32:bfloat16
# 4. tile cap sweep on the winner shape
run_one "tile512"   OCTPROZ_PALLAS_TILE=512 OCTPROZ_BENCH_ATTEMPT=pallas:32:bfloat16
run_one "c32t512"   OCTPROZ_FOLD_CONCAT=1 OCTPROZ_PALLAS_TILE=512 \
                    OCTPROZ_BENCH_ATTEMPT=pallas:32:bfloat16
# 5. bf16 output store: halves the magnitude write-back
run_one "out16c32"  OCTPROZ_BENCH_ATTEMPT=pallas:32:bfloat16:default:bfloat16
run_one "out16cc32" OCTPROZ_FOLD_CONCAT=1 \
                    OCTPROZ_BENCH_ATTEMPT=pallas:32:bfloat16:default:bfloat16
# 6. XLA fold at the same chunk depth (XLA may pipeline decode/epilogue
#    against the GEMM better than the serial Mosaic kernel)
run_one "xla32"     OCTPROZ_BENCH_ATTEMPT=xla:32:bfloat16
run_one "xla32o16"  OCTPROZ_BENCH_ATTEMPT=xla:32:bfloat16:default:bfloat16

echo "### done $(date)" | tee -a "$LOG"
