#!/bin/bash
# Sequential TPU experiment matrix: each attempt is an isolated subprocess
# under a hard timeout (CLAUDE.md: the tunneled backend can wedge a process;
# never retry in-process).  Waits for tunnel revival between attempts (the
# wedge is transient) and retries each spec once.  Appends results to the
# log; full stderr of failed attempts is kept in /tmp/exp_<name>.stderr.
#
#   bash scripts/tpu_experiments.sh [logfile] [spec...]
#
# Each spec is NAME=ENVS,SPEC where ENVS sets kernel knobs via
# OCTPROZ_BENCH_CFG (space-free single-key JSON of ProcConfig overrides),
# e.g. 'concat32=OCTPROZ_BENCH_CFG={"fold_concat":true},pallas:32:bfloat16'.
# With no specs, runs the default matrix.  One process at a time on the
# tunnel -- do not run concurrently with any other TPU user.
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_experiments.log}"
shift || true
ATTEMPT_TIMEOUT="${OCTPROZ_EXP_TIMEOUT:-900}"

probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; print(jnp.ones(4).sum())" >/dev/null 2>&1
}

wait_tunnel() {  # up to ~12 min
  for i in $(seq 1 8); do
    probe && return 0
    echo "  tunnel dead, waiting ($i/8) $(date +%H:%M:%S)" | tee -a "$LOG"
    sleep 75
  done
  return 1
}

run_one() {  # "name=ENV1=V1 ENV2=V2,spec"
  local def="$1"
  local name="${def%%=*}"
  local rest="${def#*=}"
  local envs="${rest%,*}"
  local spec="${rest##*,}"
  [ "$envs" = "$spec" ] && envs=""
  for try in 1 2; do
    echo "=== $name try$try $(date +%H:%M:%S)" | tee -a "$LOG"
    if ! wait_tunnel; then
      echo "$name: tunnel never revived" | tee -a "$LOG"
      return 1
    fi
    local out
    out=$(env $envs OCTPROZ_BENCH_ATTEMPT="$spec" \
          OCTPROZ_BENCH_ATTEMPT_TIMEOUT="$ATTEMPT_TIMEOUT" \
          timeout "$ATTEMPT_TIMEOUT" python bench.py \
          2>"/tmp/exp_${name}.stderr")
    local rc=$?
    if [ $rc -eq 0 ] && [ -n "$out" ]; then
      echo "$name $out" | tee -a "$LOG"
      sleep 5
      return 0
    fi
    local err
    err=$(grep -E "Error|error:|Exception|UNIMPLEMENTED|RESOURCE_EXHAUSTED" \
          "/tmp/exp_${name}.stderr" | grep -v TRACEBACK_FILTERING \
          | tail -2 | tr '\n' ' ' | cut -c1-220)
    echo "$name FAILED rc=$rc try$try: $err" | tee -a "$LOG"
    sleep 20
  done
  return 1
}

DEFAULT_MATRIX=(
  "base32=pallas:32:bfloat16"
  'concat16=OCTPROZ_BENCH_CFG={"fold_concat":true},pallas:16:bfloat16'
  'concat32=OCTPROZ_BENCH_CFG={"fold_concat":true},pallas:32:bfloat16'
  'tile512=OCTPROZ_BENCH_CFG={"pallas_tile":512},pallas:16:bfloat16'
  "out16=pallas:16:bfloat16:default:bfloat16"
  'out16cc=OCTPROZ_BENCH_CFG={"fold_concat":true},pallas:16:bfloat16:default:bfloat16'
  "xla16=xla:16:bfloat16"
)

echo "### experiment run $(date)" | tee -a "$LOG"
if [ $# -gt 0 ]; then
  for def in "$@"; do run_one "$def"; done
else
  for def in "${DEFAULT_MATRIX[@]}"; do run_one "$def"; done
fi
echo "### done $(date)" | tee -a "$LOG"
