#!/usr/bin/env bash
# Tiered test runner — one pytest PROCESS PER MODULE.
#
# Why per-module processes: running many UNet-scale modules in ONE process
# segfaults deterministically in XLA's CPU AOT executable loader while
# DESERIALIZING a persistent-cache entry (rc=139 inside
# jax/_src/compilation_cache.py get_executable_and_time) once enough
# executables have been loaded — e.g. the test_sampling -> test_models
# sequence crashes at the same test every time, while either module alone
# is green. Per-module isolation bounds loaded executables per process,
# sidesteps the loader bug, and gives per-module wall times for the tier
# table in README.md.
#
# Usage:
#   scripts/run_tests.sh fast      # golden-math tier (~2 min warm)
#   scripts/run_tests.sh medium    # everything but the monsters
#   scripts/run_tests.sh full      # the whole suite
set -u
cd "$(dirname "$0")/.."

TIER="${1:-medium}"

FAST=(test_schedules test_data_metrics test_clip_score test_inception test_native)
# heavy modules excluded from `medium`: the multi-minute UNet-scale
# compile/oracle monsters (run them in `full` or individually)
SLOW=(test_sampling test_flash_attention test_convert test_openpose)
ALL=$(cd tests && ls test_*.py | sed 's/\.py$//')

case "$TIER" in
  fast)   MODULES=("${FAST[@]}") ;;
  medium) MODULES=(); for m in $ALL; do
            skip=0
            for s in "${SLOW[@]}"; do [ "$m" = "$s" ] && skip=1; done
            [ $skip -eq 0 ] && MODULES+=("$m")
          done ;;
  full)   MODULES=($ALL) ;;
  *) echo "usage: $0 [fast|medium|full]" >&2; exit 2 ;;
esac

T0=$(date +%s)
FAILED=()
for m in "${MODULES[@]}"; do
  t0=$(date +%s)
  python -m pytest "tests/${m}.py" -q -p no:warnings > "/tmp/pytest_${m}.log" 2>&1
  rc=$?
  dt=$(( $(date +%s) - t0 ))
  line=$(grep -E "^[0-9]+ (passed|failed)" "/tmp/pytest_${m}.log" | tail -1)
  [ -z "$line" ] && line=$(tail -1 "/tmp/pytest_${m}.log")
  if [ $rc -eq 5 ]; then
    # all tests deselected (slow-marked module, e.g. test_multihost):
    # not a failure — run those with `pytest -m slow` explicitly
    echo "skip  ${m}  (${dt}s)  all tests deselected (slow-only module)"
    continue
  fi
  if [ $rc -ne 0 ]; then
    FAILED+=("$m")
    echo "FAIL  ${m}  (${dt}s, rc=${rc})  ${line}"
  else
    echo "ok    ${m}  (${dt}s)  ${line}"
  fi
done
TOTAL=$(( $(date +%s) - T0 ))
echo "---"
echo "tier=${TIER} modules=${#MODULES[@]} total=${TOTAL}s failed=${#FAILED[@]} ${FAILED[*]:-}"
[ ${#FAILED[@]} -eq 0 ]
