#!/usr/bin/env bash
# Full pre-snapshot gate (VERDICT r3 item 8): the round-3 snapshot shipped
# with a suite that could not complete, so every end-of-round commit must
# cite a green run of this script.
#
#   bash scripts/check_all.sh            # full suite + dryrun + CPU smoke
#   bash scripts/check_all.sh --tpu      # additionally run bench.py (real TPU)
#
# Exit 0 = everything green.  Records a summary line suitable for
# PROGRESS.jsonl on stdout.
set -u
cd "$(dirname "$0")/.."
REPO="$PWD"
FAIL=0

echo "== [1/3] full pytest suite (virtual 8-device CPU mesh) =="
start=$(date +%s)
python -m pytest tests/ -q 2>&1 | tail -4
rc=${PIPESTATUS[0]}
t_suite=$(( $(date +%s) - start ))
if [ "$rc" -ne 0 ]; then echo "SUITE FAILED (rc=$rc)"; FAIL=1; fi
echo "suite: rc=$rc ${t_suite}s"

echo "== [2/3] dryrun_multichip(8) on virtual CPU devices =="
start=$(date +%s)
JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  AVR_COMPILE_CACHE=off \
  python -c "
import __graft_entry__ as g
g.dryrun_multichip(8)
print('dryrun OK')
" 2>&1 | tail -3
rc=${PIPESTATUS[0]}
t_dry=$(( $(date +%s) - start ))
if [ "$rc" -ne 0 ]; then echo "DRYRUN FAILED (rc=$rc)"; FAIL=1; fi
echo "dryrun: rc=$rc ${t_dry}s"

echo "== [3/3] entry() compile smoke (CPU) =="
start=$(date +%s)
JAX_PLATFORMS=cpu AVR_COMPILE_CACHE=off python -c "
import jax
jax.config.update('jax_platforms', 'cpu')
import __graft_entry__ as g
fn, args = g.entry()
out = jax.jit(fn).lower(*args).compile()
print('entry compile OK')
" 2>&1 | tail -3
rc=${PIPESTATUS[0]}
t_entry=$(( $(date +%s) - start ))
if [ "$rc" -ne 0 ]; then echo "ENTRY SMOKE FAILED (rc=$rc)"; FAIL=1; fi
echo "entry: rc=$rc ${t_entry}s"

if [ "${1:-}" = "--tpu" ]; then
  echo "== [extra] bench.py on real TPU =="
  PYTHONPATH="$REPO:/root/.axon_site" python bench.py 2>&1 | tail -2
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then echo "BENCH FAILED (rc=$rc)"; FAIL=1; fi
fi

if [ "$FAIL" -eq 0 ]; then
  echo "{\"check_all\": \"green\", \"suite_s\": $t_suite, \"dryrun_s\": $t_dry, \"entry_s\": $t_entry}"
else
  echo "{\"check_all\": \"RED\"}"
fi
exit $FAIL
