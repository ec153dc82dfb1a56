#!/bin/bash
# One-shot TPU measurement pass (run from /root/repo when the axon tunnel is
# up; the TPU is single-tenant — make sure no other jax process is running).
# Order: cheap compile check first, then the bench measurements.
#
#   bash tools/run_tpu_checks.sh [logdir]
#
# Logs land in $logdir (default /tmp/tpu_checks). Exit code 0 iff every stage
# passed. The /verify CLI drive (train/test on the synthetic scene) stays a
# separate manual step — see .claude/skills/verify/SKILL.md.
set -u
LOG=${1:-/tmp/tpu_checks}
mkdir -p "$LOG"
fail=0

run() {
  name=$1; shift
  echo "=== $name: $* (log: $LOG/$name.log)"
  if timeout 1500 "$@" >"$LOG/$name.log" 2>&1; then
    echo "    ok: $(tail -1 "$LOG/$name.log")"
  else
    echo "    FAILED (exit $?) — tail:"; tail -5 "$LOG/$name.log" | sed 's/^/    /'
    fail=1
  fi
}

run probe        python -c "import jax; assert jax.default_backend() == 'tpu', jax.default_backend(); print(jax.devices())"
[ $fail -ne 0 ] && { echo "TPU not reachable; aborting"; exit 1; }
run shardmap     python tools/tpu_shardmap_check.py
run bench        python bench.py
run bench_edit   python -m tools.bench_edit --hw 128 --n_obj 1 --k 8

echo "=== done (fail=$fail); bench JSON:"
grep -h '^{' "$LOG/bench.log" | tail -1
exit $fail
