#!/bin/bash
# One-shot TPU re-measurement suite, queued for the axon tunnel's return
# (STATUS.md round-2 third session). Run from the repo root. Each step
# appends to tools/tpu_followups.log; steps are independent, so a mid-run
# tunnel death loses only the current step.
set -u
cd "$(dirname "$0")/.."
LOG=tools/tpu_followups.log
echo "=== TPU follow-ups $(date -u +%FT%TZ) ===" | tee -a "$LOG"

probe() {
  timeout 120 python -c "import jax; d=jax.devices()[0]; assert d.platform=='tpu', d" 2>/dev/null
}
if ! probe; then
  echo "tunnel dead — aborting" | tee -a "$LOG"
  exit 1
fi

run() {
  echo "--- $* ---" | tee -a "$LOG"
  timeout 3000 "$@" 2>&1 | tail -30 | tee -a "$LOG"
}

# 1. accuracy ladder (expect: the f32 'floor' row to improve to ~1e-6-grade
#    with the proximal delta_w floor; polished to stay 1e-9 but much faster)
run python tools/f32_accuracy.py

# 2. iteration distributions: default (0.3 floor) vs classic vs refine
run python tools/iters_experiment.py 256 400 "base,classic,refine"

# 3. per-iteration cost quadrants (unchanged expectation: generic z_k AD)
run python tools/ablate_iter.py

# 4. per-stage micro-benchmarks (bench_report.json)
run python bench_stages.py

# 5. headline bench re-baseline (BENCH history + regression check)
run python bench.py

echo "=== done $(date -u +%FT%TZ) ===" | tee -a "$LOG"
