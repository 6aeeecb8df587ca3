#!/bin/bash
# Binned/dense crossover sweep, fwd+bwd, DCE-proof harness (VERDICT r2 #4).
# Produces the data behind BINNED_MIN_N (EWA) in ops/pallas/binned.py.
# NOTE (r4): the AXIS crossover is no longer a gaussian-count constant —
# dense-sep wins at every n that fits VMEM and dispatch asks
# splat._sep_fits directly (BINNED_MIN_N_AXIS survives only as a
# frameless fallback); the AXIS stanza below is kept for regression
# evidence. 1024^2 EWA points were taken in r4 (BASELINE.md).
# Run: bash bench/sweep_crossover.sh [out_log]
set -u
LOG="${1:-/tmp/crossover_sweep.log}"
cd "$(dirname "$0")/.."
: > "$LOG"
echo "== EWA accum crossover (512^2, fwd+bwd) ==" | tee -a "$LOG"
for n in 16384 24576 32768 49152 65536; do
  for b in off on; do
    timeout 1200 python bench/at_scale.py --n $n --sizes 512 --fp ewa \
      --modes accum --binned $b 2>/dev/null | tail -1 | tee -a "$LOG"
  done
done
echo "== AXIS accum crossover (512^2, fwd+bwd) ==" | tee -a "$LOG"
for n in 49152 65536 98304 131072; do
  for b in off on; do
    timeout 1200 python bench/at_scale.py --n $n --sizes 512 --fp axis \
      --modes accum --binned $b 2>/dev/null | tail -1 | tee -a "$LOG"
  done
done
echo "sweep done" | tee -a "$LOG"
