#!/usr/bin/env bash
# One-command pod scaling run (BASELINE config #5; r4 VERDICT #8).
#
# Hardware-blocked in the build environment (one chip); this script is
# the zero-edit artifact a real TPU slice runs to fill the measurement
# slot. It launches jax.distributed bring-up, the sharded train step in
# all three variants (GSPMD / explicit shard_map / overlapped chunked
# pmean), and prints per-mesh-size step times + the weak-scaling
# efficiency WITH docs/ICI_MODEL.md's falsifiable predictions printed
# next to the measured value.
#
# Usage:
#   Single host (1 process, all local chips):
#       bash bench/pod_scaling.sh
#   Multi-host slice (run on EVERY worker, e.g. via
#   `gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...`):
#       bash bench/pod_scaling.sh --distributed
#   Dry-run without TPUs (validates machinery, NOT efficiency —
#   oversubscribed-host numbers are meaningless, ICI_MODEL.md §5.3):
#       bash bench/pod_scaling.sh --virtual 8
#
# Every extra argument is forwarded to bench/scaling.py. Results land in
# pod_scaling_<variant>.jsonl next to this script.
#
# What the pod must confirm (docs/ICI_MODEL.md §5):
#   1. overlap-vs-shardmap step delta ~0.3 ms at N=256 (hidden fraction
#      of the 0.41 ms grad ring all-reduce);
#   2. weak-scaling efficiency >= 0.99 at 8-64 chips (>= 0.96 anywhere
#      on a v5e pod); the driver gate is >= 0.8.

set -euo pipefail
cd "$(dirname "$0")/.."

ARGS=("$@")
for variant in gspmd shardmap overlap; do
    out="bench/pod_scaling_${variant}.jsonl"
    echo "== variant=${variant} -> ${out}" >&2
    python bench/scaling.py --variant "${variant}" "${ARGS[@]}" \
        | tee "${out}"
done

echo "== done; compare the three scaling_efficiency lines against the" >&2
echo "   ici_model_prediction field and docs/ICI_MODEL.md section 5." >&2
