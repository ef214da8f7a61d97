#!/bin/bash
# Remaining round-3 TPU agenda, one stage at a time (the tunnel serialises
# device use; NEVER run two TPU processes at once).
# Run:  bash tools/tpu_runbook.sh [outdir]   (default /tmp/runbook_r3b)
# Completed earlier in round 3 (results in DESIGN.md / STATUS.md):
#   bench 32 (67.0 g/s) / hybrid A/B (negative) / lmax4 b64 (91.2) /
#   b64 enc-remat (57.3) / real-data overfit (CE 0.0177) / 7cff
#   reconstruction masked-vs-unmasked / WGAN-GP GAN round (0.7 s/round).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/runbook_r3b}
mkdir -p "$OUT"

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== stage $name: $* (timeout ${tmo}s)" | tee -a "$OUT/runbook.log"
  local t0=$SECONDS
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== stage $name done rc=$rc (${name}: $((SECONDS-t0))s)" | tee -a "$OUT/runbook.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/runbook.log"
}

# 1) generation quality, trained decoder, masked vs unmasked (batch 32)
stage gen_mask 3600 python tools/bench_generate.py 32 --pretrain 200
stage gen_nomask 3600 python tools/bench_generate.py 32 --pretrain 200 --no-mask

# 2) flagship profile trace (per-HLO attribution for the copy/tail work)
stage bench_prof 2400 python bench.py 32 --profile "$OUT/prof"

echo "=== runbook complete ===" | tee -a "$OUT/runbook.log"
