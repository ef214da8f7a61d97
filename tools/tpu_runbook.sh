#!/bin/bash
# Round-3 TPU agenda, one stage at a time (the tunnel serialises device use).
# Run:  bash tools/tpu_runbook.sh [outdir]   (default /tmp/runbook_r3)
# Each stage is timeout-bounded and logged; failures don't stop later stages.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/runbook_r3}
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

# 1) flagship single-chip throughput (the BENCH metric)
stage bench_b32 2400 python bench.py 32

# 1b) hybrid neighbor-attention kernel (XLA DMA gathers outside the kernel;
#     flip the default in models/neighbor_graph.py if this wins)
stage bench_b32_hybrid 2400 env SINGA_TPU_HYBRID_ATTN=1 python bench.py 32

# 2) the reference's own headline recipe (lmax=4, batch 64)
stage bench_b64_lmax4 2400 python bench.py 64 --lmax 4

# 3) monolithic batch-64 at lmax 6 with encoder remat (OOM retest)
stage bench_b64_encremat 2400 python bench.py 64 --enc-remat on

# 4) real-data overfit anchor on the bundled reference complexes
stage train_real 3600 python -m singa_tpu.train.loop \
  --config configs/train_real_mini.yml --data data/ref_graphs_large \
  --max-iters 300 --logdir "$OUT/real_mini"

# 5) generate from the 7cff pocket with the trained checkpoint
stage gen_real 2400 python -m singa_tpu.generate.generate \
  --checkpoint "$OUT/real_mini/checkpoints" \
  --input data/ref_graphs_large/train/7cff.npz \
  --output "$OUT/real_mini_generated.csv" --props

# 5b) same pocket+checkpoint, grammar mask OFF (ablation baseline)
stage gen_real_nomask 2400 python -m singa_tpu.generate.generate \
  --checkpoint "$OUT/real_mini/checkpoints" \
  --input data/ref_graphs_large/train/7cff.npz \
  --output "$OUT/real_mini_generated_nomask.csv" --props --no-mask

# 6) generation quality, trained decoder, masked vs unmasked
stage gen_mask 3600 python tools/bench_generate.py 32 --pretrain 200
stage gen_nomask 3600 python tools/bench_generate.py 32 --pretrain 200 --no-mask

# 7) adversarial round on hardware: both discriminators, WGAN-GP, batch 32
stage gan_tpu 3600 python -m singa_tpu.train.gan --synthetic \
  --rounds 10 --batch-size 32 --graph-loss wgan-gp --grammar-mask \
  --pretrain 50 --logdir "$OUT/gan_tpu"

echo "=== runbook complete ===" | tee -a "$OUT/runbook.log"
