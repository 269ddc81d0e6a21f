#!/usr/bin/env bash
# Round-3 pending on-chip measurements (run on the real TPU, no
# JAX_PLATFORMS override). Each block is independent; results go into
# benchmarks/README.md next to the existing tables. Mind the tunnel
# gotchas (.claude/skills/verify/SKILL.md): discard the first timed
# round after a compile (~4x slow), never run two JAX processes, and a
# killed run wedges the chip ~4 min.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== 1. train-step attribution: where do the ms/step go? ==="
# best-before-outage: 28.7% MFU on 0.6B full-FT with bf16 dots +
# save-dots remat at batch 8 — attribute the residual vs ideal
timeout 1200 python benchmarks/ablate_train.py \
    --preset qwen3-0.6b --batch 8 --remat dots || true

echo "=== 2. train MFU datapoints (bench JSON lines) ==="
timeout 1200 python bench.py --mode train --preset qwen3-0.6b \
    --full-ft --remat dots --train-batch 8 || true
timeout 1200 python bench.py --mode train --preset qwen3-1.7b \
    --remat dots --train-batch 8 || true

echo "=== 2b. QLoRA headline: 8B LoRA fine-tune on ONE 16 GB chip ==="
# the reference needs 8 GPUs + ZeRO-2 for this model class
timeout 1800 python bench.py --mode train --preset qwen3-8b --qlora \
    --remat full --train-batch 1 || true
timeout 1200 python bench.py --mode train --preset qwen3-1.7b --qlora \
    --remat dots --train-batch 8 || true

echo "=== 3. MoE decode: attention-only int8 vs +experts vs bf16 ==="
timeout 1800 python bench.py --preset qwen3-moe-mini --no-int8 || true
timeout 1800 python bench.py --preset qwen3-moe-mini --int8 || true
timeout 1800 python bench.py --preset qwen3-moe-mini --int8 \
    --int8-experts || true

echo "=== 4. MoE grouped-GEMM backend: ragged_dot vs megablox gmm ==="
timeout 1800 env MOLLY_MOE_GEMM=gmm python bench.py \
    --preset qwen3-moe-mini --no-int8 || true

echo "=== 5. flagship regression check (int8 1.7B serve ring) ==="
timeout 1800 python bench.py --mode serve --offline || true

echo "=== 5b. in-ring prompt-lookup speculation (greedy, no-match floor"
echo "        on random weights; real speedup needs span-quoting ckpt) ==="
timeout 1800 python bench.py --mode serve --offline --spec-lookup 8 || true

echo "=== 5c. multi-LoRA serving overhead (4 adapters r=16, round-robin"
echo "        routing; vs the same engine unfused no-bank) ==="
timeout 1800 python bench.py --mode serve --lora-bank 4 || true
timeout 1800 python bench.py --mode serve --lora-bank 1 || true
