#!/usr/bin/env bash
# Round-4 on-chip measurement plan (run on the real TPU, no JAX_PLATFORMS
# override; one JAX process at a time; discard first timed round after a
# compile — see .claude/skills/verify/SKILL.md). Results land in
# benchmarks/README.md tables as they complete.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== A. round-3 backlog: MoE decode (bf16 / int8-attn / +int8 experts) ==="
timeout 1800 python bench.py --preset qwen3-moe-mini --no-int8 || true
timeout 1800 python bench.py --preset qwen3-moe-mini --int8 || true
timeout 1800 python bench.py --preset qwen3-moe-mini --int8 --int8-experts || true

echo "=== B. MoE grouped-GEMM backend: ragged_dot vs megablox gmm ==="
timeout 1800 env MOLLY_MOE_GEMM=gmm python bench.py \
    --preset qwen3-moe-mini --no-int8 || true

echo "=== C. serving ring regression + in-ring prompt-lookup speculation ==="
timeout 1800 python bench.py --mode serve --offline || true
timeout 1800 python bench.py --mode serve --offline --spec-lookup 8 || true

echo "=== D. multi-LoRA on the FUSED int8 path (round-4 change): bank sizes ==="
timeout 1800 python bench.py --mode serve --lora-bank 1 || true
timeout 1800 python bench.py --mode serve --lora-bank 4 || true
timeout 1800 python bench.py --mode serve || true  # no-bank fused control

echo "=== E. reference operating point (inference_nt_lora.sh:25-36) ==="
# tri-encoder NT-500M + ESM2-650M, k=1024 segments, batch 32, int8 1.7B
timeout 2400 python bench.py --mode fusion --int8 --k-tokens 1024 \
    --batch 32 --prompt-len 128 --new-tokens 128 || true
# 8B-int8 at the op point (batch 8: KV for 2308-token context, 16 GB chip)
timeout 2400 python bench.py --mode fusion --int8 --preset qwen3-8b \
    --k-tokens 1024 --batch 8 --prompt-len 128 --new-tokens 128 || true
# serve with generation caps up to the reference's 3072 (ring sized
# 128+3072; int8 KV keeps 16 slots at 2.9 GB of pool)
timeout 3000 python bench.py --mode serve --gen-cap 3072 --batch 16 \
    --kv-int8 --n-req 32 || true
# prefill-side TTFT at op-point prompt length (decoder side; add the
# measured encoder seq/s for the k=1024 encode share)
timeout 1200 python bench.py --mode ttft --batch 32 --prompt-len 2176 || true
