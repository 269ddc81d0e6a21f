#!/usr/bin/env bash
# Round-4 on-chip follow-ups: MoE int8 reruns at the comparable batch
# (batch 32 + bf16-expert residency OOM'd the 16 GB chip in run 1), and
# the MFU push past 35% (sequence-length lever to the reference's own
# seq-3072 operating point + the new 'attn' remat policy + LCE chunk).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== A'. MoE decode at comparable batch 8 (bf16 ran 314.4) ==="
timeout 1800 python bench.py --preset qwen3-moe-mini --int8 --batch 8 || true
timeout 1800 python bench.py --preset qwen3-moe-mini --int8 --int8-experts \
    --batch 8 || true
# batch 32 retry: quantize-before-fuse + donated bf16 tree fixed the OOM
timeout 1800 python bench.py --preset qwen3-moe-mini --int8 --int8-experts \
    --batch 32 || true

echo "=== E'. reference operating point with int8 KV (bf16 KV at k=1024"
echo "    batch 32 is ~8.5 GB of pool alone and OOM'd the 16 GB chip) ==="
timeout 2400 python bench.py --mode fusion --int8 --kv-int8 \
    --k-tokens 1024 --batch 32 --prompt-len 128 --new-tokens 128 || true
timeout 2400 python bench.py --mode fusion --int8 \
    --k-tokens 1024 --batch 16 --prompt-len 128 --new-tokens 128 || true
timeout 2400 python bench.py --mode fusion --int8 --kv-int8 \
    --preset qwen3-8b --k-tokens 1024 --batch 8 --prompt-len 128 \
    --new-tokens 128 || true

echo "=== B'. megablox gmm vs ragged_dot (decode-shape pad fix) ==="
timeout 1800 env MOLLY_MOE_GEMM=gmm python bench.py \
    --preset qwen3-moe-mini --no-int8 --batch 8 || true

echo "=== F. MFU push: seq 3072 (the reference 8B train point) ==="
timeout 2400 python bench.py --mode train --full-ft --preset qwen3-0.6b \
    --seq-len 3072 --train-batch 4 --remat full || true
timeout 2400 python bench.py --mode train --full-ft --preset qwen3-0.6b \
    --seq-len 3072 --train-batch 8 --remat full || true
timeout 2400 python bench.py --mode train --seq-len 3072 --train-batch 4 \
    --remat full || true   # LoRA 1.7B
timeout 2400 python bench.py --mode train --qlora --seq-len 3072 \
    --train-batch 4 --remat full || true

echo "=== G. MFU push: 'attn' remat policy (save flash outputs only) ==="
timeout 2400 python bench.py --mode train --full-ft --preset qwen3-0.6b \
    --train-batch 16 --remat attn || true
timeout 2400 python bench.py --mode train --train-batch 8 --remat attn \
    || true                # LoRA 1.7B
timeout 2400 python bench.py --mode train --full-ft --preset qwen3-0.6b \
    --seq-len 3072 --train-batch 8 --remat attn || true

echo "=== I. in-ring speculation, copy-trained 0.6B (the batched win) ==="
# trains the preset on periodic streams on-chip (~2 min), then serves
# span-quoting prompts greedily through the admission ring ±lookup-spec
timeout 2400 python bench.py --mode serve --offline --preset qwen3-0.6b \
    --spec-workload copy || true
timeout 2400 python bench.py --mode serve --offline --preset qwen3-0.6b \
    --spec-workload copy --spec-lookup 8 || true

echo "=== J. train-step attribution (VERDICT r3 weak #2) ==="
timeout 3000 python benchmarks/ablate_train.py --preset qwen3-0.6b \
    --batch 16 --remat full attn || true

echo "=== H. MFU push: LCE chunk size at the best config ==="
timeout 2400 python bench.py --mode train --full-ft --preset qwen3-0.6b \
    --train-batch 16 --lce-chunk 512 || true
timeout 2400 python bench.py --mode train --full-ft --preset qwen3-0.6b \
    --train-batch 16 --lce-chunk 1024 || true

echo "=== E''. serve at the reference 3072-token cap (fixed: int8-KV"
echo "    static baseline; bf16 static pool ~5.9 GB crashed the worker) ==="
timeout 3600 python bench.py --mode serve --gen-cap 3072 --batch 16 \
    --kv-int8 --n-req 32 || true

echo "=== E'''. op-point TTFT: prompt 2176 (128 text + 2x1024 k-token"
echo "    segments), int8 weights + int8 KV (bf16 OOM'd) ==="
timeout 1200 python bench.py --mode ttft --int8 --kv-int8 --batch 32 \
    --prompt-len 2176 || true
timeout 1200 python bench.py --mode ttft --int8 --kv-int8 \
    --preset qwen3-8b --batch 8 --prompt-len 2176 || true
