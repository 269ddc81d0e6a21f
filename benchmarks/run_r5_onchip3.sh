#!/usr/bin/env bash
# Round-5 on-chip queue #3 — follow-ups from run_r5_onchip.sh results:
#  A''. paged kernel parity now drives OUR per-row-scales int8 kernel
#       (ops/paged_attention_int8.py); the shipped QuantizedTensor path
#       OOMed (f32 full-shape scale broadcasts, 2x 5.47G at this op
#       point — r5_onchip leg B3)
#  B'.  the paged-vs-dense 3072-cap comparison, re-run with the new
#       kernel + explicit page budgets (fully provisioned bf16 never
#       fit: that is the point of paging)
#  C'.  LoRA 1.7B bs16 remat=hot missed by 273 MB -> lce-chunk 512
#  D'.  8B op point hit 222.1 at batch 8 (target >= 224): try batch 12
#       and batch 8 + int8 KV
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== A''. paged kernel parity (Dh=128, bf16 + int8 per-row scales) ==="
timeout 1200 python benchmarks/paged_kernel_parity.py || true

echo "=== B2'. paged engine, int8 pages (new kernel), 16 slots, cap 3072 ==="
timeout 5400 python bench.py --mode serve --paged --gen-cap 3072 \
    --batch 16 --kv-int8 --n-req 32 || true

echo "=== B3'. paged int8, pool halved (400 pages) — oversubscription ==="
timeout 5400 python bench.py --mode serve --paged --gen-cap 3072 \
    --batch 16 --kv-int8 --kv-pages 400 --n-req 32 || true

echo "=== B4'. paged int8, 32 slots in an 800-page budget ==="
timeout 5400 python bench.py --mode serve --paged --gen-cap 3072 \
    --batch 32 --kv-int8 --kv-pages 800 --n-req 48 || true

echo "=== C2'. LoRA 1.7B bs16, remat=hot, lce-chunk 512 ==="
timeout 2400 python bench.py --mode train --preset qwen3-1.7b \
    --train-batch 16 --remat hot --lce-chunk 512 || true

echo "=== D2'. 8B op point, int8 decoder+encoders, batch 12 ==="
timeout 2400 python bench.py --mode fusion --int8 --int8-encoders \
    --preset qwen3-8b --k-tokens 1024 --batch 12 --prompt-len 128 \
    --new-tokens 128 || true

echo "=== D3'. 8B op point, batch 8 + int8 KV ==="
timeout 2400 python bench.py --mode fusion --int8 --int8-encoders \
    --kv-int8 --preset qwen3-8b --k-tokens 1024 --batch 8 \
    --prompt-len 128 --new-tokens 128 || true

echo "=== D4'. 8B op point, batch 16 + int8 KV (if 12 fits, push) ==="
timeout 2400 python bench.py --mode fusion --int8 --int8-encoders \
    --kv-int8 --preset qwen3-8b --k-tokens 1024 --batch 16 \
    --prompt-len 128 --new-tokens 128 || true
