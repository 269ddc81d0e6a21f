#!/usr/bin/env bash
# Round-5 queue #5: the int8-paged legs, reworked after Mosaic rejected
# [P, 1] scale slices ("Slice shape along dimension 3 must be aligned to
# tiling (128)", onchip3 log). Scales now ride lane-major [8, P] tiles
# and dequant folds after the matmuls; the kernel path needs page 128.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== A3. paged kernel parity (bf16 page 64 + int8 page 128) ==="
timeout 1800 python benchmarks/paged_kernel_parity.py || true

echo "=== B2''. paged int8 (page 128), 16 slots, cap 3072 ==="
timeout 5400 python bench.py --mode serve --paged --gen-cap 3072 \
    --batch 16 --kv-int8 --page-size 128 --n-req 32 || true

echo "=== B3''. paged int8, pool halved (200 pages of 128) ==="
timeout 5400 python bench.py --mode serve --paged --gen-cap 3072 \
    --batch 16 --kv-int8 --page-size 128 --kv-pages 200 --n-req 32 || true

echo "=== B4''. paged int8, 32 slots in a 400-page budget ==="
timeout 5400 python bench.py --mode serve --paged --gen-cap 3072 \
    --batch 32 --kv-int8 --page-size 128 --kv-pages 400 --n-req 48 || true

echo "=== C4. LoRA 1.7B bs8 hot + remat-skip 8 ==="
timeout 2400 python bench.py --mode train --preset qwen3-1.7b \
    --train-batch 8 --remat hot --remat-skip 8 --lce-chunk 1024 || true
echo "=== C5. LoRA 1.7B bs8 hot + remat-skip 16 ==="
timeout 2400 python bench.py --mode train --preset qwen3-1.7b \
    --train-batch 8 --remat hot --remat-skip 16 --lce-chunk 1024 || true
echo "=== C6. LoRA 1.7B bs8 hot + remat-skip 24 ==="
timeout 2400 python bench.py --mode train --preset qwen3-1.7b \
    --train-batch 8 --remat hot --remat-skip 24 --lce-chunk 1024 || true
