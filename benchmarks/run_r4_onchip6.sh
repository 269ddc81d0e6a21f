#!/usr/bin/env bash
# Round-4 on-chip follow-ups #6: the "hot" remat policy (save narrow
# attention-side dots, recompute only gate/up — qwen3._remat_policy)
# stacked on the LCE-chunk win from leg H (chunk 512 -> 34.2%, chunk
# 1024 -> 35.4% MFU at full/bs16); plus the leg-J attribution retry
# (failed twice on transient remote_compile network errors).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== L. full-FT 0.6B, remat=hot, bs16 seq1024, lce-chunk 1024 ==="
timeout 2400 python bench.py --mode train --full-ft --preset qwen3-0.6b \
    --train-batch 16 --remat hot --lce-chunk 1024 || true
timeout 2400 python bench.py --mode train --full-ft --preset qwen3-0.6b \
    --train-batch 24 --remat hot --lce-chunk 1024 || true

echo "=== H'. does the LCE-chunk trend continue? (full remat control) ==="
timeout 2400 python bench.py --mode train --full-ft --preset qwen3-0.6b \
    --train-batch 16 --lce-chunk 2048 || true

echo "=== L'. full-FT 0.6B, remat=hot, seq3072 (best-MFU shape so far) ==="
timeout 2400 python bench.py --mode train --full-ft --preset qwen3-0.6b \
    --train-batch 8 --remat hot --seq-len 3072 --lce-chunk 1024 || true

echo "=== L''. LoRA/QLoRA 1.7B on remat=hot + lce-chunk 1024 ==="
timeout 2400 python bench.py --mode train --preset qwen3-1.7b \
    --train-batch 8 --remat hot --lce-chunk 1024 || true
timeout 2400 python bench.py --mode train --qlora --preset qwen3-1.7b \
    --train-batch 8 --remat hot --lce-chunk 1024 || true

echo "=== J-retry. train-step attribution (full vs hot) ==="
timeout 3000 python benchmarks/ablate_train.py --preset qwen3-0.6b \
    --batch 16 --remat full hot || true
