#!/usr/bin/env bash
# Round-4 on-chip follow-ups #4: the legs run_r4_onchip2.sh never reached
# (the session died at leg J) plus the copy-train OOM retry (fixed by
# donating params+opt state into the train step, bench.py
# _train_copy_model).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== J. train-step attribution (VERDICT r3 weak #2) ==="
timeout 3000 python benchmarks/ablate_train.py --preset qwen3-0.6b \
    --batch 16 --remat full attn || true

echo "=== I-retry. in-ring speculation, copy-trained 0.6B (donation fix) ==="
timeout 2400 python bench.py --mode serve --offline --preset qwen3-0.6b \
    --spec-workload copy || true
timeout 2400 python bench.py --mode serve --offline --preset qwen3-0.6b \
    --spec-workload copy --spec-lookup 8 || true

echo "=== H. MFU push: LCE chunk size at the best config ==="
timeout 2400 python bench.py --mode train --full-ft --preset qwen3-0.6b \
    --train-batch 16 --lce-chunk 512 || true
timeout 2400 python bench.py --mode train --full-ft --preset qwen3-0.6b \
    --train-batch 16 --lce-chunk 1024 || true

echo "=== E''. serve at the reference 3072-token cap (int8-KV pool) ==="
timeout 3600 python bench.py --mode serve --gen-cap 3072 --batch 16 \
    --kv-int8 --n-req 32 || true

echo "=== K2. adaptive ring, bigger chunks (amortize the cond-boundary"
echo "    KV copy: chunk 32 measured 3155 vs plain 4024) ==="
timeout 2400 python bench.py --mode serve --offline \
    --spec-lookup 8 --spec-adapt 0.2 \
    --spec-adapt-chunk 128 --spec-adapt-probe 32 || true
timeout 2400 python bench.py --mode serve --offline \
    --spec-lookup 8 --spec-adapt 0.2 \
    --spec-adapt-chunk 256 --spec-adapt-probe 64 || true

echo "=== K'2. adaptive ring, copy-trained workload (remat fix) ==="
timeout 2400 python bench.py --mode serve --offline --preset qwen3-0.6b \
    --spec-workload copy --spec-lookup 8 --spec-adapt 0.2 \
    --spec-adapt-chunk 128 --spec-adapt-probe 32 || true
