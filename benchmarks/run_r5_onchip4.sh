#!/usr/bin/env bash
# Round-5 queue #4: controls + calibration legs.
#  F1. plain-ring control for the E1/E2 adaptive rows (same chip-day)
#  F2. cost-calibrated threshold end-to-end (--spec-calibrate): the ring
#      must derive a* from measured tick costs and pick correctly at
#      this 32-slot operating point
#  F3. the same calibrated run on the copy-trained workload (spec should
#      stay ON: acceptance ~1.0 >> a*)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== F1. plain ring control, 1.7B int8, 32 slots, no spec ==="
timeout 2400 python bench.py --mode serve --offline || true

echo "=== F2. calibrated adaptive, random workload ==="
timeout 2400 python bench.py --mode serve --offline \
    --spec-lookup 8 --spec-adapt 0.2 --spec-calibrate \
    --spec-adapt-chunk 128 || true

echo "=== F3. calibrated adaptive, copy-trained workload ==="
timeout 2400 python bench.py --mode serve --offline --preset qwen3-0.6b \
    --spec-workload copy --spec-lookup 8 --spec-adapt 0.2 \
    --spec-calibrate --spec-adapt-chunk 128 || true

echo "=== J'' attribution, remat=full, outer variants ==="
timeout 1500 python benchmarks/ablate_train.py --preset qwen3-0.6b \
    --batch 16 --remat full --only step grads fwd || true
echo "=== J'' attribution, remat=full, decoder variants ==="
timeout 1500 python benchmarks/ablate_train.py --preset qwen3-0.6b \
    --batch 16 --remat full --only dec_grads dec_fwd body_grads || true
echo "=== J'' attribution, remat=hot, outer variants ==="
timeout 1500 python benchmarks/ablate_train.py --preset qwen3-0.6b \
    --batch 16 --remat hot --only step grads fwd || true
echo "=== J'' attribution, remat=hot, decoder variants ==="
timeout 1500 python benchmarks/ablate_train.py --preset qwen3-0.6b \
    --batch 16 --remat hot --only dec_grads dec_fwd body_grads || true

echo "=== G1. 8B QLoRA bs2 (the round-4 'say what bs2 would do' ask) ==="
timeout 2400 python bench.py --mode train --qlora --preset qwen3-8b \
    --train-batch 2 --remat full --lce-chunk 1024 || true
echo "=== G2. 8B QLoRA bs4 ==="
timeout 2400 python bench.py --mode train --qlora --preset qwen3-8b \
    --train-batch 4 --remat full --lce-chunk 1024 || true
