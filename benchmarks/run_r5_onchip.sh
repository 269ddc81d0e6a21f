#!/usr/bin/env bash
# Round-5 on-chip queue (VERDICT r4 asks #2/#3/#4/#5/#6):
#  A. paged Pallas kernel first on-chip execution + parity (Dh=128)
#  B. the 3072-cap serve run (round-3 done-criterion): dense int8-KV ring
#     vs the paged engine at the same op point (bf16 + int8 pages)
#  C. LoRA/QLoRA 1.7B MFU push: need_dw-skip LCE backward + lighter remat
#  D. 8B reference op point with int8 encoders (unlock batch 8)
#  E. adaptive-ring K2/K3 retries (chunk tuning + shadow-draft)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== A. paged kernel on-chip parity (Dh=128, bf16 + int8 pools) ==="
timeout 1200 python benchmarks/paged_kernel_parity.py || true

echo "=== B1. dense ring, gen-cap 3072, 16 slots, int8 KV (block E) ==="
timeout 3600 python bench.py --mode serve --gen-cap 3072 --batch 16 \
    --kv-int8 --n-req 32 || true

echo "=== B2. paged engine at the same cap, bf16 pages ==="
timeout 3600 python bench.py --mode serve --paged --gen-cap 3072 \
    --batch 16 --n-req 32 || true

echo "=== B3. paged engine, int8 pages ==="
timeout 3600 python bench.py --mode serve --paged --gen-cap 3072 \
    --batch 16 --kv-int8 --n-req 32 || true

echo "=== C1. LoRA 1.7B bs8, remat=none (no recompute; dw-skip LCE) ==="
timeout 2400 python bench.py --mode train --preset qwen3-1.7b \
    --train-batch 8 --remat none --lce-chunk 1024 || true

echo "=== C2. LoRA 1.7B bs16, remat=hot (dw-skip LCE) ==="
timeout 2400 python bench.py --mode train --preset qwen3-1.7b \
    --train-batch 16 --remat hot --lce-chunk 1024 || true

echo "=== C3. QLoRA 1.7B best-of-C shape ==="
timeout 2400 python bench.py --mode train --qlora --preset qwen3-1.7b \
    --train-batch 16 --remat hot --lce-chunk 1024 || true

echo "=== D. 8B op point, int8 decoder + int8 encoders, batch 8 ==="
timeout 2400 python bench.py --mode fusion --int8 --int8-encoders \
    --preset qwen3-8b --k-tokens 1024 --batch 8 --prompt-len 128 \
    --new-tokens 128 || true
timeout 2400 python bench.py --mode fusion --int8 --int8-encoders \
    --preset qwen3-8b --k-tokens 1024 --batch 4 --prompt-len 128 \
    --new-tokens 128 || true

echo "=== E1. adaptive ring, chunk 128 / probe 32 (K2) ==="
timeout 2400 python bench.py --mode serve --offline \
    --spec-lookup 8 --spec-adapt 0.2 \
    --spec-adapt-chunk 128 --spec-adapt-probe 32 || true

echo "=== E2. shadow adaptive, chunk 128, random workload (K3) ==="
timeout 2400 python bench.py --mode serve --offline \
    --spec-lookup 8 --spec-adapt 0.2 --spec-adapt-chunk 128 || true

echo "=== E3. shadow adaptive, copy-trained workload (K3'') ==="
timeout 2400 python bench.py --mode serve --offline --preset qwen3-0.6b \
    --spec-workload copy --spec-lookup 8 --spec-adapt 0.2 \
    --spec-adapt-chunk 128 || true
