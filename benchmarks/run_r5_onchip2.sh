#!/usr/bin/env bash
# Round-5 follow-ups #2:
#  A'. paged kernel parity rerun (leg A of run_r5_onchip.sh died on a
#      sys.path bug, fixed)
#  J''. the train-step attribution, now SPLIT into small --only subsets so
#      a single remote-compile network error can no longer kill the whole
#      leg (it has died whole 3 times: r4 twice on network, r5 on timeout)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== A'. paged kernel on-chip parity (Dh=128, bf16 + int8 pools) ==="
timeout 1200 python benchmarks/paged_kernel_parity.py || true

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
