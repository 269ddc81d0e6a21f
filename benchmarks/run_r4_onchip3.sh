#!/usr/bin/env bash
# Round-4 on-chip follow-ups #3: the acceptance-adaptive ring.
# Three-way comparison on BOTH workload extremes — the auto-policy must
# track the better fixed mode on each:
#   random workload: plain ring 4,024 tok/s, fixed-spec floor 1,814
#     (adaptive should land near plain minus the probe overhead)
#   copy-trained span-quoting workload: fixed-spec >> plain
#     (adaptive should land near fixed-spec; EMA stays high)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== K. adaptive ring, random workload (vs plain 4024 / spec 1814) ==="
timeout 2400 python bench.py --mode serve --offline \
    --spec-lookup 8 --spec-adapt 0.2 || true

echo "=== K'. adaptive ring, copy-trained span-quoting workload ==="
timeout 2400 python bench.py --mode serve --offline --preset qwen3-0.6b \
    --spec-workload copy --spec-lookup 8 --spec-adapt 0.2 || true

echo "=== E''''. 8B reference op point retry at batch 4 (batch 8 OOM'd:"
echo "    int8 8B ~10.4 GB + NT-500M/ESM2-650M encoders ~2.3 GB + KV) ==="
timeout 2400 python bench.py --mode fusion --int8 --kv-int8 \
    --preset qwen3-8b --k-tokens 1024 --batch 4 --prompt-len 128 \
    --new-tokens 128 || true
