#!/usr/bin/env bash
# Round-4 on-chip follow-ups #5: shadow-draft adaptive ring re-measure.
# With probes off (shadow estimation keeps the EMA live during plain
# chunks for free), the random-workload adaptive number should close on
# plain-ring 4,024 minus only the chunk cond-boundary copies; the
# copy-trained workload should ride the fixed-spec win unchanged.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== K3. shadow adaptive, random workload, chunk 128 (vs plain 4024) ==="
timeout 2400 python bench.py --mode serve --offline \
    --spec-lookup 8 --spec-adapt 0.2 --spec-adapt-chunk 128 || true

echo "=== K3'. shadow adaptive, random workload, chunk 256 ==="
timeout 2400 python bench.py --mode serve --offline \
    --spec-lookup 8 --spec-adapt 0.2 --spec-adapt-chunk 256 || true

echo "=== K3''. shadow adaptive, copy-trained span-quoting workload ==="
timeout 2400 python bench.py --mode serve --offline --preset qwen3-0.6b \
    --spec-workload copy --spec-lookup 8 --spec-adapt 0.2 \
    --spec-adapt-chunk 128 || true
