#!/usr/bin/env bash
# Round-5 drain #3: paged legs on the fixed engine (512-token kernel
# blocks + auto continuation bucket) and the 8B op-point batch-10 probe.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p benchmarks/logs
run() {
    local name="$1" to="$2"; shift 2
    echo "=== [$(date +%H:%M:%S)] $name ==="
    timeout "$to" "$@" > "benchmarks/logs/$name.log" 2>&1
    local rc=$?
    echo "--- $name rc=$rc; tail:"; tail -3 "benchmarks/logs/$name.log"
}

run B2rr_paged_int8_16slot 4800 python bench.py --mode serve --paged --gen-cap 3072 \
    --batch 16 --kv-int8 --page-size 128 --n-req 32
run D5_8b_b10 2400 python bench.py --mode fusion --int8 --int8-encoders \
    --preset qwen3-8b --k-tokens 1024 --batch 10 --prompt-len 128 --new-tokens 128
run B4rr_paged_32slot 4800 python bench.py --mode serve --paged --gen-cap 3072 \
    --batch 32 --kv-int8 --page-size 128 --kv-pages 400 --n-req 48
run B3rr_paged_halfpool 4800 python bench.py --mode serve --paged --gen-cap 3072 \
    --batch 16 --kv-int8 --page-size 128 --kv-pages 200 --n-req 32
echo "=== [$(date +%H:%M:%S)] drain3 complete ==="
