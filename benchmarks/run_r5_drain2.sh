#!/usr/bin/env bash
# Round-5 drain #2: reruns after the pool-layout fix (22a34f3) and the
# stall-instead-of-crash fix — plus the 8B int8-KV op-point retry that
# hit a runtime ResourceExhausted mid-queue.
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

# ask #3: the 3072-cap paged-vs-dense comparison, post layout fix
run B2r_paged_int8_16slot 4800 python bench.py --mode serve --paged --gen-cap 3072 \
    --batch 16 --kv-int8 --page-size 128 --n-req 32
run B4r_paged_32slot 4800 python bench.py --mode serve --paged --gen-cap 3072 \
    --batch 32 --kv-int8 --page-size 128 --kv-pages 400 --n-req 48
run B3r_paged_halfpool 4800 python bench.py --mode serve --paged --gen-cap 3072 \
    --batch 16 --kv-int8 --page-size 128 --kv-pages 200 --n-req 32
# ask #5: the 8B op point retry (runtime RESOURCE_EXHAUSTED last time;
# compile passed, so retry standalone before accepting the negative)
run D3r_8b_b8_kvint8 2400 python bench.py --mode fusion --int8 --int8-encoders \
    --kv-int8 --preset qwen3-8b --k-tokens 1024 --batch 8 --prompt-len 128 --new-tokens 128
echo "=== [$(date +%H:%M:%S)] drain2 complete ==="
