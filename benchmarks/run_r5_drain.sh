#!/usr/bin/env bash
# Round-5 consolidated drain: every queued-but-unexecuted leg from
# run_r5_onchip{3,4,5}.sh, ordered by verdict-ask priority. Logs one
# file per leg under benchmarks/logs/ so results survive the session.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p benchmarks/logs
run() {  # run <name> <timeout_s> <cmd...>
    local name="$1" to="$2"; shift 2
    echo "=== [$(date +%H:%M:%S)] $name ==="
    timeout "$to" "$@" > "benchmarks/logs/$name.log" 2>&1
    local rc=$?
    echo "--- $name rc=$rc; tail:"; tail -3 "benchmarks/logs/$name.log"
}

# -- ask #3: paged kernel first on-chip execution + 3072-cap comparison
run A3_paged_parity 1800 python benchmarks/paged_kernel_parity.py
run B2_paged_int8_16slot 4800 python bench.py --mode serve --paged --gen-cap 3072 \
    --batch 16 --kv-int8 --page-size 128 --n-req 32
# -- ask #5: 8B op point over the 224 floor
run D2_8b_b12 2400 python bench.py --mode fusion --int8 --int8-encoders \
    --preset qwen3-8b --k-tokens 1024 --batch 12 --prompt-len 128 --new-tokens 128
run D3_8b_b8_kvint8 2400 python bench.py --mode fusion --int8 --int8-encoders \
    --kv-int8 --preset qwen3-8b --k-tokens 1024 --batch 8 --prompt-len 128 --new-tokens 128
run D4_8b_b16_kvint8 2400 python bench.py --mode fusion --int8 --int8-encoders \
    --kv-int8 --preset qwen3-8b --k-tokens 1024 --batch 16 --prompt-len 128 --new-tokens 128
# -- ask #4: LoRA 1.7B MFU push
run C2_lora_bs16_c512 2400 python bench.py --mode train --preset qwen3-1.7b \
    --train-batch 16 --remat hot --lce-chunk 512
run C4_lora_bs8_skip8 2400 python bench.py --mode train --preset qwen3-1.7b \
    --train-batch 8 --remat hot --remat-skip 8 --lce-chunk 1024
run C5_lora_bs8_skip16 2400 python bench.py --mode train --preset qwen3-1.7b \
    --train-batch 8 --remat hot --remat-skip 16 --lce-chunk 1024
run C6_lora_bs8_skip24 2400 python bench.py --mode train --preset qwen3-1.7b \
    --train-batch 8 --remat hot --remat-skip 24 --lce-chunk 1024
# -- ask #6: calibrated-threshold end-to-end + same-day plain control
run F1_plain_control 2400 python bench.py --mode serve --offline
run F2_calibrated_random 2400 python bench.py --mode serve --offline \
    --spec-lookup 8 --spec-adapt 0.2 --spec-calibrate --spec-adapt-chunk 128
run F3_calibrated_copy 2400 python bench.py --mode serve --offline --preset qwen3-0.6b \
    --spec-workload copy --spec-lookup 8 --spec-adapt 0.2 --spec-calibrate \
    --spec-adapt-chunk 128
# -- round-4 ask: 8B QLoRA scaling story
run G1_8b_qlora_bs2 2400 python bench.py --mode train --qlora --preset qwen3-8b \
    --train-batch 2 --remat full --lce-chunk 1024
run G2_8b_qlora_bs4 2400 python bench.py --mode train --qlora --preset qwen3-8b \
    --train-batch 4 --remat full --lce-chunk 1024
# -- ask #3b tail: paged oversubscription + 32-slot budget
run B3_paged_halfpool 4800 python bench.py --mode serve --paged --gen-cap 3072 \
    --batch 16 --kv-int8 --page-size 128 --kv-pages 200 --n-req 32
run B4_paged_32slot 4800 python bench.py --mode serve --paged --gen-cap 3072 \
    --batch 32 --kv-int8 --page-size 128 --kv-pages 400 --n-req 48
# -- ask #4 attribution: where does the LoRA step spend its time
run J_attr_full_outer 1500 python benchmarks/ablate_train.py --preset qwen3-0.6b \
    --batch 16 --remat full --only step grads fwd
run J_attr_full_dec 1500 python benchmarks/ablate_train.py --preset qwen3-0.6b \
    --batch 16 --remat full --only dec_grads dec_fwd body_grads
run J_attr_hot_outer 1500 python benchmarks/ablate_train.py --preset qwen3-0.6b \
    --batch 16 --remat hot --only step grads fwd
run J_attr_hot_dec 1500 python benchmarks/ablate_train.py --preset qwen3-0.6b \
    --batch 16 --remat hot --only dec_grads dec_fwd body_grads
echo "=== [$(date +%H:%M:%S)] drain complete ==="
