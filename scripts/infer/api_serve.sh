#!/usr/bin/env bash
# OpenAI-compatible serving of a molly checkpoint (beyond the reference,
# whose only inference mode is the batch script scripts/infer/*.sh).
# Clients: any OpenAI SDK pointed at http://HOST:PORT/v1 — per-request
# temperature/top_k/top_p/repetition_penalty/max_tokens/stop honored.
set -euo pipefail
MODEL=${MODEL:-/path/to/qwen3-1.7b}       # HF dir (tokenizer + weights)
ADAPTER=${ADAPTER:-}                      # optional PEFT adapter dir
PORT=${PORT:-8000}

python -m molly_tpu.inference.cli \
    --api-serve --host 0.0.0.0 --port "$PORT" \
    --text-model-path "$MODEL" \
    ${ADAPTER:+--peft-adapter "$ADAPTER"} \
    --int8 \
    --batch-size 16 \
    --max-length 3072 --max-new-tokens 1024 \
    --dna-rna-k-tokens 1024 --protein-k-tokens 1024
