#!/bin/bash
# SFT at the 4B scale (reference scripts/train/run_train_4B.sh):
# Qwen3-4b + NT-500M + ESM2-650M, frozen encoders.
set -e
exec python -m molly_tpu.training.cli \
  --experiment-name molly_4B_sft \
  --text-model-path "${TEXT_MODEL:-/models/qwen3-4b}" \
  --dna-rna-model-path "${NT_MODEL:-/models/nucleotide-transformer-500m}" \
  --protein-model-path "${ESM_MODEL:-/models/esm2_650m}" \
  --text-preset qwen3-4b \
  --train-dataset-path "${TRAIN_DATA:?set TRAIN_DATA}" \
  ${EVAL_DATA:+--eval-dataset-path "$EVAL_DATA"} \
  --max-len 1024 --dna-rna-k-tokens 128 --protein-k-tokens 128 \
  --batch-size-per-gpu 8 --gradient-accumulation-steps 2 \
  --lr 1e-5 --warmup 0.03 --lr-decay-style cosine \
  --train-bio false --train-mlp true --train-llm true \
  --epochs 3 --eval-interval 200 --save-interval 500 \
  --mesh-fsdp -1 \
  --output-dir runs/molly_4B_sft "$@"
