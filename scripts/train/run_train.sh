#!/bin/bash
# Main SFT run — the reference scripts/train/run_train.sh equivalent:
# Qwen3-8B + NT + ESM2-650M, frozen encoders, trainable projectors + LLM.
# One process drives the whole TPU slice (GSPMD replaces the deepspeed
# launcher + ZeRO-2 config).
set -e
TEXT_MODEL=${TEXT_MODEL:-/models/qwen3-8b}
NT_MODEL=${NT_MODEL:-/models/nucleotide-transformer-500m}
ESM_MODEL=${ESM_MODEL:-/models/esm2_650m}

python -m molly_tpu.training.cli \
  --experiment-name molly_8b_sft \
  --text-model-path "$TEXT_MODEL" \
  --dna-rna-model-path "$NT_MODEL" \
  --protein-model-path "$ESM_MODEL" \
  --text-preset qwen3-8b \
  --train-dataset-path "${TRAIN_DATA:?set TRAIN_DATA}" \
  --eval-dataset-path "${EVAL_DATA}" \
  --max-len 1024 --dna-rna-k-tokens 128 --protein-k-tokens 128 \
  --batch-size-per-gpu 4 --gradient-accumulation-steps 4 \
  --lr 1e-5 --warmup 0.03 --lr-decay-style cosine \
  --train-bio false --train-mlp true --train-llm true \
  --gradient-checkpointing true \
  --epochs 2 --eval-interval 200 --save-interval 500 \
  --mesh-fsdp -1 \
  --output-dir runs/molly_8b_sft "$@"
