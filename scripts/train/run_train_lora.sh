#!/bin/bash
# LoRA fine-tune (reference pre_train_lora recipe: r=64, alpha=64,
# dropout 0.05, frozen encoders + base LLM, trainable projectors).
set -e
python -m molly_tpu.training.cli \
  --experiment-name molly_lora \
  --text-model-path "${TEXT_MODEL:?}" \
  --dna-rna-model-path "${NT_MODEL:?}" \
  --protein-model-path "${ESM_MODEL:?}" \
  --train-dataset-path "${TRAIN_DATA:?}" \
  --use-lora true --lora-r 64 --lora-alpha 64 --lora-dropout 0.05 \
  --max-len 1024 --lr 1e-4 \
  --output-dir runs/molly_lora "$@"
