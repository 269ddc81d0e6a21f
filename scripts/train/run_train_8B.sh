#!/bin/bash
# Long-sequence 8B run (reference run_train_8B.sh: seq 3072, k-tokens 1024,
# micro-bs 1).
set -e
python -m molly_tpu.training.cli \
  --experiment-name molly_8b_long \
  --text-model-path "${TEXT_MODEL:?}" \
  --dna-rna-model-path "${NT_MODEL:?}" \
  --protein-model-path "${ESM_MODEL:?}" \
  --text-preset qwen3-8b \
  --train-dataset-path "${TRAIN_DATA:?}" \
  --max-len 3072 --dna-rna-k-tokens 1024 --protein-k-tokens 1024 \
  --batch-size-per-gpu 1 --gradient-accumulation-steps 4 \
  --gradient-checkpointing true --mesh-fsdp -1 \
  --output-dir runs/molly_8b_long "$@"
