#!/bin/bash
# Batch inference (reference scripts/infer/inference_nt_lora.sh: batch 32,
# max-length 3072, k-tokens 1024, sampling T=0.8/top-p 0.95/top-k 20).
set -e
python -m molly_tpu.inference.cli \
  --input-file "${INPUT:?set INPUT}" \
  --output-file "${OUTPUT:?set OUTPUT}" \
  --text-model-path "${TEXT_MODEL}" \
  --checkpoint "${CHECKPOINT}" \
  --adapter "${ADAPTER}" \
  --batch-size 32 --max-length 3072 --max-new-tokens 3072 \
  --dna-rna-k-tokens 1024 --protein-k-tokens 1024 \
  --temperature 0.8 --top-p 0.95 --top-k 20 --repetition-penalty 1.1 "$@"
