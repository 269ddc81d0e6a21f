#!/bin/bash
# Full fine-tune (no LoRA, all text params trainable) of the 0.6B preset
# on ONE chip — the smallest full-FT config that fits 16 GB; the bench
# analogue is `python bench.py --mode train --full-ft --preset qwen3-0.6b`
# (measured numbers in benchmarks/README.md).
set -e
exec python -m molly_tpu.training.cli \
  --experiment-name molly_06B_fullft \
  --text-model-path "${TEXT_MODEL:-/models/qwen3-0.6b}" \
  --dna-rna-model-path "${NT_MODEL:-/models/nucleotide-transformer-500m}" \
  --protein-model-path "${ESM_MODEL:-/models/esm2_8m}" \
  --text-preset qwen3-0.6b \
  --train-dataset-path "${TRAIN_DATA:?set TRAIN_DATA}" \
  --max-len 1024 --dna-rna-k-tokens 128 --protein-k-tokens 128 \
  --batch-size-per-gpu 8 --gradient-accumulation-steps 1 \
  --gradient-checkpointing true --remat-policy dots \
  --train-bio false --train-mlp true --train-llm true \
  --prefetch-depth 2 --cache-dataset true \
  --lr 1e-5 --warmup 0.03 --lr-decay-style cosine \
  --output-dir runs/molly_06B_fullft "$@"
