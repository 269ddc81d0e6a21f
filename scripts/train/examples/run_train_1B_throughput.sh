#!/bin/bash
# Throughput-tuned 1B example (analogue of the reference's
# scripts/train/examples/run_train_1B_z2_b1.sh, which exists to show the
# Liger+FlashAttention-2 fast path). On TPU the fast path is default-on:
# Pallas flash attention + chunked fused linear-cross-entropy (the Liger
# equivalents) are always active; this script pins the measured-fastest
# single-chip knobs instead. Measured on 1x v5e (bench.py --mode train,
# LoRA variant of this config): ~5.4k tok/s; see benchmarks/README.md.
set -e
exec python -m molly_tpu.training.cli \
  --experiment-name molly_1B_throughput \
  --text-model-path "${TEXT_MODEL:-/models/qwen3-1.7b}" \
  --dna-rna-model-path "${NT_MODEL:-/models/nucleotide-transformer-500m}" \
  --protein-model-path "${ESM_MODEL:-/models/esm2_8m}" \
  --text-preset qwen3-1.7b \
  --train-dataset-path "${TRAIN_DATA:?set TRAIN_DATA}" \
  --max-len 1024 --dna-rna-k-tokens 128 --protein-k-tokens 128 \
  --batch-size-per-gpu 4 --gradient-accumulation-steps 1 \
  --gradient-checkpointing true \
  --use-lora true --lora-r 64 \
  --prefetch-depth 2 --cache-dataset true \
  --lr 1e-4 --warmup 0.03 --lr-decay-style cosine \
  --output-dir runs/molly_1B_throughput "$@"
