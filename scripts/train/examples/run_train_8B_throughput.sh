#!/bin/bash
# 8B throughput example (analogue of the reference's
# examples/run_train_8B_z0_b1.sh: FA3, ZeRO-0, micro-batch 1). 8B bf16
# training state does not fit one 16 GB v5e chip (benchmarks/README.md);
# this config shards params+optimizer over the full fsdp axis (the
# ZeRO-3 equivalent expressed as GSPMD sharding rules) with remat —
# validated by the driver's multi-chip dryrun; run it on a slice.
set -e
exec python -m molly_tpu.training.cli \
  --experiment-name molly_8B_throughput \
  --text-model-path "${TEXT_MODEL:?}" \
  --dna-rna-model-path "${NT_MODEL:?}" \
  --protein-model-path "${ESM_MODEL:?}" \
  --text-preset qwen3-8b \
  --train-dataset-path "${TRAIN_DATA:?}" \
  --max-len 3072 --dna-rna-k-tokens 1024 --protein-k-tokens 1024 \
  --batch-size-per-gpu 1 --gradient-accumulation-steps 1 \
  --gradient-checkpointing true --mesh-fsdp -1 \
  --prefetch-depth 2 --cache-dataset true \
  --output-dir runs/molly_8B_throughput "$@"
