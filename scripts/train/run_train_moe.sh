#!/bin/bash
# SFT with a Qwen3-MoE text model (beyond the reference, which trains
# dense Qwen3 only): qwen3-30b-a3b (128 experts, top-8, ~3B active) +
# frozen NT-500M / ESM2-650M encoders. Experts shard over the expert
# mesh axis (EP), everything else over fsdp — e.g. on a v5e-16:
# --mesh-expert 4 --mesh-fsdp 4.
set -e
exec python -m molly_tpu.training.cli \
  --experiment-name molly_moe_sft \
  --text-model-path "${TEXT_MODEL:-/models/qwen3-30b-a3b}" \
  --dna-rna-model-path "${NT_MODEL:-/models/nucleotide-transformer-500m}" \
  --protein-model-path "${ESM_MODEL:-/models/esm2_650m}" \
  --text-preset qwen3-30b-a3b \
  --train-dataset-path "${TRAIN_DATA:?set TRAIN_DATA}" \
  ${EVAL_DATA:+--eval-dataset-path "$EVAL_DATA"} \
  --max-len 1024 --dna-rna-k-tokens 128 --protein-k-tokens 128 \
  --batch-size-per-gpu 4 --gradient-accumulation-steps 4 \
  --lr 1e-5 --warmup 0.03 --lr-decay-style cosine \
  --train-bio false --train-mlp true --train-llm true \
  --gradient-checkpointing true --remat-policy dots \
  --epochs 3 --eval-interval 200 --save-interval 500 \
  --mesh-expert "${MESH_EXPERT:-4}" --mesh-fsdp -1 \
  --output-dir runs/molly_moe_sft "$@"
