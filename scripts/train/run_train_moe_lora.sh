#!/bin/bash
# LoRA fine-tune of the Qwen3-MoE flagship (beyond the reference, which
# is dense-only): adapters go on the attention projections AND the
# expert stacks ([L, E, d, r], grouped low-rank bypass inside the sparse
# dispatch — models/lora.py). Base weights stay frozen, so the 30B
# parameter stack shards read-only over expert x fsdp while only the
# adapters + projectors train. E.g. on a v5e-16: MESH_EXPERT=4.
set -e
exec python -m molly_tpu.training.cli \
  --experiment-name molly_moe_lora \
  --text-model-path "${TEXT_MODEL:-/models/qwen3-30b-a3b}" \
  --dna-rna-model-path "${NT_MODEL:-/models/nucleotide-transformer-500m}" \
  --protein-model-path "${ESM_MODEL:-/models/esm2_650m}" \
  --text-preset qwen3-30b-a3b \
  --train-dataset-path "${TRAIN_DATA:?set TRAIN_DATA}" \
  ${EVAL_DATA:+--eval-dataset-path "$EVAL_DATA"} \
  --use-lora true --lora-r 64 --lora-alpha 64 --lora-dropout 0.05 \
  --max-len 1024 --dna-rna-k-tokens 128 --protein-k-tokens 128 \
  --batch-size-per-gpu 4 --gradient-accumulation-steps 2 \
  --lr 1e-4 --warmup 0.03 --lr-decay-style cosine \
  --epochs 3 --eval-interval 200 --save-interval 500 \
  --mesh-expert "${MESH_EXPERT:-4}" --mesh-fsdp -1 \
  --output-dir runs/molly_moe_lora "$@"
