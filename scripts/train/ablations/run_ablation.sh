#!/bin/bash
# Shared task-subset ablation launcher (reference scripts/train/
# run_train_{dna,rna,protein,dna_rna,dna_protein,rna_protein}.sh train on
# pre-filtered parquets; here the subset is carved on the fly).
# Usage: MODALITIES=dna,protein ./run_ablation.sh  (or via the wrappers)
set -e
MODALITIES=${MODALITIES:?set MODALITIES, e.g. dna,rna}
TAG=${MODALITIES//,/_}
WORK=${WORK:-runs/ablation_$TAG}
mkdir -p "$WORK"

python -m molly_tpu.tools.cli ablation \
  --src "${TRAIN_DATA:?set TRAIN_DATA}" --dst "$WORK/train_$TAG.parquet" \
  --modalities "$MODALITIES"
if [ -n "$EVAL_DATA" ]; then
  python -m molly_tpu.tools.cli ablation \
    --src "$EVAL_DATA" --dst "$WORK/val_$TAG.parquet" \
    --modalities "$MODALITIES"
  EVAL_ARGS="--eval-dataset-path $WORK/val_$TAG.parquet"
fi

python -m molly_tpu.training.cli \
  --experiment-name "molly_ablation_$TAG" \
  --text-model-path "${TEXT_MODEL:-/models/qwen3-4b}" \
  --dna-rna-model-path "${NT_MODEL:-/models/nucleotide-transformer-500m}" \
  --protein-model-path "${ESM_MODEL:-/models/esm2_650m}" \
  --text-preset "${TEXT_PRESET:-qwen3-4b}" \
  --train-dataset-path "$WORK/train_$TAG.parquet" $EVAL_ARGS \
  --max-len 1024 --dna-rna-k-tokens 128 --protein-k-tokens 128 \
  --batch-size-per-gpu 4 --gradient-accumulation-steps 4 \
  --lr 1e-5 --warmup 0.03 --lr-decay-style cosine \
  --train-bio false --train-mlp true --train-llm true \
  --epochs 3 --eval-interval 200 --save-interval 500 \
  --mesh-fsdp -1 \
  --output-dir "$WORK" "$@"
