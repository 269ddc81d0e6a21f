#!/bin/bash
# Shared encoder+head baseline launcher (reference baselines/scripts/*.sh).
# Wrappers below set MODEL_TYPE/METRIC/NUM_LABELS per task; Evo2 variants
# are a documented non-goal (SURVEY.md §7, CUDA-only dependency).
set -e
python -m molly_tpu.baselines.train \
  --model-type "${MODEL_TYPE:?}" \
  --train-file "${TRAIN_DATA:?set TRAIN_DATA}" \
  ${EVAL_DATA:+--eval-file "$EVAL_DATA"} \
  --metric "${METRIC:-acc}" \
  --num-labels "${NUM_LABELS:-2}" \
  ${LABEL_SET:+--label-set "$LABEL_SET"} \
  ${MULTI_LABEL:+--multi-label} \
  --dna-rna-k-tokens 1024 --protein-k-tokens 1024 \
  --batch-size 8 --epochs 5 --lr 1e-4 \
  --output-dir "runs/baseline_${TASK:-task}" "$@"
