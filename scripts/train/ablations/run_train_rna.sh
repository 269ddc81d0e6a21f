#!/bin/bash
# Ablation: train on the rna task subset only
# (reference scripts/train/run_train_rna.sh).
MODALITIES=rna exec "$(dirname "$0")/run_ablation.sh" "$@"
