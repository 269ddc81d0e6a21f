#!/bin/bash
# Ablation: train on the dna task subset only
# (reference scripts/train/run_train_dna.sh).
MODALITIES=dna exec "$(dirname "$0")/run_ablation.sh" "$@"
