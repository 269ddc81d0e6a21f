#!/bin/bash
# Ablation: train on the protein task subset only
# (reference scripts/train/run_train_protein.sh).
MODALITIES=protein exec "$(dirname "$0")/run_ablation.sh" "$@"
