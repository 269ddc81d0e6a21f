#!/bin/bash
# Ablation: train on the rna + protein task subset only
# (reference scripts/train/run_train_rna_protein.sh).
MODALITIES=rna,protein exec "$(dirname "$0")/run_ablation.sh" "$@"
