#!/bin/bash
# Ablation: train on the dna + protein task subset only
# (reference scripts/train/run_train_dna_protein.sh).
MODALITIES=dna,protein exec "$(dirname "$0")/run_ablation.sh" "$@"
