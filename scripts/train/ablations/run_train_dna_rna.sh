#!/bin/bash
# Ablation: train on the dna + rna task subset only
# (reference scripts/train/run_train_dna_rna.sh).
MODALITIES=dna,rna exec "$(dirname "$0")/run_ablation.sh" "$@"
