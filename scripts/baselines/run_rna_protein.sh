#!/bin/bash
# Baseline: rna_protein (reference baselines/scripts/run_rna_protein.sh)
MODEL_TYPE=NT+ESM METRIC=mcc NUM_LABELS=2 TASK=rna_protein exec "$(dirname "$0")/run_baseline.sh" "$@"
