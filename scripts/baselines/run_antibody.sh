#!/bin/bash
# Baseline: antibody (reference baselines/scripts/run_antibody.sh)
MODEL_TYPE=ESM+ESM METRIC=mcc NUM_LABELS=2 TASK=antibody exec "$(dirname "$0")/run_baseline.sh" "$@"
