#!/bin/bash
# Baseline: solubility (reference baselines/scripts/run_solubility.sh)
MODEL_TYPE=ESM METRIC=acc NUM_LABELS=2 TASK=solubility exec "$(dirname "$0")/run_baseline.sh" "$@"
