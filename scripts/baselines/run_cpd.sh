#!/bin/bash
# Baseline: cpd (reference baselines/scripts/run_cpd.sh)
MODEL_TYPE=NT METRIC=mcc NUM_LABELS=2 TASK=cpd exec "$(dirname "$0")/run_baseline.sh" "$@"
