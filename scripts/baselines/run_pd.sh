#!/bin/bash
# Baseline: pd (reference baselines/scripts/run_pd.sh)
MODEL_TYPE=NT METRIC=mcc NUM_LABELS=2 TASK=pd exec "$(dirname "$0")/run_baseline.sh" "$@"
