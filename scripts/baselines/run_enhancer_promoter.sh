#!/bin/bash
# Baseline: enhancer_promoter (reference baselines/scripts/run_enhancer_promoter.sh)
MODEL_TYPE=NT+NT METRIC=mcc NUM_LABELS=2 TASK=enhancer_promoter exec "$(dirname "$0")/run_baseline.sh" "$@"
