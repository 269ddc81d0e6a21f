#!/bin/bash
# Baseline: modification (reference baselines/scripts/run_modification.sh)
MODEL_TYPE=NT METRIC=auc NUM_LABELS=13 LABEL_SET=modification MULTI_LABEL=1 TASK=modification exec "$(dirname "$0")/run_baseline.sh" "$@"
