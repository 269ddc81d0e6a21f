#!/bin/bash
# Baseline: tf_m (reference baselines/scripts/run_tf_m.sh)
MODEL_TYPE=NT METRIC=mcc NUM_LABELS=2 TASK=tf_m exec "$(dirname "$0")/run_baseline.sh" "$@"
