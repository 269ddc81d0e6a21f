#!/bin/bash
# Baseline: ncrna (reference baselines/scripts/run_ncrna.sh)
MODEL_TYPE=NT METRIC=acc NUM_LABELS=13 LABEL_SET=ncrna TASK=ncrna exec "$(dirname "$0")/run_baseline.sh" "$@"
