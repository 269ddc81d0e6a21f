#!/bin/bash
# Baseline: functionec (reference baselines/scripts/run_functionec.sh)
MODEL_TYPE=ESM METRIC=fmax NUM_LABELS=538 LABEL_SET=ec MULTI_LABEL=1 TASK=functionec exec "$(dirname "$0")/run_baseline.sh" "$@"
