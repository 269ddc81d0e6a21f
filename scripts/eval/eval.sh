#!/bin/bash
# Benchmark evaluation (reference eval/eval.sh): convert inference JSONL
# then compute per-task metrics grouped by omics.
set -e
python -m molly_tpu.tools.cli convert --src "${INPUT:?}" --dst "${INPUT%.jsonl}_eval.jsonl"
python -m molly_tpu.evalsuite.harness \
  --input_file_path "${INPUT%.jsonl}_eval.jsonl" \
  --model_name "${MODEL_NAME:-molly_tpu}" --OMICS "${OMICS:-All}"
