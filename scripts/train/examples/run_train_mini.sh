#!/bin/bash
# Tiny random-weight smoke run on CPU (the reference README mentions
# run_train_mini.sh; SURVEY.md §4). Generates its own toy data.
set -e
TMP=$(mktemp -d)
python - <<PY
import pandas as pd
rows = [{"task": "pd-prom_300", "input": f"Is <dna>ACGTACGTACGT</dna> a promoter v{i}?",
         "output": "Yes" if i % 2 else "No", "think": "", "label": "", "kind": "dna"}
        for i in range(32)]
pd.DataFrame(rows).to_parquet("$TMP/train.parquet")
PY
JAX_PLATFORMS=cpu python -m molly_tpu.training.cli \
  --train-dataset-path "$TMP/train.parquet" \
  --tiny --dtype float32 --max-len 192 \
  --dna-rna-k-tokens 8 --protein-k-tokens 8 \
  --batch-size-per-gpu 4 --train-iters 3 --log-interval 1 \
  --output-dir "$TMP/run" "$@"
echo "mini train OK: $TMP/run"
