#!/bin/bash
# Per-task domain-loss logging example (analogue of the reference's
# examples/run_train_1B_domain.sh, which monkeypatches the HF Trainer and
# re-materializes full logits per sample, domain_loss.py:1120-1131).
# Here per-task losses fall out of the chunked fused-LCE per-token nll at
# no extra logit materialization (ops/lce.py + fusion.loss_from_hidden).
set -e
exec python -m molly_tpu.training.cli \
  --experiment-name molly_1B_domain \
  --text-model-path "${TEXT_MODEL:-/models/qwen3-1.7b}" \
  --dna-rna-model-path "${NT_MODEL:-/models/nucleotide-transformer-500m}" \
  --protein-model-path "${ESM_MODEL:-/models/esm2_650m}" \
  --text-preset qwen3-1.7b \
  --train-dataset-path "${TRAIN_DATA:?set TRAIN_DATA}" \
  --max-len 1024 --dna-rna-k-tokens 128 --protein-k-tokens 128 \
  --batch-size-per-gpu 4 --gradient-accumulation-steps 2 \
  --compute-domain-losses true --log-interval 1 \
  --output-dir runs/molly_1B_domain "$@"
