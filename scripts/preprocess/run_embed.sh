#!/bin/bash
# Embedding + 2-D projection tool (reference scripts/preprocess/run_embed.sh)
set -e
python - <<'PY'
import os, jax
from molly_tpu.data import (DataConfig, NucleotideTokenizer, OmicsDataset,
                            ProteinTokenizer, load_text_tokenizer)
from molly_tpu.models import ESM_PRESETS, QWEN3_PRESETS, fusion
from molly_tpu.models.fusion import FusionConfig
from molly_tpu.tools.embed import run_embedding

data = os.environ["DATA"]
cfg = FusionConfig(text=QWEN3_PRESETS[os.environ.get("PRESET", "qwen3-1.7b")],
                   dna_rna=ESM_PRESETS["nt-500m"],
                   protein=ESM_PRESETS["esm2-650m"])
text_tok = load_text_tokenizer(os.environ.get("TEXT_MODEL"))
ds = OmicsDataset(data, text_tok, NucleotideTokenizer(), ProteinTokenizer(),
                  DataConfig(max_len=1024))
params = fusion.init_params(cfg, jax.random.key(0))  # or load a checkpoint
print(run_embedding(ds, params, cfg, os.environ.get("OUT", "embeddings")))
PY
