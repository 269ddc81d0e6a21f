from .configs import (
    EsmConfig,
    Qwen3Config,
    ESM_PRESETS,
    QWEN3_PRESETS,
    tiny_esm,
    tiny_moe,
    tiny_qwen3,
)
from . import esm, qwen3, hf_import
