"""molly_tpu pytree -> HF-format checkpoint export (safetensors).

Inverse of hf_import: lets checkpoints trained here be loaded by the
reference stack / HF transformers (checkpoint interop, SURVEY.md §5.4).
Linears are transposed back to torch's [out, in]; the stacked [L, ...]
layer axis is unstacked into per-layer keys.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np

from .configs import Qwen3Config


def _np32(x) -> np.ndarray:
    a = np.asarray(x)
    if a.dtype == np.dtype("bfloat16") if hasattr(np, "bfloat16") else False:
        a = a.astype(np.float32)
    return a


def qwen3_to_hf_state(params: Dict[str, Any],
                      cfg: Qwen3Config) -> Dict[str, np.ndarray]:
    """Our stacked pytree -> HF Qwen3ForCausalLM key layout."""
    def t(x):  # [in, out] -> [out, in]
        return np.asarray(x).T

    state: Dict[str, np.ndarray] = {
        "model.embed_tokens.weight": np.asarray(params["embed"]),
        "model.norm.weight": np.asarray(params["final_norm"]),
    }
    lp = params["layers"]
    L = cfg.num_hidden_layers
    per_layer = {
        "input_layernorm.weight": ("input_norm", False),
        "post_attention_layernorm.weight": ("post_attn_norm", False),
        "self_attn.q_proj.weight": ("q_proj", True),
        "self_attn.k_proj.weight": ("k_proj", True),
        "self_attn.v_proj.weight": ("v_proj", True),
        "self_attn.o_proj.weight": ("o_proj", True),
        "self_attn.q_norm.weight": ("q_norm", False),
        "self_attn.k_norm.weight": ("k_norm", False),
    }
    if cfg.num_experts:  # Qwen3MoeForCausalLM layout
        for i in range(L):
            state[f"model.layers.{i}.mlp.gate.weight"] = t(
                lp["router"][i])
            for j in range(cfg.num_experts):
                for hf_name, ours in (("gate_proj", "expert_gate"),
                                      ("up_proj", "expert_up"),
                                      ("down_proj", "expert_down")):
                    state[f"model.layers.{i}.mlp.experts.{j}."
                          f"{hf_name}.weight"] = t(lp[ours][i, j])
    else:
        per_layer.update({
            "mlp.gate_proj.weight": ("gate_proj", True),
            "mlp.up_proj.weight": ("up_proj", True),
            "mlp.down_proj.weight": ("down_proj", True),
        })
    for i in range(L):
        for hf_key, (ours, transpose) in per_layer.items():
            a = np.asarray(lp[ours][i])
            state[f"model.layers.{i}.{hf_key}"] = a.T if transpose else a
    if not cfg.tie_word_embeddings:
        state["lm_head.weight"] = t(params["lm_head"])
    return state


def peft_lora_to_hf_state(lora: Dict[str, Any],
                          cfg: Qwen3Config) -> Dict[str, np.ndarray]:
    """models.lora pytree -> PEFT adapter state-dict keys (inverse of
    hf_import.peft_lora_from_hf): adapters trained here load into the
    reference's GPU PEFT stack (/root/reference/src/inference_lora.py:
    214-234 reads exactly this layout). a [L, in, r] -> per-layer
    ``lora_A.weight`` [r, in]; expert-stacked [L, E, in, r] unstacks to
    ``mlp.experts.{j}.*`` keys."""
    from .hf_import import _peft_target_path

    pre = "base_model.model.model.layers.{i}."
    state: Dict[str, np.ndarray] = {}
    for target, ab in lora["layers"].items():
        a, b = _np32(ab["a"]), _np32(ab["b"])
        if target.startswith("expert_"):
            hf_t = target.replace("expert_", "") + "_proj"
            for i in range(a.shape[0]):
                for j in range(a.shape[1]):
                    k = pre.format(i=i) + f"mlp.experts.{j}.{hf_t}"
                    state[k + ".lora_A.weight"] = np.ascontiguousarray(
                        a[i, j].T)
                    state[k + ".lora_B.weight"] = np.ascontiguousarray(
                        b[i, j].T)
        else:
            for i in range(a.shape[0]):
                k = pre.format(i=i) + _peft_target_path(target)
                state[k + ".lora_A.weight"] = np.ascontiguousarray(a[i].T)
                state[k + ".lora_B.weight"] = np.ascontiguousarray(b[i].T)
    return state


def save_hf_checkpoint(path: str, params: Dict[str, Any],
                       cfg: Qwen3Config) -> None:
    """Write model.safetensors + a minimal config.json HF can read."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    state = qwen3_to_hf_state(params, cfg)
    # - bf16 has no numpy dtype: upcast to fp32
    # - safetensors serializes the raw buffer, silently corrupting
    #   non-contiguous views (e.g. our transposes): force contiguity
    def fix(v):
        if v.dtype.kind not in "fiu" or str(v.dtype) == "bfloat16":
            v = v.astype(np.float32)
        return np.ascontiguousarray(v)

    state = {k: fix(v) for k, v in state.items()}
    save_file(state, os.path.join(path, "model.safetensors"))
    config = {
        "architectures": ["Qwen3ForCausalLM"],
        "model_type": "qwen3",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "num_key_value_heads": cfg.num_key_value_heads,
        "head_dim": cfg.head_dim,
        "rms_norm_eps": cfg.rms_norm_eps,
        "rope_theta": cfg.rope_theta,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "max_position_embeddings": cfg.max_position_embeddings,
        "hidden_act": "silu",
        "torch_dtype": "float32",
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
