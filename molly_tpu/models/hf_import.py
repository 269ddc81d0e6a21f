"""HF checkpoint -> molly_tpu pytree importers.

Maps the published checkpoints the reference trains from (Qwen3-*/ESM-2/
nucleotide-transformer, /root/reference/src/train.py:121-152) into the
stacked-[L,...] pytrees of models.qwen3 / models.esm. Works from either an
in-memory state dict (torch tensors or numpy arrays — used by the golden
parity tests) or a checkpoint directory with *.safetensors /
pytorch_model.bin.

Torch nn.Linear stores weight as [out, in]; our kernels are [in, out], so
every linear is transposed on import.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, Mapping

import numpy as np

from .configs import EsmConfig, Qwen3Config


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor (bf16 has no numpy dtype -> go through fp32)
    try:
        import torch
        if isinstance(x, torch.Tensor):
            if x.dtype == torch.bfloat16:
                x = x.to(torch.float32)
            return x.detach().cpu().numpy()
    except ImportError:
        pass
    return np.asarray(x)


def load_hf_state(path: str) -> Dict[str, np.ndarray]:
    """Read all tensors from a local HF checkpoint directory."""
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    state: Dict[str, np.ndarray] = {}
    if st_files:
        from safetensors import safe_open
        for f in st_files:
            with safe_open(f, framework="np") as sf:
                for key in sf.keys():
                    state[key] = sf.get_tensor(key)
        return state
    bin_path = os.path.join(path, "pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch
        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: _np(v) for k, v in sd.items()}
    raise FileNotFoundError(f"no safetensors or pytorch_model.bin in {path}")


def _stack(state: Mapping[str, Any], fmt: str, n_layers: int,
           transpose: bool = False) -> np.ndarray:
    arrs = []
    for i in range(n_layers):
        a = _np(state[fmt.format(i=i)])
        arrs.append(a.T if transpose else a)
    return np.stack(arrs)


def qwen3_from_hf(state: Mapping[str, Any], cfg: Qwen3Config,
                  dtype=None) -> Dict[str, Any]:
    """HF Qwen3ForCausalLM state dict -> models.qwen3 params."""
    import jax.numpy as jnp
    dt = np.dtype(dtype or cfg.dtype)
    L = cfg.num_hidden_layers
    pre = "model."
    if not any(k.startswith(pre) for k in state):
        pre = ""  # bare Qwen3Model

    def one(key, transpose=False):
        a = _np(state[key])
        return (a.T if transpose else a).astype(dt)

    lf = pre + "layers.{i}."
    params = {
        "embed": one(pre + "embed_tokens.weight"),
        "layers": {
            "input_norm": _stack(state, lf + "input_layernorm.weight", L).astype(dt),
            "post_attn_norm": _stack(
                state, lf + "post_attention_layernorm.weight", L).astype(dt),
            "q_proj": _stack(state, lf + "self_attn.q_proj.weight", L, True).astype(dt),
            "k_proj": _stack(state, lf + "self_attn.k_proj.weight", L, True).astype(dt),
            "v_proj": _stack(state, lf + "self_attn.v_proj.weight", L, True).astype(dt),
            "o_proj": _stack(state, lf + "self_attn.o_proj.weight", L, True).astype(dt),
            "q_norm": _stack(state, lf + "self_attn.q_norm.weight", L).astype(dt),
            "k_norm": _stack(state, lf + "self_attn.k_norm.weight", L).astype(dt),
        },
        "final_norm": one(pre + "norm.weight"),
    }
    if cfg.num_experts:
        # Qwen3MoeForCausalLM: mlp.gate = router Linear [E, H];
        # mlp.experts.{j}.{gate,up,down}_proj per expert -> stacked
        # [L, E, H, I] / [L, E, I, H] for the layer scan + EP sharding
        E = cfg.num_experts
        params["layers"]["router"] = _stack(
            state, lf + "mlp.gate.weight", L, True).astype(
                np.promote_types(np.float32, dt))  # router never below f32

        def experts(name, li):
            return np.stack([
                _np(state[lf.format(i=li) +
                          f"mlp.experts.{j}.{name}.weight"]).T
                for j in range(E)])

        for name, key in (("gate_proj", "expert_gate"),
                          ("up_proj", "expert_up"),
                          ("down_proj", "expert_down")):
            params["layers"][key] = np.stack(
                [experts(name, li) for li in range(L)]).astype(dt)
    else:
        params["layers"]["gate_proj"] = _stack(
            state, lf + "mlp.gate_proj.weight", L, True).astype(dt)
        params["layers"]["up_proj"] = _stack(
            state, lf + "mlp.up_proj.weight", L, True).astype(dt)
        params["layers"]["down_proj"] = _stack(
            state, lf + "mlp.down_proj.weight", L, True).astype(dt)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = one("lm_head.weight", transpose=True)
    return {k: _to_jnp(v) for k, v in params.items()}


def esm_from_hf(state: Mapping[str, Any], cfg: EsmConfig,
                dtype=None) -> Dict[str, Any]:
    """HF EsmForMaskedLM (or EsmModel) state dict -> models.esm params."""
    dt = np.dtype(dtype or cfg.dtype)
    L = cfg.num_hidden_layers
    pre = "esm." if any(k.startswith("esm.") for k in state) else ""
    lf = pre + "encoder.layer.{i}."

    def one(key, transpose=False):
        a = _np(state[key])
        return (a.T if transpose else a).astype(dt)

    def ln_stack(fmt):
        return {
            "weight": _stack(state, fmt + ".weight", L).astype(dt),
            "bias": _stack(state, fmt + ".bias", L).astype(dt),
        }

    params = {
        "embed": one(pre + "embeddings.word_embeddings.weight"),
        "layers": {
            "attn_ln": ln_stack(lf + "attention.LayerNorm"),
            "q": _stack(state, lf + "attention.self.query.weight", L, True).astype(dt),
            "q_b": _stack(state, lf + "attention.self.query.bias", L).astype(dt),
            "k": _stack(state, lf + "attention.self.key.weight", L, True).astype(dt),
            "k_b": _stack(state, lf + "attention.self.key.bias", L).astype(dt),
            "v": _stack(state, lf + "attention.self.value.weight", L, True).astype(dt),
            "v_b": _stack(state, lf + "attention.self.value.bias", L).astype(dt),
            "attn_out": _stack(state, lf + "attention.output.dense.weight", L,
                               True).astype(dt),
            "attn_out_b": _stack(state, lf + "attention.output.dense.bias", L).astype(dt),
            "ffn_ln": ln_stack(lf + "LayerNorm"),
            "ffn_in": _stack(state, lf + "intermediate.dense.weight", L, True).astype(dt),
            "ffn_out": _stack(state, lf + "output.dense.weight", L, True).astype(dt),
        },
        "final_ln": {
            "weight": one(pre + "encoder.emb_layer_norm_after.weight"),
            "bias": one(pre + "encoder.emb_layer_norm_after.bias"),
        },
    }
    if cfg.mlp_bias:
        params["layers"]["ffn_in_b"] = _stack(
            state, lf + "intermediate.dense.bias", L).astype(dt)
        params["layers"]["ffn_out_b"] = _stack(
            state, lf + "output.dense.bias", L).astype(dt)
    else:
        # bias-free FFN (NT-v2): keep zero biases so the pytree structure
        # matches init_params
        params["layers"]["ffn_in_b"] = np.zeros(
            (L, cfg.intermediate_size), dt)
        params["layers"]["ffn_out_b"] = np.zeros((L, cfg.hidden_size), dt)
    if cfg.mlp_type == "swiglu":
        # NT-v2 custom-code checkpoints name the gate differently across
        # releases; accept the known variants
        for cand in ("intermediate.gate_proj.weight", "gate_proj.weight",
                     "intermediate.dense_gate.weight", "mlp.gate.weight"):
            if (lf.format(i=0) + cand).replace("{i}", "0") in state or \
                    lf.format(i=0) + cand in state:
                params["layers"]["ffn_gate"] = _stack(
                    state, lf + cand, L, True).astype(dt)
                break
        else:
            raise KeyError(
                "could not locate the SwiGLU gate weight in this checkpoint; "
                "expected one of intermediate.gate_proj/gate_proj/"
                "intermediate.dense_gate/mlp.gate")
    if cfg.emb_layer_norm_before:
        params["emb_ln"] = {
            "weight": one(pre + "embeddings.layer_norm.weight"),
            "bias": one(pre + "embeddings.layer_norm.bias"),
        }
    if cfg.position_embedding_type == "absolute":
        params["pos_embed"] = one(pre + "embeddings.position_embeddings.weight")
    return {k: _to_jnp(v) for k, v in params.items()}


def _to_jnp(tree):
    import jax.numpy as jnp
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)


def qwen3_cfg_from_hf_config(hf_cfg, **overrides) -> Qwen3Config:
    """Build our config from a transformers Qwen3Config object or dict."""
    get = (hf_cfg.get if isinstance(hf_cfg, dict)
           else lambda k, d=None: getattr(hf_cfg, k, d))
    kw = dict(
        vocab_size=get("vocab_size"),
        hidden_size=get("hidden_size"),
        intermediate_size=get("intermediate_size"),
        num_hidden_layers=get("num_hidden_layers"),
        num_attention_heads=get("num_attention_heads"),
        num_key_value_heads=get("num_key_value_heads"),
        head_dim=get("head_dim"),
        rms_norm_eps=get("rms_norm_eps"),
        rope_theta=get("rope_theta"),
        tie_word_embeddings=get("tie_word_embeddings"),
        max_position_embeddings=get("max_position_embeddings"),
    )
    if get("num_experts"):  # Qwen3MoeConfig
        kw.update(
            num_experts=get("num_experts"),
            num_experts_per_tok=get("num_experts_per_tok", 8),
            norm_topk_prob=bool(get("norm_topk_prob", True)),
            router_aux_coef=get("router_aux_loss_coef", 1e-3),
            intermediate_size=get("moe_intermediate_size"),
        )
    kw.update(overrides)
    return Qwen3Config(**kw)


def esm_cfg_from_hf_config(hf_cfg, **overrides) -> EsmConfig:
    get = (hf_cfg.get if isinstance(hf_cfg, dict)
           else lambda k, d=None: getattr(hf_cfg, k, d))
    kw = dict(
        vocab_size=get("vocab_size"),
        hidden_size=get("hidden_size"),
        intermediate_size=get("intermediate_size"),
        num_hidden_layers=get("num_hidden_layers"),
        num_attention_heads=get("num_attention_heads"),
        position_embedding_type=get("position_embedding_type", "absolute"),
        emb_layer_norm_before=bool(get("emb_layer_norm_before", False)),
        token_dropout=bool(get("token_dropout", False)),
        layer_norm_eps=get("layer_norm_eps", 1e-5),
        pad_token_id=get("pad_token_id", 1),
        mask_token_id=get("mask_token_id", 32),
        max_position_embeddings=get("max_position_embeddings", 1026),
    )
    kw.update(overrides)
    return EsmConfig(**kw)


def peft_lora_from_hf(state: Mapping[str, Any], cfg: Qwen3Config,
                      lora_r: int, dtype=np.float32) -> Dict[str, Any]:
    """PEFT adapter state dict -> models.lora pytree.

    The reference saves LoRA runs as a PEFT adapter + two projector .bins
    (/root/reference/src/trainer/omics_trainer.py:85-105) and reloads them
    at inference (/root/reference/src/inference_lora.py:214-234). PEFT key
    shape: ``base_model.model.model.layers.{i}.self_attn.q_proj.
    lora_A.weight`` [r, in] / ``lora_B.weight`` [out, r]; ours is
    a [L, in, r] / b [L, r, out].
    """
    from .lora import LORA_TARGETS

    # locate the key prefix (PEFT nests differently across versions)
    sample = None
    for k in state:
        if "lora_A" in k and "layers.0." in k:
            sample = k
            break
    if sample is None:
        raise KeyError("no lora_A weights found in adapter state dict")
    prefix = sample.split("layers.0.")[0]

    L = cfg.num_hidden_layers
    layers: Dict[str, Any] = {}
    for target in LORA_TARGETS:
        a_fmt = prefix + "layers.{i}." + _peft_target_path(target) + \
            ".lora_A.weight"
        b_fmt = prefix + "layers.{i}." + _peft_target_path(target) + \
            ".lora_B.weight"
        if a_fmt.format(i=0) not in state:
            continue  # adapter trained on a subset of targets
        layers[target] = {
            "a": _stack(state, a_fmt, L, transpose=True).astype(dtype),
            "b": _stack(state, b_fmt, L, transpose=True).astype(dtype),
        }
    if cfg.num_experts:
        # PEFT on HF Qwen3Moe adapts every expert's gate/up/down Linear:
        # mlp.experts.{j}.{target}.lora_A — stack [L, E, in, r]/[L, E, r, out]
        for hf_t, ours in (("gate_proj", "expert_gate"),
                           ("up_proj", "expert_up"),
                           ("down_proj", "expert_down")):
            fmt = (prefix + "layers.{i}.mlp.experts.{j}." + hf_t
                   + ".lora_{ab}.weight")
            if fmt.format(i=0, j=0, ab="A") not in state:
                continue
            def stack_e(ab):
                return np.stack([
                    np.stack([_np(state[fmt.format(i=i, j=j, ab=ab)]).T
                              for j in range(cfg.num_experts)])
                    for i in range(L)])
            layers[ours] = {"a": stack_e("A").astype(dtype),
                            "b": stack_e("B").astype(dtype)}
    if not layers:
        raise KeyError("no recognized LoRA targets in adapter state dict")
    return _to_jnp({"layers": layers})


def _peft_target_path(target: str) -> str:
    if target in ("q_proj", "k_proj", "v_proj", "o_proj"):
        return f"self_attn.{target}"
    return f"mlp.{target}"


def projector_from_hf(state: Mapping[str, Any], dtype=np.float32
                      ) -> Dict[str, Any]:
    """A single nn.Linear state dict ({weight, bias}) -> projector pytree
    (the dna_rna_projector.bin / protein_projector.bin files the reference
    exports, omics_trainer.py:85-105)."""
    # keys may be prefixed (e.g. 'dna_rna_projector.weight')
    wkey = next(k for k in state if k.endswith("weight"))
    bkey = next(k for k in state if k.endswith("bias"))
    return _to_jnp({
        "kernel": _np(state[wkey]).astype(dtype).T,
        "bias": _np(state[bkey]).astype(dtype),
    })
