"""ESM-family bidirectional encoder (ESM-2 protein + nucleotide-transformer
DNA/RNA), pure-functional JAX.

Architecture spec: HF ``modeling_esm.py`` — the reference loads both of its
frozen encoders through this class family
(/root/reference/src/train.py:121-152, /root/reference/src/model/config.py:37-46).
Faithful details that matter for logit parity:
  - token-dropout embedding rescale: mask tokens zeroed, then scale by
    (1-0.15*0.8)/(1-observed_mask_ratio) (modeling_esm.py:215-221)
  - embeddings multiplied by the attention mask (:230-231)
  - pre-LN blocks; Q scaled by head_dim^-0.5 BEFORE rotary (:360-366)
  - rotary theta=1e4 on positions 0..S-1; absolute variant uses RoBERTa-style
    pad-offset position ids (padding_idx + cumsum of mask)
  - exact-erf GELU (:56-60), final emb_layer_norm_after (:565-566)

Same TPU-first layout as qwen3.py: stacked [L, ...] params + lax.scan.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import quant
from ..ops.attention import dot_product_attention
from ..ops.norms import layer_norm
from ..ops.rope import apply_rope, rope_cos_sin
from .configs import EsmConfig

Params = Dict[str, Any]

MASK_RATIO_TRAIN = 0.15 * 0.8  # hardcoded in ESM (modeling_esm.py:217)

_LINEAR_NAMES = ("q", "k", "v", "attn_out", "ffn_in", "ffn_out", "ffn_gate")


def quantize_for_decode(params: Params) -> Params:
    """Int8-quantize the encoder's stacked linear weights for serving.

    The frozen NT-500M + ESM2-650M encoders sit in HBM as ~2.3 GB of bf16
    at the reference operating point (/root/reference/scripts/infer/
    inference_nt_lora.sh:25-36 loads both at batch 32); int8 weights halve
    that, freeing room for larger decode batches on a 16 GB chip. Per-layer
    per-output-column symmetric scales; embeddings and layernorms stay in
    the model dtype. lax.scan slices the stacked {w_q, scale} dicts
    per-layer, so ops.quant.linear dispatches with no layer-loop changes.
    """
    out = dict(params)
    layers = dict(params["layers"])
    for name in _LINEAR_NAMES:
        if name not in layers:
            continue
        w = layers[name].astype(jnp.float32)          # [L, K, N]
        amax = jnp.max(jnp.abs(w), axis=1)            # [L, N]
        scale = jnp.maximum(amax / 127.0, 1e-12)
        w_q = jnp.clip(jnp.round(w / scale[:, None, :]), -127, 127)
        layers[name] = {"w_q": w_q.astype(jnp.int8), "scale": scale}
    out["layers"] = layers
    return out


def erf_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """The original-ESM gelu; jax.nn.gelu(approximate=False) matches erf."""
    return jax.nn.gelu(x, approximate=False)


def init_params(cfg: EsmConfig, key: jax.Array) -> Params:
    dt = jnp.dtype(cfg.dtype)
    ks = iter(jax.random.split(key, 24))
    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers

    def lin(k, *shape):
        return (0.02 * jax.random.normal(k, shape, dtype=jnp.float32)).astype(dt)

    def ln(*shape):
        return {"weight": jnp.ones(shape, dt), "bias": jnp.zeros(shape, dt)}

    params: Params = {
        "embed": lin(next(ks), cfg.vocab_size, H),
        "layers": {
            "attn_ln": ln(L, H),
            "q": lin(next(ks), L, H, H), "q_b": jnp.zeros((L, H), dt),
            "k": lin(next(ks), L, H, H), "k_b": jnp.zeros((L, H), dt),
            "v": lin(next(ks), L, H, H), "v_b": jnp.zeros((L, H), dt),
            "attn_out": lin(next(ks), L, H, H),
            "attn_out_b": jnp.zeros((L, H), dt),
            "ffn_ln": ln(L, H),
            "ffn_in": lin(next(ks), L, H, I), "ffn_in_b": jnp.zeros((L, I), dt),
            "ffn_out": lin(next(ks), L, I, H), "ffn_out_b": jnp.zeros((L, H), dt),
            **({"ffn_gate": lin(next(ks), L, H, I)}
               if cfg.mlp_type == "swiglu" else {}),
        },
        "final_ln": ln(H),
    }
    if cfg.emb_layer_norm_before:
        params["emb_ln"] = ln(H)
    if cfg.position_embedding_type == "absolute":
        params["pos_embed"] = lin(next(ks), cfg.max_position_embeddings, H)
    return params


def _layer(cfg: EsmConfig, hidden, p, cos, sin, mask):
    B, S, H = hidden.shape
    N, Dh = cfg.num_attention_heads, cfg.head_dim

    x = layer_norm(hidden, p["attn_ln"]["weight"], p["attn_ln"]["bias"],
                   cfg.layer_norm_eps)
    # quant.linear dispatches int8 {w_q, scale} dicts (quantize_for_decode)
    # or plain bf16 matrices
    q = (quant.linear(x, p["q"]) + p["q_b"]).reshape(B, S, N, Dh)
    k = (quant.linear(x, p["k"]) + p["k_b"]).reshape(B, S, N, Dh)
    v = (quant.linear(x, p["v"]) + p["v_b"]).reshape(B, S, N, Dh)
    # ESM scales Q before rotary (modeling_esm.py:360-366), so attention
    # itself runs with scale=1.
    q = q * (Dh ** -0.5)
    if cfg.position_embedding_type == "rotary":
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    attn = dot_product_attention(q, k, v, mask=mask, causal=False, scale=1.0)
    attn = quant.linear(attn.reshape(B, S, H), p["attn_out"]) + p["attn_out_b"]
    hidden = hidden + attn

    x = layer_norm(hidden, p["ffn_ln"]["weight"], p["ffn_ln"]["bias"],
                   cfg.layer_norm_eps)
    if cfg.mlp_type == "swiglu":
        x = jax.nn.silu(quant.linear(x, p["ffn_gate"])) * quant.linear(
            x, p["ffn_in"])
    else:
        x = erf_gelu(quant.linear(x, p["ffn_in"]) + p["ffn_in_b"])
    x = quant.linear(x, p["ffn_out"])
    if cfg.mlp_bias:
        x = x + p["ffn_out_b"]
    return hidden + x


def forward_hidden(
    params: Params,
    cfg: EsmConfig,
    input_ids: jnp.ndarray,          # [B, S]
    attention_mask: Optional[jnp.ndarray] = None,  # [B, S] 1=real
    output_hidden_states: bool = False,
) -> jnp.ndarray:
    """Returns final hidden states [B, S, H] (after emb_layer_norm_after) —
    what the fusion model projects (/root/reference/src/model/omics_one.py:91).
    With output_hidden_states, returns (final, per-layer [L, B, S, H])."""
    if attention_mask is None:
        attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
    dt = jnp.dtype(cfg.dtype)
    emb = jnp.take(params["embed"], input_ids, axis=0, mode="clip")

    if cfg.token_dropout:
        is_mask = (input_ids == cfg.mask_token_id)
        emb = jnp.where(is_mask[..., None], 0.0, emb)
        src_len = jnp.sum(attention_mask, axis=-1).astype(jnp.float32)
        observed = jnp.sum(is_mask, axis=-1).astype(jnp.float32) / src_len
        scale = (1.0 - MASK_RATIO_TRAIN) / (1.0 - observed)
        emb = (emb * scale[:, None, None]).astype(dt)

    if cfg.position_embedding_type == "absolute":
        # RoBERTa-style pad-offset ids (modeling_esm.py create_position_ids)
        m = attention_mask.astype(jnp.int32)
        pos_ids = jnp.cumsum(m, axis=1) * m + cfg.pad_token_id
        emb = emb + jnp.take(params["pos_embed"], pos_ids, axis=0, mode="clip")

    if cfg.emb_layer_norm_before:
        emb = layer_norm(emb, params["emb_ln"]["weight"],
                         params["emb_ln"]["bias"], cfg.layer_norm_eps)
    emb = (emb * attention_mask[..., None]).astype(dt)

    S = input_ids.shape[1]
    cos, sin = rope_cos_sin(jnp.arange(S), cfg.head_dim, 10000.0, dtype=dt)

    def body(h, layer_params):
        h = _layer(cfg, h, layer_params, cos, sin, attention_mask)
        return h, (h if output_hidden_states else None)

    if cfg.remat:
        body = jax.checkpoint(body)
    hidden, per_layer = jax.lax.scan(body, emb, params["layers"])

    hidden = layer_norm(hidden, params["final_ln"]["weight"],
                        params["final_ln"]["bias"], cfg.layer_norm_eps)
    if output_hidden_states:
        return hidden, per_layer
    return hidden
