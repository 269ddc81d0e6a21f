"""Attention dispatch: XLA reference implementation now, Pallas flash behind
the same interface (molly_tpu.ops.flash_attention) for TPU hot paths.

Replaces the reference's flash-attention-2/3 dependency
(/root/reference/src/train.py:578-582) with a TPU-native design: one
functional entry point, implementation chosen by flag/platform.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

# auto: Pallas flash on TPU, XLA reference elsewhere (env override for
# experiments: MOLLY_ATTN=xla|flash|auto)
_IMPL = os.environ.get("MOLLY_ATTN", "auto")
assert _IMPL in ("auto", "xla", "flash"), _IMPL


def set_attention_impl(name: str) -> None:
    global _IMPL
    assert name in ("auto", "xla", "flash"), name
    _IMPL = name


def get_attention_impl() -> str:
    return _IMPL


def _resolve_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    return "flash" if jax.default_backend() == "tpu" else "xla"


def repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """[B, S, Nkv, Dh] -> [B, S, Nkv*n_rep, Dh] (GQA head expansion)."""
    if n_rep == 1:
        return x
    b, s, nkv, dh = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :], (b, s, nkv, n_rep, dh))
    return x.reshape(b, s, nkv * n_rep, dh)


def dot_product_attention(
    q: jnp.ndarray,  # [B, Sq, Nq, Dh]
    k: jnp.ndarray,  # [B, Skv, Nkv, Dh]
    v: jnp.ndarray,  # [B, Skv, Nkv, Dh]
    *,
    mask: Optional[jnp.ndarray] = None,  # [B, Skv] 1=keep, or bool [B,1,Sq,Skv]
    causal: bool = False,
    scale: Optional[float] = None,
    q_offset: int | jnp.ndarray = 0,  # absolute position of q[0] (decode step)
    impl: Optional[str] = None,
    kv_layout: str = "bsnd",  # or "bnsd" (head-major KV cache, decode path)
    kv_scales: Optional[jnp.ndarray] = None,  # int8 KV cache: [B,Nkv,Skv,2]
    #   per-column symmetric scales (k half, v half); k-scale multiplies
    #   the logit column, v-scale folds into the softmax weights — the
    #   int8 operands feed the dots directly (convert-into-dot fusion)
) -> jnp.ndarray:
    """Scaled dot-product attention with GQA, padding mask, causal mask.

    Softmax is computed in float32 regardless of input dtype (matches both
    HF eager attention and what the Pallas flash kernel does).
    """
    impl = _resolve_impl(impl or _IMPL)
    # flash path: decode steps (Sq==1) stay on XLA (bandwidth-bound, no
    # benefit); traced q_offset can't feed the static kernel params;
    # int8-cache reads (kv_scales) are XLA-only
    if (impl == "flash" and q.shape[1] > 1 and isinstance(q_offset, int)
            and kv_scales is None and (mask is None or mask.ndim == 2)):
        from .flash_attention import flash_attention
        if kv_layout == "bnsd":  # one-time per prefill, not per decode step
            k = k.transpose(0, 2, 1, 3)
            v = v.transpose(0, 2, 1, 3)
        return flash_attention(q, k, v, mask, causal, scale, q_offset)
    return _xla_attention(q, k, v, mask=mask, causal=causal, scale=scale,
                          q_offset=q_offset, kv_layout=kv_layout,
                          kv_scales=kv_scales)


def _xla_attention(q, k, v, *, mask, causal, scale, q_offset=0,
                   kv_layout="bsnd", kv_scales=None):
    b, sq, nq, dh = q.shape
    if kv_layout == "bsnd":
        skv, nkv = k.shape[1], k.shape[2]
        k_sub, v_sub = "bknd", "bknd"
    else:  # "bnsd": head-major cache — both dots read it with no transpose
        nkv, skv = k.shape[1], k.shape[2]
        k_sub, v_sub = "bnkd", "bnkd"
    if scale is None:
        scale = dh ** -0.5
    n_rep = nq // nkv
    # grouped-query einsum: never materializes repeated K/V (matters for
    # decode, where the KV cache read dominates)
    qg = q.reshape(b, sq, nkv, n_rep, dh)

    if kv_scales is not None:  # int8 KV cache (bnsd decode path only)
        assert kv_layout == "bnsd", kv_layout
        k = k.astype(q.dtype)  # convert fuses into the dot (int8-weights
        v_eff = v.astype(q.dtype)  # pattern, benchmarks/README.md)
    else:
        v_eff = v

    # [B, Nkv, G, Sq, Skv]
    logits = jnp.einsum(f"bqngd,{k_sub}->bngqk", qg, k,
                        preferred_element_type=jnp.float32)
    logits = logits * scale
    if kv_scales is not None:
        # per-column k scale multiplies its logit column
        logits = logits * kv_scales[..., 0][:, :, None, None, :]

    neg = jnp.finfo(jnp.float32).min
    if mask is not None:
        if mask.ndim == 2:  # [B, Skv] padding mask
            bias = jnp.where(mask[:, None, None, None, :] != 0, 0.0, neg)
        else:  # bool [B, 1, Sq, Skv]
            bias = jnp.where(mask[:, :, None], 0.0, neg)
        logits = logits + bias.astype(jnp.float32)
    if causal:
        # q_offset may be per-row [B] (serving slots at different lengths)
        # or scalar (shared prefill/decode step)
        q_off = jnp.atleast_1d(jnp.asarray(q_offset))  # [B] or [1]
        q_pos = jnp.arange(sq)[None, :] + q_off[:, None]  # [B|1, sq]
        kv_pos = jnp.arange(skv)
        causal_mask = q_pos[..., None] >= kv_pos  # [B|1, sq, skv]
        logits = jnp.where(causal_mask[:, None, None], logits, neg)

    probs = jax.nn.softmax(logits, axis=-1)
    if kv_scales is not None:
        # per-column v scale folds into the softmax weights
        probs = probs * kv_scales[..., 1][:, :, None, None, :]
    out = jnp.einsum(f"bngqk,{v_sub}->bqngd", probs.astype(v_eff.dtype),
                     v_eff, preferred_element_type=jnp.float32)
    return out.reshape(b, sq, nq, dh).astype(q.dtype)
