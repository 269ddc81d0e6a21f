"""Logit processing + sampling, matching the reference inference settings
(/root/reference/src/inference_lora.py:288-299: temperature 0.8, top-p 0.95,
top-k 20, repetition penalty) and HF's processor order
(repetition penalty -> temperature -> top-k -> top-p).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


def apply_repetition_penalty(logits: jnp.ndarray, presence: jnp.ndarray,
                             penalty: float) -> jnp.ndarray:
    """HF RepetitionPenaltyLogitsProcessor: for seen tokens, positive logits
    are divided by the penalty, negative multiplied. presence: [B, V] bool."""
    if penalty == 1.0:
        return logits
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(presence, penalized, logits)


def top_k_filter(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 0:
        return logits
    kth = jnp.sort(logits, axis=-1)[..., -k][..., None]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_filter(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering (HF convention: keep the smallest set with
    cumulative prob > p, always keeping the most probable token)."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while cumulative prob (exclusive) < p
    keep_sorted = (cum - probs) < p
    # threshold = smallest kept logit
    threshold = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < threshold, NEG_INF, logits)


def sample_tokens(
    logits: jnp.ndarray,  # [B, V]
    rng: jax.Array,
    *,
    do_sample: bool = True,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
    repetition_penalty: float = 1.0,
    presence: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    if presence is not None:
        logits = apply_repetition_penalty(logits, presence, repetition_penalty)
    if not do_sample:
        return jnp.argmax(logits, axis=-1)
    if temperature != 1.0:
        logits = logits / temperature
    if top_k:
        # fast path: lax.top_k once, then top-p within the (already sorted)
        # k candidates — avoids two full-vocab sorts per decode step.
        # (A chunked per-vocab-slice top-k + merge measured 1.3x faster
        # standalone but 7% SLOWER inside the decode loop — kept out.)
        vals, idx = jax.lax.top_k(logits, top_k)  # [B, k] desc
        if top_p < 1.0:
            probs = jax.nn.softmax(vals, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            keep = (cum - probs) < top_p  # always keeps the top candidate
            vals = jnp.where(keep, vals, NEG_INF)
        choice = jax.random.categorical(rng, vals, axis=-1)
        return jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]
    if top_p < 1.0:
        logits = top_p_filter(logits, top_p)
    return jax.random.categorical(rng, logits, axis=-1)
