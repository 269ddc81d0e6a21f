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


def sample_tokens_rowwise(logits: jnp.ndarray, rng: jax.Array,
                          samp: dict, presence: jnp.ndarray,
                          *, max_top_k: int) -> jnp.ndarray:
    """Per-ROW sampling parameters for mixed-request serving.

    ``samp`` carries traced [B] arrays — ``greedy`` (bool),
    ``temperature``, ``top_k`` (1..max_top_k), ``top_p``,
    ``repetition_penalty`` — so ONE compiled decode program serves any
    parameter mix (per-request sampling in the API server / engine).
    Matches :func:`sample_tokens` exactly when every row carries the same
    values: same processor order (penalty -> temperature -> top-k ->
    top-p), same single categorical draw (identical rng stream when
    ``max_top_k == top_k``). ``max_top_k`` is the STATIC candidate width;
    0 = no top-k path (full-vocab nucleus), matching ``top_k=0``."""
    logits = logits.astype(jnp.float32)
    pen = samp["repetition_penalty"][:, None]
    penalized = jnp.where(logits > 0, logits / pen, logits * pen)
    logits = jnp.where(presence, penalized, logits)
    greedy_tok = jnp.argmax(logits, axis=-1)
    logits = logits / jnp.maximum(samp["temperature"], 1e-6)[:, None]
    if max_top_k:
        vals, idx = jax.lax.top_k(logits, max_top_k)  # [B, K] desc
        pos = jnp.arange(max_top_k)[None, :]
        vals = jnp.where(pos < samp["top_k"][:, None], vals, NEG_INF)
        probs = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        vals = jnp.where((cum - probs) < samp["top_p"][:, None], vals,
                         NEG_INF)
        choice = jax.random.categorical(rng, vals, axis=-1)
        sampled = jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]
    else:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < samp["top_p"][:, None]
        thr = jnp.min(jnp.where(keep, sorted_logits, jnp.inf), axis=-1,
                      keepdims=True)
        sampled = jax.random.categorical(
            rng, jnp.where(logits < thr, NEG_INF, logits), axis=-1)
    return jnp.where(samp["greedy"], greedy_tok, sampled)


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
