"""Rotary position embeddings (GPT-NeoX half-split convention).

Both Qwen3 (HF modeling_qwen3.py:86-116) and ESM (HF modeling_esm.py:44-121)
use the same rotate-half convention: split the head dim in two contiguous
halves, ``out = x*cos + rotate_half(x)*sin`` with ``cos/sin = f(cat(freqs,
freqs))``. They differ only in theta (1e6 vs 1e4) and where Q-scaling happens
(ESM scales Q *before* rotary; Qwen3 scales inside attention).
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float,
                 dtype=jnp.float32):
    """cos/sin tables for given positions.

    positions: int array [...]. Returns (cos, sin) of shape [..., head_dim],
    computed in float32 then cast to ``dtype`` (matches HF, which runs the
    rotary table in fp32 regardless of model dtype).
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x: [B, S, N, Dh]; cos/sin: [B, S, Dh] or [S, Dh] (broadcast over heads)."""
    if cos.ndim < x.ndim:  # insert the head axis before Dh
        cos = cos[..., None, :]
        sin = sin[..., None, :]
    return x * cos + rotate_half(x) * sin
