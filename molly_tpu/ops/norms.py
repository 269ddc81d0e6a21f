"""Normalization ops. XLA-fused by default; a Pallas fused RMSNorm kernel
(molly_tpu.ops.rmsnorm_pallas) plugs in behind the same signature on TPU
(replaces the reference's Liger fused RMSNorm, SURVEY.md §2.3)."""

from __future__ import annotations

import jax.numpy as jnp

_RMSNORM_IMPL = "xla"


def set_rmsnorm_impl(name: str) -> None:
    global _RMSNORM_IMPL
    assert name in ("xla", "pallas"), name
    _RMSNORM_IMPL = name


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm matching HF Qwen3RMSNorm: fp32 accumulation, weight applied
    after the cast back to input dtype."""
    if _RMSNORM_IMPL == "pallas" and x.ndim >= 2 and x.shape[-1] % 128 == 0:
        from .rmsnorm_pallas import rms_norm_pallas
        return rms_norm_pallas(x, weight, eps)
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return weight * xf.astype(dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float) -> jnp.ndarray:
    """LayerNorm matching torch.nn.LayerNorm (fp32 stats)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    return (xf.astype(dtype) * weight + bias).astype(dtype)
