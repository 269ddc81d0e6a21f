"""Normalization ops. XLA-fused by default; a Pallas fused RMSNorm kernel
(molly_tpu.ops.rmsnorm_pallas) plugs in behind the same signature on TPU
(replaces the reference's Liger fused RMSNorm, SURVEY.md §2.3)."""

from __future__ import annotations

import os

import jax.numpy as jnp

# default measured on-chip (v5e, round 3; benchmarks/README.md "Pallas
# RMSNorm"): XLA's fused rmsnorm is within noise of the Pallas kernel in
# both the int8 decode loop and the train step — XLA already fuses the
# normalize-scale chain into neighbors, so the custom kernel only adds
# call overhead. The seam stays for future fused-layer kernels; flip with
# MOLLY_RMSNORM=pallas or set_rmsnorm_impl().
_RMSNORM_IMPL = os.environ.get("MOLLY_RMSNORM", "xla")
assert _RMSNORM_IMPL in ("xla", "pallas"), _RMSNORM_IMPL


def set_rmsnorm_impl(name: str) -> None:
    global _RMSNORM_IMPL
    assert name in ("xla", "pallas"), name
    _RMSNORM_IMPL = name


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm matching HF Qwen3RMSNorm: fp32 accumulation, weight applied
    after the cast back to input dtype."""
    # pallas kernel handles 1-D weights only; the fused-decode qk_norm
    # passes stacked per-head weights [Nq+Nkv, Dh] (broadcast in XLA)
    if (_RMSNORM_IMPL == "pallas" and x.ndim >= 2 and weight.ndim == 1
            and x.shape[-1] == weight.shape[0] and x.shape[-1] % 128 == 0):
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
