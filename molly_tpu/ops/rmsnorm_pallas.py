"""Pallas fused RMSNorm (fwd + bwd) — Liger fused-RMSNorm equivalent
(SURVEY.md §2.3). One pass over rows: fp32 reduction, scale, cast; backward
recomputes the inverse rms (cheaper than saving it for wide rows).

y = w * x * rsqrt(mean(x^2) + eps), reductions in fp32, weight applied
after the cast back to the input dtype (matching HF Qwen3RMSNorm and
ops.norms.rms_norm).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_ROWS = 256


def _cdiv(a, b):
    return -(-a // b)


def _fwd_kernel(x_ref, w_ref, y_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    y_ref[...] = (w_ref[...] * (x * inv).astype(y_ref.dtype)).astype(
        y_ref.dtype)


def _bwd_kernel(x_ref, w_ref, g_ref, dx_ref, dwp_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)
    H = x.shape[-1]
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = x * inv
    wg = w * g
    dot = jnp.sum(wg * xhat, axis=-1, keepdims=True) / H
    dx_ref[...] = ((wg - xhat * dot) * inv).astype(dx_ref.dtype)
    # weight-grad partials: one (8, H) accumulator block shared by every
    # sequential grid step (a (1, H) row per block would violate the
    # 8-sublane block constraint once the grid has >1 step); rows fold
    # mod 8 here, the host sums the final 8
    part = jnp.sum((g * xhat).reshape(-1, 8, H), axis=0)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dwp_ref[...] = part

    @pl.when(i > 0)
    def _acc():
        dwp_ref[...] += part


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def rms_norm_pallas(x: jnp.ndarray, weight: jnp.ndarray,
                    eps: float = 1e-6) -> jnp.ndarray:
    y, _ = _fwd(x, weight, eps)
    return y


def _fwd(x, weight, eps):
    orig_shape = x.shape
    H = x.shape[-1]
    x2 = x.reshape(-1, H)
    R = x2.shape[0]
    BR = min(DEFAULT_ROWS, _cdiv(R, 8) * 8)
    pad = _cdiv(R, BR) * BR - R
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    grid = (x2.shape[0] // BR,)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BR, H), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
    )(x2, weight.reshape(1, H))
    if pad:
        y = y[:R]
    return y.reshape(orig_shape), (x, weight)


def _bwd(eps, res, g):
    x, weight = res
    orig_shape = x.shape
    H = x.shape[-1]
    x2 = x.reshape(-1, H)
    g2 = g.reshape(-1, H)
    R = x2.shape[0]
    BR = min(DEFAULT_ROWS, _cdiv(R, 8) * 8)
    pad = _cdiv(R, BR) * BR - R
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        g2 = jnp.pad(g2, ((0, pad), (0, 0)))
    nblk = x2.shape[0] // BR
    dx, dw_part = pl.pallas_call(
        functools.partial(_bwd_kernel, eps=eps),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((BR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BR, H), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, H), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x2.shape, x.dtype),
            jax.ShapeDtypeStruct((8, H), jnp.float32),
        ),
    )(x2, weight.reshape(1, H), g2)
    if pad:
        dx = dx[:R]
    dw = jnp.sum(dw_part, axis=0).astype(weight.dtype)
    return dx.reshape(orig_shape), dw


rms_norm_pallas.defvjp(_fwd, _bwd)
