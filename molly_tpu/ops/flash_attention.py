"""Pallas TPU flash attention (forward + backward, causal + bidirectional).

Replaces the reference's flash-attention-2/3 CUDA dependency
(/root/reference/src/train.py:578-582; SURVEY.md §2.3) with a TPU-native
blockwise kernel:

  - online-softmax forward over KV blocks, fp32 accumulators in VMEM
  - GQA folded into the grid (kv head = q head // group) — no repeat_kv
    materialization
  - padding mask [B, Skv] + causal mask with a q_offset (so prefill-into-
    cache reuses the same kernel)
  - causal block skipping: KV blocks entirely above the diagonal are not
    visited
  - FA2-style backward (recompute P from saved LSE): one kernel for dQ,
    one for dK/dV (grid over kv heads, inner loop over the q-head group)

The public API takes the model's native [B, S, N, D] layout; kernels run on
[B, N, S, D] (TPU blocks need the tiled dims last), with the transposes in
the wrapper where XLA fuses them.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256
NEG_INF = -1e30


def _cdiv(a, b):
    return -(-a // b)


def _cdiv_dyn(a, b):
    return (a + b - 1) // b


def _pad_axis(x, axis, multiple):
    n = x.shape[axis]
    target = _cdiv(n, multiple) * multiple
    if target == n:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - n)
    return jnp.pad(x, pads)


# ---------------------------------------------------------------------------
# forward kernel: q [1,1,BQ,D], k/v [1,1,Skv,D], mask [1,1,Skv]
# outputs: o [1,1,BQ,D], lse [1,1,1,BQ]
# ---------------------------------------------------------------------------


def _fwd_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                scale, causal, block_k, q_offset, kv_len):
    iq = pl.program_id(2)
    BQ, D = q_ref.shape[2], q_ref.shape[3]
    # dots keep operands in the storage dtype (bf16 runs the MXU at full
    # rate; f32 operands would quarter it) and accumulate in f32 via
    # preferred_element_type; scale is applied to the f32 product
    q = q_ref[0, 0, :, :]  # [BQ, D]

    num_kv_blocks = _cdiv(kv_len, block_k)
    if causal:
        max_kv = q_offset + (iq + 1) * BQ
        num_visit = jnp.minimum(num_kv_blocks, _cdiv_dyn(max_kv, block_k))
    else:
        num_visit = num_kv_blocks

    acc = jnp.zeros((BQ, D), jnp.float32)
    m_i = jnp.full((BQ, 1), NEG_INF, jnp.float32)
    l_i = jnp.zeros((BQ, 1), jnp.float32)

    q_pos = (q_offset + iq * BQ +
             jax.lax.broadcasted_iota(jnp.int32, (BQ, block_k), 0))

    def body(j, carry):
        acc, m_i, l_i = carry
        k_blk = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = jnp.dot(q, k_blk.T,
                    preferred_element_type=jnp.float32) * scale

        kv_pos = (j * block_k +
                  jax.lax.broadcasted_iota(jnp.int32, (BQ, block_k), 1))
        if causal:
            s = jnp.where(q_pos >= kv_pos, s, NEG_INF)
        if mask_ref is not None:
            pad = mask_ref[0, 0, pl.ds(j * block_k, block_k)]
            s = jnp.where(pad[None, :] != 0, s, NEG_INF)
        s = jnp.where(kv_pos < kv_len, s, NEG_INF)  # padded-kv guard

        m_new = jnp.maximum(m_i, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jnp.dot(p.astype(v_blk.dtype), v_blk,
                                    preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc, m_i, l_i = jax.lax.fori_loop(0, num_visit, body, (acc, m_i, l_i))

    l_safe = jnp.maximum(l_i, 1e-30)
    o_ref[0, 0, :, :] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0, 0, 0, :] = (m_i + jnp.log(l_safe))[:, 0]


def _nomask_fwd(kernel, q_ref, k_ref, v_ref, o_ref, lse_ref):
    kernel(None, q_ref, k_ref, v_ref, o_ref, lse_ref)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def flash_attention(
    q: jnp.ndarray,                 # [B, Sq, N, D]
    k: jnp.ndarray,                 # [B, Skv, Nkv, D]
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,  # [B, Skv] 1=keep
    causal: bool = True,
    scale: Optional[float] = None,
    q_offset: int = 0,
    block_sizes: tuple = (DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K),
) -> jnp.ndarray:
    B, Sq, N, D = q.shape
    Skv = k.shape[1]
    # Mosaic requires 128-aligned dynamic slices in the lane dim (the
    # in-kernel KV loop) — round block sizes to 128 and pad S dims to match
    BQ = min(max(block_sizes[0], 128), _cdiv(Sq, 128) * 128)
    BK = min(max(block_sizes[1], 128), _cdiv(Skv, 128) * 128)
    if block_sizes[0] < 128 and block_sizes[1] < 128:
        # explicit small blocks (interpret-mode tests) are honored as-is
        BQ = min(block_sizes[0], _cdiv(Sq, 8) * 8)
        BK = min(block_sizes[1], _cdiv(Skv, 8) * 8)
    # [B, N, S, D] kernel layout
    qt = _pad_axis(q.transpose(0, 2, 1, 3), 2, BQ)
    kt = _pad_axis(k.transpose(0, 2, 1, 3), 2, BK)
    vt = _pad_axis(v.transpose(0, 2, 1, 3), 2, BK)
    maskp = None
    if mask is not None:
        maskp = _pad_axis(mask.astype(jnp.int32), 1, BK)[:, None, :]
    out = _flash_core(qt, kt, vt, maskp, causal, scale, q_offset,
                      (BQ, BK), Skv)
    return out[:, :, :Sq].transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_core(q, k, v, mask, causal, scale, q_offset, block_sizes,
                skv_real):
    o, _ = _flash_fwd(q, k, v, mask, causal, scale, q_offset, block_sizes,
                      skv_real)
    return o


def _flash_fwd(q, k, v, mask, causal, scale, q_offset, block_sizes,
               skv_real):
    # q [B, N, Sqp, D]; k/v [B, Nkv, Skvp, D]; mask [B, 1, Skvp] or None
    B, N, Sq, D = q.shape
    _, Nkv, Skv, _ = k.shape
    BQ, BK = block_sizes
    if scale is None:
        scale = D ** -0.5
    group = N // Nkv
    grid = (B, N, _cdiv(Sq, BQ))

    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, block_k=BK,
        q_offset=q_offset, kv_len=skv_real)

    in_specs = [
        pl.BlockSpec((1, 1, BQ, D), lambda b, h, i: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Skv, D),
                     lambda b, h, i, g=group: (b, h // g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Skv, D),
                     lambda b, h, i, g=group: (b, h // g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if mask is not None:
        in_specs.insert(0, pl.BlockSpec((1, 1, Skv), lambda b, h, i: (b, 0, 0),
                                        memory_space=pltpu.VMEM))
        args.insert(0, mask)
        kern = kernel
    else:
        kern = functools.partial(_nomask_fwd, kernel)

    o, lse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, BQ, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, BQ), lambda b, h, i: (b, h, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((B, N, 1, Sq), jnp.float32),
        ),
    )(*args)
    return o, (q, k, v, mask, o, lse)


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _dq_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref, *, scale, causal, block_k, q_offset, kv_len):
    iq = pl.program_id(2)
    BQ, D = q_ref.shape[2], q_ref.shape[3]
    q = q_ref[0, 0, :, :]          # storage dtype; scale applied post-dot
    do = do_ref[0, 0, :, :]
    lse = lse_ref[0, 0, 0, :][:, None]
    delta = delta_ref[0, 0, 0, :][:, None]

    num_kv_blocks = _cdiv(kv_len, block_k)
    if causal:
        max_kv = q_offset + (iq + 1) * BQ
        num_visit = jnp.minimum(num_kv_blocks, _cdiv_dyn(max_kv, block_k))
    else:
        num_visit = num_kv_blocks

    q_pos = (q_offset + iq * BQ +
             jax.lax.broadcasted_iota(jnp.int32, (BQ, block_k), 0))
    dq = jnp.zeros((BQ, D), jnp.float32)

    def body(j, dq):
        k_blk = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = jnp.dot(q, k_blk.T,
                    preferred_element_type=jnp.float32) * scale
        kv_pos = (j * block_k +
                  jax.lax.broadcasted_iota(jnp.int32, (BQ, block_k), 1))
        if causal:
            s = jnp.where(q_pos >= kv_pos, s, NEG_INF)
        if mask_ref is not None:
            pad = mask_ref[0, 0, pl.ds(j * block_k, block_k)]
            s = jnp.where(pad[None, :] != 0, s, NEG_INF)
        s = jnp.where(kv_pos < kv_len, s, NEG_INF)

        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(k_blk.dtype)
        return dq + jnp.dot(ds, k_blk, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_visit, body, dq)
    dq_ref[0, 0, :, :] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(mask_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, scale, causal, block_q, q_offset,
                q_len, group):
    # q/do [1, group, Sq, D]; k/v [1, 1, BK, D]; lse/delta [1, group, 1, Sq]
    ik = pl.program_id(2)
    BK, D = k_ref.shape[2], k_ref.shape[3]
    Sq = q_ref.shape[2]
    k_blk = k_ref[0, 0, :, :]      # storage dtype; see _fwd_kernel note
    v_blk = v_ref[0, 0, :, :]

    kv_pos = (ik * BK +
              jax.lax.broadcasted_iota(jnp.int32, (block_q, BK), 1))
    if mask_ref is not None:
        pad = mask_ref[0, 0, :]
    num_q_blocks = _cdiv(Sq, block_q)
    if causal:
        first_q = jnp.maximum((ik * BK - q_offset) // block_q, 0)
    else:
        first_q = 0

    dk = jnp.zeros((BK, D), jnp.float32)
    dv = jnp.zeros((BK, D), jnp.float32)

    def q_head_loop(g, carry):
        def body(i, carry):
            dk, dv = carry
            q_blk = q_ref[0, g, pl.ds(i * block_q, block_q), :]
            do = do_ref[0, g, pl.ds(i * block_q, block_q), :]
            lse = lse_ref[0, g, 0, pl.ds(i * block_q, block_q)][:, None]
            delta = delta_ref[0, g, 0, pl.ds(i * block_q, block_q)][:, None]

            s = jnp.dot(q_blk, k_blk.T,
                        preferred_element_type=jnp.float32) * scale
            q_pos = (q_offset + i * block_q +
                     jax.lax.broadcasted_iota(jnp.int32, (block_q, BK), 0))
            if causal:
                s = jnp.where(q_pos >= kv_pos, s, NEG_INF)
            if mask_ref is not None:
                s = jnp.where(pad[None, :] != 0, s, NEG_INF)
            s = jnp.where((q_pos - q_offset) < q_len, s, NEG_INF)

            p = jnp.exp(s - lse)
            pc = p.astype(do.dtype)
            dv = dv + jnp.dot(pc.T, do, preferred_element_type=jnp.float32)
            dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
            ds = (p * (dp - delta)).astype(q_blk.dtype)
            dk = dk + jnp.dot(ds.T, q_blk,
                              preferred_element_type=jnp.float32)
            return dk, dv

        return jax.lax.fori_loop(first_q, num_q_blocks, body, carry)

    dk, dv = jax.lax.fori_loop(0, group, q_head_loop, (dk, dv))
    # the scale lived on q in s = scale*q@k^T; dk = scale * sum(ds^T @ q)
    dk_ref[0, 0, :, :] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0, 0, :, :] = dv.astype(dv_ref.dtype)


def _nomask_dq(kernel, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref):
    kernel(None, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref)


def _nomask_dkv(kernel, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref):
    kernel(None, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
           dk_ref, dv_ref)


def _flash_bwd(causal, scale, q_offset, block_sizes, skv_real, res, g):
    q, k, v, mask, o, lse = res
    B, N, Sq, D = q.shape
    _, Nkv, Skv, _ = k.shape
    BQ, BK = block_sizes
    if scale is None:
        scale = D ** -0.5
    group = N // Nkv

    # delta = rowsum(do * o), [B, N, 1, Sq]
    delta = jnp.einsum("bnsd,bnsd->bns", g.astype(jnp.float32),
                       o.astype(jnp.float32))[:, :, None, :]

    # ---- dQ ----
    dq_kernel = functools.partial(
        _dq_kernel, scale=scale, causal=causal, block_k=BK,
        q_offset=q_offset, kv_len=skv_real)
    in_specs = [
        pl.BlockSpec((1, 1, BQ, D), lambda b, h, i: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Skv, D),
                     lambda b, h, i, g_=group: (b, h // g_, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Skv, D),
                     lambda b, h, i, g_=group: (b, h // g_, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, BQ, D), lambda b, h, i: (b, h, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, BQ), lambda b, h, i: (b, h, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, BQ), lambda b, h, i: (b, h, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, g, lse, delta]
    if mask is not None:
        in_specs.insert(0, pl.BlockSpec((1, 1, Skv), lambda b, h, i: (b, 0, 0),
                                        memory_space=pltpu.VMEM))
        args.insert(0, mask)
        kern_dq = dq_kernel
    else:
        kern_dq = functools.partial(_nomask_dq, dq_kernel)

    dq = pl.pallas_call(
        kern_dq,
        grid=(B, N, _cdiv(Sq, BQ)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, BQ, D), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(*args)

    # ---- dK/dV ----
    dkv_kernel = functools.partial(
        _dkv_kernel, scale=scale, causal=causal, block_q=BQ,
        q_offset=q_offset, q_len=Sq, group=group)
    in_specs = [
        pl.BlockSpec((1, group, Sq, D), lambda b, hk, i: (b, hk, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, BK, D), lambda b, hk, i: (b, hk, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, BK, D), lambda b, hk, i: (b, hk, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, group, Sq, D), lambda b, hk, i: (b, hk, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, group, 1, Sq), lambda b, hk, i: (b, hk, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, group, 1, Sq), lambda b, hk, i: (b, hk, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, g, lse, delta]
    if mask is not None:
        in_specs.insert(0, pl.BlockSpec((1, 1, BK), lambda b, hk, i: (b, 0, i),
                                        memory_space=pltpu.VMEM))
        args.insert(0, mask)
        kern_dkv = dkv_kernel
    else:
        kern_dkv = functools.partial(_nomask_dkv, dkv_kernel)

    dk, dv = pl.pallas_call(
        kern_dkv,
        grid=(B, Nkv, _cdiv(Skv, BK)),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, BK, D), lambda b, hk, i: (b, hk, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BK, D), lambda b, hk, i: (b, hk, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
    )(*args)

    mask_ct = (None if mask is None
               else jnp.zeros(mask.shape, jax.dtypes.float0))
    return dq, dk, dv, mask_ct


_flash_core.defvjp(_flash_fwd, _flash_bwd)
