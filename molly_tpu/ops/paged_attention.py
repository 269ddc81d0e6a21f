"""Paged-KV decode attention: dispatch between the Pallas TPU kernel and
an XLA reference implementation.

Dense serving pools reserve a [slots, prompt_cols + cap] rectangle per
slot (inference/server.py), so a 3072-token generation cap costs every
slot 3072 columns of HBM *and* every decode tick reads all of them.
Paged KV stores each sequence as a chain of fixed-size pages allocated
on demand (the vLLM PagedAttention design, re-done TPU-native):

  - memory scales with the TOKENS ACTUALLY HELD, not slots x cap;
  - the decode read scales with each slot's true length (the kernel
    DMAs only the pages its page table names, skipping past-`length`
    compute blocks);
  - pages are recycled the moment a request finishes.

The TPU path is ``jax.experimental.pallas.ops.tpu.paged_attention`` —
a double-buffered manual-DMA flash-decode kernel shipped with JAX (used
the way ``lax.ragged_dot`` backs the MoE path, ops/moe.py). Off-TPU (CI,
CPU parity tests) an XLA gather reference computes identical values.

Layout contract (matches the kernel):
  q            [B, Nq, Dh]        one decode token per slot
  k/v_pages    [Nkv, n_pages, P, Dh]
  lengths      [B] int32          attention covers positions [0, len)
  page_indices [B, pages_per_seq] int32, position p lives in
               k_pages[:, page_indices[b, p // P], p % P]

The engine packs all layers into ONE page space (page p of layer li is
``li * n_pages + p``), so the per-layer call is pure index arithmetic —
no [L, ...] pool slicing ever materializes (inference/paged.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .attention import get_attention_impl


def _default_block(pages_per_seq: int, page_size: int) -> int:
    """Largest divisor of pages_per_seq with block_size*page_size <= 512
    (the flash block the dense kernel uses); the kernel requires
    pages_per_compute_block | pages_per_sequence."""
    best = 1
    for c in range(1, pages_per_seq + 1):
        if pages_per_seq % c == 0 and c * page_size <= 512:
            best = c
    return best


def paged_attention(
    q: jnp.ndarray,             # [B, Nq, Dh]
    k_pages: jnp.ndarray,       # [Nkv, n_pages, P, Dh] (model dtype | int8)
    v_pages: jnp.ndarray,
    lengths: jnp.ndarray,       # [B] int32
    page_indices: jnp.ndarray,  # [B, pages_per_seq] int32
    *,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
    pages_per_compute_block: Optional[int] = None,
    k_scales: Optional[jnp.ndarray] = None,  # [Nkv, n_pages, 8, P] tile
    v_scales: Optional[jnp.ndarray] = None,  # (or legacy [.., P, 1] rows)
) -> jnp.ndarray:
    """Decode attention over a paged KV pool; returns [B, Nq, Dh].

    k_scales/v_scales: int8 pools' per-row symmetric scales (dequant =
    w * scale / 127.5), stored in the lane-major [Nkv, n_pages, 8, P]
    tile layout of ops/paged_attention_int8 (engines store this; the
    [.., P, 1] row layout from quantize_page_rows is also accepted).
    The Pallas kernel DMAs scale tiles with the int8 pages and folds
    dequant after the matmuls, so the HBM read is ~half the bf16
    pool's (1 + 32/Dh bytes/elem).
    """
    dh = q.shape[-1]
    if scale is None:
        scale = dh ** -0.5
    impl = impl or get_attention_impl()
    if impl == "auto":
        impl = "flash" if jax.default_backend() == "tpu" else "xla"
    P = k_pages.shape[2]
    if impl == "flash" and (dh % 128 != 0 or P % 8 != 0
                            or (k_scales is not None and P % 128 != 0)):
        # Mosaic tiling: the kernels lower only for lane-aligned head
        # dims (tested OK at Dh=128, rejected at Dh=64/16 — tiny test
        # models), and the int8 kernel's scale vectors additionally need
        # page_size % 128 == 0; the XLA reference is correct at any shape
        impl = "xla"
    if impl == "flash":
        pages_per_seq = page_indices.shape[1]
        blk = pages_per_compute_block or _default_block(
            pages_per_seq, k_pages.shape[2])
        # the kernels apply no logit scale — fold it into q
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        if k_scales is not None:
            # our per-row-scales variant: the SHIPPED kernel broadcasts
            # QuantizedTensor scales to the FULL pool shape in f32 before
            # the pallas_call (4 bytes/elem of HBM on top of the int8
            # pool — OOMs at the 3072-cap op point); see
            # ops/paged_attention_int8.py
            from .paged_attention_int8 import (paged_attention_int8,
                                               scales_to_tile)
            if k_scales.shape[-1] == 1:  # row layout -> storage tile
                k_scales = scales_to_tile(k_scales)
                v_scales = scales_to_tile(v_scales)
            return paged_attention_int8(
                qs, k_pages, k_scales, v_pages, v_scales,
                lengths.astype(jnp.int32), page_indices,
                pages_per_compute_block=blk).astype(q.dtype)
        from jax.experimental.pallas.ops.tpu.paged_attention import (
            paged_attention as _kernel)
        return _kernel(
            qs, k_pages, v_pages, lengths.astype(jnp.int32), page_indices,
            pages_per_compute_block=blk).astype(q.dtype)
    return _xla_paged_attention(q, k_pages, v_pages, lengths,
                                page_indices, scale,
                                k_scales=k_scales, v_scales=v_scales)


PAGED_QUANT_MAX = 127.5  # quantization_utils.MAX_INT8


def _xla_paged_attention(q, k_pages, v_pages, lengths, page_indices,
                         scale, k_scales=None, v_scales=None):
    """Gather-based reference: materializes each slot's pages (fine for
    tests/CPU; the TPU kernel exists precisely to avoid this copy)."""
    b, nq, dh = q.shape
    nkv, _, p, _ = k_pages.shape
    group = nq // nkv
    # [Nkv, B, pages_per_seq, P, Dh] -> [B, Nkv, S, Dh]
    k = jnp.moveaxis(k_pages[:, page_indices], 1, 0)
    v = jnp.moveaxis(v_pages[:, page_indices], 1, 0)
    if k_scales is not None:  # dequantize int8 pages
        if k_scales.shape[-1] != 1:  # [.., 8, P] storage tile -> rows
            from .paged_attention_int8 import tile_to_rows
            k_scales = tile_to_rows(k_scales)
            v_scales = tile_to_rows(v_scales)
        ksc = jnp.moveaxis(k_scales[:, page_indices], 1, 0)
        vsc = jnp.moveaxis(v_scales[:, page_indices], 1, 0)
        k = k.astype(jnp.float32) * (ksc / PAGED_QUANT_MAX)
        v = v.astype(jnp.float32) * (vsc / PAGED_QUANT_MAX)
        v = v.astype(q.dtype)
    s = k.shape[2] * p
    k = k.reshape(b, nkv, s, dh)
    v = v.reshape(b, nkv, s, dh)
    qg = q.reshape(b, nkv, group, dh)
    logits = jnp.einsum("bngd,bnkd->bngk", qg, k,
                        preferred_element_type=jnp.float32) * scale
    live = jnp.arange(s)[None, :] < lengths[:, None]          # [B, S]
    logits = jnp.where(live[:, None, None, :], logits,
                       jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bngk,bnkd->bngd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, nq, dh).astype(q.dtype)
