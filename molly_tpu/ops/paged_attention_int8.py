"""Paged-attention TPU kernel with TRUE int8 KV pages (per-row scales).

Why this exists: the kernel shipped in
``jax.experimental.pallas.ops.tpu.paged_attention`` accepts quantized
pools only as ``QuantizedTensor`` whose scales it ``jnp.broadcast_to``s
to the FULL pool shape before the pallas_call
(paged_attention_kernel.py:419-434 in the installed JAX) — the scales
become a materialized f32[Nkv, rows, P, Dh] HBM operand, i.e. 4 bytes
per element ON TOP of the int8 pool. Measured on-chip: at the 3072-cap
serving op point that is 2x 5.47 GiB of scale broadcasts and the
program OOMs (benchmarks/README.md round-5 paged section). int8 pages
through that interface are strictly WORSE than bf16 pages.

This variant keeps the shipped kernel's flash/DMA structure (grid over
(batch, kv_head), inline sequence loop, double-buffered multi-page
async copies) but takes scales as f32[num_kv_heads, total_pages,
page_size, 1] — one scale per (head, page, offset) Dh row, 1/Dh-th the
pool's element count — DMAs the [P, 1] scale block alongside each
[P, Dh] int8 page, and dequantizes in VMEM after the copy. HBM cost:
1 byte/elem + 4/Dh bytes/elem; decode read bandwidth halves vs bf16.

Dequant convention matches quantization_utils.from_int8:
``x * scale / 127.5`` (models.qwen3.quantize_page_rows produces it).

Derived from jax.experimental.pallas.ops.tpu.paged_attention
(Apache-2.0, Copyright 2024 The JAX Authors); modifications as above.
``interpret=True`` runs the same kernel through the Pallas interpreter
so CI exercises the kernel body off-TPU (the dispatch wrapper in
ops/paged_attention.py uses it for the XLA-free CPU test path).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import jax.numpy as jnp

DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.dtype("float32")).max)
MAX_INT8 = 127.5  # quantization_utils.MAX_INT8


class _PageCopy:
    """Double-buffered async copy of one compute block's pages + their
    per-row scales ([P, 1] per page — NOT the full-shape broadcast the
    shipped kernel DMAs)."""

    def __init__(self, pages_hbm, scales_hbm, vmem, scales_vmem, sem,
                 page_indices, start, n_pages, head):
        self._vmem = vmem
        self._scales_vmem = scales_vmem
        self._pages_hbm = pages_hbm.at[head]
        self._scales_hbm = scales_hbm.at[head]
        self._sem = sem
        self._copies = []
        for i in range(n_pages):
            p = page_indices[start + i]
            self._copies.append(pltpu.make_async_copy(
                self._pages_hbm.at[p], vmem.at[i], sem))
            self._copies.append(pltpu.make_async_copy(
                self._scales_hbm.at[p], scales_vmem.at[i], sem))

    def start(self):
        for c in self._copies:
            c.start()

    def wait_and_get_loaded(self) -> jax.Array:
        for c in self._copies:
            c.wait()
        head_dim = self._vmem.shape[-1]
        x = self._vmem[...].astype(jnp.float32)
        scale = self._scales_vmem[...].astype(jnp.float32)  # [blk, P, 1]
        x = x * (scale * (1.0 / MAX_INT8))                  # dequant in VMEM
        return x.reshape(-1, head_dim)


def _kernel_one_block(lengths_ref, page_indices_ref, buffer_index_ref,
                      init_flag_ref, q_ref, k_pages_hbm, k_scales_hbm,
                      v_pages_hbm, v_scales_hbm, o_ref, m_ref, l_ref,
                      k_vmem, k_scales_vmem, v_vmem, v_scales_vmem,
                      k_sems, v_sems, *, batch_size: int,
                      pages_per_compute_block: int,
                      pages_per_sequence: int, mask_value: float,
                      program_ids):
    b, h, i = program_ids
    num_kv_heads, _, page_size, _ = k_pages_hbm.shape
    bk = page_size * pages_per_compute_block
    length = lengths_ref[b]

    def compute_block_indices(b, h, i):
        def advance_b():
            next_b = b + 1

            def advance_to_next_non_zero_length():
                next_next_b = next_b + 1
                return lax.fori_loop(
                    next_next_b, batch_size,
                    lambda _, bb: jnp.where(lengths_ref[bb] == 0, bb + 1,
                                            bb),
                    next_next_b)

            return (lax.cond(
                jnp.logical_and(
                    next_b < batch_size,
                    lengths_ref[lax.clamp(0, next_b, batch_size - 1)]
                    == 0),
                advance_to_next_non_zero_length, lambda: next_b), 0, 0)

        def advance_h():
            next_h = h + 1
            return lax.cond(next_h < num_kv_heads,
                            lambda: (b, next_h, 0), advance_b)

        return lax.cond(i * bk < lengths_ref[b], lambda: (b, h, i),
                        advance_h)

    def make_copies(b, h, i, buffer_index):
        off = b * pages_per_sequence + i * pages_per_compute_block
        ck = _PageCopy(k_pages_hbm, k_scales_hbm,
                       k_vmem.at[buffer_index],
                       k_scales_vmem.at[buffer_index],
                       k_sems.at[buffer_index], page_indices_ref, off,
                       pages_per_compute_block, h)
        cv = _PageCopy(v_pages_hbm, v_scales_hbm,
                       v_vmem.at[buffer_index],
                       v_scales_vmem.at[buffer_index],
                       v_sems.at[buffer_index], page_indices_ref, off,
                       pages_per_compute_block, h)
        return ck, cv

    @pl.when(i * bk < length)
    def flash_attention():  # noqa: F841  (pl.when side effect)
        init_flag = init_flag_ref[0]
        init_flag_ref[0] = 0
        buffer_index = buffer_index_ref[0]
        next_b, next_h, next_i = compute_block_indices(b, h, i + 1)

        @pl.when(init_flag)
        def prefetch_first():  # noqa: F841
            ck, cv = make_copies(b, h, i, buffer_index)
            ck.start()
            cv.start()

        @pl.when(i == 0)
        def init():  # noqa: F841
            m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[...] = jnp.zeros_like(l_ref)
            o_ref[...] = jnp.zeros_like(o_ref)

        @pl.when(next_b < batch_size)
        def prefetch_next():  # noqa: F841
            nxt = jnp.where(buffer_index == 0, 1, 0)
            ck, cv = make_copies(next_b, next_h, next_i, nxt)
            ck.start()
            cv.start()
            buffer_index_ref[0] = nxt

        ck, cv = make_copies(b, h, i, buffer_index)
        q = q_ref[...].astype(jnp.float32)
        k = ck.wait_and_get_loaded()
        qk = jnp.einsum("gd,td->gt", q, k,
                        preferred_element_type=jnp.float32)
        mask = (i * bk + jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1)
                < length)
        qk = qk + jnp.where(mask, 0.0, mask_value)
        m_curr = qk.max(axis=-1)
        s_curr = jnp.exp(qk - m_curr[..., None])
        m_prev, l_prev = m_ref[...], l_ref[...]
        l_curr = jax.lax.broadcast_in_dim(s_curr.sum(axis=-1),
                                          l_prev.shape, (0,))
        m_curr = jax.lax.broadcast_in_dim(m_curr, m_prev.shape, (0,))
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        beta = jnp.exp(m_curr - m_next)
        l_next = alpha * l_prev + beta * l_curr
        m_ref[...], l_ref[...] = m_next, l_next
        v = cv.wait_and_get_loaded()
        o_curr = jnp.einsum("gt,td->gd", s_curr, v)
        o_ref[...] = ((l_prev * alpha * o_ref[...] + beta * o_curr)
                      / l_next).astype(o_ref.dtype)


def _kernel(lengths_ref, page_indices_ref, buffer_index_ref,
            init_flag_ref, q_ref, k_pages_hbm, k_scales_hbm, v_pages_hbm,
            v_scales_hbm, o_ref, m_ref, l_ref, k_vmem, k_scales_vmem,
            v_vmem, v_scales_vmem, k_sems, v_sems, *, batch_size: int,
            pages_per_compute_block: int, pages_per_sequence: int,
            mask_value: float):
    """Grid (batch, kv_head); the sequence-block loop runs inline."""
    b, h = pl.program_id(0), pl.program_id(1)
    m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
    l_ref[...] = jnp.zeros_like(l_ref)
    o_ref[...] = jnp.zeros_like(o_ref)

    def body(i, _):
        _kernel_one_block(
            lengths_ref, page_indices_ref, buffer_index_ref,
            init_flag_ref, q_ref, k_pages_hbm, k_scales_hbm, v_pages_hbm,
            v_scales_hbm, o_ref, m_ref, l_ref, k_vmem, k_scales_vmem,
            v_vmem, v_scales_vmem, k_sems, v_sems,
            batch_size=batch_size,
            pages_per_compute_block=pages_per_compute_block,
            pages_per_sequence=pages_per_sequence, mask_value=mask_value,
            program_ids=(b, h, i))
        return ()

    bk = pages_per_compute_block * k_pages_hbm.shape[-2]
    lax.fori_loop(0, lax.div(lengths_ref[b] + bk - 1, bk), body, ())


@functools.partial(
    jax.jit,
    static_argnames=["pages_per_compute_block", "mask_value", "interpret"])
def paged_attention_int8(
    q: jax.Array,              # [B, Nq, Dh]
    k_pages: jax.Array,        # int8 [Nkv, total_pages, P, Dh]
    k_scales: jax.Array,       # f32 [Nkv, total_pages, P, 1]
    v_pages: jax.Array,
    v_scales: jax.Array,
    lengths: jax.Array,        # i32 [B]
    page_indices: jax.Array,   # i32 [B, pages_per_sequence]
    *,
    pages_per_compute_block: int,
    mask_value: float = DEFAULT_MASK_VALUE,
    interpret: bool = False,
) -> jax.Array:
    """Flash decode attention over int8 KV pages with per-row scales."""
    batch_size, num_q_heads, head_dim = q.shape
    num_kv_heads, _, page_size, head_dim_k = k_pages.shape
    _, pages_per_sequence = page_indices.shape
    assert k_pages.dtype == jnp.int8 and v_pages.dtype == jnp.int8, (
        k_pages.dtype, v_pages.dtype)
    assert k_scales.shape == (*k_pages.shape[:-1], 1), (
        k_scales.shape, k_pages.shape)
    assert head_dim_k == head_dim
    assert num_q_heads % num_kv_heads == 0
    assert pages_per_sequence % pages_per_compute_block == 0, (
        pages_per_sequence, pages_per_compute_block)
    assert lengths.dtype == jnp.int32

    num_groups = num_q_heads // num_kv_heads
    if num_groups % 8 != 0:
        # <1x128> layout hint (see the shipped kernel): lift q to 4-D so
        # Mosaic doesn't pick an 8x128 memref for a 1x128 block
        q = q.reshape(batch_size, num_q_heads, 1, head_dim)
        q_block_spec = pl.BlockSpec((None, num_groups, None, head_dim),
                                    lambda b, h, *_: (b, h, 0, 0))
        q_dtype = jnp.float32
    else:
        q_block_spec = pl.BlockSpec((None, num_groups, head_dim),
                                    lambda b, h, *_: (b, h, 0))
        q_dtype = q.dtype

    pages_vmem = (2, pages_per_compute_block, page_size, head_dim)
    scales_vmem = (2, pages_per_compute_block, page_size, 1)
    out, _, _ = pl.pallas_call(
        functools.partial(
            _kernel, batch_size=batch_size,
            pages_per_compute_block=pages_per_compute_block,
            pages_per_sequence=pages_per_sequence, mask_value=mask_value),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            in_specs=[
                q_block_spec,
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[q_block_spec, q_block_spec, q_block_spec],
            grid=(batch_size, num_kv_heads),
            scratch_shapes=(
                pltpu.VMEM(pages_vmem, jnp.int8),
                pltpu.VMEM(scales_vmem, jnp.float32),
                pltpu.VMEM(pages_vmem, jnp.int8),
                pltpu.VMEM(scales_vmem, jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            )),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q_dtype),
            jax.ShapeDtypeStruct((*q.shape[:-1], 1), jnp.float32),
            jax.ShapeDtypeStruct((*q.shape[:-1], 1), jnp.float32),
        ],
        interpret=interpret,
    )(
        lengths,
        page_indices.reshape(-1),
        jnp.zeros((1,), jnp.int32),   # buffer index
        jnp.ones((1,), jnp.int32),    # init flag
        q.astype(q_dtype),
        k_pages, k_scales, v_pages, v_scales,
    )
    return out.reshape(batch_size, num_q_heads, head_dim).astype(q.dtype)
