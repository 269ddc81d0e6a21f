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

Design (what Mosaic will actually compile — a naive [P, 1] scale
operand is rejected: "Slice shape along dimension 3 must be aligned to
tiling (128)"; scale-per-sublane vectors are lane-degenerate):

  - quantization stays PER ROW (one scale per (head, page, offset),
    amax over the Dh row — models.qwen3.quantize_page_rows);
  - each page's P-vector of scales is stored LANE-MAJOR, replicated
    over the 8 f32 sublanes: scales[h, page] is an [8, P] tile — both
    DMA dims tile-aligned, so the per-page copy is Mosaic-clean.
    HBM cost: 32 bytes per row -> 1 + 32/Dh bytes/elem (1.25 at
    Dh=128) vs bf16's 2 and the shipped path's 5;
  - dequantization is folded AFTER the matmuls, where scales live on
    the LANE axis (no transposes): qk[g, t] uses k-scale[t] as a
    [1, bk] lane-wise multiply of the raw int8 qk, and the v-scale
    folds into the softmax weights before the V matmul —
    s_curr[g, t] * vsc[t]. Algebraically identical to dequantizing
    K/V rows first.

The flash/DMA structure (grid over (batch, kv_head), inline sequence
loop, double-buffered multi-page async copies) follows the shipped
kernel. Requires page_size % 128 == 0 on the Mosaic path (the [1, P]
scale-vector slices and qk lane concatenation must be lane-aligned);
``interpret=True`` has no such constraint and runs the same kernel body
through the Pallas interpreter so CI exercises it off-TPU.

Derived from jax.experimental.pallas.ops.tpu.paged_attention
(Apache-2.0, Copyright 2024 The JAX Authors); modifications as above.
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
SCALE_SUBLANES = 8  # f32 tile height; scale vectors replicate over it


def scales_to_tile(sc: jnp.ndarray) -> jnp.ndarray:
    """[..., P, 1] per-row scales -> the kernel's [..., 8, P] lane-major
    sublane-replicated storage tile."""
    svec = sc[..., 0]                       # [..., P]
    return jnp.broadcast_to(svec[..., None, :],
                            (*svec.shape[:-1], SCALE_SUBLANES,
                             svec.shape[-1]))


def tile_to_rows(tile: jnp.ndarray) -> jnp.ndarray:
    """[..., 8, P] storage tile -> [..., P, 1] per-row scales."""
    return tile[..., 0, :, None]


class _PageCopy:
    """Double-buffered async copy of one compute block's pages + their
    [8, P] scale tiles (NOT the full-shape broadcast the shipped kernel
    DMAs)."""

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

    def wait_and_get_loaded(self):
        """Returns (raw int8 values as f32 [bk, Dh], scale row [1, bk])
        — dequant is the caller's post-matmul lane multiply."""
        for c in self._copies:
            c.wait()
        head_dim = self._vmem.shape[-1]
        n_pages = self._vmem.shape[0]
        x = self._vmem[...].astype(jnp.float32).reshape(-1, head_dim)
        # scale vector of page i lives (replicated) in tile sublane 0;
        # [1, P] pieces concatenate on LANES into the block's [1, bk]
        sc = jnp.concatenate(
            [self._scales_vmem[i, 0:1, :] for i in range(n_pages)],
            axis=1)
        return x, sc


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
        k_raw, ksc = ck.wait_and_get_loaded()
        qk = jnp.einsum("gd,td->gt", q, k_raw,
                        preferred_element_type=jnp.float32)
        # dequant K AFTER the matmul: qk[g, t] *= scale_k[t] / 127.5 —
        # a [1, bk] lane-wise multiply (scales live on lanes here)
        qk = qk * (ksc * (1.0 / MAX_INT8))
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
        v_raw, vsc = cv.wait_and_get_loaded()
        # dequant V BEFORE its matmul by folding scale_v[t] into the
        # softmax weights — same lane axis, still no transpose
        s_scaled = s_curr * (vsc * (1.0 / MAX_INT8))
        o_curr = jnp.einsum("gt,td->gd", s_scaled, v_raw)
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
    k_scales: jax.Array,       # f32 [Nkv, total_pages, 8, P] (tile)
    v_pages: jax.Array,
    v_scales: jax.Array,
    lengths: jax.Array,        # i32 [B]
    page_indices: jax.Array,   # i32 [B, pages_per_sequence]
    *,
    pages_per_compute_block: int,
    mask_value: float = DEFAULT_MASK_VALUE,
    interpret: bool = False,
) -> jax.Array:
    """Flash decode attention over int8 KV pages with per-row scales
    stored as [8, P] lane-major tiles (see module docstring)."""
    batch_size, num_q_heads, head_dim = q.shape
    num_kv_heads, _, page_size, head_dim_k = k_pages.shape
    _, pages_per_sequence = page_indices.shape
    assert k_pages.dtype == jnp.int8 and v_pages.dtype == jnp.int8, (
        k_pages.dtype, v_pages.dtype)
    assert k_scales.shape == (num_kv_heads, k_pages.shape[1],
                              SCALE_SUBLANES, page_size), (
        k_scales.shape, k_pages.shape)
    assert head_dim_k == head_dim
    assert num_q_heads % num_kv_heads == 0
    assert pages_per_sequence % pages_per_compute_block == 0, (
        pages_per_sequence, pages_per_compute_block)
    assert lengths.dtype == jnp.int32
    # Mosaic lane alignment: [1, P] scale-vector slices + lane concat
    assert interpret or page_size % 128 == 0, (
        "the int8 paged kernel needs page_size % 128 == 0 on TPU "
        "(lane-aligned scale vectors); use page_size=128 with "
        "kv_quant='int8', or the XLA fallback", page_size)

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
    scales_vmem = (2, pages_per_compute_block, SCALE_SUBLANES, page_size)
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
