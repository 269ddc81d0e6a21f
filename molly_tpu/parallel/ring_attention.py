"""Ring attention: context/sequence parallelism over an ICI mesh axis.

The reference has NO sequence parallelism — its long-context story is
"FlashAttention on one device" capped at seq 3072 (SURVEY.md §2.4, §5.7;
/root/reference/scripts/train/run_train_8B.sh:18-21). This module is the
TPU-native long-context extension that SURVEY.md §7 reserved as a seam:

  - the sequence dim of Q/K/V is sharded over a mesh axis (``seq``);
  - Q stays resident; KV shards rotate around the ring with
    ``jax.lax.ppermute`` (one ICI hop per step, overlapped by XLA with the
    per-chunk attention compute);
  - partial results merge with the online-softmax (max/logsumexp) rule, so
    the result is bit-for-bit a softmax over the full sequence;
  - everything is plain differentiable JAX: ``ppermute`` has a transpose
    rule (the backward pass rotates gradients the opposite way), so
    training just works — no custom VJP needed. Per-chunk score
    materialization is wrapped in ``jax.checkpoint`` to keep the backward
    memory at one chunk's worth.

Causal note: with a causal mask, the PLAIN contiguous layout gives later
devices strictly more unmasked work (standard ring imbalance). The ZIGZAG
layout (``zigzag=True``) balances it: each device holds chunk ``i`` AND
chunk ``2P-1-i`` of the sequence, so every device sees the same mix of
early and late positions. Causality is tracked through explicit per-token
position vectors (which rotate around the ring with their KV), so the
math is identical — only the assignment of tokens to devices changes.
``zigzag_permute``/``zigzag_unpermute`` convert between the natural and
zigzag sequence orders.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

SEQ_AXIS = "seq"
_NEG_INF = -1e30


def _chunk_attention(q, k, v, kv_mask, q_pos, kv_pos, causal, scale):
    """Unnormalized attention of local q against one KV chunk.

    q [B, Sq, Nq, D]; k/v [B, Sk, Nkv, D]; kv_mask [B, Sk] (1 = keep);
    q_pos [Sq] / kv_pos [Sk] global token positions (non-contiguous under
    the zigzag layout). Returns (o [B, Nkv, G, Sq, D] f32 unnormalized,
    m [B, Nkv, G, Sq], l [B, Nkv, G, Sq]) — online-softmax partials.
    """
    B, Sq, Nq, D = q.shape
    Nkv = k.shape[2]
    G = Nq // Nkv
    qg = q.reshape(B, Sq, Nkv, G, D)
    s = jnp.einsum("bqngd,bknd->bngqk", qg, k,
                   preferred_element_type=jnp.float32) * scale
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, None, :] != 0, s, _NEG_INF)
    if causal:
        s = jnp.where(q_pos[:, None] >= kv_pos[None, :], s, _NEG_INF)
    m = jnp.max(s, axis=-1)                       # [B, Nkv, G, Sq]
    p = jnp.exp(s - m[..., None])
    # fully-masked rows: m == NEG_INF makes exp(s - m) == 1 for the masked
    # entries themselves — zero them so the partial merges as "no data"
    p = jnp.where(s <= _NEG_INF * 0.5, 0.0, p)
    l = jnp.sum(p, axis=-1)                       # [B, Nkv, G, Sq]
    # operands in storage dtype (full-rate MXU for bf16), f32 accumulation
    o = jnp.einsum("bngqk,bknd->bngqd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
    return o, m, l


def ring_attention(
    q: jnp.ndarray,                 # local shard [B, S_loc, Nq, D]
    k: jnp.ndarray,                 # local shard [B, S_loc, Nkv, D]
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,  # local shard [B, S_loc], 1 = keep
    *,
    axis_name: str = SEQ_AXIS,
    causal: bool = True,
    scale: Optional[float] = None,
    zigzag: bool = False,
) -> jnp.ndarray:
    """Collective ring attention; call INSIDE shard_map over ``axis_name``.

    Every device computes attention of its local queries over the full
    (distributed) key/value sequence in ``axis_size`` steps, receiving the
    next KV shard over the ring each step. With ``zigzag=True`` the local
    shard is assumed to hold global chunks ``idx`` and ``2P-1-idx`` (use
    zigzag_permute on the sequence first) — balancing causal work.
    """
    B, S_loc, Nq, D = q.shape
    Nkv = k.shape[2]
    G = Nq // Nkv
    if scale is None:
        scale = D ** -0.5
    n_dev = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    if zigzag:
        C = S_loc // 2
        local_pos = jnp.concatenate(
            [idx * C + jnp.arange(C),
             (2 * n_dev - 1 - idx) * C + jnp.arange(C)])
    else:
        local_pos = idx * S_loc + jnp.arange(S_loc)
    if mask is None:
        mask = jnp.ones((B, S_loc), jnp.int32)
    # receive from the next device: after t steps we hold chunk (idx + t)
    perm = [(j, (j - 1) % n_dev) for j in range(n_dev)]

    chunk = jax.checkpoint(
        partial(_chunk_attention, causal=causal, scale=scale))

    def step(carry, t):
        o, m, l, k_cur, v_cur, mask_cur, kvpos_cur = carry
        o_c, m_c, l_c = chunk(q, k_cur, v_cur, mask_cur, local_pos,
                              kvpos_cur)
        m_new = jnp.maximum(m, m_c)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_c - m_new)
        o = o * alpha[..., None] + o_c * beta[..., None]
        l = l * alpha + l_c * beta
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        mask_nxt = jax.lax.ppermute(mask_cur, axis_name, perm)
        kvpos_nxt = jax.lax.ppermute(kvpos_cur, axis_name, perm)
        return (o, m_new, l, k_nxt, v_nxt, mask_nxt, kvpos_nxt), None

    # initial accumulators are device-invariant; mark them "varying" over
    # the ring axis so the scan carry type stays consistent
    def vary(x):
        return jax.lax.pcast(x, (axis_name,), to="varying")

    o0 = vary(jnp.zeros((B, Nkv, G, S_loc, D), jnp.float32))
    m0 = vary(jnp.full((B, Nkv, G, S_loc), _NEG_INF, jnp.float32))
    l0 = vary(jnp.zeros((B, Nkv, G, S_loc), jnp.float32))
    (o, _, l, _, _, _, _), _ = jax.lax.scan(
        step, (o0, m0, l0, k, v, mask, local_pos), jnp.arange(n_dev))
    o = o / jnp.maximum(l, 1e-30)[..., None]
    # [B, Nkv, G, Sq, D] -> [B, Sq, Nq, D]
    return o.transpose(0, 3, 1, 2, 4).reshape(B, S_loc, Nq, D).astype(q.dtype)


def zigzag_order(S: int, n_dev: int) -> jnp.ndarray:
    """Permutation π with zigzag[i] = natural[π[i]]: device d's shard holds
    global chunks d and 2*n_dev-1-d (chunk size S / (2*n_dev))."""
    assert S % (2 * n_dev) == 0, (S, n_dev)
    C = S // (2 * n_dev)
    order = []
    for d in range(n_dev):
        order.extend(range(d * C, (d + 1) * C))
        order.extend(range((2 * n_dev - 1 - d) * C,
                           (2 * n_dev - d) * C))
    return jnp.asarray(order)


def zigzag_permute(x: jnp.ndarray, n_dev: int, axis: int = 1):
    return jnp.take(x, zigzag_order(x.shape[axis], n_dev), axis=axis)


def zigzag_unpermute(x: jnp.ndarray, n_dev: int, axis: int = 1):
    order = zigzag_order(x.shape[axis], n_dev)
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(order.size))
    return jnp.take(x, inv, axis=axis)


def ring_attention_sharded(
    q: jnp.ndarray,                 # global [B, S, Nq, D], S sharded on axis
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,  # global [B, S]
    *,
    axis_name: str = SEQ_AXIS,
    causal: bool = True,
    scale: Optional[float] = None,
    zigzag: bool = False,
    pre_permuted: bool = False,
) -> jnp.ndarray:
    """shard_map wrapper: global arrays in, seq axis manual, others auto.

    Usable directly inside a jitted train step running under
    ``jax.sharding.set_mesh`` — only ``axis_name`` goes manual; batch/fsdp/
    tensor sharding of the surrounding program stays with GSPMD.

    zigzag=True permutes the sequence into the balanced layout before the
    collective and back after (a per-call gather). With pre_permuted=True
    the caller guarantees the WHOLE activation stream is already in zigzag
    order (the end-to-end layout the trainer uses: permute embeddings /
    mask / positions / labels once per step instead of q/k/v/out once per
    LAYER) — the per-call gathers are skipped and the output stays in
    zigzag order.
    """
    if mask is None:
        mask = jnp.ones(q.shape[:2], jnp.int32)
    mesh = jax.sharding.get_abstract_mesh()
    n_dev = mesh.shape.get(axis_name, 1) if mesh is not None else 1
    if zigzag and n_dev > 1 and not pre_permuted:
        q, k, v = (zigzag_permute(x, n_dev) for x in (q, k, v))
        mask = zigzag_permute(mask, n_dev)
    qs = P(None, axis_name, None, None)
    ms = P(None, axis_name)
    fn = jax.shard_map(
        partial(ring_attention, axis_name=axis_name, causal=causal,
                scale=scale, zigzag=zigzag and n_dev > 1),
        in_specs=(qs, qs, qs, ms),
        out_specs=qs,
        axis_names=frozenset({axis_name}),
    )
    out = fn(q, k, v, mask)
    if zigzag and n_dev > 1 and not pre_permuted:
        out = zigzag_unpermute(out, n_dev)
    return out
