"""Fused (chunked) linear + cross-entropy — the Liger-Kernel LCE equivalent.

The reference leans on LigerForCausalLMLoss to avoid materializing the
[B, S, V] logit tensor (/root/reference/src/trainer/domain_loss.py:1112-1119)
— then defeats it by recomputing full logits for per-task domain losses
(:1120-1131). Here one chunked op returns PER-TOKEN nll, so domain losses
are a cheap segment-sum downstream with no logit recompute.

Mechanics: tokens are processed in chunks under ``lax.scan``; each chunk
computes its [C, V] logits in fp32, reduces to lse/target-logit, and drops
them. The custom VJP recomputes chunk logits on the backward pass
(activation-recompute trade: one extra matmul per chunk instead of
O(B*S*V) residual memory). Peak extra memory is [C, V] instead of
[B*S, V] — e.g. 156 MB vs 4.7 GB for B8/S1024/V152k.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100
DEFAULT_CHUNK = 256


def _cdiv(a, b):
    return -(-a // b)


def _mm(a, b):
    """MXU-native matmul: operands stay in their storage dtype (bf16 runs
    the MXU at full rate; fp32 operands would quarter it), accumulation
    in fp32 (preferred_element_type). For fp32 inputs this is exactly the
    old fp32 matmul; for bf16 inputs the upcast added no information
    (the operands were bf16 to begin with) but cost extra MXU time — at
    0.6B the lm-head is ~26% of model FLOPs."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _chunk_nll(h_c, w, labels_c, valid_c, z_loss):
    """One chunk: h_c [C, H], labels_c [C] -> per-token nll [C] (fp32)."""
    logits = _mm(h_c, w)  # [C, V] fp32
    lse = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, labels_c[:, None], axis=1)[:, 0]
    nll = (lse - tgt) * valid_c
    if z_loss:
        nll = nll + z_loss * jnp.square(lse) * valid_c
    return nll


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_linear_cross_entropy(
    hidden: jnp.ndarray,   # [T, H] (flattened tokens)
    w: jnp.ndarray,        # [H, V]
    labels: jnp.ndarray,   # [T] with IGNORE_INDEX masking
    chunk_size: int = DEFAULT_CHUNK,
    z_loss: float = 0.0,
    ignore_index: int = IGNORE_INDEX,
    need_dw: bool = True,
) -> jnp.ndarray:
    """Per-token nll [T] (0 at ignored positions), without [T, V] logits.

    need_dw=False: the lm-head weight is FROZEN (LoRA/QLoRA or
    --train-llm false — tools.py:set_up_trainable_param) — skip the
    [H, V] weight-gradient accumulation in the backward chunk loop.
    A custom-VJP backward is opaque to JAX's DCE and the dw matmul is a
    scan carry XLA cannot eliminate, so without the flag every frozen-head
    step pays a full dead d_w = h^T @ dlogits per chunk (~1/3 of the
    lm-head backward FLOPs)."""
    nll, _ = _lce_fwd(hidden, w, labels, chunk_size, z_loss, ignore_index,
                      need_dw)
    return nll


def _pad_chunks(x, chunk, pad_value=0):
    T = x.shape[0]
    target = _cdiv(T, chunk) * chunk
    if target == T:
        return x
    pads = [(0, target - T)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pads, constant_values=pad_value)


def _lce_fwd(hidden, w, labels, chunk_size, z_loss, ignore_index,
             need_dw=True):
    T = hidden.shape[0]
    C = min(chunk_size, T)
    hp = _pad_chunks(hidden, C)
    lp = _pad_chunks(labels, C, pad_value=ignore_index)
    n_chunks = hp.shape[0] // C
    hs = hp.reshape(n_chunks, C, -1)
    ls = lp.reshape(n_chunks, C)

    def body(_, xs):
        h_c, l_c = xs
        valid = (l_c != ignore_index).astype(jnp.float32)
        nll = _chunk_nll(h_c, w, jnp.where(l_c == ignore_index, 0, l_c),
                         valid, z_loss)
        return None, nll

    _, nll = jax.lax.scan(body, None, (hs, ls))
    return nll.reshape(-1)[:T], (hidden, w, labels)


def _lce_bwd(chunk_size, z_loss, ignore_index, need_dw, res, g):
    hidden, w, labels = res
    T, H = hidden.shape
    V = w.shape[1]
    C = min(chunk_size, T)
    hp = _pad_chunks(hidden, C)
    lp = _pad_chunks(labels, C, pad_value=ignore_index)
    gp = _pad_chunks(g, C)
    n_chunks = hp.shape[0] // C
    hs = hp.reshape(n_chunks, C, -1)
    ls = lp.reshape(n_chunks, C)
    gs = gp.reshape(n_chunks, C)

    def dlogits_for(h_c, l_c, g_c):
        valid = (l_c != ignore_index).astype(jnp.float32)
        safe = jnp.where(l_c == ignore_index, 0, l_c)
        logits = _mm(h_c, w)                           # [C, V] recompute
        lse = jax.nn.logsumexp(logits, axis=-1)
        p = jnp.exp(logits - lse[:, None])
        onehot = jax.nn.one_hot(safe, V, dtype=jnp.float32)
        coeff = (g_c * valid)[:, None]
        dlogits = (p - onehot) * coeff
        if z_loss:
            dlogits = dlogits + (2.0 * z_loss * lse * g_c * valid)[:, None] * p
        # grad matmuls in the weight's storage dtype (f32 in, f32 out —
        # unchanged; bf16 in, full MXU rate with f32 accumulation)
        return dlogits.astype(w.dtype)

    if need_dw:
        def body(dw_acc, xs):
            h_c, l_c, g_c = xs
            dl = dlogits_for(h_c, l_c, g_c)
            dh_c = _mm(dl, w.T)
            dw_acc = dw_acc + _mm(h_c.T, dl)
            return dw_acc, dh_c

        dw, dh = jax.lax.scan(body, jnp.zeros((H, V), jnp.float32),
                              (hs, ls, gs))
        dw = dw.astype(w.dtype)
    else:
        # frozen head: no dw carry, no h^T @ dlogits matmul at all
        def body(_, xs):
            h_c, l_c, g_c = xs
            return None, _mm(dlogits_for(h_c, l_c, g_c), w.T)

        _, dh = jax.lax.scan(body, None, (hs, ls, gs))
        dw = jnp.zeros_like(w)  # discarded cotangent (head is a constant
        #                         to autodiff); XLA DCEs the broadcast
    dh = dh.reshape(-1, H)[:T].astype(hidden.dtype)
    return dh, dw, None


fused_linear_cross_entropy.defvjp(_lce_fwd, _lce_bwd)


def causal_lm_loss(
    hidden: jnp.ndarray,   # [B, S, H] final hidden states
    w: jnp.ndarray,        # [H, V] lm head (or embed.T for tied)
    labels: jnp.ndarray,   # [B, S]
    *,
    chunk_size: int = DEFAULT_CHUNK,
    z_loss: float = 0.0,
    pre_shifted: bool = False,
    need_dw: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Next-token LM loss without logit materialization.

    Returns (mean_loss, per_sample_nll_sum [B], per_sample_token_count [B])
    — the pieces fusion.cross_entropy_loss needs for domain losses.

    pre_shifted=True: labels[t] is ALREADY the next-token target for
    position t (the caller shifted before permuting the stream — the
    zigzag context-parallel layout, where positions t and t+1 are not
    adjacent); no shift is applied here.
    """
    B, S, H = hidden.shape
    if pre_shifted:
        h, l = hidden.reshape(-1, H), labels.reshape(-1)
    else:
        h, l = hidden[:, :-1].reshape(-1, H), labels[:, 1:].reshape(-1)
    nll = fused_linear_cross_entropy(h, w, l, chunk_size, z_loss,
                                     IGNORE_INDEX, need_dw)
    nll = nll.reshape(B, -1)
    valid = (labels != IGNORE_INDEX) if pre_shifted else (
        labels[:, 1:] != IGNORE_INDEX)
    per_sample_tokens = jnp.sum(valid, axis=-1)
    per_sample_nll = jnp.sum(nll, axis=-1)
    total = jnp.maximum(jnp.sum(per_sample_tokens), 1)
    return jnp.sum(per_sample_nll) / total, per_sample_nll, per_sample_tokens
