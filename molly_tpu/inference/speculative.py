"""Speculative decoding (draft-verify), greedy, single-stream.

Beyond the reference (HF ``generate`` one-token-at-a-time,
/root/reference/src/inference_lora.py:284-321): a cheap DRAFT model
proposes ``k`` tokens autoregressively, the TARGET model scores all k+1
positions in ONE forward (decode is weight-bandwidth-bound, so a k+1-token
verify costs roughly one decode step), and the longest prefix of draft
tokens that matches the target's greedy choices is accepted — plus the
target's own next token. Output is EXACTLY the target-only greedy
generation, rounds emit 1..k+1 tokens each.

The natural TPU draft is the int8-quantized copy of the target
(``quantize_for_decode``): no second checkpoint, high agreement, ~2x
cheaper steps. Any Qwen3Config model sharing the vocabulary works.

Cache discipline: both models keep one append-only KV cache with a length
pointer. A rejected draft leaves garbage rows beyond the pointer; they are
masked off (cols >= len are invisible) and overwritten by the next round's
writes, so no rewind copy is ever needed.

Greedy only (matches ``--greedy`` serving); sampled speculative decoding
(leftover-distribution rejection sampling) is documented future work.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from ..models import qwen3
from .engine import GenerationConfig


def _greedy_from_hidden(params, cfg, hidden):
    return jnp.argmax(
        qwen3.logits_from_hidden(params, cfg, hidden).astype(jnp.float32),
        axis=-1)


def _feed(params, cfg, tokens, length, cache, total):
    """Feed S tokens at cache index ``length``; returns (greedy tokens
    [1, S], cache). Garbage cache rows at cols >= length+S are masked."""
    S = tokens.shape[1]
    emb = qwen3.embed_tokens(params, tokens)
    mask = (jnp.arange(total)[None, :] < length + S).astype(jnp.int32)
    positions = length + jnp.arange(S)[None, :]
    hidden, cache = qwen3.forward_hidden(
        params, cfg, inputs_embeds=emb, attention_mask=mask,
        positions=positions, cache=cache, cache_index=length)
    return _greedy_from_hidden(params, cfg, hidden), cache


def _spec_impl(t_params, d_params, input_ids, *, t_cfg, d_cfg,
               gen: GenerationConfig, k: int):
    P = input_ids.shape[1]
    T = gen.max_new_tokens
    total = P + T + k + 2

    t_cache = qwen3.init_cache(t_cfg, 1, total)
    d_cache = qwen3.init_cache(d_cfg, 1, total)

    # prefill both; target's last-position argmax is the first pending token
    g, t_cache = _feed(t_params, t_cfg, input_ids, 0, t_cache, total)
    pending = g[0, -1]
    _, d_cache = _feed(d_params, d_cfg, input_ids, 0, d_cache, total)

    tokens = jnp.full((T + k + 1,), gen.pad_token_id, jnp.int32)
    tokens = tokens.at[0].set(pending)

    def cond(state):
        n_gen, length, pending, tokens, t_cache, d_cache, done = state
        return jnp.logical_and(n_gen < T, ~done)

    def body(state):
        n_gen, length, pending, tokens, t_cache, d_cache, done = state

        # ---- draft phase: k greedy tokens from the draft model ----
        def draft_step(carry, j):
            tok, cache = carry
            g, cache = _feed(d_params, d_cfg, tok[None, None],
                             length + j, cache, total)
            return (g[0, 0], cache), g[0, 0]

        (_, d_cache2), drafts = jax.lax.scan(
            draft_step, (pending, d_cache), jnp.arange(k))  # drafts [k]

        # ---- verify: ONE target forward over [pending, d1..dk] ----
        seq = jnp.concatenate([pending[None], drafts])[None]  # [1, k+1]
        g, t_cache2 = _feed(t_params, t_cfg, seq, length, t_cache, total)
        g = g[0]  # [k+1]; g[i] = target's greedy token after seq[:i+1]

        # longest matching prefix: drafts[i] accepted iff == g[i] and all
        # previous accepted
        ok = jnp.cumprod((drafts == g[:k]).astype(jnp.int32))
        m = jnp.sum(ok)  # 0..k accepted drafts

        # emit accepted drafts + the target's correction/extension token
        j = jnp.arange(k + 1)
        emit = jnp.where(j < m, jnp.concatenate([drafts, drafts[-1:]]),
                         jnp.where(j == m, g[m], gen.pad_token_id))
        n_emit = m + 1
        eos_hit = jnp.any(jnp.logical_and(j < n_emit,
                                          emit == gen.eos_token_id))
        tokens = jax.lax.dynamic_update_slice(
            tokens, jnp.where(j < n_emit, emit,
                              jax.lax.dynamic_slice(tokens, (n_gen,),
                                                    (k + 1,))), (n_gen,))
        return (n_gen + n_emit, length + 1 + m, g[m], tokens,
                t_cache2, d_cache2, done | eos_hit)

    state = (jnp.int32(1), jnp.int32(P), pending, tokens,
             t_cache, d_cache, pending == gen.eos_token_id)
    _, _, _, tokens, _, _, _ = jax.lax.while_loop(cond, body, state)

    out = tokens[:T]
    # pad everything after the first EOS (HF generate semantics)
    is_eos = out == gen.eos_token_id
    after = jnp.cumsum(jnp.cumsum(is_eos.astype(jnp.int32))) > 1
    return jnp.where(after, gen.pad_token_id, out)[None]


@lru_cache(maxsize=None)
def _spec_fn(t_cfg, d_cfg, gen, k):
    return jax.jit(partial(_spec_impl, t_cfg=t_cfg, d_cfg=d_cfg, gen=gen,
                           k=k))


def generate_speculative(
    target_params, target_cfg,
    draft_params, draft_cfg,
    input_ids: jnp.ndarray,   # [1, P] unpadded prompt
    gen: GenerationConfig,
    k: int = 4,
) -> jnp.ndarray:
    """Greedy speculative decode; returns [1, max_new_tokens] — token-exact
    vs target-only greedy generation."""
    assert not gen.do_sample, "speculative decoding implemented for greedy"
    assert input_ids.shape[0] == 1, "single-stream (B=1) speculation"
    return _spec_fn(target_cfg, draft_cfg, gen, k)(
        target_params, draft_params, input_ids)
