"""Speculative decoding (draft-verify), greedy + sampled, single-stream.

Beyond the reference (HF ``generate`` one-token-at-a-time,
/root/reference/src/inference_lora.py:284-321): a cheap DRAFT model
proposes ``k`` tokens autoregressively, the TARGET model scores all k+1
positions in ONE forward (decode is weight-bandwidth-bound, so a k+1-token
verify costs roughly one decode step).

- Greedy (``do_sample=False``): the longest prefix of draft tokens
  matching the target's argmax is accepted plus the target's own next
  token; output is EXACTLY the target-only greedy generation.
- Sampled (``do_sample=True``): standard speculative REJECTION sampling
  (Leviathan et al.) over the PROCESSED distributions — the same
  repetition-penalty/temperature/top-k/top-p pipeline the decode engine
  uses (inference.sampling), with the presence set threaded through
  draft and verify positions consistently. Accept d_i with prob
  min(1, p(d_i)/q(d_i)); on rejection sample from the normalized
  residual max(p - q, 0); on full acceptance sample the bonus token from
  p_{k+1}. The output distribution equals target-only sampling.

The natural TPU draft is the int8-quantized copy of the target
(``quantize_for_decode``): no second checkpoint, high agreement, ~2x
cheaper steps. Any Qwen3Config model sharing the vocabulary works.

A second, model-free draft source is PROMPT LOOKUP (n-gram drafting):
the last ``n`` tokens of the stream are matched against the full history
(prompt + generated so far) and the k tokens following the most recent
prior occurrence are proposed. Drafting costs a vectorized compare over
the (static-shape) history buffer — no draft model, no draft cache, no
second set of weights in HBM — so a missed draft costs only the
(k+1)-wide verify, which at B=1 is priced like one decode step
(weight-bound). It accelerates exactly the workloads molly serves:
answers that quote spans of the tagged input sequence (site/motif
extraction, echo/transcription tasks) and repetitive templated outputs.
Sampled mode treats the deterministic draft as a point-mass q (accept
d_i w.p. p(d_i); residual = p with d_i zeroed), which keeps the
distribution-exactness guarantee.

Cache discipline: both models keep one append-only KV cache with a length
pointer. A rejected draft leaves garbage rows beyond the pointer; they are
masked off (cols >= len are invisible) and overwritten by the next round's
writes, so no rewind copy is ever needed.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

from ..models import qwen3
from .engine import GenerationConfig
from .sampling import NEG_INF, apply_repetition_penalty


def _feed(params, cfg, tokens, length, cache, total, last_only=False,
          emb=None, skip_logits=False):
    """Feed S tokens at cache index ``length``; returns (logits [S, V] —
    or [1, V] with last_only, which avoids a [P, V] logit tensor for long
    prompts — and the cache). Garbage cache rows at cols >= length+S are
    masked. ``emb`` overrides token embedding (fusion prompts with
    injected omics segments prefill from embeddings). ``skip_logits``
    returns (None, cache) — a KV-only feed that skips the lm-head read."""
    if emb is not None:
        S = emb.shape[1]
    else:
        S = tokens.shape[1]
        emb = qwen3.embed_tokens(params, tokens)
    mask = (jnp.arange(total)[None, :] < length + S).astype(jnp.int32)
    positions = length + jnp.arange(S)[None, :]
    hidden, cache = qwen3.forward_hidden(
        params, cfg, inputs_embeds=emb, attention_mask=mask,
        positions=positions, cache=cache, cache_index=length)
    if skip_logits:
        return None, cache
    if last_only:
        hidden = hidden[:, -1:]
    logits = qwen3.logits_from_hidden(params, cfg, hidden)
    return logits[0].astype(jnp.float32), cache


def _processed_probs(logits, presence, gen: GenerationConfig):
    """The decode engine's logit pipeline (sampling.sample_tokens order:
    repetition penalty -> temperature -> top-k -> top-p) as a full-vocab
    probability vector (needed for the rejection-sampling residual).
    logits/presence: [S, V]."""
    logits = apply_repetition_penalty(logits, presence,
                                      gen.repetition_penalty)
    if gen.temperature != 1.0:
        logits = logits / gen.temperature
    S, V = logits.shape
    if gen.top_k:
        vals, idx = jax.lax.top_k(logits, gen.top_k)  # [S, k] desc
        if gen.top_p < 1.0:
            probs = jax.nn.softmax(vals, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            keep = (cum - probs) < gen.top_p
            vals = jnp.where(keep, vals, NEG_INF)
        pk = jax.nn.softmax(vals, axis=-1)
        pk = jnp.where(vals <= NEG_INF * 0.5, 0.0, pk)
        out = jnp.zeros((S, V), jnp.float32)
        return out.at[jnp.arange(S)[:, None], idx].set(pk)
    if gen.top_p < 1.0:
        from .sampling import top_p_filter
        logits = top_p_filter(logits, gen.top_p)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.where(logits <= NEG_INF * 0.5, 0.0, p)


def _first_token(logits_last, presence_row, gen, rng):
    if not gen.do_sample:
        # greedy matches the engine: repetition penalty BEFORE argmax
        # (sampling.sample_tokens applies it in both modes)
        pl = apply_repetition_penalty(logits_last[None], presence_row[None],
                                      gen.repetition_penalty)
        return jnp.argmax(pl[0])
    p = _processed_probs(logits_last[None], presence_row[None], gen)[0]
    return jax.random.categorical(rng, jnp.log(p + 1e-30))


def _lookup_drafts(hist, L, total, *, n, k):
    """Prompt-lookup draft: the k tokens after the most recent prior
    occurrence of the last-n-gram ending at hist[L-1]. No match → the
    slice starts at L (pad tokens), which the verify simply rejects."""
    query = jax.lax.dynamic_slice(hist, (L - n,), (n,))
    idx = jnp.arange(total)
    ok = jnp.ones((total,), bool)
    for j in range(n):  # window ending at i matches query[n-1-j] at i-j
        shifted = (jnp.concatenate([jnp.full((j,), -1, hist.dtype),
                                    hist[:total - j]]) if j else hist)
        ok = ok & (shifted == query[n - 1 - j])
    cand = jnp.where(ok & (idx >= n - 1) & (idx <= L - 2), idx, -1)
    p = jnp.max(cand)
    p = jnp.where(p < 0, L - 1, p)
    return jax.lax.dynamic_slice(hist, (p + 1,), (k,))


def _spec_impl(t_params, d_params, input_ids, prompt_embeds, rng, *,
               t_cfg, d_cfg, gen: GenerationConfig, k: int,
               lookup_n: int | None = None):
    P = (prompt_embeds.shape[1] if prompt_embeds is not None
         else input_ids.shape[1])
    T = gen.max_new_tokens
    V = t_cfg.vocab_size
    total = P + T + k + 2

    t_cache = qwen3.init_cache(t_cfg, 1, total)

    logits, t_cache = _feed(t_params, t_cfg, input_ids, 0, t_cache, total,
                            last_only=True, emb=prompt_embeds)
    presence0 = jnp.zeros((V,), bool)
    rng, r0 = jax.random.split(rng)
    pending = _first_token(logits[-1], presence0, gen, r0)
    presence0 = presence0.at[pending].set(True)
    if lookup_n is None:
        d_cache = qwen3.init_cache(d_cfg, 1, total)
        _, d_cache = _feed(d_params, d_cfg, input_ids, 0, d_cache, total,
                           last_only=True,
                           emb=(prompt_embeds.astype(jnp.dtype(d_cfg.dtype))
                                if prompt_embeds is not None else None))
    else:
        # the "draft state" is the token history (prompt + generated)
        d_cache = jnp.full((total,), gen.pad_token_id, jnp.int32)
        d_cache = d_cache.at[:P].set(input_ids[0])
        d_cache = d_cache.at[P].set(pending)

    tokens = jnp.full((T + k + 1,), gen.pad_token_id, jnp.int32)
    tokens = tokens.at[0].set(pending)

    def cond(state):
        return jnp.logical_and(state[0] < T, ~state[7])

    def body(state):
        (n_gen, length, pending, tokens, t_cache, d_cache, presence,
         done, rng, n_rounds, n_accepted) = state
        rng, r_draft, r_acc, r_ext = jax.random.split(rng, 4)

        # ---- draft phase: k tokens + their (processed) distributions ----
        if lookup_n is not None:
            drafts = _lookup_drafts(d_cache, P + n_gen, total,
                                    n=lookup_n, k=k)
            # deterministic draft = point-mass q at the drafted token
            qd = (jax.nn.one_hot(drafts, V, dtype=jnp.float32)
                  if gen.do_sample else jnp.zeros((k, V), jnp.float32))
            d_cache2 = d_cache
        else:
            def draft_step(carry, j):
                tok, cache, pres = carry
                logit, cache = _feed(d_params, d_cfg, tok[None, None],
                                     length + j, cache, total)
                if gen.do_sample:
                    q = _processed_probs(logit, pres[None], gen)[0]
                    nxt = jax.random.categorical(
                        jax.random.fold_in(r_draft, j), jnp.log(q + 1e-30))
                else:
                    q = jnp.zeros((V,), jnp.float32)
                    pl = apply_repetition_penalty(logit, pres[None],
                                                  gen.repetition_penalty)
                    nxt = jnp.argmax(pl[-1])
                pres = pres.at[nxt].set(True)
                return (nxt, cache, pres), (nxt, q)

            (_, d_cache2, _), (drafts, qd) = jax.lax.scan(
                draft_step, (pending, d_cache, presence), jnp.arange(k))
            # KV-only feed of d_k so a fully-accepted round (m == k) leaves
            # no hole in the draft cache: the scan fed [pending,
            # d1..d_{k-1}], so position length+k (d_k's row) would
            # otherwise stay garbage yet fall inside every later round's
            # attention window.
            _, d_cache2 = _feed(d_params, d_cfg, drafts[-1][None, None],
                                length + k, d_cache2, total,
                                skip_logits=True)

        # ---- verify: ONE target forward over [pending, d1..dk] ----
        seq = jnp.concatenate([pending[None], drafts])[None]  # [1, k+1]
        t_logits, t_cache2 = _feed(t_params, t_cfg, seq, length, t_cache,
                                   total)

        # presence for verify position i includes d_1..d_i
        cum = jnp.cumsum(jax.nn.one_hot(drafts, V, dtype=jnp.int32),
                         axis=0)
        pres_rows = presence[None] | jnp.concatenate(
            [jnp.zeros((1, V), jnp.int32), cum]).astype(bool)
        if gen.do_sample:
            pt = _processed_probs(t_logits, pres_rows, gen)  # [k+1, V]
            u = jax.random.uniform(r_acc, (k,))
            j = jnp.arange(k)
            ratio = pt[j, drafts] / jnp.maximum(qd[j, drafts], 1e-30)
            ok = jnp.cumprod((u < ratio).astype(jnp.int32))
            m = jnp.sum(ok)
            # extension: residual dist on rejection, p_{k+1} on full accept
            resid = jnp.maximum(pt[jnp.minimum(m, k)]
                                - qd[jnp.minimum(m, k - 1)], 0.0)
            dist = jnp.where(m < k, resid, pt[k])
            # numeric guard: if the residual vanished, fall back to p_m
            dist = jnp.where(jnp.sum(dist) > 1e-20, dist,
                             pt[jnp.minimum(m, k)])
            ext = jax.random.categorical(r_ext, jnp.log(dist + 1e-30))
        else:
            pl = apply_repetition_penalty(t_logits, pres_rows,
                                          gen.repetition_penalty)
            g = jnp.argmax(pl, axis=-1)  # [k+1]
            ok = jnp.cumprod((drafts == g[:k]).astype(jnp.int32))
            m = jnp.sum(ok)
            ext = g[m]

        # emit accepted drafts + the extension/correction token
        j = jnp.arange(k + 1)
        emit = jnp.where(j < m, jnp.concatenate([drafts, drafts[-1:]]),
                         jnp.where(j == m, ext, gen.pad_token_id))
        n_emit = m + 1
        presence = presence | jnp.any(
            jax.nn.one_hot(emit, V, dtype=jnp.int32) * (j < n_emit)[:, None],
            axis=0).astype(bool)
        eos_hit = jnp.any(jnp.logical_and(j < n_emit,
                                          emit == gen.eos_token_id))
        tokens = jax.lax.dynamic_update_slice(
            tokens, jnp.where(j < n_emit, emit,
                              jax.lax.dynamic_slice(tokens, (n_gen,),
                                                    (k + 1,))), (n_gen,))
        if lookup_n is not None:  # extend the lookup history
            d_cache2 = jax.lax.dynamic_update_slice(
                d_cache2, jnp.where(
                    j < n_emit, emit,
                    jax.lax.dynamic_slice(d_cache2, (P + n_gen,),
                                          (k + 1,))), (P + n_gen,))
        return (n_gen + n_emit, length + 1 + m, ext, tokens,
                t_cache2, d_cache2, presence, done | eos_hit, rng,
                n_rounds + 1, n_accepted + m)

    state = (jnp.int32(1), jnp.int32(P), pending, tokens,
             t_cache, d_cache, presence0, pending == gen.eos_token_id,
             rng, jnp.int32(0), jnp.int32(0))
    state = jax.lax.while_loop(cond, body, state)
    tokens, n_rounds, n_accepted = state[3], state[9], state[10]

    out = tokens[:T]
    # pad everything after the first EOS (HF generate semantics)
    is_eos = out == gen.eos_token_id
    after = jnp.cumsum(jnp.cumsum(is_eos.astype(jnp.int32))) > 1
    out = jnp.where(after, gen.pad_token_id, out)[None]
    return out, n_rounds, n_accepted


@lru_cache(maxsize=None)
def _spec_fn(t_cfg, d_cfg, gen, k, lookup_n=None):
    return jax.jit(partial(_spec_impl, t_cfg=t_cfg, d_cfg=d_cfg, gen=gen,
                           k=k, lookup_n=lookup_n))


def generate_speculative(
    target_params, target_cfg,
    draft_params, draft_cfg,
    input_ids=None,           # [1, P] unpadded prompt
    gen: GenerationConfig = None,
    k: int = 4,
    rng=None,
    return_stats: bool = False,
    inputs_embeds=None,       # [1, P, H] fusion prompt (injected omics);
    #                           the draft must share the target's embedding
    #                           space (int8 self-draft does)
):
    """Speculative decode; returns [1, max_new_tokens] (greedy:
    token-exact vs target-only greedy; sampled: distribution-exact vs
    target-only sampling). With return_stats, also returns
    (n_rounds, n_accepted_drafts)."""
    ref = inputs_embeds if inputs_embeds is not None else input_ids
    assert ref is not None and ref.shape[0] == 1, \
        "single-stream (B=1) speculation"
    if rng is None:
        rng = jax.random.key(0)
    out, n_rounds, n_acc = _spec_fn(target_cfg, draft_cfg, gen, k)(
        target_params, draft_params, input_ids, inputs_embeds, rng)
    if return_stats:
        return out, n_rounds, n_acc
    return out


def generate_lookup(
    target_params, target_cfg,
    input_ids,                # [1, P] unpadded prompt ids (REQUIRED —
    #                           the lookup history matches on token ids)
    gen: GenerationConfig = None,
    k: int = 8,
    n: int = 3,
    rng=None,
    return_stats: bool = False,
    inputs_embeds=None,       # [1, P, H] fusion prompt; ids still required
):
    """Prompt-lookup (n-gram) speculative decode — no draft model. The
    last ``n`` tokens are matched against the history; the ``k`` tokens
    after the most recent prior occurrence are verified in one target
    forward. Greedy: token-exact vs target-only greedy. Sampled:
    distribution-exact (point-mass q rejection sampling). A draft miss
    costs ~one decode step, so worst case ~= plain decoding; spans the
    model copies from its input/output history decode up to (k+1)x
    faster. Replaces the serving hot path the reference runs one token
    at a time (/root/reference/src/inference_lora.py:284-321)."""
    assert input_ids is not None and input_ids.shape[0] == 1, \
        "single-stream (B=1) lookup speculation with prompt ids"
    assert input_ids.shape[1] >= n, "prompt shorter than the lookup n-gram"
    if rng is None:
        rng = jax.random.key(0)
    out, n_rounds, n_acc = _spec_fn(target_cfg, None, gen, k, n)(
        target_params, None, input_ids, inputs_embeds, rng)
    if return_stats:
        return out, n_rounds, n_acc
    return out
