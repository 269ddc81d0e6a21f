"""Offline (whole-workload) continuous batching: the device-side
admission ring.

The online ``ServingEngine`` (server.py) schedules from the host: each
round dispatches a decode chunk, fetches status, and admits new requests.
Measured on a tunneled v5e, every dispatch costs ~40-70 ms of
non-pipelining host/tunnel overhead (benchmarks/README.md "dispatch
overhead") — at 64 slots that is worth hundreds of slot-ticks, and the
scheduler overhead caps the engine at ~60% of its own decode roofline.

For OFFLINE workloads (the reference's only serving mode: a fixed file of
prompts batch-decoded to JSONL, /root/reference/src/inference_lora.py:
284-321) the whole request queue is known up front, so the TPU-native
answer is to move the scheduler ONTO the device: upload every prompt once,
run ONE jitted while_loop whose body either

  - ADMITS: harvests + recycles ``admit_group`` finished/virgin slots,
    prefills the next ``admit_group`` queued prompts (one static-shape
    [k, Sb] prefill), samples their first tokens, and inserts their KV
    into the recycled slots; or
  - DECODES: advances every active slot one token (the same ring-buffer
    cache layout and sampling semantics as the online engine),

and fetch the per-request output buffer once at the end. Host round trips
per workload: O(1) instead of O(rounds). Slot state, sampling (temperature/
top-k/top-p/repetition-penalty presence sets), EOS/cap termination, and
the prompt-columns + generation-ring cache layout are identical to
server.py; outputs for greedy decoding are token-identical.

Scope: text AND fusion (omics-injected) prompts — ``queue_omics`` uploads
the whole queue's segment arrays and each admission group's segments run
through the frozen encoders on device; one prompt bucket (callers
left-pad to it); no shared-prefix caching, no streaming. Online/latency
serving stays on ``ServingEngine``. Prompt-lookup speculation
(``spec_lookup``) runs in-ring: greedy token-exact, sampled
distribution-exact.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import qwen3
from ..models.fusion import FusionConfig
from .engine import GenerationConfig
from .sampling import sample_tokens


def _admit(params, st, rng, *, cfg, gen, n_slots, admit_group, bucket,
           ring_cols):
    """Recycle ``admit_group`` slots and prefill the next queued prompts
    into them. Queue exhaustion is padded out by the caller (dummy rows,
    cap 1), so the group shape is static. Fusion prompts: the queue can
    carry omics segment arrays (queue_dna_tokens/_pos, queue_prot_...)
    — the group's segments run through the frozen encoders + projector
    injection right here, on device (the encoder cost amortizes over the
    admission group exactly like the online engine's group prefill)."""
    tcfg = cfg.text
    k = admit_group
    B = n_slots
    # pick k recyclable slots (finished or never used). The caller's cond
    # guarantees at least k exist whenever this branch runs.
    recyclable = jnp.logical_not(st["active"])
    # order: finished-with-results first is unnecessary — any free slot
    # works; take the k lowest indices among recyclable
    slot_rank = jnp.where(recyclable, jnp.arange(B), B + jnp.arange(B))
    slots = jnp.sort(slot_rank)[:k].astype(jnp.int32) % B

    # harvest: anything sitting in a recycled slot streams its out_buf row
    # into the per-request results store (virgin slots carry req_id -1 ->
    # row parked on a scratch row)
    req_ids = st["req_of_slot"][slots]
    dst = jnp.where(req_ids >= 0, req_ids, st["results"].shape[0] - 1)
    st["results"] = st["results"].at[dst].set(st["out_buf"][slots])
    st["res_len"] = st["res_len"].at[dst].set(st["out_len"][slots])

    # next k queue rows (static slice at a dynamic head)
    qh = st["queue_head"]
    ids = jax.lax.dynamic_slice(st["queue_ids"], (qh, 0), (k, bucket))
    mask = jax.lax.dynamic_slice(st["queue_mask"], (qh, 0), (k, bucket))
    caps = jax.lax.dynamic_slice(st["queue_caps"], (qh,), (k,))
    caps = jnp.minimum(jnp.maximum(caps, 1), ring_cols)
    new_req = qh + jnp.arange(k)

    # prefill the group (bf16 temp cache, flash attention when available);
    # omics segments (if queued) encode + inject into the group's embeds
    if "queue_dna_tokens" in st or "queue_prot_tokens" in st:
        from ..models import fusion
        eb = {"input_ids": ids}
        if "queue_dna_tokens" in st:
            g, kd = st["queue_dna_tokens"].shape[1:]
            eb["dna_rna_tokens"] = jax.lax.dynamic_slice(
                st["queue_dna_tokens"], (qh, 0, 0), (k, g, kd))
            eb["dna_rna_pos"] = jax.lax.dynamic_slice(
                st["queue_dna_pos"], (qh, 0), (k, g))
        if "queue_prot_tokens" in st:
            g, kp = st["queue_prot_tokens"].shape[1:]
            eb["protein_tokens"] = jax.lax.dynamic_slice(
                st["queue_prot_tokens"], (qh, 0, 0), (k, g, kp))
            eb["protein_pos"] = jax.lax.dynamic_slice(
                st["queue_prot_pos"], (qh, 0), (k, g))
        emb = fusion.build_inputs_embeds(params, cfg, eb)
    else:
        emb = qwen3.embed_tokens(params["text"], ids)
    cache = qwen3.init_cache(tcfg, k, bucket)
    positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
    hidden, cache = qwen3.forward_hidden(
        params["text"], tcfg, inputs_embeds=emb, attention_mask=mask,
        positions=positions, cache=cache, cache_index=0)
    logits = qwen3.logits_from_hidden(params["text"], tcfg, hidden[:, -1])
    presence = jnp.zeros((k, tcfg.vocab_size), bool)
    tok0 = sample_tokens(
        logits, rng, do_sample=gen.do_sample, temperature=gen.temperature,
        top_k=gen.top_k, top_p=gen.top_p,
        repetition_penalty=gen.repetition_penalty, presence=presence)
    presence = presence.at[jnp.arange(k), tok0].set(True)

    # insert into the recycled slots (same layout as server._prefill_insert)
    if "kv_scale" in st:
        q8, sc = qwen3.quantize_kv(cache["kv"])
        st["cache"] = st["cache"].at[:, slots, :, :bucket, :].set(q8)
        st["kv_scale"] = st["kv_scale"].at[:, slots, :, :bucket, :].set(sc)
    else:
        st["cache"] = st["cache"].at[:, slots, :, :bucket, :].set(
            cache["kv"].astype(st["cache"].dtype))
    rows = jnp.zeros((k, st["valid"].shape[1]), jnp.int32)
    rows = rows.at[:, :bucket].set(mask)
    st["valid"] = st["valid"].at[slots].set(rows)
    st["n_real"] = st["n_real"].at[slots].set(jnp.sum(mask, axis=1))
    st["last_tok"] = st["last_tok"].at[slots].set(tok0)
    st["presence"] = st["presence"].at[slots].set(presence)
    out_rows = jnp.full((k, st["out_buf"].shape[1]), gen.pad_token_id,
                        jnp.int32).at[:, 0].set(tok0)
    st["out_buf"] = st["out_buf"].at[slots].set(out_rows)
    st["out_len"] = st["out_len"].at[slots].set(1)
    st["cap"] = st["cap"].at[slots].set(caps)
    done0 = jnp.logical_or(tok0 == gen.eos_token_id, caps <= 1)
    st["active"] = st["active"].at[slots].set(~done0)
    st["req_of_slot"] = st["req_of_slot"].at[slots].set(new_req)
    st["queue_head"] = qh + k
    if "tok_hist" in st:  # speculative mode: position-ordered history
        Hh = st["tok_hist"].shape[1]
        hist_rows = jnp.full((k, Hh), -1, jnp.int32)
        # scatter prompt ids to their positions (pads -> OOB, dropped)
        dst = jnp.where(mask != 0, positions, Hh)
        hist_rows = hist_rows.at[jnp.arange(k)[:, None], dst].set(
            ids, mode="drop")
        n0 = jnp.sum(mask, axis=1)
        hist_rows = hist_rows.at[jnp.arange(k), n0].set(tok0)
        st["tok_hist"] = st["tok_hist"].at[slots].set(hist_rows)
        st["gen_cols"] = st["gen_cols"].at[slots].set(0)
    return st


def _decode_tick(params, st, rng, *, tcfg, gen, prompt_cols, ring_cols,
                 spec_k=0, ngram_n=3):
    """One decode step for every active slot — mirrors server._decode_impl
    (ring-buffer column shared by all slots per global tick).

    Under the acceptance-adaptive ring (``tok_hist`` in the state) the
    shared-column invariant breaks: speculative cycles consume ring
    columns DENSELY per row (gen_cols), so a later plain tick must write
    each row's own next column, not the global head's — otherwise it
    lands inside another row's still-live span. The adaptive variant
    therefore keys columns off gen_cols and keeps tok_hist/presence in
    sync so a later spec cycle drafts from a complete history.

    Shadow-draft estimation (adaptive mode, ``spec_ema`` in the state):
    each plain tick ALSO computes the prompt-lookup draft's first token
    and compares it to the token the model actually emitted. Greedy: a
    match is exactly "draft 1 would have been accepted". Sampled: the
    emitted token is one draw from the processed distribution, so
    P(match) = p(d_1) — an unbiased Bernoulli sample of the acceptance
    probability. The per-tick match fraction extrapolates to a full
    k-draft acceptance-rate estimate as sum_{i=1..k} frac^i / k (i.i.d.
    chain approximation) and feeds the same EMA the spec rounds update,
    so the ring notices a workload turning quotable WITHOUT spending any
    speculative probe rounds. Cost: one [B, max_len] n-gram scan per
    tick — noise next to the model forward."""
    B = st["n_real"].shape[0]
    rows = jnp.arange(B)
    emb = qwen3.embed_tokens(params["text"], st["last_tok"][:, None])
    if "gen_cols" in st:  # adaptive mode: per-row dense ring columns
        col = prompt_cols + jax.lax.rem(st["gen_cols"], ring_cols)  # [B]
        valid2 = st["valid"].at[rows, col].set(
            st["active"].astype(jnp.int32))
        cache_idx = col[:, None]
    else:
        col = prompt_cols + jax.lax.rem(st["head"], ring_cols)
        valid2 = st["valid"].at[:, col].set(st["active"].astype(jnp.int32))
        cache_idx = col
    cache_in = {"kv": st["cache"]}
    if "kv_scale" in st:
        cache_in["kv_scale"] = st["kv_scale"]
    hidden, cache = qwen3.forward_hidden(
        params["text"], tcfg, inputs_embeds=emb, attention_mask=valid2,
        positions=st["n_real"][:, None], cache=cache_in,
        cache_index=cache_idx, causal=False)
    st["cache"] = cache["kv"]
    if "kv_scale" in st:
        st["kv_scale"] = cache["kv_scale"]
    st["valid"] = valid2
    st["head"] = st["head"] + 1
    logits = qwen3.logits_from_hidden(params["text"], tcfg, hidden[:, 0])
    nxt = sample_tokens(
        logits, rng, do_sample=gen.do_sample, temperature=gen.temperature,
        top_k=gen.top_k, top_p=gen.top_p,
        repetition_penalty=gen.repetition_penalty, presence=st["presence"])
    nxt = jnp.where(st["active"], nxt, gen.pad_token_id)
    safe = jnp.minimum(st["out_len"], st["out_buf"].shape[1] - 1)
    st["out_buf"] = st["out_buf"].at[rows, safe].set(
        jnp.where(st["active"], nxt, st["out_buf"][rows, safe]))
    st["presence"] = st["presence"].at[rows, nxt].set(
        st["presence"][rows, nxt] | st["active"])
    st["out_len"] = st["out_len"] + st["active"]
    if "gen_cols" in st:  # adaptive mode: keep spec bookkeeping current
        st["gen_cols"] = st["gen_cols"] + st["active"]
        Hh = st["tok_hist"].shape[1]
        if "spec_ema" in st and spec_k:
            # shadow draft (see docstring): would draft 1 have matched?
            # MUST run on the pre-update history — the no-match fallback
            # reads hist[nr+1], which the real spec tick sees unwritten
            # (-1 -> id 0, a guaranteed reject); drafting after the
            # emitted token lands there would always "match"
            d1 = _lookup_draft(st["tok_hist"], st["n_real"],
                               ngram_n=ngram_n, spec_k=1)[:, 0]
            n_act = jnp.maximum(jnp.sum(st["active"].astype(jnp.int32)), 1)
            frac = jnp.sum((st["active"] & (d1 == nxt)).astype(
                jnp.float32)) / n_act
            rate_est = sum(frac ** i
                           for i in range(1, spec_k + 1)) / spec_k
            st["spec_ema"] = 0.8 * st["spec_ema"] + 0.2 * rate_est
        dst = jnp.where(st["active"], st["n_real"] + 1, Hh)
        st["tok_hist"] = st["tok_hist"].at[rows, dst].set(nxt, mode="drop")
    st["n_real"] = st["n_real"] + st["active"]
    st["last_tok"] = jnp.where(st["active"], nxt, st["last_tok"])
    newly_done = st["active"] & (
        (nxt == gen.eos_token_id) | (st["out_len"] >= st["cap"]))
    st["active"] = st["active"] & ~newly_done
    return st


def _lookup_draft(hist, nr, *, ngram_n, spec_k):
    """Prompt-lookup draft: for each row, find the most recent PRIOR
    occurrence (window end i < nr) of the trailing ``ngram_n``-gram ending
    at hist[nr] and return the ``spec_k`` tokens that followed it
    ([B, spec_k]; unwritten/-1 positions clamp to id 0, which a verify
    will reject). Shared by the speculative round (the real draft) and
    the adaptive ring's shadow estimator in the plain tick."""
    B, Hh = hist.shape
    patt_idx = nr[:, None] - (ngram_n - 1) + jnp.arange(ngram_n)[None]
    pattern = jnp.take_along_axis(hist, jnp.maximum(patt_idx, 0), axis=1)
    idx = jnp.arange(Hh)
    ok = jnp.ones((B, Hh), bool)
    for j in range(ngram_n):  # window ending at i matches pattern[n-1-j]
        shifted = (jnp.concatenate(
            [jnp.full((B, j), -1, hist.dtype), hist[:, :Hh - j]], axis=1)
            if j else hist)
        ok = ok & (shifted == pattern[:, ngram_n - 1 - j][:, None])
    cand = jnp.where(
        ok & (idx[None] >= ngram_n - 1) & (idx[None] <= nr[:, None] - 1),
        idx[None], -1)
    p = jnp.max(cand, axis=1)
    p = jnp.where(p < 0, nr, p)   # no match -> unwritten region (-1 hist)
    d_idx = p[:, None] + 1 + jnp.arange(spec_k)[None]
    drafts = jnp.take_along_axis(hist, jnp.minimum(d_idx, Hh - 1), axis=1)
    return jnp.maximum(drafts, 0)            # -1 (unwritten) -> id 0


def _spec_tick(params, st, rng, *, tcfg, gen, prompt_cols, ring_cols,
               spec_k, ngram_n):
    """One prompt-lookup speculative round for every active slot.

    Device-side batched version of speculative.generate_lookup: each row
    drafts ``spec_k`` tokens from the most recent prior occurrence of its
    trailing ``ngram_n``-gram in its own token history, then ONE
    (spec_k+1)-wide verify forward scores the chain and the longest
    accepted prefix + one correction/extension token is emitted. Greedy
    is token-identical to the plain tick; sampled applies the point-mass
    rejection rule (accept d_j w.p. p_j(d_j); on rejection sample the
    normalized residual, on full accept the bonus distribution) over the
    engine's processed distributions, so the OUTPUT DISTRIBUTION equals
    plain sampling. Either way the per-round HBM sweep over weights and
    KV is amortized over every accepted token (decode is bandwidth-bound,
    so accepted tokens are nearly free).

    Layout: tentative KV for the W=spec_k+1 fed tokens is written DENSELY
    at each row's own next ring columns (per-row [B, W] cache_index);
    after acceptance only the first m+1 columns are validated and
    ``gen_cols`` advances by m+1, so rejected columns are overwritten by
    the next round — no ring capacity is wasted (caps must leave spec_k
    columns of headroom, enforced by the caller)."""
    B = st["n_real"].shape[0]
    L = st["valid"].shape[1]
    W = spec_k + 1
    rows = jnp.arange(B)
    hist = st["tok_hist"]
    Hh = hist.shape[1]
    nr = st["n_real"]          # position of the pending token (= fed[0])

    # ---- draft: trailing n-gram ending at hist[nr] (the pending token);
    # most recent PRIOR occurrence supplies the next spec_k tokens
    drafts = _lookup_draft(hist, nr, ngram_n=ngram_n, spec_k=spec_k)
    idx = jnp.arange(Hh)

    # ---- verify forward: [pending, d_1..d_k] at per-row dense columns
    fed = jnp.concatenate([st["last_tok"][:, None], drafts], axis=1)
    cols = prompt_cols + jax.lax.rem(
        st["gen_cols"][:, None] + jnp.arange(W)[None], ring_cols)
    onehot = (cols[:, :, None] == idx[None, None, :L])        # [B, W, L]
    tent = jnp.cumsum(onehot.astype(jnp.int32), axis=1) > 0   # j sees <= j
    m4 = ((st["valid"][:, None, :] != 0) | tent)[:, None]     # [B,1,W,L]
    positions = nr[:, None] + jnp.arange(W)[None]
    emb = qwen3.embed_tokens(params["text"], fed)
    cache_in = {"kv": st["cache"]}
    if "kv_scale" in st:
        cache_in["kv_scale"] = st["kv_scale"]
    hidden, cache = qwen3.forward_hidden(
        params["text"], tcfg, inputs_embeds=emb, attention_mask=m4,
        positions=positions, cache=cache_in, cache_index=cols,
        causal=False)
    st["cache"] = cache["kv"]
    if "kv_scale" in st:
        st["kv_scale"] = cache["kv_scale"]
    logits = qwen3.logits_from_hidden(params["text"], tcfg, hidden)

    # presence for verify position j includes drafts d_1..d_j (the
    # hypothetically-emitted chain) — speculative._spec_impl pres_rows
    if not gen.do_sample:
        # greedy: accept while the draft matches the penalized argmax
        targets = []
        pres = st["presence"]
        for j in range(W):
            targets.append(sample_tokens(
                logits[:, j], jax.random.key(0), do_sample=False,
                temperature=gen.temperature, top_k=gen.top_k,
                top_p=gen.top_p,
                repetition_penalty=gen.repetition_penalty, presence=pres))
            if j < W - 1:
                pres = pres.at[rows, drafts[:, j]].set(True)
        targets = jnp.stack(targets, axis=1)                  # [B, W]
        okc = jnp.cumprod(
            (drafts == targets[:, :spec_k]).astype(jnp.int32), axis=1)
        m = jnp.sum(okc, axis=1)                              # [B] accepted
        ext = jnp.take_along_axis(targets, m[:, None], axis=1)[:, 0]
    else:
        # sampled: point-mass-q rejection (accept d_j w.p. p_j(d_j)) over
        # the engine's processed dists — speculative._spec_impl sampled
        from .speculative import _processed_probs
        pres = st["presence"]
        oks = []
        for j in range(spec_k):
            pj = _processed_probs(logits[:, j].astype(jnp.float32), pres,
                                  gen)                        # [B, V]
            pd = pj[rows, drafts[:, j]]
            u = jax.random.uniform(jax.random.fold_in(rng, j), (B,))
            oks.append((u < pd).astype(jnp.int32))
            pres = pres.at[rows, drafts[:, j]].set(True)
        m = jnp.sum(jnp.cumprod(jnp.stack(oks, axis=1), axis=1), axis=1)
        # extension: residual at the reject position, bonus dist at m=k;
        # presence row at position m includes drafts d_1..d_m
        pres_m = st["presence"]
        for j in range(spec_k):
            upd = pres_m.at[rows, drafts[:, j]].set(True)
            pres_m = jnp.where((j < m)[:, None], upd, pres_m)
        lg_m = jnp.take_along_axis(
            logits, m[:, None, None], axis=1)[:, 0].astype(jnp.float32)
        pm = _processed_probs(lg_m, pres_m, gen)              # [B, V]
        dm = jnp.take_along_axis(
            drafts, jnp.minimum(m, spec_k - 1)[:, None], axis=1)[:, 0]
        resid = pm.at[rows, dm].set(0.0)
        dist = jnp.where((m < spec_k)[:, None], resid, pm)
        # numeric guard: vanished residual falls back to p_m
        dist = jnp.where(jnp.sum(dist, axis=1, keepdims=True) > 1e-20,
                         dist, pm)
        ext = jax.random.categorical(jax.random.fold_in(rng, spec_k),
                                     jnp.log(dist + 1e-30), axis=-1)

    j_w = jnp.arange(W)[None]
    emit = jnp.where(j_w < m[:, None],
                     jnp.concatenate([drafts, drafts[:, -1:]], axis=1),
                     jnp.where(j_w == m[:, None], ext[:, None],
                               gen.pad_token_id))             # [B, W]

    # ---- truncate by cap room and first EOS, inactive rows emit nothing
    room = jnp.maximum(st["cap"] - st["out_len"], 0)
    base_e = jnp.minimum(m + 1, room)
    eos_pos = jnp.min(jnp.where((emit == gen.eos_token_id)
                                & (j_w < base_e[:, None]), j_w, W), axis=1)
    e_eff = jnp.where(st["active"],
                      jnp.minimum(base_e, eos_pos + 1), 0)    # [B]
    emit_on = j_w < e_eff[:, None]

    # ---- state updates (scatter with OOB-drop for masked positions)
    T = st["out_buf"].shape[1]
    dst_out = jnp.where(emit_on, st["out_len"][:, None] + j_w, T)
    st["out_buf"] = st["out_buf"].at[rows[:, None], dst_out].set(
        emit, mode="drop")
    dst_hist = jnp.where(emit_on, nr[:, None] + 1 + j_w, Hh)
    st["tok_hist"] = st["tok_hist"].at[rows[:, None], dst_hist].set(
        emit, mode="drop")
    V = st["presence"].shape[1]
    st["presence"] = st["presence"].at[
        rows[:, None], jnp.where(emit_on, emit, V)].set(True, mode="drop")
    # keep KV columns of the e_eff fed tokens actually consumed
    keep = jnp.where(j_w < e_eff[:, None], cols, L)
    st["valid"] = st["valid"].at[rows[:, None], keep].set(1, mode="drop")
    st["gen_cols"] = st["gen_cols"] + e_eff
    st["n_real"] = nr + e_eff
    st["out_len"] = st["out_len"] + e_eff
    last = jnp.take_along_axis(
        emit, jnp.maximum(e_eff - 1, 0)[:, None], axis=1)[:, 0]
    st["last_tok"] = jnp.where(e_eff > 0, last, st["last_tok"])
    n_act_in = jnp.maximum(jnp.sum(st["active"].astype(jnp.int32)), 1)
    newly_done = st["active"] & (
        (eos_pos < base_e) | (st["out_len"] >= st["cap"]))
    st["active"] = st["active"] & ~newly_done
    # accepted draft tokens actually emitted (e_eff - 1 per live row)
    acc_round = jnp.sum(jnp.maximum(e_eff - 1, 0))
    st["accepted"] = st["accepted"] + acc_round
    if "spec_ema" in st:  # adaptive ring: per-round acceptance-rate EMA
        rate = acc_round.astype(jnp.float32) / (spec_k * n_act_in)
        st["spec_ema"] = 0.8 * st["spec_ema"] + 0.2 * rate
        st["spec_ticks"] = st["spec_ticks"] + 1
    return st


def _run_impl(params, queue_ids, queue_mask, queue_caps, queue_omics,
              rng, *,
              cfg: FusionConfig, gen: GenerationConfig, n_slots: int,
              max_len: int, admit_group: int, kv_quant: Optional[str],
              spec_k: int = 0, ngram_n: int = 3,
              spec_threshold: Optional[float] = None,
              probe_every: int = 0, chunk: int = 32,
              spec_initial_ema: float = 1.0):
    tcfg = cfg.text
    N, bucket = queue_ids.shape
    prompt_cols = bucket
    ring_cols = max_len - prompt_cols
    T = gen.max_new_tokens

    c = qwen3.init_cache(tcfg, n_slots, max_len, quant=kv_quant)
    st = {
        "cache": c["kv"],
        **({"kv_scale": c["kv_scale"]} if "kv_scale" in c else {}),
        "valid": jnp.zeros((n_slots, max_len), jnp.int32),
        "head": jnp.int32(0),
        "n_real": jnp.zeros((n_slots,), jnp.int32),
        "last_tok": jnp.zeros((n_slots,), jnp.int32),
        "presence": jnp.zeros((n_slots, tcfg.vocab_size), bool),
        "out_buf": jnp.full((n_slots, T), gen.pad_token_id, jnp.int32),
        "out_len": jnp.zeros((n_slots,), jnp.int32),
        "cap": jnp.full((n_slots,), T, jnp.int32),
        "active": jnp.zeros((n_slots,), bool),
        "req_of_slot": jnp.full((n_slots,), -1, jnp.int32),
        # +1 scratch row absorbs virgin-slot harvests (req_id -1)
        "results": jnp.full((N + 1, T), gen.pad_token_id, jnp.int32),
        "res_len": jnp.zeros((N + 1,), jnp.int32),
        "queue_ids": queue_ids,
        "queue_mask": queue_mask.astype(jnp.int32),
        "queue_caps": queue_caps,
        "queue_head": jnp.int32(0),
        "tick": jnp.int32(0),
        **queue_omics,  # queue_{dna,prot}_{tokens,pos} when fusion prompts
    }
    adaptive = bool(spec_k) and spec_threshold is not None
    if spec_k:
        st["tok_hist"] = jnp.full((n_slots, max_len), -1, jnp.int32)
        st["gen_cols"] = jnp.zeros((n_slots,), jnp.int32)
        st["accepted"] = jnp.int32(0)
    if adaptive:
        # start optimistic by default (spec on); a no-match workload
        # decays the EMA below threshold within ~10 rounds (0.8^10 ≈
        # 0.11). spec_initial_ema < threshold starts plain instead — the
        # shadow estimator raises the EMA if the workload is quotable.
        st["spec_ema"] = jnp.float32(spec_initial_ema)
        st["spec_ticks"] = jnp.int32(0)
        st["cycle"] = jnp.int32(0)
        st["chunk_start"] = jnp.int32(0)

    # Loop nesting matters enormously here: putting admit/decode in a
    # lax.cond selected EVERY tick forces XLA to copy the multi-GB cache
    # across the cond boundary each iteration (measured 36.7 ms/tick vs
    # the online engine's ~7 ms chunk tick at identical shapes). Instead
    # the INNER while_loop is pure decode — structurally identical to the
    # online engine's chunk, which XLA aliases fully in place — and the
    # OUTER loop runs one admission (cond'd on queue state) per admission
    # cycle, so the copy cost amortizes over a whole cycle of ticks.
    def want_admit(st):
        free = jnp.sum(jnp.logical_not(st["active"]))
        return jnp.logical_and(st["queue_head"] < N, free >= admit_group)

    def decode_cond(st):
        return jnp.logical_and(jnp.any(st["active"]),
                               jnp.logical_not(want_admit(st)))

    def decode_body(st):
        if spec_k:
            r = jax.random.fold_in(rng, st["tick"])
            st = _spec_tick(params, st, r, tcfg=tcfg, gen=gen,
                            prompt_cols=prompt_cols, ring_cols=ring_cols,
                            spec_k=spec_k, ngram_n=ngram_n)
            st["head"] = st["head"] + 1  # rounds, for decode_ticks stats
        else:
            r = jax.random.fold_in(rng, st["tick"])
            st = _decode_tick(params, st, r, tcfg=tcfg, gen=gen,
                              prompt_cols=prompt_cols, ring_cols=ring_cols)
        st["tick"] = st["tick"] + 1
        return st

    def outer_cond(st):
        return jnp.logical_or(jnp.any(st["active"]), st["queue_head"] < N)

    def outer_body(st):
        st = jax.lax.cond(
            want_admit(st),
            lambda s: _admit(params, s,
                             jax.random.fold_in(rng, -1 - s["tick"]),
                             cfg=cfg, gen=gen, n_slots=n_slots,
                             admit_group=admit_group, bucket=bucket,
                             ring_cols=ring_cols),
            lambda s: s, st)
        st["tick"] = st["tick"] + 1
        if not adaptive:
            return jax.lax.while_loop(decode_cond, decode_body, st)
        # Acceptance-adaptive ring: re-choose spec-vs-plain once per
        # BOUNDED chunk of ticks, at the same loop level as the admit
        # cond — never per tick, which would copy the multi-GB cache
        # across a cond boundary every iteration (the measured 5x
        # pathology in the module docstring). While the acceptance EMA
        # sits below threshold the ring runs plain ticks whose SHADOW
        # estimator (see _decode_tick) keeps the EMA live for free, so a
        # workload that turns quotable flips speculation back on without
        # spending speculative rounds. ``probe_every`` > 0 additionally
        # forces one real spec chunk every N chunks (off by default —
        # the shadow makes it redundant; kept as a belt-and-suspenders
        # knob and for A/B-measuring the shadow itself).
        def chunk_cond(s):
            return jnp.logical_and(decode_cond(s),
                                   s["tick"] - s["chunk_start"] < chunk)

        def spec_chunk(s):
            return jax.lax.while_loop(chunk_cond, decode_body, s)

        def plain_chunk(s):
            def body(ss):
                r = jax.random.fold_in(rng, ss["tick"])
                ss = _decode_tick(params, ss, r, tcfg=tcfg, gen=gen,
                                  prompt_cols=prompt_cols,
                                  ring_cols=ring_cols,
                                  spec_k=spec_k, ngram_n=ngram_n)
                ss["tick"] = ss["tick"] + 1
                return ss
            return jax.lax.while_loop(chunk_cond, body, s)

        use_spec = st["spec_ema"] >= spec_threshold
        if probe_every > 0:
            probe = jax.lax.rem(st["cycle"], probe_every) == 0
            use_spec = jnp.logical_or(use_spec, probe)
        st["cycle"] = st["cycle"] + 1
        st["chunk_start"] = st["tick"]
        return jax.lax.cond(use_spec, spec_chunk, plain_chunk, st)

    st = jax.lax.while_loop(outer_cond, outer_body, st)

    # final harvest: every slot still binding a request streams out
    req_ids = st["req_of_slot"]
    dst = jnp.where(req_ids >= 0, req_ids, N)
    st["results"] = st["results"].at[dst].set(st["out_buf"])
    st["res_len"] = st["res_len"].at[dst].set(st["out_len"])
    return (st["results"][:N], st["res_len"][:N], st["tick"],
            st["head"], st.get("accepted", jnp.int32(-1)),
            st.get("spec_ticks", jnp.int32(-1)),
            st.get("spec_ema", jnp.float32(-1.0)))


def spec_break_even_threshold(t_plain_tick: float, t_spec_round: float,
                              spec_k: int) -> float:
    """Acceptance rate a* where speculation breaks even against plain
    ticks. A plain tick emits 1 token/row in t_plain; a spec round emits
    1 + a*k tokens/row in t_spec. Equal throughput at
    (1 + a*k) / t_spec = 1 / t_plain  =>  a* = (t_spec/t_plain - 1) / k.

    Round 4 measured that a FIXED threshold mispredicts: the spec/plain
    tick-cost ratio is an operating-point property — ~1 when decode is
    weight-bound (B=1 large model: verifying k+1 tokens reads the same
    weights) but grows with batch (32-slot 0.6B: the k+1-token verify
    turns compute-bound and spec LOSES even at high acceptance, 6,105 vs
    6,788 tok/s — benchmarks/README "in-ring speculation on the
    copy-trained workload"). Deriving a* from MEASURED tick costs makes
    the adaptive ring pick correctly at both points."""
    r = t_spec_round / max(t_plain_tick, 1e-12)
    return max(0.0, (r - 1.0) / spec_k)


def calibrate_spec_threshold(
    params, cfg: FusionConfig, gen: GenerationConfig, *,
    n_slots: int, max_len: int, bucket: int, spec_k: int,
    ngram_n: int = 3, kv_quant: Optional[str] = None,
    cal_tokens: int = 64, safety: float = 1.0,
    rng: Optional[jax.Array] = None,
) -> Dict[str, float]:
    """Measure plain-tick and spec-round costs at THIS operating point and
    derive the adaptive ring's break-even threshold.

    Runs two short random-prompt workloads (acceptance ~ 0, so every spec
    round emits ~1 token/row — its cost is read directly off the wall
    clock): one plain, one always-spec. Both executables are the ones the
    real run uses (same shapes, same _run_fn cache), so the plain leg's
    compile is the only extra cost. Returns {"threshold", "t_plain_tick",
    "t_spec_round", "ratio"}; pass threshold to run_offline's
    spec_threshold. safety > 1 demands that margin of win before
    speculating."""
    import time as _time

    rng = rng if rng is not None else jax.random.key(7)
    r_np = np.random.default_rng(11)
    N = n_slots  # one admission, decode-dominated
    ids = r_np.integers(4, cfg.text.vocab_size - 4, (N, bucket)).astype(
        np.int32)
    mask = np.ones((N, bucket), np.int32)
    import dataclasses
    cal_gen = dataclasses.replace(gen, max_new_tokens=cal_tokens,
                                  eos_token_id=-1)

    def timed(spec):
        kw = dict(n_slots=n_slots, max_len=max_len, admit_group=n_slots,
                  kv_quant=kv_quant, rng=rng)
        if spec:
            kw.update(spec_lookup=spec_k, ngram_n=ngram_n)
        run_offline(params, cfg, cal_gen, ids, mask, **kw)  # compile+warm
        t0 = _time.perf_counter()
        out = run_offline(params, cfg, cal_gen, ids, mask, **kw)
        dt = _time.perf_counter() - t0
        return dt / max(out["decode_ticks"], 1)

    t_plain = timed(False)
    t_spec = timed(True)
    thr = spec_break_even_threshold(t_plain, t_spec * safety, spec_k)
    return {"threshold": thr, "t_plain_tick": t_plain,
            "t_spec_round": t_spec, "ratio": t_spec / t_plain}


@lru_cache(maxsize=None)
def _run_fn(cfg, gen, n_slots, max_len, admit_group, kv_quant,
            spec_k=0, ngram_n=3, spec_threshold=None,
            probe_every=0, chunk=32, spec_initial_ema=1.0):
    return jax.jit(partial(
        _run_impl, cfg=cfg, gen=gen, n_slots=n_slots, max_len=max_len,
        admit_group=admit_group, kv_quant=kv_quant, spec_k=spec_k,
        ngram_n=ngram_n, spec_threshold=spec_threshold,
        probe_every=probe_every, chunk=chunk,
        spec_initial_ema=spec_initial_ema))


def run_offline(params, cfg: FusionConfig, gen: GenerationConfig,
                queue_ids: np.ndarray, queue_mask: np.ndarray,
                queue_caps: Optional[np.ndarray] = None, *,
                n_slots: int = 64, max_len: int = 1024,
                admit_group: int = 8,
                kv_quant: Optional[str] = None,
                spec_lookup: int = 0, ngram_n: int = 3,
                spec_threshold: Optional[float] = None,
                spec_probe_every: int = 0, spec_chunk: int = 32,
                spec_initial_ema: float = 1.0,
                queue_omics: Optional[Dict[str, np.ndarray]] = None,
                rng: Optional[jax.Array] = None,
                ) -> Dict[str, np.ndarray]:
    """Run a whole offline workload in one device dispatch.

    queue_ids/queue_mask: [N, bucket] left-padded prompts (one bucket).
    queue_caps: [N] per-request max_new_tokens (default: gen cap).
    queue_omics: fusion prompts — whole-queue omics segment arrays
    ({"dna_rna_tokens": [N, G, k], "dna_rna_pos": [N, G],
    "protein_tokens": ..., "protein_pos": ...}, collator layout with
    start positions already shifted for the left pad); each admission
    group's segments run through the encoders on device.
    spec_lookup: draft tokens per prompt-lookup speculation round
    (0 = plain one-token ticks). Greedy outputs stay token-identical;
    sampled outputs stay distribution-identical (point-mass rejection
    rule); rounds shrink by the acceptance rate.
    spec_threshold: with spec_lookup > 0, turn on the ACCEPTANCE-ADAPTIVE
    ring: speculation runs only while its acceptance-rate EMA sits above
    this threshold, so a no-match workload pays ~the plain-ring cost
    instead of the measured 0.45x batched zero-acceptance floor
    (benchmarks/README "In-ring speculation"). While running plain, each
    tick updates the same EMA for free via SHADOW-DRAFT estimation (the
    lookup draft's first token vs the actually-emitted token — an
    unbiased sample of the acceptance probability, extrapolated to the
    k-chain), so the ring notices a workload turning quotable without
    spending speculative rounds; spec_probe_every > 0 additionally
    forces one real spec chunk every N chunks (default 0 = shadow only).
    Break-even at batch 32 is ≈ 1.2/spec_k accepted drafts per round;
    0.2 is a sane default for k=8. Mode flips happen at bounded-chunk
    boundaries (never per tick) — spec_chunk ticks per flip decision.
    Each chunk boundary is a lax.cond the KV pool crosses (a real copy,
    the module docstring's pathology amortized), so bigger chunks cost
    less overhead but flip slower; the shadow keeps big chunks safe
    because detection runs inside the plain chunk itself. On-chip:
    chunk 32 + probe 16 ≈ 78% of plain-ring throughput on a
    zero-acceptance workload (benchmarks/README "acceptance-adaptive
    ring"). spec_initial_ema sets the starting EMA (default 1.0 =
    optimistic, first chunk speculates; set below threshold to start
    plain for known-random workloads). Both tick types are token-exact
    (greedy) / distribution-exact (sampled), so adaptivity never changes
    outputs — only which executable produced them. Returns
    {"tokens": [N, T] int32, "lengths": [N], "ticks": int,
    "decode_ticks": int, "accepted": int, "spec_ticks": int (adaptive:
    rounds that ran speculatively; -1 otherwise), "spec_ema": float};
    row i holds request i's generated tokens (EOS included), first
    ``lengths[i]`` valid.
    """
    N = queue_ids.shape[0]
    assert N >= 1
    caps = (np.full((N,), gen.max_new_tokens, np.int32)
            if queue_caps is None else np.asarray(queue_caps, np.int32))
    if spec_lookup:
        # tentative KV columns need spec_lookup headroom past the cap
        caps = np.minimum(caps, max_len - queue_ids.shape[1] - spec_lookup)
    # pad the queue to a multiple of the admission group with cap-1 dummy
    # rows so the admit branch's shape is static
    k = max(1, min(admit_group, n_slots))
    pad = (-N) % k
    # rename to the ring's queue keys (dict rides the jit as a pytree)
    _QKEY = {"dna_rna_tokens": "queue_dna_tokens",
             "dna_rna_pos": "queue_dna_pos",
             "protein_tokens": "queue_prot_tokens",
             "protein_pos": "queue_prot_pos"}
    omics = {_QKEY[kk]: np.asarray(v, np.int32)
             for kk, v in (queue_omics or {}).items()}
    if pad:
        queue_ids = np.concatenate(
            [np.asarray(queue_ids),
             np.full((pad, queue_ids.shape[1]),
                     gen.pad_token_id, np.int32)])
        queue_mask = np.concatenate(
            [np.asarray(queue_mask),
             np.ones((pad, queue_mask.shape[1]), np.int32)])
        caps = np.concatenate([caps, np.ones((pad,), np.int32)])
        for kk, v in omics.items():  # dummy rows: no segments (pos -1),
            fill = -1 if kk.endswith("_pos") else 1  # pad tokens = 1
            omics[kk] = np.concatenate(
                [v, np.full((pad,) + v.shape[1:], fill, np.int32)])
    fn = _run_fn(cfg, gen, n_slots, max_len, k, kv_quant,
                 spec_lookup, ngram_n, spec_threshold,
                 spec_probe_every, spec_chunk, spec_initial_ema)
    rng = rng if rng is not None else jax.random.key(0)
    res, lens, ticks, head, accepted, spec_ticks, spec_ema = fn(
        params, jnp.asarray(queue_ids, jnp.int32),
        jnp.asarray(queue_mask, jnp.int32), jnp.asarray(caps),
        {kk: jnp.asarray(v) for kk, v in omics.items()}, rng)
    res, lens = np.asarray(res[:N]), np.asarray(lens[:N])
    return {"tokens": res, "lengths": lens,
            "ticks": int(ticks), "decode_ticks": int(head),
            "accepted": int(accepted), "spec_ticks": int(spec_ticks),
            "spec_ema": float(spec_ema)}
