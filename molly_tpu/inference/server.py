"""Continuous-batching serving engine (in-flight batching over KV slots).

The reference's serving story is static batching: one DataLoader batch at a
time through HF ``generate`` with ``max_new_tokens=3072``
(/root/reference/src/inference_lora.py:284-321) — every prompt in a batch
waits for the longest generation. This engine is the TPU-native upgrade:

  - a fixed pool of ``n_slots`` KV-cache slots ([L, n_slots, Nkv, Smax,
    2*Dh], one compiled decode program for the pool);
  - prefill runs per request on a padded length bucket (one compiled
    program per bucket) and the resulting KV block is inserted into a free
    slot while other slots keep decoding;
  - decode steps advance ALL active slots one token, with per-slot
    sampling state (presence sets for repetition penalty) and per-slot
    EOS/length termination;
  - finished slots free immediately and the next queued request takes
    over — no head-of-line blocking.

Cache layout: columns [0, prompt_cols) hold each slot's prefilled prompt;
columns [prompt_cols, Smax) are a GENERATION RING indexed by a global tick
counter shared by every slot. All slots therefore write the SAME column
each decode step (one contiguous dynamic-update-slice — the fast path the
batch engine uses; a per-row scatter at per-slot lengths measured 2.5x
slower per step on v5e because XLA copies the carried cache). Column order
is not token order in the ring, so attention runs mask-only
(``causal=False``) with RoPE positions tracked per slot; a request's
generated span is contiguous in ring ticks, so ``cap <= ring_cols``
guarantees it never overwrites its own live history.

Works with bf16, ``fuse_for_decode``, and int8 ``quantize_for_decode``
parameter trees; fusion prompts (injected DNA/protein segments) prefill
through the same jitted encoder+injection graph the batch engine uses.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import qwen3
from ..models.fusion import FusionConfig
from .engine import GenerationConfig
from .sampling import sample_tokens_rowwise


@dataclass
class Request:
    uid: Any
    batch: Dict[str, np.ndarray]  # single-sample arrays: input_ids [1, S],
    #                               attention_mask [1, S], optional
    #                               {dna_rna,protein}_{tokens,pos}
    max_new_tokens: Optional[int] = None  # per-request cap (<= engine cap)
    # per-request sampling overrides (any of "greedy", "temperature",
    # "top_k", "top_p", "repetition_penalty"); unset keys inherit the
    # engine's GenerationConfig. top_k is bounded by the engine's
    # compiled candidate width (gen.top_k); temperature <= 0 means greedy.
    sampling: Optional[Dict[str, Any]] = None
    # multi-LoRA serving: index into the engine's stacked adapter bank
    # (lora.stack_adapters; 0 = base model, i+1 = adapter i)
    adapter: int = 0


def _pad_to_bucket(batch: Dict[str, np.ndarray], bucket: int,
                   pad_id: int, side: str = "left"
                   ) -> Dict[str, np.ndarray]:
    """Pad a single-sample batch to the bucket length. side="left" mirrors
    the dataset's test-mode left pad and shifts omics segment start
    positions (/root/reference/src/dataset/omics_dataset.py:384-391);
    side="right" keeps content at position 0 (the paged engine packs
    tokens from the start of each page chain, inference/paged.py)."""
    ids = np.asarray(batch["input_ids"])
    S = ids.shape[1]
    d = bucket - S
    assert d >= 0, (S, bucket)
    pad = (d, 0) if side == "left" else (0, d)
    out = dict(batch)
    out["input_ids"] = np.pad(ids, ((0, 0), pad), constant_values=pad_id)
    mask = np.asarray(batch.get("attention_mask",
                                np.ones_like(ids, np.int32)))
    out["attention_mask"] = np.pad(mask, ((0, 0), pad))
    if side == "left":
        for key in ("dna_rna_pos", "protein_pos"):
            if key in batch:
                pos = np.asarray(batch[key])
                out[key] = np.where(pos >= 0, pos + d, pos)
    return out


# ---------------------------------------------------------------------------
# jitted cores (params passed explicitly; cfg/gen bound statically)
# ---------------------------------------------------------------------------


# The serving state is split in two: HOT buffers (the big ones the decode
# loop updates in place — donated into every dispatch) and COLD scalars/
# rows (never donated, so the scheduler can fetch a pre-dispatch snapshot
# WHILE the next chunk runs on device — pipelined scheduling).
# "kv_scale" exists only with kv_quant="int8" (per-column KV scales);
# "k_pages"/"v_pages" only in the paged engine (inference/paged.py).
_HOT_KEYS = ("cache", "kv_scale", "valid", "presence",
             "k_pages", "v_pages", "k_scales", "v_scales")


def _split_state(s):
    return ({k: s[k] for k in _HOT_KEYS if k in s},
            {k: v for k, v in s.items() if k not in _HOT_KEYS})


def _samp_from_state(s) -> dict:
    return {"greedy": s["samp_greedy"], "temperature": s["samp_temp"],
            "top_k": s["samp_top_k"], "top_p": s["samp_top_p"],
            "repetition_penalty": s["samp_pen"]}


def _prefill_insert_impl(params, hot, cold, batch, slots, caps, samp,
                         rng, kv_pre, *, cfg: FusionConfig,
                         gen: GenerationConfig, s_pre: int = 0):
    """Embed (with omics injection) + prefill + sample first tokens +
    insert for a GROUP of k same-bucket requests — ONE dispatch per
    admission group (each separate dispatch over a tunneled TPU costs a
    ~10-25 ms round trip, and a B=1 prefill reads all the weights for one
    row; batching admissions amortizes both).

    batch arrays are [k, Sb]; slots/caps are [k]. With prefix caching
    (s_pre > 0), ``kv_pre`` [L, 1, Nkv, s_pre, 2Dh] is the precomputed KV
    of the shared prompt prefix (molly's fixed system prompt) and the
    batch holds only the SUFFIX — prefill cost drops accordingly."""
    state = {**hot, **cold}
    from ..models import fusion
    tcfg = cfg.text
    embed_keys = ("input_ids", "dna_rna_tokens", "dna_rna_pos",
                  "protein_tokens", "protein_pos")
    embeds = fusion.build_inputs_embeds(
        params, cfg, {k: batch[k] for k in embed_keys if k in batch})
    mask = batch["attention_mask"]
    k, Sb = mask.shape
    cache = qwen3.init_cache(tcfg, k, s_pre + Sb)
    positions = s_pre + jnp.maximum(
        jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1, 0)
    if s_pre:
        cache["kv"] = cache["kv"].at[:, :, :, :s_pre, :].set(
            kv_pre.astype(cache["kv"].dtype))
        full_mask = jnp.concatenate(
            [jnp.ones((k, s_pre), jnp.int32), mask.astype(jnp.int32)],
            axis=1)
    else:
        full_mask = mask
    bank = params.get("lora_bank")
    hidden, cache = qwen3.forward_hidden(
        params["text"], tcfg, inputs_embeds=embeds,
        attention_mask=full_mask, positions=positions, cache=cache,
        cache_index=s_pre, lora=bank,
        lora_slots=samp.get("adapter") if bank is not None else None)
    logits = qwen3.logits_from_hidden(params["text"], tcfg, hidden[:, -1])
    presence = jnp.zeros((k, tcfg.vocab_size), bool)
    tok0 = sample_tokens_rowwise(logits, rng, samp, presence,
                                 max_top_k=gen.top_k)
    presence = presence.at[jnp.arange(k), tok0].set(True)

    s = dict(state)
    # each request's (prefix ‖) prompt KV fills columns [0, s_pre + Sb);
    # prefill itself runs bf16 (keeps flash attention), quantizing only at
    # insertion when the slot pool stores int8 KV
    if "kv_scale" in s:
        q8, sc = qwen3.quantize_kv(cache["kv"])
        s["cache"] = s["cache"].at[:, slots, :, :s_pre + Sb, :].set(q8)
        s["kv_scale"] = s["kv_scale"].at[:, slots, :, :s_pre + Sb, :].set(sc)
    else:
        s["cache"] = s["cache"].at[:, slots, :, :s_pre + Sb, :].set(
            cache["kv"].astype(s["cache"].dtype))
    rows = jnp.zeros((k, s["valid"].shape[1]), jnp.int32)
    rows = rows.at[:, :s_pre + Sb].set(full_mask)
    s["valid"] = s["valid"].at[slots].set(rows)
    s["n_real"] = s["n_real"].at[slots].set(jnp.sum(full_mask, axis=1))
    s = _insert_request_rows(s, slots, caps, samp, tok0, presence, logits,
                             gen=gen)
    return _split_state(s)


def _insert_request_rows(s, slots, caps, samp, tok0, presence, logits, *,
                         gen: GenerationConfig):
    """Admission bookkeeping shared by the dense-ring and paged engines:
    per-slot sampler state, output buffers, caps, and active/finished
    flags — everything EXCEPT the KV storage itself (which is layout-
    specific: slot-pool insert above, page scatter in inference/paged.py)."""
    k = tok0.shape[0]
    s["last_tok"] = s["last_tok"].at[slots].set(tok0)
    s["presence"] = s["presence"].at[slots].set(presence)
    out_rows = jnp.full((k, s["out_buf"].shape[1]), gen.pad_token_id,
                        jnp.int32).at[:, 0].set(tok0)
    s["out_buf"] = s["out_buf"].at[slots].set(out_rows)
    if "logp_buf" in s:
        lp0 = jax.nn.log_softmax(logits.astype(jnp.float32))[
            jnp.arange(k), tok0]
        lrows = jnp.zeros((k, s["logp_buf"].shape[1]),
                          jnp.float32).at[:, 0].set(lp0)
        s["logp_buf"] = s["logp_buf"].at[slots].set(lrows)
    s["out_len"] = s["out_len"].at[slots].set(1)
    s["cap"] = s["cap"].at[slots].set(caps)
    s["samp_greedy"] = s["samp_greedy"].at[slots].set(samp["greedy"])
    s["samp_temp"] = s["samp_temp"].at[slots].set(samp["temperature"])
    s["samp_top_k"] = s["samp_top_k"].at[slots].set(samp["top_k"])
    s["samp_top_p"] = s["samp_top_p"].at[slots].set(samp["top_p"])
    s["samp_pen"] = s["samp_pen"].at[slots].set(
        samp["repetition_penalty"])
    if "adapter_id" in s:
        s["adapter_id"] = s["adapter_id"].at[slots].set(samp["adapter"])
    done0 = jnp.logical_or(tok0 == gen.eos_token_id, caps <= 1)
    s["active"] = s["active"].at[slots].set(~done0)
    s["finished"] = s["finished"].at[slots].set(done0)
    return s


def _decode_impl(params, state, rng, *, cfg: FusionConfig,
                 gen: GenerationConfig, prompt_cols: int, ring_cols: int):
    tcfg = cfg.text
    s = dict(state)
    emb = qwen3.embed_tokens(params["text"], s["last_tok"][:, None])
    # every slot writes the SAME ring column this tick (scalar-index cache
    # update — the fast path); the column becomes attendable only for
    # active slots, and any stale bit there is cleared for the rest
    col = prompt_cols + jax.lax.rem(s["head"], ring_cols)
    valid2 = s["valid"].at[:, col].set(s["active"].astype(jnp.int32))
    cache_in = {"kv": s["cache"]}
    if "kv_scale" in s:
        cache_in["kv_scale"] = s["kv_scale"]
    bank = params.get("lora_bank")
    hidden, cache = qwen3.forward_hidden(
        params["text"], tcfg, inputs_embeds=emb, attention_mask=valid2,
        positions=s["n_real"][:, None], cache=cache_in,
        cache_index=col, causal=False, lora=bank,
        lora_slots=s.get("adapter_id") if bank is not None else None)
    s["cache"] = cache["kv"]
    if "kv_scale" in s:
        s["kv_scale"] = cache["kv_scale"]
    s["valid"] = valid2
    s["head"] = s["head"] + 1
    return _advance_slots(params, s, hidden, rng, cfg=cfg, gen=gen)


def _advance_slots(params, s, hidden, rng, *, cfg: FusionConfig,
                   gen: GenerationConfig):
    """Post-attention half of a decode step, shared by the dense-ring and
    paged engines: sample next tokens for active slots, advance output
    buffers / presence sets / lengths, flip EOS- or cap-terminated slots
    to finished."""
    rows = jnp.arange(s["n_real"].shape[0])
    logits = qwen3.logits_from_hidden(params["text"], cfg.text,
                                      hidden[:, 0])
    nxt = sample_tokens_rowwise(logits, rng, _samp_from_state(s),
                                s["presence"], max_top_k=gen.top_k)
    nxt = jnp.where(s["active"], nxt, gen.pad_token_id)
    safe = jnp.minimum(s["out_len"], s["out_buf"].shape[1] - 1)
    s["out_buf"] = s["out_buf"].at[rows, safe].set(
        jnp.where(s["active"], nxt, s["out_buf"][rows, safe]))
    if "logp_buf" in s:
        # chosen-token logprob under the RAW model distribution (pre
        # penalty/temperature — the model's own confidence, not the
        # sampler's); OpenAI "logprobs" surface
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))[rows, nxt]
        s["logp_buf"] = s["logp_buf"].at[rows, safe].set(
            jnp.where(s["active"], lp, s["logp_buf"][rows, safe]))
    s["presence"] = s["presence"].at[rows, nxt].set(
        s["presence"][rows, nxt] | s["active"])
    s["out_len"] = s["out_len"] + s["active"]
    s["n_real"] = s["n_real"] + s["active"]
    s["last_tok"] = jnp.where(s["active"], nxt, s["last_tok"])
    newly_done = s["active"] & (
        (nxt == gen.eos_token_id) | (s["out_len"] >= s["cap"]))
    s["active"] = s["active"] & ~newly_done
    s["finished"] = s["finished"] | newly_done
    return s


def _prefill_decode_impl(params, hot, cold, batch, slots, caps, samp,
                         rng, kv_pre, stop_free, *, prefill, step,
                         n_steps):
    """Admission group prefill + decode chunk in ONE dispatch. The
    scheduler's steady state is admit-then-decode every round; dispatching
    them separately pays two ~38 ms tunnel round trips (measured in
    benchmarks/README.md 'dispatch overhead') where one suffices — at 64
    slots one dispatch is worth ~440 slot-ticks of decode throughput.

    ``prefill``/``step`` are the engine's bound impls (dense-ring here,
    page-pool variants in inference/paged.py — the scheduler, chunk loop,
    and dispatch fusion are layout-agnostic)."""
    r1, r2 = jax.random.split(rng)
    hot, cold = prefill(params, hot, cold, batch, slots, caps, samp, r1,
                        kv_pre)
    return _decode_chunk_impl(params, hot, cold, r2, stop_free, step=step,
                              n_steps=n_steps)


def _decode_chunk_impl(params, hot, cold, rng, stop_free, *, step,
                       n_steps):
    """Up to n_steps decode steps in ONE dispatch (early exit when every
    slot finishes). Scheduler host syncs (flag reads, rng splits) cost
    ~10-25 ms each over a tunneled TPU — chunking amortizes them.

    ``stop_free`` (dynamic scalar) arms DEVICE-SIDE early exit: the chunk
    also ends once >= stop_free slots sit finished-but-unharvested, so
    freed slots stop burning idle ticks the moment a backfill-worthy group
    has accumulated — the scheduler admits next round instead of the slots
    waiting out the chunk. 0 disables (drain mode: no queue to admit).
    This subsumes host-side chunk sizing: a slot hitting its cap or EOS
    sets ``finished``, so chunks adapt to the min remaining cap in the
    pool without the host predicting it."""
    def cond(carry):
        st, i = carry
        go = jnp.logical_and(i < n_steps, jnp.any(st["active"]))
        backfill_ready = jnp.logical_and(
            stop_free > 0, jnp.sum(st["finished"]) >= stop_free)
        return jnp.logical_and(go, ~backfill_ready)

    def body(carry):
        st, i = carry
        st = step(params, st, jax.random.fold_in(rng, i))
        return st, i + 1

    state, _ = jax.lax.while_loop(cond, body, ({**hot, **cold},
                                               jnp.int32(0)))
    return _split_state(state)


# jitted callables cached at module level: engine instances with the same
# (cfg, gen, ...) share compiled executables (a fresh functools.partial per
# instance would defeat jax's jit cache and recompile everything)
@lru_cache(maxsize=None)
def _prefill_insert_fn(cfg, gen, s_pre=0):
    return jax.jit(partial(_prefill_insert_impl, cfg=cfg, gen=gen,
                           s_pre=s_pre),
                   donate_argnums=(1,))


@lru_cache(maxsize=None)
def _prefix_kv_fn(cfg):
    def impl(params, prefix_ids):
        tcfg = cfg.text
        S = prefix_ids.shape[1]
        cache = qwen3.init_cache(tcfg, 1, S)
        emb = qwen3.embed_tokens(params["text"], prefix_ids)
        _, cache = qwen3.forward_hidden(
            params["text"], tcfg, inputs_embeds=emb,
            attention_mask=jnp.ones((1, S), jnp.int32),
            positions=jnp.arange(S)[None, :], cache=cache, cache_index=0)
        return cache["kv"]
    return jax.jit(impl)


@lru_cache(maxsize=None)
def _prefill_decode_fn(cfg, gen, s_pre, prompt_cols, ring_cols, n_steps):
    return jax.jit(
        partial(_prefill_decode_impl,
                prefill=partial(_prefill_insert_impl, cfg=cfg, gen=gen,
                                s_pre=s_pre),
                step=partial(_decode_impl, cfg=cfg, gen=gen,
                             prompt_cols=prompt_cols,
                             ring_cols=ring_cols),
                n_steps=n_steps),
        donate_argnums=(1,))


@lru_cache(maxsize=None)
def _decode_fn(cfg, gen, prompt_cols, ring_cols, n_steps):
    return jax.jit(
        partial(_decode_chunk_impl,
                step=partial(_decode_impl, cfg=cfg, gen=gen,
                             prompt_cols=prompt_cols,
                             ring_cols=ring_cols),
                n_steps=n_steps),
        donate_argnums=(1,))


class ServingEngine:
    """In-flight batching over a fixed slot pool.

    Usage::

        eng = ServingEngine(params, cfg, gen, n_slots=8, max_len=512)
        results = eng.run([Request(uid=i, batch=b) for i, b in ...])
        # results: {uid: np.ndarray of generated tokens (EOS included)}
    """

    def __init__(self, params: Dict[str, Any], cfg: FusionConfig,
                 gen: GenerationConfig, *, n_slots: int = 8,
                 max_len: int = 1024,
                 prefill_buckets=(64, 128, 256, 512, 1024),
                 decode_chunk: int = 1,
                 admit_batch: int = 8,
                 kv_quant: Optional[str] = None,
                 prefix_ids=None,
                 stream_cb=None,
                 logprobs: bool = False,
                 lora_bank: Optional[Dict[str, Any]] = None,
                 rng: Optional[jax.Array] = None):
        """prefix_ids: token ids of a prompt prefix shared by EVERY request
        (molly's fixed system prompt — the dataset pre-encodes it,
        /root/reference/src/dataset/omics_dataset.py:87-92). Its KV is
        computed once and copied into each slot at admission; requests then
        prefill only their suffix. Buckets bound SUFFIX lengths.

        stream_cb(uid, tokens_so_far): incremental delivery — called once
        per scheduler round for every request whose generation advanced,
        with the full prefix of tokens generated so far (np.int32). Tokens
        lag by up to one decode chunk (the scheduler runs on a one-chunk-
        stale snapshot); delivery costs one extra host fetch per round.

        lora_bank: stacked multi-LoRA adapters (lora.stack_adapters) —
        each request picks its adapter via Request.adapter (0 = base);
        one compiled program serves the whole mix. Works on both the
        unfused and the fused/int8 decode weights (per-target deltas
        land on column slices of the fused projections,
        models.lora.apply_lora_fused). Mutually exclusive with
        shared-prefix caching (the prefix KV would differ per
        adapter)."""
        assert params.get("lora") is None, "merge LoRA adapters first"
        if lora_bank is not None:
            assert prefix_ids is None, (
                "shared-prefix caching is per-adapter under multi-LoRA "
                "— not supported; pass prefix_ids=None")
            params = {**params, "lora_bank": lora_bank}
        self._n_adapters = (
            0 if lora_bank is None else
            next(iter(lora_bank["layers"].values()))["a"].shape[1])
        self.params = params
        self.cfg = cfg
        self.gen = gen
        self.n_slots = n_slots
        self.max_len = max_len
        # early-exit threshold: a decode chunk ends once this many slots
        # sit finished while requests are queued (backfill group size)
        self.admit_batch = max(1, min(admit_batch, n_slots))
        tcfg = cfg.text
        if prefix_ids is not None:
            self.prefix_ids = np.asarray(prefix_ids,
                                         np.int32).reshape(-1)
            self.s_pre = int(self.prefix_ids.size)
            self._kv_pre = _prefix_kv_fn(cfg)(
                params, jnp.asarray(self.prefix_ids)[None])
        else:
            self.prefix_ids = None
            self.s_pre = 0
            self._kv_pre = jnp.zeros(
                (tcfg.num_hidden_layers, 1, tcfg.num_key_value_heads, 0,
                 2 * tcfg.head_dim), jnp.dtype(tcfg.dtype))
        self.buckets = tuple(sorted(b for b in prefill_buckets
                                    if b + self.s_pre < max_len))
        assert self.buckets, (prefill_buckets, max_len)
        self.prompt_cols = self.s_pre + self.buckets[-1]
        self.ring_cols = max_len - self.prompt_cols
        self.rng = rng if rng is not None else jax.random.key(0)
        self._pad_side = "left"
        self._build_dispatch_fns(decode_chunk)
        self._init_state = jax.jit(partial(
            self._make_state, kv_quant=kv_quant, logprobs=logprobs,
            multi_lora=lora_bank is not None))
        self.hot, self.cold = _split_state(self._init_state())
        self._slot_uid: List[Any] = [None] * n_slots
        self._pending: List[Request] = []
        self._cancel: set = set()
        self._results: Dict[Any, np.ndarray] = {}
        self._logps: Dict[Any, Any] = {}
        self._stale = None        # last host-known (active, finished,
        self._stale_cold = None   # out_len) + the cold dict they came from
        self._stale_skip = frozenset()  # slots newer than the snapshot
        self._round_admitted: List[int] = []
        self._stream_cb = stream_cb
        self._streamed = [0] * n_slots  # tokens delivered per slot
        # scheduler-overhead accounting (reported by bench --mode serve)
        self.stats = {"rounds": 0, "decode_dispatches": 0,
                      "fused_dispatches": 0,
                      "prefill_dispatches": 0, "prefill_rows": 0,
                      "fetch_wait_s": 0.0}

    def _build_dispatch_fns(self, decode_chunk: int) -> None:
        """Bind the engine's three jitted dispatches (module-level
        lru_cached so same-config engines share executables). The paged
        engine overrides this with page-pool variants."""
        cfg, gen = self.cfg, self.gen
        self._prefill_insert = _prefill_insert_fn(cfg, gen, self.s_pre)
        self._decode = _decode_fn(cfg, gen, self.prompt_cols,
                                  self.ring_cols, decode_chunk)
        self._prefill_decode = _prefill_decode_fn(
            cfg, gen, self.s_pre, self.prompt_cols, self.ring_cols,
            decode_chunk)

    def _common_state(self, logprobs: bool, multi_lora: bool):
        """Layout-independent slot state (sampler rows, output buffers,
        flags) — the KV storage itself comes from _make_state."""
        B, T = self.n_slots, self.gen.max_new_tokens
        gen, tcfg = self.gen, self.cfg.text
        return {
            "n_real": jnp.zeros((B,), jnp.int32),  # non-pad tokens held
            "last_tok": jnp.zeros((B,), jnp.int32),
            "presence": jnp.zeros((B, tcfg.vocab_size), bool),
            "out_buf": jnp.full((B, T), gen.pad_token_id, jnp.int32),
            **({"logp_buf": jnp.zeros((B, T), jnp.float32)}
               if logprobs else {}),
            "out_len": jnp.zeros((B,), jnp.int32),
            "cap": jnp.full((B,), T, jnp.int32),
            "active": jnp.zeros((B,), bool),
            "finished": jnp.zeros((B,), bool),
            # per-slot sampling params (cold [B] rows, written at
            # admission) — one compiled program serves any mix
            "samp_greedy": jnp.full((B,), not gen.do_sample),
            "samp_temp": jnp.full((B,), gen.temperature, jnp.float32),
            "samp_top_k": jnp.full((B,), max(gen.top_k, 1), jnp.int32),
            "samp_top_p": jnp.full((B,), gen.top_p, jnp.float32),
            "samp_pen": jnp.full((B,), gen.repetition_penalty,
                                 jnp.float32),
            **({"adapter_id": jnp.zeros((B,), jnp.int32)}
               if multi_lora else {}),
        }

    def _make_state(self, *, kv_quant, logprobs, multi_lora):
        # materialized via ONE jitted executable (single dispatch instead
        # of a dozen eager zeros/full ops over the tunnel)
        B = self.n_slots
        c = qwen3.init_cache(self.cfg.text, B, self.max_len,
                             quant=kv_quant)
        return {
            "cache": c["kv"],
            **({"kv_scale": c["kv_scale"]} if "kv_scale" in c else {}),
            "valid": jnp.zeros((B, self.max_len), jnp.int32),
            "head": jnp.int32(0),                  # global ring tick
            **self._common_state(logprobs, multi_lora),
        }

    def precompile(self, group_sizes=None, with_decode: bool = True):
        """Ahead-of-time compile every (bucket, group-size) FUSED
        prefill+decode variant this engine's steady state dispatches
        (admission groups are rounded to powers of two) plus the
        decode-only executable, so an online or timed run never stalls
        ~20-40 s on a first-occurrence compile. Runs dummy text-only work
        on device, then resets the state — call BEFORE submitting real
        requests. Prefill-ONLY variants (multi-group rounds: mixed
        buckets, or a cold start wider than one group) and omics-segment
        layouts compile lazily on first occurrence."""
        sizes = group_sizes or [1 << i
                                for i in range(self.n_slots.bit_length())
                                if (1 << i) <= self.n_slots]
        for b in self.buckets:
            for k in sizes:
                batch = {"input_ids": jnp.ones((k, b), jnp.int32),
                         "attention_mask": jnp.ones((k, b), jnp.int32)}
                slots = jnp.arange(k, dtype=jnp.int32) % self.n_slots
                caps = jnp.full((k,), 2, jnp.int32)
                samp = self._samp_arrays([Request(uid=None, batch={})
                                          for _ in range(k)])
                self.rng, r = jax.random.split(self.rng)
                self.hot, self.cold = self._prefill_decode(
                    self.params, self.hot, self.cold, batch, slots, caps,
                    samp, r, self._kv_pre, jnp.int32(1))
        if with_decode:
            for stop in (0, 1):  # same executable; proves arg is dynamic
                self.rng, r = jax.random.split(self.rng)
                self.hot, self.cold = self._decode(
                    self.params, self.hot, self.cold, r, jnp.int32(stop))
        self.hot, self.cold = _split_state(self._init_state())
        self._slot_uid = [None] * self.n_slots
        self._cancel = set()
        self._streamed = [0] * self.n_slots
        self._stale = None
        self._stale_cold = None
        self._stale_skip = frozenset()
        self._round_admitted = []

    # ---- scheduler ----------------------------------------------------

    def _bucket_group_cap(self, bucket: int) -> int:
        """Max admission-group size for ``bucket`` (layout hook; the paged
        engine returns 1 for its continuation bucket)."""
        return self.n_slots

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(f"prompt length {n} exceeds max bucket "
                         f"{self.buckets[-1]}")

    def _strip_prefix(self, batch):
        """Remove left padding + the shared prefix from a single-sample
        batch; shift omics segment positions to suffix coordinates."""
        ids = np.asarray(batch["input_ids"])[0]
        mask = np.asarray(batch.get("attention_mask",
                                    np.ones_like(ids)))[0]
        start = int(np.argmax(mask)) if mask.any() else len(ids)
        content = ids[start:]
        if not np.array_equal(content[:self.s_pre], self.prefix_ids):
            raise ValueError(
                "request prompt does not start with the configured "
                "prefix_ids — disable prefix caching for this request mix")
        shift = start + self.s_pre
        out = dict(batch)
        out["input_ids"] = content[None, self.s_pre:]
        out["attention_mask"] = np.ones((1, content.size - self.s_pre),
                                        np.int32)
        for key in ("dna_rna_pos", "protein_pos"):
            if key in batch:
                pos = np.asarray(batch[key])
                shifted = np.where(pos >= 0, pos - shift, pos)
                if (shifted[pos >= 0] < 0).any():
                    raise ValueError("omics segment inside the shared "
                                     "prefix is not supported")
                out[key] = shifted
        return out

    def _eff_batch(self, req: Request):
        return (self._strip_prefix(req.batch) if self.s_pre
                else req.batch)

    def _eff_len(self, req: Request) -> int:
        if self.s_pre:
            mask = np.asarray(req.batch.get(
                "attention_mask",
                np.ones_like(np.asarray(req.batch["input_ids"]))))
            return int(mask.sum()) - self.s_pre
        return np.asarray(req.batch["input_ids"]).shape[1]

    def _refresh_status(self, cold) -> None:
        """ONE host sync for everything the scheduler needs (each transfer
        over a tunneled TPU costs ~10-25 ms — never fetch piecemeal).
        ``cold`` is never donated, so fetching a PRE-dispatch snapshot
        overlaps with whatever chunk is running on device.

        Slots admitted THIS round (after ``cold`` was produced) are
        recorded as skip-slots for the snapshot: their stale rows still
        describe the slot's previous occupant, so streaming or harvesting
        them would hand the new request the old request's tokens."""
        import time as _time
        t0 = _time.perf_counter()
        self._stale = jax.device_get((cold["active"], cold["finished"],
                                      cold["out_len"]))
        self.stats["fetch_wait_s"] += _time.perf_counter() - t0
        self._stale_cold = cold
        self._stale_skip = frozenset(self._round_admitted)

    def _assemble(self, reqs: List[Request], slots: List[int]):
        """Pad + stack k same-bucket requests into device-ready arrays."""
        batches = [self._eff_batch(r) for r in reqs]
        bucket = self._bucket_for(
            np.asarray(batches[0]["input_ids"]).shape[1])
        padded = [_pad_to_bucket(b, bucket, self.gen.pad_token_id,
                                 self._pad_side)
                  for b in batches]
        keys = set().union(*(p.keys() for p in padded))
        jb = {}
        for key in keys:
            fill = {"dna_rna_pos": -1, "protein_pos": -1}.get(key, 1)
            rows = []
            for p in padded:
                if key in p:
                    rows.append(np.asarray(p[key]))
                else:  # mixed omics layouts in one group: neutral segment
                    ref = next(np.asarray(q[key]) for q in padded
                               if key in q)
                    rows.append(np.full_like(ref, fill))
            jb[key] = jnp.asarray(np.concatenate(rows, axis=0))
        # a request's generated span is contiguous in ring ticks, so
        # cap <= ring_cols guarantees it never wraps onto its own history
        caps = [max(1, min(r.max_new_tokens or self.gen.max_new_tokens,
                           self.gen.max_new_tokens, self.ring_cols))
                for r in reqs]
        return (jb, jnp.asarray(slots, jnp.int32),
                jnp.asarray(caps, jnp.int32), self._samp_arrays(reqs))

    def _samp_arrays(self, reqs: List[Request]) -> Dict[str, jnp.ndarray]:
        """Per-request sampling params -> [k] device arrays (unset keys
        inherit the engine GenerationConfig; temperature <= 0 = greedy;
        top_k clamps to the compiled candidate width)."""
        g = self.gen
        rows = {"greedy": [], "temperature": [], "top_k": [], "top_p": [],
                "repetition_penalty": [], "adapter": []}
        for r in reqs:
            s = r.sampling or {}
            temp = float(s.get("temperature", g.temperature))
            greedy = bool(s.get("greedy", not g.do_sample)) or temp <= 0.0
            top_k = int(s.get("top_k", g.top_k))
            if g.top_k:
                top_k = min(max(top_k, 1), g.top_k)
            if self._n_adapters:
                assert 0 <= r.adapter < self._n_adapters, (
                    r.adapter, self._n_adapters)
            rows["greedy"].append(greedy)
            rows["temperature"].append(max(temp, 1e-6))
            rows["top_k"].append(top_k)
            rows["top_p"].append(float(s.get("top_p", g.top_p)))
            rows["repetition_penalty"].append(
                float(s.get("repetition_penalty", g.repetition_penalty)))
            rows["adapter"].append(int(r.adapter))
        return {"greedy": jnp.asarray(rows["greedy"], bool),
                "temperature": jnp.asarray(rows["temperature"],
                                           jnp.float32),
                "top_k": jnp.asarray(rows["top_k"], jnp.int32),
                "top_p": jnp.asarray(rows["top_p"], jnp.float32),
                "repetition_penalty": jnp.asarray(
                    rows["repetition_penalty"], jnp.float32),
                "adapter": jnp.asarray(rows["adapter"], jnp.int32)}

    def _bind_slots(self, reqs: List[Request], slots: List[int]) -> None:
        for r, slot in zip(reqs, slots):
            self._slot_uid[slot] = r.uid
            self._streamed[slot] = 0
        self._round_admitted.extend(slots)

    def _start_group(self, reqs: List[Request], slots: List[int]) -> None:
        """Admit k same-bucket requests in one prefill-only dispatch
        (used for all but the last group of a multi-group round; the last
        group rides the decode dispatch via _start_group_fused)."""
        jb, slots_arr, caps, samp = self._assemble(reqs, slots)
        self.rng, r1 = jax.random.split(self.rng)
        self.hot, self.cold = self._prefill_insert(
            self.params, self.hot, self.cold, jb, slots_arr, caps, samp,
            r1, self._kv_pre)
        self.stats["prefill_dispatches"] += 1
        self.stats["prefill_rows"] += len(reqs)
        self._bind_slots(reqs, slots)

    def _start_group_fused(self, reqs: List[Request], slots: List[int],
                           stop_free: int) -> None:
        """Admit a group AND run the round's decode chunk in ONE dispatch
        — the steady-state round is admit-then-decode, and each dispatch
        over the tunnel costs ~38 ms that does not pipeline."""
        jb, slots_arr, caps, samp = self._assemble(reqs, slots)
        self.rng, r1 = jax.random.split(self.rng)
        self.hot, self.cold = self._prefill_decode(
            self.params, self.hot, self.cold, jb, slots_arr, caps, samp,
            r1, self._kv_pre, jnp.int32(stop_free))
        self.stats["fused_dispatches"] += 1
        self.stats["prefill_rows"] += len(reqs)
        self._bind_slots(reqs, slots)

    def _stream(self, olen, cold_src) -> None:
        """Incremental delivery: hand each advanced request its generated
        prefix (one batched row fetch for all advanced slots)."""
        if self._stream_cb is None:
            return
        idxs = [i for i in range(self.n_slots)
                if self._slot_uid[i] is not None
                and i not in self._stale_skip
                and int(olen[i]) > self._streamed[i]]
        if not idxs:
            return
        rows = np.asarray(cold_src["out_buf"][np.asarray(idxs)])
        for j, i in enumerate(idxs):
            n = int(olen[i])
            self._stream_cb(self._slot_uid[i], rows[j, :n])
            self._streamed[i] = n

    def _collect(self, fin, olen, cold_src) -> List[int]:
        """Harvest finished slots from a (possibly stale) cold snapshot —
        a finished slot's out_buf row is final, so stale is safe. Rows are
        sliced on DEVICE and fetched lazily (materialized at run() end):
        a blocking host fetch per completion round would cost a ~25 ms
        round trip each."""
        idxs = [i for i in range(self.n_slots)
                if fin[i] and self._slot_uid[i] is not None
                and i not in self._stale_skip]
        if not idxs:
            return []
        rows = cold_src["out_buf"][np.asarray(idxs)]  # async device slice
        lrows = (cold_src["logp_buf"][np.asarray(idxs)]
                 if "logp_buf" in cold_src else None)
        if self._stream_cb is not None:
            rows = np.asarray(rows)  # deliver final prefixes eagerly
            for j, i in enumerate(idxs):
                n = int(olen[i])
                if n > self._streamed[i]:
                    self._stream_cb(self._slot_uid[i], rows[j, :n])
                    self._streamed[i] = n
        for j, i in enumerate(idxs):
            self._results[self._slot_uid[i]] = (rows, j, int(olen[i]))
            if lrows is not None:
                self._logps[self._slot_uid[i]] = (lrows, j, int(olen[i]))
            self._slot_uid[i] = None
        self.cold["finished"] = self.cold["finished"].at[
            jnp.asarray(idxs)].set(False)
        return idxs

    def _materialize(self) -> Dict[Any, np.ndarray]:
        out = {}
        for uid, v in self._results.items():
            if isinstance(v, tuple):
                rows, j, n = v
                v = np.asarray(rows)[j, :n]
                self._results[uid] = v
            out[uid] = v
        return out

    def _before_decode_dispatch(self, groups):
        """Hook called once per scheduling round, after admission groups
        are formed but before anything dispatches. May mutate engine state
        (e.g. page allocation) and return a filtered group list."""
        return groups

    def submit(self, req: Request) -> None:
        self._pending.append(req)

    def pop_logprobs(self, uid: Any) -> Optional[np.ndarray]:
        """Chosen-token logprobs for a harvested request (engine built
        with logprobs=True), aligned with its result tokens."""
        v = self._logps.pop(uid, None)
        if v is None:
            return None
        lrows, j, n = v
        return np.asarray(lrows)[j, :n]

    def cancel(self, uid: Any) -> None:
        """Best-effort cancellation (client disconnect, stop-sequence hit):
        a queued request is dropped with an empty result; an in-flight one
        is force-finished at the next scheduling round and its PARTIAL
        output is harvested as the result. A chunk already running on
        device may decode a few more tokens first — callers truncate."""
        for i, r in enumerate(self._pending):
            if r.uid == uid:
                del self._pending[i]
                self._results[uid] = np.zeros((0,), np.int32)
                return
        self._cancel.add(uid)

    def _apply_cancels(self) -> None:
        slots = [i for i in range(self.n_slots)
                 if self._slot_uid[i] in self._cancel]
        if not slots:
            return
        idx = jnp.asarray(slots, jnp.int32)
        self.cold["active"] = self.cold["active"].at[idx].set(False)
        self.cold["finished"] = self.cold["finished"].at[idx].set(True)
        self._cancel -= {self._slot_uid[i] for i in slots}

    def step(self) -> bool:
        """One scheduling round, pipelined: harvest completions and admit
        using the last host-known status (one chunk stale), dispatch the
        next decode chunk, then fetch the pre-dispatch status WHILE that
        chunk runs. Returns False when idle (nothing pending or active)."""
        self.stats["rounds"] += 1
        self._round_admitted = []
        self._apply_cancels()
        if self._stale is None:
            self._refresh_status(self.cold)
        act, fin, olen = self._stale
        self._stream(olen, self._stale_cold)
        self._collect(fin, olen, self._stale_cold)
        free = [i for i in range(self.n_slots)
                if self._slot_uid[i] is None]
        groups = []
        while self._pending and free:
            # group same-bucket pending requests; group size rounded down
            # to a power of two to bound the number of compiled variants
            bucket = self._bucket_for(self._eff_len(self._pending[0]))
            idxs = [i for i, r in enumerate(self._pending)
                    if self._bucket_for(self._eff_len(r)) == bucket
                    ][:len(free)]
            k = 1 << (len(idxs).bit_length() - 1)
            # layout hook: the paged engine caps its continuation-bucket
            # groups at 1 so the rare big-bucket prefill only ever
            # compiles the k=1 variant
            k = min(k, self._bucket_group_cap(bucket))
            # a dispatch costs ~40-70 ms (~hundreds of slot-ticks): a
            # trailing group smaller than the backfill quantum isn't worth
            # one — leave those slots free for next round's single group
            if groups and k < self.admit_batch:
                break
            group = [self._pending[i] for i in idxs[:k]]
            for i in reversed(idxs[:k]):
                del self._pending[i]
            groups.append((group, [free.pop(0) for _ in group]))
        if groups or bool(np.any(act)):
            prev_cold = self.cold
            # layout hook: the paged engine grows page chains for active
            # slots (and preempts on pool exhaustion) BEFORE the round's
            # decode chunk dispatches; no-op for the dense ring
            groups = self._before_decode_dispatch(groups)
            # arm device-side early exit while a backfill group's worth of
            # work is queued; drain at full chunk length otherwise
            stop_free = (min(len(self._pending), self.admit_batch)
                         if self._pending else 0)
            for g, s in groups[:-1]:
                self._start_group(g, s)
            if groups:
                # the round's decode chunk rides the admission dispatch
                self._start_group_fused(*groups[-1], stop_free)
            else:
                self.rng, r = jax.random.split(self.rng)
                self.hot, self.cold = self._decode(
                    self.params, self.hot, self.cold, r,
                    jnp.int32(stop_free))
                self.stats["decode_dispatches"] += 1
            # overlapped fetch: prev_cold's buffers are alive (cold is
            # never donated) and already computed when the chunk starts.
            # NOTE the snapshot predates this round's admissions, so newly
            # admitted slots read inactive next round — the idle-confirm
            # fallback below re-fetches true state before declaring done.
            self._refresh_status(prev_cold)
            return True
        # stale status says idle — confirm against the true current state
        self._refresh_status(self.cold)
        act2, fin2, _ = self._stale
        if bool(np.any(act2)) or any(
                fin2[i] and self._slot_uid[i] is not None
                for i in range(self.n_slots)):
            return True
        return bool(self._pending)

    def run(self, requests: List[Request]) -> Dict[Any, np.ndarray]:
        for r in requests:
            self.submit(r)
        while self.step():
            pass
        self._refresh_status(self.cold)
        act, fin, olen = self._stale
        self._collect(fin, olen, self.cold)
        return self._materialize()
