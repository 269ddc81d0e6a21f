"""KV-cache decode engine: prefill from injected embeddings + jitted
while-loop decode with sampling.

The reference path (/root/reference/src/model/omics_one.py:187-233 +
src/inference_lora.py:284-321) embeds the prompt, injects encoder outputs,
and delegates to HF ``generate(inputs_embeds=..., max_new_tokens=3072)``
with KV cache DISABLED under DDP (omics_one.py:158-161). Here the cache is
first-class and static-shape: prompts are left-padded to a fixed length,
the cache is [L, B, S_prompt + max_new, Nkv, Dh], and decode is a
``lax.while_loop`` with early exit when every row has emitted EOS — one
compiled program per (B, S_prompt, max_new) bucket.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models import fusion, qwen3
from ..models.fusion import FusionConfig
from .sampling import sample_tokens


@dataclass(frozen=True)
class GenerationConfig:
    """Defaults mirror the reference launch scripts
    (scripts/infer/inference_nt_lora.sh:25-36, omics_one.py:196-199)."""

    max_new_tokens: int = 3072
    do_sample: bool = True
    temperature: float = 0.8
    top_p: float = 0.95
    top_k: int = 20
    repetition_penalty: float = 1.1
    eos_token_id: int = 0
    pad_token_id: int = 0


@partial(jax.jit, static_argnames=("cfg",))
def _build_embeds_jit(params, cfg, batch):
    # eager dispatch over the tunneled TPU costs ~10ms/op; the encoder +
    # injection graph is hundreds of ops — must be jitted
    return fusion.build_inputs_embeds(params, cfg, batch)


def generate(
    params: Dict[str, Any],
    cfg: FusionConfig,
    batch: Dict[str, jnp.ndarray],
    gen: GenerationConfig,
    rng: jax.Array,
    lora_alpha: Optional[float] = None,
    kv_quant: Optional[str] = None,
) -> jnp.ndarray:
    """Returns new tokens only, [B, max_new_tokens], rows padded with
    pad_token_id after EOS (matching HF generate-on-embeds semantics,
    omics_one.py:220-233)."""
    embed_batch = {k: batch[k] for k in
                   ("input_ids", "dna_rna_tokens", "dna_rna_pos",
                    "protein_tokens", "protein_pos") if k in batch}
    lora = params.get("lora")
    model_params = params["text"]
    if lora is not None:
        # fold adapters into the base weights (PEFT merge_and_unload
        # equivalent). NOTE: callers doing repeated batched inference should
        # merge once up front (the CLI does); this per-call path is a
        # convenience for one-off use. Quantized bases can't be merged.
        assert "q_proj" in model_params["layers"] and not isinstance(
            model_params["layers"]["q_proj"], dict), (
            "merge adapters before quantize_for_decode")
        from ..models.lora import LoraConfig, merge_lora
        r = lora["layers"]["q_proj"]["a"].shape[-1]
        alpha = float(lora_alpha) if lora_alpha is not None else 64.0
        model_params = merge_lora(params["text"], lora,
                                  LoraConfig(r=r, alpha=alpha))
        params = {**params, "text": model_params, "lora": None}
    embeds = _build_embeds_jit(params, cfg, embed_batch)
    return _generate_from_embeds(
        model_params, cfg.text, embeds, batch["attention_mask"], gen, rng,
        kv_quant=kv_quant)


@partial(jax.jit, static_argnames=("cfg", "gen", "kv_quant"))
def _generate_from_embeds(
    text_params: Dict[str, Any],
    cfg,  # Qwen3Config
    embeds: jnp.ndarray,          # [B, S, H] (left-padded prompt)
    attention_mask: jnp.ndarray,  # [B, S]
    gen: GenerationConfig,
    rng: jax.Array,
    kv_quant: Optional[str] = None,
) -> jnp.ndarray:
    B, S, H = embeds.shape
    T = gen.max_new_tokens
    total = S + T

    # kv_quant="int8" halves the cache bytes — the enabler for the
    # reference operating point (k-tokens 1024, batch 32, gen up to 3072:
    # a bf16 [L,32,Nkv,2308,2Dh] pool alone is ~8.5 GB at 1.7B)
    cache = qwen3.init_cache(cfg, B, total, quant=kv_quant)
    full_mask = jnp.zeros((B, total), jnp.int32).at[:, :S].set(attention_mask)

    # positions: left-pad-aware (#real tokens before me)
    n_real = jnp.sum(attention_mask, axis=1)  # [B]
    positions = jnp.maximum(
        jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) - 1, 0)

    hidden, cache = qwen3.forward_hidden(
        text_params, cfg, inputs_embeds=embeds, attention_mask=full_mask,
        positions=positions, cache=cache, cache_index=0)
    # last real token is at index S-1 (left padding)
    last_hidden = hidden[:, -1]
    logits0 = qwen3.logits_from_hidden(text_params, cfg, last_hidden)

    presence = jnp.zeros((B, cfg.vocab_size), bool)
    rng, step_rng = jax.random.split(rng)
    tok0 = sample_tokens(
        logits0, step_rng, do_sample=gen.do_sample,
        temperature=gen.temperature, top_k=gen.top_k, top_p=gen.top_p,
        repetition_penalty=gen.repetition_penalty, presence=presence)

    tokens = jnp.full((B, T), gen.pad_token_id, jnp.int32)
    tokens = tokens.at[:, 0].set(tok0)
    presence = presence.at[jnp.arange(B), tok0].set(True)
    done = tok0 == gen.eos_token_id

    def cond(state):
        i, _, _, _, done, _ = state
        return jnp.logical_and(i < T, ~jnp.all(done))

    col = jnp.arange(total)[None, :]

    def body(state):
        i, tokens, cache, presence, done, rng = state
        j = i - 1  # index of the token being fed; it sits at cache slot S+j
        cur = tokens[:, j]
        emb = qwen3.embed_tokens(text_params, cur[:, None])
        mask = jnp.where(col < S, full_mask, (col <= S + j).astype(jnp.int32))
        pos = (n_real + j)[:, None]
        hidden, new_cache = qwen3.forward_hidden(
            text_params, cfg, inputs_embeds=emb, attention_mask=mask,
            positions=pos, cache=cache, cache_index=S + j)
        logits = qwen3.logits_from_hidden(text_params, cfg, hidden[:, 0])
        rng, step_rng = jax.random.split(rng)
        nxt = sample_tokens(
            logits, step_rng, do_sample=gen.do_sample,
            temperature=gen.temperature, top_k=gen.top_k, top_p=gen.top_p,
            repetition_penalty=gen.repetition_penalty, presence=presence)
        nxt = jnp.where(done, gen.pad_token_id, nxt)
        tokens = tokens.at[:, i].set(nxt)
        presence = presence.at[jnp.arange(B), nxt].set(True)
        done = jnp.logical_or(done, nxt == gen.eos_token_id)
        return (i + 1, tokens, new_cache, presence, done, rng)

    state = (jnp.int32(1), tokens, cache, presence, done, rng)
    _, tokens, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    return tokens
