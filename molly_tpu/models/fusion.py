"""Tri-modal fusion model: Qwen3 decoder + frozen ESM-family encoders with
linear projectors — the TPU-native equivalent of the reference ``OmicsOne``
(/root/reference/src/model/omics_one.py).

Semantics mirrored:
  - one encoder call per modality over ALL segments in the batch
    (omics_one.py:49-136 batches segments the same way)
  - encoder attention mask is ``tokens != 1`` (omics_one.py:70)
  - projected last-hidden-states overwrite the k placeholder slots at
    start+1 .. start+1+k (omics_one.py:91-97)
  - loss is next-token CE over label != -100 (delegated to HF in the
    reference, computed here explicitly / via the fused LCE kernel)

TPU-first differences (SURVEY.md §7 design stance):
  - no in-place mutation: injection is a static-shape scatter with
    ``mode="drop"`` — inactive segments carry start=-1 which maps out of
    bounds and is dropped by XLA, so one compiled graph serves any segment
    layout.
  - segments are fixed-capacity [B, G, K] blocks per modality; dummy
    segments run through the encoder (static shapes) and their outputs are
    dropped. Their attention mask is forced non-empty to avoid NaNs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..data.omics_dataset import LABEL_IGNORE, NUM_DOMAIN_TASKS, UNKNOWN_TASK_ID
from . import esm, qwen3
from .configs import EsmConfig, Qwen3Config

Params = Dict[str, Any]


@dataclass(frozen=True)
class FusionConfig:
    text: Qwen3Config
    dna_rna: EsmConfig
    protein: EsmConfig
    dna_rna_k_tokens: int = 128
    protein_k_tokens: int = 128


def init_params(cfg: FusionConfig, key: jax.Array) -> Params:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    dt = jnp.dtype(cfg.text.dtype)

    def projector(k, d_in, d_out):
        # nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in)) for both
        bound = d_in ** -0.5
        return {
            "kernel": jax.random.uniform(k, (d_in, d_out), jnp.float32,
                                         -bound, bound).astype(dt),
            "bias": jnp.zeros((d_out,), dt),
        }

    return {
        "text": qwen3.init_params(cfg.text, k1),
        "dna_rna": esm.init_params(cfg.dna_rna, k2),
        "protein": esm.init_params(cfg.protein, k3),
        "dna_rna_projector": projector(k4, cfg.dna_rna.hidden_size,
                                       cfg.text.hidden_size),
        "protein_projector": projector(k5, cfg.protein.hidden_size,
                                       cfg.text.hidden_size),
    }


def encode_and_project(params: Params, enc_cfg: EsmConfig, proj_name: str,
                       enc_name: str, tokens: jnp.ndarray) -> jnp.ndarray:
    """tokens [B, G, K] -> projected embeddings [B, G, K, H_text]."""
    B, G, K = tokens.shape
    flat = tokens.reshape(B * G, K)
    mask = (flat != 1).astype(jnp.int32)
    # dummy all-pad segments would have an empty mask -> NaN softmax; force
    # position 0 attended (real segments start with a non-pad CLS anyway)
    mask = mask.at[:, 0].set(1)
    h = esm.forward_hidden(params[enc_name], enc_cfg, flat, mask)
    proj = params[proj_name]
    out = h @ proj["kernel"] + proj["bias"]
    return out.reshape(B, G, K, -1)


def inject(hidden: jnp.ndarray, proj_emb: jnp.ndarray,
           start_pos: jnp.ndarray) -> jnp.ndarray:
    """Overwrite placeholder slots with encoder embeddings.

    hidden:    [B, S, H]
    proj_emb:  [B, G, K, H]
    start_pos: [B, G] index of the <|*_start|> token; -1 = inactive slot.

    Slot g of sample b writes rows start+1 .. start+K. Inactive slots map to
    index S (out of bounds) and are dropped by the scatter.
    """
    B, S, H = hidden.shape
    K = proj_emb.shape[2]
    offsets = jnp.arange(K)[None, None, :]  # [1, 1, K]
    rows = jnp.where(start_pos[..., None] >= 0,
                     start_pos[..., None] + 1 + offsets, S)  # [B, G, K]
    batch_idx = jnp.broadcast_to(jnp.arange(B)[:, None, None], rows.shape)
    return hidden.at[batch_idx, rows].set(
        proj_emb.astype(hidden.dtype), mode="drop")


def build_inputs_embeds(params: Params, cfg: FusionConfig,
                        batch: Dict[str, jnp.ndarray], *,
                        hidden_spec=None) -> jnp.ndarray:
    """Token embeddings with omics segments injected — the prompt-side half
    of OmicsOne.forward (omics_one.py:163-173).

    hidden_spec: optional PartitionSpec pinned on the embedding BEFORE
    injection. Under context parallelism the caller passes a seq-REPLICATED
    spec: the inject scatter writes rows anywhere in S, which XLA's SPMD
    partitioner can only realize on a seq-sharded operand by involuntary
    full rematerialization (replicate + re-partition, a silent perf bug on
    a real slice). Gathering the seq axis around injection turns that into
    one explicit all-gather + one free re-slice.
    """
    text_params = params["text"]
    if hidden_spec is not None:
        # Gather the embed table FIRST (FSDP all-gathers every weight at
        # use anyway): a gather from a sharded table into a batch-sharded
        # output is a transition XLA-SPMD realizes by replicating the
        # gather operand with an involuntary-full-remat warning.
        from jax.sharding import PartitionSpec
        text_params = {**text_params,
                       "embed": jax.lax.with_sharding_constraint(
                           text_params["embed"], PartitionSpec(None, None))}
    hidden = qwen3.embed_tokens(text_params, batch["input_ids"])
    if hidden_spec is not None:
        hidden = jax.lax.with_sharding_constraint(hidden, hidden_spec)
    if "dna_rna_tokens" in batch:
        demb = encode_and_project(params, cfg.dna_rna, "dna_rna_projector",
                                  "dna_rna", batch["dna_rna_tokens"])
        hidden = inject(hidden, demb, batch["dna_rna_pos"])
    if "protein_tokens" in batch:
        pemb = encode_and_project(params, cfg.protein, "protein_projector",
                                  "protein", batch["protein_tokens"])
        hidden = inject(hidden, pemb, batch["protein_pos"])
    if hidden_spec is not None:
        # Pin the OUTPUT too: wsc's transpose constrains the cotangent, so
        # the inject-backward gather sees a batch-sharded d_hidden instead
        # of whatever layout the decoder backward produced (under expert
        # parallelism: token-sharded over the expert axis -> involuntary
        # full remat on the gather).
        hidden = jax.lax.with_sharding_constraint(hidden, hidden_spec)
    return hidden


def forward_logits(params: Params, cfg: FusionConfig,
                   batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    embeds = build_inputs_embeds(params, cfg, batch)
    hidden, _ = qwen3.forward_hidden(
        params["text"], cfg.text, inputs_embeds=embeds,
        attention_mask=batch.get("attention_mask"))
    return qwen3.logits_from_hidden(params["text"], cfg.text, hidden)


def shift_for_next_token(logits: jnp.ndarray, labels: jnp.ndarray):
    """HF CausalLM convention: logits[:, :-1] predict labels[:, 1:]."""
    return logits[:, :-1], labels[:, 1:]


def cross_entropy_loss(
    logits: jnp.ndarray,  # [B, S, V]
    labels: jnp.ndarray,  # [B, S] with LABEL_IGNORE masking
    *,
    task_label: Optional[jnp.ndarray] = None,  # [B]
    z_loss: float = 0.0,
    pre_shifted: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Mean next-token CE over supervised positions (+ optional per-task
    domain losses, replacing the reference's full-logit recompute at
    /root/reference/src/trainer/domain_loss.py:1120-1131).

    pre_shifted=True: labels[t] already targets position t (zigzag
    context-parallel streams shift BEFORE permuting); skip the shift."""
    if not pre_shifted:
        logits, labels = shift_for_next_token(logits, labels)
    valid = labels != LABEL_IGNORE
    labels_safe = jnp.where(valid, labels, 0)

    lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.take_along_axis(
        logits.astype(jnp.float32), labels_safe[..., None], axis=-1
    )[..., 0]
    nll = (lse - tgt) * valid  # [B, S-1]

    tokens_per_sample = jnp.sum(valid, axis=-1)
    total_tokens = jnp.maximum(jnp.sum(tokens_per_sample), 1)
    loss = jnp.sum(nll) / total_tokens
    if z_loss:
        loss = loss + z_loss * jnp.sum(jnp.square(lse) * valid) / total_tokens

    metrics: Dict[str, jnp.ndarray] = {"loss": loss,
                                       "tokens": total_tokens}
    if task_label is not None:
        # per-sample mean loss -> per-task mean via one-hot matmul (MXU)
        per_sample = jnp.sum(nll, axis=-1) / jnp.maximum(tokens_per_sample, 1)
        tid = jnp.where(task_label == UNKNOWN_TASK_ID, NUM_DOMAIN_TASKS,
                        task_label)
        onehot = jax.nn.one_hot(tid, NUM_DOMAIN_TASKS + 1,
                                dtype=jnp.float32)
        task_sums = onehot.T @ per_sample
        task_counts = jnp.sum(onehot, axis=0)
        metrics["domain_loss_sum"] = task_sums
        metrics["domain_loss_count"] = task_counts
    return loss, metrics


def lm_head_weight(params: Params, cfg: Qwen3Config) -> jnp.ndarray:
    text = params["text"] if "text" in params else params
    return text["embed"].T if cfg.tie_word_embeddings else text["lm_head"]


def loss_from_hidden(
    params: Params, cfg: FusionConfig, hidden: jnp.ndarray,
    batch: Dict[str, jnp.ndarray], *, z_loss: float = 0.0,
    fused_lce: bool = True, chunk_size: int = 256,
    pre_shifted: bool = False, lce_need_dw: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """LM loss + metrics from final hidden states. fused_lce avoids the
    [B, S, V] logit tensor (ops.lce); the naive path materializes it.
    pre_shifted: see causal_lm_loss (zigzag context-parallel streams).
    lce_need_dw=False skips the dead lm-head weight gradient when the
    text tower is frozen (LoRA/QLoRA) — see ops.lce."""
    labels = batch["labels"]
    task_label = batch.get("task_label")
    if not fused_lce:
        logits = qwen3.logits_from_hidden(params["text"], cfg.text, hidden)
        return cross_entropy_loss(logits, labels, task_label=task_label,
                                  z_loss=z_loss, pre_shifted=pre_shifted)
    from ..ops.lce import causal_lm_loss
    w = lm_head_weight(params, cfg.text)
    loss, per_nll, per_tok = causal_lm_loss(
        hidden, w, labels, chunk_size=chunk_size, z_loss=z_loss,
        pre_shifted=pre_shifted, need_dw=lce_need_dw)
    metrics: Dict[str, jnp.ndarray] = {
        "loss": loss, "tokens": jnp.sum(per_tok)}
    if task_label is not None:
        per_sample = per_nll / jnp.maximum(per_tok, 1)
        tid = jnp.where(task_label == UNKNOWN_TASK_ID, NUM_DOMAIN_TASKS,
                        task_label)
        onehot = jax.nn.one_hot(tid, NUM_DOMAIN_TASKS + 1, dtype=jnp.float32)
        metrics["domain_loss_sum"] = onehot.T @ per_sample
        metrics["domain_loss_count"] = jnp.sum(onehot, axis=0)
    return loss, metrics


def loss_fn(params: Params, cfg: FusionConfig,
            batch: Dict[str, jnp.ndarray], *, z_loss: float = 0.0,
            fused_lce: bool = True):
    embeds = build_inputs_embeds(params, cfg, batch)
    hidden, _ = qwen3.forward_hidden(
        params["text"], cfg.text, inputs_embeds=embeds,
        attention_mask=batch.get("attention_mask"))
    return loss_from_hidden(params, cfg, hidden, batch, z_loss=z_loss,
                            fused_lce=fused_lce)
