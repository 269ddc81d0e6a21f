"""Model configuration dataclasses + published-checkpoint presets.

One typed config tree (SURVEY.md §5.6) replacing the reference's three-layer
argparse/JSON/bash config stack. Presets mirror the HF configs of the models
the reference loads (/root/reference/src/model/config.py:49-86):
Qwen3-1.7B/4B/8B, ESM-2 (8M/650M), nucleotide-transformer (ESM-family).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Qwen3Config:
    """Qwen3 dense decoder (HF transformers modeling_qwen3.py is the spec)."""

    vocab_size: int = 151936
    hidden_size: int = 2048
    intermediate_size: int = 6144
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    tie_word_embeddings: bool = True
    max_position_embeddings: int = 40960
    # runtime knobs
    dtype: str = "bfloat16"
    remat: bool = False  # jax.checkpoint each layer
    # remat policy when remat=True: "full" recomputes the whole layer in
    # backward (min memory); "dots" saves matmul outputs and recomputes
    # only the cheap elementwise chain (jax
    # dots_with_no_batch_dims_saveable) — ~1 fwd less recompute per step
    # where memory allows; "attn" saves only flash-attention outputs;
    # "hot" saves the narrow attention-side tensors (post-RoPE q/k, v,
    # attn out, o out) and recomputes only the wide gate/up MLP
    # intermediates — ~0.6x the memory of "dots" at ~30% of "full"'s
    # recompute (see qwen3._remat_policy)
    remat_policy: str = "full"
    # segmented remat: the FIRST remat_skip_layers of the stack run
    # WITHOUT jax.checkpoint (all residuals saved, zero backward
    # recompute) while the rest use remat_policy — a memory<->recompute
    # dial between "none" (OOM at real batches) and a uniform policy.
    # Spends leftover HBM slack on recompute elimination: each skipped
    # 1.7B layer saves ~250 MB at bs8/seq1024 and removes its gate/up
    # recompute (~0.2 of counted LoRA FLOPs across the full stack).
    remat_skip_layers: int = 0
    # context parallelism: shard the sequence over the mesh "seq" axis and
    # run ring attention (parallel.ring_attention) — long-context training
    # beyond the reference's single-device cap (SURVEY.md §5.7). Training
    # (no-cache) path only; requires running under a mesh with a seq axis.
    context_parallel: bool = False
    # end-to-end zigzag contract: the CALLER has already permuted the
    # token stream (embeddings, mask, positions, labels) into zigzag
    # order, so ring attention skips its per-layer permute/unpermute
    # gathers. Set by the trainer's context-parallel fast path — callers
    # passing natural-order streams must leave this False.
    context_parallel_prepermuted: bool = False
    # zigzag layout: balance causal work across the ring (each device
    # holds an early AND a late chunk of the sequence)
    context_parallel_zigzag: bool = False
    # --- mixture of experts (Qwen3-MoE family; 0 = dense) ---
    # Beyond the reference (dense Qwen3 only, SURVEY.md §2.4 EP: absent).
    # num_experts > 0 replaces the dense SwiGLU MLP in every layer with a
    # dropless top-k sparse FFN (ops.moe); intermediate_size is then the
    # PER-EXPERT width (HF moe_intermediate_size).
    num_experts: int = 0
    num_experts_per_tok: int = 8
    norm_topk_prob: bool = True
    # Switch-style load-balance aux-loss coefficient (HF Qwen3-MoE
    # router_aux_loss_coef default) — applied by the trainer
    router_aux_coef: float = 1e-3
    # expert parallelism: run the sparse FFN under shard_map over the
    # mesh "expert" axis (ops.moe.moe_mlp_expert_sharded) — expert
    # weights stay local (never gathered), GShard-style per-device
    # capacity buffer, one psum per layer. Requires a mesh with an
    # expert axis; the train CLI sets this under --mesh-expert N>1.
    expert_parallel: bool = False
    ep_capacity_factor: float = 2.0

    @property
    def q_dim(self) -> int:
        return self.num_attention_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_key_value_heads * self.head_dim


@dataclass(frozen=True)
class EsmConfig:
    """ESM-family bidirectional encoder (covers ESM-2 and the
    nucleotide-transformer checkpoints; HF modeling_esm.py is the spec)."""

    vocab_size: int = 33
    hidden_size: int = 320
    intermediate_size: int = 1280
    num_hidden_layers: int = 6
    num_attention_heads: int = 20
    position_embedding_type: str = "rotary"  # "rotary" | "absolute"
    # NT-v2 checkpoints use a bias-free SwiGLU FFN (InstaDeep's ESM fork);
    # ESM-2 / NT-v1 use biased GELU
    mlp_type: str = "gelu"  # "gelu" | "swiglu"
    mlp_bias: bool = True
    emb_layer_norm_before: bool = False
    token_dropout: bool = True
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    mask_token_id: int = 32
    max_position_embeddings: int = 1026
    dtype: str = "bfloat16"
    remat: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


# ---------------- presets: published checkpoints ----------------

QWEN3_PRESETS = {
    # (hidden, inter, layers, heads, kv_heads, tie)
    "qwen3-0.6b": Qwen3Config(hidden_size=1024, intermediate_size=3072,
                              num_hidden_layers=28, num_attention_heads=16,
                              num_key_value_heads=8, tie_word_embeddings=True),
    "qwen3-1.7b": Qwen3Config(hidden_size=2048, intermediate_size=6144,
                              num_hidden_layers=28, num_attention_heads=16,
                              num_key_value_heads=8, tie_word_embeddings=True),
    "qwen3-4b": Qwen3Config(hidden_size=2560, intermediate_size=9728,
                            num_hidden_layers=36, num_attention_heads=32,
                            num_key_value_heads=8, tie_word_embeddings=True),
    "qwen3-8b": Qwen3Config(hidden_size=4096, intermediate_size=12288,
                            num_hidden_layers=36, num_attention_heads=32,
                            num_key_value_heads=8, tie_word_embeddings=False),
    # Qwen3-30B-A3B (HF Qwen3MoeForCausalLM): 128 experts, top-8, 3B
    # active params — the MoE flagship; intermediate_size here is the
    # per-expert width (HF moe_intermediate_size=768)
    "qwen3-30b-a3b": Qwen3Config(hidden_size=2048, intermediate_size=768,
                                 num_hidden_layers=48,
                                 num_attention_heads=32,
                                 num_key_value_heads=4,
                                 tie_word_embeddings=False,
                                 num_experts=128, num_experts_per_tok=8),
    # synthetic single-chip MoE perf config (NOT a published checkpoint):
    # ~4.2B total / ~1.8B active params, ~8.5 GB bf16 — sized so the MoE
    # decode/train paths are measurable on one 16 GB v5e chip
    "qwen3-moe-mini": Qwen3Config(hidden_size=2048, intermediate_size=768,
                                  num_hidden_layers=24,
                                  num_attention_heads=16,
                                  num_key_value_heads=8,
                                  tie_word_embeddings=True,
                                  num_experts=32, num_experts_per_tok=8),
}

ESM_PRESETS = {
    "esm2-8m": EsmConfig(vocab_size=33, hidden_size=320, intermediate_size=1280,
                         num_hidden_layers=6, num_attention_heads=20),
    "esm2-150m": EsmConfig(vocab_size=33, hidden_size=640,
                           intermediate_size=2560, num_hidden_layers=30,
                           num_attention_heads=20),
    "esm2-650m": EsmConfig(vocab_size=33, hidden_size=1280,
                           intermediate_size=5120, num_hidden_layers=33,
                           num_attention_heads=20),
    # nucleotide-transformer-v2: ESM-family, 6-mer vocab (4107 tokens),
    # rotary + bias-free SwiGLU FFN
    "nt-500m": EsmConfig(vocab_size=4107, hidden_size=1280,
                         intermediate_size=5120, num_hidden_layers=24,
                         num_attention_heads=20, mask_token_id=2,
                         token_dropout=True, mlp_type="swiglu",
                         mlp_bias=False,
                         max_position_embeddings=2050),
}


def tiny_qwen3(**kw) -> Qwen3Config:
    """Small config for tests/smoke runs."""
    base = dict(vocab_size=512, hidden_size=64, intermediate_size=128,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, head_dim=16, dtype="float32")
    base.update(kw)
    return Qwen3Config(**base)


def tiny_moe(**kw) -> Qwen3Config:
    """Small MoE config for tests/smoke runs (4 experts, top-2)."""
    base = dict(num_experts=4, num_experts_per_tok=2)
    base.update(kw)
    return tiny_qwen3(**base)


def tiny_esm(**kw) -> EsmConfig:
    base = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=4, dtype="float32")
    base.update(kw)
    return EsmConfig(**base)
