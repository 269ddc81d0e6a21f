"""Mesh construction + GSPMD sharding rules — the TPU-native replacement for
the reference's NCCL + DeepSpeed ZeRO stack (SURVEY.md §2.3, §5.8).

The reference's entire distributed story is: one process per GPU, DeepSpeed
ZeRO-0/1/2/3 configs (/root/reference/src/configs/ds_z*.json), NCCL
collectives hidden inside the engine (/root/reference/src/train.py:606-614).
Here the same capabilities are sharding annotations on ONE jitted program:

  - mesh axes ("data", "fsdp", "tensor"):
      * batch is sharded over data x fsdp  (DP)
      * params/optimizer state sharded over fsdp  (== ZeRO-3; ZeRO-1/2 are
        the same mechanism applied to a subset of the state; there is no
        reason to prefer them under GSPMD)
      * tensor axis gives Megatron-style TP for Qwen3 (beyond the
        reference, which has no TP — SURVEY.md §2.4)
  - all collectives are inserted by XLA and ride ICI.

Multi-host: ``jax.distributed.initialize()`` + per-host data sharding via
``host_shard_range``.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
TENSOR_AXIS = "tensor"
SEQ_AXIS = "seq"  # context parallelism (ring attention) — beyond reference
EXPERT_AXIS = "expert"  # MoE expert parallelism — beyond reference


def make_mesh(data: int = 1, fsdp: int = -1, tensor: int = 1,
              seq: int = 1, expert: int = 1, devices=None,
              dcn_data: int = 1) -> Mesh:
    """Build a 5-axis mesh. fsdp=-1 means "all remaining devices".

    dcn_data > 1 is the multi-slice recipe (scaling-book layout): pure
    data parallelism ACROSS slices rides the slow DCN links while
    fsdp/tensor/seq/expert stay inside a slice on ICI — the resulting
    data axis has size ``dcn_data * data`` (slice-major), so the only
    DCN-crossing collective is the gradient reduction. Uses
    ``mesh_utils.create_hybrid_device_mesh`` for the slice-aware device
    order; on hosts without slice topology info (CPU meshes, tests) it
    falls back to the process-major order of ``jax.devices()``, which is
    already slice-major on multi-host TPU pods.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if fsdp == -1:
        assert n % (dcn_data * data * tensor * seq * expert) == 0, (
            n, dcn_data, data, tensor, seq, expert)
        fsdp = n // (dcn_data * data * tensor * seq * expert)
    assert dcn_data * data * fsdp * tensor * seq * expert == n, (
        dcn_data, data, fsdp, tensor, seq, expert, n)
    axes = (DATA_AXIS, FSDP_AXIS, TENSOR_AXIS, SEQ_AXIS, EXPERT_AXIS)
    if dcn_data > 1:
        try:
            from jax.experimental import mesh_utils
            arr = mesh_utils.create_hybrid_device_mesh(
                (data, fsdp, tensor, seq, expert),
                (dcn_data, 1, 1, 1, 1), devices=devices)
            return Mesh(arr, axes)
        except Exception:
            pass  # no slice topology info — fall through
        arr = np.asarray(devices).reshape(
            dcn_data * data, fsdp, tensor, seq, expert)
        return Mesh(arr, axes)
    arr = np.asarray(devices).reshape(data, fsdp, tensor, seq, expert)
    return Mesh(arr, axes)


# ---------------------------------------------------------------------------
# Parameter sharding rules (matched on pytree key paths)
# ---------------------------------------------------------------------------

# (regex over "/"-joined path, PartitionSpec). First match wins. All specs
# written for the stacked-[L, ...] layout of models.qwen3 / models.esm.
_PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    # --- Qwen3 decoder ---
    (r"text/embed$", P(TENSOR_AXIS, FSDP_AXIS)),
    (r"text/lm_head$", P(FSDP_AXIS, TENSOR_AXIS)),
    (r"text/layers/(q_proj|k_proj|v_proj)$", P(None, FSDP_AXIS, TENSOR_AXIS)),
    (r"text/layers/o_proj$", P(None, TENSOR_AXIS, FSDP_AXIS)),
    (r"text/layers/(gate_proj|up_proj)$", P(None, FSDP_AXIS, TENSOR_AXIS)),
    (r"text/layers/down_proj$", P(None, TENSOR_AXIS, FSDP_AXIS)),
    # QLoRA int8 base (quantize_for_training): {w_q, scale} dicts keep
    # the base-weight layout; scale is per-out-column [L, N]
    (r"text/layers/(q_proj|k_proj|v_proj|gate_proj|up_proj)/w_q$",
     P(None, FSDP_AXIS, TENSOR_AXIS)),
    (r"text/layers/(q_proj|k_proj|v_proj|gate_proj|up_proj)/scale$",
     P(None, TENSOR_AXIS)),
    (r"text/layers/(o_proj|down_proj)/w_q$",
     P(None, TENSOR_AXIS, FSDP_AXIS)),
    (r"text/layers/(o_proj|down_proj)/scale$", P(None, FSDP_AXIS)),
    (r"text/layers/expert_(gate|up)/w_q$",
     P(None, EXPERT_AXIS, FSDP_AXIS, TENSOR_AXIS)),
    (r"text/layers/expert_(gate|up)/scale$",
     P(None, EXPERT_AXIS, TENSOR_AXIS)),
    (r"text/layers/expert_down/w_q$",
     P(None, EXPERT_AXIS, TENSOR_AXIS, FSDP_AXIS)),
    (r"text/layers/expert_down/scale$", P(None, EXPERT_AXIS, FSDP_AXIS)),
    # MoE: experts [L, E, H, I] shard over the expert axis (EP); the
    # per-expert matmul dims additionally shard over fsdp/tensor
    (r"text/layers/router$", P()),
    (r"text/layers/expert_(gate|up|gateup)$",
     P(None, EXPERT_AXIS, FSDP_AXIS, TENSOR_AXIS)),
    (r"text/layers/expert_down$",
     P(None, EXPERT_AXIS, TENSOR_AXIS, FSDP_AXIS)),
    (r"text/layers/(input_norm|post_attn_norm|q_norm|k_norm)$", P()),
    (r"text/final_norm$", P()),
    # --- ESM encoders (frozen, but still sharded to save HBM) ---
    # embedding tables are small and have awkward vocab sizes (NT: 4107);
    # replicate them
    (r"(dna_rna|protein)/embed$", P()),
    (r"(dna_rna|protein)/pos_embed$", P(None, FSDP_AXIS)),
    (r"(dna_rna|protein)/layers/(q|k|v)$", P(None, FSDP_AXIS, TENSOR_AXIS)),
    (r"(dna_rna|protein)/layers/attn_out$", P(None, TENSOR_AXIS, FSDP_AXIS)),
    (r"(dna_rna|protein)/layers/ffn_in$", P(None, FSDP_AXIS, TENSOR_AXIS)),
    (r"(dna_rna|protein)/layers/ffn_out$", P(None, TENSOR_AXIS, FSDP_AXIS)),
    (r"(dna_rna|protein)/", P()),  # biases, layernorms
    # --- projectors (tiny) ---
    (r"(dna_rna|protein)_projector/", P()),
    # --- LoRA adapters: factor A input-sharded, B output-sharded;
    #     expert-stacked adapters [L, E, ...] ride the expert axis like
    #     their base weights ---
    (r"lora/.*expert_[a-z]+/(a)$", P(None, EXPERT_AXIS, FSDP_AXIS, None)),
    (r"lora/.*expert_[a-z]+/(b)$", P(None, EXPERT_AXIS, None, TENSOR_AXIS)),
    (r"lora/.*/(a)$", P(None, FSDP_AXIS, None)),
    (r"lora/.*/(b)$", P(None, None, TENSOR_AXIS)),
)

# Standalone text model (no "text/" prefix) reuses the same rules.
_BARE_RULES = tuple(
    (pat.replace("text/", ""), spec) for pat, spec in _PARAM_RULES
    if pat.startswith(r"text/")
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_path(path_str: str, rules=_PARAM_RULES) -> P:
    for pat, spec in rules:
        if re.search(pat, path_str):
            return spec
    return P()


def param_specs(params: Any, *, bare_text: bool = False) -> Any:
    """PartitionSpec pytree matching a fusion (or bare-qwen3) param tree."""
    rules = _BARE_RULES if bare_text else _PARAM_RULES
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for_path(_path_str(path), rules), params)


# [B, S] batch arrays whose dim 1 is the text sequence — these shard over
# the seq axis under context parallelism; segment-token arrays ([B, G, K])
# and per-sample scalars do not.
_SEQ_DIM_KEYS = ("input_ids", "attention_mask", "labels")


def batch_specs(batch: Dict[str, Any],
                seq_shard: bool = False) -> Dict[str, P]:
    """Shard every batch array along the combined data axes (and the text
    sequence dim over ``seq`` when context parallelism is on)."""
    def spec(key_path, _leaf):
        name = _path_str(key_path)
        if seq_shard and any(name.endswith(k) for k in _SEQ_DIM_KEYS):
            return P((DATA_AXIS, FSDP_AXIS), SEQ_AXIS)
        return P((DATA_AXIS, FSDP_AXIS))
    return jax.tree_util.tree_map_with_path(spec, batch)


def shard_params(params: Any, mesh: Mesh, *, bare_text: bool = False) -> Any:
    specs = param_specs(params, bare_text=bare_text)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def shard_batch(batch: Any, mesh: Mesh, seq_shard: bool = False) -> Any:
    seq_shard = seq_shard and mesh.shape.get(SEQ_AXIS, 1) > 1
    specs = batch_specs(batch, seq_shard=seq_shard)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), batch, specs)


# ---------------------------------------------------------------------------
# Multi-host helpers
# ---------------------------------------------------------------------------


def initialize_distributed(**kw) -> None:
    """Multi-host rendezvous — replaces dist.init_process_group + deepspeed
    init (/root/reference/src/train.py:606-614). No-op if single-process."""
    if jax.process_count() > 1 or kw:
        jax.distributed.initialize(**kw)


def host_shard_range(n: int, process_index: Optional[int] = None,
                     process_count: Optional[int] = None) -> Tuple[int, int]:
    """[start, stop) slice of a dataset owned by this host (per-host sharded
    input pipeline; the reference leaned on torch DistributedSampler)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = n // pc
    start = pi * per
    stop = n if pi == pc - 1 else start + per
    return start, stop


def make_global_batch(batch: Any, mesh: Mesh,
                      seq_shard: bool = False) -> Any:
    """Assemble a GLOBAL data-sharded batch from this host's LOCAL rows.

    Multi-host: every host feeds its own ``global_batch/process_count``
    rows (read from its host_shard_range slice of the dataset) and
    ``jax.make_array_from_process_local_data`` stitches them into one
    global jax.Array sharded over (data, fsdp) — the GSPMD equivalent of
    the reference's DistributedSampler + per-rank DataLoader (SURVEY.md
    §5.8). Single-process this is exactly shard_batch.
    """
    seq_shard = seq_shard and mesh.shape.get(SEQ_AXIS, 1) > 1
    specs = batch_specs(batch, seq_shard=seq_shard)
    return jax.tree.map(
        lambda x, s: jax.make_array_from_process_local_data(
            NamedSharding(mesh, s), np.asarray(x)), batch, specs)
