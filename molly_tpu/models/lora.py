"""LoRA adapters as a factored-param pytree (PEFT-equivalent).

Mirrors the reference recipe (/root/reference/src/utils/tools.py:345-396):
targets every Linear in the Qwen3 decoder except lm_head (q/k/v/o, gate/up/
down), alpha=64, dropout 0.05, gaussian-init A, zero-init B, frozen
encoders, trainable projectors.

Representation: ``lora["layers"][target] = {"a": [L, d_in, r],
"b": [L, r, d_out]}`` — stacked on the layer axis like the base params, so
the same ``lax.scan`` carries them. Effective weight is
``W + (alpha/r) * a @ b``; applied as the low-rank bypass
``y = x@W + scale * (drop(x) @ a) @ b`` (never materializes W + ΔW).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .configs import Qwen3Config

LORA_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj",
                "gate_proj", "up_proj", "down_proj")
# MoE expert stacks: adapters are stacked per expert ([L, E, d_in, r] /
# [L, E, r, d_out]) and applied as grouped low-rank bypasses inside the
# sparse dispatch (ops.moe) — the PEFT-on-HF-Qwen3Moe equivalent, where
# every expert's gate/up/down is an nn.Linear the reference recipe's
# all-Linear discovery would adapt (tools.py:352-377).
EXPERT_TARGETS = ("expert_gate", "expert_up", "expert_down")


@dataclass(frozen=True)
class LoraConfig:
    r: int = 64
    alpha: float = 64.0
    dropout: float = 0.05
    targets: tuple = LORA_TARGETS

    @property
    def scale(self) -> float:
        return self.alpha / self.r


def target_dims(cfg: Qwen3Config) -> Dict[str, tuple]:
    H, I = cfg.hidden_size, cfg.intermediate_size
    return {
        "q_proj": (H, cfg.q_dim),
        "k_proj": (H, cfg.kv_dim),
        "v_proj": (H, cfg.kv_dim),
        "o_proj": (cfg.q_dim, H),
        "gate_proj": (H, I),
        "up_proj": (H, I),
        "down_proj": (I, H),
        "expert_gate": (H, I),
        "expert_up": (H, I),
        "expert_down": (I, H),
    }


def init_lora(cfg: Qwen3Config, lora_cfg: LoraConfig,
              key: jax.Array, dtype=jnp.float32) -> Dict[str, Any]:
    """Gaussian A (std 1/r, PEFT's init_lora_weights='gaussian'), zero B."""
    dims = target_dims(cfg)
    targets = lora_cfg.targets
    if cfg.num_experts:
        # MoE layers have no dense gate/up/down Linears; the MLP targets
        # map onto the per-expert stacks instead (all-Linear discovery)
        targets = tuple(t for t in targets
                        if t in ("q_proj", "k_proj", "v_proj", "o_proj"))
        targets += tuple(t for t in EXPERT_TARGETS
                         if t in lora_cfg.targets
                         or t.replace("expert_", "") + "_proj"
                         in lora_cfg.targets)
    L, r = cfg.num_hidden_layers, lora_cfg.r
    keys = jax.random.split(key, len(targets))
    layers = {}
    for k, name in zip(keys, targets):
        d_in, d_out = dims[name]
        lead = ((L, cfg.num_experts) if name in EXPERT_TARGETS
                else (L,))
        layers[name] = {
            "a": (jax.random.normal(k, (*lead, d_in, r), jnp.float32)
                  / r).astype(dtype),
            "b": jnp.zeros((*lead, r, d_out), dtype),
        }
    return {"layers": layers}


def apply_lora(x: jnp.ndarray, base_out: jnp.ndarray,
               lora_layer: Optional[Dict[str, jnp.ndarray]],
               scale: float,
               dropout_rate: float = 0.0,
               dropout_rng: Optional[jax.Array] = None,
               lora_slots: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """base_out = x @ W already computed; adds the low-rank bypass.

    lora_slots: [B] int32 per-ROW adapter index into a stacked bank
    (multi-LoRA serving — ``lora_layer`` then holds ``a [N, d, r]``,
    ``b [N, r, o]``; see :func:`stack_adapters`). Every adapter's delta
    is computed for the whole batch (adapter weights stream once; the
    N× extra FLOPs are negligible at rank<<d) and each row selects its
    own — no [B, d, r] gather materializes."""
    if lora_layer is None:
        return base_out
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, x.shape)
        x = jnp.where(keep, x / (1.0 - dropout_rate), 0.0).astype(x.dtype)
    if lora_slots is not None:
        t = jnp.einsum("bsd,ndr->nbsr", x, lora_layer["a"])
        delta_all = jnp.einsum("nbsr,nro->nbso", t, lora_layer["b"])
        delta = jnp.take_along_axis(
            delta_all, lora_slots[None, :, None, None], axis=0)[0]
    else:
        delta = (x @ lora_layer["a"]) @ lora_layer["b"]
    return base_out + scale * delta.astype(base_out.dtype)


def apply_lora_fused(x: jnp.ndarray, fused_out: jnp.ndarray,
                     lora_layer: Dict[str, Dict[str, jnp.ndarray]],
                     parts, scale: float,
                     dropout_rate: float = 0.0,
                     rng_for: Optional[Any] = None,
                     lora_slots: Optional[jnp.ndarray] = None
                     ) -> jnp.ndarray:
    """Low-rank bypass around a FUSED projection (qkv_proj / gateup_proj).

    The fused decode weights concatenate per-target output columns
    (qwen3.fuse_for_decode: q ‖ k ‖ v, gate ‖ up), so each target's
    adapter delta — computed from the SAME input x — lands on its own
    column slice of the fused output. This keeps multi-LoRA serving on
    the fused (and fused-int8) decode path instead of forfeiting the
    measured fusion win (vLLM applies banks the same way: fused base
    matmul + per-target shrink/expand bypasses).

    parts: ((target_name, width), ...) covering fused_out's last dim in
    order. Targets absent from ``lora_layer`` contribute zero columns.
    rng_for: optional callable name -> dropout rng (per-target streams,
    matching the unfused path's fold_in-by-target convention)."""
    deltas = []
    any_hit = False
    B_dims = fused_out.shape[:-1]
    for name, width in parts:
        ab = lora_layer.get(name)
        if ab is None:
            deltas.append(jnp.zeros(B_dims + (width,), fused_out.dtype))
            continue
        any_hit = True
        rng = rng_for(name) if rng_for is not None else None
        deltas.append(apply_lora(
            x, jnp.zeros(B_dims + (width,), fused_out.dtype), ab, scale,
            dropout_rate, rng, lora_slots=lora_slots))
    if not any_hit:
        return fused_out
    return fused_out + jnp.concatenate(deltas, axis=-1)


def stack_adapters(adapters, scales=None) -> Dict[str, Any]:
    """Stack N unmerged adapters into a multi-LoRA serving bank.

    adapters: list of lora dicts ({"layers": {t: {"a": [L, d, r],
    "b": [L, r, o]}}}). Returns {"layers": {t: {"a": [L, N+1, d, r],
    "b": [L, N+1, r, o]}}} — index 0 is the BASE MODEL (zero delta),
    adapter i lives at index i+1. Per-adapter scale (r, alpha) is folded
    into the stacked ``b`` so the bank applies with scale 1.0 and mixed
    (r, alpha) adapters still serve exactly. Adapters must share rank
    and target set (pad externally if not)."""
    assert adapters, "need at least one adapter"
    targets = sorted(adapters[0]["layers"])
    scales = scales or [1.0] * len(adapters)
    layers: Dict[str, Any] = {}
    for t in targets:
        a0 = adapters[0]["layers"][t]["a"]
        assert a0.ndim == 3, "multi-LoRA bank supports dense targets only"
        ab_a = [jnp.zeros_like(a0)]
        ab_b = [jnp.zeros_like(adapters[0]["layers"][t]["b"])]
        for ad, sc in zip(adapters, scales):
            assert sorted(ad["layers"]) == targets, "target sets differ"
            assert ad["layers"][t]["a"].shape == a0.shape, (
                f"rank/shape mismatch on {t}")
            ab_a.append(ad["layers"][t]["a"])
            ab_b.append(ad["layers"][t]["b"] * sc)
        # [L, N+1, ...] so the layer scan slices L and hands each layer
        # its [N+1, ...] bank slice
        layers[t] = {"a": jnp.stack(ab_a, axis=1),
                     "b": jnp.stack(ab_b, axis=1)}
    return {"layers": layers}


def merge_lora(params: Dict[str, Any], lora: Dict[str, Any],
               lora_cfg: LoraConfig) -> Dict[str, Any]:
    """Fold adapters into the base weights (for export / fast inference),
    equivalent to PEFT merge_and_unload used implicitly at
    /root/reference/src/inference_lora.py:214-234."""
    out = jax.tree.map(lambda x: x, params)  # shallow copy
    new_layers = dict(out["layers"])
    for name, ab in lora["layers"].items():
        eq = ("leir,lero->leio" if ab["a"].ndim == 4  # expert stacks
              else "lir,lro->lio")
        delta = jnp.einsum(eq, ab["a"].astype(jnp.float32),
                           ab["b"].astype(jnp.float32)) * lora_cfg.scale
        base = new_layers[name]
        if isinstance(base, dict) and "w_q" in base:
            # QLoRA int8 base (qwen3.quantize_for_training): dequantize,
            # merge, and hand back a dense weight in the model dtype
            # (re-quantize for serving with quantize_for_decode)
            base = (base["w_q"].astype(jnp.float32)
                    * base["scale"][..., None, :])
            new_layers[name] = (base + delta).astype(
                params["embed"].dtype)
        else:
            new_layers[name] = (base.astype(jnp.float32)
                                + delta).astype(base.dtype)
    out["layers"] = new_layers
    return out
