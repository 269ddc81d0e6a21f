"""Qwen3 dense decoder, pure-functional JAX.

Architecture spec: HF ``modeling_qwen3.py`` (the model family the reference
loads at /root/reference/src/train.py:133-141). Qwen3 = Llama-style pre-norm
decoder with GQA, per-head-dim RMSNorm on Q/K (q_norm/k_norm), RoPE
theta=1e6, SwiGLU MLP, optional tied embeddings.

TPU-first design choices:
  - params are a pytree with all layers STACKED on a leading [L, ...] axis;
    the forward pass is a single ``lax.scan`` over layers (small HLO, fast
    compiles, natural sharding of the layer axis for pipeline seams).
  - KV cache is a pair of [L, B, Smax, Nkv, Dh] arrays threaded through the
    same scan — prefill and decode share one code path.
  - optional LoRA adapters ride the same scan as extra xs (models.lora).
  - attention/norm go through molly_tpu.ops so Pallas kernels slot in
    without touching model code.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from ..ops import quant
from ..ops.attention import dot_product_attention
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_cos_sin
from .configs import Qwen3Config
from .lora import apply_lora

Params = Dict[str, Any]

# stable per-target indices for LoRA dropout rng derivation
_TARGET_IDX = {n: i for i, n in enumerate(
    ("q_proj", "k_proj", "v_proj", "o_proj",
     "gate_proj", "up_proj", "down_proj"))}


def _dtype(cfg: Qwen3Config):
    return jnp.dtype(cfg.dtype)


def init_params(cfg: Qwen3Config, key: jax.Array) -> Params:
    """Random init (normal 0.02 like HF) — used for tests and from-scratch runs;
    real runs import HF checkpoints (models.hf_import)."""
    dt = _dtype(cfg)
    k = iter(jax.random.split(key, 16))
    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    Dq, Dkv, Dh = cfg.q_dim, cfg.kv_dim, cfg.head_dim

    def norm(*shape):
        return jnp.ones(shape, dtype=dt)

    def lin(key, *shape):
        return (0.02 * jax.random.normal(key, shape, dtype=jnp.float32)).astype(dt)

    params: Params = {
        "embed": lin(next(k), cfg.vocab_size, H),
        "layers": {
            "input_norm": norm(L, H),
            "post_attn_norm": norm(L, H),
            "q_proj": lin(next(k), L, H, Dq),
            "k_proj": lin(next(k), L, H, Dkv),
            "v_proj": lin(next(k), L, H, Dkv),
            "o_proj": lin(next(k), L, Dq, H),
            "q_norm": norm(L, Dh),
            "k_norm": norm(L, Dh),
        },
        "final_norm": norm(H),
    }
    if cfg.num_experts:
        E = cfg.num_experts
        # router in fp32 (tiny; top-k is precision-sensitive), experts
        # stacked [L, E, H, I] for the layer scan + expert-axis sharding
        params["layers"]["router"] = lin(
            next(k), L, H, E).astype(jnp.float32)
        params["layers"]["expert_gate"] = lin(next(k), L, E, H, I)
        params["layers"]["expert_up"] = lin(next(k), L, E, H, I)
        params["layers"]["expert_down"] = lin(next(k), L, E, I, H)
    else:
        params["layers"]["gate_proj"] = lin(next(k), L, H, I)
        params["layers"]["up_proj"] = lin(next(k), L, H, I)
        params["layers"]["down_proj"] = lin(next(k), L, I, H)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = lin(next(k), H, cfg.vocab_size)
    return params


def init_cache(cfg: Qwen3Config, batch: int, max_len: int,
               dtype=None, quant: Optional[str] = None
               ) -> Dict[str, jnp.ndarray]:
    """KV cache, ONE head-major array [L, B, Nkv, Smax, 2*Dh] (k ‖ v on the
    minor dim): head-major means both attention dots read the window
    natively (no per-step transpose); one array means one dynamic write +
    one indexed read per layer instead of four ops.

    quant="int8": store K/V as int8 with one symmetric scale per
    (layer, row, head, column, k|v half) in ``kv_scale`` — halves the
    per-step HBM read that dominates large-batch decode, and the scales
    factor OUT of both attention dots (per-column k-scale multiplies the
    logit column; per-column v-scale folds into the softmax weights), so
    the dots themselves run on the int8-converted operands with XLA's
    convert-into-dot fusion (same pattern as int8 weights, ops/quant.py).
    Qwen3's per-head-dim q/k RMSNorm tames the channel outliers that
    usually argue for per-channel K quantization."""
    dt = dtype or _dtype(cfg)
    shape = (cfg.num_hidden_layers, batch, cfg.num_key_value_heads,
             max_len, 2 * cfg.head_dim)
    if quant == "int8":
        return {"kv": jnp.zeros(shape, jnp.int8),
                "kv_scale": jnp.zeros(shape[:-1] + (2,), jnp.float32)}
    assert quant is None, quant
    return {"kv": jnp.zeros(shape, dt)}


def quantize_kv(kv_new: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-(row, head, column, k|v-half) int8 quantization of
    fresh KV rows [..., S, 2*Dh] -> (int8 same shape, scales [..., S, 2])."""
    lead, two_dh = kv_new.shape[:-1], kv_new.shape[-1]
    halves = kv_new.astype(jnp.float32).reshape(lead + (2, two_dh // 2))
    scale = jnp.maximum(jnp.max(jnp.abs(halves), axis=-1), 1e-6) / 127.0
    q8 = jnp.clip(jnp.round(halves / scale[..., None]), -127, 127)
    return q8.astype(jnp.int8).reshape(lead + (two_dh,)), scale


class PagedCache(NamedTuple):
    """Per-layer view of a paged KV pool threaded through the decode scan
    (ops/paged_attention.py; pool/allocator in inference/paged.py). All
    layers share ONE page space: page p of layer ``layer`` lives at pool
    row ``layer * pages_per_layer + p``, so per-layer access is index
    arithmetic — no [L, ...] slicing ever materializes. The LAST pool row
    is a scratch page that absorbs writes from inactive slots."""
    k_pages: jnp.ndarray    # [Nkv, L * pages_per_layer + 1, P, Dh]
    v_pages: jnp.ndarray
    layer: jnp.ndarray      # scalar int32 (scan carry)
    table: jnp.ndarray      # [B, pages_per_seq] int32 (layer-relative)
    lengths: jnp.ndarray    # [B] int32: attend over positions [0, len)
    pages_per_layer: int
    # int8 pools: per-(head, page, offset) symmetric scales (|max| over
    # the Dh row, dequant = w * scale / 127.5) stored in the int8
    # kernel's lane-major tile layout — each page's P-vector replicated
    # over the 8 f32 sublanes (ops/paged_attention_int8.scales_to_tile);
    # None for model-dtype pools
    k_scales: Optional[jnp.ndarray] = None  # [Nkv, rows, 8, P] f32
    v_scales: Optional[jnp.ndarray] = None


PAGED_QUANT_MAX = 127.5  # kernel convention (quantization_utils.MAX_INT8)
PAGED_SCALE_SUBLANES = 8  # ops/paged_attention_int8.SCALE_SUBLANES


def quantize_page_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 over the trailing (Dh) dim in the paged kernel's
    convention: returns (int8 same shape, scales [..., 1] f32) with
    dequant = w * scale / 127.5."""
    h = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                            keepdims=True), 1e-6)
    w = jnp.clip(jnp.round(x.astype(jnp.float32) * (PAGED_QUANT_MAX / h)),
                 -127, 127)
    return w.astype(jnp.int8), h.astype(jnp.float32)


def _layer(cfg: Qwen3Config, hidden, layer_params, cos, sin, mask, causal,
           cache_kv, cache_index, lora_layer=None, lora_scale=1.0,
           lora_dropout=0.0, dropout_rng=None, lora_slots=None):
    """One decoder layer. cache_kv: None or (k_cache, v_cache) [B,Smax,Nkv,Dh];
    returns (hidden, new_cache_kv)."""
    p = layer_params
    B, S, H = hidden.shape
    Nq, Nkv, Dh = (cfg.num_attention_heads, cfg.num_key_value_heads,
                   cfg.head_dim)

    def rng_for(name):
        return (jax.random.fold_in(dropout_rng, _TARGET_IDX[name])
                if dropout_rng is not None else None)

    def proj(x, name):
        out = quant.linear(x, p[name])
        ll = lora_layer.get(name) if lora_layer is not None else None
        return apply_lora(x, out, ll, lora_scale, lora_dropout,
                          rng_for(name), lora_slots=lora_slots)

    def fused_bypass(x, out, parts):
        # adapters ride the FUSED projection: each target's delta lands on
        # its column slice of the fused output (multi-LoRA serving keeps
        # the fused/int8 decode path; models.lora.apply_lora_fused)
        if lora_layer is None:
            return out
        from .lora import apply_lora_fused
        return apply_lora_fused(x, out, lora_layer, parts, lora_scale,
                                lora_dropout, rng_for,
                                lora_slots=lora_slots)

    x = rms_norm(hidden, p["input_norm"], cfg.rms_norm_eps)
    if "qkv_proj" in p:  # fused decode weights ({quantize,fuse}_for_decode)
        # q‖k stay contiguous out of the fused dot, so Qwen3's per-head-dim
        # q/k RMSNorm (modeling_qwen3.py:200-201) and RoPE run as ONE op
        # each over [B, S, Nq+Nkv, Dh] with stacked qk_norm weights.
        qkv = fused_bypass(x, quant.linear(x, p["qkv_proj"]),
                           (("q_proj", cfg.q_dim), ("k_proj", cfg.kv_dim),
                            ("v_proj", cfg.kv_dim)))
        qk = qkv[..., : cfg.q_dim + cfg.kv_dim].reshape(B, S, Nq + Nkv, Dh)
        v = qkv[..., cfg.q_dim + cfg.kv_dim :].reshape(B, S, Nkv, Dh)
        qk = rms_norm(qk, p["qk_norm"], cfg.rms_norm_eps)
        qk = apply_rope(qk, cos, sin)
        # remat_policy="hot" saves the post-RoPE q/k (and v): flash
        # attention's backward consumes exactly these, so saving them
        # makes the attention side of the layer recompute-free
        qk = checkpoint_name(qk, "qk_rope")
        v = checkpoint_name(v, "v_out")
        q, kk = qk[:, :, :Nq], qk[:, :, Nq:]
    else:
        q = proj(x, "q_proj").reshape(B, S, Nq, Dh)
        kk = proj(x, "k_proj").reshape(B, S, Nkv, Dh)
        v = proj(x, "v_proj").reshape(B, S, Nkv, Dh)
        # Qwen3 applies RMSNorm on the head dim of q/k before RoPE
        # (modeling_qwen3.py:200-201).
        q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps)
        kk = rms_norm(kk, p["k_norm"], cfg.rms_norm_eps)
        q = apply_rope(q, cos, sin)
        kk = apply_rope(kk, cos, sin)
        q = checkpoint_name(q, "qk_rope")
        kk = checkpoint_name(kk, "qk_rope")
        v = checkpoint_name(v, "v_out")

    if cache_kv is None:
        if cfg.context_parallel:
            # ring attention over the mesh "seq" axis: only the seq dim
            # goes manual (shard_map), batch/fsdp/tensor stay with GSPMD
            from ..parallel.ring_attention import ring_attention_sharded
            attn = ring_attention_sharded(
                q, kk, v, mask, causal=causal, scale=Dh ** -0.5,
                zigzag=cfg.context_parallel_zigzag,
                pre_permuted=cfg.context_parallel_prepermuted)
        else:
            attn = dot_product_attention(q, kk, v, mask=mask, causal=causal,
                                         scale=Dh ** -0.5)
        # remat_policy="attn": save this [B,S,Nq,Dh] tensor across the
        # layer checkpoint so the backward pass never re-runs flash
        # attention (the O(S^2) share of recompute) — between "full"
        # (recompute everything) and "dots" (save every matmul, which
        # OOMs at large batch)
        attn = checkpoint_name(attn, "attn_out")
        new_cache = None
    elif isinstance(cache_kv, PagedCache):
        # paged decode (S == 1): write this token's K/V row into its
        # slot's current page, then attend over the slot's page chain
        # (length-masked — no per-column valid bits). cache_index [B] is
        # the write POSITION (= tokens already held); < 0 marks an
        # inactive slot, redirected to the scratch page.
        assert S == 1, "paged KV is a decode-only path (S == 1)"
        pc = cache_kv
        kp, vp = pc.k_pages, pc.v_pages
        P = kp.shape[2]
        idx = cache_index
        safe = jnp.maximum(idx, 0)
        page_of = jnp.take_along_axis(
            pc.table, (safe // P)[:, None], axis=1)[:, 0]
        page = jnp.where(idx >= 0, pc.layer * pc.pages_per_layer + page_of,
                         kp.shape[1] - 1)
        off = jnp.where(idx >= 0, safe % P, 0)
        k_row = kk[:, 0].transpose(1, 0, 2)  # [Nkv, B, Dh]
        v_row = v[:, 0].transpose(1, 0, 2)
        ks, vs = pc.k_scales, pc.v_scales
        # Every pool update below is GATHER -> in-register lane select ->
        # dim-1-only scatter. Writing single lanes/sublanes via advanced
        # indices on (page, off) makes XLA:TPU layout assignment give the
        # LOOP-CARRIED pool a scatter-major layout — measured at the
        # 3072-cap op point: the f32[Nkv,NP,8,P] scale tiles re-laid out
        # as {2,0,3,1} (16x lane padding -> 2x 5.47 GiB copies, OOM) and
        # a full int8-pool copy per decode step to feed the Pallas call's
        # row-major operand. Dim-1 scatters with full minor slices keep
        # the pools row-major end-to-end; the cost is one [Nkv, B, P, *]
        # page gather+scatter per layer per step (a few MB).
        hit = (jax.lax.broadcasted_iota(jnp.int32, (1, B, P, 1), 2)
               == off[None, :, None, None])      # [1, B, P, 1]
        if ks is not None:  # int8 pool: quantize the fresh rows
            k_row, k_sc = quantize_page_rows(k_row)
            v_row, v_sc = quantize_page_rows(v_row)
            # scale tiles [Nkv, rows, 8, P]: set lane `off` of page
            # `page` across all 8 replicated sublanes
            sub_hit = hit[:, :, :, 0][:, :, None, :]  # [1, B, 1, P] lanes
            ks = ks.at[:, page].set(jnp.where(
                sub_hit, k_sc[:, :, 0][:, :, None, None], ks[:, page]))
            vs = vs.at[:, page].set(jnp.where(
                sub_hit, v_sc[:, :, 0][:, :, None, None], vs[:, page]))
        kp = kp.at[:, page].set(jnp.where(
            hit, k_row[:, :, None, :].astype(kp.dtype), kp[:, page]))
        vp = vp.at[:, page].set(jnp.where(
            hit, v_row[:, :, None, :].astype(vp.dtype), vp[:, page]))
        from ..ops.paged_attention import paged_attention
        layer_table = pc.layer * pc.pages_per_layer + pc.table
        attn = paged_attention(q[:, 0], kp, vp, pc.lengths, layer_table,
                               scale=Dh ** -0.5, k_scales=ks,
                               v_scales=vs)[:, None]
        new_cache = (kp, vp, ks, vs)
    else:
        # full [L, B, Nkv, Smax, 2*Dh] cache + layer index: write ONLY the
        # new token rows (k ‖ v, one update), then read this layer's window
        ckv, csc, li = cache_kv
        kv_new = jnp.concatenate(
            [kk.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)],
            axis=-1)  # [B, Nkv, S, 2*Dh]
        if csc is not None:  # int8 cache: quantize the fresh rows
            kv_new, sc_new = quantize_kv(kv_new)
        else:
            kv_new = kv_new.astype(ckv.dtype)
        if jnp.ndim(cache_index) == 2:
            # per-row per-step cache index [B, S] (speculative verify in
            # the serving ring: row b writes its S candidate tokens at its
            # own columns) — advanced-index scatter over (row, column)
            ridx = jnp.arange(B)[:, None]  # [B, 1] broadcasts with [B, S]
            ckv = ckv.at[li, ridx, :, cache_index, :].set(
                kv_new.transpose(0, 2, 1, 3))  # [B, S, Nkv, 2*Dh]
            if csc is not None:
                csc = csc.at[li, ridx, :, cache_index, :].set(
                    sc_new.transpose(0, 2, 1, 3))
        elif jnp.ndim(cache_index) > 0:
            # per-row cache index [B] (continuous-batching decode: each
            # serving slot sits at its own length) — scatter one row/slot
            assert S == 1, "per-row cache_index [B] requires S == 1"
            ckv = ckv.at[li, jnp.arange(B), :, cache_index, :].set(
                kv_new[:, :, 0])
            if csc is not None:
                csc = csc.at[li, jnp.arange(B), :, cache_index, :].set(
                    sc_new[:, :, 0])
        else:
            ckv = jax.lax.dynamic_update_slice(
                ckv, kv_new[None], (li, 0, 0, cache_index, 0))
            if csc is not None:
                csc = jax.lax.dynamic_update_slice(
                    csc, sc_new[None], (li, 0, 0, cache_index, 0))
        kv_l = jax.lax.dynamic_index_in_dim(ckv, li, 0, keepdims=False)
        sc_l = (jax.lax.dynamic_index_in_dim(csc, li, 0, keepdims=False)
                if csc is not None else None)
        attn = dot_product_attention(
            q, kv_l[..., :Dh], kv_l[..., Dh:], mask=mask, causal=causal,
            scale=Dh ** -0.5, q_offset=cache_index, kv_layout="bnsd",
            kv_scales=sc_l)
        new_cache = (ckv, csc)
    attn_flat = attn.reshape(B, S, Nq * Dh)
    attn = proj(attn_flat, "o_proj")
    # "hot" saves the o-projection output so the MLP-side backward
    # (which needs rms_norm(hidden + attn)) never re-runs attention
    attn = checkpoint_name(attn, "o_out")
    hidden = hidden + attn

    x = rms_norm(hidden, p["post_attn_norm"], cfg.rms_norm_eps)
    moe_aux = None
    if "router" in p:  # sparse MoE FFN (dropless top-k, ops.moe)
        moe_lora = None
        if lora_layer is not None:
            moe_lora = {k: lora_layer[k]
                        for k in ("expert_gate", "expert_up", "expert_down")
                        if k in lora_layer} or None
        lkw = dict(lora=moe_lora, lora_scale=lora_scale,
                   lora_dropout=lora_dropout, dropout_rng=dropout_rng)
        if "expert_gateup" in p:  # fused decode stack (w_up=None)
            wg, wu = p["expert_gateup"], None
            lkw["lora"] = None  # serving weights are post-merge
        else:
            wg, wu = p["expert_gate"], p["expert_up"]
        if cfg.expert_parallel:
            from ..ops.moe import moe_mlp_expert_sharded
            out2d, moe_aux = moe_mlp_expert_sharded(
                x.reshape(B * S, H), p["router"], wg, wu,
                p["expert_down"],
                num_experts_per_tok=cfg.num_experts_per_tok,
                norm_topk_prob=cfg.norm_topk_prob,
                capacity_factor=cfg.ep_capacity_factor, **lkw)
        else:
            from ..ops.moe import moe_mlp
            out2d, moe_aux = moe_mlp(
                x.reshape(B * S, H), p["router"], wg, wu,
                p["expert_down"],
                num_experts_per_tok=cfg.num_experts_per_tok,
                norm_topk_prob=cfg.norm_topk_prob, **lkw)
        down = out2d.reshape(B, S, H)
    elif "gateup_proj" in p:  # fused decode weights
        I = (p["gateup_proj"]["w_q"] if isinstance(p["gateup_proj"], dict)
             else p["gateup_proj"]).shape[-1] // 2
        gu = fused_bypass(x, quant.linear(x, p["gateup_proj"]),
                          (("gate_proj", I), ("up_proj", I)))
        gate, up = jnp.split(gu, 2, axis=-1)
        down = proj(jax.nn.silu(gate) * up, "down_proj")
    else:
        mlp = jax.nn.silu(proj(x, "gate_proj")) * proj(x, "up_proj")
        down = proj(mlp, "down_proj")
    return hidden + down, new_cache, moe_aux


def forward_hidden(
    params: Params,
    cfg: Qwen3Config,
    *,
    input_ids: Optional[jnp.ndarray] = None,   # [B, S]
    inputs_embeds: Optional[jnp.ndarray] = None,  # [B, S, H]
    attention_mask: Optional[jnp.ndarray] = None,  # [B, Skv] (Skv=S or Smax)
    positions: Optional[jnp.ndarray] = None,   # [B, S] absolute positions
    cache: Optional[Dict[str, jnp.ndarray]] = None,
    cache_index: int | jnp.ndarray = 0,
    causal: bool = True,  # False: rely on attention_mask only (e.g. the
    #                       serving ring cache, where column order is not
    #                       positional order)
    lora: Optional[Dict[str, Any]] = None,     # {"layers": {target: {a,b}}}
    lora_scale: float = 1.0,
    lora_dropout: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    lora_slots: Optional[jnp.ndarray] = None,  # [B] adapter index into a
    #                       stacked multi-LoRA bank (lora.stack_adapters)
    output_hidden_states: bool = False,
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    """Run the decoder stack; returns (final hidden states, updated cache).

    Without a cache this is a plain causal forward (training). With a cache,
    the S new tokens are written at cache_index and attention runs over the
    full cache (prefill: S=prompt len, index 0; decode: S=1).

    output_hidden_states (no-cache path only) returns a third element: the
    per-layer outputs [L, B, S, H] pre-final-norm — the layer-by-layer
    parity harness (tools.parity) compares these against HF's
    ``hidden_states`` to localize divergence.

    MoE models (cfg.num_experts > 0), no-cache path: the second return
    slot (unused by training, which has no KV cache) carries
    ``{"moe_aux": {"load_balance", "router_z"}}`` averaged over layers —
    the trainer folds them into the loss (ops.moe).
    """
    if inputs_embeds is None:
        inputs_embeds = embed_tokens(params, input_ids)
    hidden = inputs_embeds
    B, S, _ = hidden.shape

    if positions is None:
        if attention_mask is not None and cache is None:
            # left/right-pad robust: position = #real tokens before me
            positions = jnp.maximum(
                jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) - 1, 0
            )[:, :S]
        else:
            assert jnp.ndim(cache_index) == 0, (
                "per-row cache_index requires explicit positions")
            positions = jnp.arange(S)[None, :] + cache_index
            positions = jnp.broadcast_to(positions, (B, S))
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta,
                            dtype=hidden.dtype)

    lp = params["layers"]
    lora_layers = lora["layers"] if lora is not None else None
    if dropout_rng is not None:
        layer_rngs = jax.random.split(dropout_rng, cfg.num_hidden_layers)
    else:
        layer_rngs = None

    if cache is None:
        def body(carry, xs):
            h = carry
            layer_params, lora_l, rng = xs
            h, _, aux = _layer(cfg, h, layer_params, cos, sin,
                               attention_mask, causal, None, 0, lora_l,
                               lora_scale, lora_dropout, rng, lora_slots)
            return h, ((h if output_hidden_states else None), aux)

        n_skip = min(cfg.remat_skip_layers, cfg.num_hidden_layers)
        if cfg.remat and n_skip > 0:
            # segmented remat (configs.Qwen3Config.remat_skip_layers):
            # first n_skip layers scan UNCHECKPOINTED (residuals saved,
            # no backward recompute), the rest under the policy
            body_ck = jax.checkpoint(body, policy=_remat_policy(cfg))
            xs = (lp, lora_layers, layer_rngs)
            head = jax.tree.map(lambda a: a[:n_skip], xs)
            tail = jax.tree.map(lambda a: a[n_skip:], xs)
            hidden, (ph, ah) = jax.lax.scan(body, hidden, head)
            hidden, (pt, at) = jax.lax.scan(body_ck, hidden, tail)
            per_layer = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b]), ph, pt)
            aux_stack = jax.tree.map(
                lambda a, b: jnp.concatenate([a, b]), ah, at)
        else:
            if cfg.remat:
                body = jax.checkpoint(body, policy=_remat_policy(cfg))
            hidden, (per_layer, aux_stack) = jax.lax.scan(
                body, hidden, (lp, lora_layers, layer_rngs))
        # MoE aux losses, averaged over layers (None for dense models) —
        # returned in the cache slot (training never has a KV cache)
        new_cache = (
            {"moe_aux": jax.tree.map(jnp.mean, aux_stack)}
            if aux_stack is not None else None)
        if output_hidden_states:
            out = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
            return out, new_cache, per_layer
    elif "k_pages" in cache:
        # paged decode pool (inference/paged.py): pools ride the scan
        # carry like the dense cache; the page table and lengths are
        # scan-invariant (host-managed between dispatches)
        table, lengths = cache["page_table"], cache["lengths"]
        npl = (cache["k_pages"].shape[1] - 1) // cfg.num_hidden_layers

        def body(carry, xs):
            h, kp, vp, ks, vs, li = carry
            layer_params, lora_l, rng = xs
            pc = PagedCache(kp, vp, li, table, lengths, npl, ks, vs)
            h, (kp, vp, ks, vs), _ = _layer(
                cfg, h, layer_params, cos, sin, None,
                False, pc, cache_index, lora_l,
                lora_scale, lora_dropout, rng,
                lora_slots)
            return (h, kp, vp, ks, vs, li + 1), None

        if cfg.remat:
            body = jax.checkpoint(body)
        (hidden, kp, vp, ks, vs, _), _ = jax.lax.scan(
            body, (hidden, cache["k_pages"], cache["v_pages"],
                   cache.get("k_scales"), cache.get("v_scales"),
                   jnp.int32(0)),
            (lp, lora_layers, layer_rngs))
        new_cache = {"k_pages": kp, "v_pages": vp, "page_table": table,
                     "lengths": lengths}
        if ks is not None:
            new_cache["k_scales"], new_cache["v_scales"] = ks, vs
    else:
        # cache rides the scan CARRY (per-layer dynamic updates in place)
        # instead of being re-stacked as scan ys — avoids rewriting the
        # whole [L, B, Smax, Nkv, Dh] buffers every decode step. (An
        # unrolled decode loop was measured SLOWER: 1131 vs 1287 tok/s —
        # XLA pipelines the scan better.)
        def body(carry, xs):
            h, ckv, csc, li = carry
            layer_params, lora_l, rng = xs
            h, (ckv, csc), _ = _layer(cfg, h, layer_params, cos, sin,
                                      attention_mask, causal,
                                      (ckv, csc, li), cache_index, lora_l,
                                      lora_scale, lora_dropout, rng,
                                      lora_slots)
            return (h, ckv, csc, li + 1), None

        if cfg.remat:
            body = jax.checkpoint(body)
        (hidden, nkv, nsc, _), _ = jax.lax.scan(
            body, (hidden, cache["kv"], cache.get("kv_scale"),
                   jnp.int32(0)),
            (lp, lora_layers, layer_rngs))
        new_cache = {"kv": nkv}
        if nsc is not None:
            new_cache["kv_scale"] = nsc

    hidden = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
    return hidden, new_cache


def _remat_policy(cfg: Qwen3Config):
    """None => recompute everything (min memory); dots => save matmul
    outputs, recompute only elementwise ops (~1 fwd less recompute);
    attn => save only flash-attention outputs (skips the O(S^2) share of
    backward recompute at [B,S,H]-per-layer memory)."""
    if cfg.remat_policy == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if cfg.remat_policy == "attn":
        return jax.checkpoint_policies.save_only_these_names("attn_out")
    if cfg.remat_policy == "hot":
        # Between "dots" (saves EVERY matmul output incl. the [B,S,2I]
        # gate/up intermediates — OOM at batch 16) and "full" (recomputes
        # the whole layer — a 25% counted-MFU tax at full-FT): save the
        # NARROW attention-side tensors (post-RoPE q/k, v, flash output,
        # o-projection output ≈ 7.2k elems/token/layer on 0.6B) and
        # recompute only the wide gate/up projections (~40% of body fwd
        # FLOPs) plus elementwise ops. Memory ≈ 0.6x dots; recompute
        # ≈ 0.3x full (gate/up only; the down matmul DCEs away because
        # the residual add needs no saved output).
        return jax.checkpoint_policies.save_only_these_names(
            "qk_rope", "v_out", "attn_out", "o_out")
    return None


def logits_from_hidden(params: Params, cfg: Qwen3Config,
                       hidden: jnp.ndarray) -> jnp.ndarray:
    if "lm_head_q" in params:  # int8 decode path (quantize_for_decode)
        return quant.int8_matmul(hidden, params["lm_head_q"])
    if "lm_head" in params:  # untied, or [H,V] copy from fuse_for_decode
        return hidden @ params["lm_head"]
    return hidden @ params["embed"].T  # tied embeddings


QUANT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj",
                 "gate_proj", "up_proj", "down_proj")


def quantize_for_training(params: Params, cfg: Qwen3Config) -> Params:
    """QLoRA-style base quantization: int8 the frozen decoder linears
    (incl. MoE expert stacks) IN PLACE of their bf16 storage, keeping
    names, embedding, lm head, and norms untouched — so LoRA adapters
    (models.lora) apply on top and the trainer's loss path (fused LCE on
    the bf16 head) is unchanged. The reference gestures at exactly this
    with prepare_model_for_kbit_training
    (/root/reference/src/utils/tools.py:389). Halves frozen-weight HBM
    in LoRA fine-tunes (fwd AND the bwd re-read stream through int8);
    only the bf16 adapters/projectors train."""
    new_layers = dict(params["layers"])
    for name in QUANT_TARGETS:
        if name in new_layers:
            new_layers[name] = jax.vmap(quant.quantize_int8)(
                new_layers[name])
    if "router" in new_layers:  # MoE: quantize the expert stacks too
        from ..ops.moe import quantize_experts
        for name in ("expert_gate", "expert_up", "expert_down"):
            new_layers[name] = jax.vmap(quantize_experts)(
                new_layers[name])
    return {**params, "layers": new_layers}


def _stacked_qk_norm(cfg: Qwen3Config, lp: Params) -> jnp.ndarray:
    """q_norm/k_norm [L, Dh] -> [L, Nq+Nkv, Dh] so the fused-decode branch
    norms q‖k in one op."""
    qn = jnp.broadcast_to(lp["q_norm"][:, None, :],
                          (cfg.num_hidden_layers, cfg.num_attention_heads,
                           cfg.head_dim))
    kn = jnp.broadcast_to(lp["k_norm"][:, None, :],
                          (cfg.num_hidden_layers, cfg.num_key_value_heads,
                           cfg.head_dim))
    return jnp.concatenate([qn, kn], axis=1)


def fuse_for_decode(params: Params, cfg: Qwen3Config) -> Params:
    """bf16 serving prep: merge q/k/v and gate/up into single matmuls
    (same fusion quantize_for_decode does for int8) — fewer, larger dots
    per decode step stream weights from HBM better. Single-adapter LoRA
    should be merged first (engine.generate does); multi-LoRA BANKS apply
    on top of the fused weights (per-target column-slice deltas,
    models.lora.apply_lora_fused)."""
    lp = params["layers"]
    new_layers = dict(lp)
    new_layers["qkv_proj"] = jnp.concatenate(
        [lp["q_proj"], lp["k_proj"], lp["v_proj"]], axis=-1)
    if "gate_proj" in lp:  # dense MLP
        new_layers["gateup_proj"] = jnp.concatenate(
            [lp["gate_proj"], lp["up_proj"]], axis=-1)
        del new_layers["gate_proj"], new_layers["up_proj"]
    if "expert_gate" in lp:  # MoE: fuse the gate/up stacks the same way
        # ([L, E, H, I] x2 -> [L, E, H, 2I]): one grouped GEMM per layer
        # fewer, same bytes
        new_layers["expert_gateup"] = jnp.concatenate(
            [lp["expert_gate"], lp["expert_up"]], axis=-1)
        del new_layers["expert_gate"], new_layers["expert_up"]
    new_layers["qk_norm"] = _stacked_qk_norm(cfg, lp)
    for name in ("q_proj", "k_proj", "v_proj", "q_norm", "k_norm"):
        del new_layers[name]
    out = {**params, "layers": new_layers}
    if "lm_head" not in out:
        # tied embeddings: materialize the head in [H, V] so the per-step
        # logits dot reads it straight (no in-loop transpose of ~0.6 GB)
        out["lm_head"] = out["embed"].T.copy()
    return out


def quantize_for_decode(params: Params, cfg: Qwen3Config,
                        fuse: bool = True,
                        moe_experts: bool = False) -> Params:
    """Int8-quantize the layer linears + lm head for serving (weight-only,
    per-output-channel). Embedding stays bf16 (gather reads are tiny).
    fuse=True additionally merges q/k/v and gate/up into single matmuls
    (fewer ops per decode step). moe_experts=True also quantizes the
    stacked expert weights (ops.moe.quantize_experts) — experts are ~all
    of a MoE's weight bytes, so this is where the MoE bandwidth win
    lives; the router stays fp32 (tiny, and top-k is precision-
    sensitive)."""
    new_layers = dict(params["layers"])
    moe = "router" in new_layers
    if moe:
        lp = params["layers"]
        if moe_experts:
            from ..ops.moe import quantize_experts
            # quantize BEFORE fusing: per-out-column scales make
            # quantize(concat) == concat(quantize) exactly, and the int8
            # concat transient is 4x smaller than the bf16 one (a
            # materialized bf16 gate||up copy OOM'd qwen3-moe-mini on a
            # 16 GB chip next to the live bf16 tree)
            for name in ("expert_gate", "expert_up", "expert_down"):
                # leading axis is the stacked layer dim: [L, E, K, N]
                new_layers[name] = jax.vmap(quantize_experts)(lp[name])
            if fuse:
                g, u = new_layers.pop("expert_gate"), \
                    new_layers.pop("expert_up")
                new_layers["expert_gateup"] = {
                    "w_q": jnp.concatenate([g["w_q"], u["w_q"]], axis=-1),
                    "scale": jnp.concatenate([g["scale"], u["scale"]],
                                             axis=-1)}
        elif fuse:  # fused [L, E, H, 2I] bf16 gate-and-up stack
            gu = jnp.concatenate([lp["expert_gate"], lp["expert_up"]],
                                 axis=-1)
            del new_layers["expert_gate"], new_layers["expert_up"]
            new_layers["expert_gateup"] = gu
    if fuse:
        lp = params["layers"]
        qkv = jnp.concatenate([lp["q_proj"], lp["k_proj"], lp["v_proj"]],
                              axis=-1)
        new_layers["qkv_proj"] = jax.vmap(quant.quantize_int8)(qkv)
        if not moe:
            gateup = jnp.concatenate([lp["gate_proj"], lp["up_proj"]],
                                     axis=-1)
            new_layers["gateup_proj"] = jax.vmap(quant.quantize_int8)(gateup)
            del new_layers["gate_proj"], new_layers["up_proj"]
            new_layers["down_proj"] = jax.vmap(quant.quantize_int8)(
                lp["down_proj"])
        new_layers["qk_norm"] = _stacked_qk_norm(cfg, lp)
        for name in ("q_proj", "k_proj", "v_proj", "q_norm", "k_norm"):
            del new_layers[name]
        new_layers["o_proj"] = jax.vmap(quant.quantize_int8)(lp["o_proj"])
    else:
        for name in QUANT_TARGETS:
            if name in params["layers"]:
                new_layers[name] = jax.vmap(quant.quantize_int8)(
                    params["layers"][name])
    out = {**params, "layers": new_layers}
    head = (params["embed"].T if cfg.tie_word_embeddings
            else params["lm_head"])
    out["lm_head_q"] = quant.quantize_int8(head)
    if not cfg.tie_word_embeddings:
        out.pop("lm_head", None)
    return out


def forward_logits(params: Params, cfg: Qwen3Config, **kw) -> jnp.ndarray:
    hidden, _ = forward_hidden(params, cfg, **kw)
    return logits_from_hidden(params, cfg, hidden)


def embed_tokens(params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    # mode="clip": out-of-vocab ids must not poison the batch with NaN
    # (jnp.take's default OOB fill) — silent-NaN debugging on TPU is brutal
    return jnp.take(params["embed"], input_ids, axis=0, mode="clip")
