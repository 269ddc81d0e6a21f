"""Dropless top-k mixture-of-experts MLP — TPU-native sparse FFN.

Beyond the reference (SURVEY.md §2.4 lists EP as absent: the reference
trains dense Qwen3 only), this powers the Qwen3-MoE model family
(qwen3-30b-a3b-class checkpoints) and expert parallelism over an
``expert`` mesh axis.

Design (sort + ragged matmul, NOT the GShard capacity/one-hot dispatch):

  1. router: [T, H] x [H, E] -> softmax probs (fp32), top-k per token
  2. sort the T*k (token, choice) pairs by expert id -> contiguous
     per-expert groups with data-dependent sizes
  3. three ``jax.lax.ragged_dot`` calls run the grouped GEMMs
     (gate/up/down) directly on the ragged groups — the MXU sees a few
     large matmuls, no [T, E, capacity] one-hot dispatch tensor is ever
     materialized, and NO tokens are dropped (capacity-free), so
     inference is exact and training sees every token.
  4. inverse-permute back to [T, k, H] and combine with routing weights
     (a gather, not a scatter-add — cheaper on TPU and trivially
     differentiable). ragged_dot has full JVP/transpose rules in JAX,
     so the whole MLP is differentiable end to end.

Expert parallelism: expert-stacked weights [E, H, I] shard over the
``expert`` mesh axis (parallel.sharding); under GSPMD the ragged GEMMs
partition over groups. Aux losses (Switch-style load-balance +
router z-loss) return alongside the output for the trainer.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# Grouped-GEMM backend for the expert matmuls:
#   "ragged" — jax.lax.ragged_dot (XLA lowering; differentiable, runs on
#              every platform; the correctness reference)
#   "gmm"    — Pallas megablox grouped matmul (custom-VJP fwd+bwd; the
#              TPU hot path — flip after an on-chip measurement, or run
#              with interpret=True off-TPU for parity tests)
_MOE_IMPL = os.environ.get("MOLLY_MOE_GEMM", "ragged")
assert _MOE_IMPL in ("ragged", "gmm"), _MOE_IMPL


def set_moe_gemm_impl(name: str) -> None:
    global _MOE_IMPL
    assert name in ("ragged", "gmm"), name
    _MOE_IMPL = name


def quantize_experts(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Stacked expert weights [E, K, N] -> int8 + per-(expert, out-col)
    fp32 scales — the ops.quant weight-only scheme, stacked. Decode is
    weight-bandwidth-bound and experts are ~all of a MoE's bytes
    (qwen3-moe-mini: 3.6B of 4.2B params), so halving expert HBM traffic
    is the whole int8 win for MoE serving."""
    from .quant import quantize_int8
    return jax.vmap(quantize_int8)(w)


def _n_experts(w) -> int:
    return (w["w_q"] if isinstance(w, dict) else w).shape[0]


def _grouped_dot(lhs: jnp.ndarray, rhs, group_sizes: jnp.ndarray
                 ) -> jnp.ndarray:
    """[M, K] x [G, K, N] with per-group row counts -> [M, N] fp32.

    rhs may be a quantize_experts dict: the int8->storage-dtype convert
    rides the dot's operand load (same XLA-fusion bet the dense int8
    decode path measured and won, ops/quant.py:74-83), and the
    per-(expert, out-col) scale is applied to the fp32 product rows via
    the row->group map (scale factors out of the contraction exactly).
    NOTE: under the gmm backend the convert sits before a custom-call
    boundary and MATERIALIZES the bf16 copy — the int8 bandwidth win
    needs the default ragged (XLA) backend; an int8-native gmm kernel is
    the follow-up if gmm wins the bf16 measurement."""
    if isinstance(rhs, dict):
        w_q, scale = rhs["w_q"], rhs["scale"]
        y = _grouped_dot(lhs, w_q.astype(lhs.dtype), group_sizes)
        eid = jnp.repeat(jnp.arange(w_q.shape[0]), group_sizes,
                         total_repeat_length=lhs.shape[0])
        return y * jnp.take(scale, eid, axis=0).astype(y.dtype)
    acc = jnp.promote_types(jnp.float32, lhs.dtype)  # f64 parity tests
    if _MOE_IMPL == "gmm":
        from jax.experimental.pallas.ops.tpu.megablox import gmm
        interpret = jax.devices()[0].platform != "tpu"
        # the kernel requires m % tile_m == 0; decode shapes (m = B*topk,
        # e.g. 64 at batch 8) are smaller than the 128 tile — pad rows
        # into the last group (garbage rows compute against one expert,
        # sliced off below; metadata needs sum(group_sizes) == m)
        M = lhs.shape[0]
        pad = (-M) % 128
        if pad:
            lhs = jnp.pad(lhs, ((0, pad), (0, 0)))
            group_sizes = group_sizes.at[-1].add(pad)
        # custom_vjp: positional args only (kwargs unsupported under vjp)
        out = gmm(lhs, rhs, group_sizes,
                  acc, (128, 128, 128), None, None,
                  False, interpret)
        return out[:M] if pad else out
    return jax.lax.ragged_dot(lhs, rhs, group_sizes,
                              preferred_element_type=acc)


def router_topk(x: jnp.ndarray, router_w: jnp.ndarray, k: int,
                norm_topk_prob: bool = True
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                           jnp.ndarray]:
    """Routing: returns (weights [T, k] fp32, expert ids [T, k],
    probs [T, E] fp32, logits [T, E] fp32). Router math in fp32 — tiny
    [T, E] tensors, and top-k ties/normalization are precision-sensitive."""
    logits = jnp.dot(
        x, router_w.astype(x.dtype),
        preferred_element_type=jnp.promote_types(jnp.float32, x.dtype))
    # softmax in f32 regardless of model dtype — matches HF
    # Qwen3MoeSparseMoeBlock (F.softmax(..., dtype=torch.float))
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    topw, topi = jax.lax.top_k(probs, k)
    if norm_topk_prob:
        topw = topw / jnp.sum(topw, axis=-1, keepdims=True)
    return topw, topi, probs, logits


def _lora_grouped(xs: jnp.ndarray, ab, group_sizes: jnp.ndarray,
                  scale: float, dropout_rate: float = 0.0,
                  dropout_rng=None) -> jnp.ndarray:
    """Grouped low-rank bypass: scale * (drop(xs) @ a_e) @ b_e with each
    row's own expert's adapter — two more ragged dots over the SAME
    groups as the base GEMM (models.lora, expert-stacked adapters)."""
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    xs.shape)
        xs = jnp.where(keep, xs / (1.0 - dropout_rate), 0.0).astype(xs.dtype)
    t = _grouped_dot(xs, ab["a"], group_sizes)        # [M, r] fp32
    return scale * _grouped_dot(t.astype(xs.dtype), ab["b"], group_sizes)


def moe_mlp(x: jnp.ndarray, router_w: jnp.ndarray, w_gate: jnp.ndarray,
            w_up: jnp.ndarray, w_down: jnp.ndarray, *,
            num_experts_per_tok: int, norm_topk_prob: bool = True,
            lora: Dict[str, Dict[str, jnp.ndarray]] | None = None,
            lora_scale: float = 1.0, lora_dropout: float = 0.0,
            dropout_rng=None,
            ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Sparse SwiGLU FFN. x [T, H]; router_w [H, E]; w_gate/w_up [E, H, I];
    w_down [E, I, H] -> (out [T, H] in x.dtype, aux-loss dict).

    Operands stay in storage dtype for the grouped GEMMs (bf16 MXU rate)
    with fp32 accumulation, same convention as ops.lce._mm. w_gate/w_up/
    w_down may be quantize_experts dicts (int8 serving path). lora is an
    optional {"expert_gate"/"expert_up"/"expert_down": {"a" [E, d, r],
    "b" [E, r, d]}} adapter dict (models.lora expert targets).

    w_up=None means w_gate is a FUSED [E, H, 2I] gate-and-up stack
    (decode prep, qwen3.fuse_for_decode): one grouped GEMM instead of
    two — fewer dispatches, better weight streaming. Fused stacks are
    post-merge serving weights; adapters are not applied.
    """
    T, H = x.shape
    E = _n_experts(w_gate)
    k = num_experts_per_tok
    topw, topi, probs, logits = router_topk(x, router_w, k, norm_topk_prob)

    flat_e = topi.reshape(T * k)              # expert id per (token, choice)
    order = jnp.argsort(flat_e)               # group rows by expert
    tok = order // k                           # source token per sorted row
    xs = jnp.take(x, tok, axis=0)              # [T*k, H] gathered operands
    group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)

    lora = lora or {}

    def bypass(base, inp, name):
        if name not in lora:
            return base
        return base + _lora_grouped(inp, lora[name], group_sizes,
                                    lora_scale, lora_dropout, dropout_rng)

    if w_up is None:  # fused gate-and-up stack
        assert not lora, "fused expert stacks are post-merge (no adapters)"
        gu = _grouped_dot(xs, w_gate, group_sizes)  # [T*k, 2I] fp32
        g, u = jnp.split(gu, 2, axis=-1)
    else:
        g = bypass(_grouped_dot(xs, w_gate, group_sizes), xs,
                   "expert_gate")              # [T*k, I] fp32
        u = bypass(_grouped_dot(xs, w_up, group_sizes), xs, "expert_up")
    h = (jax.nn.silu(g) * u).astype(x.dtype)
    y = bypass(_grouped_dot(h, w_down, group_sizes), h,
               "expert_down")                  # [T*k, H] fp32

    # combine: inverse permutation (gather) back to (token, choice) order,
    # weight, and sum the k choices
    inv = jnp.argsort(order)
    y = jnp.take(y, inv, axis=0).reshape(T, k, H)
    out = jnp.sum(y * topw.astype(y.dtype)[..., None],
                  axis=1).astype(x.dtype)

    # Switch-Transformer load-balance loss: E * sum_e f_e * P_e where
    # f_e = fraction of routed (token, choice) pairs on expert e and
    # P_e = mean router prob. == 1.0 at perfect balance.
    f = group_sizes.astype(jnp.float32) / (T * k)
    lb = E * jnp.sum(f * jnp.mean(probs, axis=0))
    z = jnp.mean(jnp.square(jax.nn.logsumexp(logits, axis=-1)))
    aux = {"load_balance": lb, "router_z": z}
    return out, aux


def moe_mlp_expert_sharded(
        x: jnp.ndarray, router_w: jnp.ndarray, w_gate: jnp.ndarray,
        w_up: jnp.ndarray, w_down: jnp.ndarray, *,
        num_experts_per_tok: int, norm_topk_prob: bool = True,
        capacity_factor: float = 2.0, axis_name: str = "expert",
        lora: Dict[str, Dict[str, jnp.ndarray]] | None = None,
        lora_scale: float = 1.0, lora_dropout: float = 0.0,
        dropout_rng=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Expert-parallel MoE MLP: weights sharded over ``axis_name``, NEVER
    gathered (the GSPMD fallback around data-dependent dispatch gathers
    the [E, H, I] stacks every layer, defeating EP's memory win).

    shard_map plan (the expert axis goes manual; data/fsdp/tensor stay
    with GSPMD):
      - routing is replicated math (tiny [T, E] tensors)
      - each device compacts the (token, choice) pairs routed to ITS
        experts into a static per-device buffer of
        C = ceil(T * k * capacity_factor / n_dev) rows (GShard-style
        capacity: overflow rows are dropped, so unlike the dropless
        single-device path this is approximate under extreme imbalance;
        capacity_factor=2 makes drops vanishingly rare at load_balance
        ≈ 1, and the aux loss pushes routing there)
      - local grouped GEMMs over the C-row buffer (compute scales 1/n)
      - one psum of the [T, H] partial outputs per layer (the only
        collective; comm = activations, not weights)
    """
    if w_up is None and jax.sharding.get_abstract_mesh() is not None \
            and jax.sharding.get_abstract_mesh().shape.get(axis_name, 1) > 1:
        # fused gate-and-up stack under real EP: split back (the fusion
        # win is single-device dispatch count; EP correctness first)
        if isinstance(w_gate, dict):
            wq = jnp.split(w_gate["w_q"], 2, axis=-1)
            sc = jnp.split(w_gate["scale"], 2, axis=-1)
            w_gate = {"w_q": wq[0], "scale": sc[0]}
            w_up = {"w_q": wq[1], "scale": sc[1]}
        else:
            w_gate, w_up = jnp.split(w_gate, 2, axis=-1)
    mesh = jax.sharding.get_abstract_mesh()
    n_dev = mesh.shape.get(axis_name, 1) if mesh is not None else 1
    if n_dev <= 1:
        out, aux = moe_mlp(x, router_w, w_gate, w_up, w_down,
                           num_experts_per_tok=num_experts_per_tok,
                           norm_topk_prob=norm_topk_prob, lora=lora,
                           lora_scale=lora_scale,
                           lora_dropout=lora_dropout,
                           dropout_rng=dropout_rng)
        # keep the aux pytree identical to the sharded path (the layer
        # scan and the trainer's accum carry need consistent keys)
        return out, {**aux, "ep_dropped_frac": jnp.zeros((), jnp.float32)}
    from functools import partial

    from jax.sharding import PartitionSpec as P

    T, H = x.shape
    E = _n_experts(w_gate)
    k = num_experts_per_tok
    assert E % n_dev == 0, (E, n_dev)
    C = max(-(-T * k * capacity_factor // n_dev), 1)
    C = int(min(C, T * k))
    topw, topi, probs, logits = router_topk(x, router_w, k,
                                            norm_topk_prob)
    f = (jnp.bincount(topi.reshape(-1), length=E).astype(jnp.float32)
         / (T * k))
    aux = {"load_balance": E * jnp.sum(f * jnp.mean(probs, axis=0)),
           "router_z": jnp.mean(jnp.square(
               jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)))}

    lora = lora or {}
    # fixed arg order for the shard_map positional signature
    lora_keys = tuple(sorted(lora))
    lora_vals = tuple(lora[k] for k in lora_keys)

    def local_fn(x, topw, topi, wg, wu, wd, *lvals):
        # mark the replicated operands device-varying BEFORE the
        # data-dependent gathers: the device-local sel/tok indices make
        # every downstream value varying, and without the explicit pcast
        # the vma transpose silently drops the cross-device cotangent
        # sum for topw/x (wrong router grads; values unaffected)
        x, topw, topi = (jax.lax.pcast(v, (axis_name,), to="varying")
                         for v in (x, topw, topi))
        E_l = _n_experts(wg)
        e_lo = jax.lax.axis_index(axis_name) * E_l
        flat_e = topi.reshape(T * k) - e_lo
        flat_w = topw.reshape(T * k)
        local = (flat_e >= 0) & (flat_e < E_l)
        # sort: local rows grouped by expert first, non-local last
        order = jnp.argsort(jnp.where(local, flat_e, E_l))
        sel = order[:C]
        tok = sel // k
        valid = jnp.take(local, sel)
        # per-expert counts, cumulatively truncated to the C-row buffer
        sizes0 = jnp.bincount(jnp.where(local, flat_e, E_l),
                              length=E_l + 1)[:E_l]
        cum = jnp.minimum(jnp.cumsum(sizes0), C)
        sizes = jnp.diff(jnp.concatenate(
            [jnp.zeros((1,), cum.dtype), cum])).astype(jnp.int32)
        xs = jnp.take(x, tok, axis=0) * valid[:, None].astype(x.dtype)
        ll = dict(zip(lora_keys, lvals))

        def bypass(base, inp, name):
            if name not in ll:
                return base
            return base + _lora_grouped(inp, ll[name], sizes, lora_scale,
                                        lora_dropout, dropout_rng)

        g = bypass(_grouped_dot(xs, wg, sizes), xs, "expert_gate")
        u = bypass(_grouped_dot(xs, wu, sizes), xs, "expert_up")
        h = (jax.nn.silu(g) * u).astype(x.dtype)
        y = bypass(_grouped_dot(h, wd, sizes), h, "expert_down")
        w_sel = jnp.take(flat_w, sel) * valid
        out = jnp.zeros((T, H), y.dtype).at[tok].add(
            y * w_sel[:, None].astype(y.dtype))
        # capacity-overflow observability: (token, choice) pairs that
        # did not fit this device's C-row buffer lose their contribution
        dropped = jnp.sum(sizes0) - cum[-1]
        return (jax.lax.psum(out, axis_name),
                jax.lax.psum(dropped, axis_name))

    fn = jax.shard_map(
        local_fn,
        in_specs=(P(), P(), P(), P(axis_name), P(axis_name),
                  P(axis_name)) + (P(axis_name),) * len(lora_vals),
        out_specs=(P(), P()),
        axis_names=frozenset({axis_name}),
    )
    out, dropped = fn(x, topw, topi, w_gate, w_up, w_down, *lora_vals)
    aux["ep_dropped_frac"] = dropped.astype(jnp.float32) / (T * k)
    return out.astype(x.dtype), aux


def moe_mlp_reference(x, router_w, w_gate, w_up, w_down, *,
                      num_experts_per_tok, norm_topk_prob=True):
    """Naive dense reference (every expert on every token, masked
    combine) — O(T*E) compute; test oracle only."""
    topw, topi, _, _ = router_topk(x, router_w, num_experts_per_tok,
                                   norm_topk_prob)
    T, H = x.shape
    E = w_gate.shape[0]

    acc = jnp.promote_types(jnp.float32, x.dtype)

    def one_expert(wg, wu, wd):
        g = jnp.dot(x, wg, preferred_element_type=acc)
        u = jnp.dot(x, wu, preferred_element_type=acc)
        h = (jax.nn.silu(g) * u).astype(x.dtype)
        return jnp.dot(h, wd, preferred_element_type=acc)

    ys = jax.vmap(one_expert)(w_gate, w_up, w_down)      # [E, T, H]
    onehot = jax.nn.one_hot(topi, E, dtype=jnp.float32)  # [T, k, E]
    w_e = jnp.sum(onehot * topw[..., None], axis=1)      # [T, E]
    return jnp.einsum("eth,te->th", ys,
                      w_e.astype(acc)).astype(x.dtype)
