"""Pipeline parallelism (GPipe-style) for the stacked-layer decoder.

The reference has NO pipeline parallelism (SURVEY.md §2.4 — DeepSpeed ZeRO
data parallelism only); SURVEY.md §7 noted that the stacked-[L, ...] layer
layout of models.qwen3 "gives a natural PP cut". This module makes that
seam real, TPU-style:

  - the leading [L, ...] axis of every layer parameter is sharded over a
    ``pipe`` mesh axis (each device holds L/P contiguous layers — no
    per-stage module objects, just a PartitionSpec);
  - the batch is split into M microbatches; a ``shard_map`` clock loop of
    M + P - 1 ticks flows activations stage-to-stage with
    ``jax.lax.ppermute`` (one ICI hop per tick);
  - everything is differentiable — the backward pass runs the same ring in
    reverse via ppermute's transpose rule (GPipe schedule: full forward
    stash, per-stage remat via cfg.remat).

Embedding, the omics encoders, final norm, and the LM head run outside the
shard_map under plain GSPMD (replicated over ``pipe``, sharded over
``data``), so fusion-model training composes with PP unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models import qwen3
from ..models.configs import Qwen3Config

PIPE_AXIS = "pipe"
DATA_AXIS = "data"


def make_pp_mesh(pipe: int, data: int = 1, devices=None) -> Mesh:
    """2-axis (pipe, data) mesh for pipeline-parallel runs."""
    devices = devices if devices is not None else jax.devices()
    assert pipe * data == len(devices), (pipe, data, len(devices))
    arr = np.asarray(devices).reshape(pipe, data)
    return Mesh(arr, (PIPE_AXIS, DATA_AXIS))


def pp_param_specs(params: Any) -> Any:
    """Decoder layer-stacked leaves shard over pipe on axis 0; everything
    else (embeddings, norms, encoders, projectors) replicates over pipe.
    Works for both fusion trees (text/layers/...) and bare qwen3 trees
    (layers/...)."""
    def spec(path, leaf):
        names = [str(getattr(p, "key", "")) for p in path]
        if "layers" in names:
            i = names.index("layers")
            if i == 0 or (i == 1 and names[0] == "text"):
                return P(PIPE_AXIS)
        return P()
    return jax.tree_util.tree_map_with_path(spec, params)


def decoder_forward_pp(
    params: Dict[str, Any],
    cfg: Qwen3Config,
    *,
    inputs_embeds: jnp.ndarray,          # [B, S, H]
    attention_mask: Optional[jnp.ndarray],  # [B, S]
    n_micro: int,
    axis_name: str = PIPE_AXIS,
) -> jnp.ndarray:
    """Pipelined decoder stack -> final hidden states [B, S, H]."""
    B, S, H = inputs_embeds.shape
    assert B % n_micro == 0, (B, n_micro)
    assert not cfg.context_parallel, (
        "context_parallel (ring attention) cannot run inside the pipeline "
        "clock loop; use one or the other")
    mb = B // n_micro
    if attention_mask is None:
        attention_mask = jnp.ones((B, S), jnp.int32)
    positions = jnp.maximum(
        jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) - 1, 0)
    cos, sin = qwen3.rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta,
                                  dtype=inputs_embeds.dtype)

    xs = inputs_embeds.reshape(n_micro, mb, S, H)
    coss = cos.reshape(n_micro, mb, *cos.shape[1:])
    sins = sin.reshape(n_micro, mb, *sin.shape[1:])
    masks = attention_mask.reshape(n_micro, mb, S)

    def inner(lp_local, xs, coss, sins, masks):
        n_stage = jax.lax.axis_size(axis_name)
        d = jax.lax.axis_index(axis_name)
        M = xs.shape[0]

        def vary(x):
            return jax.lax.pcast(x, (axis_name,), to="varying")

        xs, coss, sins, masks = map(vary, (xs, coss, sins, masks))

        def run_stage(h, m):
            cos_m, sin_m, mask_m = coss[m], sins[m], masks[m]

            def body(h, layer_params):
                h, _, _ = qwen3._layer(cfg, h, layer_params, cos_m, sin_m,
                                       mask_m, True, None, 0)
                return h, None

            if cfg.remat:
                body = jax.checkpoint(body)
            h, _ = jax.lax.scan(body, h, lp_local)
            return h

        perm = [(i, i + 1) for i in range(n_stage - 1)]

        def tick(carry, t):
            recv, outs = carry
            m = jnp.clip(t - d, 0, M - 1)
            x_in = jnp.where(d == 0, xs[m], recv)
            y = run_stage(x_in, m)
            out_m = t - (n_stage - 1)
            write = jnp.logical_and(d == n_stage - 1,
                                    jnp.logical_and(out_m >= 0, out_m < M))
            safe = jnp.clip(out_m, 0, M - 1)
            outs = outs.at[safe].set(jnp.where(write, y, outs[safe]))
            recv = (jax.lax.ppermute(y, axis_name, perm)
                    if perm else jnp.zeros_like(y))
            return (recv, outs), None

        recv0 = vary(jnp.zeros((mb, S, H), xs.dtype))
        outs0 = vary(jnp.zeros((M, mb, S, H), xs.dtype))
        (_, outs), _ = jax.lax.scan(
            tick, (recv0, outs0), jnp.arange(M + n_stage - 1))
        # broadcast the last stage's collected outputs to every stage
        return jax.lax.psum(
            jnp.where(d == n_stage - 1, outs, jnp.zeros_like(outs)),
            axis_name)

    hidden = jax.shard_map(
        inner,
        in_specs=(P(PIPE_AXIS), P(), P(), P(), P()),
        out_specs=P(),
        axis_names=frozenset({axis_name}),
    )(params["layers"], xs, coss, sins, masks)
    hidden = hidden.reshape(B, S, H)
    from ..ops.norms import rms_norm
    return rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)


def pp_loss_fn(
    params: Dict[str, Any],
    cfg,  # FusionConfig
    batch: Dict[str, jnp.ndarray],
    *,
    n_micro: int,
    z_loss: float = 0.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Fusion-model LM loss with the decoder pipelined over ``pipe``.

    Drop-in for fusion.loss_fn: encoders + injection + LM head stay GSPMD;
    only the decoder layer stack runs the pipeline clock loop.
    """
    from ..models import fusion
    embeds = fusion.build_inputs_embeds(params, cfg, batch)
    embeds = _constrain_batch_dim(embeds)
    hidden = decoder_forward_pp(
        params["text"], cfg.text, inputs_embeds=embeds,
        attention_mask=batch.get("attention_mask"), n_micro=n_micro)
    hidden = _constrain_batch_dim(hidden)
    return fusion.loss_from_hidden(params, cfg, hidden, batch, z_loss=z_loss)


def _constrain_batch_dim(x: jnp.ndarray) -> jnp.ndarray:
    """Anchor dim 0 (batch) to the ``data`` mesh axis, replicated elsewhere.

    Without this anchor, sharding propagation on the PP path is free to
    pick an H-sharded layout for the injection scatter's backward gather
    (d(proj_emb) = gather(d_embeds, rows)), which the SPMD partitioner can
    only satisfy by replicating the whole tensor ("Involuntary full
    rematerialization" — the round-3 MULTICHIP artifact). Pinning the
    activations batch-sharded makes that gather batch-parallel (output
    dim 0 aligned with operand dim 0 via the iota batch index), which
    partitions cleanly. Applied only when the ambient mesh has a ``data``
    axis so the helper stays mesh-agnostic."""
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is not None and DATA_AXIS in getattr(mesh, "axis_names", ()):
        return jax.lax.with_sharding_constraint(x, P(DATA_AXIS))
    return x
