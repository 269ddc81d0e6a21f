"""SFT trainer: optax AdamW + GSPMD sharding + grad accumulation + freeze /
LoRA regimes — replaces the reference's HF Trainer + DeepSpeed ZeRO stack
(/root/reference/src/trainer/, src/configs/ds_z*.json).

Feature parity map:
  - freeze switches train_bio/train_mlp/train_llm
    (tools.py:set_up_trainable_param :313-338) -> a boolean trainable-mask
    pytree + optax.masked zero-updates for frozen subtrees
  - LoRA regime (tools.py:pre_train_lora :345-396) -> models.lora adapters
    trained alongside projectors, base params all frozen
  - DIY AdamW + warmup/cosine (tools.py:get_optimizer :229-265, HF
    scheduler) -> optax chain
  - grad accumulation / clipping (HF args) -> lax.scan over microbatches
    inside ONE jitted step + clip_by_global_norm
  - ZeRO-2/3 -> params + optimizer state sharded over the fsdp axis
    (parallel.sharding); nothing else to do
  - per-task domain losses (trainer/domain_loss.py:881-1024) -> carried in
    step metrics from the fused loss, no full-logit recompute
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import fusion, lora as lora_lib
from ..models.fusion import FusionConfig
from ..models.lora import LoraConfig


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    min_lr_ratio: float = 0.0
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    schedule: str = "cosine"  # "cosine" | "linear" | "constant"
    weight_decay: float = 0.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    grad_clip: float = 1.0
    accum_steps: int = 1
    # freeze switches (reference --train-bio/--train-mlp/--train-llm)
    train_bio: bool = False
    train_mlp: bool = True
    train_llm: bool = True
    # LoRA regime: when set, base LLM is frozen and adapters train
    lora: Optional[LoraConfig] = None
    z_loss: float = 0.0
    # chunked linear+CE (ops.lce) instead of [B,S,V] logits
    fused_lce: bool = True
    lce_chunk: int = 256  # tokens per LCE chunk ([C, V] logit peak)
    # pipeline parallelism: microbatch count for the GPipe clock loop over
    # a "pipe" mesh axis (parallel.pipeline); 0 = off. LoRA not supported
    # in the pipelined decoder path.
    pp_micro: int = 0
    # Adam moments in pinned host memory instead of HBM (the TPU-native
    # ds_z2_offload_config.json analogue) — see offload_opt_state
    offload_opt_state: bool = False


def trainable_mask(params: Dict[str, Any], cfg: TrainConfig) -> Dict[str, Any]:
    """Boolean pytree: which leaves receive updates. Mirrors
    set_up_trainable_param / pre_train_lora semantics."""
    def mask_for(top_key: str) -> bool:
        if top_key in ("dna_rna", "protein"):
            return cfg.train_bio
        if top_key.endswith("_projector"):
            return cfg.train_mlp
        if top_key == "text":
            return cfg.train_llm and cfg.lora is None
        if top_key == "lora":
            return True
        return True

    return {
        k: jax.tree.map(lambda _: mask_for(k), v)
        for k, v in params.items()
    }


def make_schedule(cfg: TrainConfig) -> optax.Schedule:
    warmup = max(int(cfg.total_steps * cfg.warmup_ratio), 0)
    peak, floor = cfg.learning_rate, cfg.learning_rate * cfg.min_lr_ratio
    if cfg.schedule == "constant":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, peak, warmup),
             optax.constant_schedule(peak)], [warmup])
    if cfg.schedule == "linear":
        decay = optax.linear_schedule(peak, floor,
                                      max(cfg.total_steps - warmup, 1))
    else:
        decay = optax.cosine_decay_schedule(
            peak, max(cfg.total_steps - warmup, 1),
            alpha=cfg.min_lr_ratio)
    return optax.join_schedules(
        [optax.linear_schedule(0.0, peak, warmup), decay], [warmup])


def make_optimizer(params: Dict[str, Any], cfg: TrainConfig
                   ) -> optax.GradientTransformation:
    mask = trainable_mask(params, cfg)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip) if cfg.grad_clip
        else optax.identity(),
        optax.scale_by_adam(b1=cfg.b1, b2=cfg.b2, eps=cfg.eps),
        optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay
        else optax.identity(),
        optax.scale_by_learning_rate(make_schedule(cfg)),
    )
    # frozen leaves get zero updates (optax.masked would pass raw grads
    # through for them — wrong for freezing)
    labels = jax.tree.map(lambda t: "train" if t else "freeze", mask)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels)


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: Dict[str, Any]
    opt_state: Any
    step: jnp.ndarray


def host_opt_shardings(state: TrainState):
    """Per-leaf shardings pinning the optimizer state to host memory."""
    return jax.tree.map(
        lambda x: x.sharding.with_memory_kind("pinned_host"),
        state.opt_state)


def offload_opt_state(state: TrainState) -> TrainState:
    """Move the Adam moments to pinned host memory — the TPU-native
    analogue of DeepSpeed's optimizer CPU offload
    (/root/reference/src/configs/ds_z2_offload_config.json): optimizer
    state stops occupying HBM (2x trainable params in f32), at the cost
    of a host<->device transfer per step. Call once after
    init_train_state / checkpoint restore (placement happens outside
    jit); pair with make_offloaded_step so each step RETURNS the state
    to host memory instead of letting it migrate back to HBM."""
    return TrainState(params=state.params,
                      opt_state=jax.device_put(state.opt_state,
                                               host_opt_shardings(state)),
                      step=state.step)


def make_offloaded_step(step_fn, state0: TrainState):
    """Wrap a train step so the optimizer state lives in pinned host
    memory between steps: the incoming moments transfer to device for
    the update math and the fresh moments transfer back (device_put
    inside jit emits the XLA device-placement annotations; the avals
    carry the memory space, so the compiler schedules the copies)."""
    host = host_opt_shardings(state0)
    dev = jax.tree.map(lambda s: s.with_memory_kind("device"), host)

    def wrapped(state, batch, rng):
        opt_dev = jax.tree.map(jax.device_put, state.opt_state, dev)
        new_state, metrics = step_fn(
            TrainState(params=state.params, opt_state=opt_dev,
                       step=state.step), batch, rng)
        opt = jax.tree.map(jax.device_put, new_state.opt_state, host)
        return TrainState(params=new_state.params, opt_state=opt,
                          step=new_state.step), metrics

    return wrapped


def init_train_state(params: Dict[str, Any], cfg: TrainConfig) -> TrainState:
    tx = make_optimizer(params, cfg)
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def _split_accum(batch: Dict[str, jnp.ndarray], accum: int):
    """[B, ...] -> [A, B/A, ...] for the microbatch scan."""
    def r(x):
        return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])
    return jax.tree.map(r, batch)


def make_train_step(model_cfg: FusionConfig, train_cfg: TrainConfig):
    """Returns a jittable (state, batch, rng) -> (state, metrics) function.

    The loss is differentiated ONLY wrt the trainable leaves
    (trainable_mask): frozen subtrees are closed over as constants, so
    their backward passes never exist in the HLO at all — with frozen
    encoders the entire encoder backward disappears, and under LoRA the
    base-weight grad matmuls do. (The previous design differentiated all
    params and relied on DCE, but the grad-norm reduction consumed every
    leaf, keeping the frozen backward alive.) The grad-accum carry also
    shrinks to trainable leaves only — under LoRA that is the difference
    between carrying adapter-sized and model-sized buffers per microstep.
    """
    tx = None  # built lazily so init and step share one optimizer

    def get_tx(params):
        nonlocal tx
        if tx is None:
            tx = make_optimizer(params, train_cfg)
        return tx

    lora_cfg = train_cfg.lora

    if train_cfg.pp_micro:
        assert lora_cfg is None, "LoRA + pipeline parallelism unsupported"

        def loss_fn(params, batch, rng):
            from ..parallel.pipeline import pp_loss_fn
            return pp_loss_fn(params, model_cfg, batch,
                              n_micro=train_cfg.pp_micro,
                              z_loss=train_cfg.z_loss)
    else:
        def loss_fn(params, batch, rng):
            from jax.sharding import PartitionSpec as P

            from ..models import qwen3
            from ..parallel.sharding import DATA_AXIS, FSDP_AXIS, SEQ_AXIS
            text_cfg, positions, pre_shifted = model_cfg.text, None, False
            wsc = jax.lax.with_sharding_constraint
            baxes = (DATA_AXIS, FSDP_AXIS)
            mesh = jax.sharding.get_abstract_mesh()
            axes = dict(mesh.shape) if mesh is not None else {}
            on_mesh = DATA_AXIS in axes and FSDP_AXIS in axes
            n_seq = axes.get(SEQ_AXIS, 1) if text_cfg.context_parallel else 1
            if on_mesh:
                # Pin the embedding stream BATCH-sharded before injection.
                # Without the constraint, GSPMD propagation can pick a
                # hidden-sharded layout (from the [V, H@fsdp] embed table)
                # for the inject scatter/gather, and — since the scatter
                # rows are data-dependent — realize the transition by
                # involuntary full rematerialization (replicate +
                # re-partition; silent perf bug on a real slice,
                # MULTICHIP_r04 rc=1 and the EP-leg sibling). Under
                # context parallelism this additionally keeps injection
                # seq-REPLICATED: one explicit all-gather in, one free
                # re-slice out.
                embeds = fusion.build_inputs_embeds(
                    params, model_cfg, batch,
                    hidden_spec=P(baxes, None, None))
                mask = batch.get("attention_mask")
                if n_seq > 1:
                    if mask is not None:
                        mask = wsc(mask, P(baxes, None))
                    batch = {**batch,
                             "labels": wsc(batch["labels"], P(baxes, None))}
            else:
                embeds = fusion.build_inputs_embeds(params, model_cfg, batch)
                mask = batch.get("attention_mask")
            if (n_seq > 1 and text_cfg.context_parallel_zigzag):
                # end-to-end zigzag: permute the stream ONCE (embeddings,
                # mask, RoPE positions, pre-shifted labels) instead of
                # q/k/v/out once per layer — every op between attentions
                # is position-independent, attention causality tracks
                # per-token position vectors, and the token-summed loss
                # is permutation-invariant once labels ride along.
                import dataclasses

                from ..parallel.ring_attention import zigzag_order
                B, S, _ = embeds.shape
                order = zigzag_order(S, n_seq)
                if mask is None:
                    positions = jnp.broadcast_to(
                        jnp.arange(S)[None], (B, S))
                else:
                    positions = jnp.maximum(
                        jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1,
                        0)
                lbl = batch["labels"]  # align BEFORE permuting
                lbl = jnp.concatenate(
                    [lbl[:, 1:],
                     jnp.full((B, 1), fusion.LABEL_IGNORE, lbl.dtype)],
                    axis=1)
                embeds = jnp.take(embeds, order, axis=1)
                positions = jnp.take(positions, order, axis=1)
                if mask is not None:
                    mask = jnp.take(mask, order, axis=1)
                batch = {**batch, "labels": jnp.take(lbl, order, axis=1)}
                text_cfg = dataclasses.replace(
                    text_cfg, context_parallel_prepermuted=True)
                pre_shifted = True
            if n_seq > 1:
                # hand the decoder a cleanly seq-sharded stream (the
                # replicated->sharded transition is a local slice)
                embeds = wsc(embeds, P(baxes, SEQ_AXIS, None))
                if mask is not None:
                    mask = wsc(mask, P(baxes, SEQ_AXIS))
                if positions is not None:
                    positions = wsc(positions, P(baxes, SEQ_AXIS))
                batch = {**batch,
                         "labels": wsc(batch["labels"], P(baxes, SEQ_AXIS))}
            hidden, aux_out = qwen3.forward_hidden(
                params["text"], text_cfg, inputs_embeds=embeds,
                attention_mask=mask, positions=positions,
                lora=params.get("lora"),
                lora_scale=lora_cfg.scale if lora_cfg else 1.0,
                lora_dropout=lora_cfg.dropout if lora_cfg else 0.0,
                dropout_rng=rng if (lora_cfg and lora_cfg.dropout > 0)
                else None)
            loss, metrics = fusion.loss_from_hidden(
                params, model_cfg, hidden, batch, z_loss=train_cfg.z_loss,
                fused_lce=train_cfg.fused_lce, pre_shifted=pre_shifted,
                chunk_size=train_cfg.lce_chunk,
                # frozen head (LoRA or --train-llm false): the lm-head /
                # tied-embed weight gradient is dead — skip its matmul
                lce_need_dw=(train_cfg.lora is None and train_cfg.train_llm))
            if text_cfg.num_experts and aux_out is not None:
                # MoE router load-balance aux loss (ops.moe); z-loss for
                # the router rides the same coefficient family as the HF
                # Qwen3-MoE config (router_aux_loss_coef)
                lb = aux_out["moe_aux"]["load_balance"]
                loss = loss + text_cfg.router_aux_coef * lb
                metrics = {**metrics, "moe_load_balance": lb}
                if "ep_dropped_frac" in aux_out["moe_aux"]:
                    metrics["moe_ep_dropped_frac"] = (
                        aux_out["moe_aux"]["ep_dropped_frac"])
            return loss, metrics

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, Any]]:
        accum = train_cfg.accum_steps
        # static partition: trainable leaves become the differentiated
        # argument; frozen leaves are closed over (constants to autodiff)
        mask_flat = jax.tree.leaves(trainable_mask(state.params, train_cfg))
        flat, treedef = jax.tree.flatten(state.params)
        t_idx = tuple(i for i, m in enumerate(mask_flat) if m)
        train_leaves = [flat[i] for i in t_idx]

        def loss_train(tl, mb, r):
            full = list(flat)
            for j, i in enumerate(t_idx):
                full[i] = tl[j]
            return loss_fn(jax.tree.unflatten(treedef, full), mb, r)

        grad_fn = jax.value_and_grad(loss_train, has_aux=True)

        if accum > 1:
            micro = _split_accum(batch, accum)

            def micro_step(carry, mb):
                g_acc, m_acc, i = carry
                (_, metrics), grads = grad_fn(
                    train_leaves, mb, jax.random.fold_in(rng, i))
                g_acc = jax.tree.map(jnp.add, g_acc, grads)
                m_acc = jax.tree.map(jnp.add, m_acc, metrics)
                return (g_acc, m_acc, i + 1), None

            zero_g = jax.tree.map(jnp.zeros_like, train_leaves)
            zero_m = {
                "loss": jnp.zeros(()), "tokens": jnp.zeros((), jnp.int32)}
            if model_cfg.text.num_experts and not train_cfg.pp_micro:
                zero_m["moe_load_balance"] = jnp.zeros(())
                if model_cfg.text.expert_parallel:
                    zero_m["moe_ep_dropped_frac"] = jnp.zeros(())
            if "task_label" in batch:
                from ..data.omics_dataset import NUM_DOMAIN_TASKS
                zero_m["domain_loss_sum"] = jnp.zeros(NUM_DOMAIN_TASKS + 1)
                zero_m["domain_loss_count"] = jnp.zeros(NUM_DOMAIN_TASKS + 1)
            (grads, metrics, _), _ = jax.lax.scan(
                micro_step, (zero_g, zero_m, 0), micro)
            grads = jax.tree.map(lambda g: g / accum, grads)
            metrics = {**metrics, "loss": metrics["loss"] / accum}
            for mk in ("moe_load_balance", "moe_ep_dropped_frac"):
                if mk in metrics:
                    metrics[mk] = metrics[mk] / accum
        else:
            (_, metrics), grads = grad_fn(train_leaves, batch, rng)

        # grad norm over the params being optimized (frozen grads are
        # identically zero and excluded — also what the clip inside the
        # optimizer sees)
        gnorm = optax.global_norm(grads)
        full_g = [None] * len(flat)
        it = iter(grads)
        for i, leaf in enumerate(flat):
            full_g[i] = next(it) if i in t_idx else jnp.zeros_like(leaf)
        grads_full = jax.tree.unflatten(treedef, full_g)
        updates, opt_state = get_tx(state.params).update(
            grads_full, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # NaN/Inf guard (HF Trainer keeps non-finite-loss filtering,
        # domain_loss.py:655-661): skip the update, keep the old state
        ok = jnp.isfinite(metrics["loss"]) & jnp.isfinite(gnorm)
        params = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), params, state.params)
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old) if hasattr(
                new, "dtype") else new,
            opt_state, state.opt_state)
        metrics = {**metrics, "grad_norm": gnorm, "skipped": ~ok,
                   "learning_rate": make_schedule(train_cfg)(state.step)}
        return TrainState(params=params, opt_state=opt_state,
                          step=state.step + 1), metrics

    return train_step


def attach_lora(params: Dict[str, Any], model_cfg: FusionConfig,
                lora_cfg: LoraConfig, key: jax.Array,
                dtype=jnp.float32) -> Dict[str, Any]:
    """Add a fresh adapter tree to a fusion param tree (LoRA regime)."""
    return {**params,
            "lora": lora_lib.init_lora(model_cfg.text, lora_cfg, key, dtype)}
