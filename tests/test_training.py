"""Trainer tests: freeze regimes, LoRA, grad accumulation, checkpoints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from molly_tpu.models import fusion, qwen3, tiny_esm, tiny_qwen3
from molly_tpu.models.fusion import FusionConfig
from molly_tpu.models.lora import LoraConfig, merge_lora
from molly_tpu.training import (
    TrainConfig,
    attach_lora,
    export_adapter,
    init_train_state,
    load_adapter,
    make_train_step,
    trainable_mask,
)


@pytest.fixture(scope="module")
def setup():
    cfg = FusionConfig(
        text=tiny_qwen3(vocab_size=64, num_hidden_layers=2),
        dna_rna=tiny_esm(vocab_size=16),
        protein=tiny_esm(vocab_size=20),
        dna_rna_k_tokens=4, protein_k_tokens=4)
    params = fusion.init_params(cfg, jax.random.key(0))
    B, S = 2, 16
    rng = np.random.default_rng(0)
    labels = np.full((B, S), -100, np.int32)
    labels[:, 8:] = rng.integers(1, 64, (B, S - 8))
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 64, (B, S))),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(labels),
        "dna_rna_tokens": jnp.asarray(rng.integers(2, 16, (B, 1, 4))),
        "dna_rna_pos": jnp.asarray([[1], [-1]]),
        "protein_tokens": jnp.full((B, 1, 4), 1, jnp.int32),
        "protein_pos": jnp.asarray([[-1], [-1]]),
        "task_label": jnp.asarray([0, 19]),
    }
    return cfg, params, batch


def _changed(a, b):
    return jax.tree.reduce(
        lambda acc, t: acc or t,
        jax.tree.map(lambda x, y: bool(jnp.any(x != y)), a, b), False)


def test_trainable_mask_regimes(setup):
    cfg, params, _ = setup
    m = trainable_mask(params, TrainConfig(train_bio=False, train_mlp=True,
                                           train_llm=True))
    assert not jax.tree.reduce(lambda a, b: a or b, m["dna_rna"], False)
    assert jax.tree.reduce(lambda a, b: a and b, m["text"], True)
    assert m["dna_rna_projector"]["kernel"]

    lp = attach_lora(params, cfg, LoraConfig(r=2), jax.random.key(1))
    m2 = trainable_mask(lp, TrainConfig(lora=LoraConfig(r=2)))
    assert not jax.tree.reduce(lambda a, b: a or b, m2["text"], False)
    assert jax.tree.reduce(lambda a, b: a and b, m2["lora"], True)


def test_train_step_updates_respect_freeze(setup):
    cfg, params, batch = setup
    tc = TrainConfig(learning_rate=1e-2, total_steps=10, train_bio=False,
                     train_mlp=True, train_llm=True, warmup_ratio=0.0)
    state = init_train_state(params, tc)
    step = jax.jit(make_train_step(cfg, tc))
    state2, metrics = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    # frozen encoders unchanged; text + projectors changed
    assert not _changed(state.params["dna_rna"], state2.params["dna_rna"])
    assert not _changed(state.params["protein"], state2.params["protein"])
    assert _changed(state.params["text"], state2.params["text"])
    assert _changed(state.params["dna_rna_projector"],
                    state2.params["dna_rna_projector"])
    # loss goes down over a few steps
    losses = [float(metrics["loss"])]
    for i in range(3):
        state2, m = step(state2, batch, jax.random.key(i + 1))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_grad_accum_matches_single_batch(setup):
    cfg, params, batch = setup
    tc1 = TrainConfig(learning_rate=1e-3, total_steps=10, warmup_ratio=0.0)
    tc2 = TrainConfig(learning_rate=1e-3, total_steps=10, warmup_ratio=0.0,
                      accum_steps=2)
    s1 = init_train_state(params, tc1)
    s2 = init_train_state(params, tc2)
    st1, m1 = jax.jit(make_train_step(cfg, tc1))(s1, batch, jax.random.key(0))
    st2, m2 = jax.jit(make_train_step(cfg, tc2))(s2, batch, jax.random.key(0))
    # each microbatch here has the same token count, so means match
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(st1.params)
    l2 = jax.tree_util.tree_leaves(st2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_lora_regime_and_merge(setup):
    cfg, params, batch = setup
    lcfg = LoraConfig(r=4, dropout=0.0)
    lp = attach_lora(params, cfg, lcfg, jax.random.key(2))
    tc = TrainConfig(learning_rate=5e-3, total_steps=10, warmup_ratio=0.0,
                     lora=lcfg)
    state = init_train_state(lp, tc)
    step = jax.jit(make_train_step(cfg, tc))
    state2, metrics = step(state, batch, jax.random.key(0))
    assert not _changed(state.params["text"], state2.params["text"])
    assert _changed(state.params["lora"], state2.params["lora"])
    assert _changed(state.params["dna_rna_projector"],
                    state2.params["dna_rna_projector"])

    # merged weights reproduce base+adapter forward (B nonzero after a step)
    ids = batch["input_ids"]
    with_lora = qwen3.forward_logits(
        state2.params["text"], cfg.text, input_ids=ids,
        lora=state2.params["lora"], lora_scale=lcfg.scale)
    merged = merge_lora(state2.params["text"], state2.params["lora"], lcfg)
    with_merged = qwen3.forward_logits(merged, cfg.text, input_ids=ids)
    np.testing.assert_allclose(np.asarray(with_lora), np.asarray(with_merged),
                               atol=1e-5)


def test_adapter_export_roundtrip(tmp_path, setup):
    cfg, params, _ = setup
    lcfg = LoraConfig(r=2)
    lp = attach_lora(params, cfg, lcfg, jax.random.key(4))
    path = str(tmp_path / "adapter.npz")
    export_adapter(path, lp)
    # load onto a tree with zeroed adapters/projectors
    zeroed = dict(lp)
    zeroed["lora"] = jax.tree.map(jnp.zeros_like, lp["lora"])
    zeroed["dna_rna_projector"] = jax.tree.map(
        jnp.zeros_like, lp["dna_rna_projector"])
    restored = load_adapter(path, zeroed)
    for k in ("lora", "dna_rna_projector", "protein_projector"):
        a = jax.tree_util.tree_leaves(lp[k])
        b = jax.tree_util.tree_leaves(restored[k])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x, dtype=np.float32),
                                       np.asarray(y, dtype=np.float32))


def test_adapter_meta_records_r_and_alpha(tmp_path, setup):
    """An adapter trained with alpha != 64 must merge with ITS scale at
    inference, not the default (ADVICE round 1, medium)."""
    from molly_tpu.training.checkpoint import adapter_meta

    cfg, params, _ = setup
    lcfg = LoraConfig(r=2, alpha=17.0)
    lp = attach_lora(params, cfg, lcfg, jax.random.key(4))
    path = str(tmp_path / "adapter.npz")
    export_adapter(path, lp, lora_cfg=lcfg)
    meta = adapter_meta(path)
    assert meta == {"r": 2, "alpha": 17.0}
    # mismatched r is an export-time error, not a silent mis-merge
    with pytest.raises(ValueError, match="r="):
        export_adapter(str(tmp_path / "bad.npz"), lp,
                       lora_cfg=LoraConfig(r=8, alpha=17.0))
    # archives without meta (pre-meta exports) report None
    export_adapter(str(tmp_path / "nometa.npz"), lp)
    m2 = adapter_meta(str(tmp_path / "nometa.npz"))
    assert m2 == {"r": 2, "alpha": 64.0}


def test_orbax_checkpoint_roundtrip(tmp_path, setup):
    from molly_tpu.training import restore_train_state, save_train_state

    cfg, params, batch = setup
    tc = TrainConfig(learning_rate=1e-3, total_steps=10)
    state = init_train_state(params, tc)
    step = jax.jit(make_train_step(cfg, tc))
    state, _ = step(state, batch, jax.random.key(0))

    path = str(tmp_path / "ckpt")
    save_train_state(path, state)
    blank = init_train_state(params, tc)
    restored = restore_train_state(path, blank)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpoint_overlaps_steps(tmp_path, setup):
    """save_train_state is asynchronous (SURVEY §5.4): it must issue the
    save and return so train steps interleave with in-flight disk
    serialization; wait_for_saves() is the durability barrier. Both
    interleaved checkpoints must restore to their respective steps."""
    import orbax.checkpoint as ocp

    from molly_tpu.training import checkpoint as ckpt_lib

    cfg, params, batch = setup
    tc = TrainConfig(learning_rate=1e-3, total_steps=10)
    state = init_train_state(params, tc)
    step = jax.jit(make_train_step(cfg, tc))
    state, _ = step(state, batch, jax.random.key(0))

    # structural pin: the process-wide checkpointer is orbax's ASYNC one
    # (the old per-save `with StandardCheckpointer()` context waited on
    # __exit__, silently serializing every save)
    assert isinstance(ckpt_lib._checkpointer(), ocp.AsyncCheckpointer)

    ckpt_lib.save_train_state(str(tmp_path / "a"), state)
    state2, _ = step(state, batch, jax.random.key(1))   # runs during save
    ckpt_lib.save_train_state(str(tmp_path / "b"), state2)
    state3, _ = step(state2, batch, jax.random.key(2))
    assert int(state3.step) == 3
    ckpt_lib.wait_for_saves()

    blank = init_train_state(params, tc)
    ra = ckpt_lib.restore_train_state(str(tmp_path / "a"), blank)
    rb = ckpt_lib.restore_train_state(str(tmp_path / "b"), blank)
    assert int(ra.step) == 1 and int(rb.step) == 2
    for a, b in zip(jax.tree_util.tree_leaves(state2.params),
                    jax.tree_util.tree_leaves(rb.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_offload_opt_state_matches_default(setup):
    """Optimizer-state host offload (the ds_z2_offload analogue) must not
    change the math: same loss and same updated params as the default
    step. On backends without host memory spaces the placement annotation
    is a no-op, so this pins correctness everywhere; memory-kind
    assertions are meaningful on TPU only (placement outside jit is
    checked here)."""
    from molly_tpu.training import make_offloaded_step, offload_opt_state
    cfg, params, batch = setup
    tc = TrainConfig(train_bio=False, train_mlp=True, train_llm=True)
    s0 = init_train_state(params, tc)
    st_ref, m_ref = jax.jit(make_train_step(cfg, tc))(
        s0, batch, jax.random.key(3))

    s1 = offload_opt_state(init_train_state(params, tc))
    for leaf in jax.tree.leaves(s1.opt_state):
        assert leaf.sharding.memory_kind == "pinned_host", leaf.sharding
    step = jax.jit(make_offloaded_step(make_train_step(cfg, tc), s1))
    st_off, m_off = step(s1, batch, jax.random.key(3))
    np.testing.assert_allclose(float(m_off["loss"]), float(m_ref["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(st_ref.params),
                    jax.tree.leaves(st_off.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-7)
    # second step runs from the offloaded state (steady-state shape)
    st2, _ = step(st_off, batch, jax.random.key(4))
    assert int(st2.step) == 2


def test_qlora_int8_base_lora_training(setup):
    """QLoRA regime: int8-quantized frozen text base
    (qwen3.quantize_for_training) under bf16 adapters — the step runs,
    the loss falls, only adapters/projectors move, and the quantized
    leaves keep int8 storage. Dense and MoE variants."""
    from molly_tpu.models import tiny_moe

    cfg, params, batch = setup
    for moe in (False, True):
        if moe:
            import dataclasses
            mcfg = dataclasses.replace(
                setup[0],
                text=tiny_moe(vocab_size=64, num_hidden_layers=2))
            mparams = fusion.init_params(mcfg, jax.random.key(7))
        else:
            mcfg, mparams = cfg, params
        lcfg = LoraConfig(r=4, dropout=0.0)
        lp = attach_lora(mparams, mcfg, lcfg, jax.random.key(2))
        lp = {**lp, "text": qwen3.quantize_for_training(lp["text"],
                                                        mcfg.text)}
        assert lp["text"]["layers"][
            "expert_gate" if moe else "q_proj"]["w_q"].dtype == jnp.int8
        tc = TrainConfig(learning_rate=5e-3, total_steps=10,
                         warmup_ratio=0.0, lora=lcfg)
        state = init_train_state(lp, tc)
        step = jax.jit(make_train_step(mcfg, tc))
        losses = []
        for i in range(4):
            state, m = step(state, batch, jax.random.key(i))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], (moe, losses)
        assert not _changed(lp["text"], state.params["text"])
        assert _changed(lp["lora"], state.params["lora"])


def test_qlora_sharded_specs_cover_quantized_leaves():
    """param_specs must shard the int8 {w_q, scale} leaves (a replicated
    int8 base would forfeit the fsdp memory win)."""
    from molly_tpu.parallel import param_specs

    cfg = FusionConfig(text=tiny_qwen3(vocab_size=64, num_hidden_layers=2),
                       dna_rna=tiny_esm(vocab_size=16),
                       protein=tiny_esm(vocab_size=20),
                       dna_rna_k_tokens=4, protein_k_tokens=4)
    params = fusion.init_params(cfg, jax.random.key(0))
    params["text"] = qwen3.quantize_for_training(params["text"], cfg.text)
    specs = param_specs(params)
    sq = specs["text"]["layers"]["q_proj"]
    assert "fsdp" in str(sq["w_q"]), sq
    assert str(sq["scale"]) != "PartitionSpec()", sq


def test_qlora_merge_dequantizes_base(setup):
    """merge_lora on an int8 QLoRA base dequantizes, folds the adapters,
    and reproduces the unmerged (int8 base + bypass) forward."""
    cfg, params, batch = setup
    lcfg = LoraConfig(r=4, dropout=0.0)
    lp = attach_lora(params, cfg, lcfg, jax.random.key(3))
    lp = {**lp, "text": qwen3.quantize_for_training(lp["text"], cfg.text)}
    lora = jax.tree.map(lambda v: v + 0.01, lp["lora"])  # nonzero b
    ids = batch["input_ids"]
    merged = merge_lora(lp["text"], lora, lcfg)
    assert not isinstance(merged["layers"]["q_proj"], dict)
    got = qwen3.forward_logits(merged, cfg.text, input_ids=ids)

    # tight: merged == explicitly-dequantized base + adapters (both f32)
    deq_layers = {
        k: (v["w_q"].astype(jnp.float32) * v["scale"][..., None, :]
            if isinstance(v, dict) and "w_q" in v else v)
        for k, v in lp["text"]["layers"].items()}
    deq = {**lp["text"], "layers": deq_layers}
    ref = qwen3.forward_logits(deq, cfg.text, input_ids=ids,
                               lora=lora, lora_scale=lcfg.scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    # loose: the live int8 path computes its matmuls in bf16 (ops.quant
    # XLA fallback), so it may differ by bf16 noise only
    unmerged = qwen3.forward_logits(lp["text"], cfg.text, input_ids=ids,
                                    lora=lora, lora_scale=lcfg.scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(unmerged),
                               rtol=0.2, atol=0.05)


@pytest.mark.parametrize("policy", ["full", "dots", "attn", "hot"])
def test_remat_policies_match_no_remat(setup, policy):
    """jax.checkpoint policies (incl. the 'attn' save-flash-outputs-only
    policy) change memory, never values: loss and grads must equal the
    no-remat step bit-for-bit in f32."""
    import dataclasses

    cfg, params, batch = setup

    def loss_with(text_cfg):
        c = dataclasses.replace(cfg, text=text_cfg)
        return lambda p: fusion.loss_fn(p, c, batch)[0]

    base = dataclasses.replace(cfg.text, dtype="float32", remat=False)
    f32p = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    ref_loss, ref_grads = jax.value_and_grad(loss_with(base))(f32p)
    rm = dataclasses.replace(base, remat=True, remat_policy=policy)
    loss, grads = jax.value_and_grad(loss_with(rm))(f32p)
    assert float(loss) == pytest.approx(float(ref_loss), abs=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
        ref_grads, grads)


def test_segmented_remat_matches_no_remat(setup):
    """remat_skip_layers (first K layers unrematerialized, rest under the
    policy) changes memory/recompute only — loss and grads must match the
    no-remat step in f32."""
    import dataclasses

    cfg, params, batch = setup

    def loss_with(text_cfg):
        c = dataclasses.replace(cfg, text=text_cfg)
        return lambda p: fusion.loss_fn(p, c, batch)[0]

    base = dataclasses.replace(cfg.text, dtype="float32", remat=False)
    f32p = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    ref_loss, ref_grads = jax.value_and_grad(loss_with(base))(f32p)
    for k in (1, cfg.text.num_hidden_layers):  # partial + full skip
        seg = dataclasses.replace(base, remat=True, remat_policy="hot",
                                  remat_skip_layers=k)
        loss, grads = jax.value_and_grad(loss_with(seg))(f32p)
        assert float(loss) == pytest.approx(float(ref_loss), abs=1e-6), k
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
            ref_grads, grads)
