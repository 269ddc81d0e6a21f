"""Mixture-of-experts (ops.moe + Qwen3-MoE model family + EP sharding).

Beyond the reference (dense Qwen3 only — SURVEY.md §2.4 lists EP as
absent); the model family itself follows HF Qwen3MoeForCausalLM
semantics (router softmax -> top-k -> normalized combine).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from molly_tpu.models import qwen3, tiny_moe, tiny_qwen3
from molly_tpu.ops.moe import moe_mlp, moe_mlp_reference


def _mlp_weights(key, E=4, H=16, I=32, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "router": 0.5 * jax.random.normal(ks[0], (H, E), jnp.float32),
        "gate": 0.2 * jax.random.normal(ks[1], (E, H, I), dtype),
        "up": 0.2 * jax.random.normal(ks[2], (E, H, I), dtype),
        "down": 0.2 * jax.random.normal(ks[3], (E, I, H), dtype),
    }


def test_moe_mlp_matches_dense_reference():
    """Sort+ragged_dot dispatch == naive every-expert-masked-combine."""
    w = _mlp_weights(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (24, 16), jnp.float32)
    out, aux = moe_mlp(x, w["router"], w["gate"], w["up"], w["down"],
                       num_experts_per_tok=2)
    ref = moe_mlp_reference(x, w["router"], w["gate"], w["up"], w["down"],
                            num_experts_per_tok=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert np.isfinite(float(aux["load_balance"]))
    assert np.isfinite(float(aux["router_z"]))


def test_moe_single_expert_equals_dense_swiglu():
    """E=1, k=1 degenerates to the plain dense SwiGLU MLP."""
    w = _mlp_weights(jax.random.key(2), E=1)
    x = jax.random.normal(jax.random.key(3), (8, 16), jnp.float32)
    out, _ = moe_mlp(x, w["router"], w["gate"], w["up"], w["down"],
                     num_experts_per_tok=1)
    dense = (jax.nn.silu(x @ w["gate"][0]) * (x @ w["up"][0])) @ w["down"][0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_moe_gmm_backend_matches_ragged():
    """Pallas megablox grouped-matmul backend (interpret mode off-TPU)
    reproduces the ragged_dot backend — values AND grads."""
    from molly_tpu.ops.moe import set_moe_gemm_impl

    # MXU-friendly dims (the gmm kernel tiles at 128)
    w = _mlp_weights(jax.random.key(8), E=2, H=128, I=128)
    x = jax.random.normal(jax.random.key(9), (64, 128), jnp.float32)

    def loss(w, x):
        out, _ = moe_mlp(x, w["router"], w["gate"], w["up"], w["down"],
                         num_experts_per_tok=2)
        return jnp.sum(out ** 2)

    ref_l, ref_g = jax.value_and_grad(loss)(w, x)
    set_moe_gemm_impl("gmm")
    try:
        gmm_l, gmm_g = jax.value_and_grad(loss)(w, x)
    finally:
        set_moe_gemm_impl("ragged")
    np.testing.assert_allclose(float(gmm_l), float(ref_l), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
        ref_g, gmm_g)


def test_moe_grads_flow_to_experts_and_router():
    w = _mlp_weights(jax.random.key(4))
    x = jax.random.normal(jax.random.key(5), (24, 16), jnp.float32)

    def loss(w):
        out, aux = moe_mlp(x, w["router"], w["gate"], w["up"], w["down"],
                           num_experts_per_tok=2)
        return jnp.sum(out ** 2) + 0.01 * aux["load_balance"]

    g = jax.grad(loss)(w)
    for name in ("router", "gate", "up", "down"):
        arr = np.asarray(g[name])
        assert np.all(np.isfinite(arr)), name
        assert np.abs(arr).sum() > 0, name


def test_moe_load_balance_uniform_vs_collapsed():
    """Switch LB loss == 1 at perfect balance, >1 when routing collapses."""
    E, H, T = 4, 16, 64
    x = jax.random.normal(jax.random.key(6), (T, H))
    w = _mlp_weights(jax.random.key(7), E=E)
    uniform = jnp.zeros((H, E))  # equal logits -> ties -> balanced-ish
    _, aux_u = moe_mlp(x, uniform, w["gate"], w["up"], w["down"],
                       num_experts_per_tok=2)
    collapsed = jnp.zeros((H, E)).at[:, 0].set(10.0)  # everyone -> e0
    xc = jnp.abs(x) + 0.1  # positive inputs => logit_0 >> 0 on every token
    _, aux_c = moe_mlp(xc, collapsed, w["gate"], w["up"], w["down"],
                       num_experts_per_tok=1)
    assert float(aux_u["load_balance"]) == pytest.approx(1.0, abs=0.05)
    assert float(aux_c["load_balance"]) > 2.0


def test_moe_decoder_forward_and_cache_decode_consistent():
    """Qwen3-MoE decode with KV cache matches the no-cache forward."""
    cfg = tiny_moe()
    params = qwen3.init_params(cfg, jax.random.key(0))
    assert "router" in params["layers"]
    B, S = 2, 10
    ids = jax.random.randint(jax.random.key(1), (B, S), 0, cfg.vocab_size)
    logits_full = qwen3.forward_logits(params, cfg, input_ids=ids)

    cache = qwen3.init_cache(cfg, B, S)
    hidden, cache = qwen3.forward_hidden(params, cfg, input_ids=ids[:, :-1],
                                         cache=cache, cache_index=0)
    hidden, _ = qwen3.forward_hidden(params, cfg, input_ids=ids[:, -1:],
                                     cache=cache, cache_index=S - 1)
    last = qwen3.logits_from_hidden(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(last[:, 0]),
                               np.asarray(logits_full[:, -1]),
                               rtol=2e-4, atol=2e-4)


def test_moe_aux_returned_no_cache():
    cfg = tiny_moe()
    params = qwen3.init_params(cfg, jax.random.key(0))
    ids = jnp.ones((2, 8), jnp.int32)
    hidden, aux = qwen3.forward_hidden(params, cfg, input_ids=ids)
    assert set(aux["moe_aux"]) == {"load_balance", "router_z"}
    assert aux["moe_aux"]["load_balance"].shape == ()
    # dense model still returns None
    dcfg = tiny_qwen3()
    dparams = qwen3.init_params(dcfg, jax.random.key(1))
    _, none = qwen3.forward_hidden(dparams, dcfg, input_ids=ids)
    assert none is None


def test_moe_train_step_decreases_loss():
    """Full fusion train step on a MoE text model learns on a fixed batch
    and reports the load-balance metric."""
    from molly_tpu.models import fusion, tiny_esm
    from molly_tpu.models.fusion import FusionConfig
    from molly_tpu.training import (TrainConfig, init_train_state,
                                    make_train_step)

    cfg = FusionConfig(text=tiny_moe(), dna_rna=tiny_esm(),
                       protein=tiny_esm(), dna_rna_k_tokens=4,
                       protein_k_tokens=4)
    params = fusion.init_params(cfg, jax.random.key(0))
    tc = TrainConfig(learning_rate=3e-3, total_steps=30, warmup_ratio=0.0,
                     train_bio=False, train_mlp=True, train_llm=True,
                     accum_steps=2)
    state = init_train_state(params, tc)
    step = jax.jit(make_train_step(cfg, tc))
    B, S = 4, 16
    rng = np.random.default_rng(0)
    labels = np.full((B, S), -100, np.int32)
    labels[:, S // 2:] = rng.integers(1, cfg.text.vocab_size, (B, S // 2))
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(0, cfg.text.vocab_size, (B, S)), jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(labels),
        "dna_rna_tokens": jnp.full((B, 1, 4), 3, jnp.int32),
        "dna_rna_pos": jnp.asarray([[1]] * B, jnp.int32),
        "protein_tokens": jnp.full((B, 1, 4), 1, jnp.int32),
        "protein_pos": jnp.full((B, 1), -1, jnp.int32),
        "task_label": jnp.zeros((B,), jnp.int32),
    }
    losses = []
    for i in range(8):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
        assert np.isfinite(float(m["moe_load_balance"]))
    assert losses[-1] < losses[0], losses


def test_moe_ep_sharded_matches_unsharded():
    """Expert-parallel GSPMD run (expert axis) reproduces the single-
    device loss+grads."""
    from molly_tpu.parallel import make_mesh, param_specs, shard_params

    cfg = dataclasses.replace(tiny_moe(), dtype="float32")
    params = qwen3.init_params(cfg, jax.random.key(0))
    ids = jax.random.randint(jax.random.key(1), (4, 16), 0, cfg.vocab_size)
    labels = jax.random.randint(jax.random.key(2), (4, 16), 0,
                                cfg.vocab_size)

    def loss_fn(p):
        logits = qwen3.forward_logits(p, cfg, input_ids=ids)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lp[:, :-1], labels[:, 1:, None],
                                   axis=-1)
        return jnp.mean(nll)

    base_loss, base_grads = jax.value_and_grad(loss_fn)(params)

    mesh = make_mesh(data=2, fsdp=2, expert=2)
    with jax.sharding.set_mesh(mesh):
        sp = shard_params({"text": params}, mesh)["text"]
        espec = param_specs({"text": params})["text"]
        ep_names = [
            p for p, s in jax.tree_util.tree_flatten_with_path(espec)[0]
            if "expert" in str(s)]
        assert ep_names, "expert weights must carry the expert axis"
        sh_loss, sh_grads = jax.jit(jax.value_and_grad(loss_fn))(sp)
    np.testing.assert_allclose(float(sh_loss), float(base_loss),
                               rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5),
        base_grads, jax.device_get(sh_grads))


def test_moe_expert_sharded_matches_dropless():
    """shard_map EP path (weights local, capacity buffer, one psum) ==
    the dropless single-device path when capacity covers every row —
    values AND grads, under a mesh with an expert axis."""
    from molly_tpu.ops.moe import moe_mlp_expert_sharded
    from molly_tpu.parallel import make_mesh

    w = _mlp_weights(jax.random.key(10), E=4, H=16, I=32)
    x = jax.random.normal(jax.random.key(11), (32, 16), jnp.float32)

    def loss_ref(w):
        out, aux = moe_mlp(x, w["router"], w["gate"], w["up"], w["down"],
                           num_experts_per_tok=2)
        return jnp.sum(out ** 2) + aux["load_balance"]

    ref_l, ref_g = jax.value_and_grad(loss_ref)(w)

    def loss_ep(w):
        out, aux = moe_mlp_expert_sharded(
            x, w["router"], w["gate"], w["up"], w["down"],
            num_experts_per_tok=2, capacity_factor=4.0)  # no drops
        return jnp.sum(out ** 2) + aux["load_balance"]

    mesh = make_mesh(data=1, fsdp=4, expert=2)
    with jax.sharding.set_mesh(mesh):
        ep_l, ep_g = jax.jit(jax.value_and_grad(loss_ep))(w)
    np.testing.assert_allclose(float(ep_l), float(ref_l), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5),
        ref_g, jax.device_get(ep_g))


def test_moe_expert_sharded_capacity_drops_are_bounded():
    """Tiny capacity drops overflow rows but stays finite and close:
    the kept contributions are exact, so the output error is bounded by
    the dropped routing mass."""
    from molly_tpu.ops.moe import moe_mlp_expert_sharded
    from molly_tpu.parallel import make_mesh

    w = _mlp_weights(jax.random.key(12), E=4, H=16, I=32)
    x = jax.random.normal(jax.random.key(13), (32, 16), jnp.float32)
    ref, _ = moe_mlp(x, w["router"], w["gate"], w["up"], w["down"],
                     num_experts_per_tok=2)
    mesh = make_mesh(data=1, fsdp=4, expert=2)
    with jax.sharding.set_mesh(mesh):
        out, _ = jax.jit(lambda: moe_mlp_expert_sharded(
            x, w["router"], w["gate"], w["up"], w["down"],
            num_experts_per_tok=2, capacity_factor=0.5))()
    out = np.asarray(out)
    assert np.all(np.isfinite(out))
    # every kept row matches; total deviation bounded by dropped mass
    assert np.abs(out - np.asarray(ref)).max() < np.abs(ref).max() + 1.0


def test_moe_ep_train_step_on_mesh():
    """Full fusion train step with expert_parallel=True on a mesh with
    an expert axis: runs, learns, reports load balance."""
    import dataclasses as dc

    from molly_tpu.models import fusion, tiny_esm
    from molly_tpu.models.fusion import FusionConfig
    from molly_tpu.parallel import make_mesh, shard_batch, shard_params
    from molly_tpu.training import (TrainConfig, init_train_state,
                                    make_train_step)

    cfg = FusionConfig(
        text=dc.replace(tiny_moe(), expert_parallel=True),
        dna_rna=tiny_esm(), protein=tiny_esm(),
        dna_rna_k_tokens=4, protein_k_tokens=4)
    params = fusion.init_params(cfg, jax.random.key(0))
    tc = TrainConfig(learning_rate=3e-3, total_steps=10, warmup_ratio=0.0,
                     train_bio=False, train_mlp=True, train_llm=True)
    B, S = 4, 16
    rng = np.random.default_rng(1)
    labels = np.full((B, S), -100, np.int32)
    labels[:, S // 2:] = rng.integers(1, cfg.text.vocab_size, (B, S // 2))
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(0, cfg.text.vocab_size, (B, S)), jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(labels),
        "dna_rna_tokens": jnp.full((B, 1, 4), 3, jnp.int32),
        "dna_rna_pos": jnp.asarray([[1]] * B, jnp.int32),
        "protein_tokens": jnp.full((B, 1, 4), 1, jnp.int32),
        "protein_pos": jnp.full((B, 1), -1, jnp.int32),
        "task_label": jnp.zeros((B,), jnp.int32),
    }
    mesh = make_mesh(data=1, fsdp=4, expert=2)
    with jax.sharding.set_mesh(mesh):
        sp = shard_params(params, mesh)
        sb = shard_batch(batch, mesh)
        state = init_train_state(sp, tc)
        step = jax.jit(make_train_step(cfg, tc))
        losses = []
        for i in range(4):
            state, m = step(state, sb, jax.random.key(i))
            losses.append(float(m["loss"]))
            assert np.isfinite(float(m["moe_load_balance"]))
    assert losses[-1] < losses[0], losses


def test_moe_serving_engine_greedy_parity():
    """The continuous-batching engine serves a MoE decoder: greedy
    outputs match the batch engine on the same padded bucket (the decode
    path runs the sparse FFN with per-row cache indices)."""
    from molly_tpu.inference.engine import GenerationConfig, generate
    from molly_tpu.inference.server import (Request, ServingEngine,
                                            _pad_to_bucket)
    from molly_tpu.models import fusion, tiny_esm
    from molly_tpu.models.fusion import FusionConfig

    cfg = FusionConfig(
        text=tiny_moe(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=8),
        dna_rna=tiny_esm(vocab_size=16), protein=tiny_esm(vocab_size=20),
        dna_rna_k_tokens=4, protein_k_tokens=4)
    params = fusion.init_params(cfg, jax.random.key(0))
    gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    rng = np.random.default_rng(0)
    reqs = [Request(uid=i, batch={
        "input_ids": rng.integers(1, 64, (1, s)).astype(np.int32),
        "attention_mask": np.ones((1, s), np.int32),
    }) for i, s in enumerate([5, 12])]
    eng = ServingEngine(params, cfg, gen, n_slots=2, max_len=48,
                        prefill_buckets=(16,))
    results = eng.run(list(reqs))
    for req in reqs:
        padded = _pad_to_bucket(req.batch, 16, gen.pad_token_id)
        jb = {k: jnp.asarray(v) for k, v in padded.items()}
        ref = np.asarray(generate(params, cfg, jb, gen,
                                  jax.random.key(0)))[0]
        np.testing.assert_array_equal(results[req.uid], ref)


def test_moe_hf_import_export_roundtrip():
    """hf_export(state) -> qwen3_from_hf reproduces the param tree."""
    from molly_tpu.models.hf_export import qwen3_to_hf_state
    from molly_tpu.models.hf_import import qwen3_from_hf

    cfg = dataclasses.replace(tiny_moe(), tie_word_embeddings=False)
    params = qwen3.init_params(cfg, jax.random.key(0))
    state = qwen3_to_hf_state(params, cfg)
    assert "model.layers.0.mlp.gate.weight" in state
    assert "model.layers.0.mlp.experts.3.down_proj.weight" in state
    back = qwen3_from_hf(state, cfg, dtype="float32")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6),
        params, back)


def test_moe_int8_experts_matches_explicit_dequant():
    """Quantized grouped dot (scale applied to the fp32 product rows via
    the row->expert map) == moe_mlp on explicitly dequantized weights —
    the per-out-column scale factors out of the contraction exactly."""
    from molly_tpu.ops.moe import quantize_experts

    w = _mlp_weights(jax.random.key(20), E=4, H=16, I=32)
    x = jax.random.normal(jax.random.key(21), (24, 16), jnp.float32)
    q = {name: quantize_experts(w[name]) for name in ("gate", "up", "down")}
    out_q, aux_q = moe_mlp(x, w["router"], q["gate"], q["up"], q["down"],
                           num_experts_per_tok=2)
    deq = {name: (q[name]["w_q"].astype(jnp.float32)
                  * q[name]["scale"][:, None, :]) for name in q}
    out_d, aux_d = moe_mlp(x, w["router"], deq["gate"], deq["up"],
                           deq["down"], num_experts_per_tok=2)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_d),
                               rtol=1e-5, atol=1e-6)
    # routing is quantization-independent (router stays fp32)
    np.testing.assert_allclose(float(aux_q["load_balance"]),
                               float(aux_d["load_balance"]), rtol=1e-6)


def test_moe_int8_experts_quality():
    """Per-channel int8 expert noise stays small vs the fp32 experts."""
    from molly_tpu.ops.moe import quantize_experts

    w = _mlp_weights(jax.random.key(22), E=4, H=16, I=32)
    x = jax.random.normal(jax.random.key(23), (32, 16), jnp.float32)
    ref, _ = moe_mlp(x, w["router"], w["gate"], w["up"], w["down"],
                     num_experts_per_tok=2)
    q = {name: quantize_experts(w[name]) for name in ("gate", "up", "down")}
    got, _ = moe_mlp(x, w["router"], q["gate"], q["up"], q["down"],
                     num_experts_per_tok=2)
    ref, got = np.asarray(ref), np.asarray(got)
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.05, rel


def test_moe_expert_sharded_int8_matches_dropless_int8():
    """EP shard_map path accepts quantized expert stacks (both leaves
    shard over the expert axis) and matches the dropless quantized path."""
    from molly_tpu.ops.moe import moe_mlp_expert_sharded, quantize_experts
    from molly_tpu.parallel import make_mesh

    w = _mlp_weights(jax.random.key(24), E=4, H=16, I=32)
    x = jax.random.normal(jax.random.key(25), (32, 16), jnp.float32)
    q = {name: quantize_experts(w[name]) for name in ("gate", "up", "down")}
    ref, _ = moe_mlp(x, w["router"], q["gate"], q["up"], q["down"],
                     num_experts_per_tok=2)
    mesh = make_mesh(data=1, fsdp=4, expert=2)
    with jax.sharding.set_mesh(mesh):
        got, aux = jax.jit(lambda x: moe_mlp_expert_sharded(
            x, w["router"], q["gate"], q["up"], q["down"],
            num_experts_per_tok=2, capacity_factor=4.0))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert float(aux["ep_dropped_frac"]) == 0.0


def test_moe_decode_int8_experts_cache_consistent():
    """quantize_for_decode(moe_experts=True) quantizes the expert stacks
    and the cached decode still matches the no-cache forward exactly."""
    cfg = tiny_moe()
    params = qwen3.init_params(cfg, jax.random.key(0))
    qp = qwen3.quantize_for_decode(params, cfg, moe_experts=True)
    # gate/up are fused for decode ([L, E, H, 2I]) and quantized
    assert "w_q" in qp["layers"]["expert_gateup"]
    assert qp["layers"]["expert_gateup"]["w_q"].dtype == jnp.int8
    assert qp["layers"]["expert_gateup"]["w_q"].shape[-1] == \
        2 * cfg.intermediate_size
    # stacked dims survive: [L, E, K, N] / [L, E, N]
    assert qp["layers"]["expert_down"]["w_q"].ndim == 4
    assert qp["layers"]["expert_down"]["scale"].ndim == 3

    B, S = 2, 10
    ids = jax.random.randint(jax.random.key(1), (B, S), 0, cfg.vocab_size)
    logits_full = qwen3.forward_logits(qp, cfg, input_ids=ids)
    cache = qwen3.init_cache(cfg, B, S)
    hidden, cache = qwen3.forward_hidden(qp, cfg, input_ids=ids[:, :-1],
                                         cache=cache, cache_index=0)
    hidden, _ = qwen3.forward_hidden(qp, cfg, input_ids=ids[:, -1:],
                                     cache=cache, cache_index=S - 1)
    last = qwen3.logits_from_hidden(qp, cfg, hidden)
    np.testing.assert_allclose(np.asarray(last[:, 0]),
                               np.asarray(logits_full[:, -1]),
                               rtol=2e-4, atol=2e-4)


def test_moe_expert_lora_matches_merged():
    """Grouped low-rank bypass inside the sparse dispatch == running the
    base moe_mlp on merge_lora-style folded expert weights."""
    w = _mlp_weights(jax.random.key(30), E=4, H=16, I=32)
    x = jax.random.normal(jax.random.key(31), (24, 16), jnp.float32)
    r, scale = 4, 1.5
    ks = jax.random.split(jax.random.key(32), 6)
    lora = {}
    for n, (d_in, d_out), ka, kb in (
            ("expert_gate", (16, 32), ks[0], ks[1]),
            ("expert_up", (16, 32), ks[2], ks[3]),
            ("expert_down", (32, 16), ks[4], ks[5])):
        lora[n] = {"a": jax.random.normal(ka, (4, d_in, r)) / r,
                   "b": 0.1 * jax.random.normal(kb, (4, r, d_out))}
    out, _ = moe_mlp(x, w["router"], w["gate"], w["up"], w["down"],
                     num_experts_per_tok=2, lora=lora, lora_scale=scale)
    merged = {
        "gate": w["gate"] + scale * jnp.einsum(
            "eir,ero->eio", lora["expert_gate"]["a"],
            lora["expert_gate"]["b"]),
        "up": w["up"] + scale * jnp.einsum(
            "eir,ero->eio", lora["expert_up"]["a"], lora["expert_up"]["b"]),
        "down": w["down"] + scale * jnp.einsum(
            "eir,ero->eio", lora["expert_down"]["a"],
            lora["expert_down"]["b"]),
    }
    ref, _ = moe_mlp(x, w["router"], merged["gate"], merged["up"],
                     merged["down"], num_experts_per_tok=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_moe_expert_lora_ep_matches_dropless():
    """EP shard_map path applies expert-sharded adapters identically."""
    from molly_tpu.ops.moe import moe_mlp_expert_sharded
    from molly_tpu.parallel import make_mesh

    w = _mlp_weights(jax.random.key(33), E=4, H=16, I=32)
    x = jax.random.normal(jax.random.key(34), (32, 16), jnp.float32)
    r = 4
    lora = {"expert_gate": {
        "a": jax.random.normal(jax.random.key(35), (4, 16, r)) / r,
        "b": 0.1 * jax.random.normal(jax.random.key(36), (4, r, 32))}}
    ref, _ = moe_mlp(x, w["router"], w["gate"], w["up"], w["down"],
                     num_experts_per_tok=2, lora=lora, lora_scale=2.0)
    mesh = make_mesh(data=1, fsdp=4, expert=2)
    with jax.sharding.set_mesh(mesh):
        got, _ = jax.jit(lambda x: moe_mlp_expert_sharded(
            x, w["router"], w["gate"], w["up"], w["down"],
            num_experts_per_tok=2, capacity_factor=4.0, lora=lora,
            lora_scale=2.0))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_moe_lora_train_step_adapts_experts():
    """LoRA fine-tune of a MoE fusion model: expert adapters exist, get
    gradient signal, and the loss decreases."""
    from molly_tpu.models import fusion, tiny_esm
    from molly_tpu.models.fusion import FusionConfig
    from molly_tpu.models.lora import LoraConfig
    from molly_tpu.training import (TrainConfig, attach_lora,
                                    init_train_state, make_train_step)

    cfg = FusionConfig(text=tiny_moe(), dna_rna=tiny_esm(),
                       protein=tiny_esm(), dna_rna_k_tokens=4,
                       protein_k_tokens=4)
    params = fusion.init_params(cfg, jax.random.key(0))
    lcfg = LoraConfig(r=4, dropout=0.0)
    params = attach_lora(params, cfg, lcfg, jax.random.key(1))
    for t in ("expert_gate", "expert_up", "expert_down"):
        assert t in params["lora"]["layers"], t
        assert params["lora"]["layers"][t]["a"].ndim == 4  # [L, E, d, r]
    tc = TrainConfig(learning_rate=1e-2, total_steps=20, warmup_ratio=0.0,
                     lora=lcfg)
    state = init_train_state(params, tc)
    step = jax.jit(make_train_step(cfg, tc))
    B, S = 4, 16
    rng = np.random.default_rng(0)
    labels = np.full((B, S), -100, np.int32)
    labels[:, S // 2:] = rng.integers(1, cfg.text.vocab_size, (B, S // 2))
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(0, cfg.text.vocab_size, (B, S)), jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(labels),
        "dna_rna_tokens": jnp.full((B, 1, 4), 3, jnp.int32),
        "dna_rna_pos": jnp.asarray([[1]] * B, jnp.int32),
        "protein_tokens": jnp.full((B, 1, 4), 1, jnp.int32),
        "protein_pos": jnp.full((B, 1), -1, jnp.int32),
        "task_label": jnp.zeros((B,), jnp.int32),
    }
    losses = []
    for i in range(8):
        state, m = step(state, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    # the adapters actually moved (b starts at zero)
    b = np.asarray(state.params["lora"]["layers"]["expert_gate"]["b"])
    assert np.abs(b).sum() > 0


def test_moe_expert_lora_merge_and_peft_import():
    """merge_lora folds expert adapters; peft_lora_from_hf stacks the
    per-expert PEFT keys into [L, E, ...] adapters."""
    from molly_tpu.models.hf_import import peft_lora_from_hf
    from molly_tpu.models.lora import LoraConfig, init_lora, merge_lora

    cfg = tiny_moe()
    params = qwen3.init_params(cfg, jax.random.key(0))
    lcfg = LoraConfig(r=4, dropout=0.0)
    lora = init_lora(cfg, lcfg, jax.random.key(1))
    # give b nonzero values so the merge is observable
    lora["layers"] = jax.tree.map(
        lambda v: v if v.ndim < 2 else v + 0.01, lora["layers"])
    merged = merge_lora(params, lora, lcfg)
    ids = jax.random.randint(jax.random.key(2), (2, 8), 0, cfg.vocab_size)
    out_l = qwen3.forward_logits(params, cfg, input_ids=ids,
                                 lora=lora, lora_scale=lcfg.scale)
    out_m = qwen3.forward_logits(merged, cfg, input_ids=ids)
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_m),
                               rtol=2e-4, atol=2e-4)

    # PEFT roundtrip: build an adapter state dict in HF Qwen3Moe naming
    L, E, r = cfg.num_hidden_layers, cfg.num_experts, lcfg.r
    H, I = cfg.hidden_size, cfg.intermediate_size
    rng = np.random.default_rng(3)
    state = {}
    pre = "base_model.model.model.layers.{i}."
    for i in range(L):
        for t, din, dout in (("q_proj", H, cfg.q_dim),):
            state[pre.format(i=i) + f"self_attn.{t}.lora_A.weight"] = \
                rng.normal(size=(r, din)).astype(np.float32)
            state[pre.format(i=i) + f"self_attn.{t}.lora_B.weight"] = \
                rng.normal(size=(dout, r)).astype(np.float32)
        for j in range(E):
            for t, din, dout in (("gate_proj", H, I), ("up_proj", H, I),
                                 ("down_proj", I, H)):
                k = pre.format(i=i) + f"mlp.experts.{j}.{t}"
                state[k + ".lora_A.weight"] = \
                    rng.normal(size=(r, din)).astype(np.float32)
                state[k + ".lora_B.weight"] = \
                    rng.normal(size=(dout, r)).astype(np.float32)
    tree = peft_lora_from_hf(state, cfg, lora_r=r)
    assert tree["layers"]["expert_up"]["a"].shape == (L, E, H, r)
    assert tree["layers"]["expert_down"]["b"].shape == (L, E, r, H)
    # spot-check one expert slice against its source key
    src = state["base_model.model.model.layers.1.mlp.experts.2."
                "gate_proj.lora_A.weight"].T
    np.testing.assert_allclose(
        np.asarray(tree["layers"]["expert_gate"]["a"][1, 2]), src,
        rtol=1e-6)


def test_moe_fused_gateup_matches_unfused():
    """w_up=None fused [E, H, 2I] stack (decode prep) == two separate
    grouped GEMMs; also through fuse_for_decode at the model level."""
    w = _mlp_weights(jax.random.key(40), E=4, H=16, I=32)
    x = jax.random.normal(jax.random.key(41), (24, 16), jnp.float32)
    ref, _ = moe_mlp(x, w["router"], w["gate"], w["up"], w["down"],
                     num_experts_per_tok=2)
    fused = jnp.concatenate([w["gate"], w["up"]], axis=-1)
    got, _ = moe_mlp(x, w["router"], fused, None, w["down"],
                     num_experts_per_tok=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)

    cfg = tiny_moe()
    params = qwen3.init_params(cfg, jax.random.key(0))
    fp = qwen3.fuse_for_decode(params, cfg)
    assert "expert_gateup" in fp["layers"]
    assert "expert_gate" not in fp["layers"]
    ids = jax.random.randint(jax.random.key(1), (2, 8), 0, cfg.vocab_size)
    ref_l = qwen3.forward_logits(params, cfg, input_ids=ids)
    got_l = qwen3.forward_logits(fp, cfg, input_ids=ids)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref_l),
                               rtol=2e-5, atol=2e-5)


def test_moe_ep_decode_with_cache_matches_unsharded():
    """Multi-chip MoE SERVING correctness: KV-cache decode with experts
    sharded over the expert axis (shard_map EP path at decode shapes)
    reproduces the unsharded no-cache forward."""
    from molly_tpu.parallel import make_mesh, shard_params

    cfg = dataclasses.replace(tiny_moe(), dtype="float32")
    params = qwen3.init_params(cfg, jax.random.key(0))
    B, S = 2, 10
    ids = jax.random.randint(jax.random.key(1), (B, S), 0, cfg.vocab_size)
    ref = qwen3.forward_logits(params, cfg, input_ids=ids)

    cfg_ep = dataclasses.replace(cfg, expert_parallel=True,
                                 ep_capacity_factor=4.0)  # no drops
    mesh = make_mesh(data=1, fsdp=4, expert=2)
    with jax.sharding.set_mesh(mesh):
        sp = shard_params({"text": params}, mesh)["text"]

        @jax.jit
        def decode_last(p):
            cache = qwen3.init_cache(cfg_ep, B, S)
            _, cache = qwen3.forward_hidden(p, cfg_ep,
                                            input_ids=ids[:, :-1],
                                            cache=cache, cache_index=0)
            hidden, _ = qwen3.forward_hidden(p, cfg_ep,
                                             input_ids=ids[:, -1:],
                                             cache=cache,
                                             cache_index=S - 1)
            return qwen3.logits_from_hidden(p, cfg_ep, hidden)

        last = decode_last(sp)
    np.testing.assert_allclose(np.asarray(last[:, 0]),
                               np.asarray(ref[:, -1]),
                               rtol=2e-4, atol=2e-4)
