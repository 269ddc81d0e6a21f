"""Ring attention (context parallelism) on the 8-device virtual CPU mesh:
numeric parity vs single-device attention, gradients through the ring, and
a full seq-sharded decoder train-step check (SURVEY.md §4 test strategy;
the capability itself is beyond the reference — SURVEY.md §5.7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from molly_tpu.models import fusion, tiny_esm, tiny_qwen3
from molly_tpu.models.fusion import FusionConfig
from molly_tpu.ops.attention import _xla_attention
from molly_tpu.parallel import (
    make_mesh,
    ring_attention_sharded,
    shard_batch,
    shard_params,
)

import dataclasses


def _qkv(B=2, S=32, Nq=4, Nkv=2, D=8, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, S, Nq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, Nkv, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, Nkv, D)), jnp.float32)
    mask = np.ones((B, S), np.int32)
    mask[0, S - 5:] = 0  # right padding on row 0
    return q, k, v, jnp.asarray(mask)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full_attention(causal):
    q, k, v, mask = _qkv()
    expect = _xla_attention(q, k, v, mask=mask, causal=causal, scale=None,
                            q_offset=0)

    mesh = make_mesh(data=1, fsdp=2, tensor=1, seq=4)
    with jax.sharding.set_mesh(mesh):
        got = jax.jit(lambda q, k, v, m: ring_attention_sharded(
            q, k, v, m, causal=causal))(q, k, v, mask)
    # rows that are fully padded out produce zeros under ring attention and
    # garbage-softmax averages under the dense reference; compare only
    # unmasked query rows (padded-out queries never contribute to the loss)
    sel = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(got)[sel], np.asarray(expect)[sel],
                               rtol=2e-5, atol=2e-5)


def test_ring_grads_match(seed=1):
    q, k, v, mask = _qkv(seed=seed)
    sel = mask.astype(jnp.float32)[..., None, None]

    def loss_ref(q, k, v):
        o = _xla_attention(q, k, v, mask=mask, causal=True, scale=None,
                           q_offset=0)
        return jnp.sum(jnp.sin(o) * sel)

    def loss_ring(q, k, v):
        o = ring_attention_sharded(q, k, v, mask, causal=True)
        return jnp.sum(jnp.sin(o) * sel)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    mesh = make_mesh(data=1, fsdp=1, tensor=2, seq=4)
    with jax.sharding.set_mesh(mesh):
        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-5)


def test_seq_sharded_train_loss_matches():
    """Full fusion loss with the decoder in context-parallel mode on a
    (fsdp=2, seq=4) mesh == unsharded loss."""
    cfg = FusionConfig(
        text=tiny_qwen3(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, head_dim=8),
        dna_rna=tiny_esm(vocab_size=16),
        protein=tiny_esm(vocab_size=20),
        dna_rna_k_tokens=4, protein_k_tokens=4)
    params = fusion.init_params(cfg, jax.random.key(0))
    B, S = 4, 32  # S divisible by seq axis (4)
    rng = np.random.default_rng(1)
    labels = np.full((B, S), -100, np.int32)
    labels[:, 16:] = rng.integers(1, 64, (B, S - 16))
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 64, (B, S))),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(labels),
        "dna_rna_tokens": jnp.asarray(rng.integers(2, 16, (B, 1, 4))),
        "dna_rna_pos": jnp.asarray([[1], [2], [-1], [0]]),
        "protein_tokens": jnp.full((B, 1, 4), 1, jnp.int32),
        "protein_pos": jnp.full((B, 1), -1, jnp.int32),
    }
    expect, _ = fusion.loss_fn(params, cfg, batch)

    cp_cfg = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, context_parallel=True))
    mesh = make_mesh(data=1, fsdp=2, tensor=1, seq=4)
    with jax.sharding.set_mesh(mesh):
        sp = shard_params(params, mesh)
        sb = shard_batch(batch, mesh, seq_shard=True)
        got = jax.jit(lambda p, b: fusion.loss_fn(p, cp_cfg, b)[0])(sp, sb)
    np.testing.assert_allclose(float(got), float(expect), rtol=2e-5)


def test_seq_sharded_batch_specs():
    from molly_tpu.parallel import batch_specs
    from jax.sharding import PartitionSpec as P

    batch = {"input_ids": np.zeros((4, 8)), "labels": np.zeros((4, 8)),
             "dna_rna_tokens": np.zeros((4, 1, 4)),
             "task_label": np.zeros((4,))}
    specs = batch_specs(batch, seq_shard=True)
    assert specs["input_ids"] == P(("data", "fsdp"), "seq")
    assert specs["labels"] == P(("data", "fsdp"), "seq")
    assert specs["dna_rna_tokens"] == P(("data", "fsdp"))
    assert specs["task_label"] == P(("data", "fsdp"))


def test_train_cli_context_parallel(tmp_path):
    """Train CLI end-to-end with --mesh-seq 2 (ring attention in the
    decoder, seq-sharded batches)."""
    from test_train_cli import _toy_parquet
    from molly_tpu.training.cli import build_argparser, run_training

    train_p = str(tmp_path / "train.parquet")
    _toy_parquet(train_p, 8)
    argv = [
        "--train-dataset-path", train_p,
        "--output-dir", str(tmp_path / "run"),
        "--tiny", "--dtype", "float32",
        "--max-len", "192",
        "--dna-rna-k-tokens", "4", "--protein-k-tokens", "4",
        "--batch-size-per-gpu", "2", "--epochs", "1", "--train-iters", "2",
        "--log-interval", "1", "--lr", "1e-3",
        "--mesh-data", "1", "--mesh-fsdp", "2", "--mesh-tensor", "2",
        "--mesh-seq", "2",
    ]
    args = build_argparser().parse_args(argv)
    result = run_training(args)
    assert result["steps"] == 2
    assert 0 < result["final_loss"] < 20


def test_zigzag_order_helpers():
    from molly_tpu.parallel.ring_attention import (
        zigzag_order, zigzag_permute, zigzag_unpermute)
    order = np.asarray(zigzag_order(8, 2))  # chunks of 2: [0,1 | 6,7 | 2,3 | 4,5]
    np.testing.assert_array_equal(order, [0, 1, 6, 7, 2, 3, 4, 5])
    x = np.arange(16).reshape(2, 8)
    y = np.asarray(zigzag_permute(jnp.asarray(x), 2))
    np.testing.assert_array_equal(y[0], [0, 1, 6, 7, 2, 3, 4, 5])
    np.testing.assert_array_equal(
        np.asarray(zigzag_unpermute(jnp.asarray(y), 2)), x)


@pytest.mark.parametrize("causal", [True, False])
def test_zigzag_ring_matches_full_attention(causal):
    q, k, v, mask = _qkv()
    expect = _xla_attention(q, k, v, mask=mask, causal=causal, scale=None,
                            q_offset=0)
    mesh = make_mesh(data=1, fsdp=2, tensor=1, seq=4)
    with jax.sharding.set_mesh(mesh):
        got = jax.jit(lambda q, k, v, m: ring_attention_sharded(
            q, k, v, m, causal=causal, zigzag=True))(q, k, v, mask)
    sel = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(got)[sel], np.asarray(expect)[sel],
                               rtol=2e-5, atol=2e-5)


def test_zigzag_ring_grads_match():
    q, k, v, mask = _qkv(seed=5)
    sel = mask.astype(jnp.float32)[..., None, None]

    def loss_ref(q, k, v):
        o = _xla_attention(q, k, v, mask=mask, causal=True, scale=None,
                           q_offset=0)
        return jnp.sum(jnp.sin(o) * sel)

    def loss_ring(q, k, v):
        o = ring_attention_sharded(q, k, v, mask, causal=True, zigzag=True)
        return jnp.sum(jnp.sin(o) * sel)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    mesh = make_mesh(data=1, fsdp=2, tensor=1, seq=4)
    with jax.sharding.set_mesh(mesh):
        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-5, atol=5e-5)


def test_seq_sharded_zigzag_train_loss_matches():
    """Fusion loss with zigzag context parallelism == unsharded loss."""
    cfg = FusionConfig(
        text=tiny_qwen3(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, head_dim=8,
                        context_parallel=True,
                        context_parallel_zigzag=True),
        dna_rna=tiny_esm(vocab_size=16),
        protein=tiny_esm(vocab_size=20),
        dna_rna_k_tokens=4, protein_k_tokens=4)
    import dataclasses
    plain = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, context_parallel=False,
                                      context_parallel_zigzag=False))
    params = fusion.init_params(plain, jax.random.key(0))
    B, S = 4, 32
    rng = np.random.default_rng(4)
    labels = np.full((B, S), -100, np.int32)
    labels[:, 16:] = rng.integers(1, 64, (B, S - 16))
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 64, (B, S))),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(labels),
        "dna_rna_tokens": jnp.asarray(rng.integers(2, 16, (B, 1, 4))),
        "dna_rna_pos": jnp.asarray([[1], [2], [-1], [0]]),
        "protein_tokens": jnp.full((B, 1, 4), 1, jnp.int32),
        "protein_pos": jnp.full((B, 1), -1, jnp.int32),
    }
    expect, _ = fusion.loss_fn(params, plain, batch)
    mesh = make_mesh(data=1, fsdp=2, tensor=1, seq=4)
    with jax.sharding.set_mesh(mesh):
        sp = shard_params(params, mesh)
        sb = shard_batch(batch, mesh, seq_shard=True)
        got = jax.jit(lambda p, b: fusion.loss_fn(p, cfg, b)[0])(sp, sb)
    np.testing.assert_allclose(float(got), float(expect), rtol=2e-5)


def test_zigzag_train_step_end_to_end_layout_matches_plain():
    """The trainer's end-to-end zigzag fast path — ONE stream permute per
    step (embeds/mask/positions/pre-shifted labels) with
    context_parallel_prepermuted attention, instead of q/k/v/out permutes
    every layer — must reproduce the plain unsharded train step exactly:
    same loss, same domain losses, same updated params."""
    from molly_tpu.training import (TrainConfig, init_train_state,
                                    make_train_step)
    cfg = FusionConfig(
        text=tiny_qwen3(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, head_dim=8,
                        context_parallel=True,
                        context_parallel_zigzag=True),
        dna_rna=tiny_esm(vocab_size=16),
        protein=tiny_esm(vocab_size=20),
        dna_rna_k_tokens=4, protein_k_tokens=4)
    plain = dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, context_parallel=False,
                                      context_parallel_zigzag=False))
    params = fusion.init_params(plain, jax.random.key(0))
    B, S = 4, 32
    rng = np.random.default_rng(7)
    labels = np.full((B, S), -100, np.int32)
    labels[:, 16:] = rng.integers(1, 64, (B, S - 16))
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 64, (B, S))),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(labels),
        "dna_rna_tokens": jnp.asarray(rng.integers(2, 16, (B, 1, 4))),
        "dna_rna_pos": jnp.asarray([[1], [2], [-1], [0]]),
        "protein_tokens": jnp.full((B, 1, 4), 1, jnp.int32),
        "protein_pos": jnp.full((B, 1), -1, jnp.int32),
        "task_label": jnp.asarray([0, 3, 19, 0]),
    }
    tc = TrainConfig()
    st_plain, m_plain = jax.jit(make_train_step(plain, tc))(
        init_train_state(params, tc), batch, jax.random.key(1))

    mesh = make_mesh(data=1, fsdp=2, tensor=1, seq=4)
    with jax.sharding.set_mesh(mesh):
        state = init_train_state(shard_params(params, mesh), tc)
        sb = shard_batch(batch, mesh, seq_shard=True)
        st_zig, m_zig = jax.jit(make_train_step(cfg, tc))(
            state, sb, jax.random.key(1))

    np.testing.assert_allclose(float(m_zig["loss"]), float(m_plain["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(m_zig["domain_loss_sum"]),
                               np.asarray(m_plain["domain_loss_sum"]),
                               rtol=2e-4, atol=1e-6)
    flat_p, _ = jax.tree.flatten(st_plain.params)
    flat_z, _ = jax.tree.flatten(st_zig.params)
    for a, b in zip(flat_p, flat_z):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-6)
