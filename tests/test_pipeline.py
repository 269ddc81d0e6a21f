"""Pipeline parallelism on the 8-device virtual CPU mesh: loss and grad
parity of the GPipe clock loop vs the plain stacked-scan decoder
(capability beyond the reference — SURVEY.md §2.4 lists PP as absent)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from molly_tpu.models import fusion, tiny_esm, tiny_qwen3
from molly_tpu.models.fusion import FusionConfig
from molly_tpu.parallel.pipeline import (
    make_pp_mesh,
    pp_loss_fn,
    pp_param_specs,
)


@pytest.fixture(scope="module")
def setup():
    cfg = FusionConfig(
        text=tiny_qwen3(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_hidden_layers=4, num_attention_heads=4,
                        num_key_value_heads=2, head_dim=8),
        dna_rna=tiny_esm(vocab_size=16),
        protein=tiny_esm(vocab_size=20),
        dna_rna_k_tokens=4, protein_k_tokens=4)
    params = fusion.init_params(cfg, jax.random.key(0))
    B, S = 4, 24
    rng = np.random.default_rng(1)
    labels = np.full((B, S), -100, np.int32)
    labels[:, 12:] = rng.integers(1, 64, (B, S - 12))
    mask = np.ones((B, S), np.int32)
    mask[1, S - 4:] = 0
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 64, (B, S))),
        "attention_mask": jnp.asarray(mask),
        "labels": jnp.asarray(labels),
        "dna_rna_tokens": jnp.asarray(rng.integers(2, 16, (B, 1, 4))),
        "dna_rna_pos": jnp.asarray([[1], [2], [-1], [0]]),
        "protein_tokens": jnp.full((B, 1, 4), 1, jnp.int32),
        "protein_pos": jnp.full((B, 1), -1, jnp.int32),
    }
    return cfg, params, batch


@pytest.mark.parametrize("pipe,data,n_micro", [(4, 2, 2), (2, 4, 4)])
def test_pp_loss_matches_plain(setup, pipe, data, n_micro):
    cfg, params, batch = setup
    expect, _ = fusion.loss_fn(params, cfg, batch)

    mesh = make_pp_mesh(pipe=pipe, data=data)
    specs = pp_param_specs(params)
    with jax.sharding.set_mesh(mesh):
        sp = jax.tree.map(
            lambda x, s: jax.device_put(
                x, jax.sharding.NamedSharding(mesh, s)), params, specs)
        got = jax.jit(lambda p, b: pp_loss_fn(
            p, cfg, b, n_micro=n_micro)[0])(sp, batch)
    np.testing.assert_allclose(float(got), float(expect), rtol=2e-5)


def test_pp_grads_match_plain(setup):
    cfg, params, batch = setup
    # grads wrt the projector (crosses the pipeline boundary via embeds)
    # and the text layer stack (sharded over pipe)
    def plain(p):
        return fusion.loss_fn(p, cfg, batch)[0]

    def piped(p):
        return pp_loss_fn(p, cfg, batch, n_micro=2)[0]

    g_ref = jax.grad(plain)(params)
    mesh = make_pp_mesh(pipe=4, data=2)
    with jax.sharding.set_mesh(mesh):
        g_pp = jax.jit(jax.grad(piped))(params)

    np.testing.assert_allclose(
        np.asarray(g_pp["text"]["layers"]["q_proj"]),
        np.asarray(g_ref["text"]["layers"]["q_proj"]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_pp["dna_rna_projector"]["kernel"]),
        np.asarray(g_ref["dna_rna_projector"]["kernel"]),
        rtol=1e-4, atol=1e-5)


def test_pp_requires_layer_divisibility(setup):
    cfg, params, batch = setup
    mesh = make_pp_mesh(pipe=8, data=1)  # 4 layers over 8 stages: invalid
    with jax.sharding.set_mesh(mesh):
        with pytest.raises(Exception):
            jax.jit(lambda p, b: pp_loss_fn(
                p, cfg, b, n_micro=2)[0])(params, batch).block_until_ready()


def test_pp_train_step_matches_plain(setup):
    """make_train_step with pp_micro on a (pipe, data) mesh: first-step
    loss equals the plain (unsharded) train step's."""
    from molly_tpu.training import TrainConfig, init_train_state, \
        make_train_step

    cfg, params, batch = setup
    tc = dict(learning_rate=1e-3, total_steps=4,
              train_bio=True, train_mlp=True, train_llm=True)
    plain_tc = TrainConfig(**tc)
    pp_tc = TrainConfig(**tc, pp_micro=2)
    batch = {**batch, "task_label": np.zeros((4,), np.int32)}

    state = init_train_state(params, plain_tc)
    _, m_ref = jax.jit(make_train_step(cfg, plain_tc))(
        state, batch, jax.random.key(1))

    mesh = make_pp_mesh(pipe=4, data=2)
    specs = pp_param_specs(params)
    with jax.sharding.set_mesh(mesh):
        sp = jax.tree.map(
            lambda x, s: jax.device_put(
                x, jax.sharding.NamedSharding(mesh, s)), params, specs)
        state = init_train_state(sp, pp_tc)
        state, m_pp = jax.jit(make_train_step(cfg, pp_tc))(
            state, batch, jax.random.key(1))
    np.testing.assert_allclose(float(m_pp["loss"]), float(m_ref["loss"]),
                               rtol=2e-5)
    np.testing.assert_allclose(float(m_pp["grad_norm"]),
                               float(m_ref["grad_norm"]), rtol=1e-3)


def test_train_cli_pipeline(tmp_path):
    """Train CLI end-to-end with --mesh-pipe 2 (GPipe decoder)."""
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
        "--batch-size-per-gpu", "4", "--epochs", "1", "--train-iters", "2",
        "--log-interval", "1", "--lr", "1e-3",
        "--mesh-pipe", "2", "--pp-microbatches", "2",
    ]
    args = build_argparser().parse_args(argv)
    result = run_training(args)
    assert result["steps"] == 2
    assert 0 < result["final_loss"] < 20
