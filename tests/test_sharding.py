"""GSPMD sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4):
mesh construction, rule matching, and a sharded-vs-unsharded numeric check
of the fusion loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from molly_tpu.models import fusion, tiny_esm, tiny_qwen3
from molly_tpu.models.fusion import FusionConfig
from molly_tpu.parallel import (
    make_mesh,
    param_specs,
    shard_batch,
    shard_params,
    spec_for_path,
)


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    m = make_mesh(data=2, fsdp=2, tensor=2)
    assert m.shape == {"data": 2, "fsdp": 2, "tensor": 2, "seq": 1,
                       "expert": 1}
    m2 = make_mesh(data=1, tensor=2)  # fsdp=-1 -> 4
    assert m2.shape["fsdp"] == 4
    m3 = make_mesh(data=1, fsdp=2, tensor=2, seq=2)
    assert m3.shape["seq"] == 2
    m4 = make_mesh(data=1, fsdp=2, expert=4)
    assert m4.shape["expert"] == 4


def test_spec_rules():
    assert spec_for_path("text/embed") == P("tensor", "fsdp")
    assert spec_for_path("text/layers/q_proj") == P(None, "fsdp", "tensor")
    assert spec_for_path("text/layers/o_proj") == P(None, "tensor", "fsdp")
    assert spec_for_path("text/layers/input_norm") == P()
    assert spec_for_path("dna_rna/layers/ffn_in") == P(None, "fsdp", "tensor")
    assert spec_for_path("protein_projector/kernel") == P()
    assert spec_for_path("lora/layers/q_proj/a") == P(None, "fsdp", None)


@pytest.fixture(scope="module")
def small_fusion():
    cfg = FusionConfig(
        text=tiny_qwen3(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, head_dim=8),
        dna_rna=tiny_esm(vocab_size=16),
        protein=tiny_esm(vocab_size=20),
        dna_rna_k_tokens=4, protein_k_tokens=4)
    params = fusion.init_params(cfg, jax.random.key(0))
    B, S = 4, 16
    rng = np.random.default_rng(1)
    labels = np.full((B, S), -100, np.int32)
    labels[:, 10:] = rng.integers(1, 64, (B, S - 10))
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 64, (B, S))),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(labels),
        "dna_rna_tokens": jnp.asarray(rng.integers(2, 16, (B, 1, 4))),
        "dna_rna_pos": jnp.asarray([[1], [2], [-1], [0]]),
        "protein_tokens": jnp.full((B, 1, 4), 1, jnp.int32),
        "protein_pos": jnp.full((B, 1), -1, jnp.int32),
    }
    return cfg, params, batch


def test_sharded_loss_matches_unsharded(small_fusion):
    cfg, params, batch = small_fusion
    expect, _ = fusion.loss_fn(params, cfg, batch)

    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    sp = shard_params(params, mesh)
    sb = shard_batch(batch, mesh)
    specs = param_specs(params)

    # every param leaf carries the rule's sharding
    q_spec = sp["text"]["layers"]["q_proj"].sharding.spec
    assert q_spec == P(None, "fsdp", "tensor")

    f = jax.jit(lambda p, b: fusion.loss_fn(p, cfg, b)[0])
    with jax.sharding.set_mesh(mesh):
        got = f(sp, sb)
    np.testing.assert_allclose(float(got), float(expect), rtol=2e-5)


def test_host_shard_range():
    from molly_tpu.parallel import host_shard_range

    assert host_shard_range(10, 0, 4) == (0, 2)
    assert host_shard_range(10, 3, 4) == (6, 10)
    assert host_shard_range(10, 0, 1) == (0, 10)


def test_decode_engine_tp_sharded():
    """Multi-chip serving path: greedy decode with the text model sharded
    over (fsdp=2, tensor=4) matches the unsharded output exactly — the KV
    cache, sampling, and while-loop all run under GSPMD."""
    from molly_tpu.inference.engine import GenerationConfig, \
        _generate_from_embeds
    from molly_tpu.models import qwen3, tiny_qwen3

    cfg = tiny_qwen3(num_hidden_layers=2, vocab_size=256, hidden_size=64,
                     intermediate_size=128, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=16)
    params = qwen3.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(2, 256, (2, 10)), jnp.int32)
    embeds = qwen3.embed_tokens(params, ids)
    mask = jnp.ones((2, 10), jnp.int32)
    gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    ref = np.asarray(_generate_from_embeds(params, cfg, embeds, mask, gen,
                                           jax.random.key(1)))

    from molly_tpu.parallel import make_mesh, shard_params
    mesh = make_mesh(data=1, fsdp=2, tensor=4)
    with jax.sharding.set_mesh(mesh):
        sp = shard_params(params, mesh, bare_text=True)
        got = np.asarray(_generate_from_embeds(sp, cfg, embeds, mask, gen,
                                               jax.random.key(1)))
    np.testing.assert_array_equal(got, ref)


def test_make_mesh_dcn_data_axis():
    """Multi-slice recipe: dcn_data folds into the data axis (slice-major
    order) so only the gradient reduction crosses DCN; on hosts without
    slice topology (this CPU mesh) the documented fallback applies and
    the mesh is still a valid data2 x fsdp4 layout that runs a step."""
    from molly_tpu.parallel import make_mesh, shard_batch, shard_params

    mesh = make_mesh(data=1, fsdp=4, dcn_data=2)
    assert dict(mesh.shape) == {"data": 2, "fsdp": 4, "tensor": 1,
                                "seq": 1, "expert": 1}
    # fsdp=-1 accounts for the dcn factor
    mesh2 = make_mesh(dcn_data=2)
    assert mesh2.shape["fsdp"] == 4

    cfg = FusionConfig(text=tiny_qwen3(), dna_rna=tiny_esm(),
                       protein=tiny_esm(), dna_rna_k_tokens=4,
                       protein_k_tokens=4)
    params = fusion.init_params(cfg, jax.random.key(0))
    B, S = 8, 16
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": rng.integers(0, cfg.text.vocab_size, (B, S))
            .astype(np.int32),
        "attention_mask": np.ones((B, S), np.int32),
        "labels": rng.integers(0, cfg.text.vocab_size, (B, S))
            .astype(np.int32),
        "dna_rna_tokens": np.full((B, 1, 4), 3, np.int32),
        "dna_rna_pos": np.full((B, 1), 1, np.int32),
        "protein_tokens": np.full((B, 1, 4), 1, np.int32),
        "protein_pos": np.full((B, 1), -1, np.int32),
        "task_label": np.zeros((B,), np.int32),
    }
    with jax.sharding.set_mesh(mesh):
        sp = shard_params(params, mesh)
        sb = shard_batch({k: jnp.asarray(v) for k, v in batch.items()},
                         mesh)
        loss = jax.jit(lambda p, b: fusion.loss_fn(p, cfg, b)[0])(sp, sb)
    assert np.isfinite(float(loss))
