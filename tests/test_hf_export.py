"""HF export roundtrip + NT-v2 SwiGLU variant tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from molly_tpu.models import esm, qwen3, tiny_esm, tiny_qwen3
from molly_tpu.models.hf_export import save_hf_checkpoint
from molly_tpu.models.hf_import import load_hf_state, qwen3_from_hf


def test_qwen3_export_import_roundtrip(tmp_path):
    cfg = tiny_qwen3(num_hidden_layers=2, tie_word_embeddings=False)
    params = qwen3.init_params(cfg, jax.random.key(0))
    path = str(tmp_path / "hf")
    save_hf_checkpoint(path, params, cfg)

    state = load_hf_state(path)
    assert "model.embed_tokens.weight" in state
    restored = qwen3_from_hf(state, cfg, dtype="float32")

    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=0)

    # logits identical through the roundtrip
    ids = jnp.arange(12)[None] % cfg.vocab_size
    l1 = qwen3.forward_logits(params, cfg, input_ids=ids)
    l2 = qwen3.forward_logits(restored, cfg, input_ids=ids)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_export_loads_in_transformers(tmp_path):
    torch = pytest.importorskip("torch")
    from transformers import AutoModelForCausalLM

    cfg = tiny_qwen3(num_hidden_layers=2, tie_word_embeddings=True)
    params = qwen3.init_params(cfg, jax.random.key(1))
    path = str(tmp_path / "hf")
    save_hf_checkpoint(path, params, cfg)

    model = AutoModelForCausalLM.from_pretrained(
        path, attn_implementation="eager").eval().to(torch.float32)
    ids = np.arange(10)[None] % cfg.vocab_size
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(qwen3.forward_logits(params, cfg,
                                          input_ids=jnp.asarray(ids)))
    assert np.abs(ref - got).max() < 5e-3  # fp32 accumulation-order envelope


def test_esm_swiglu_variant():
    cfg = tiny_esm(mlp_type="swiglu", mlp_bias=False)
    params = esm.init_params(cfg, jax.random.key(2))
    assert "ffn_gate" in params["layers"]
    ids = jnp.asarray(np.random.default_rng(0).integers(4, 30, (2, 10)))
    h = esm.forward_hidden(params, cfg, ids)
    assert np.isfinite(np.asarray(h)).all()

    # numeric check of the swiglu ffn against manual numpy for one layer
    x = np.asarray(jax.random.normal(jax.random.key(3), (3, 32)), np.float32)
    p = {k: (np.asarray(v[0]) if not isinstance(v, dict)
             else {kk: np.asarray(vv[0]) for kk, vv in v.items()})
         for k, v in params["layers"].items()}

    def silu(z):
        return z / (1 + np.exp(-z))

    expect = (silu(x @ p["ffn_gate"]) * (x @ p["ffn_in"])) @ p["ffn_out"]
    got = np.asarray(
        jax.nn.silu(jnp.asarray(x) @ jnp.asarray(p["ffn_gate"]))
        * (jnp.asarray(x) @ jnp.asarray(p["ffn_in"]))
        @ jnp.asarray(p["ffn_out"]))
    np.testing.assert_allclose(got, expect, atol=1e-4)


def test_peft_adapter_import():
    """Synthetic PEFT-layout adapter -> our lora pytree; forward with the
    imported adapter must equal forward with the natively-built one."""
    import torch

    from molly_tpu.models.hf_import import peft_lora_from_hf, \
        projector_from_hf
    from molly_tpu.models.lora import LORA_TARGETS, LoraConfig

    cfg = tiny_qwen3(num_hidden_layers=2)
    r = 4
    rng = np.random.default_rng(0)
    dims = {"q_proj": (64, 64), "k_proj": (64, 32), "v_proj": (64, 32),
            "o_proj": (64, 64), "gate_proj": (64, 128),
            "up_proj": (64, 128), "down_proj": (128, 64)}
    state = {}
    native = {"layers": {}}
    for t, (din, dout) in dims.items():
        path = ("self_attn." if "proj" in t and t[0] in "qkvo"
                else "mlp.")
        sub = f"self_attn.{t}" if t in ("q_proj", "k_proj", "v_proj",
                                        "o_proj") else f"mlp.{t}"
        a_layers, b_layers = [], []
        for i in range(2):
            A = rng.normal(size=(r, din)).astype(np.float32) / r
            B = rng.normal(size=(dout, r)).astype(np.float32) * 0.01
            state[f"base_model.model.model.layers.{i}.{sub}."
                  f"lora_A.weight"] = A
            state[f"base_model.model.model.layers.{i}.{sub}."
                  f"lora_B.weight"] = B
            a_layers.append(A.T)
            b_layers.append(B.T)
        native["layers"][t] = {"a": jnp.asarray(np.stack(a_layers)),
                               "b": jnp.asarray(np.stack(b_layers))}

    imported = peft_lora_from_hf(state, cfg, r)
    for t in LORA_TARGETS:
        for key in ("a", "b"):
            np.testing.assert_allclose(
                np.asarray(imported["layers"][t][key]),
                np.asarray(native["layers"][t][key]), atol=1e-6)

    params = qwen3.init_params(cfg, jax.random.key(0))
    ids = jnp.arange(10)[None] % cfg.vocab_size
    lcfg = LoraConfig(r=r)
    out_native = qwen3.forward_logits(params, cfg, input_ids=ids,
                                      lora=native, lora_scale=lcfg.scale)
    out_imported = qwen3.forward_logits(params, cfg, input_ids=ids,
                                        lora=imported,
                                        lora_scale=lcfg.scale)
    np.testing.assert_allclose(np.asarray(out_native),
                               np.asarray(out_imported), atol=1e-5)

    # projector .bin roundtrip
    w = rng.normal(size=(64, 48)).astype(np.float32)
    b = rng.normal(size=(64,)).astype(np.float32)
    proj = projector_from_hf({"weight": torch.tensor(w),
                              "bias": torch.tensor(b)})
    np.testing.assert_allclose(np.asarray(proj["kernel"]), w.T)
    np.testing.assert_allclose(np.asarray(proj["bias"]), b)


@pytest.mark.parametrize("moe", [False, True])
def test_peft_adapter_export_import_roundtrip(moe):
    """peft_lora_to_hf_state -> peft_lora_from_hf reproduces the adapter
    tree exactly (dense targets and expert-stacked MoE targets)."""
    from molly_tpu.models import tiny_moe
    from molly_tpu.models.hf_export import peft_lora_to_hf_state
    from molly_tpu.models.hf_import import peft_lora_from_hf
    from molly_tpu.models.lora import LoraConfig, init_lora

    cfg = tiny_moe() if moe else tiny_qwen3()
    lcfg = LoraConfig(r=4, dropout=0.0)
    lora = init_lora(cfg, lcfg, jax.random.key(0))
    # nonzero b so the roundtrip is observable
    lora["layers"] = jax.tree.map(lambda v: v + 0.01, lora["layers"])
    state = peft_lora_to_hf_state(lora, cfg)
    if moe:
        assert ("base_model.model.model.layers.0.mlp.experts.1."
                "up_proj.lora_A.weight") in state
    back = peft_lora_from_hf(state, cfg, lora_r=lcfg.r)
    assert set(back["layers"]) == set(lora["layers"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6),
        lora["layers"], back["layers"])
