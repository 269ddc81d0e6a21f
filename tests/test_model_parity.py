"""Golden-logit parity: molly_tpu JAX models vs HF transformers (CPU).

The reference's correctness bar is "bit-comparable logits vs HF on the
published checkpoints" (BASELINE.md). No checkpoints are downloadable here,
so we construct tiny *randomly initialized* HF models locally, import their
state dicts, and compare logits — validating every architectural detail
(RoPE conventions, norm placement, q/k-norm, token-dropout, GQA).

Strategy: the strict architecture gate runs in float64 (tolerance 1e-5,
floor set by the fp32 rotary tables both sides use); a looser fp32 check
covers the production import path (accumulation-order/oneDNN differences
put that envelope at ~5e-3 on tiny models).
"""

from contextlib import contextmanager

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@contextmanager
def enable_x64():
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)

torch = pytest.importorskip("torch")

from molly_tpu.models import esm as jesm
from molly_tpu.models import qwen3 as jqwen
from molly_tpu.models.hf_import import (
    esm_cfg_from_hf_config,
    esm_from_hf,
    qwen3_cfg_from_hf_config,
    qwen3_from_hf,
)

X64_ATOL = 1e-5   # fp32 rotary tables are the floor
F32_ATOL = 5e-3   # accumulation-order envelope on CPU (oneDNN vs XLA)


def _build_hf_qwen(seed=0, tie=True):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(seed)
    cfg = Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512, rope_theta=1e6,
        tie_word_embeddings=tie, attn_implementation="eager",
    )
    return Qwen3ForCausalLM(cfg).eval(), cfg


def _build_hf_esm(pos_type, token_dropout, emb_ln_before, seed=2):
    from transformers import EsmConfig, EsmForMaskedLM

    torch.manual_seed(seed)
    cfg = EsmConfig(
        vocab_size=40, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        position_embedding_type=pos_type, token_dropout=token_dropout,
        emb_layer_norm_before=emb_ln_before, mask_token_id=32,
        pad_token_id=1, max_position_embeddings=128, layer_norm_eps=1e-5,
        attn_implementation="eager", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    return EsmForMaskedLM(cfg).eval(), cfg


def test_qwen3_logit_parity_x64():
    model, hf_cfg = _build_hf_qwen(tie=True)
    model = model.to(torch.float64)
    with enable_x64():
        cfg = qwen3_cfg_from_hf_config(hf_cfg, dtype="float64")
        params = qwen3_from_hf(
            {k: v for k, v in model.state_dict().items()}, cfg,
            dtype="float64")
        B, S = 2, 17
        rng = np.random.default_rng(0)
        ids = rng.integers(0, hf_cfg.vocab_size, (B, S))
        mask = np.ones((B, S), dtype=np.int64)
        mask[1, -5:] = 0  # right padding on sample 1
        with torch.no_grad():
            ref = model(torch.tensor(ids),
                        attention_mask=torch.tensor(mask)).logits.numpy()
        got = np.asarray(jqwen.forward_logits(
            params, cfg, input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask)))
    m = mask.astype(bool)
    diff = np.abs(ref[m] - got[m]).max()
    assert diff < X64_ATOL, f"max |Δlogit| = {diff}"


def test_qwen3_moe_logit_parity_x64():
    """Golden-logit parity for the MoE family vs HF Qwen3MoeForCausalLM
    (router softmax/top-k conventions, per-expert SwiGLU, combine order)."""
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    torch.manual_seed(3)
    hf_cfg = Qwen3MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_experts=4, num_experts_per_tok=2,
        norm_topk_prob=True, decoder_sparse_step=1, mlp_only_layers=[],
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512, rope_theta=1e6,
        tie_word_embeddings=True, attn_implementation="eager",
        output_router_logits=False,
    )
    model = Qwen3MoeForCausalLM(hf_cfg).eval().to(torch.float64)
    with enable_x64():
        cfg = qwen3_cfg_from_hf_config(hf_cfg, dtype="float64")
        assert cfg.num_experts == 4 and cfg.intermediate_size == 48
        params = qwen3_from_hf(model.state_dict(), cfg, dtype="float64")
        B, S = 2, 17
        rng = np.random.default_rng(1)
        ids = rng.integers(0, hf_cfg.vocab_size, (B, S))
        mask = np.ones((B, S), dtype=np.int64)
        mask[1, -5:] = 0
        with torch.no_grad():
            ref = model(torch.tensor(ids),
                        attention_mask=torch.tensor(mask)).logits.numpy()
        got = np.asarray(jqwen.forward_logits(
            params, cfg, input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask)))
    m = mask.astype(bool)
    diff = np.abs(ref[m] - got[m]).max()
    assert diff < X64_ATOL, f"max |Δlogit| = {diff}"


def test_qwen3_untied_lm_head_f32():
    model, hf_cfg = _build_hf_qwen(seed=1, tie=False)
    model = model.to(torch.float32)
    cfg = qwen3_cfg_from_hf_config(hf_cfg, dtype="float32")
    params = qwen3_from_hf(model.state_dict(), cfg, dtype="float32")

    ids = np.arange(10)[None, :] % 256
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    got = np.asarray(jqwen.forward_logits(params, cfg,
                                          input_ids=jnp.asarray(ids)))
    assert np.abs(ref - got).max() < F32_ATOL


@pytest.mark.parametrize("pos_type,token_dropout,emb_ln_before", [
    ("rotary", True, False),    # ESM-2 / NT-v2 style
    ("absolute", False, True),  # NT-v1 / older ESM style
])
def test_esm_hidden_parity_x64(pos_type, token_dropout, emb_ln_before):
    model, hf_cfg = _build_hf_esm(pos_type, token_dropout, emb_ln_before)
    model = model.to(torch.float64)
    with enable_x64():
        cfg = esm_cfg_from_hf_config(hf_cfg, dtype="float64")
        params = esm_from_hf(model.state_dict(), cfg, dtype="float64")

        B, S = 3, 12
        rng = np.random.default_rng(3)
        ids = rng.integers(4, 30, (B, S))
        ids[0, 3] = 32  # mask token exercises token_dropout rescale
        mask = np.ones((B, S), dtype=np.int64)
        mask[2, -4:] = 0
        ids[2, -4:] = 1  # pad tokens

        with torch.no_grad():
            ref = model.esm(torch.tensor(ids),
                            attention_mask=torch.tensor(mask)
                            ).last_hidden_state.numpy()
        got = np.asarray(jesm.forward_hidden(params, cfg, jnp.asarray(ids),
                                             jnp.asarray(mask)))
    m = mask.astype(bool)
    diff = np.abs(ref[m] - got[m]).max()
    assert diff < X64_ATOL, f"max |Δhidden| = {diff} ({pos_type})"


def test_qwen3_kv_cache_matches_full_forward():
    """Prefill + single-step decode must reproduce the no-cache forward
    (pure JAX self-consistency, fp32, tight tolerance)."""
    model, hf_cfg = _build_hf_qwen()
    model = model.to(torch.float32)
    cfg = qwen3_cfg_from_hf_config(hf_cfg, dtype="float32")
    params = qwen3_from_hf(model.state_dict(), cfg, dtype="float32")

    B, S, SMAX = 2, 9, 16
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(0, 256, (B, S)))

    full = jqwen.forward_logits(params, cfg, input_ids=ids)

    cache = jqwen.init_cache(cfg, B, SMAX, dtype=jnp.float32)
    mask = jnp.zeros((B, SMAX), jnp.int32).at[:, :S].set(1)
    hidden, cache = jqwen.forward_hidden(
        params, cfg, input_ids=ids, attention_mask=mask,
        positions=jnp.broadcast_to(jnp.arange(S), (B, S)),
        cache=cache, cache_index=0)
    prefill_logits = jqwen.logits_from_hidden(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(prefill_logits),
                               np.asarray(full), atol=1e-5)

    # decode one token: feed token S-1's argmax at position S
    nxt = jnp.argmax(full[:, -1], axis=-1)[:, None]
    mask = mask.at[:, S].set(1)
    hidden2, cache = jqwen.forward_hidden(
        params, cfg, input_ids=nxt, attention_mask=mask,
        positions=jnp.full((B, 1), S), cache=cache, cache_index=S)
    step_logits = jqwen.logits_from_hidden(params, cfg, hidden2)[:, 0]

    ids2 = jnp.concatenate([ids, nxt], axis=1)
    full2 = jqwen.forward_logits(params, cfg, input_ids=ids2)[:, -1]
    np.testing.assert_allclose(np.asarray(step_logits), np.asarray(full2),
                               atol=1e-5)
