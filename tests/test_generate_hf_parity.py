"""End-to-end greedy generation parity vs HF transformers generate()
(tiny random Qwen3, fp32, CPU) — validates positions, cache indexing, and
EOS handling across a whole decode, not just single-step logits."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from molly_tpu.inference.engine import GenerationConfig, _generate_from_embeds
from molly_tpu.models import qwen3
from molly_tpu.models.hf_import import qwen3_cfg_from_hf_config, qwen3_from_hf


def test_greedy_generation_matches_hf():
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(11)
    hf_cfg = Qwen3Config(
        vocab_size=200, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=True, attn_implementation="eager",
        pad_token_id=0, eos_token_id=1)
    model = Qwen3ForCausalLM(hf_cfg).eval().to(torch.float32)
    cfg = qwen3_cfg_from_hf_config(hf_cfg, dtype="float32")
    params = qwen3_from_hf(model.state_dict(), cfg, dtype="float32")

    B, S, T = 2, 9, 8
    rng = np.random.default_rng(7)
    ids = rng.integers(2, 200, (B, S))

    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor(ids), max_new_tokens=T, do_sample=False,
            eos_token_id=1, pad_token_id=0)
    hf_new = hf_out[:, S:].numpy()

    gen = GenerationConfig(max_new_tokens=T, do_sample=False,
                           eos_token_id=1, pad_token_id=0,
                           repetition_penalty=1.0)
    embeds = qwen3.embed_tokens(params, jnp.asarray(ids))
    ours = np.asarray(_generate_from_embeds(
        params, cfg, embeds, jnp.ones((B, S), jnp.int32), gen,
        jax.random.key(0)))

    # HF pads after EOS with pad_token_id; we do the same
    np.testing.assert_array_equal(ours, hf_new)
