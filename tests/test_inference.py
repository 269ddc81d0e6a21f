"""Decode engine tests: greedy generation vs step-by-step no-cache forward,
EOS early-stop, and sampling filter correctness."""

import numpy as np

import jax
import jax.numpy as jnp

from molly_tpu.inference.engine import GenerationConfig, _generate_from_embeds
from molly_tpu.inference.sampling import (
    NEG_INF,
    apply_repetition_penalty,
    top_k_filter,
    top_p_filter,
)
from molly_tpu.models import qwen3, tiny_qwen3


def test_top_k_filter():
    logits = jnp.asarray([[1.0, 3.0, 2.0, 0.5]])
    out = np.asarray(top_k_filter(logits, 2))
    assert out[0, 1] == 3.0 and out[0, 2] == 2.0
    assert out[0, 0] == NEG_INF and out[0, 3] == NEG_INF


def test_top_p_filter_keeps_top_token():
    # extremely peaked: top-p must always keep the argmax
    logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
    out = np.asarray(top_p_filter(logits, 0.1))
    assert out[0, 0] == 10.0
    assert (out[0, 1:] == NEG_INF).all()


def test_top_p_filter_cumulative():
    # probs ~ [0.475, 0.475, 0.05]: p=0.5 keeps exactly the top-2? The HF
    # rule keeps tokens whose exclusive-cumsum < p: token1 (0) and token2
    # (0.475) kept, token3 (0.95) dropped.
    logits = jnp.log(jnp.asarray([[0.475, 0.475, 0.05]]))
    out = np.asarray(top_p_filter(logits, 0.5))
    assert out[0, 0] != NEG_INF and out[0, 1] != NEG_INF
    assert out[0, 2] == NEG_INF


def test_repetition_penalty():
    logits = jnp.asarray([[2.0, -2.0, 1.0]])
    presence = jnp.asarray([[True, True, False]])
    out = np.asarray(apply_repetition_penalty(logits, presence, 2.0))
    np.testing.assert_allclose(out, [[1.0, -4.0, 1.0]])


def test_greedy_generate_matches_naive_loop():
    cfg = tiny_qwen3(num_hidden_layers=2, vocab_size=128)
    params = qwen3.init_params(cfg, jax.random.key(0))
    B, S, T = 2, 7, 6
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 128, (B, S))
    # left-pad sample 1 by 2
    mask = np.ones((B, S), dtype=np.int32)
    mask[1, :2] = 0
    ids[1, :2] = 0

    gen = GenerationConfig(max_new_tokens=T, do_sample=False,
                           eos_token_id=1, pad_token_id=0,
                           repetition_penalty=1.0)
    embeds = qwen3.embed_tokens(params, jnp.asarray(ids))
    toks = np.asarray(_generate_from_embeds(
        params, cfg, embeds, jnp.asarray(mask), gen, jax.random.key(1)))

    # naive reference: grow the (unpadded) sequence, full forward each step
    for b in range(B):
        real = ids[b][mask[b] == 1].tolist()
        out = []
        for _ in range(T):
            logits = qwen3.forward_logits(
                params, cfg, input_ids=jnp.asarray([real + out]))
            nxt = int(jnp.argmax(logits[0, -1]))
            out.append(nxt)
            if nxt == 1:
                break
        expect = out + [0] * (T - len(out))
        assert toks[b].tolist() == expect, (b, toks[b].tolist(), expect)


def test_generate_eos_early_stop():
    """Force eos to be the argmax everywhere: generation stops immediately
    and pads the rest."""
    cfg = tiny_qwen3(num_hidden_layers=1, vocab_size=32)
    params = qwen3.init_params(cfg, jax.random.key(3))
    eos = 5
    # bias the tied embedding so token `eos` has a huge logit
    params["embed"] = params["embed"].at[eos].set(
        params["embed"][eos] + 100.0)
    gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                           eos_token_id=eos, pad_token_id=0,
                           repetition_penalty=1.0)
    ids = jnp.asarray([[2, 3, 4]])
    embeds = qwen3.embed_tokens(params, ids)
    toks = np.asarray(_generate_from_embeds(
        params, cfg, embeds, jnp.ones((1, 3), jnp.int32), gen,
        jax.random.key(0)))
    assert toks[0, 0] == eos
    assert (toks[0, 1:] == 0).all()
