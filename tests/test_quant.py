"""Int8 weight-only quantization tests (XLA fallback path on CPU; the
Pallas kernel itself is exercised on the real chip by bench.py --int8)."""

import numpy as np

import jax
import jax.numpy as jnp

from molly_tpu.models import qwen3, tiny_qwen3
from molly_tpu.ops.quant import int8_matmul, is_quantized, quantize_int8


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32) * 0.1)
    q = quantize_int8(w)
    assert q["w_q"].dtype == jnp.int8
    deq = q["w_q"].astype(jnp.float32) * q["scale"][None, :]
    rel = np.abs(np.asarray(deq - w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.01  # int8 per-channel: <1% of max


def test_int8_matmul_matches_dequant():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 50)).astype(np.float32) * 0.05)
    q = quantize_int8(w)
    got = int8_matmul(x, q, out_dtype=jnp.float32)
    deq = q["w_q"].astype(jnp.float32) * q["scale"][None, :]
    # the production path computes in bf16 (x and w_q cast): ~0.5% rel
    np.testing.assert_allclose(np.asarray(got), np.asarray(x @ deq),
                               rtol=0.02, atol=0.02)


def test_quantized_decode_close_to_full_precision():
    cfg = tiny_qwen3(num_hidden_layers=2, vocab_size=300,
                     tie_word_embeddings=True)
    params = qwen3.init_params(cfg, jax.random.key(0))
    qparams = qwen3.quantize_for_decode(params, cfg)
    assert "qkv_proj" in qparams["layers"]  # fused decode weights
    assert "lm_head_q" in qparams
    # unfused variant keeps the per-projection layout
    qp2 = qwen3.quantize_for_decode(params, cfg, fuse=False)
    assert is_quantized(jax.tree.map(lambda x: x[0],
                                     qp2["layers"]["q_proj"]))

    ids = jnp.asarray(np.random.default_rng(2).integers(0, 300, (2, 12)))
    full = qwen3.forward_logits(params, cfg, input_ids=ids)
    quant = qwen3.forward_logits(qparams, cfg, input_ids=ids)
    # int8 weight error accumulates across layers; top-1 must agree and
    # logits stay close on this tiny model
    assert np.abs(np.asarray(full) - np.asarray(quant)).max() < 0.3
    top_full = np.asarray(jnp.argmax(full, -1))
    top_quant = np.asarray(jnp.argmax(quant, -1))
    assert (top_full == top_quant).mean() > 0.9


def test_quantized_cache_decode_runs():
    cfg = tiny_qwen3(num_hidden_layers=2, vocab_size=128)
    params = qwen3.quantize_for_decode(
        qwen3.init_params(cfg, jax.random.key(1)), cfg)
    B, S, SMAX = 1, 5, 8
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 128, (B, S)))
    cache = qwen3.init_cache(cfg, B, SMAX, dtype=jnp.float32)
    mask = jnp.zeros((B, SMAX), jnp.int32).at[:, :S].set(1)
    hidden, cache = qwen3.forward_hidden(
        params, cfg, input_ids=ids, attention_mask=mask,
        positions=jnp.broadcast_to(jnp.arange(S), (B, S)),
        cache=cache, cache_index=0)
    logits = qwen3.logits_from_hidden(params, cfg, hidden)
    assert np.isfinite(np.asarray(logits)).all()


def test_esm_int8_encoder_close_to_bf16():
    """esm.quantize_for_decode: int8 stacked linears through quant.linear
    track the full-precision encoder closely (frozen-encoder serving —
    frees ~1.1 GB HBM at the 8B reference op point)."""
    from molly_tpu.models import esm, tiny_esm
    cfg = tiny_esm(vocab_size=32, hidden_size=32, intermediate_size=64,
                   num_hidden_layers=2, num_attention_heads=4,
                   dtype="float32")
    params = esm.init_params(cfg, jax.random.key(0))
    qparams = esm.quantize_for_decode(params)
    assert qparams["layers"]["q"]["w_q"].dtype == jnp.int8
    assert qparams["layers"]["q"]["scale"].shape == (2, 32)
    ids = jnp.asarray(np.random.default_rng(0).integers(4, 30, (2, 12)))
    mask = jnp.ones((2, 12), jnp.int32)
    h = np.asarray(esm.forward_hidden(params, cfg, ids, mask))
    hq = np.asarray(esm.forward_hidden(qparams, cfg, ids, mask))
    # final layer_norm bounds the scale; int8 error stays small
    assert np.abs(h - hq).max() < 0.15, np.abs(h - hq).max()
    assert np.abs(h - hq).mean() < 0.02
