"""Pallas flash attention parity vs the XLA reference implementation.

Runs in Pallas interpret mode on CPU (the real TPU path is exercised by
bench.py); numerics compared against ops.attention._xla_attention in fp32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from molly_tpu.ops.attention import _xla_attention
from molly_tpu.ops import flash_attention as fa


def _rand(shape, key):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32) * 0.3


def _run_flash(q, k, v, mask=None, causal=True, q_offset=0,
               blocks=(16, 16)):
    return fa.flash_attention(q, k, v, mask, causal, None, q_offset, blocks)


@pytest.fixture(autouse=True)
def _interpret_mode():
    # pallas kernels (incl. those traced inside jax.grad) run interpreted
    # on the CPU test backend; the real TPU path is driven by bench.py
    with pltpu.force_tpu_interpret_mode():
        yield


CASES = [
    # (B, Sq, Skv, N, Nkv, D, causal, use_mask, q_offset)
    (1, 32, 32, 2, 2, 16, True, False, 0),     # plain causal MHA
    (2, 32, 32, 4, 2, 16, True, True, 0),      # GQA + padding mask
    (1, 32, 32, 2, 1, 16, False, True, 0),     # bidirectional (encoder)
    (1, 24, 40, 2, 2, 16, True, True, 16),     # prefill into longer cache
    (2, 20, 20, 2, 2, 16, True, True, 0),      # non-divisible seq lens
]


@pytest.mark.parametrize("B,Sq,Skv,N,Nkv,D,causal,use_mask,q_offset", CASES)
def test_flash_forward_parity(B, Sq, Skv, N, Nkv, D, causal, use_mask,
                              q_offset):
    q = _rand((B, Sq, N, D), 0)
    k = _rand((B, Skv, Nkv, D), 1)
    v = _rand((B, Skv, Nkv, D), 2)
    mask = None
    if use_mask:
        m = np.ones((B, Skv), np.int32)
        m[:, -4:] = 0
        mask = jnp.asarray(m)

    ref = _xla_attention(q, k, v, mask=mask, causal=causal, scale=None,
                         q_offset=q_offset)
    got = _run_flash(q, k, v, mask, causal, q_offset)
    # compare only rows that can attend to something
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_backward_parity():
    B, S, N, Nkv, D = 2, 32, 4, 2, 16
    q = _rand((B, S, N, D), 3)
    k = _rand((B, S, Nkv, D), 4)
    v = _rand((B, S, Nkv, D), 5)
    m = np.ones((B, S), np.int32)
    m[1, -6:] = 0
    mask = jnp.asarray(m)

    def loss_ref(q, k, v):
        o = _xla_attention(q, k, v, mask=mask, causal=True, scale=None)
        return jnp.sum(o * (1 + 0.1 * o))

    def loss_flash(q, k, v):
        o = _run_flash(q, k, v, mask, True, 0)
        return jnp.sum(o * (1 + 0.1 * o))

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3,
                                   err_msg=f"d{name}")


def test_flash_backward_bidirectional():
    B, S, N, D = 1, 24, 2, 16
    q = _rand((B, S, N, D), 6)
    k = _rand((B, S, N, D), 7)
    v = _rand((B, S, N, D), 8)

    def loss(attn_fn, q, k, v):
        o = attn_fn(q, k, v)
        return jnp.sum(jnp.square(o))

    gr = jax.grad(lambda *a: loss(
        lambda q, k, v: _xla_attention(q, k, v, mask=None, causal=False,
                                       scale=None), *a),
        argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(lambda *a: loss(
        lambda q, k, v: _run_flash(q, k, v, None, False, 0), *a),
        argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3,
                                   err_msg=f"d{name}")
