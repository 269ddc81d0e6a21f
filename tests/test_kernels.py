"""Fused LCE + Pallas RMSNorm parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from molly_tpu.ops.lce import causal_lm_loss, fused_linear_cross_entropy
from molly_tpu.ops.norms import rms_norm


@pytest.fixture(autouse=True)
def _interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def _naive_nll(h, w, labels, z_loss=0.0):
    logits = h.astype(jnp.float32) @ w.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    safe = jnp.where(labels < 0, 0, labels)
    tgt = jnp.take_along_axis(logits, safe[:, None], 1)[:, 0]
    valid = (labels >= 0).astype(jnp.float32)
    nll = (lse - tgt) * valid
    if z_loss:
        nll = nll + z_loss * jnp.square(lse) * valid
    return nll


def test_lce_forward_matches_naive():
    rng = np.random.default_rng(0)
    T, H, V = 37, 16, 50  # non-divisible by chunk
    h = jnp.asarray(rng.normal(size=(T, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, V)).astype(np.float32) * 0.1)
    labels = rng.integers(0, V, T)
    labels[::5] = -100
    labels = jnp.asarray(labels)

    got = fused_linear_cross_entropy(h, w, labels, 16, 0.0)
    ref = _naive_nll(h, w, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("z_loss", [0.0, 1e-3])
def test_lce_grads_match_naive(z_loss):
    rng = np.random.default_rng(1)
    T, H, V = 24, 12, 30
    h = jnp.asarray(rng.normal(size=(T, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, V)).astype(np.float32) * 0.1)
    labels = rng.integers(0, V, T)
    labels[:4] = -100
    labels = jnp.asarray(labels)

    def loss_fused(h, w):
        return jnp.sum(fused_linear_cross_entropy(h, w, labels, 8, z_loss))

    def loss_naive(h, w):
        return jnp.sum(_naive_nll(h, w, labels, z_loss))

    gf = jax.grad(loss_fused, argnums=(0, 1))(h, w)
    gn = jax.grad(loss_naive, argnums=(0, 1))(h, w)
    for a, b, name in zip(gf, gn, ("dh", "dw")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   err_msg=name)


def test_lce_need_dw_false_same_dh():
    """need_dw=False (frozen lm-head, LoRA regime): dh is bit-identical to
    the need_dw=True path — only the dead h^T @ dlogits matmul is skipped."""
    rng = np.random.default_rng(2)
    T, H, V = 24, 12, 30
    h = jnp.asarray(rng.normal(size=(T, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, V)).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.integers(0, V, T))

    def loss(h, need_dw):
        return jnp.sum(fused_linear_cross_entropy(h, w, labels, 8, 0.0,
                                                  -100, need_dw))

    dh_full = jax.grad(lambda x: loss(x, True))(h)
    dh_skip = jax.grad(lambda x: loss(x, False))(h)
    np.testing.assert_array_equal(np.asarray(dh_full), np.asarray(dh_skip))


def test_causal_lm_loss_matches_fusion_ce():
    from molly_tpu.models.fusion import cross_entropy_loss

    rng = np.random.default_rng(2)
    B, S, H, V = 2, 10, 8, 20
    hidden = jnp.asarray(rng.normal(size=(B, S, H)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(H, V)).astype(np.float32) * 0.2)
    labels = np.full((B, S), -100, np.int32)
    labels[0, 4:] = rng.integers(0, V, 6)
    labels[1, 7:] = rng.integers(0, V, 3)
    labels = jnp.asarray(labels)

    loss, per_nll, per_tok = causal_lm_loss(hidden, w, labels, chunk_size=8)
    logits = hidden @ w
    ref_loss, metrics = cross_entropy_loss(logits, labels)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-6)
    assert int(per_tok.sum()) == int(metrics["tokens"])


def test_rmsnorm_pallas_parity():
    from molly_tpu.ops.rmsnorm_pallas import rms_norm_pallas

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 12, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(128,)).astype(np.float32))

    got = rms_norm_pallas(x, w, 1e-6)
    ref = rms_norm(x, w, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def f_pallas(x, w):
        return jnp.sum(jnp.square(rms_norm_pallas(x, w, 1e-6)))

    def f_ref(x, w):
        return jnp.sum(jnp.square(rms_norm(x, w, 1e-6)))

    gp = jax.grad(f_pallas, argnums=(0, 1))(x, w)
    gr = jax.grad(f_ref, argnums=(0, 1))(x, w)
    for a, b, name in zip(gp, gr, ("dx", "dw")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                                   err_msg=name)
