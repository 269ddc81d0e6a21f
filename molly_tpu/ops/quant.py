"""Int8 weight-only quantization for decode.

Decode throughput on TPU is weight-bandwidth-bound (benchmarks/README.md);
storing linear weights as int8 with per-output-channel fp32 scales halves
HBM traffic. The Pallas kernel loads int8 blocks, dequantizes in VMEM, and
runs the matmul on the MXU — XLA alone cannot express a fused
int8-load/bf16-matmul. A pure-XLA fallback (materializes the dequantized
weight) keeps CPU tests running.

Math: y = (x @ w_q) * scale, with w_q = round(w / scale) per output column
and scale = max|w_col| / 127 — equivalent to dequant-then-matmul because
the per-column scale factors out of the contraction.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 512
BLOCK_K = 1024


def _cdiv(a, b):
    return -(-a // b)


def quantize_int8(w: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """w [in, out] -> {"w_q": int8 [in, out], "scale": fp32 [out]}."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    w_q = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return {"w_q": w_q, "scale": scale}


def is_quantized(p) -> bool:
    return isinstance(p, dict) and "w_q" in p


def _kernel(x_ref, w_ref, scale_ref, o_ref, acc_ref, *, n_k):
    ik = pl.program_id(1)

    @pl.when(ik == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...].astype(jnp.float32)            # [M, BK]
    w = w_ref[...].astype(jnp.float32)            # [BK, BN] (dequant sans scale)
    acc_ref[...] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(ik == n_k - 1)
    def _():
        o_ref[...] = (acc_ref[...] * scale_ref[...].astype(jnp.float32)
                      ).astype(o_ref.dtype)


def int8_matmul(x: jnp.ndarray, q: Dict[str, jnp.ndarray],
                out_dtype=None) -> jnp.ndarray:
    """x [..., K] @ quantized w [K, N] -> [..., N]."""
    w_q, scale = q["w_q"], q["scale"]
    K, N = w_q.shape
    out_dtype = out_dtype or x.dtype
    lead = x.shape[:-1]
    x2 = x.reshape(-1, K)
    M = x2.shape[0]

    import os
    if jax.default_backend() != "tpu" or not os.environ.get(
            "MOLLY_INT8_PALLAS"):
        # DEFAULT: XLA fuses the int8 load + convert into the dot's operand
        # read, realizing the bandwidth win with no custom-call boundaries.
        # Measured 2148 tok/s vs 1352 for the Pallas kernel on 1.7B decode
        # (197 small custom calls/step serialize HBM prefetch) — keep the
        # kernel behind MOLLY_INT8_PALLAS for future mega-kernel work.
        y = (x2.astype(jnp.bfloat16) @ w_q.astype(jnp.bfloat16)
             ).astype(jnp.float32) * scale[None, :]
        return y.reshape(*lead, N).astype(out_dtype)

    BN = min(BLOCK_N, _cdiv(N, 128) * 128)
    BK = min(BLOCK_K, _cdiv(K, 128) * 128)
    # pad K/N to block multiples (zero rows/cols are inert; padded output
    # columns are sliced away)
    Kp, Np = _cdiv(K, BK) * BK, _cdiv(N, BN) * BN
    if Kp != K:
        x2 = jnp.pad(x2, ((0, 0), (0, Kp - K)))
        w_q = jnp.pad(w_q, ((0, Kp - K), (0, 0)))
    if Np != N:
        w_q = jnp.pad(w_q, ((0, 0), (0, Np - N)))
        scale = jnp.pad(scale, (0, Np - N))
    # pad M to the fp32 sublane multiple
    Mp = _cdiv(M, 8) * 8
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    n_k = Kp // BK

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=n_k),
        grid=(Np // BN, n_k),
        in_specs=[
            pl.BlockSpec((Mp, BK), lambda n, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BN), lambda n, k: (k, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda n, k: (0, n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Mp, BN), lambda n, k: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        scratch_shapes=[pltpu.VMEM((Mp, BN), jnp.float32)],
    )(x2, w_q, scale.reshape(1, Np))
    return out[:M, :N].reshape(*lead, N)


def linear(x: jnp.ndarray, p) -> jnp.ndarray:
    """Dispatch: quantized dict or plain weight matrix."""
    if is_quantized(p):
        return int8_matmul(x, p)
    return x @ p
