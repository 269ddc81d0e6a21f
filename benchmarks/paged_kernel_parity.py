"""On-chip parity of the Pallas paged-attention kernel at Dh=128.

CI only exercises the XLA reference (tiny test models have Dh<=16, which
the Mosaic lane-alignment gate rejects — ops/paged_attention.py); this
script is the kernel path's on-chip evidence: serving-shaped pools
(Dh=128, page 64), bf16 and int8 pools, flash vs XLA reference.

Run on the real chip:  python benchmarks/paged_kernel_parity.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))  # repo root (script is run by path)

import jax
import jax.numpy as jnp

from molly_tpu.models.qwen3 import quantize_page_rows
from molly_tpu.ops.paged_attention import paged_attention


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)
    # qwen3-1.7b decode shapes: 16 GQA query heads over 8 KV heads, Dh=128;
    # 16 slots x 8 pages of 64 = up to 512 tokens held per slot
    B, Nq, Nkv, Dh, P, PPS = 16, 16, 8, 128, 64, 8
    NP = B * PPS + 1
    q = jnp.asarray(rng.normal(size=(B, Nq, Dh)), jnp.bfloat16)
    kp = jnp.asarray(rng.normal(size=(Nkv, NP, P, Dh)), jnp.bfloat16)
    vp = jnp.asarray(rng.normal(size=(Nkv, NP, P, Dh)), jnp.bfloat16)
    table = jnp.asarray(
        rng.permutation(NP - 1)[: B * PPS].reshape(B, PPS), jnp.int32)
    lengths = jnp.asarray(rng.integers(1, PPS * P, B), jnp.int32)

    flash = np.asarray(
        paged_attention(q, kp, vp, lengths, table, impl="flash"),
        np.float32)
    ref = np.asarray(
        paged_attention(q, kp, vp, lengths, table, impl="xla"), np.float32)
    err = np.abs(flash - ref).max()
    rel = err / max(np.abs(ref).max(), 1e-9)
    print(f"bf16 pool: max abs err={err:.5f} rel={rel:.5f}")
    assert err < 0.05, err  # bf16 accumulation-order noise only

    # int8 leg: OUR kernel (ops/paged_attention_int8) needs P % 128 == 0
    # (lane-aligned scale vectors) — rebuild the pools at page 128
    P8 = 128
    PPS8 = PPS * P // P8 if PPS * P % P8 == 0 else 4
    NP8 = B * PPS8 + 1
    kp8 = jnp.asarray(rng.normal(size=(Nkv, NP8, P8, Dh)), jnp.bfloat16)
    vp8 = jnp.asarray(rng.normal(size=(Nkv, NP8, P8, Dh)), jnp.bfloat16)
    table8 = jnp.asarray(
        rng.permutation(NP8 - 1)[: B * PPS8].reshape(B, PPS8), jnp.int32)
    lengths8 = jnp.asarray(rng.integers(1, PPS8 * P8, B), jnp.int32)
    kq, ksc = quantize_page_rows(kp8)
    vq, vsc = quantize_page_rows(vp8)
    flash8 = np.asarray(
        paged_attention(q, kq, vq, lengths8, table8, impl="flash",
                        k_scales=ksc, v_scales=vsc), np.float32)
    ref8 = np.asarray(
        paged_attention(q, kq, vq, lengths8, table8, impl="xla",
                        k_scales=ksc, v_scales=vsc), np.float32)
    err8 = np.abs(flash8 - ref8).max()
    print(f"int8 pool (page {P8}): flash-vs-xla max abs err={err8:.5f}")
    assert err8 < 0.05, err8
    ref_bf16 = np.asarray(
        paged_attention(q, kp8, vp8, lengths8, table8, impl="xla"),
        np.float32)
    errq = np.abs(flash8 - ref_bf16).max()
    print(f"int8 pool vs bf16 reference (quantization error): "
          f"max abs err={errq:.5f}")
    assert errq < 0.2, errq
    print("paged kernel parity OK (bf16 page 64 + int8 page 128 pools)")


if __name__ == "__main__":
    main()
