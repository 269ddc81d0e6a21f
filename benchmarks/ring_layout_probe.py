"""Compile-only probe: the admission ring's dense KV cache must stay
row-major through the decode loops.

Sibling of paged_layout_probe.py. The adaptive ring's plain tick writes
each row's own next column (per-row dense ring columns, offline.py
_decode_tick) — a (row, column) advanced-index scatter into the
loop-carried [L, B, Nkv, S, 2Dh] cache. If XLA:TPU layout assignment
reacts the way it did for the paged pools (scatter-major loop-carry
layout + a conversion copy per use), every tick pays a full-cache copy
— a plausible source of the measured plain-ring-vs-adaptive gap
(benchmarks/README round-5 F legs). This compiles the real one-dispatch
offline program on TPU (tiny model) and counts cache-shaped copies /
non-row-major cache layouts, for the plain, adaptive, and always-spec
variants.

Run: python benchmarks/ring_layout_probe.py
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np

from molly_tpu.models import qwen3, tiny_esm, tiny_qwen3
from molly_tpu.models.fusion import FusionConfig
from molly_tpu.inference.engine import GenerationConfig
from molly_tpu.inference.offline import _run_fn


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    tcfg = tiny_qwen3(vocab_size=512, hidden_size=256,
                      intermediate_size=512, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=128, dtype="bfloat16")
    cfg = FusionConfig(text=tcfg, dna_rna=tiny_esm(), protein=tiny_esm())
    gen = GenerationConfig(max_new_tokens=64, eos_token_id=-1,
                           pad_token_id=0)
    params = {"text": qwen3.fuse_for_decode(
        qwen3.init_params(tcfg, jax.random.key(0)), tcfg)}
    n_slots, max_len, bucket, N = 8, 256, 128, 16
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, 500, (N, bucket)), jnp.int32)
    mask = jnp.ones((N, bucket), jnp.int32)
    caps = jnp.full((N,), 64, jnp.int32)

    report, bad = [], []
    for name, kw in (
            ("plain", {}),
            ("spec", {"spec_k": 8}),
            ("adaptive", {"spec_k": 8, "spec_threshold": 0.2,
                          "chunk": 32})):
        for kv_quant in ("int8", None):
            fn = _run_fn(cfg, gen, n_slots, max_len, 8, kv_quant, **kw)
            txt = fn.lower(params, ids, mask, caps, {},
                           jax.random.key(0)).compile().as_text()
            # the dense ring cache [L, n_slots, Nkv, max_len, 2Dh]
            # (+ int8 scale [L, n_slots, Nkv, max_len, 2])
            cache_re = re.compile(
                rf"(s8|bf16|f32)\[2,{n_slots},2,{max_len},(?:256|2)\]"
                r"\{(\d(?:,\d)*)")
            n_copies = n_layout = 0
            for line in txt.splitlines():
                if line.lstrip().startswith("HloModule"):
                    continue
                for dt, lay in cache_re.findall(line):
                    if lay != "4,3,2,1,0":
                        n_layout += 1
                        bad.append((name, kv_quant, "layout", lay,
                                    line[:140]))
                if cache_re.search(line) and re.search(
                        r"%?copy[.\w]* = (s8|bf16|f32)\[2,", line):
                    n_copies += 1
                    bad.append((name, kv_quant, "copy", "", line[:140]))
            report.append((name, kv_quant, n_copies, n_layout))
            print(f"{name:9s} kv={str(kv_quant):5s}: cache copies="
                  f"{n_copies} layout violations={n_layout}")
    if bad:
        for b in bad[:12]:
            print("BAD:", b)
        raise SystemExit(1)
    print("ring layout probe OK: dense cache stays row-major, no cache "
          "copies in any ring variant")


if __name__ == "__main__":
    main()
