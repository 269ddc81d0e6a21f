"""Compile-only probe: the paged decode program must carry its KV pools
ROW-MAJOR through the decode while-loop.

Round-5 finding: per-token pool writes via advanced indices on
(page, off) made XLA:TPU layout assignment pick a scatter-major layout
for the LOOP-CARRIED pools — the f32[Nkv,NP,8,P] int8-page scale tiles
re-laid out with 16x lane padding (2x 5.47 GiB copies at the 3072-cap op
point -> OOM) and a full int8-pool copy per decode step to feed the
Pallas kernel's row-major operand. models/qwen3.py now updates pools
with dim-1-only scatters; this probe compiles the real decode program
on TPU (tiny model, Dh=128 so the kernel path engages) and fails if the
compiled HLO contains a copy of any pool-shaped value or a non-default
pool layout.

Run: python benchmarks/paged_layout_probe.py
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp

from molly_tpu.models import qwen3, tiny_esm, tiny_qwen3
from molly_tpu.models.fusion import FusionConfig
from molly_tpu.inference.engine import GenerationConfig
from molly_tpu.inference.paged import PagedServingEngine, _paged_decode_fn


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    tcfg = tiny_qwen3(vocab_size=512, hidden_size=256,
                      intermediate_size=512, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=128, dtype="bfloat16")
    cfg = FusionConfig(text=tcfg, dna_rna=tiny_esm(), protein=tiny_esm())
    gen = GenerationConfig(max_new_tokens=256, eos_token_id=1,
                           pad_token_id=0, do_sample=False)
    params = {"text": qwen3.fuse_for_decode(
        qwen3.init_params(tcfg, jax.random.key(0)), tcfg)}
    bad = []
    for kv_quant in ("int8", None):
        eng = PagedServingEngine(params, cfg, gen, n_slots=4,
                                 page_size=128, kv_quant=kv_quant,
                                 prefill_buckets=(128,), decode_chunk=8)
        from molly_tpu.inference.paged import _paged_prefill_decode_fn
        from molly_tpu.inference.server import Request
        fn = _paged_decode_fn(cfg, gen, eng.decode_chunk)
        txt = fn.lower(eng.params, eng.hot, eng.cold, jax.random.key(0),
                       jnp.int32(0)).compile().as_text()
        # the fused admission program's prefill scatter must not force a
        # pool relayout either (one pool copy per admission dispatch)
        k = 2
        batch = {"input_ids": jnp.ones((k, 128), jnp.int32),
                 "attention_mask": jnp.ones((k, 128), jnp.int32)}
        fpd = _paged_prefill_decode_fn(cfg, gen, eng.page_size,
                                       eng.n_pages, eng.decode_chunk,
                                       kv_quant, eng.s_pre)
        txt += fpd.lower(
            eng.params, eng.hot, eng.cold, batch,
            jnp.arange(k, dtype=jnp.int32), jnp.full((k,), 2, jnp.int32),
            eng._samp_arrays([Request(uid=None, batch={})
                              for _ in range(k)]),
            jax.random.key(1),
            jnp.full((k, eng.pages_per_seq), -1, jnp.int32),
            jnp.int32(1)).compile().as_text()
        rows = tcfg.num_hidden_layers * eng.n_pages + 1
        nkv = tcfg.num_key_value_heads
        # ONLY the full pools: [Nkv, L*NP+1, P, Dh] pages and
        # [Nkv, L*NP+1, 8, P] scale tiles
        pool_re = re.compile(
            rf"(s8|bf16|f32)\[{nkv},{rows},(?:128,128|8,128)\]"
            r"\{(\d(?:,\d)*)")
        n_copies = n_layout = 0
        for line in txt.splitlines():
            if line.lstrip().startswith("HloModule"):
                continue
            for dt, lay in pool_re.findall(line):
                if lay != "3,2,1,0":
                    n_layout += 1
                    bad.append((kv_quant, "layout", lay, line[:160]))
            if pool_re.search(line) and re.search(
                    r"%?copy[.\w]* = (s8|bf16|f32)\[", line):
                n_copies += 1
                bad.append((kv_quant, "copy", "", line[:160]))
        print(f"kv_quant={kv_quant}: pool copies={n_copies} "
              f"layout violations={n_layout}")
    if bad:
        for b in bad[:10]:
            print("BAD:", b)
        raise SystemExit(1)
    print("paged layout probe OK: pools stay row-major, no pool copies "
          "in the decode loop")


if __name__ == "__main__":
    main()
