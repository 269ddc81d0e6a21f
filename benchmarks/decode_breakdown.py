"""Serve decode-tick cost breakdown (run on the real chip).

Times the serving engine's decode-chunk executable under controlled
variations to attribute per-tick cost: sampling pipeline, KV read width,
KV dtype, slot count. Drives the same jitted code path bench --mode serve
uses (server._decode_fn) on random int8 1.7B weights.

Usage: python benchmarks/decode_breakdown.py [--slots 64] [--steps 100]
"""

import argparse
import dataclasses
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/molly_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import sys

# APPEND (not prepend: repo-root modules would shadow what the axon TPU
# plugin imports) the repo root for molly_tpu/bench imports
sys.path.append(os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def make_state(tcfg, B, max_len, gen, kv_quant=None):
    from molly_tpu.models import qwen3

    c = qwen3.init_cache(tcfg, B, max_len, quant=kv_quant)
    state = {
        "cache": c["kv"],
        **({"kv_scale": c["kv_scale"]} if "kv_scale" in c else {}),
        "valid": jnp.ones((B, max_len), jnp.int32),
        "head": jnp.int32(0),
        "n_real": jnp.full((B,), 128, jnp.int32),
        "last_tok": jnp.ones((B,), jnp.int32),
        "presence": jnp.zeros((B, tcfg.vocab_size), bool),
        "out_buf": jnp.zeros((B, gen.max_new_tokens), jnp.int32),
        "out_len": jnp.ones((B,), jnp.int32),
        "cap": jnp.full((B,), gen.max_new_tokens, jnp.int32),
        "active": jnp.ones((B,), bool),
        "finished": jnp.zeros((B,), bool),
    }
    return state


def time_chunk(params, cfg, gen, B, max_len, n_steps, kv_quant=None):
    from molly_tpu.inference.server import _decode_fn, _split_state

    prompt_cols, ring_cols = 128, max_len - 128
    fn = _decode_fn(cfg, gen, prompt_cols, ring_cols, n_steps)
    hot, cold = _split_state(make_state(cfg.text, B, max_len, gen,
                                        kv_quant))
    # warmup (compile + first-round artifact)
    for _ in range(2):
        hot, cold = fn(params, hot, cold, jax.random.key(0), jnp.int32(0))
        np.asarray(cold["out_len"])
    t0 = time.perf_counter()
    hot, cold = fn(params, hot, cold, jax.random.key(1), jnp.int32(0))
    np.asarray(cold["out_len"])
    dt = time.perf_counter() - t0
    return dt / n_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=64)
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    # NOTE: do not PYTHONPATH the repo root here — it shadows a module the
    # axon TPU plugin needs; load bench.py by path instead
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "_bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    _bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(_bench)
    _random_int8_params = _bench._random_int8_params
    from molly_tpu.models import QWEN3_PRESETS, tiny_esm
    from molly_tpu.models.fusion import FusionConfig
    from molly_tpu.inference.engine import GenerationConfig

    tcfg = QWEN3_PRESETS["qwen3-1.7b"]
    cfg = FusionConfig(text=tcfg, dna_rna=tiny_esm(), protein=tiny_esm())
    params = {"text": _random_int8_params(tcfg)}
    B, T = args.slots, 256

    full = GenerationConfig(max_new_tokens=T, do_sample=True,
                            temperature=0.8, top_p=0.95, top_k=20,
                            repetition_penalty=1.1, eos_token_id=-1,
                            pad_token_id=0)
    greedy_norp = dataclasses.replace(full, do_sample=False,
                                      repetition_penalty=1.0)

    rows = []

    def run(tag, **kw):
        ms = 1e3 * time_chunk(params, cfg, **kw)
        rows.append((tag, ms))
        print(f"{tag:55s} {ms:7.2f} ms/tick "
              f"({kw.get('B', args.slots) / ms * 1e3:6.0f} tok/s ceiling)")

    run("full sampling, bf16 KV, maxlen 384",
        gen=full, B=B, max_len=384, n_steps=args.steps)
    run("full sampling, int8 KV, maxlen 384",
        gen=full, B=B, max_len=384, n_steps=args.steps, kv_quant="int8")
    run("greedy no-penalty (sampling off), bf16 KV, maxlen 384",
        gen=greedy_norp, B=B, max_len=384, n_steps=args.steps)
    run("full sampling, bf16 KV, maxlen 192 (half KV read)",
        gen=full, B=B, max_len=192, n_steps=args.steps)
    run("full sampling, bf16 KV, maxlen 384, 32 slots",
        gen=full, B=32, max_len=384, n_steps=args.steps)


if __name__ == "__main__":
    main()
