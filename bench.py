"""Driver benchmark: decode throughput of the Qwen3-1.7B-architecture fusion
decoder on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); the baseline here is an
estimate of the reference stack's decode throughput on one A100 for the
same config (HF transformers generate + FA2, Qwen3-1.7B bf16, batch 8,
short context): ~500 tok/s. See benchmarks/README.md for the derivation;
BASELINE.json's north star is >=1.5x A100 tok/s/chip.

Run on the real chip (no JAX_PLATFORMS override). Small smoke mode:
  python bench.py --smoke   (tiny model, CPU-safe, for plumbing tests)
"""

import argparse
import json
import time

import numpy as np

A100_BASELINE_TOKS_PER_S = 500.0  # estimated reference stack, see docstring


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model for plumbing tests")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--new-tokens", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from molly_tpu.models import QWEN3_PRESETS, qwen3, tiny_qwen3
    from molly_tpu.inference.engine import GenerationConfig, \
        _generate_from_embeds

    if args.smoke:
        cfg = tiny_qwen3(num_hidden_layers=2, dtype="bfloat16")
        B, S, T = 2, 16, 8
    else:
        cfg = QWEN3_PRESETS["qwen3-1.7b"]
        B, S, T = args.batch, args.prompt_len, args.new_tokens

    params = qwen3.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)
    embeds = qwen3.embed_tokens(params, ids)
    mask = jnp.ones((B, S), jnp.int32)
    gen = GenerationConfig(max_new_tokens=T, do_sample=True,
                           temperature=0.8, top_p=0.95, top_k=20,
                           repetition_penalty=1.1,
                           eos_token_id=-1,  # never stop: measure full T
                           pad_token_id=0)

    # warmup / compile. NOTE: block_until_ready does not reliably block on
    # the tunneled 'axon' TPU platform; np.asarray forces real completion.
    toks = _generate_from_embeds(params, cfg, embeds, mask, gen,
                                 jax.random.key(1))
    np.asarray(toks)

    n_iter = 3
    t0 = time.perf_counter()
    for i in range(n_iter):
        toks = _generate_from_embeds(params, cfg, embeds, mask, gen,
                                     jax.random.key(2 + i))
        np.asarray(toks)
    dt = (time.perf_counter() - t0) / n_iter

    toks_per_s = (B * T) / dt
    print(json.dumps({
        "metric": "qwen3-1.7b decode throughput (1 chip, bf16, "
                  f"batch {B}, prompt {S}, gen {T})"
                  if not args.smoke else "smoke decode throughput",
        "value": round(toks_per_s, 1),
        "unit": "tokens/sec/chip",
        "vs_baseline": round(toks_per_s / A100_BASELINE_TOKS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
