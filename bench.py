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

Default configuration = the flagship single-chip serving point: int8
weight-only Qwen3-1.7B at the reference's operating batch of 32
(/root/reference/scripts/infer/inference_nt_lora.sh:25-36). bf16 via
--no-int8; other presets/batches via flags.
"""

import argparse
import json
import os
import time

import numpy as np

# persistent executable cache: identical shapes/configs across bench runs
# reuse compiles instead of paying 20-240 s each per process. Salted with
# the host CPU fingerprint: XLA:CPU AOT results deserialized under
# different machine features SEGFAULT (observed; the cpu_aot_loader
# SIGILL warning is real) — this VM's CPU flags change across sessions.


def _host_tag():
    # CPU flags + model name: a same-flags host with a different
    # microarchitecture must not reuse AOT entries (a stale entry
    # segfaults on cache READ — observed twice; tests/conftest.py ditto)
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            lines = f.readlines()
        sig = "".join(line for line in lines[:30]
                      if line.startswith(("flags", "model name")))
    except OSError:
        import platform
        sig = platform.processor() or "unknown"
    return hashlib.sha1(sig.encode()).hexdigest()[:8]


os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      f"/tmp/molly_jax_cache_{_host_tag()}")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

# estimated reference-stack decode throughput on one A100 (HF generate +
# FA2, bf16, batch 8, short context) — see benchmarks/README.md
A100_BASELINES = {"qwen3-1.7b": 500.0, "qwen3-0.6b": 700.0,
                  "qwen3-4b": 400.0, "qwen3-8b": 350.0}
A100_BASELINE_TOKS_PER_S = A100_BASELINES["qwen3-1.7b"]
# the estimate's uncertainty band (HF per-step overhead 15-25 ms,
# benchmarks/README.md "A100 baseline estimate"), scaled per preset and
# carried in the bench JSON so the driver-captured artifact keeps the
# caveat, not just the prose
A100_RANGE_FRAC = (0.64, 1.06)  # 320/500, 530/500


def a100_range(base: float):
    return [round(base * A100_RANGE_FRAC[0]), round(base * A100_RANGE_FRAC[1])]


def smoke_dtype():
    """bf16 on accelerators, f32 on CPU: the MXU-native dot dtype policy
    (bf16 x bf16 -> f32, models/qwen3.py) is what --smoke exercises, but
    XLA:CPU's thunk runtime has no BF16xBF16=F32 DotThunk and dies with
    UNIMPLEMENTED — smoke mode exists precisely for CPU plumbing tests."""
    import jax
    return "float32" if jax.default_backend() == "cpu" else "bfloat16"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model for plumbing tests")
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 32 (reference operating batch) int8, "
                         "8 bf16/smoke")
    ap.add_argument("--prompt-len", type=int, default=128)
    ap.add_argument("--new-tokens", type=int, default=128)
    ap.add_argument("--mode", default="decode",
                    choices=["decode", "encoder", "ttft", "fusion", "train",
                             "serve", "spec"],
                    help="secondary metrics from BASELINE.json's spec; "
                         "serve = continuous batching on a mixed-length "
                         "workload; spec = single-stream speculative "
                         "decoding (int8 self-draft)")
    ap.add_argument("--int8", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="int8 weight-only decode (ops.quant); default on "
                         "for the main decode bench, off for --smoke and "
                         "other modes")
    ap.add_argument("--preset", default="qwen3-1.7b",
                    help="decoder preset (e.g. qwen3-8b with --int8)")
    ap.add_argument("--int8-encoders", action="store_true",
                    help="fusion mode: int8-quantize the frozen NT/ESM "
                         "encoder weights (esm.quantize_for_decode) — "
                         "frees ~1.1 GB HBM at the 8B op point to unlock "
                         "batch 8")
    ap.add_argument("--int8-experts", action="store_true",
                    help="MoE presets with --int8: also quantize the "
                         "expert stacks (ops.moe.quantize_experts) — "
                         "experts are ~all of a MoE's weight bytes")
    ap.add_argument("--remat-skip", type=int, default=0,
                    help="train mode: first N layers skip remat entirely "
                         "(residuals saved, no backward recompute) — "
                         "spend leftover HBM on recompute elimination "
                         "(configs.Qwen3Config.remat_skip_layers)")
    ap.add_argument("--train-batch", type=int, default=4,
                    help="--mode train micro-batch size")
    ap.add_argument("--remat", default="full",
                    choices=["full", "dots", "attn", "hot", "none"],
                    help="--mode train remat: full recompute, save-dots, "
                         "save-attention-outputs-only, or no remat "
                         "(max speed, max memory)")
    ap.add_argument("--seq-len", type=int, default=1024,
                    help="--mode train sequence length (reference trains "
                         "8B at 3072 — run_train_8B.sh:18-21)")
    ap.add_argument("--lce-chunk", type=int, default=256,
                    help="--mode train fused linear+CE chunk size")
    ap.add_argument("--full-ft", action="store_true",
                    help="train mode: full fine-tune (all decoder params) "
                         "instead of LoRA; qwen3-0.6b fits one chip")
    ap.add_argument("--qlora", action="store_true",
                    help="train mode: int8-quantize the frozen base under "
                         "the LoRA adapters (quantize_for_training) — "
                         "8B LoRA fits one 16 GB chip")
    ap.add_argument("--spec-workload", default="random",
                    choices=["random", "copy"],
                    help="serve mode: 'copy' first fine-tunes the preset "
                         "on-chip to continue periodic token streams, then "
                         "serves span-quoting prompts greedily — the "
                         "workload where prompt-lookup speculation pays "
                         "(molly answers quote spans of the tagged input); "
                         "'random' measures the no-match floor")
    ap.add_argument("--n-req", type=int, default=None,
                    help="serve mode: workload depth (default 4x slots — "
                         "a deep queue keeps backfill going; the static "
                         "baseline runs the same workload)")
    ap.add_argument("--decode-chunk", type=int, default=32,
                    help="serve mode: max decode steps per dispatch "
                         "(device-side early exit ends a chunk sooner "
                         "when a backfill group has accumulated)")
    ap.add_argument("--admit-batch", type=int, default=8,
                    help="serve mode: early-exit/backfill group size")
    ap.add_argument("--spec-draft", default="int8",
                    choices=["int8", "lookup"],
                    help="--mode spec draft source: int8 self-draft or "
                         "prompt-lookup (n-gram, model-free)")
    ap.add_argument("--kv-int8", action="store_true",
                    help="serve mode: int8 KV cache with per-column "
                         "scales (halves the per-step KV read; sampling "
                         "pipeline unchanged, logits carry ~1e-2 "
                         "quantization noise)")
    ap.add_argument("--offline", action="store_true",
                    help="serve mode: run the device-side admission ring "
                         "(inference.offline) — the WHOLE workload in one "
                         "dispatch (admission+prefill+decode+harvest on "
                         "device); the offline-throughput answer to "
                         "host-dispatch overhead")
    ap.add_argument("--spec-lookup", type=int, default=0,
                    help="serve --offline: prompt-lookup speculation, N "
                         "draft tokens per ring round (greedy stays "
                         "token-exact, sampled distribution-exact; "
                         "0 = plain one-token ticks)")
    ap.add_argument("--spec-adapt", type=float, default=None,
                    metavar="THRESHOLD",
                    help="with --spec-lookup: acceptance-adaptive ring — "
                         "speculate only while the acceptance EMA stays "
                         "above THRESHOLD (periodic re-probe); measures "
                         "the auto-policy against both fixed modes")
    ap.add_argument("--spec-calibrate", action="store_true",
                    help="offline ring: derive the adaptive threshold "
                         "from MEASURED plain-tick vs spec-round costs at "
                         "this operating point (offline."
                         "calibrate_spec_threshold) instead of the fixed "
                         "--spec-adapt value")
    ap.add_argument("--spec-adapt-chunk", type=int, default=32,
                    help="adaptive ring: decode ticks per spec-vs-plain "
                         "flip decision (each chunk boundary is a "
                         "lax.cond the KV pool crosses — bigger chunks "
                         "amortize the copy, flip slower)")
    ap.add_argument("--spec-adapt-probe", type=int, default=0,
                    help="adaptive ring: ALSO force a real spec chunk "
                         "every N chunks while the EMA sits below "
                         "threshold (0 = rely on the free shadow-draft "
                         "estimator in the plain ticks, the default)")
    ap.add_argument("--paged", action="store_true",
                    help="serve mode: paged-KV engine (inference.paged) "
                         "instead of the dense slot ring — per-sequence "
                         "page chains, HBM scales with tokens held")
    ap.add_argument("--page-size", type=int, default=64,
                    help="--paged: tokens per KV page")
    ap.add_argument("--kv-pages", type=int, default=None,
                    help="--paged: per-layer pool size (default fully "
                         "provisioned; lower to oversubscribe and "
                         "exercise preemption)")
    ap.add_argument("--lora-bank", type=int, default=0,
                    help="serve mode: stack N random adapters and route "
                         "requests round-robin (multi-LoRA overhead "
                         "measurement)")
    ap.add_argument("--gen-cap", type=int, default=256,
                    help="serve mode: longest generation cap (the "
                         "reference's operating point is 3072, "
                         "inference_nt_lora.sh max-length; caps are drawn "
                         "U[16, gen-cap])")
    ap.add_argument("--k-tokens", type=int, default=128,
                    help="fusion mode: encoder segment length (the "
                         "reference's operating point is 1024)")
    ap.add_argument("--prefix-len", type=int, default=0,
                    help="serve mode: length of a prompt prefix shared by "
                         "every request (prefilled once via the engine's "
                         "prefix KV cache; also measures the non-cached "
                         "rate for comparison)")
    args = ap.parse_args()

    # Flagship default: int8 1.7B decode at the reference's batch 32.
    if args.int8 is None:
        args.int8 = args.mode in ("decode", "serve") and not args.smoke
    if args.batch is None:
        # decode: the reference's operating batch; serve: the measured
        # serving sweet spot (benchmarks/README.md batch sweep)
        args.batch = 32 if args.int8 and args.mode in ("decode", "serve") \
            else 8

    if args.mode == "serve":
        return bench_serve(args)
    if args.mode == "spec":
        return bench_spec(args)
    if args.mode == "encoder":
        return bench_encoder(args)
    if args.mode == "ttft":
        return bench_ttft(args)
    if args.mode == "fusion":
        return bench_fusion(args)
    if args.mode == "train":
        return bench_train(args)

    import jax
    import jax.numpy as jnp

    from molly_tpu.models import QWEN3_PRESETS, qwen3, tiny_qwen3
    from molly_tpu.inference.engine import GenerationConfig, \
        _generate_from_embeds

    if args.smoke:
        cfg = tiny_qwen3(num_hidden_layers=2, dtype=smoke_dtype())
        B, S, T = 2, 16, 8
    else:
        cfg = QWEN3_PRESETS[args.preset]
        B, S, T = args.batch, args.prompt_len, args.new_tokens

    if args.int8:
        # build int8 params directly (quantizing a materialized bf16 8B
        # would OOM the chip first; values don't affect throughput)
        if cfg.num_experts:
            # MoE presets fit in bf16; quantize from a real init instead
            # of the big-dense _random_int8_params shortcut. Default is
            # attention/head-only int8; --int8-experts also quantizes
            # the expert stacks (~all of a MoE's weight bytes).
            # donated bf16 tree: XLA frees each stack as its int8 is
            # produced (bf16 moe-mini + int8 copy OOM'd the 16 GB chip)
            params = jax.jit(
                lambda p: qwen3.quantize_for_decode(
                    p, cfg, moe_experts=args.int8_experts),
                donate_argnums=0)(qwen3.init_params(cfg, jax.random.key(0)))
        else:
            params = _random_int8_params(cfg)
    else:
        params = qwen3.init_params(cfg, jax.random.key(0))
        if not args.smoke:
            params = qwen3.fuse_for_decode(params, cfg)
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
    base = A100_BASELINES.get(args.preset, 500.0)
    if cfg.num_experts:
        # MoE presets have no reference analogue (the reference is
        # dense-only); report raw throughput with no baseline claim
        base = 0.0
    print(json.dumps({
        "metric": f"{args.preset} decode throughput (1 chip, "
                  f"{('int8' if args.int8_experts else 'int8-attn') if args.int8 and cfg.num_experts else 'int8' if args.int8 else 'bf16'}, "
                  f"batch {B}, prompt {S}, gen {T}; "
                  + ("MoE: no reference baseline (dense-only reference)"
                     if cfg.num_experts else
                     f"baseline = ESTIMATED reference stack on A100 "
                     f"{base:.0f} tok/s, unmeasured, see "
                     f"benchmarks/README.md") + ")"
                  if not args.smoke else "smoke decode throughput",
        "value": round(toks_per_s, 1),
        "unit": "tokens/sec/chip",
        "vs_baseline": round(toks_per_s / base, 3) if base else 0.0,
        # uncertainty of the ESTIMATED denominator rides with the artifact
        "baseline_range": a100_range(base) if base else None,
    }))


def _int8_stack_fn():
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("rows", "cols", "n"))
    def _int8_stack(k, *, rows, cols, n):
        # one layer at a time under lax.map: the threefry uint32
        # intermediates stay per-layer. Generating the full [L, din,
        # dout] in one call (random.randint OR random.bits) materializes
        # 4x-8x intermediates — 27 GB at 8B's gateup — and OOMs the chip
        # before the bench starts.
        def one(kk):
            return jax.lax.bitcast_convert_type(
                jax.random.bits(kk, (rows, cols), jnp.uint8), jnp.int8)
        return jax.lax.map(one, jax.random.split(k, n))

    def qrand(k, shape):
        # per-output-channel scales, stacked like the weights
        scale_shape = shape[:-2] + (shape[-1],)
        if len(shape) == 3:
            w = _int8_stack(k, rows=shape[1], cols=shape[2], n=shape[0])
        else:
            w = _int8_stack(k, rows=shape[0], cols=shape[1], n=1)[0]
        return {"w_q": w,
                "scale": jnp.full(scale_shape, 2e-4, jnp.float32)}

    return qrand


def _random_bf16_embed(cfg, k):
    import jax
    import jax.numpy as jnp
    H = cfg.hidden_size

    # chunked for the same reason as _int8_stack (8B: [151936, 4096])
    n = 8 if cfg.vocab_size % 8 == 0 else 1
    rows = cfg.vocab_size // n
    return jax.jit(lambda kk: jax.lax.map(
        lambda ki: (0.02 * jax.random.normal(
            ki, (rows, H), jnp.float32)).astype(jnp.bfloat16),
        jax.random.split(kk, n)).reshape(cfg.vocab_size, H))(k)


def _random_int8_params(cfg):
    import jax
    import jax.numpy as jnp

    key = jax.random.key(0)
    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    dims = {"qkv_proj": (H, cfg.q_dim + 2 * cfg.kv_dim),
            "o_proj": (cfg.q_dim, H),
            "gateup_proj": (H, 2 * I), "down_proj": (I, H)}
    qrand = _int8_stack_fn()

    keys = iter(jax.random.split(key, 16))
    layers = {
        "input_norm": jnp.ones((L, H), jnp.bfloat16),
        "post_attn_norm": jnp.ones((L, H), jnp.bfloat16),
        "qk_norm": jnp.ones(
            (L, cfg.num_attention_heads + cfg.num_key_value_heads,
             cfg.head_dim), jnp.bfloat16),
    }
    for name, (din, dout) in dims.items():
        layers[name] = qrand(next(keys), (L, din, dout))

    params = {
        "embed": _random_bf16_embed(cfg, next(keys)),
        "layers": layers,
        "final_norm": jnp.ones((H,), jnp.bfloat16),
        "lm_head_q": qrand(next(keys), (H, cfg.vocab_size)),
    }
    return params


def _random_qlora_text_params(cfg):
    """UNFUSED int8 base in quantize_for_training's exact layout
    ({w_q, scale} per QUANT_TARGET, bf16 norms/embed/head) built int8-
    FIRST — materializing a bf16 8B (16.4 GB) just to quantize it OOMs
    the 16 GB chip before the QLoRA bench starts. Values don't affect
    step timing."""
    import jax
    import jax.numpy as jnp

    key = jax.random.key(0)
    H, I, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    dims = {"q_proj": (H, cfg.q_dim), "k_proj": (H, cfg.kv_dim),
            "v_proj": (H, cfg.kv_dim), "o_proj": (cfg.q_dim, H),
            "gate_proj": (H, I), "up_proj": (H, I), "down_proj": (I, H)}
    qrand = _int8_stack_fn()
    keys = iter(jax.random.split(key, 16))
    layers = {
        "input_norm": jnp.ones((L, H), jnp.bfloat16),
        "post_attn_norm": jnp.ones((L, H), jnp.bfloat16),
        "q_norm": jnp.ones((L, cfg.head_dim), jnp.bfloat16),
        "k_norm": jnp.ones((L, cfg.head_dim), jnp.bfloat16),
    }
    for name, (din, dout) in dims.items():
        layers[name] = qrand(next(keys), (L, din, dout))
    params = {
        "embed": _random_bf16_embed(cfg, next(keys)),
        "layers": layers,
        "final_norm": jnp.ones((H,), jnp.bfloat16),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _random_bf16_embed(cfg, next(keys)).T
    return params


def bench_spec(args):
    """Single-stream (B=1) speculative decoding: bf16 target with its own
    int8 quantization as the draft (no second checkpoint). Output is
    token-exact vs plain greedy; speedup = accepted drafts per verify.
    NOTE with random bench weights the draft/target argmax agreement is a
    PESSIMISTIC floor (near-uniform logits flip under quantization noise);
    real checkpoints agree far more often."""
    import jax
    import jax.numpy as jnp

    from molly_tpu.models import QWEN3_PRESETS, qwen3, tiny_qwen3
    from molly_tpu.inference.engine import GenerationConfig, \
        _generate_from_embeds
    from molly_tpu.inference.speculative import generate_speculative

    if args.smoke:
        cfg = tiny_qwen3(num_hidden_layers=2, dtype=smoke_dtype())
        P, T, k = 16, 8, 2
    else:
        cfg = QWEN3_PRESETS[args.preset]
        P, T, k = args.prompt_len, args.new_tokens, 4
    base = qwen3.init_params(cfg, jax.random.key(0))
    lookup = args.spec_draft == "lookup"
    draft = None if lookup else qwen3.quantize_for_decode(base, cfg)
    target = base if args.smoke else qwen3.fuse_for_decode(base, cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, P)), jnp.int32)
    gen = GenerationConfig(max_new_tokens=T, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=-1,
                           pad_token_id=0)

    def run_plain():
        embeds = qwen3.embed_tokens(target, ids)
        return _generate_from_embeds(target, cfg, embeds,
                                     jnp.ones((1, P), jnp.int32), gen,
                                     jax.random.key(0))

    def run_spec():
        if lookup:
            from molly_tpu.inference.speculative import generate_lookup
            return generate_lookup(target, cfg, ids, gen, k=2 * k, n=3)
        return generate_speculative(target, cfg, draft, cfg, ids, gen, k=k)

    ref = np.asarray(run_plain())
    got = np.asarray(run_spec())
    # exact-arithmetic parity is test-proven (tests/test_speculative.py);
    # in bf16 with RANDOM weights the logits are near-uniform and the
    # different verify matmul shape flips near-tie argmaxes — report the
    # match fraction rather than asserting
    match = float(np.mean(ref == got))

    def rate(f, n=3):
        t0 = time.perf_counter()
        for _ in range(n):
            np.asarray(f())
        return T * n / (time.perf_counter() - t0)

    plain = rate(run_plain)
    spec = rate(run_spec)
    draft_desc = ("prompt-lookup n=3, model-free" if lookup
                  else "int8 self-draft")
    print(json.dumps({
        "metric": f"{args.preset if not args.smoke else 'smoke'} "
                  f"single-stream speculative decode (bf16 target, "
                  f"{draft_desc}, k={2 * k if lookup else k}, prompt {P}, "
                  f"gen {T}; baseline = "
                  f"plain greedy {plain:.0f} tok/s; output match "
                  f"{match:.2f} — bf16 near-ties on random weights; "
                  f"random-weight draft agreement is a pessimistic floor)",
        "value": round(spec, 1),
        "unit": "tokens/sec/chip",
        "vs_baseline": round(spec / plain, 3),
    }))


def _train_copy_model(tcfg, period=16, steps=300, B=16, S=256):
    """Fine-tune the preset on-chip to continue periodic token streams —
    the span-quoting proxy task (molly answers quote spans of the tagged
    input; the CPU round-count experiment in benchmarks/README 'In-ring
    speculation' trained the same task). ~2 min for qwen3-0.6b."""
    import sys
    from functools import partial

    import jax
    import jax.numpy as jnp
    import optax

    from molly_tpu.models import fusion, qwen3
    from molly_tpu.ops.lce import causal_lm_loss

    params = qwen3.init_params(tcfg, jax.random.key(0))
    # per-layer remat: without it the step saves 28 layers of [B,S,H]
    # activations (~6.5 GB for qwen3-0.6b at B=16,S=257) on top of the
    # params+moments and compile-OOMs the 16 GB chip (r4onchip3 leg K')
    import dataclasses as _dc
    tcfg = _dc.replace(tcfg, remat=True, remat_policy="full")
    opt = optax.adamw(3e-4)
    ost = opt.init(params)
    rng = np.random.default_rng(42)
    reps = -(-(S + 1) // period)  # ceil

    def make_ids():
        base = rng.integers(1, tcfg.vocab_size, (B, period))
        return jnp.asarray(np.tile(base, (1, reps))[:, : S + 1], jnp.int32)

    # donate params+opt state: without donation the step holds TWO copies
    # of (params, m, v) across the call boundary, which OOM'd the 16 GB
    # chip for qwen3-0.6b (r4_onchip2 leg I) — donation halves the peak
    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, ost, ids):
        def loss_fn(p):
            h, _ = qwen3.forward_hidden(p, tcfg, input_ids=ids)
            w = fusion.lm_head_weight(p, tcfg)
            loss, _, _ = causal_lm_loss(h, w, ids)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, ost2 = opt.update(grads, ost, params)
        return optax.apply_updates(params, upd), ost2, loss

    loss = None
    for _ in range(steps):
        params, ost, loss = step_fn(params, ost, make_ids())
    print(f"[copy-train] {steps} steps, final loss {float(loss):.4f}",
          file=sys.stderr)
    del ost
    return params


def bench_serve(args):
    """Continuous batching (inference.server) on a mixed-length workload:
    half the requests generate 32 tokens, half 256. Static batching (the
    reference's scheme, inference_lora.py:284-321) pays max(len) for every
    prompt in a batch; the serving engine backfills freed slots. Reports
    engine throughput and the static-batch equivalent for the same work."""
    import dataclasses
    import jax
    import jax.numpy as jnp

    from molly_tpu.models import ESM_PRESETS, QWEN3_PRESETS, qwen3, \
        tiny_esm, tiny_qwen3
    from molly_tpu.models.fusion import FusionConfig
    from molly_tpu.inference.engine import GenerationConfig
    from molly_tpu.inference.server import Request, ServingEngine

    # unpredictable generation lengths (the real serving regime): caps
    # drawn uniformly in [short_t, long_t]; static batching cannot know
    # them and pays long_t decode steps for every batch
    short_t, long_t = (4, 16) if args.smoke else (16, args.gen_cap)
    n_slots = 4 if args.smoke else args.batch
    # deep queue by default: a serving engine's throughput regime is a
    # backlog that keeps freed slots backfilled; the static baseline pays
    # the identical workload
    n_req = args.n_req or (8 if args.smoke else 4 * n_slots)
    if args.smoke:
        tcfg = tiny_qwen3(num_hidden_layers=2, dtype=smoke_dtype())
        prompt, max_len, buckets = 16, 64, (16,)
    else:
        tcfg = QWEN3_PRESETS[args.preset]
        # spec_lookup headroom keeps run_offline from clipping caps, so
        # the ±spec runs serve the IDENTICAL workload
        prompt, max_len, buckets = args.prompt_len, \
            args.prompt_len + long_t + args.spec_lookup, (args.prompt_len,)
    cfg = FusionConfig(text=tcfg, dna_rna=tiny_esm(), protein=tiny_esm())
    copy_period = 16
    if args.spec_workload == "copy":
        assert not args.smoke and not args.prefix_len and not args.lora_bank
        assert not tcfg.num_experts, "copy workload: dense presets"
        trained = _train_copy_model(tcfg, period=copy_period)
        text = (qwen3.quantize_for_decode(trained, tcfg) if args.int8
                else qwen3.fuse_for_decode(trained, tcfg))
        del trained
    elif args.int8:
        if tcfg.num_experts:
            # MoE: quantize a real init (experts via --int8-experts); the
            # dense-shaped _random_int8_params shortcut doesn't apply
            text = jax.jit(
                lambda p: qwen3.quantize_for_decode(
                    p, tcfg, moe_experts=args.int8_experts),
                donate_argnums=0)(qwen3.init_params(tcfg, jax.random.key(0)))
        else:
            # multi-LoRA banks ride the fused int8 path (per-target
            # deltas on fused column slices, models.lora.apply_lora_fused)
            text = _random_int8_params(tcfg)
    else:
        text = qwen3.init_params(tcfg, jax.random.key(0))
        if not args.smoke:
            text = qwen3.fuse_for_decode(text, tcfg)
    params = {"text": text}
    bank = None
    if args.lora_bank:
        # N random-A/zero-B adapters: identical bytes + FLOPs to real
        # ones — measures the multi-LoRA serving overhead
        assert not args.offline and not args.prefix_len, (
            "--lora-bank: online engine only, no shared prefix")
        from molly_tpu.models.lora import (LoraConfig, init_lora,
                                           stack_adapters)
        lb_cfg = LoraConfig(r=16, dropout=0.0)
        bank = stack_adapters(
            [init_lora(tcfg, lb_cfg, jax.random.key(100 + i))
             for i in range(args.lora_bank)],
            scales=[lb_cfg.scale] * args.lora_bank)
    if args.spec_workload == "copy":
        # span-quoting workloads serve greedy; repetition penalty off so
        # the trained continuation IS the quoted span (the control run
        # uses the identical config — only spec_lookup differs)
        gen = GenerationConfig(max_new_tokens=long_t, do_sample=False,
                               repetition_penalty=1.0, eos_token_id=-1,
                               pad_token_id=0)
    else:
        gen = GenerationConfig(max_new_tokens=long_t, do_sample=True,
                               temperature=0.8, top_p=0.95, top_k=20,
                               repetition_penalty=1.1, eos_token_id=-1,
                               pad_token_id=0)
    rng = np.random.default_rng(0)

    cap_rng = np.random.default_rng(7)
    caps = cap_rng.integers(short_t, long_t + 1, n_req)
    s_pre = args.prefix_len
    prefix = (rng.integers(1, tcfg.vocab_size, s_pre).astype(np.int32)
              if s_pre else None)

    def mk_reqs():
        reqs = []
        for i in range(n_req):
            if args.spec_workload == "copy":
                # per-request periodic stream: the greedy continuation
                # quotes the period, so the trailing-3-gram lookup drafts
                # from the prompt and the target accepts
                base = rng.integers(1, tcfg.vocab_size, (1, copy_period))
                reps = -(-prompt // copy_period)
                ids = np.tile(base, (1, reps))[:, :prompt].astype(np.int32)
            else:
                ids = rng.integers(1, tcfg.vocab_size,
                                   (1, prompt - s_pre)).astype(np.int32)
            if s_pre:
                ids = np.concatenate([prefix[None], ids], axis=1)
            reqs.append(Request(
                uid=i,
                batch={"input_ids": ids,
                       "attention_mask": np.ones((1, prompt), np.int32)},
                max_new_tokens=int(caps[i]),
                adapter=(i % (args.lora_bank + 1)) if args.lora_bank
                else 0))
        # longest-processing-time-first admission: per-request caps are
        # known here, so start the long generations early and backfill
        # freed slots with the short ones (shrinks the tail)
        reqs.sort(key=lambda r: -r.max_new_tokens)
        return reqs

    def run_once(use_prefix=False, report=False):
        eng = ServingEngine(
            params, cfg, gen, n_slots=n_slots, max_len=max_len,
            prefill_buckets=((prompt - s_pre,) if use_prefix else buckets),
            decode_chunk=1 if args.smoke else args.decode_chunk,
            admit_batch=args.admit_batch,
            kv_quant="int8" if args.kv_int8 else None,
            prefix_ids=prefix if use_prefix else None,
            lora_bank=bank)
        eng.precompile()  # timed pass must never hit a cold compile
        t0 = time.perf_counter()
        results = eng.run(mk_reqs())
        dt = time.perf_counter() - t0
        total = sum(len(v) for v in results.values())
        if report:  # scheduler-overhead breakdown (stderr; JSON stays 1 line)
            import sys
            ticks = int(np.asarray(eng.cold["head"]))
            occ = total / max(1, ticks * n_slots)
            st = eng.stats
            print(f"[serve] useful={total} decode_ticks={ticks} "
                  f"slot_occupancy={occ:.3f} "
                  f"idle_slot_ticks={ticks * n_slots - total} "
                  f"wall={dt:.2f}s rounds={st['rounds']} "
                  f"decode_dispatches={st['decode_dispatches']} "
                  f"fused_dispatches={st['fused_dispatches']} "
                  f"prefill_dispatches={st['prefill_dispatches']} "
                  f"prefill_rows={st['prefill_rows']} "
                  f"fetch_wait={st['fetch_wait_s']:.2f}s", file=sys.stderr)
        return total, dt

    # MEASURED static-batching baseline: the reference's scheme
    # (inference_lora.py:284-321) — fixed batches of n_slots prompts, every
    # prompt pays max_new_tokens decode steps, useful tokens = caps
    from molly_tpu.inference.engine import _generate_from_embeds

    def run_static():
        reqs = mk_reqs()
        t0 = time.perf_counter()
        total = 0
        for i in range(0, n_req, n_slots):
            chunk = reqs[i:i + n_slots]
            ids = jnp.asarray(np.concatenate(
                [r.batch["input_ids"] for r in chunk]))
            mask = jnp.ones(ids.shape, jnp.int32)
            embeds = qwen3.embed_tokens(params["text"], ids)
            # same KV layout as the ring under --kv-int8: at gen-cap 3072
            # the bf16 static pool alone is ~5.9 GB and crashed the worker
            toks = _generate_from_embeds(params["text"], tcfg, embeds,
                                         mask, gen, jax.random.key(i),
                                         kv_quant="int8" if args.kv_int8
                                         else None)
            np.asarray(toks)
            total += sum(r.max_new_tokens for r in chunk)
        return total, time.perf_counter() - t0

    spec_threshold = args.spec_adapt

    def run_ring(report=False):
        """Device-side admission ring: one dispatch for the workload."""
        nonlocal spec_threshold
        from molly_tpu.inference.offline import (calibrate_spec_threshold,
                                                 run_offline)
        reqs = mk_reqs()
        ids = np.concatenate([r.batch["input_ids"] for r in reqs])
        mask = np.ones(ids.shape, np.int32)
        ocaps = np.asarray([r.max_new_tokens for r in reqs], np.int32)
        if args.spec_calibrate and args.spec_lookup:
            import sys
            cal = calibrate_spec_threshold(
                params, cfg, gen, n_slots=n_slots, max_len=max_len,
                bucket=ids.shape[1], spec_k=args.spec_lookup,
                kv_quant="int8" if args.kv_int8 else None)
            spec_threshold = cal["threshold"]
            print(f"[calibrate] t_plain_tick={cal['t_plain_tick']*1e3:.2f}ms"
                  f" t_spec_round={cal['t_spec_round']*1e3:.2f}ms"
                  f" ratio={cal['ratio']:.3f}"
                  f" threshold={spec_threshold:.4f}", file=sys.stderr)
            args.spec_calibrate = False  # once per process
        t0 = time.perf_counter()
        out = run_offline(params, cfg, gen, ids, mask, ocaps,
                          n_slots=n_slots, max_len=max_len,
                          admit_group=args.admit_batch,
                          kv_quant="int8" if args.kv_int8 else None,
                          spec_lookup=args.spec_lookup,
                          spec_threshold=spec_threshold,
                          spec_probe_every=args.spec_adapt_probe,
                          spec_chunk=args.spec_adapt_chunk)
        dt = time.perf_counter() - t0
        total = int(out["lengths"].sum())
        if report:
            import sys
            occ = total / max(1, out["decode_ticks"] * n_slots)
            spec_note = (f" accepted={out['accepted']}"
                         if args.spec_lookup else "")
            if args.spec_adapt is not None:
                spec_note += (f" spec_rounds={out['spec_ticks']}"
                              f" ema={out['spec_ema']:.3f}")
            print(f"[offline] useful={total} "
                  f"decode_ticks={out['decode_ticks']} "
                  f"admit_ticks={out['ticks'] - out['decode_ticks']} "
                  f"slot_occupancy={occ:.3f} wall={dt:.2f}s "
                  f"dispatches=1{spec_note}", file=sys.stderr)
        return total, dt

    def run_paged(report=False):
        from molly_tpu.inference.paged import PagedServingEngine
        P = args.page_size
        # shared prefix: its full pages are stored ONCE in the pool and
        # shared by every slot's page table; buckets bound the suffix
        s_share = (s_pre // P) * P
        eng = PagedServingEngine(
            params, cfg, gen, n_slots=n_slots, page_size=P,
            n_pages=args.kv_pages,
            prefill_buckets=(-(-(prompt - s_share) // P) * P,),
            decode_chunk=1 if args.smoke else args.decode_chunk,
            admit_batch=args.admit_batch,
            kv_quant="int8" if args.kv_int8 else None,
            prefix_ids=prefix if s_pre else None, lora_bank=bank)
        eng.precompile()
        t0 = time.perf_counter()
        results = eng.run(mk_reqs())
        dt = time.perf_counter() - t0
        total = sum(len(v) for v in results.values())
        if report:
            import sys
            st = eng.stats
            print(f"[paged] useful={total} wall={dt:.2f}s "
                  f"rounds={st['rounds']} "
                  f"fused_dispatches={st['fused_dispatches']} "
                  f"decode_dispatches={st['decode_dispatches']} "
                  f"pages={eng.n_pages} pages_peak={st['pages_peak']} "
                  f"preemptions={st['preemptions']} "
                  f"fetch_wait={st['fetch_wait_s']:.2f}s",
                  file=sys.stderr)
        return total, dt

    run_engine = (run_ring if args.offline
                  else run_paged if args.paged else run_once)
    run_engine()   # warmup/compile
    run_static()
    total, dt = run_engine(report=True)
    s_total, s_dt = run_static()
    static_rate = s_total / s_dt
    prefix_note = ""
    if s_pre and args.paged:
        P = args.page_size
        prefix_note = (f", {(s_pre // P) * P}-token shared prefix pages "
                       f"(stored once, {s_pre // P} pages)")
    elif s_pre and not args.offline:
        run_once(use_prefix=True)  # warmup the prefix-path executables
        plain_rate = total / dt
        total, dt = run_once(use_prefix=True, report=True)
        prefix_note = (f", {s_pre}-token shared prefix KV-cached "
                       f"(non-cached engine: {plain_rate:.0f} tok/s)")
    engine_name = (
        "device-side admission ring (1-dispatch offline)" if args.offline
        else f"paged-KV serving (page {args.page_size}"
             f"{f', pool {args.kv_pages}' if args.kv_pages else ''})"
        if args.paged else "continuous-batching serving")
    print(json.dumps({
        "metric": f"{args.preset if not args.smoke else 'smoke'} "
                  f"{engine_name} "
                  f"({'int8' if args.int8 else 'bf16'}"
                  f"{', int8 KV' if args.kv_int8 else ''}"
                  f"{f', lookup-spec k={args.spec_lookup}' if args.spec_lookup else ''}"
                  f"""{f" adaptive@{spec_threshold:.3f}{' (cost-calibrated)' if spec_threshold != args.spec_adapt else ''}" if spec_threshold is not None else ''}"""
                  f"{', copy-trained span-quoting workload (greedy)' if args.spec_workload == 'copy' else ''}"
                  f"{f', multi-LoRA bank of {args.lora_bank} (r=16)' if args.lora_bank else ''}"
                  f", {n_slots} slots, "
                  f"{n_req} reqs, gen lengths U[{short_t},{long_t}], "
                  f"prompt {prompt}{prefix_note}; baseline = MEASURED "
                  f"static batching, same workload, "
                  f"{static_rate:.0f} useful tok/s)",
        "value": round(total / dt, 1),
        "unit": "tokens/sec/chip",
        "vs_baseline": round(total / dt / static_rate, 3),
    }))


# v5e peak bf16 matmul throughput (datasheet; the MFU denominator)
V5E_PEAK_BF16_FLOPS = 197e12


def train_flops_per_token(tcfg, S: int, *, full_ft: bool) -> float:
    """Analytic MODEL FLOPs per trained token for the decoder (standard
    MFU convention: 2*params*tokens per matmul pass, attention quadratic
    included, remat recompute EXCLUDED). Backward through a frozen matmul
    computes only the activation grad (1x fwd); trainable adds the weight
    grad (another 1x). LoRA => ~2x fwd + eps; full FT => 3x fwd."""
    d, L = tcfg.hidden_size, tcfg.num_hidden_layers
    dh = tcfg.head_dim
    n_qkvo = (tcfg.num_attention_heads * dh * d * 2        # q + o
              + 2 * tcfg.num_key_value_heads * dh * d)     # k + v
    n_mlp = 3 * d * tcfg.intermediate_size
    if tcfg.num_experts:
        # sparse MoE: each token touches only its top-k experts (MFU
        # counts ACTIVE params) + the [H, E] router
        n_mlp = (tcfg.num_experts_per_tok * n_mlp
                 + d * tcfg.num_experts)
    n_body = L * (n_qkvo + n_mlp)
    n_head = d * tcfg.vocab_size
    attn_quad = 4 * S * tcfg.num_attention_heads * dh * L  # qk^T + a@v
    fwd = 2 * (n_body + n_head) + attn_quad
    return (3.0 if full_ft else 2.0) * fwd


def bench_train(args):
    """Fine-tune step throughput. Default: LoRA (the reference's flagship
    recipe) — fusion model, frozen base + encoders, remat, fused LCE.
    --full-ft trains all decoder params (0.6B is the single-chip fit).
    Reports achieved model TFLOP/s and MFU vs v5e bf16 peak, and the
    input-pipeline wait share (host batches via data.pipeline.prefetch)."""
    import dataclasses
    import jax
    import jax.numpy as jnp

    from molly_tpu.models import ESM_PRESETS, QWEN3_PRESETS, fusion
    from molly_tpu.models.fusion import FusionConfig
    from molly_tpu.models.lora import LoraConfig
    from molly_tpu.training import (TrainConfig, attach_lora,
                                    init_train_state, make_train_step)

    text = dataclasses.replace(QWEN3_PRESETS[args.preset],
                               remat=args.remat != "none",
                               remat_policy=(args.remat
                                             if args.remat in ("dots", "attn", "hot")
                                             else "full"),
                               remat_skip_layers=args.remat_skip)
    cfg = FusionConfig(
        text=text,
        dna_rna=dataclasses.replace(ESM_PRESETS["nt-500m"],
                                    dtype="bfloat16"),
        protein=dataclasses.replace(ESM_PRESETS["esm2-8m"],
                                    dtype="bfloat16"),
        dna_rna_k_tokens=128, protein_k_tokens=128)
    B, S = args.train_batch, args.seq_len
    rng = np.random.default_rng(0)
    labels = np.full((B, S), -100, np.int32)
    labels[:, S // 2:] = rng.integers(1, cfg.text.vocab_size, (B, S // 2))
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(0, cfg.text.vocab_size, (B, S)), jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(labels),
        "dna_rna_tokens": jnp.asarray(rng.integers(6, 4102, (B, 1, 128)),
                                      jnp.int32),
        "dna_rna_pos": jnp.asarray([[1]] * B, jnp.int32),
        "protein_tokens": jnp.full((B, 1, 128), 1, jnp.int32),
        "protein_pos": jnp.full((B, 1), -1, jnp.int32),
        "task_label": jnp.asarray(rng.integers(0, 20, (B,)), jnp.int32),
    }
    assert not (args.qlora and args.full_ft), "--qlora is a LoRA recipe"
    if args.qlora:
        # int8-first init: an 8B bf16 tree (16.4 GB) OOMs the chip before
        # quantize_for_training could halve it (_random_qlora_text_params)
        import dataclasses as _dc
        stub = _dc.replace(cfg, text=_dc.replace(
            text, num_hidden_layers=1, hidden_size=text.hidden_size))
        params = fusion.init_params(stub, jax.random.key(0))
        params["text"] = _random_qlora_text_params(text)
    else:
        params = fusion.init_params(cfg, jax.random.key(0))
    if args.full_ft:
        tc = TrainConfig(learning_rate=1e-5, total_steps=100,
                         train_bio=False, train_mlp=True, train_llm=True,
                         lce_chunk=args.lce_chunk)
        recipe = "full fine-tune"
    else:
        lcfg = LoraConfig(r=64, dropout=0.05)
        tc = TrainConfig(learning_rate=1e-4, total_steps=100, lora=lcfg,
                         lce_chunk=args.lce_chunk)
        params = attach_lora(params, cfg, lcfg, jax.random.key(3),
                             dtype="bfloat16")
        recipe = "LoRA fine-tune"
        if args.qlora:
            # int8 frozen base (QLoRA): 8B LoRA fits ONE 16 GB chip —
            # the reference needs 8 GPUs + ZeRO-2 for this model class
            recipe = "QLoRA (int8 base) fine-tune"
    state = init_train_state(params, tc)
    step = jax.jit(make_train_step(cfg, tc), donate_argnums=0)
    state, m = step(state, batch, jax.random.key(1))
    float(m["loss"])

    # input-wait share: feed the steps through the real async pipeline
    # (prefetch thread re-serving the same host batch) and time the gap
    # between a step's dispatch and the next batch being ready
    from molly_tpu.data.pipeline import prefetch
    host_batch = {k: np.asarray(v) for k, v in batch.items()}
    n = 6
    batches = prefetch((dict(host_batch) for _ in range(n)), depth=2)
    input_wait = 0.0
    t0 = time.perf_counter()
    for i, hb in enumerate(batches):
        tw = time.perf_counter()
        db = jax.tree.map(jnp.asarray, hb)
        input_wait += time.perf_counter() - tw
        state, m = step(state, db, jax.random.key(2 + i))
        float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    tok_s = B * S / dt
    flops = train_flops_per_token(text, S, full_ft=args.full_ft) * tok_s
    mfu = flops / V5E_PEAK_BF16_FLOPS
    print(json.dumps({
        "metric": f"{args.preset} {recipe} step (fusion model, "
                  f"remat={args.remat}, "
                  f"1 chip, seq {S}, micro-bs {B}; model FLOPs exclude "
                  f"remat recompute; no reference train baseline exists "
                  f"— BASELINE.md — so vs_baseline is 0)",
        "value": round(tok_s, 1), "unit": "tokens/sec/chip",
        "vs_baseline": 0.0,
        "tflops": round(flops / 1e12, 1),
        "mfu": round(mfu, 3),
        "input_wait_frac": round(input_wait / (dt * n), 4),
    }))


def bench_fusion(args):
    """Tri-encoder fusion batched inference with KV cache (BASELINE.json
    config 3): prompt with injected DNA+protein segments, sampled decode."""
    import dataclasses
    import jax
    import jax.numpy as jnp

    from molly_tpu.models import ESM_PRESETS, QWEN3_PRESETS, esm, fusion,         qwen3
    from molly_tpu.models.fusion import FusionConfig
    from molly_tpu.inference.engine import GenerationConfig,         _generate_from_embeds

    K = args.k_tokens
    cfg = FusionConfig(
        text=QWEN3_PRESETS[args.preset],
        dna_rna=dataclasses.replace(ESM_PRESETS["nt-500m"],
                                    dtype="bfloat16"),
        protein=dataclasses.replace(ESM_PRESETS["esm2-650m"],
                                    dtype="bfloat16"),
        dna_rna_k_tokens=K, protein_k_tokens=K)
    def enc_params(ecfg, key):
        p = esm.init_params(ecfg, key)
        return esm.quantize_for_decode(p) if args.int8_encoders else p

    params = {
        "text": (_random_int8_params(cfg.text) if args.int8 else
                 qwen3.init_params(cfg.text, jax.random.key(0))),
        "dna_rna": enc_params(cfg.dna_rna, jax.random.key(1)),
        "protein": enc_params(cfg.protein, jax.random.key(2)),
        "dna_rna_projector": {
            "kernel": jnp.zeros((cfg.dna_rna.hidden_size,
                                 cfg.text.hidden_size), jnp.bfloat16),
            "bias": jnp.zeros((cfg.text.hidden_size,), jnp.bfloat16)},
        "protein_projector": {
            "kernel": jnp.zeros((cfg.protein.hidden_size,
                                 cfg.text.hidden_size), jnp.bfloat16),
            "bias": jnp.zeros((cfg.text.hidden_size,), jnp.bfloat16)},
    }
    B, T = args.batch, args.new_tokens
    S = args.prompt_len + 2 * (K + 2)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(
            rng.integers(0, cfg.text.vocab_size, (B, S)), jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "dna_rna_tokens": jnp.asarray(rng.integers(6, 4102, (B, 1, K)),
                                      jnp.int32),
        "dna_rna_pos": jnp.asarray([[1]] * B, jnp.int32),
        "protein_tokens": jnp.asarray(rng.integers(4, 24, (B, 1, K)),
                                      jnp.int32),
        "protein_pos": jnp.asarray([[K + 4]] * B, jnp.int32),
    }
    gen = GenerationConfig(max_new_tokens=T, do_sample=True,
                           temperature=0.8, top_p=0.95, top_k=20,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)

    from molly_tpu.inference.engine import generate as fusion_generate

    def run(key):
        return fusion_generate(params, cfg, batch, gen, key,
                               kv_quant="int8" if args.kv_int8 else None)

    np.asarray(run(jax.random.key(1)))
    n = 3
    t0 = time.perf_counter()
    for i in range(n):
        np.asarray(run(jax.random.key(2 + i)))
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "metric": f"{args.preset} tri-encoder fusion inference (1 chip, "
                  f"{'int8' if args.int8 else 'bf16'} decoder, "
                  f"{'int8' if args.int8_encoders else 'bf16'} encoders, "
                  f"batch {B}, "
                  f"prompt {S} incl 2x{K}-token injected segments, gen {T})",
        "value": round(B * T / dt, 1), "unit": "tokens/sec/chip",
        "vs_baseline": round(B * T / dt / A100_BASELINES.get(
            args.preset, 500.0), 3),
        "baseline_range": a100_range(A100_BASELINES.get(args.preset, 500.0)),
    }))


def bench_encoder(args):
    """Encoder throughput (seqs/sec): ESM2-650M-config, seq 1024."""
    import jax
    import jax.numpy as jnp

    from molly_tpu.models import ESM_PRESETS, esm

    cfg = ESM_PRESETS["esm2-650m"]
    params = esm.init_params(cfg, jax.random.key(0))
    B, S = (2, 16) if args.smoke else (16, 1024)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, 30, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    f = jax.jit(lambda p, i, m: jnp.sum(
        esm.forward_hidden(p, cfg, i, m).astype(jnp.float32)))
    float(f(params, ids, mask))
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        float(f(params, ids, mask))
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "metric": f"esm2-650m encoder throughput (1 chip, bf16, batch {B}, "
                  f"seq {S})",
        "value": round(B / dt, 1), "unit": "seqs/sec/chip",
        "vs_baseline": 0.0,
    }))


def bench_ttft(args):
    """p50 time-to-first-token: prefill + first sampled token."""
    import jax
    import jax.numpy as jnp

    from molly_tpu.models import QWEN3_PRESETS, qwen3, tiny_qwen3
    from molly_tpu.inference.engine import GenerationConfig,         _generate_from_embeds

    cfg = tiny_qwen3(dtype=smoke_dtype()) if args.smoke else \
        QWEN3_PRESETS[args.preset]
    B, S = (2, 16) if args.smoke else (args.batch, args.prompt_len)
    if args.int8 and not args.smoke:
        # op-point prompts (2176 tokens, batch 32) need the int8 weight +
        # int8 KV memory budget — bf16 weights + bf16 pool OOM'd the chip
        params = _random_int8_params(cfg)
    else:
        params = qwen3.init_params(cfg, jax.random.key(0))
    kv_quant = "int8" if args.kv_int8 else None
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, S)), jnp.int32)
    embeds = qwen3.embed_tokens(params, ids)
    mask = jnp.ones((B, S), jnp.int32)
    gen = GenerationConfig(max_new_tokens=1, do_sample=True, temperature=0.8,
                           top_p=0.95, top_k=20, repetition_penalty=1.1,
                           eos_token_id=-1, pad_token_id=0)
    np.asarray(_generate_from_embeds(params, cfg, embeds, mask, gen,
                                     jax.random.key(1), kv_quant=kv_quant))
    times = []
    for i in range(9):
        t0 = time.perf_counter()
        np.asarray(_generate_from_embeds(params, cfg, embeds, mask, gen,
                                         jax.random.key(2 + i),
                                         kv_quant=kv_quant))
        times.append(time.perf_counter() - t0)
    p50 = sorted(times)[len(times) // 2]
    print(json.dumps({
        "metric": f"{args.preset} p50 TTFT (1 chip, "
                  f"{'int8' if args.int8 else 'bf16'}"
                  f"{', int8 KV' if args.kv_int8 else ''}, batch {B}, "
                  f"prompt {S})" if not args.smoke else "smoke p50 TTFT",
        "value": round(p50 * 1e3, 1), "unit": "ms",
        "vs_baseline": 0.0,
    }))


if __name__ == "__main__":
    main()
