"""Train-step time ablation: where does a full-fine-tune step actually go?

The MFU number in ``bench.py --mode train`` folds everything into one
wall-clock figure. This script breaks a step into nested variants so the
gap between analytic model FLOPs and the measured step time can be
attributed (remat recompute vs encoder forward vs LM-head/LCE vs
optimizer update vs backward itself). Reference anchor: the reference's
only train-perf claim is the Liger 2x speedup (/root/reference/README.md:15);
this is the tooling we use to push past it on TPU.

Variants (each timed identically: compile, 2 warm-up steps, then N timed):

  step         full train step (grads + optimizer + NaN guard), donated
  grads        value_and_grad of the fusion loss only (no optimizer)
  fwd          fusion loss forward only (no backward)
  dec_grads    decoder-only grads: token embeds -> decoder -> fused LCE
               (no encoders, no injection, no projectors)
  dec_fwd      decoder-only forward
  body_grads   decoder body only: forward_hidden -> mean(hidden) loss
               (no LM head / LCE at all)

Readable deltas:
  step - grads          = optimizer update + NaN-guard cost
  grads - dec_grads     = frozen-encoder fwd + injection (+proj bwd)
  dec_grads - body_grads= LM-head fwd+bwd through the chunked LCE
  remat sweep on dec_grads isolates recompute cost.

Run on the real chip:
  python benchmarks/ablate_train.py --preset qwen3-0.6b --batch 8 \
      --remat full dots none
CPU smoke (tiny preset, shapes cut down):
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      python benchmarks/ablate_train.py --tiny --steps 2
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def make_batch(cfg, B, S, K, rng):
    import jax.numpy as jnp
    labels = np.full((B, S), -100, np.int32)
    labels[:, S // 2:] = rng.integers(1, cfg.text.vocab_size, (B, S // 2))
    return {
        "input_ids": jnp.asarray(
            rng.integers(0, cfg.text.vocab_size, (B, S)), jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(labels),
        "dna_rna_tokens": jnp.asarray(
            rng.integers(6, 4102, (B, 1, K)), jnp.int32),
        "dna_rna_pos": jnp.asarray([[1]] * B, jnp.int32),
        "protein_tokens": jnp.full((B, 1, K), 1, jnp.int32),
        "protein_pos": jnp.full((B, 1), -1, jnp.int32),
        "task_label": jnp.asarray(rng.integers(0, 20, (B,)), jnp.int32),
    }


def timed(fn, steps=5, warmup=2):
    """fn: zero-arg callable returning device values. Compile + warm up
    (the tunneled chip runs the first timed round ~4x slow), then time
    `steps` calls, forcing with np.asarray (the only sync that doesn't
    lie over the tunnel)."""
    force(fn())
    for _ in range(warmup):
        force(fn())
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn()
    force(out)
    return (time.perf_counter() - t0) / steps


def force(tree):
    import jax
    leaf = jax.tree.leaves(tree)[0]
    np.asarray(leaf)


def build(preset, remat, B, S, K, tiny):
    import jax

    from molly_tpu.models import ESM_PRESETS, QWEN3_PRESETS, fusion
    from molly_tpu.models.fusion import FusionConfig

    if tiny:
        from molly_tpu.models.configs import tiny_esm, tiny_qwen3
        text = tiny_qwen3(remat=remat != "none",
                          remat_policy=remat if remat in ("dots", "attn", "hot") else "full")
        enc = tiny_esm(dtype="bfloat16")
        cfg = FusionConfig(text=text, dna_rna=enc, protein=enc,
                           dna_rna_k_tokens=K, protein_k_tokens=K)
    else:
        text = dataclasses.replace(
            QWEN3_PRESETS[preset], remat=remat != "none",
            remat_policy=remat if remat in ("dots", "attn", "hot") else "full")
        cfg = FusionConfig(
            text=text,
            dna_rna=dataclasses.replace(ESM_PRESETS["nt-500m"],
                                        dtype="bfloat16"),
            protein=dataclasses.replace(ESM_PRESETS["esm2-8m"],
                                        dtype="bfloat16"),
            dna_rna_k_tokens=K, protein_k_tokens=K)
    params = fusion.init_params(cfg, jax.random.key(0))
    return cfg, params


def variants(cfg, params, batch, train_batch_axis=0):
    """Build the jitted callables. Trainable partition matches the real
    full-FT step: text + projectors differentiate, encoders are
    constants."""
    import jax
    import jax.numpy as jnp

    from molly_tpu.models import fusion, qwen3
    from molly_tpu.ops.lce import causal_lm_loss
    from molly_tpu.training import (TrainConfig, init_train_state,
                                    make_train_step)

    tc = TrainConfig(learning_rate=1e-5, total_steps=100,
                     train_bio=False, train_mlp=True, train_llm=True)
    state = init_train_state(params, tc)
    rng = jax.random.key(1)
    step = jax.jit(make_train_step(cfg, tc), donate_argnums=0)
    holder = {"state": state}

    def run_step():
        s, m = step(holder["state"], batch, rng)
        holder["state"] = s
        return m["loss"]

    frozen = {k: v for k, v in params.items()
              if k in ("dna_rna", "protein")}
    trainable = {k: v for k, v in params.items() if k not in frozen}

    def fusion_loss(tr):
        p = {**tr, **frozen}
        loss, _ = fusion.loss_fn(p, cfg, batch)
        return loss

    def dec_loss(tr):
        p = {**tr, **frozen}
        emb = qwen3.embed_tokens(p["text"], batch["input_ids"])
        hidden, _ = qwen3.forward_hidden(
            p["text"], cfg.text, inputs_embeds=emb,
            attention_mask=batch["attention_mask"])
        w = fusion.lm_head_weight(p, cfg.text)
        loss, _, _ = causal_lm_loss(hidden, w, batch["labels"])
        return loss

    def body_loss(tr):
        p = {**tr, **frozen}
        emb = qwen3.embed_tokens(p["text"], batch["input_ids"])
        hidden, _ = qwen3.forward_hidden(
            p["text"], cfg.text, inputs_embeds=emb,
            attention_mask=batch["attention_mask"])
        return jnp.mean(hidden.astype(jnp.float32))

    def bind(f):
        jf = jax.jit(f)
        return lambda: jf(trainable)

    return {
        "step": run_step,
        "grads": bind(jax.grad(fusion_loss)),
        "fwd": bind(fusion_loss),
        "dec_grads": bind(jax.grad(dec_loss)),
        "dec_fwd": bind(dec_loss),
        "body_grads": bind(jax.grad(body_loss)),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="qwen3-0.6b")
    ap.add_argument("--batch", type=int, nargs="+", default=[8])
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--k-tokens", type=int, default=128)
    ap.add_argument("--remat", nargs="+", default=["dots"],
                    choices=["full", "dots", "attn", "hot", "none"])
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--only", nargs="+", default=None,
                    help="restrict to these variant names")
    ap.add_argument("--tiny", action="store_true",
                    help="toy config for CPU smoke")
    args = ap.parse_args(argv)

    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench  # repo-root module: analytic FLOPs + peak constant

    rng = np.random.default_rng(0)
    rows = []
    for remat in args.remat:
        for B in args.batch:
            S = 64 if args.tiny else args.seq
            K = 8 if args.tiny else args.k_tokens
            cfg, params = build(args.preset, remat, B, S, K, args.tiny)
            batch = make_batch(cfg, B, S, K, rng)
            vs = variants(cfg, params, batch)
            if args.only:
                vs = {k: v for k, v in vs.items() if k in args.only}
            # 'step' donates its state (which aliases the params the
            # other variants close over): time it LAST
            for name in ["fwd", "body_grads", "dec_fwd", "dec_grads",
                         "grads", "step"]:
                if name not in vs:
                    continue
                dt = timed(vs[name], steps=args.steps)
                tok_s = B * S / dt
                flops_tok = bench.train_flops_per_token(
                    cfg.text, S, full_ft=True)
                mfu = flops_tok * tok_s / bench.V5E_PEAK_BF16_FLOPS
                rows.append({"remat": remat, "batch": B, "variant": name,
                             "ms": round(dt * 1e3, 1),
                             "tok_s": round(tok_s, 0),
                             "mfu_if_full_step": round(mfu, 3)})
                print(json.dumps(rows[-1]), flush=True)

    print("\n== deltas (same remat/batch) ==")
    by = {(r["remat"], r["batch"], r["variant"]): r["ms"] for r in rows}
    for (remat, B) in sorted({(r["remat"], r["batch"]) for r in rows}):
        g = {v: by.get((remat, B, v)) for v in
             ["step", "grads", "fwd", "dec_grads", "dec_fwd",
              "body_grads"]}
        def d(a, b):
            return (round(g[a] - g[b], 1)
                    if g.get(a) is not None and g.get(b) is not None
                    else None)
        print(json.dumps({
            "remat": remat, "batch": B,
            "optimizer+guard": d("step", "grads"),
            "encoders+inject": d("grads", "dec_grads"),
            "lce_head": d("dec_grads", "body_grads"),
            "backward": d("dec_grads", "dec_fwd"),
        }))


if __name__ == "__main__":
    main()
