"""Batch inference CLI — the equivalent of the reference's
``python src/inference_lora.py`` entry point
(/root/reference/src/inference_lora.py:21-106,284-321): read a parquet of
prompts, run the fusion model with sampling, append JSONL rows
``{decoded_output, input, gt_output, gt_label, task, kind}``.

Usage:
  python -m molly_tpu.inference.cli --input-file data.parquet \
      --output-file out.jsonl --text-model-path /path/qwen3 \
      --checkpoint /path/ckpt [--adapter adapter.npz] [--batch-size 32] ...
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("molly_tpu batch inference")
    p.add_argument("--input-file", default=None,
                   help="parquet/jsonl of prompts (required unless "
                        "--api-serve)")
    p.add_argument("--output-file", default=None,
                   help="JSONL sink (required unless --api-serve)")
    p.add_argument("--text-model-path", default=None,
                   help="local HF dir for tokenizer + base Qwen3 weights")
    p.add_argument("--checkpoint", default=None,
                   help="orbax train-state dir or HF dir with full weights")
    p.add_argument("--adapter", default=None,
                   help="adapter .npz from training.export_adapter")
    p.add_argument("--peft-adapter", default=None,
                   help="reference-style PEFT adapter dir (adapter .bin/"
                        ".safetensors + projector .bins)")
    p.add_argument("--lora-r", type=int, default=64)
    p.add_argument("--lora-alpha", type=float, default=None,
                   help="merge scale override; default = recorded adapter "
                        "meta (adapter .npz / PEFT adapter_config.json), "
                        "else 64")
    p.add_argument("--preset", default="qwen3-1.7b",
                   help="model preset when no checkpoint config is given")
    p.add_argument("--dna-rna-preset", default="nt-500m")
    p.add_argument("--protein-preset", default="esm2-650m")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--max-length", type=int, default=3072)
    p.add_argument("--max-new-tokens", type=int, default=3072)
    p.add_argument("--dna-rna-k-tokens", type=int, default=1024)
    p.add_argument("--protein-k-tokens", type=int, default=1024)
    p.add_argument("--max-dna-rna-segments", type=int, default=4)
    p.add_argument("--max-protein-segments", type=int, default=4)
    p.add_argument("--strict-segments", action="store_true",
                   help="error on segment-slot overflow instead of "
                   "degrading loudly")
    p.add_argument("--temperature", type=float, default=0.8)
    p.add_argument("--top-p", type=float, default=0.95)
    p.add_argument("--top-k", type=int, default=20)
    p.add_argument("--repetition-penalty", type=float, default=1.1)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="int8 weight-only decode of the text model")
    p.add_argument("--read-nums", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tiny", action="store_true",
                   help="tiny random model matching the train CLI's --tiny")
    p.add_argument("--moe-experts", type=int, default=0,
                   help="make the text decoder a sparse MoE with this many "
                        "experts (matches the train CLI flag; needed to "
                        "load a checkpoint trained with --moe-experts)")
    p.add_argument("--moe-topk", type=int, default=2,
                   help="experts per token under --moe-experts")
    p.add_argument("--serve", action="store_true",
                   help="continuous batching (inference.server): slots free "
                        "at EOS and backfill from the queue instead of "
                        "static batches that wait for the longest row")
    p.add_argument("--serve-chunk", type=int, default=64,
                   help="max decode steps per scheduler sync under --serve "
                        "(device-side early exit ends a chunk sooner once "
                        "a backfill group's worth of slots finish)")
    p.add_argument("--serve-admit", type=int, default=8,
                   help="backfill group size under --serve (chunks exit "
                        "early once this many slots sit finished while "
                        "requests are queued)")
    p.add_argument("--decoding", default="engine",
                   choices=["engine", "lookup"],
                   help="'lookup' = prompt-lookup speculative decoding "
                        "(n-gram drafts verified in one forward; "
                        "token-exact, single-stream — fastest for "
                        "outputs that quote the input)")
    p.add_argument("--lookup-k", type=int, default=8,
                   help="draft tokens per lookup round")
    p.add_argument("--lookup-n", type=int, default=3,
                   help="n-gram length matched against the history")
    p.add_argument("--serve-paged", action="store_true",
                   help="with --serve: paged KV (inference.paged) — the "
                        "cache is a pool of fixed-size pages allocated "
                        "per sequence on demand instead of a per-slot "
                        "[max_length + cap] rectangle. HBM scales with "
                        "tokens actually held; the pool may be "
                        "oversubscribed (--kv-pages), preempting the "
                        "youngest request when it runs dry. The enabler "
                        "for many-slot serving at the reference's "
                        "max_new_tokens=3072 (inference_nt_lora.sh)")
    p.add_argument("--page-size", type=int, default=64,
                   help="tokens per KV page under --serve-paged")
    p.add_argument("--kv-pages", type=int, default=None,
                   help="per-layer page-pool size under --serve-paged; "
                        "default fully provisions slots x (prompt + cap), "
                        "lower it to oversubscribe HBM")
    p.add_argument("--serve-kv-int8", action="store_true",
                   help="int8 KV under --serve / --serve-paged / "
                        "--offline-ring (halves KV memory/bandwidth; "
                        "~1e-2 logit noise)")
    p.add_argument("--kv-int8", action="store_true",
                   help="int8 KV cache in the batch engine (halves the "
                        "[L,B,Nkv,S,2Dh] pool — the single-chip enabler "
                        "for the reference operating point: max-length "
                        "3072 at batch 32, inference_nt_lora.sh:25-36)")
    p.add_argument("--offline-ring", action="store_true",
                   help="device-side admission ring (inference.offline): "
                        "the WHOLE workload — admission, encoder-injected "
                        "prefill, decode, harvest — runs in ONE device "
                        "dispatch; --batch-size sets the slot count")
    p.add_argument("--ring-spec", type=int, default=0,
                   help="with --offline-ring: prompt-lookup speculation, "
                        "N draft tokens per round (greedy token-exact, "
                        "sampled distribution-exact). Regime: pays when "
                        "decode is weight-stream-bound (few slots and/or "
                        "a big model); at 32 slots on a 0.6B the (k+1)-"
                        "wide verify tick costs ~2.1x a plain tick and "
                        "loses even at high acceptance (measured, "
                        "benchmarks/README.md)")
    p.add_argument("--ring-spec-adapt", type=float, default=None,
                   metavar="THRESHOLD",
                   help="with --ring-spec: acceptance-adaptive ring — "
                        "speculate only while the acceptance-rate EMA "
                        "stays above THRESHOLD (plain ticks keep the EMA "
                        "live for free via shadow-draft estimation). "
                        "Break-even acceptance scales with the spec/plain "
                        "tick-cost ratio (rises with slot count, falls "
                        "with model size); 0.2 suits small-batch serving, "
                        "large-batch 0.6B-class rings should leave spec "
                        "off entirely. Outputs are unchanged either way")
    p.add_argument("--serve-adapter", action="append", default=[],
                   metavar="NAME=PATH",
                   help="multi-LoRA serving under --api-serve: load a "
                        "PEFT adapter dir as OpenAI model NAME "
                        "(repeatable); requests select it via the "
                        "'model' field; the base model serves when no "
                        "adapter name matches")
    p.add_argument("--api-serve", action="store_true",
                   help="serve an OpenAI-compatible HTTP API "
                        "(/v1/completions, /v1/chat/completions) over the "
                        "continuous-batching engine instead of reading "
                        "--input-file; --batch-size sets the slot count")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    return p


def main(argv=None) -> None:
    parser = build_argparser()
    args = parser.parse_args(argv)
    if not args.api_serve and not (args.input_file and args.output_file):
        parser.error("--input-file and --output-file are required "
                     "(unless --api-serve)")

    import jax
    import jax.numpy as jnp

    from ..data import (DataConfig, OmicsDataset, collate_test,
                        default_modality_tokenizers, iterate_batches,
                        load_text_tokenizer)
    from ..models import ESM_PRESETS, QWEN3_PRESETS, fusion
    from ..models.fusion import FusionConfig
    from .engine import GenerationConfig, generate

    text_tok = load_text_tokenizer(args.text_model_path)
    dcfg = DataConfig(max_len=args.max_length,
                      dna_rna_k_tokens=args.dna_rna_k_tokens,
                      protein_k_tokens=args.protein_k_tokens,
                      max_dna_rna_segments=args.max_dna_rna_segments,
                      max_protein_segments=args.max_protein_segments,
                      strict_segments=args.strict_segments)
    dna_tok, prot_tok = default_modality_tokenizers()
    ds = None
    if args.input_file:
        ds = OmicsDataset(args.input_file, text_tok, dna_tok, prot_tok,
                          dcfg, mode="test", read_nums=args.read_nums)

    if args.tiny:
        from ..models import tiny_esm, tiny_qwen3
        dna_tok_v, prot_tok_v = dna_tok.vocab_size, prot_tok.vocab_size
        cfg = FusionConfig(
            text=tiny_qwen3(vocab_size=-(-text_tok.vocab_size // 128) * 128,
                            dtype="float32"),
            dna_rna=tiny_esm(vocab_size=dna_tok_v, mask_token_id=2,
                             dtype="float32"),
            protein=tiny_esm(vocab_size=prot_tok_v,
                             mask_token_id=prot_tok.mask_id,
                             dtype="float32"),
            dna_rna_k_tokens=args.dna_rna_k_tokens,
            protein_k_tokens=args.protein_k_tokens)
    else:
        text_cfg = QWEN3_PRESETS[args.preset]
        if text_tok.vocab_size > text_cfg.vocab_size or (
                args.text_model_path is None and args.checkpoint is None):
            # byte-fallback tokenizer / demo mode: size the embedding to the
            # tokenizer (rounded to an MXU-friendly multiple of 128)
            import dataclasses
            v = -(-text_tok.vocab_size // 128) * 128
            text_cfg = dataclasses.replace(text_cfg, vocab_size=v)
        cfg = FusionConfig(
            text=text_cfg,
            dna_rna=ESM_PRESETS[args.dna_rna_preset],
            protein=ESM_PRESETS[args.protein_preset],
            dna_rna_k_tokens=args.dna_rna_k_tokens,
            protein_k_tokens=args.protein_k_tokens)
    if args.moe_experts:
        import dataclasses
        cfg = dataclasses.replace(cfg, text=dataclasses.replace(
            cfg.text, num_experts=args.moe_experts,
            num_experts_per_tok=args.moe_topk))

    params = _load_params(args, cfg)
    if args.int8:
        from ..models import qwen3 as _q
        params["text"] = _q.quantize_for_decode(
            params["text"], cfg.text,
            # multi-LoRA needs unfused projections (the fused decode
            # branch skips the low-rank bypass); int8 still applies
            fuse=not (args.api_serve and args.serve_adapter),
            moe_experts=bool(cfg.text.num_experts))
    gen = GenerationConfig(
        max_new_tokens=args.max_new_tokens,
        do_sample=not args.greedy,
        temperature=args.temperature, top_p=args.top_p, top_k=args.top_k,
        repetition_penalty=args.repetition_penalty,
        eos_token_id=text_tok.eos_token_id,
        pad_token_id=text_tok.pad_token_id or 0)

    rng = jax.random.key(args.seed)
    if args.api_serve:
        from .api_server import run_api_server
        lora_bank = adapter_names = None
        if args.serve_adapter:
            from ..models.lora import stack_adapters
            adapters, scales, adapter_names = [], [], []
            for spec in args.serve_adapter:
                name, _, path = spec.partition("=")
                assert name and path, (
                    f"--serve-adapter expects NAME=PATH, got {spec!r}")
                lora, alpha = _load_peft_lora(path, cfg.text, args.lora_r)
                r = lora["layers"]["q_proj"]["a"].shape[-1]
                adapters.append(lora)
                scales.append(
                    float(alpha if alpha is not None else 64.0) / r)
                adapter_names.append(name)
            lora_bank = stack_adapters(adapters, scales=scales)
        return run_api_server(args, params, cfg, gen, text_tok, dna_tok,
                              prot_tok, dcfg, lora_bank=lora_bank,
                              adapter_names=adapter_names)
    if args.offline_ring:
        return _run_offline_ring(args, ds, params, cfg, gen, text_tok, rng)
    if args.serve:
        return _run_serve(args, ds, params, cfg, gen, text_tok, rng)
    batch_size = args.batch_size
    if args.decoding == "lookup":
        batch_size = 1  # single-stream speculation; prompts stay unpadded
    n_done = 0
    with open(args.output_file, "a") as fh:
        for batch in iterate_batches(ds, batch_size, drop_last=False,
                                     collate_fn=collate_test):
            arrs = {k: jnp.asarray(v) for k, v in batch.items()
                    if isinstance(v, np.ndarray)}
            rng, step = jax.random.split(rng)
            if args.decoding == "lookup":
                from .speculative import generate_lookup
                embeds = fusion.build_inputs_embeds(params, cfg, arrs)
                tokens = np.asarray(generate_lookup(
                    params["text"], cfg.text, arrs["input_ids"], gen,
                    k=args.lookup_k, n=args.lookup_n, rng=step,
                    inputs_embeds=embeds))
            else:
                tokens = np.asarray(generate(
                    params, cfg, arrs, gen, step,
                    kv_quant="int8" if args.kv_int8 else None))
            for i in range(tokens.shape[0]):
                out_ids = tokens[i]
                out_ids = out_ids[out_ids != gen.pad_token_id]
                decoded = text_tok.decode(out_ids.tolist(),
                                          skip_special_tokens=True)
                fh.write(json.dumps({
                    "decoded_output": decoded,
                    "input": batch["raw_input"][i],
                    "gt_output": batch["raw_output"][i],
                    "gt_label": batch["raw_label"][i],
                    "task": batch["task"][i],
                    "kind": batch["kind"][i],
                }) + "\n")
            n_done += tokens.shape[0]
            print(f"[inference] {n_done}/{len(ds)}", flush=True)


def _run_offline_ring(args, ds, params, cfg, gen, text_tok, rng) -> None:
    """One-dispatch offline path (inference.offline.run_offline): the
    whole parquet's prompts + omics segments upload once, the ring
    admits/prefills/decodes/harvests on device, and the host writes the
    same JSONL the batch path writes. Replaces the reference's
    per-batch generate loop (inference_lora.py:284-321) with O(1) host
    round trips."""
    import numpy as np

    from ..data import collate_test, iterate_batches
    from .offline import run_offline
    from .server import _pad_to_bucket

    bucket = args.max_length
    rows, meta = [], []
    for row in iterate_batches(ds, 1, drop_last=False,
                               collate_fn=collate_test):
        rows.append(_pad_to_bucket(
            {k: row[k] for k in ("input_ids", "attention_mask",
                                 "dna_rna_tokens", "dna_rna_pos",
                                 "protein_tokens", "protein_pos")
             if k in row}, bucket, gen.pad_token_id))
        meta.append({k: row[k][0] for k in
                     ("raw_input", "raw_output", "raw_label", "task",
                      "kind")})
    n = len(rows)

    def stack_omics(tok_key, pos_key, fill_tok):
        gmax = max((r[pos_key].shape[1] for r in rows if pos_key in r),
                   default=0)
        if not gmax:
            return {}
        kseg = next(r[tok_key].shape[2] for r in rows if tok_key in r)
        toks = np.full((n, gmax, kseg), fill_tok, np.int32)
        pos = np.full((n, gmax), -1, np.int32)
        for i, r in enumerate(rows):
            if pos_key in r:
                g = r[pos_key].shape[1]
                toks[i, :g] = r[tok_key][0]
                pos[i, :g] = r[pos_key][0]
        return {tok_key: toks, pos_key: pos}

    omics = {**stack_omics("dna_rna_tokens", "dna_rna_pos", 1),
             **stack_omics("protein_tokens", "protein_pos", 1)}
    out = run_offline(
        params, cfg, gen,
        np.concatenate([r["input_ids"] for r in rows]),
        np.concatenate([r["attention_mask"] for r in rows]),
        n_slots=args.batch_size,
        # +ring_spec: tentative KV columns need spec headroom past the cap
        max_len=bucket + gen.max_new_tokens + args.ring_spec,
        admit_group=args.serve_admit,
        kv_quant="int8" if args.serve_kv_int8 else None,
        spec_lookup=args.ring_spec,
        spec_threshold=args.ring_spec_adapt,
        queue_omics=omics or None, rng=rng)
    with open(args.output_file, "a") as fh:
        for i in range(n):
            out_ids = out["tokens"][i, :out["lengths"][i]]
            out_ids = out_ids[out_ids != gen.pad_token_id]
            decoded = text_tok.decode(out_ids.tolist(),
                                      skip_special_tokens=True)
            m = meta[i]
            fh.write(json.dumps({
                "decoded_output": decoded,
                "input": m["raw_input"], "gt_output": m["raw_output"],
                "gt_label": m["raw_label"], "task": m["task"],
                "kind": m["kind"],
            }) + "\n")
    print(f"[inference --offline-ring] {n}/{len(ds)} done in "
          f"{out['ticks']} ticks (1 dispatch)", flush=True)


def _run_serve(args, ds, params, cfg, gen, text_tok, rng) -> None:
    """Continuous-batching path: one Request per sample, slots backfilled
    as generations finish (vs the reference's static batches that all wait
    for the longest generation)."""
    from ..data import collate_test, iterate_batches
    from .server import Request, ServingEngine

    if args.serve_paged:
        from .paged import PagedServingEngine
        P = args.page_size
        # the fixed system prompt's full pages are shared across ALL
        # slots' page tables (stored once; the sub-page remainder rides
        # each request's suffix)
        prefix_ids = ds.encoder.system_prompt_ids
        s_share = (len(prefix_ids) // P) * P
        bucket = -(-(args.max_length - s_share) // P) * P
        eng = PagedServingEngine(
            params, cfg, gen, n_slots=args.batch_size, page_size=P,
            n_pages=args.kv_pages, prefill_buckets=(bucket,),
            decode_chunk=args.serve_chunk, admit_batch=args.serve_admit,
            kv_quant="int8" if args.serve_kv_int8 else None,
            prefix_ids=prefix_ids, rng=rng)
    else:
        # every molly prompt starts with the dataset's fixed system
        # prompt — its KV is computed once and shared across all
        # requests; buckets bound the per-request SUFFIX
        prefix_ids = ds.encoder.system_prompt_ids
        s_pre = len(prefix_ids)
        eng = ServingEngine(params, cfg, gen, n_slots=args.batch_size,
                            max_len=args.max_length + gen.max_new_tokens,
                            prefill_buckets=(args.max_length - s_pre,),
                            decode_chunk=args.serve_chunk,
                            admit_batch=args.serve_admit,
                            kv_quant="int8" if args.serve_kv_int8
                            else None,
                            prefix_ids=prefix_ids, rng=rng)
    meta = {}
    arr_keys = ("input_ids", "attention_mask", "dna_rna_tokens",
                "dna_rna_pos", "protein_tokens", "protein_pos")
    for uid, row in enumerate(
            iterate_batches(ds, 1, drop_last=False,
                            collate_fn=collate_test)):
        eng.submit(Request(uid=uid, batch={
            k: row[k] for k in arr_keys if k in row}))
        meta[uid] = {k: row[k][0] for k in
                     ("raw_input", "raw_output", "raw_label", "task",
                      "kind")}
    results = eng.run([])
    with open(args.output_file, "a") as fh:
        for uid in sorted(results):
            out_ids = results[uid]
            out_ids = out_ids[out_ids != gen.pad_token_id]
            decoded = text_tok.decode(out_ids.tolist(),
                                      skip_special_tokens=True)
            m = meta[uid]
            fh.write(json.dumps({
                "decoded_output": decoded,
                "input": m["raw_input"], "gt_output": m["raw_output"],
                "gt_label": m["raw_label"], "task": m["task"],
                "kind": m["kind"],
            }) + "\n")
    print(f"[inference --serve] {len(results)}/{len(ds)} done", flush=True)


def _load_peft_lora(adir, text_cfg, default_r=64):
    """Load a reference-style PEFT adapter dir UNMERGED.
    Returns (lora dict {"layers": ...}, lora_alpha or None)."""
    import glob as _glob

    import torch

    from ..models.hf_import import load_hf_state, peft_lora_from_hf
    try:
        state = load_hf_state(adir)
    except FileNotFoundError:
        bins = _glob.glob(os.path.join(adir, "adapter_model*.bin"))
        state = torch.load(bins[0], map_location="cpu", weights_only=True)
    lora = peft_lora_from_hf(state, text_cfg, default_r)
    alpha = None
    acfg = os.path.join(adir, "adapter_config.json")
    if os.path.exists(acfg):
        with open(acfg) as f:
            alpha = json.load(f).get("lora_alpha")
    return lora, alpha


def _load_params(args, cfg):
    import jax

    from ..models import fusion
    from ..models.hf_import import esm_from_hf, load_hf_state, qwen3_from_hf

    if args.checkpoint and os.path.isdir(args.checkpoint) and any(
            f.endswith((".safetensors", ".bin"))
            for f in os.listdir(args.checkpoint)):
        state = load_hf_state(args.checkpoint)
        params = fusion.init_params(cfg, jax.random.key(0))
        params["text"] = qwen3_from_hf(state, cfg.text)
        # encoders expected alongside in HF layout when exported by us
    else:
        params = fusion.init_params(cfg, jax.random.key(0))
        if args.checkpoint:
            from ..training import checkpoint as ckpt
            # restore params-only from an orbax train state
            import orbax.checkpoint as ocp
            with ocp.StandardCheckpointer() as c:
                restored = c.restore(os.path.abspath(args.checkpoint))
            params = restored["params"]
    lora_alpha = args.lora_alpha  # explicit flag wins
    if args.adapter:
        from ..training.checkpoint import adapter_meta, load_adapter
        params = load_adapter(args.adapter, params)
        meta = adapter_meta(args.adapter)
        if meta is not None and lora_alpha is None:
            lora_alpha = meta["alpha"]
    if args.peft_adapter:
        import torch

        from ..models.hf_import import projector_from_hf
        adir = args.peft_adapter
        params["lora"], peft_alpha = _load_peft_lora(adir, cfg.text,
                                                     args.lora_r)
        if lora_alpha is None:
            lora_alpha = peft_alpha
        for name in ("dna_rna_projector", "protein_projector"):
            bp = os.path.join(adir, f"{name}.bin")
            if os.path.exists(bp):
                params[name] = projector_from_hf(
                    torch.load(bp, map_location="cpu", weights_only=True))
    if "lora" in params:
        # merge ONCE at load (PEFT merge_and_unload equivalent) so decode
        # never pays the merge again
        from ..models.lora import LoraConfig, merge_lora
        lora = params.pop("lora")
        r = lora["layers"]["q_proj"]["a"].shape[-1]
        params["text"] = merge_lora(
            params["text"], lora,
            LoraConfig(r=r, alpha=float(lora_alpha if lora_alpha is not None
                                        else 64.0)))
    return params


if __name__ == "__main__":
    main()
