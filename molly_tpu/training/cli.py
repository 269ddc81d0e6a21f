"""Training entry point — the ``deepspeed src/train.py`` equivalent
(/root/reference/src/train.py:236-719), one process driving the whole TPU
slice via GSPMD instead of one process per accelerator.

Flow (mirrors train.py:main): tokenizers (+9 omics specials) -> model
config + params (HF import or random) -> datasets -> freeze/LoRA regime ->
sharded train loop with periodic eval, early stopping, checkpointing,
per-task domain losses, and JSONL metric logging.

Usage:
  python -m molly_tpu.training.cli --train-dataset-path train.parquet \
      [--eval-dataset-path eval.parquet] [--text-model-path /hf/qwen3] ...
"""

from __future__ import annotations

import argparse
import os
import time


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in {"true", "t", "1", "yes", "y"}:
        return True
    if v.lower() in {"false", "f", "0", "no", "n"}:
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("molly_tpu train")
    # experiment / logging
    p.add_argument("--experiment-name", default="molly_tpu")
    p.add_argument("--report-to", default="jsonl",
                   help="comma list of metric sinks: jsonl,wandb,swanlab,"
                        "tensorboard (rank-0; missing libs degrade to a "
                        "warning — mirrors the reference's --report_to, "
                        "src/train.py:255-261)")
    p.add_argument("--output-dir", default="runs/molly")
    p.add_argument("--log-interval", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    # model
    p.add_argument("--text-model-path", default=None)
    p.add_argument("--dna-rna-model-path", default=None)
    p.add_argument("--protein-model-path", default=None)
    p.add_argument("--text-preset", default="qwen3-1.7b")
    p.add_argument("--dna-rna-preset", default="nt-500m")
    p.add_argument("--protein-preset", default="esm2-650m")
    p.add_argument("--no-load-pretrained", action="store_true",
                   help="random init (smoke runs)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random model (CI smoke)")
    p.add_argument("--moe-experts", type=int, default=0,
                   help="override the text config to a MoE decoder with "
                        "this many experts (0 keeps the preset; composes "
                        "with --tiny for EP smoke runs)")
    p.add_argument("--moe-topk", type=int, default=2,
                   help="experts per token under --moe-experts")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--gradient-checkpointing", type=str2bool, default=False)
    p.add_argument("--remat-policy", default="full",
                   choices=["full", "dots", "attn", "hot"],
                   help="with --gradient-checkpointing: 'dots' saves "
                        "matmul outputs and recomputes only elementwise "
                        "ops (faster where memory allows); 'attn' saves "
                        "only flash-attention outputs (skips the O(S^2) "
                        "backward recompute at [B,S,H]/layer memory)")
    p.add_argument("--remat-skip-layers", type=int, default=0,
                   help="segmented remat: first N layers skip "
                        "checkpointing entirely (residuals saved, zero "
                        "backward recompute) — spend leftover HBM on "
                        "recompute elimination")
    p.add_argument("--offload-opt-state", type=str2bool, default=False,
                   help="keep Adam moments in pinned host memory instead "
                        "of HBM (TPU-native ds_z2_offload equivalent; "
                        "frees 8 bytes/trainable-param of HBM for one "
                        "host round trip per step)")
    # data
    p.add_argument("--train-dataset-path", required=True)
    p.add_argument("--eval-dataset-path", default=None)
    p.add_argument("--max-len", type=int, default=1024)
    p.add_argument("--eval-max-len", type=int, default=1024)
    p.add_argument("--dna-rna-k-tokens", type=int, default=128)
    p.add_argument("--protein-k-tokens", type=int, default=128)
    p.add_argument("--max-dna-rna-segments", type=int, default=4)
    p.add_argument("--max-protein-segments", type=int, default=4)
    p.add_argument("--strict-segments", type=str2bool, default=False,
                   help="error on segment-slot overflow / truncation "
                   "straddle instead of degrading loudly (the reference "
                   "hard-errors, omics_one.py:167-170)")
    p.add_argument("--read-nums", type=int, default=None)
    p.add_argument("--eval-read-nums", type=int, default=None)
    p.add_argument("--mode", default="sft", choices=["sft", "pretrain"])
    # async input pipeline (replaces torch DataLoader workers, SURVEY §3.1)
    p.add_argument("--prefetch-depth", type=int, default=2,
                   help="background-thread batch prefetch depth "
                        "(0 disables; 2 double-buffers)")
    p.add_argument("--streaming", type=str2bool, default=False,
                   help="stream the train parquet by row group instead of "
                        "loading it into memory (corpora larger than host "
                        "RAM; approximate shuffle via row-group permute + "
                        "reservoir; per-host sharding by row group)")
    p.add_argument("--cache-dataset", type=str2bool, default=True,
                   help="tokenize each sample once and replay from memory "
                        "across epochs")
    # optimization
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--train-iters", type=int, default=None,
                   help="cap total optimizer steps")
    p.add_argument("--batch-size-per-gpu", type=int, default=4,
                   help="global microbatch size (name kept for parity)")
    p.add_argument("--gradient-accumulation-steps", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--warmup", type=float, default=0.03,
                   help="warmup ratio")
    p.add_argument("--lr-decay-style", default="cosine",
                   choices=["cosine", "linear", "constant"])
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--clip-grad-max-norm", type=float, default=1.0)
    p.add_argument("--z-loss", type=float, default=0.0)
    # freeze / LoRA (reference --train-bio/--train-mlp/--train-llm)
    p.add_argument("--train-bio", type=str2bool, default=False)
    p.add_argument("--train-mlp", type=str2bool, default=True)
    p.add_argument("--train-llm", type=str2bool, default=True)
    p.add_argument("--use-lora", type=str2bool, default=False)
    p.add_argument("--lora-r", type=int, default=64)
    p.add_argument("--lora-alpha", type=float, default=64.0)
    p.add_argument("--lora-dropout", type=float, default=0.05)
    p.add_argument("--qlora", type=str2bool, default=False,
                   help="with --use-lora: int8-quantize the FROZEN text "
                        "base (qwen3.quantize_for_training) — halves its "
                        "HBM footprint/stream; adapters stay bf16 (the "
                        "reference's prepare_model_for_kbit_training)")
    # eval / save
    p.add_argument("--eval-interval", type=int, default=200)
    p.add_argument("--save-interval", type=int, default=500)
    p.add_argument("--save-total-limit", type=int, default=3)
    p.add_argument("--early-stopping-patience", type=int, default=3)
    p.add_argument("--compute-domain-losses", type=str2bool, default=False)
    p.add_argument("--profile-log-dir", default=None,
                   help="jax.profiler trace output dir")
    p.add_argument("--resume-from", default=None,
                   help="orbax checkpoint dir to resume train state from")
    p.add_argument("--init-from", default=None,
                   help="orbax checkpoint dir to warm-start PARAMS from "
                        "(optimizer/step start fresh; applied BEFORE "
                        "--use-lora/--qlora, so a full-FT checkpoint can "
                        "seed a LoRA/QLoRA run — the reference's "
                        "load-pretrained-then-LoRA flow, train.py:647-660, "
                        "for checkpoints in this framework's own format)")
    # parallelism
    p.add_argument("--mesh-data", type=int, default=1)
    p.add_argument("--mesh-dcn-data", type=int, default=1,
                   help="multi-slice: extra data-parallel factor ACROSS "
                        "slices over DCN (slice-aware device order via "
                        "mesh_utils.create_hybrid_device_mesh); "
                        "fsdp/tensor/seq/expert stay on ICI inside a "
                        "slice")
    p.add_argument("--mesh-fsdp", type=int, default=-1)
    p.add_argument("--mesh-tensor", type=int, default=1)
    p.add_argument("--mesh-seq", type=int, default=1,
                   help="context-parallel axis size: shards the sequence "
                        "and runs ring attention in the decoder (long-"
                        "context training beyond the reference's single-"
                        "device cap, SURVEY.md §5.7)")
    p.add_argument("--cp-zigzag", type=str2bool, default=False,
                   help="balance causal work across the ring under "
                        "--mesh-seq (zigzag chunk layout)")
    p.add_argument("--mesh-pipe", type=int, default=1,
                   help="pipeline-parallel stage count: decoder layers "
                        "sharded over a (pipe, data) mesh, GPipe clock "
                        "loop (parallel.pipeline); excludes fsdp/tensor/"
                        "seq axes and LoRA")
    p.add_argument("--pp-microbatches", type=int, default=2,
                   help="microbatches per step under --mesh-pipe")
    p.add_argument("--mesh-expert", type=int, default=1,
                   help="expert-parallel axis size: MoE expert weights "
                        "shard over this axis (requires a MoE text "
                        "preset, e.g. qwen3-30b-a3b; beyond the "
                        "reference, SURVEY.md §2.4 EP)")
    return p


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)
    run_training(args)


def run_training(args) -> dict:
    import jax
    import numpy as np

    from ..data import (DataConfig, OmicsDataset,
                        default_modality_tokenizers, iterate_batches,
                        load_text_tokenizer)
    from ..models import ESM_PRESETS, QWEN3_PRESETS, fusion, tiny_esm, \
        tiny_qwen3
    from ..models.fusion import FusionConfig
    from ..models.lora import LoraConfig
    from ..parallel import (initialize_distributed, make_global_batch,
                            make_mesh, shard_params)
    from ..utils import MetricLogger, domain_loss_metrics, print_rank_0, \
        time_count
    from ..utils.profiling import StepTimer, trace
    from . import checkpoint as ckpt_lib
    from .trainer import (TrainConfig, attach_lora, init_train_state,
                          make_train_step)

    initialize_distributed()
    np.random.seed(args.seed)

    # ---- tokenizers (train.py:66-91) ----
    text_tok = load_text_tokenizer(args.text_model_path)
    dna_tok, prot_tok = default_modality_tokenizers()

    # ---- model config + params (train.py:93-159) ----
    import dataclasses
    if args.tiny:
        text_cfg = tiny_qwen3(
            vocab_size=-(-text_tok.vocab_size // 128) * 128,
            dtype=args.dtype, remat=args.gradient_checkpointing,
            remat_policy=args.remat_policy,
            remat_skip_layers=args.remat_skip_layers)
        dna_cfg = tiny_esm(vocab_size=dna_tok.vocab_size, mask_token_id=2,
                           dtype=args.dtype)
        prot_cfg = tiny_esm(vocab_size=prot_tok.vocab_size,
                            mask_token_id=prot_tok.mask_id, dtype=args.dtype)
    else:
        text_cfg = dataclasses.replace(
            QWEN3_PRESETS[args.text_preset], dtype=args.dtype,
            remat=args.gradient_checkpointing,
            remat_policy=args.remat_policy,
            remat_skip_layers=args.remat_skip_layers)
        dna_cfg = dataclasses.replace(ESM_PRESETS[args.dna_rna_preset],
                                      dtype=args.dtype)
        prot_cfg = dataclasses.replace(ESM_PRESETS[args.protein_preset],
                                       dtype=args.dtype)
    if args.moe_experts:
        text_cfg = dataclasses.replace(
            text_cfg, num_experts=args.moe_experts,
            num_experts_per_tok=args.moe_topk)
    if args.mesh_expert > 1:
        # shard_map EP: expert weights stay device-local (never
        # gathered); GSPMD alone re-gathers the stacks every layer
        text_cfg = dataclasses.replace(text_cfg, expert_parallel=True)
    if args.mesh_seq > 1:
        div = args.mesh_seq * (2 if args.cp_zigzag else 1)
        assert args.max_len % div == 0, (
            f"--max-len {args.max_len} must divide over "
            f"{div} (--mesh-seq{' x2 zigzag' if args.cp_zigzag else ''})")
        text_cfg = dataclasses.replace(
            text_cfg, context_parallel=True,
            context_parallel_zigzag=args.cp_zigzag)
    cfg = FusionConfig(text=text_cfg, dna_rna=dna_cfg, protein=prot_cfg,
                       dna_rna_k_tokens=args.dna_rna_k_tokens,
                       protein_k_tokens=args.protein_k_tokens)

    key = jax.random.key(args.seed)
    with time_count("init params"):
        params = fusion.init_params(cfg, key)
        if not args.no_load_pretrained and not args.tiny:
            from ..models.hf_import import (esm_from_hf, load_hf_state,
                                            qwen3_from_hf)
            if args.text_model_path:
                params["text"] = qwen3_from_hf(
                    load_hf_state(args.text_model_path), text_cfg)
            if args.dna_rna_model_path:
                params["dna_rna"] = esm_from_hf(
                    load_hf_state(args.dna_rna_model_path), dna_cfg)
            if args.protein_model_path:
                params["protein"] = esm_from_hf(
                    load_hf_state(args.protein_model_path), prot_cfg)

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print_rank_0(f"Total parameters: {n_params:,}")

    # ---- datasets (train.py:161-233) ----
    dconf = DataConfig(max_len=args.max_len, mode=args.mode,
                       dna_rna_k_tokens=args.dna_rna_k_tokens,
                       protein_k_tokens=args.protein_k_tokens,
                       max_dna_rna_segments=args.max_dna_rna_segments,
                       max_protein_segments=args.max_protein_segments,
                       strict_segments=args.strict_segments)
    # per-host input sharding (multi-host GSPMD: each host reads only its
    # slice, batches reassemble globally via make_global_batch below)
    pi, pc = jax.process_index(), jax.process_count()
    if args.streaming:
        from ..data import StreamingOmicsDataset
        assert not args.read_nums, "--read-nums unsupported with --streaming"
        train_ds = StreamingOmicsDataset(
            args.train_dataset_path, text_tok, dna_tok, prot_tok, dconf,
            seed=args.seed, shard_index=pi, shard_count=pc)
    else:
        train_ds = OmicsDataset(args.train_dataset_path, text_tok, dna_tok,
                                prot_tok, dconf, read_nums=args.read_nums,
                                shuffle=True, seed=args.seed,
                                shard_index=pi, shard_count=pc)
    eval_ds = None
    if args.eval_dataset_path:
        econf = dataclasses.replace(dconf, max_len=args.eval_max_len)
        eval_ds = OmicsDataset(args.eval_dataset_path, text_tok, dna_tok,
                               prot_tok, econf,
                               read_nums=args.eval_read_nums,
                               shard_index=pi, shard_count=pc)
    if args.cache_dataset and not args.streaming:
        from ..data.pipeline import CachingDataset
        train_ds = CachingDataset(train_ds)
        if eval_ds is not None:
            eval_ds = CachingDataset(eval_ds)

    # ---- schedule length ----
    # len(train_ds) is already this host's shard; each host feeds
    # global_batch/pc rows per step
    steps_per_epoch = len(train_ds) // max(
        1, args.batch_size_per_gpu * args.gradient_accumulation_steps // pc)
    total_steps = steps_per_epoch * args.epochs
    if args.train_iters:
        total_steps = min(total_steps, args.train_iters)
    total_steps = max(total_steps, 1)

    lora_cfg = (LoraConfig(r=args.lora_r, alpha=args.lora_alpha,
                           dropout=args.lora_dropout)
                if args.use_lora else None)
    use_pp = args.mesh_pipe > 1
    tc = TrainConfig(
        learning_rate=args.lr, warmup_ratio=args.warmup,
        total_steps=total_steps, schedule=args.lr_decay_style,
        weight_decay=args.weight_decay, grad_clip=args.clip_grad_max_norm,
        accum_steps=args.gradient_accumulation_steps,
        train_bio=args.train_bio, train_mlp=args.train_mlp,
        train_llm=args.train_llm, lora=lora_cfg, z_loss=args.z_loss,
        pp_micro=args.pp_microbatches if use_pp else 0,
        offload_opt_state=args.offload_opt_state)

    if args.init_from:
        # params-only warm start (target-free orbax read, same pattern as
        # the inference CLI's --checkpoint): graft saved base weights onto
        # the fresh tree leaf-by-leaf, keeping init dtypes. A saved "lora"
        # subtree is ignored — this is a BASE warm start.
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as _c:
            _restored = _c.restore(os.path.abspath(args.init_from))["params"]
        import jax.numpy as jnp
        params = jax.tree.map(
            lambda init, saved: jnp.asarray(saved, init.dtype),
            params, {k: _restored[k] for k in params})
        print_rank_0(f"warm-started params from {args.init_from}")

    if lora_cfg:
        assert not use_pp, "--use-lora is unsupported under --mesh-pipe"
        params = attach_lora(params, cfg, lora_cfg, jax.random.key(1))
        if args.qlora:
            # int8 frozen base under the bf16 adapters (QLoRA): the
            # layer linears/expert stacks swap to quantized storage,
            # embedding/head/norms stay bf16 for the fused-LCE loss
            from ..models import qwen3 as _q
            params["text"] = _q.quantize_for_training(params["text"],
                                                      cfg.text)
    else:
        assert not args.qlora, "--qlora requires --use-lora"

    # ---- mesh + sharding (replaces NCCL/ZeRO init, train.py:606-620) ----
    if use_pp:
        from ..parallel.pipeline import make_pp_mesh
        assert args.mesh_tensor == 1 and args.mesh_seq == 1, (
            "--mesh-pipe uses a (pipe, data) mesh; tensor/seq axes "
            "compose with the fsdp mesh instead")
        n_dev = len(jax.devices())
        mesh = make_pp_mesh(pipe=args.mesh_pipe,
                            data=n_dev // args.mesh_pipe)
    else:
        if args.mesh_expert > 1:
            assert cfg.text.num_experts, (
                "--mesh-expert requires a MoE text preset "
                "(cfg.text.num_experts > 0)")
        mesh = make_mesh(data=args.mesh_data, fsdp=args.mesh_fsdp,
                         tensor=args.mesh_tensor, seq=args.mesh_seq,
                         expert=args.mesh_expert,
                         dcn_data=args.mesh_dcn_data)
    print_rank_0(f"mesh: {dict(mesh.shape)}")

    os.makedirs(args.output_dir, exist_ok=True)
    logger = MetricLogger(args.output_dir, args.experiment_name,
                          console_every=args.log_interval,
                          report_to=args.report_to,
                          config={k: v for k, v in vars(args).items()
                                  if isinstance(v, (int, float, str, bool))})

    # preemption handling (beyond the reference, SURVEY.md §5.3): SIGTERM
    # requests a checkpoint at the next step boundary
    import signal
    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True
    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # non-main thread (tests)

    from jax.sharding import NamedSharding, PartitionSpec as P

    if use_pp:
        from ..parallel.pipeline import pp_param_specs

        def put_params(p):
            return jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
                p, pp_param_specs(p))

        def put_batch(b):
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    NamedSharding(mesh, P("data")), np.asarray(x)), b)
    else:
        def put_params(p):
            return shard_params(p, mesh)

        def put_batch(b):
            return make_global_batch(b, mesh,
                                     seq_shard=args.mesh_seq > 1)

    with jax.sharding.set_mesh(mesh):
        params = put_params(params)
        state = init_train_state(params, tc)
        del params
        if args.resume_from:
            state = ckpt_lib.restore_train_state(args.resume_from, state)
            print_rank_0(f"resumed from {args.resume_from} "
                         f"at step {int(state.step)}")
        step_raw = make_train_step(cfg, tc)
        if tc.offload_opt_state:
            from .trainer import make_offloaded_step, offload_opt_state
            state = offload_opt_state(state)  # also re-places restores
            step_raw = make_offloaded_step(step_raw, state)
        step_fn = jax.jit(step_raw)

        micro = args.batch_size_per_gpu * args.gradient_accumulation_steps
        n_shard = (mesh.shape.get("data", 1)
                   * mesh.shape.get("fsdp", 1))
        assert micro % n_shard == 0, (
            f"global microbatch {micro} must divide over data*fsdp={n_shard}")
        assert micro % pc == 0, (
            f"global microbatch {micro} must divide over "
            f"process_count={pc}")
        local_micro = micro // pc  # rows THIS host feeds per global batch

        if use_pp:
            from ..parallel.pipeline import pp_loss_fn as _pp_loss
            eval_loss_fn = jax.jit(
                lambda p, b: _pp_loss(p, cfg, b, n_micro=tc.pp_micro)[0])
        else:
            eval_loss_fn = jax.jit(
                lambda p, b: fusion.loss_fn(p, cfg, b)[0])

        def run_eval() -> float:
            losses = []
            for eb in iterate_batches(eval_ds, local_micro, drop_last=True):
                eb = put_batch(eb)
                losses.append(float(eval_loss_fn(state.params, eb)))
            return float(np.mean(losses)) if losses else float("nan")

        best_eval, bad_evals = float("inf"), 0
        saved = []
        step = 0
        metrics = None  # stays None if no step runs (tiny dataset/epochs=0)
        timer = StepTimer()
        t_start = time.perf_counter()
        rng = jax.random.key(args.seed + 7)
        stop = False

        from ..data.pipeline import input_pipeline

        for epoch in range(args.epochs):
            if stop:
                break
            # tokenize/collate the NEXT batch on a background thread while
            # the device runs the CURRENT step, and issue batch i+1's
            # device transfer before blocking on step i
            batches = input_pipeline(
                train_ds, local_micro, shuffle=True, seed=args.seed,
                epoch=epoch, put=put_batch,
                depth=args.prefetch_depth) if args.prefetch_depth else (
                put_batch(b) for b in iterate_batches(
                    train_ds, local_micro, shuffle=True, seed=args.seed,
                    epoch=epoch))
            for batch in batches:
                rng, srng = jax.random.split(rng)
                timer.start()
                with trace(args.profile_log_dir if step == 2 else None):
                    state, metrics = step_fn(state, batch, srng)
                timer.stop()
                step += 1
                if step % args.log_interval == 0:
                    record = {"loss": metrics["loss"],
                              "grad_norm": metrics["grad_norm"],
                              "learning_rate": metrics["learning_rate"],
                              "epoch": epoch}
                    if "moe_load_balance" in metrics:
                        record["moe_load_balance"] = (
                            metrics["moe_load_balance"])
                    if args.compute_domain_losses:
                        record.update(domain_loss_metrics(
                            {k: np.asarray(v) for k, v in metrics.items()}))
                    logger.log(step, record)
                if eval_ds is not None and step % args.eval_interval == 0:
                    el = run_eval()
                    logger.log(step, {"eval_loss": el})
                    if el < best_eval:
                        best_eval, bad_evals = el, 0
                    else:
                        bad_evals += 1
                        if bad_evals >= args.early_stopping_patience:
                            print_rank_0(
                                f"early stopping at step {step} "
                                f"(best eval {best_eval:.4f})")
                            stop = True
                            break
                if step % args.save_interval == 0 or step == total_steps:
                    path = os.path.join(args.output_dir, f"ckpt_{step}")
                    ckpt_lib.save_train_state(path, state)
                    ckpt_lib.export_adapter(
                        os.path.join(args.output_dir,
                                     f"adapter_{step}.npz"),
                        state.params, lora_cfg=lora_cfg)
                    saved.append(path)
                    while len(saved) > args.save_total_limit:
                        old = saved.pop(0)
                        import shutil
                        # never delete under an in-flight async save
                        ckpt_lib.wait_for_saves()
                        shutil.rmtree(old, ignore_errors=True)
                if preempted["flag"]:
                    path = os.path.join(args.output_dir, "ckpt_preempt")
                    # the process is about to die: block until durable
                    ckpt_lib.save_train_state(path, state, wait=True)
                    print_rank_0(f"SIGTERM: saved {path}; exiting")
                    stop = True
                    break
                if step >= total_steps:
                    stop = True
                    break

        ckpt_lib.wait_for_saves()  # async saves must land before exit
        wall = time.perf_counter() - t_start
        if metrics is None:
            raise SystemExit(
                "no training step executed: dataset yielded zero batches "
                f"(len(train)={len(train_ds)}, "
                f"batch-size={args.batch_size_per_gpu} "
                f"x accum={args.gradient_accumulation_steps}, "
                f"epochs={args.epochs}) — "
                "reduce batch size / accumulation or add data")
        final_loss = float(metrics["loss"])
        print_rank_0(f"done: {step} steps in {wall:.1f}s "
                     f"(final loss {final_loss:.4f}) "
                     f"timing={timer.summary()}")
        logger.close()
        return {"steps": step, "final_loss": final_loss,
                "best_eval": best_eval, "wall_seconds": wall,
                "step_timing": timer.summary()}


if __name__ == "__main__":
    main()
