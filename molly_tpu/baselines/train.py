"""Baseline training CLI — the reference ``baselines/train.py`` equivalent
(:13-281): frozen backbone(s) + trainable linear head, HF-Trainer-style
eval metrics (acc / mcc / fmax / auc) and a head-update sanity check
(HeadUpdateCallback, :240-251).

Usage:
  python -m molly_tpu.baselines.train --model-type NT+ESM \
      --train-file train.parquet --eval-file eval.parquet --metric mcc ...
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("molly_tpu baselines")
    p.add_argument("--model-type", default="NT",
                   choices=["NT", "ESM", "NT+ESM", "NT+NT", "ESM+ESM"])
    p.add_argument("--train-file", required=True)
    p.add_argument("--eval-file", default=None)
    p.add_argument("--output-dir", default="runs/baseline")
    p.add_argument("--num-labels", type=int, default=2)
    p.add_argument("--multi-label", action="store_true")
    p.add_argument("--label-set", default=None,
                   choices=[None, "ec", "ncrna", "modification"],
                   help="bundled label2id mapping for multilabel tasks")
    p.add_argument("--metric", default="acc",
                   choices=["acc", "mcc", "fmax", "auc"])
    p.add_argument("--dna-rna-k-tokens", type=int, default=1024)
    p.add_argument("--protein-k-tokens", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--train-iters", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--log-interval", type=int, default=10)
    p.add_argument("--eval-interval", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--tiny", action="store_true")
    return p


def load_label_set(name: str) -> Dict[str, int]:
    from ..evalsuite.harness import load_ec_labels
    from ..evalsuite.metrics import MODIFICATION_CLASSES, RNA_CLASSES

    if name == "ec":
        labels = load_ec_labels()
    elif name == "ncrna":
        labels = sorted(RNA_CLASSES)
    elif name == "modification":
        labels = [m for m in sorted(MODIFICATION_CLASSES) if m != "none"]
    else:
        raise ValueError(name)
    return {l: i for i, l in enumerate(labels)}


def compute_metric(name: str, logits, labels, multi_label: bool) -> float:
    import numpy as np
    from sklearn.metrics import (accuracy_score, matthews_corrcoef,
                                 roc_auc_score)

    from ..evalsuite.metrics import fmax

    logits = np.asarray(logits, dtype=np.float32)
    labels = np.asarray(labels)
    if name == "acc":
        preds = ((logits > 0).astype(int) if multi_label
                 else logits.argmax(-1))
        return float(accuracy_score(labels, preds))
    if name == "mcc":
        return float(matthews_corrcoef(labels, logits.argmax(-1)))
    if name == "fmax":
        return float(fmax(1 / (1 + np.exp(-logits)), labels))
    if name == "auc":
        try:
            return float(roc_auc_score(labels, logits, average="macro"))
        except ValueError:
            return 0.0
    raise ValueError(name)


def main(argv=None) -> dict:
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..data import default_modality_tokenizers
    from ..data.collate import iterate_batches
    from ..models import ESM_PRESETS, tiny_esm
    from ..utils import MetricLogger, print_rank_0
    from .dataset import ClassificationDataset, collate
    from .model import BaselineConfig, forward_logits, init_params, loss_fn

    dna_tok, prot_tok = default_modality_tokenizers()
    if args.tiny:
        nt_cfg = tiny_esm(vocab_size=dna_tok.vocab_size, mask_token_id=2,
                          dtype="float32")
        prot_cfg = tiny_esm(vocab_size=prot_tok.vocab_size, dtype="float32")
    else:
        nt_cfg, prot_cfg = ESM_PRESETS["nt-500m"], ESM_PRESETS["esm2-650m"]

    label2id = load_label_set(args.label_set) if args.label_set else None
    num_labels = len(label2id) if label2id else args.num_labels
    cfg = BaselineConfig(model_type=args.model_type, nt=nt_cfg,
                         protein=prot_cfg, num_labels=num_labels,
                         multi_answer=args.multi_label)

    def make_ds(path, shuffle):
        return ClassificationDataset(
            path, args.model_type, dna_tok, prot_tok,
            args.dna_rna_k_tokens, args.protein_k_tokens,
            label2id=label2id, multi_label=args.multi_label,
            shuffle=shuffle, seed=args.seed)

    train_ds = make_ds(args.train_file, True)
    eval_ds = make_ds(args.eval_file, False) if args.eval_file else None

    params = init_params(cfg, jax.random.key(args.seed))
    # frozen backbones: only the head trains (model.py freeze_backbone)
    labels_tree = {k: ("train" if k == "head" else "freeze")
                   for k in params}
    tx = optax.multi_transform(
        {"train": optax.adamw(args.lr), "freeze": optax.set_to_zero()},
        labels_tree)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        (loss, logits), grads = jax.value_and_grad(
            lambda p: loss_fn(p, cfg, batch), has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, logits

    eval_logits_fn = jax.jit(lambda p, b: forward_logits(p, cfg, b))

    os.makedirs(args.output_dir, exist_ok=True)
    logger = MetricLogger(args.output_dir, "baseline",
                          console_every=args.log_interval)
    head0 = np.asarray(params["head"]["kernel"])

    it = 0
    result = {}
    for epoch in range(args.epochs):
        for batch in iterate_batches(train_ds, args.batch_size, shuffle=True,
                                     seed=args.seed, epoch=epoch,
                                     collate_fn=collate):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, loss, _ = step(params, opt_state, batch)
            it += 1
            if it % args.log_interval == 0:
                # head-update sanity check (HeadUpdateCallback equivalent)
                delta = float(np.linalg.norm(
                    np.asarray(params["head"]["kernel"]) - head0))
                logger.log(it, {"loss": loss, "head_delta": delta})
            if eval_ds is not None and it % args.eval_interval == 0:
                all_logits, all_labels = [], []
                for eb in iterate_batches(eval_ds, args.batch_size,
                                          drop_last=False,
                                          collate_fn=collate):
                    lb = eb.pop("labels")
                    eb = {k: jnp.asarray(v) for k, v in eb.items()}
                    all_logits.append(np.asarray(eval_logits_fn(params, eb)))
                    all_labels.append(lb)
                m = compute_metric(args.metric, np.concatenate(all_logits),
                                   np.concatenate(all_labels),
                                   args.multi_label)
                logger.log(it, {f"eval_{args.metric}": m})
                result[f"eval_{args.metric}"] = m
            if args.train_iters and it >= args.train_iters:
                break
        if args.train_iters and it >= args.train_iters:
            break

    result.update(steps=it, final_loss=float(loss))
    print_rank_0(json.dumps(result))
    logger.close()
    return result


if __name__ == "__main__":
    main()
