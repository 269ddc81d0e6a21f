"""End-to-end train CLI smoke: tiny model, tiny parquet, few steps, with
eval + checkpoint + adapter export (the reference's --test-code equivalent,
SURVEY.md §4)."""

import json
import os

import pandas as pd
import pytest


def _toy_parquet(path, n=16):
    rows = []
    for i in range(n):
        rows.append({
            "task": "pd-prom_300" if i % 2 else "Solubility-Solubility",
            "input": (f"Is <dna>ACGTACGTACGT</dna> a promoter (v{i})?"
                      if i % 2 else
                      f"Soluble? <protein>MKTAYIAKQR</protein> (v{i})"),
            "output": "Yes" if i % 3 else "No",
            "think": "", "label": "positive" if i % 3 else "negative",
            "kind": "dna" if i % 2 else "protein",
        })
    pd.DataFrame(rows).to_parquet(path)


@pytest.mark.parametrize("use_lora", [False, True])
def test_train_cli_smoke(tmp_path, use_lora):
    from molly_tpu.training.cli import build_argparser, run_training

    train_p = str(tmp_path / "train.parquet")
    _toy_parquet(train_p, 16)
    out_dir = str(tmp_path / "run")

    argv = [
        "--train-dataset-path", train_p,
        "--eval-dataset-path", train_p,
        "--output-dir", out_dir,
        "--tiny", "--dtype", "float32",
        "--max-len", "192", "--eval-max-len", "192",
        "--dna-rna-k-tokens", "4", "--protein-k-tokens", "4",
        "--batch-size-per-gpu", "2",
        "--gradient-accumulation-steps", "2",
        "--epochs", "1", "--train-iters", "3",
        "--log-interval", "1", "--eval-interval", "2",
        "--save-interval", "3",
        "--lr", "1e-3",
        "--mesh-data", "2", "--mesh-fsdp", "2", "--mesh-tensor", "2",
        "--compute-domain-losses", "true",
    ]
    if use_lora:
        argv += ["--use-lora", "true", "--lora-r", "2",
                 "--lora-dropout", "0.0"]
    args = build_argparser().parse_args(argv)
    result = run_training(args)

    assert result["steps"] == 3
    assert result["final_loss"] > 0 and result["final_loss"] < 20
    # metric stream written
    log = os.path.join(out_dir, "molly_tpu.jsonl")
    records = [json.loads(l) for l in open(log)]
    assert any("loss" in r for r in records)
    assert any("eval_loss" in r for r in records)
    # checkpoint + adapter exported at final step
    assert os.path.isdir(os.path.join(out_dir, "ckpt_3"))
    assert os.path.exists(os.path.join(out_dir, "adapter_3.npz"))


def test_train_cli_resume(tmp_path):
    from molly_tpu.training.cli import build_argparser, run_training

    train_p = str(tmp_path / "train.parquet")
    _toy_parquet(train_p, 16)
    base = [
        "--train-dataset-path", train_p,
        "--tiny", "--dtype", "float32",
        "--max-len", "192", "--dna-rna-k-tokens", "4",
        "--protein-k-tokens", "4",
        "--batch-size-per-gpu", "4", "--epochs", "1",
        "--log-interval", "1", "--lr", "1e-3",
        "--mesh-data", "1", "--mesh-fsdp", "4", "--mesh-tensor", "2",
    ]
    out1 = str(tmp_path / "run1")
    args = build_argparser().parse_args(
        base + ["--output-dir", out1, "--train-iters", "2",
                "--save-interval", "2"])
    r1 = run_training(args)
    assert r1["steps"] == 2

    out2 = str(tmp_path / "run2")
    args = build_argparser().parse_args(
        base + ["--output-dir", out2, "--train-iters", "3",
                "--save-interval", "3",
                "--resume-from", f"{out1}/ckpt_2"])
    r2 = run_training(args)
    # resumed at step 2, ran up to total 3
    assert r2["steps"] >= 1


def test_cli_segment_policy_flags():
    """--strict-segments / --max-*-segments parse and reach DataConfig
    defaults on both CLIs (plumbing regression, docs/MIGRATION.md)."""
    from molly_tpu.inference.cli import build_argparser as infer_parser
    from molly_tpu.training.cli import build_argparser as train_parser

    t = train_parser().parse_args(
        ["--train-dataset-path", "x.parquet", "--strict-segments", "true",
         "--max-dna-rna-segments", "7"])
    assert t.strict_segments is True and t.max_dna_rna_segments == 7

    i = infer_parser().parse_args(
        ["--input-file", "x.parquet", "--output-file", "y.jsonl",
         "--strict-segments", "--max-protein-segments", "6"])
    assert i.strict_segments is True and i.max_protein_segments == 6
