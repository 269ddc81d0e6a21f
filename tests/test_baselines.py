"""Baseline (encoder+head) tests: dataset pairing, model regimes, and an
end-to-end tiny training run with eval metric."""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from molly_tpu.baselines import (
    BaselineConfig,
    ClassificationDataset,
    forward_logits,
    init_params,
    loss_fn,
)
from molly_tpu.data import NucleotideTokenizer, ProteinTokenizer
from molly_tpu.models import tiny_esm


@pytest.fixture(scope="module")
def toks():
    return NucleotideTokenizer(), ProteinTokenizer()


def _df(rows):
    return pd.DataFrame(rows)


def test_dataset_nt_and_both_tag_styles(toks):
    dna, prot = toks
    df = _df([
        {"input": "x <dna>ACGTAC</dna> y", "label": "positive"},
        {"input": "x <dna>ACGTAC<dna> y", "label": "negative"},  # ref style
    ])
    ds = ClassificationDataset(df, "NT", dna, prot, 8, 8)
    s0, s1 = ds[0], ds[1]
    assert s0["x1"].shape == (8,)
    assert s0["labels"] == 1 and s1["labels"] == 0
    assert (s0["mask1"] == (s0["x1"] != 1)).all()


def test_dataset_pairings(toks):
    dna, prot = toks
    df = _df([{"input": "<dna>ACGT</dna> and <protein>MKT</protein>",
               "label": "positive"}])
    s = ClassificationDataset(df, "NT+ESM", dna, prot, 8, 8)[0]
    assert "x2" in s and "mask2" in s

    df2 = _df([{"input": "<dna>ACGT</dna><dna>GGTT</dna>",
                "label": "negative"}])
    s2 = ClassificationDataset(df2, "NT+NT", dna, prot, 8, 8)[0]
    assert s2["x1"].shape == s2["x2"].shape

    with pytest.raises(AssertionError):
        ClassificationDataset(df2, "NT", dna, prot, 8, 8)[0]


def test_dataset_multilabel_ec(toks):
    dna, prot = toks
    label2id = {"1.1.1.1": 0, "2.7.11.12": 1}
    df = _df([{"input": "<protein>MKT</protein>",
               "label": "EC1.1.1.1, 2.7.11.12"}])
    s = ClassificationDataset(df, "ESM", dna, prot, 8, 8,
                              label2id=label2id, multi_label=True)[0]
    assert s["labels"].tolist() == [1.0, 1.0]


def test_model_types_forward(toks):
    dna, prot = toks
    nt_cfg = tiny_esm(vocab_size=dna.vocab_size, mask_token_id=2,
                      dtype="float32")
    prot_cfg = tiny_esm(vocab_size=prot.vocab_size, dtype="float32")
    batch1 = {
        "x1": jnp.asarray(np.random.randint(6, 100, (2, 8))),
        "mask1": jnp.ones((2, 8), jnp.int32),
        "labels": jnp.asarray([0, 1]),
    }
    batch2 = {**batch1,
              "x2": jnp.asarray(np.random.randint(4, 20, (2, 8))),
              "mask2": jnp.ones((2, 8), jnp.int32)}
    # ESM+ESM: both inputs must be protein-vocab ids
    batch3 = {**batch2, "x1": batch2["x2"]}
    for mt, batch in (("NT", batch1), ("NT+ESM", batch2),
                      ("ESM+ESM", batch3)):
        cfg = BaselineConfig(model_type=mt, nt=nt_cfg, protein=prot_cfg,
                             num_labels=3)
        params = init_params(cfg, jax.random.key(0))
        logits = forward_logits(params, cfg, batch)
        assert logits.shape == (2, 3)
        loss, _ = loss_fn(params, cfg, batch)
        assert np.isfinite(float(loss))


def test_bce_multi_answer(toks):
    dna, prot = toks
    cfg = BaselineConfig(
        model_type="ESM", nt=None,
        protein=tiny_esm(vocab_size=prot.vocab_size, dtype="float32"),
        num_labels=4, multi_answer=True)
    params = init_params(cfg, jax.random.key(1))
    batch = {
        "x1": jnp.asarray(np.random.randint(4, 20, (2, 8))),
        "mask1": jnp.ones((2, 8), jnp.int32),
        "labels": jnp.asarray([[1, 0, 1, 0], [0, 0, 0, 1]], jnp.float32),
    }
    loss, logits = loss_fn(params, cfg, batch)
    assert logits.shape == (2, 4) and np.isfinite(float(loss))


def test_baseline_train_cli_smoke(tmp_path, toks):
    from molly_tpu.baselines.train import main

    rows = []
    for i in range(12):
        rows.append({"input": f"<dna>ACGTAC{'GT' * (i % 3)}</dna>",
                     "label": "positive" if i % 2 else "negative"})
    p = str(tmp_path / "b.parquet")
    pd.DataFrame(rows).to_parquet(p)

    result = main([
        "--model-type", "NT", "--train-file", p, "--eval-file", p,
        "--output-dir", str(tmp_path / "out"), "--tiny",
        "--dna-rna-k-tokens", "8", "--batch-size", "4",
        "--train-iters", "3", "--log-interval", "2", "--eval-interval", "3",
        "--metric", "mcc",
    ])
    assert result["steps"] == 3
    assert "eval_mcc" in result
