"""Data tools + LLM judge + embed tool tests."""

import json

import numpy as np
import pandas as pd
import pytest

from molly_tpu.tools import (
    balanced_subsample,
    check_data_leak,
    convert_inference_jsonl,
    dataset_stats,
    filter_by_markers,
    judge_records,
    jsonl_to_parquet,
    merge_parquets,
    parse_verdict,
    replace_reserved_tokens,
    split_by_task,
    strip_think,
    validate_tagged_sequences,
)


def test_replace_reserved_tokens():
    t = ("seq <|reserved_special_token_1|>ACGT</|reserved_special_token_1|>"
         " and <|reserved_special_token_3|>MKT</|reserved_special_token_3|>")
    out = replace_reserved_tokens(t)
    assert out == "seq <dna>ACGT</dna> and <protein>MKT</protein>"


def test_validate_tagged_sequences():
    assert validate_tagged_sequences("<dna>ACGTN</dna>") == []
    assert validate_tagged_sequences("<dna>ACGTX</dna>")  # X invalid for DNA
    assert validate_tagged_sequences("<protein>MKTX</protein>") == []


def test_jsonl_roundtrip_and_validation(tmp_path):
    src = tmp_path / "in.jsonl"
    rows = [
        {"task": "t", "input": "<dna>ACGT</dna>", "output": "Yes",
         "label": "positive", "kind": "dna"},
        {"task": "t", "input": "<dna>ACGQ</dna>", "output": "No",
         "label": "negative", "kind": "dna"},  # invalid Q
    ]
    with open(src, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    n, dropped = jsonl_to_parquet(str(src), str(tmp_path / "out.parquet"))
    assert n == 1 and dropped == 1
    df = pd.read_parquet(tmp_path / "out.parquet")
    assert list(df.columns) == ["task", "input", "think", "output",
                                "label", "kind"]


def test_convert_inference_jsonl(tmp_path):
    src = tmp_path / "inf.jsonl"
    with open(src, "w") as f:
        f.write(json.dumps({"task": "t", "input": "i",
                            "decoded_output": "Yes", "gt_label": "positive",
                            "kind": "dna"}) + "\n")
    dst = tmp_path / "eval.jsonl"
    assert convert_inference_jsonl(str(src), str(dst)) == 1
    rec = json.loads(open(dst).read())
    assert rec["model_output"] == "Yes" and rec["label"] == "positive"


def test_split_merge_leak(tmp_path):
    df = pd.DataFrame([{"task": f"t{i % 2}", "input": f"x{i}",
                        "label": "positive"} for i in range(20)])
    tr, va = split_by_task(df, 0.8, seed=0)
    assert len(tr) == 16 and len(va) == 4
    assert set(tr["input"]) & set(va["input"]) == set()

    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    tr.to_parquet(p1)
    va.to_parquet(p2)
    assert check_data_leak(p1, p2)["overlap"] == 0
    assert check_data_leak(p1, p1)["overlap"] == 16

    merged = str(tmp_path / "m.parquet")
    assert merge_parquets([p1, p2], merged) == 20


def test_stats_subsample_filter():
    df = pd.DataFrame([
        {"task": "a", "input": "<dna>ACGT</dna>", "output": "y"},
        {"task": "a", "input": "<dna>ACGT</dna><protein>MKT</protein>",
         "output": "n"},
        {"task": "b", "input": "plain", "output": "y"},
    ])
    st = dataset_stats(df)
    assert st["rows"] == 3 and st["tasks"] == {"a": 2, "b": 1}
    sub = balanced_subsample(df, 1)
    assert len(sub) == 2
    only_dna = filter_by_markers(df, required=["dna"], forbidden=["protein"])
    assert len(only_dna) == 1


def test_llm_judge_with_stub():
    records = [
        {"task": "t1", "model_output": "Yes it binds", "label": "positive"},
        {"task": "t1", "model_output": "No", "label": "positive"},
        {"task": "t2", "decoded_output": "<think>hmm</think>Yes",
         "gt_label": "positive"},
    ]

    # stub judge: correct iff answer contains the word yes
    def stub(prompt):
        return "Yes" if "yes" in prompt.lower().split("model answer:")[1] \
            else "No"

    out = judge_records(records, stub)
    assert out["t1"]["accuracy"] == 0.5
    assert out["t2"]["accuracy"] == 1.0
    assert out["overall"]["total"] == 3


def test_strip_think_and_parse():
    assert strip_think("<think>reasoning\nstuff</think>Yes") == "Yes"
    assert parse_verdict("Yes.") is True
    assert parse_verdict("no way") is False
    assert parse_verdict("maybe") is None


def test_embed_tool_small():
    import jax

    from molly_tpu.data import (ByteTextTokenizer, DataConfig,
                                NucleotideTokenizer, OmicsDataset,
                                ProteinTokenizer)
    from molly_tpu.models import fusion, tiny_esm, tiny_qwen3
    from molly_tpu.models.fusion import FusionConfig
    from molly_tpu.tools.embed import pca_2d, run_embedding

    text = ByteTextTokenizer()
    cfg = FusionConfig(
        text=tiny_qwen3(vocab_size=512),
        dna_rna=tiny_esm(vocab_size=NucleotideTokenizer().vocab_size,
                         mask_token_id=2),
        protein=tiny_esm(vocab_size=ProteinTokenizer().vocab_size),
        dna_rna_k_tokens=4, protein_k_tokens=4)
    params = fusion.init_params(cfg, jax.random.key(0))

    df = pd.DataFrame([
        {"task": "a", "input": "x <dna>ACGTAC</dna>", "output": "y",
         "think": "", "label": "", "kind": "dna"},
        {"task": "b", "input": "<protein>MKTA</protein> z", "output": "n",
         "think": "", "label": "", "kind": "protein"},
    ])
    ds = OmicsDataset(df, text, NucleotideTokenizer(), ProteinTokenizer(),
                      DataConfig(max_len=160, dna_rna_k_tokens=4,
                                 protein_k_tokens=4,
                                 max_dna_rna_segments=1,
                                 max_protein_segments=1))
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        res = run_embedding(ds, params, cfg, d, batch_size=2)
        emb = np.load(f"{d}/embeddings.npy")
    assert emb.shape == (2, cfg.text.hidden_size + 2 * 32)
    assert np.isfinite(emb).all()
    proj = pca_2d(emb)
    assert proj.shape == (2, 2)


def test_ablation_subset():
    import pandas as pd

    from molly_tpu.tools.data_tools import ablation_subset

    df = pd.DataFrame([
        {"task": "a", "input": "x <dna>ACGT</dna>"},
        {"task": "b", "input": "x <rna>ACGU</rna>"},
        {"task": "c", "input": "x <protein>MKT</protein>"},
        {"task": "d", "input": "<dna>ACGT</dna> <protein>MKT</protein>"},
        {"task": "e", "input": "no tags at all"},
    ])
    assert list(ablation_subset(df, ["dna"])["task"]) == ["a"]
    assert list(ablation_subset(df, ["dna", "protein"])["task"]) == \
        ["a", "c", "d"]
    assert list(ablation_subset(df, ["rna", "protein"])["task"]) == \
        ["b", "c"]
    # untagged rows never qualify
    assert "e" not in set(ablation_subset(
        df, ["dna", "rna", "protein"])["task"])


def test_kegg_report(tmp_path):
    import json as _json

    from molly_tpu.tools.data_tools import extract_answer, kegg_report

    assert extract_answer("blah\nAnswer: Glycolysis\nmore") == "glycolysis"
    assert extract_answer("Answer：膜转运") == "膜转运"
    assert extract_answer("no answer here") == ""

    rows = [
        {"decoded_output": "Answer: glycolysis", "gt_label": "Glycolysis"},
        {"decoded_output": "Answer: the glycolysis pathway",
         "gt_label": "glycolysis"},              # fuzzy substring match
        {"decoded_output": "Answer: citrate cycle", "gt_label": "apoptosis"},
    ]
    p = tmp_path / "kegg.jsonl"
    p.write_text("\n".join(_json.dumps(r) for r in rows))
    png = str(tmp_path / "cm.png")
    rep = kegg_report(str(p), save_confusion=png)
    assert rep["n"] == 3 and rep["fuzzy_matched"] == 1
    assert abs(rep["Accuracy"] - 2 / 3) < 1e-9
    import os
    assert os.path.exists(png)


def test_ablation_cli(tmp_path):
    import pandas as pd

    from molly_tpu.tools.cli import main as tools_main

    df = pd.DataFrame([
        {"task": "a", "input": "<dna>ACGT</dna>", "think": "",
         "output": "y", "label": "", "kind": ""},
        {"task": "b", "input": "<protein>MKT</protein>", "think": "",
         "output": "y", "label": "", "kind": ""},
    ])
    src = str(tmp_path / "all.parquet")
    dst = str(tmp_path / "dna.parquet")
    df.to_parquet(src)
    tools_main(["ablation", "--src", src, "--dst", dst,
                "--modalities", "dna"])
    assert list(pd.read_parquet(dst)["task"]) == ["a"]


def test_count_tokens_stats():
    import pandas as pd

    from molly_tpu.data.tokenizers import ByteTextTokenizer
    from molly_tpu.tools.data_tools import count_tokens_with_tokenizer

    df = pd.DataFrame({"output": ["abc", "abcdef", ""]})
    s = count_tokens_with_tokenizer(df, ByteTextTokenizer())
    assert s["rows"] == 3 and s["total_tokens"] == 9
    assert s["max"] == 6 and s["min"] == 0
    import pytest
    with pytest.raises(ValueError, match="column"):
        count_tokens_with_tokenizer(df, ByteTextTokenizer(), column="nope")
