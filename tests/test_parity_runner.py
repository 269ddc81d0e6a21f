"""CI drive of the real-checkpoint parity runner (molly_tpu.tools.parity)
against tiny randomly-initialized HF checkpoints saved to disk — the same
command that gates the published molly-1.7B/4B/8B checkpoints when mounted
(BASELINE.md logit-parity gate)."""

import json

import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_ckpts(tmp_path_factory):
    from transformers import (EsmConfig, EsmForMaskedLM, Qwen3Config,
                              Qwen3ForCausalLM)

    root = tmp_path_factory.mktemp("ckpts")
    torch.manual_seed(0)
    qwen = Qwen3ForCausalLM(Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512, rope_theta=1e6,
        tie_word_embeddings=True)).eval()
    qwen.save_pretrained(root / "qwen")

    def esm(seed, **kw):
        torch.manual_seed(seed)
        m = EsmForMaskedLM(EsmConfig(
            vocab_size=40, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            mask_token_id=32, pad_token_id=1, max_position_embeddings=128,
            layer_norm_eps=1e-5, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0, **kw)).eval()
        return m

    esm(1, position_embedding_type="rotary",
        token_dropout=True).save_pretrained(root / "esm")
    esm(2, position_embedding_type="absolute", token_dropout=False,
        emb_layer_norm_before=True).save_pretrained(root / "nt")
    return root


def test_parity_runner_end_to_end(tiny_ckpts, tmp_path):
    from molly_tpu.tools.parity import main

    out = str(tmp_path / "parity.json")
    report = main(["--text", str(tiny_ckpts / "qwen"),
                   "--dna-rna", str(tiny_ckpts / "nt"),
                   "--protein", str(tiny_ckpts / "esm"),
                   "--output", out,
                   "--prompts", "4", "--seq-len", "24", "--new-tokens", "8"])
    with open(out) as f:
        on_disk = json.load(f)
    assert on_disk["all_pass"] == report["all_pass"]

    names = {c["check"] for c in report["checks"]}
    assert {"text_logits", "dna_rna_final_hidden", "protein_final_hidden",
            "fusion_logits", "greedy_decode_match"} <= names
    for c in report["checks"]:
        assert c["pass"], c
    # layer-by-layer tables exist and localize nothing (all tiny diffs)
    assert len(report["text_layerwise"]) == 2  # L-1 pure layer outputs
    assert all(r["max_abs"] < 2e-3 for r in report["text_layerwise"])


def test_parity_runner_text_only(tiny_ckpts, tmp_path):
    from molly_tpu.tools.parity import main

    out = str(tmp_path / "parity_text.json")
    report = main(["--text", str(tiny_ckpts / "qwen"), "--output", out,
                   "--prompts", "2", "--seq-len", "16", "--new-tokens", "4"])
    assert {c["check"] for c in report["checks"]} == {
        "text_logits", "greedy_decode_match"}
    assert report["all_pass"]


def test_parity_runner_full_gate(tiny_ckpts, tmp_path):
    """--full-gate: the eval-score-parity leg (BASELINE.md's second gate)
    runs end to end on tiny random checkpoints — token-exact greedy on
    both stacks must yield IDENTICAL evalsuite scores (delta 0.0)."""
    import os

    from molly_tpu.tools.parity import main

    out = str(tmp_path / "parity_gate.json")
    report = main(["--text", str(tiny_ckpts / "qwen"),
                   "--dna-rna", str(tiny_ckpts / "nt"),
                   "--protein", str(tiny_ckpts / "esm"),
                   "--output", out, "--full-gate",
                   "--gate-prompts", "20",
                   "--prompts", "2", "--seq-len", "24", "--new-tokens", "6"])
    gate = next(c for c in report["checks"]
                if c["check"] == "eval_score_parity")
    assert gate["pass"], gate
    assert gate["token_match_fraction"] == 1.0
    assert gate["max_abs_diff"] == 0.0
    # every gate task got scored on both sides and both JSONLs exist
    assert report["eval_score_gate"]["per_task_delta"]
    for path in report["eval_score_gate"]["jsonl"].values():
        assert os.path.exists(path)
    assert report["all_pass"]
