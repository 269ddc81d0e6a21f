"""Model-backed sentiment fallback (evalsuite.metrics.hf_sentiment_fn):
injectability into binary_outcomes/evaluate_task and score delta vs the
offline lexicon on a synthetic fixture (reference eval.py:84-112 uses a
roberta sentiment checkpoint for unparseable binary outputs)."""

import pytest

torch = pytest.importorskip("torch")

from molly_tpu.evalsuite import evaluate_task, metrics as M


@pytest.fixture(scope="module")
def sentiment_dir(tmp_path_factory):
    """Tiny local HF sequence-classification checkpoint with a bert
    tokenizer built from a handwritten vocab (no network)."""
    from transformers import BertConfig, BertForSequenceClassification, \
        BertTokenizer

    d = tmp_path_factory.mktemp("sentiment")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "good", "maybe", "signal", "strong", "binding", "likely",
             "weak", "inactive"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizer(str(d / "vocab.txt"))
    tok.save_pretrained(d)
    torch.manual_seed(0)
    cfg = BertConfig(
        vocab_size=len(vocab), hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2, num_labels=3,
        max_position_embeddings=64,
        id2label={0: "negative", 1: "neutral", 2: "positive"},
        label2id={"negative": 0, "neutral": 1, "positive": 2})
    BertForSequenceClassification(cfg).save_pretrained(d)
    return str(d)


def test_hf_sentiment_contract(sentiment_dir):
    fn = M.hf_sentiment_fn(sentiment_dir)
    cls, score = fn("signal good maybe")
    assert cls in (0, 1)
    assert 0.0 <= score <= 1.0
    # deterministic
    assert fn("signal good maybe") == (cls, score)


def test_hf_sentiment_rejects_wrong_labels(tmp_path, sentiment_dir):
    from transformers import BertConfig, BertForSequenceClassification, \
        BertTokenizer

    tok = BertTokenizer(f"{sentiment_dir}/vocab.txt")
    tok.save_pretrained(tmp_path)
    cfg = BertConfig(vocab_size=10, hidden_size=16, intermediate_size=32,
                     num_hidden_layers=1, num_attention_heads=2,
                     num_labels=2, max_position_embeddings=64,
                     id2label={0: "LABEL_0", 1: "LABEL_1"})
    BertForSequenceClassification(cfg).save_pretrained(tmp_path)
    with pytest.raises(ValueError, match="positive"):
        M.hf_sentiment_fn(str(tmp_path))


def test_injected_model_changes_scores(sentiment_dir):
    """Unparseable outputs route through the injected fallback; the tiny
    random model and the lexicon disagree on this fixture, so MCC/Acc
    differ — documenting that the fallback choice is score-relevant."""
    model_fn = M.hf_sentiment_fn(sentiment_dir)
    # unparseable by keywords (no yes/no-family substrings), decidable by
    # the lexicon ('strong'/'likely' vs 'weak'/'inactive')
    entries = [
        {"label": "positive", "model_output": "strong binding likely"},
        {"label": "negative", "model_output": "weak inactive"},
        {"label": "positive", "model_output": "strong signal"},
        {"label": "negative", "model_output": "weak weak"},
    ]
    calls = []

    def counting_model_fn(text):
        calls.append(text)
        return model_fn(text)

    with_model = evaluate_task("pd-prom_300", entries,
                               sentiment_fn=counting_model_fn)
    assert len(calls) == len(entries)  # every row fell through to the model
    with_lexicon = evaluate_task("pd-prom_300", entries)
    assert set(with_model) == set(with_lexicon) == {"MCC"}
    # the lexicon reads the cue words: perfect on this fixture; the
    # untrained model is ~chance — the delta documents that the fallback
    # choice is score-relevant
    assert with_lexicon["MCC"] == 1.0
    assert with_model["MCC"] != with_lexicon["MCC"]
