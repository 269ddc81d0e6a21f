"""Unit tests for tokenizers, splicing, labeling, and collation."""

import pandas as pd
import pytest

from molly_tpu.data import (
    ByteTextTokenizer,
    DataConfig,
    ENCODER_PAD_ID,
    LABEL_IGNORE,
    NucleotideTokenizer,
    OmicsDataset,
    OmicsSampleEncoder,
    ProteinTokenizer,
    collate_test,
    collate_train,
    iterate_batches,
    task_name_to_id,
)


@pytest.fixture(scope="module")
def toks():
    return ByteTextTokenizer(), NucleotideTokenizer(), ProteinTokenizer()


def make_encoder(toks, **kw):
    text, dna, prot = toks
    cfg = DataConfig(**kw)
    return OmicsSampleEncoder(text, dna, prot, cfg), cfg


# ---------------- tokenizers ----------------

def test_protein_tokenizer_roundtrip():
    t = ProteinTokenizer()
    ids = t.encode("MKTAYIAK", max_length=12)
    assert ids.shape == (12,)
    assert ids[0] == t.cls_id
    assert ids[9] == t.eos_id  # cls + 8 residues + eos
    assert (ids[10:] == t.pad_id).all()
    assert t.pad_id == ENCODER_PAD_ID


def test_protein_tokenizer_truncation():
    t = ProteinTokenizer()
    ids = t.encode("M" * 100, max_length=10)
    # HF semantics: cls + (k-2) residues + eos
    assert ids[0] == t.cls_id and ids[-1] == t.eos_id
    assert len(ids) == 10


def test_nucleotide_tokenizer_6mer():
    t = NucleotideTokenizer()
    # 12 bases -> cls + two 6-mers
    ids = t.encode("ACGTACGTACGT", max_length=8)
    assert ids[0] == t.cls_id
    assert ids[3] == t.pad_id  # cls + 2 kmers then pad
    assert t.pad_id == ENCODER_PAD_ID
    # tail shorter than 6 falls back to single nucleotides
    toks = t.tokenize("ACGTACGT")
    assert toks == ["ACGTAC", "G", "T"]
    # N forces single-nucleotide fallback
    assert "N" in t.tokenize("ACGNTA")
    # RNA uses DNA alphabet
    assert t.tokenize("ACGUAC") == ["ACGTAC"]


def test_byte_text_tokenizer_specials():
    t = ByteTextTokenizer()
    ids = t.encode("hi<|im_end|>")
    assert ids[-1] == t.eos_token_id
    assert t.decode(ids) == "hi<|im_end|>"
    assert t.decode(ids, skip_special_tokens=True) == "hi"
    # omics specials resolve and are distinct
    omics_ids = {t.convert_tokens_to_ids(f"<|{k}_{p}|>")
                 for k in ("dna", "rna", "protein")
                 for p in ("start", "pad", "end")}
    assert len(omics_ids) == 9


# ---------------- splicing ----------------

def test_splice_single_dna(toks):
    enc, cfg = make_encoder(toks, dna_rna_k_tokens=4, max_len=128)
    out = enc.splice("seq: <dna>ACGT</dna> done")
    ids = out["input_ids"]
    seg = out["segments"][0]
    assert seg["type"] == "dna" and seg["raw"] == "ACGT"
    start = seg["start"]
    sp = enc.special["dna"]
    assert ids[start] == sp["start"]
    assert ids[start + 1 : start + 5] == [sp["pad"]] * 4
    assert ids[start + 5] == sp["end"]
    # text around the tags is preserved
    assert enc.tok.decode(ids[len(enc.system_prompt_ids):start]) == "seq: "


def test_splice_multimodal_order(toks):
    enc, cfg = make_encoder(toks, dna_rna_k_tokens=2, protein_k_tokens=3)
    out = enc.splice(
        "p <protein>MKT</protein> then <dna>ACGT</dna> and <rna>ACGT</rna>")
    kinds = [s["type"] for s in out["segments"]]
    assert kinds == ["protein", "dna", "rna"]  # document order, not regex order
    # starts are strictly increasing
    starts = [s["start"] for s in out["segments"]]
    assert starts == sorted(starts)


def test_splice_case_and_whitespace(toks):
    enc, _ = make_encoder(toks)
    out = enc.splice("<dna>  acgtn </dna>")
    assert out["segments"][0]["raw"] == "ACGTN"


# ---------------- train encoding ----------------

def test_encode_train_labels_and_eos(toks):
    enc, cfg = make_encoder(toks, dna_rna_k_tokens=2, max_len=256)
    row = {"input": "q <dna>ACGT</dna>", "output": "yes", "task": "tf-m-x"}
    s = enc.encode_train(row)
    ids, labels, am = s["input_ids"], s["labels"], s["attention_mask"]
    assert ids.shape == (256,) and labels.shape == (256,) and am.shape == (256,)
    n_real = int(am.sum())
    assert ids[n_real - 1] == enc.eos_id
    # labels: prompt masked, answer + eos supervised
    sup = labels[labels != LABEL_IGNORE]
    expected = enc.tok.encode("yes") + [enc.eos_id]
    assert sup.tolist() == expected
    assert s["task_label"] == 19
    # segment packing
    assert s["dna_rna_pos"][0] >= 0 and (s["dna_rna_pos"][1:] == -1).all()
    assert (s["protein_pos"] == -1).all()


def test_encode_train_truncation_keeps_eos(toks):
    enc, cfg = make_encoder(toks, max_len=32)
    row = {"input": "x" * 200, "output": "y" * 50, "task": ""}
    s = enc.encode_train(row)
    assert s["input_ids"].shape == (32,)
    assert s["input_ids"][31] == enc.eos_id
    assert s["labels"][31] == enc.eos_id


def test_encode_pretrain_mode(toks):
    enc, cfg = make_encoder(toks, mode="pretrain", max_len=64)
    s = enc.encode_train({"input": "hello", "output": "ignored", "task": ""})
    am = s["input_ids"][s["attention_mask"] == 1]
    # pretrain supervises the whole stream
    real = s["labels"][s["attention_mask"] == 1]
    assert (real == am).all()
    assert real[-1] == enc.eos_id


# ---------------- test-mode encoding ----------------

def test_encode_test_left_pad_shifts_starts(toks):
    enc, cfg = make_encoder(toks, dna_rna_k_tokens=2, max_len=256)
    row = {"input": "q <dna>ACGT</dna>", "task": "t"}
    s = enc.encode_test(row)
    ids, am = s["input_ids"], s["attention_mask"]
    assert ids.shape == (256,)
    assert am[0] == 0 and am[-1] == 1  # left-padded
    start = int(s["dna_rna_pos"][0])
    sp = enc.special["dna"]
    assert ids[start] == sp["start"]
    assert ids[start + 1] == sp["pad"]


# ---------------- segment capacity / truncation policy ----------------

def test_segment_overflow_kept_as_text_and_warns(toks):
    enc, cfg = make_encoder(toks, dna_rna_k_tokens=2, max_dna_rna_segments=2,
                            max_len=512)
    text = " ".join(f"<dna>ACGTAC</dna>" for _ in range(5))
    with pytest.warns(RuntimeWarning, match="static slot budget"):
        out = enc.splice(text)
    assert len(out["segments"]) == 2  # capped at the slot budget
    ids = out["input_ids"]
    sp = enc.special["dna"]
    # exactly 2 placeholder blocks; overflow sequences present as plain text
    assert ids.count(sp["start"]) == 2 and ids.count(sp["pad"]) == 4
    tail = enc.tok.decode(ids[out["segments"][-1]["start"] + 4:])
    assert "ACGTAC" in tail  # 3rd..5th sequences kept as raw text
    # end-to-end: encode_train packs only the 2 active slots
    with pytest.warns(RuntimeWarning):
        s = enc.encode_train({"input": text, "output": "y", "task": ""})
    assert (s["dna_rna_pos"] >= 0).sum() == 2


def test_segment_overflow_strict_raises(toks):
    enc, _ = make_encoder(toks, max_dna_rna_segments=1, strict_segments=True)
    with pytest.raises(ValueError, match="static slot budget"):
        enc.splice("<dna>ACGT</dna> <dna>ACGT</dna>")


def test_encode_train_truncation_deactivates_straddled_segment(toks):
    # prompt short, placeholder block crosses max_len: the segment must be
    # deactivated or injection would overwrite the supervised EOS tail
    enc, cfg = make_encoder(toks, dna_rna_k_tokens=64, max_len=128)
    row = {"input": "q " * 30 + "<dna>ACGTACGTACGT</dna>",
           "output": "yes", "task": ""}
    with pytest.warns(RuntimeWarning, match="right-truncation"):
        s = enc.encode_train(row)
    assert (s["dna_rna_pos"] == -1).all()
    assert s["input_ids"][127] == enc.eos_id


def test_encode_test_left_truncates_overlong_prompt(toks):
    enc, cfg = make_encoder(toks, dna_rna_k_tokens=4, max_len=64)
    row = {"input": "x" * 100 + " <dna>ACGT</dna> " + "tail question",
           "task": "t"}
    s = enc.encode_test(row)
    assert s["input_ids"].shape == (64,)
    assert int(s["attention_mask"].sum()) == 64  # no padding, full window
    # segment survived (it sits near the tail) with shifted start
    start = int(s["dna_rna_pos"][0])
    assert start >= 0
    assert s["input_ids"][start] == enc.special["dna"]["start"]
    assert s["input_ids"][start + 1] == enc.special["dna"]["pad"]
    # the tail text is preserved
    dec = enc.tok.decode(s["input_ids"].tolist(), skip_special_tokens=True)
    assert "tail question" in dec


def test_encode_test_left_truncation_drops_cut_segment(toks):
    # segment sits in the cut-off head: dropped, and no partial placeholder
    # block remains in the stream
    enc, cfg = make_encoder(toks, dna_rna_k_tokens=8, max_len=64)
    row = {"input": "<dna>ACGTACGT</dna> " + "y" * 200, "task": "t"}
    with pytest.warns(RuntimeWarning, match="left-truncation"):
        s = enc.encode_test(row)
    assert (s["dna_rna_pos"] == -1).all()
    ids = s["input_ids"].tolist()
    sp = enc.special["dna"]
    assert sp["pad"] not in ids and sp["end"] not in ids


def test_encode_test_batch_stacks_after_truncation(toks):
    # regression: ragged prompts used to crash collate_test's np.stack
    text, dna, prot = toks
    cfg = DataConfig(max_len=64, dna_rna_k_tokens=4)
    df = pd.DataFrame([
        {"task": "t", "input": "short", "think": "", "output": "",
         "label": "", "kind": ""},
        {"task": "t", "input": "z" * 500, "think": "", "output": "",
         "label": "", "kind": ""},
    ])
    ds = OmicsDataset(df, text, dna, prot, cfg, mode="test")
    batches = list(iterate_batches(ds, 2, collate_fn=collate_test))
    assert batches[0]["input_ids"].shape == (2, 64)


# ---------------- task ids ----------------

def test_task_name_to_id():
    assert task_name_to_id("xx-antibody_antigen-yy") == 0
    assert task_name_to_id("tf-h-human") == 18
    assert task_name_to_id("nothing") == 100


# ---------------- dataset + collate ----------------

def _toy_df():
    return pd.DataFrame([
        {"task": "tf-m-a", "input": "is <dna>ACGTAC</dna> a TF site?",
         "output": "Yes", "think": "", "label": "Yes", "kind": "dna"},
        {"task": "Solubility-Solubility", "input":
         "sol of <protein>MKTAYIAKQR</protein>?", "output": "No",
         "think": "", "label": "No", "kind": "protein"},
        {"task": "rna_protein_interaction",
         "input": "<rna>ACGTACGT</rna> binds <protein>MKT</protein>?",
         "output": "Yes", "think": "", "label": "Yes", "kind": "rna-protein"},
        {"task": "pd-prom_300", "input": "promoter <dna>ACGTACGTACGT</dna>",
         "output": "No", "think": "", "label": "No", "kind": "dna"},
    ])


def test_dataset_and_collate_train(toks):
    text, dna, prot = toks
    cfg = DataConfig(max_len=128, dna_rna_k_tokens=8, protein_k_tokens=8,
                     max_dna_rna_segments=2, max_protein_segments=2)
    ds = OmicsDataset(_toy_df(), text, dna, prot, cfg)
    assert len(ds) == 4
    batch = collate_train([ds[i] for i in range(4)])
    assert batch["input_ids"].shape == (4, 128)
    assert batch["dna_rna_tokens"].shape == (4, 2, 8)
    assert batch["protein_tokens"].shape == (4, 2, 8)
    assert batch["task_label"].tolist() == [19, 15, 14, 11]
    # sample 2 has one rna + one protein segment
    assert batch["dna_rna_pos"][2, 0] >= 0
    assert batch["protein_pos"][2, 0] >= 0


def test_dataset_test_mode_and_iterate(toks):
    text, dna, prot = toks
    cfg = DataConfig(max_len=128, dna_rna_k_tokens=8, protein_k_tokens=8)
    ds = OmicsDataset(_toy_df(), text, dna, prot, cfg, mode="test")
    batch = collate_test([ds[0], ds[1]])
    assert batch["input_ids"].shape == (2, 128)
    assert batch["task"] == ["tf-m-a", "Solubility-Solubility"]

    ds_train = OmicsDataset(_toy_df(), text, dna, prot, cfg)
    batches = list(iterate_batches(ds_train, 2, shuffle=True, seed=1))
    assert len(batches) == 2
    assert batches[0]["input_ids"].shape == (2, 128)


def test_include_think_supervision(toks):
    enc, _ = make_encoder(toks, max_len=512, include_think=True)
    row = {"input": "q", "output": "yes", "think": "because X", "task": ""}
    s = enc.encode_train(row)
    sup = s["labels"][s["labels"] != LABEL_IGNORE]
    decoded = enc.tok.decode(sup[:-1])  # drop eos
    assert decoded == "<think>because X</think>\nyes"
    # default off: think ignored (reference behavior)
    enc2, _ = make_encoder(toks, max_len=512)
    s2 = enc2.encode_train(row)
    sup2 = s2["labels"][s2["labels"] != LABEL_IGNORE]
    assert enc2.tok.decode(sup2[:-1]) == "yes"
