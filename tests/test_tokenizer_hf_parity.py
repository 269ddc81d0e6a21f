"""Protein tokenizer parity vs HF EsmTokenizer built from the same vocab
(the exact tokenizer the reference loads for ESM-2,
/root/reference/src/train.py:86-88)."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from molly_tpu.data.tokenizers import ESM_VOCAB, ProteinTokenizer


@pytest.fixture(scope="module")
def hf_tok(tmp_path_factory):
    from transformers import EsmTokenizer

    p = tmp_path_factory.mktemp("esm") / "vocab.txt"
    p.write_text("\n".join(ESM_VOCAB))
    return EsmTokenizer(str(p))


@pytest.mark.parametrize("seq,k", [
    ("MKTAYIAK", 12),
    ("MKTAYIAK", 6),       # truncation
    ("", 4),
    ("ACDEFGHIKLMNPQRSTVWYBXZOU", 30),
    ("mktayiak", 12),      # lowercase -> unk per HF (case-sensitive vocab)
])
def test_protein_matches_hf(hf_tok, seq, k):
    ours = ProteinTokenizer()
    ref = hf_tok(seq.upper() if seq.islower() else seq,
                 padding="max_length", max_length=k, truncation=True)
    got = ours.encode(seq, max_length=k)
    np.testing.assert_array_equal(got, ref["input_ids"], err_msg=seq)


def test_attention_mask_convention(hf_tok):
    """The fusion encoder mask is (ids != 1); HF's attention_mask must
    agree (omics_one.py:70 relies on this)."""
    ours = ProteinTokenizer()
    ref = hf_tok("MKT", padding="max_length", max_length=8, truncation=True)
    got = ours.encode("MKT", max_length=8)
    np.testing.assert_array_equal((got != 1).astype(int),
                                  ref["attention_mask"])
