"""Native C++ tokenizer parity vs the pure-Python implementations,
including randomized fuzzing."""

import numpy as np
import pytest

from molly_tpu import native
from molly_tpu.data.native_tokenizers import (
    NativeNucleotideTokenizer,
    NativeProteinTokenizer,
)
from molly_tpu.data.tokenizers import NucleotideTokenizer, ProteinTokenizer

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native build unavailable: {native.build_error()}")


def test_nt_parity_basic():
    py, nat = NucleotideTokenizer(), NativeNucleotideTokenizer()
    for seq in ("ACGTACGTACGT", "ACGTACG", "N", "", "acgtacGTAC",
                "ACGNACGTACGTA", "ACGUACGU"):
        np.testing.assert_array_equal(
            nat.encode(seq, 16), py.encode(seq, 16), err_msg=seq)


def test_protein_parity_basic():
    py, nat = ProteinTokenizer(), NativeProteinTokenizer()
    for seq in ("MKTAYIAK", "", "M", "mktayiak", "MKTX*?",
                "ACDEFGHIKLMNPQRSTVWYBXZOU."):
        np.testing.assert_array_equal(
            nat.encode(seq, 12), py.encode(seq, 12), err_msg=seq)


def test_fuzz_parity():
    rng = np.random.default_rng(0)
    py_nt, nat_nt = NucleotideTokenizer(), NativeNucleotideTokenizer()
    py_p, nat_p = ProteinTokenizer(), NativeProteinTokenizer()
    nt_alpha = list("ACGTNacgtnU")
    aa_alpha = list("ACDEFGHIKLMNPQRSTVWYBXZOUmktl")
    for _ in range(200):
        n = int(rng.integers(0, 40))
        k = int(rng.integers(2, 20))
        s1 = "".join(rng.choice(nt_alpha, n))
        s2 = "".join(rng.choice(aa_alpha, n))
        np.testing.assert_array_equal(nat_nt.encode(s1, k),
                                      py_nt.encode(s1, k), err_msg=s1)
        np.testing.assert_array_equal(nat_p.encode(s2, k),
                                      py_p.encode(s2, k), err_msg=s2)


def test_batch_api():
    nat = NativeNucleotideTokenizer()
    py = NucleotideTokenizer()
    seqs = ["ACGTAC", "ACGTACGTACGTACGT", "", "NNN"]
    batch = nat.encode_batch(seqs, 8)
    assert batch.shape == (4, 8)
    for i, s in enumerate(seqs):
        np.testing.assert_array_equal(batch[i], py.encode(s, 8))
