"""Async input pipeline: prefetch ordering/exception propagation,
tokenize-once caching, and one-ahead device transfer ordering."""

import numpy as np
import pytest

from molly_tpu.data.collate import iterate_batches
from molly_tpu.data.pipeline import (CachingDataset, device_put_prefetch,
                                     input_pipeline, prefetch)


class CountingDataset:
    def __init__(self, n=10):
        self.n = n
        self.calls = {}

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        self.calls[i] = self.calls.get(i, 0) + 1
        return {"input_ids": np.full((4,), i, np.int32),
                "labels": np.full((4,), i, np.int32),
                "attention_mask": np.ones((4,), np.int32),
                "dna_rna_tokens": np.zeros((1, 2), np.int32),
                "dna_rna_pos": np.full((1,), -1, np.int32),
                "protein_tokens": np.zeros((1, 2), np.int32),
                "protein_pos": np.full((1,), -1, np.int32),
                "task_label": np.int32(0)}


def test_prefetch_preserves_order_and_content():
    items = list(range(57))
    assert list(prefetch(iter(items), depth=2)) == items


def test_prefetch_propagates_producer_exception():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetch_consumer_can_stop_early():
    def gen():
        for i in range(10_000):
            yield i

    it = prefetch(gen(), depth=2)
    assert [next(it) for _ in range(3)] == [0, 1, 2]
    it.close()  # must not hang on a full queue


def test_caching_dataset_tokenizes_once_across_epochs():
    ds = CountingDataset(8)
    cached = CachingDataset(ds)
    for epoch in range(3):
        for _ in iterate_batches(cached, 4, shuffle=True, epoch=epoch):
            pass
    assert all(v == 1 for v in ds.calls.values()), ds.calls
    # cached replay is the same object contents
    np.testing.assert_array_equal(cached[2]["input_ids"],
                                  np.full((4,), 2, np.int32))


def test_caching_dataset_max_items_bound():
    ds = CountingDataset(6)
    cached = CachingDataset(ds, max_items=2)
    for i in range(6):
        cached[i]
    for i in range(6):
        cached[i]
    assert ds.calls[0] == 1 and ds.calls[1] == 1  # cached
    assert ds.calls[5] == 2                       # recomputed past the cap


def test_device_put_prefetch_runs_one_transfer_ahead():
    events = []

    def put(x):
        events.append(("put", x))
        return x

    out = []
    for item in device_put_prefetch(iter([1, 2, 3]), put):
        events.append(("yield", item))
        out.append(item)
    assert out == [1, 2, 3]
    # batch i+1's put is issued BEFORE batch i is yielded
    assert events == [("put", 1), ("put", 2), ("yield", 1),
                      ("put", 3), ("yield", 2), ("yield", 3)]


def test_input_pipeline_matches_plain_iteration():
    ds = CountingDataset(12)
    plain = [b["input_ids"] for b in iterate_batches(
        ds, 4, shuffle=True, seed=3, epoch=1)]
    piped = [b["input_ids"] for b in input_pipeline(
        CachingDataset(CountingDataset(12)), 4, shuffle=True, seed=3,
        epoch=1)]
    assert len(plain) == len(piped)
    for a, b in zip(plain, piped):
        np.testing.assert_array_equal(a, b)
