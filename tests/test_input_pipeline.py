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


def _gc_parquet(path, n=40, row_group_size=8):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [{"task": "pd-prom_300_all",
             "input": f"Is <dna>{'ACGT' * 4}</dna> sample {i}?",
             "output": "Yes" if i % 2 else "No", "think": "",
             "label": "positive" if i % 2 else "negative",
             "kind": "dna"} for i in range(n)]
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)), path,
                   row_group_size=row_group_size)
    return rows


def _stream_ds(path, **kw):
    from molly_tpu.data import (DataConfig, StreamingOmicsDataset,
                                default_modality_tokenizers,
                                load_text_tokenizer)
    dna, prot = default_modality_tokenizers()
    return StreamingOmicsDataset(
        str(path), load_text_tokenizer(None), dna, prot,
        DataConfig(max_len=256, dna_rna_k_tokens=4, protein_k_tokens=4),
        **kw)


def test_streaming_dataset_covers_all_rows_and_matches_mapstyle(tmp_path):
    """One streaming epoch yields exactly the map-style dataset's samples
    (as a multiset over input_ids), across row-group boundaries."""
    from molly_tpu.data import (DataConfig, OmicsDataset,
                                default_modality_tokenizers,
                                load_text_tokenizer)

    p = tmp_path / "d.parquet"
    _gc_parquet(p, n=40, row_group_size=8)
    ds = _stream_ds(p, shuffle_buffer=16)
    assert len(ds) == 40
    got = sorted(tuple(s["input_ids"].tolist())
                 for s in ds.iter_epoch(0))
    dna, prot = default_modality_tokenizers()
    ref_ds = OmicsDataset(str(p), load_text_tokenizer(None), dna, prot,
                          DataConfig(max_len=256, dna_rna_k_tokens=4,
                                     protein_k_tokens=4))
    ref = sorted(tuple(ref_ds[i]["input_ids"].tolist())
                 for i in range(len(ref_ds)))
    assert got == ref


def test_streaming_dataset_shards_partition(tmp_path):
    """Two host shards cover disjoint row groups whose union is the file;
    epochs reshuffle but keep the multiset."""
    p = tmp_path / "d.parquet"
    _gc_parquet(p, n=40, row_group_size=8)  # 5 row groups
    a = _stream_ds(p, shard_index=0, shard_count=2, shuffle_buffer=4)
    b = _stream_ds(p, shard_index=1, shard_count=2, shuffle_buffer=4)
    assert len(a) + len(b) == 40
    sa = {tuple(s["input_ids"].tolist()) for s in a.iter_epoch(0)}
    sb = {tuple(s["input_ids"].tolist()) for s in b.iter_epoch(0)}
    assert not (sa & sb)
    # epoch 1 yields the same multiset in a different order
    e0 = [tuple(s["input_ids"].tolist()) for s in a.iter_epoch(0)]
    e1 = [tuple(s["input_ids"].tolist()) for s in a.iter_epoch(1)]
    assert sorted(e0) == sorted(e1) and e0 != e1


def test_streaming_through_input_pipeline(tmp_path):
    """input_pipeline consumes a streaming dataset (iterate_stream_batches
    under the prefetch thread) and yields full static-shape batches."""
    p = tmp_path / "d.parquet"
    _gc_parquet(p, n=40, row_group_size=8)
    ds = _stream_ds(p, shuffle_buffer=8)
    batches = list(input_pipeline(ds, 8, epoch=0))
    assert len(batches) == 5
    for b in batches:
        assert b["input_ids"].shape[0] == 8
        assert b["labels"].shape == b["input_ids"].shape
