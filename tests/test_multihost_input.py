"""Multi-host input pipeline: per-host dataset shards are disjoint and
exhaustive, per-host batch streams reassemble into the global batch, and
make_global_batch produces a correctly-sharded global array (SURVEY.md §5.8
— the reference leaned on torch DistributedSampler; GSPMD needs each host
to feed its local rows into jax.make_array_from_process_local_data)."""

import numpy as np
import pandas as pd
import pytest

import jax

from molly_tpu.data import (
    ByteTextTokenizer,
    DataConfig,
    NucleotideTokenizer,
    OmicsDataset,
    ProteinTokenizer,
    collate_train,
    iterate_batches,
)
from molly_tpu.parallel import (
    host_shard_range,
    make_global_batch,
    make_mesh,
    shard_batch,
)


def _df(n):
    return pd.DataFrame([
        {"task": f"row{i}", "input": f"question {i}", "think": "",
         "output": f"answer {i}", "label": "", "kind": ""}
        for i in range(n)
    ])


@pytest.fixture(scope="module")
def toks():
    return ByteTextTokenizer(), NucleotideTokenizer(), ProteinTokenizer()


def test_host_shards_disjoint_and_exhaustive(toks):
    text, dna, prot = toks
    cfg = DataConfig(max_len=256)
    n, pc = 21, 4  # uneven: last host takes the remainder
    seen = []
    sizes = []
    for pi in range(pc):
        ds = OmicsDataset(_df(n), text, dna, prot, cfg, shuffle=True,
                          seed=7, shard_index=pi, shard_count=pc)
        rows = [ds.df.loc[i, "task"] for i in range(len(ds))]
        sizes.append(len(rows))
        seen.extend(rows)
    assert sorted(sizes) == [5, 5, 5, 6]
    assert len(seen) == len(set(seen)) == n  # disjoint + exhaustive
    # same seed => one consistent global permutation across "hosts"
    ds_full = OmicsDataset(_df(n), text, dna, prot, cfg, shuffle=True,
                           seed=7)
    assert seen == [ds_full.df.loc[i, "task"] for i in range(n)]


def test_per_host_batches_reassemble_global(toks):
    """Concatenating each host's batch rows (host-major, the order
    make_array_from_process_local_data uses) must equal the batch an
    equivalent single-host run over the host-sliced dataset would build."""
    text, dna, prot = toks
    cfg = DataConfig(max_len=256)
    n, pc, local_bs = 16, 2, 4
    streams = []
    for pi in range(pc):
        ds = OmicsDataset(_df(n), text, dna, prot, cfg, shuffle=True,
                          seed=3, shard_index=pi, shard_count=pc)
        streams.append(list(iterate_batches(ds, local_bs, shuffle=False)))
    assert len(streams[0]) == len(streams[1]) == n // pc // local_bs
    for b0, b1 in zip(*streams):
        glob = {k: np.concatenate([b0[k], b1[k]]) for k in b0}
        assert glob["input_ids"].shape[0] == pc * local_bs
        # rows from different hosts are genuinely different samples
        assert not np.array_equal(glob["input_ids"][0],
                                  glob["input_ids"][local_bs])


def test_host_shard_range_math():
    assert host_shard_range(10, 0, 4) == (0, 2)
    assert host_shard_range(10, 3, 4) == (6, 10)  # last host absorbs rest
    spans = [host_shard_range(10, i, 4) for i in range(4)]
    covered = [x for a, b in spans for x in range(a, b)]
    assert covered == list(range(10))


def test_make_global_batch_single_process(toks):
    """Single-process: make_global_batch == shard_batch (values + sharding);
    this is the exact call the train CLI now makes every step."""
    text, dna, prot = toks
    cfg = DataConfig(max_len=128, dna_rna_k_tokens=4, protein_k_tokens=4)
    ds = OmicsDataset(_df(8), text, dna, prot, cfg)
    batch = collate_train([ds[i] for i in range(8)])
    mesh = make_mesh(data=2, fsdp=2, tensor=2)
    with jax.sharding.set_mesh(mesh):
        glob = make_global_batch(batch, mesh)
        ref = shard_batch(batch, mesh)
    for k in batch:
        assert glob[k].shape == batch[k].shape
        np.testing.assert_array_equal(np.asarray(glob[k]), batch[k])
        assert glob[k].sharding == ref[k].sharding
