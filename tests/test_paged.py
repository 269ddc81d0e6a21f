"""Paged-KV serving engine tests: op-level parity of the paged-attention
reference, greedy parity with the dense-ring engine (same scheduler, page
pool underneath), page growth across boundaries, pool exhaustion ->
preemption-and-continuation, and allocator hygiene (all pages return)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from molly_tpu.inference.engine import GenerationConfig
from molly_tpu.inference.paged import PagedServingEngine, _pack_batch
from molly_tpu.inference.server import Request, ServingEngine
from molly_tpu.models import fusion, tiny_esm, tiny_qwen3
from molly_tpu.models.fusion import FusionConfig


@pytest.fixture(scope="module")
def setup():
    cfg = FusionConfig(
        text=tiny_qwen3(vocab_size=64, hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, head_dim=8),
        dna_rna=tiny_esm(vocab_size=16),
        protein=tiny_esm(vocab_size=20),
        dna_rna_k_tokens=4, protein_k_tokens=4)
    params = fusion.init_params(cfg, jax.random.key(0))
    return cfg, params


def _text_request(uid, S, seed, vocab=64):
    rng = np.random.default_rng(seed)
    return Request(uid=uid, batch={
        "input_ids": rng.integers(1, vocab, (1, S)).astype(np.int32),
        "attention_mask": np.ones((1, S), np.int32),
    })


def _dense_ref(params, cfg, gen, reqs, **kw):
    eng = ServingEngine(params, cfg, gen, n_slots=max(2, len(reqs)),
                        max_len=64, prefill_buckets=(16,), **kw)
    return eng.run([Request(r.uid, dict(r.batch),
                            max_new_tokens=r.max_new_tokens) for r in reqs])


def test_paged_attention_op_matches_direct():
    """XLA reference of the paged op == direct softmax attention over the
    gathered sequence, including GQA head grouping and length masking."""
    from molly_tpu.ops.paged_attention import paged_attention
    rng = np.random.default_rng(0)
    B, Nq, Nkv, Dh, P, NP, PPS = 3, 4, 2, 16, 4, 10, 3
    q = jnp.asarray(rng.normal(size=(B, Nq, Dh)).astype(np.float32))
    kp = jnp.asarray(rng.normal(size=(Nkv, NP, P, Dh)).astype(np.float32))
    vp = jnp.asarray(rng.normal(size=(Nkv, NP, P, Dh)).astype(np.float32))
    table = jnp.asarray(rng.permutation(NP - 1)[:B * PPS].reshape(B, PPS))
    lengths = jnp.asarray([5, 12, 1], jnp.int32)
    out = paged_attention(q, kp, vp, lengths, table, impl="xla")

    for b in range(B):
        seq_k = np.concatenate([np.asarray(kp[:, table[b, c]])
                                for c in range(PPS)], axis=1)  # [Nkv,S,Dh]
        seq_v = np.concatenate([np.asarray(vp[:, table[b, c]])
                                for c in range(PPS)], axis=1)
        n = int(lengths[b])
        for h in range(Nq):
            kv_h = h // (Nq // Nkv)
            logits = (np.asarray(q[b, h]) @ seq_k[kv_h, :n].T) * Dh**-0.5
            w = np.exp(logits - logits.max())
            w = w / w.sum()
            ref = w @ seq_v[kv_h, :n]
            np.testing.assert_allclose(np.asarray(out[b, h]), ref,
                                       rtol=2e-5, atol=2e-5)


def test_paged_attention_int8_pages_close_to_f32():
    """int8 pages + per-row scales through the XLA reference track the f32
    pool within quantization tolerance (kernel QuantizedTensor convention:
    dequant = w * scale / 127.5)."""
    from molly_tpu.models.qwen3 import quantize_page_rows
    from molly_tpu.ops.paged_attention import paged_attention
    rng = np.random.default_rng(1)
    B, Nq, Nkv, Dh, P, NP, PPS = 3, 4, 2, 16, 4, 10, 3
    q = jnp.asarray(rng.normal(size=(B, Nq, Dh)).astype(np.float32))
    kp = jnp.asarray(rng.normal(size=(Nkv, NP, P, Dh)).astype(np.float32))
    vp = jnp.asarray(rng.normal(size=(Nkv, NP, P, Dh)).astype(np.float32))
    table = jnp.asarray(rng.permutation(NP - 1)[:B * PPS].reshape(B, PPS))
    lengths = jnp.asarray([5, 12, 1], jnp.int32)
    kq, ksc = quantize_page_rows(kp)
    vq, vsc = quantize_page_rows(vp)
    assert kq.dtype == jnp.int8 and ksc.shape == (Nkv, NP, P, 1)
    out8 = paged_attention(q, kq, vq, lengths, table, impl="xla",
                           k_scales=ksc, v_scales=vsc)
    ref = paged_attention(q, kp, vp, lengths, table, impl="xla")
    np.testing.assert_allclose(np.asarray(out8), np.asarray(ref),
                               rtol=0.06, atol=0.06)


def test_paged_engine_int8_kv(setup):
    """kv_quant="int8": pools are int8 + scale pages; greedy output matches
    the bf16-paged engine on a tiny model (prefill first tokens are exact —
    sampled pre-pool; decode tokens tolerate rare argmax flips)."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=-1,
                           pad_token_id=0)
    reqs = [_text_request(i, s, seed=10 + i) for i, s in
            enumerate([5, 12, 7])]
    ref = PagedServingEngine(params, cfg, gen, n_slots=3, page_size=4,
                             prefill_buckets=(8, 16)).run(
        [Request(r.uid, dict(r.batch)) for r in reqs])
    eng = PagedServingEngine(params, cfg, gen, n_slots=3, page_size=4,
                             prefill_buckets=(8, 16), kv_quant="int8")
    assert eng.hot["k_pages"].dtype == jnp.int8
    assert eng.hot["k_scales"].dtype == jnp.float32
    got = eng.run(list(reqs))
    assert set(got) == set(ref)
    flips = 0
    for uid in ref:
        assert len(got[uid]) == len(ref[uid])
        assert got[uid][0] == ref[uid][0]  # prefill token: pre-pool, exact
        flips += int(np.sum(np.asarray(got[uid]) != np.asarray(ref[uid])))
    assert flips <= 3, flips  # quantization may flip isolated argmaxes
    # allocator hygiene unchanged under int8
    assert len(eng._free_pages) == eng.n_pages


def test_paged_greedy_parity_mixed_lengths(setup):
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    reqs = [_text_request(i, s, seed=i) for i, s in
            enumerate([5, 12, 16, 7])]
    ref = _dense_ref(params, cfg, gen, reqs)
    eng = PagedServingEngine(params, cfg, gen, n_slots=4, page_size=4,
                             prefill_buckets=(8, 16))
    got = eng.run(list(reqs))
    assert set(got) == {0, 1, 2, 3}
    for uid in ref:
        np.testing.assert_array_equal(got[uid], ref[uid])
    # allocator hygiene: every page back on the free list
    assert len(eng._free_pages) == eng.n_pages
    assert all(not p for p in eng._slot_pages)


def test_paged_left_padded_input_packs(setup):
    """Left-padded prompts (the dataset's test-mode layout) are packed at
    admission; outputs match the dense engine on the same prompts."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=5, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    base = _text_request(0, 9, seed=33)
    ids = np.pad(base.batch["input_ids"], ((0, 0), (5, 0)))
    mask = np.pad(base.batch["attention_mask"], ((0, 0), (5, 0)))
    padded = Request(uid=0, batch={"input_ids": ids,
                                   "attention_mask": mask})
    ref = _dense_ref(params, cfg, gen, [base])
    got = PagedServingEngine(params, cfg, gen, n_slots=2, page_size=4,
                             prefill_buckets=(16,)).run([padded])
    np.testing.assert_array_equal(got[0], ref[0])


def test_paged_fusion_prompt_parity(setup):
    """Omics-injected prompts through the paged engine: position keys
    shift with packing; outputs match the dense engine."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=5, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    rng = np.random.default_rng(3)
    S = 14
    batch = {
        "input_ids": rng.integers(1, 64, (1, S)).astype(np.int32),
        "attention_mask": np.ones((1, S), np.int32),
        "dna_rna_tokens": rng.integers(2, 16, (1, 1, 4)).astype(np.int32),
        "dna_rna_pos": np.asarray([[2]], np.int32),
        "protein_tokens": np.full((1, 1, 4), 1, np.int32),
        "protein_pos": np.asarray([[-1]], np.int32),
    }
    req = Request(uid="omics", batch=batch)
    ref = _dense_ref(params, cfg, gen, [req])
    got = PagedServingEngine(params, cfg, gen, n_slots=2, page_size=4,
                             prefill_buckets=(16,)).run(
        [Request(uid="omics", batch=dict(batch))])
    np.testing.assert_array_equal(got["omics"], ref["omics"])


def test_paged_growth_across_pages(setup):
    """Generations crossing several page boundaries (page_size 4, 14 new
    tokens) with chunked decode: chains grow mid-flight, outputs match."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=14, do_sample=False,
                           repetition_penalty=1.05, eos_token_id=-1,
                           pad_token_id=0)
    reqs = [_text_request(i, 6 + 3 * i, seed=90 + i) for i in range(3)]
    ref = _dense_ref(params, cfg, gen, reqs)
    eng = PagedServingEngine(params, cfg, gen, n_slots=3, page_size=4,
                             prefill_buckets=(16,), decode_chunk=3)
    got = eng.run(list(reqs))
    for uid in ref:
        np.testing.assert_array_equal(got[uid], ref[uid])
    assert len(eng._free_pages) == eng.n_pages


def test_paged_slot_reuse_and_caps(setup):
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=-1,
                           pad_token_id=0)
    reqs = [Request(uid=f"r{i}",
                    batch=_text_request(0, 6 + i, seed=10 + i).batch,
                    max_new_tokens=3 + (i % 4))
            for i in range(7)]
    ref = _dense_ref(params, cfg, gen, reqs)
    eng = PagedServingEngine(params, cfg, gen, n_slots=2, page_size=4,
                             prefill_buckets=(16,))
    got = eng.run([Request(r.uid, dict(r.batch),
                           max_new_tokens=r.max_new_tokens) for r in reqs])
    assert len(got) == 7
    for i in range(7):
        assert len(got[f"r{i}"]) == 3 + (i % 4)
        np.testing.assert_array_equal(got[f"r{i}"], ref[f"r{i}"])


def test_paged_preemption_oversubscribed_pool(setup):
    """A pool too small for both long-cap requests at once: the younger
    one is preempted (partial stashed, pages freed), the older finishes,
    the continuation re-prefills — greedy outputs still match the dense
    engine, and the preemption counter proves the path actually ran."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=10, do_sample=False,
                           repetition_penalty=1.05, eos_token_id=-1,
                           pad_token_id=0)
    reqs = [_text_request(i, 6, seed=130 + i) for i in range(2)]
    ref = _dense_ref(params, cfg, gen, reqs)
    # each request needs ceil((6 + 10) / 4) = 4 pages; 6 < 8 forces a
    # preemption once both slots try to grow
    eng = PagedServingEngine(params, cfg, gen, n_slots=2, page_size=4,
                             n_pages=6, prefill_buckets=(16,),
                             decode_chunk=2)
    got = eng.run(list(reqs))
    assert eng.stats["preemptions"] >= 1
    for uid in ref:
        np.testing.assert_array_equal(got[uid], ref[uid])
    assert len(eng._free_pages) == eng.n_pages


def test_paged_streaming_monotone_under_preemption(setup):
    """stream_cb prefixes stay monotone even across a preemption (the
    stashed partial is re-prefixed on delivery)."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=10, do_sample=False,
                           repetition_penalty=1.05, eos_token_id=-1,
                           pad_token_id=0)
    streamed = {}

    def cb(uid, toks):
        prev = streamed.setdefault(uid, [])
        if prev:
            np.testing.assert_array_equal(prev[-1], toks[:len(prev[-1])])
        prev.append(np.array(toks))

    reqs = [_text_request(i, 6, seed=130 + i) for i in range(2)]
    eng = PagedServingEngine(params, cfg, gen, n_slots=2, page_size=4,
                             n_pages=6, prefill_buckets=(16,),
                             decode_chunk=2, stream_cb=cb)
    results = eng.run(list(reqs))
    assert eng.stats["preemptions"] >= 1
    for uid, chunks in streamed.items():
        np.testing.assert_array_equal(chunks[-1], results[uid])


def test_paged_stall_resumes_when_nothing_preemptible(setup):
    """Pool dry + every continuation bigger than the largest prefill
    bucket (prompt == bucket, so any stash overflows it) -> nothing is
    preemptible. The grower must STALL (freeze for the round, keep its
    pages) instead of raising, then resume when the other slot finishes
    and its pages recycle — outputs still match the dense engine."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=24, do_sample=False,
                           repetition_penalty=1.05, eos_token_id=-1,
                           pad_token_id=0)
    fast = _text_request("fast", 16, seed=7)
    slow = _text_request("slow", 16, seed=8)
    fast.max_new_tokens, slow.max_new_tokens = 8, 24

    def mk_reqs():
        return [Request(r.uid, dict(r.batch),
                        max_new_tokens=r.max_new_tokens)
                for r in (fast, slow)]

    ref = ServingEngine(params, cfg, gen, n_slots=2, max_len=64,
                        prefill_buckets=(16,)).run(mk_reqs())
    # page 4: prompt = 4 pages; fast maxtok 24 = 6 pages exactly; slow
    # maxtok 40 = 10 pages. Pool 11, chunk 4: admission takes 5+5, fast
    # grows to 6 (pool dry), slow's growth finds fast mid-flight with
    # stash 4 (continuation 20 > bucket 16, unpreemptible) -> stall;
    # fast finishes next chunk, reclaim frees 6, slow resumes.
    # continuation_bucket=False: the auto bucket would make fast
    # preemptible instead — this test pins the stall fallback.
    eng = PagedServingEngine(params, cfg, gen, n_slots=2, page_size=4,
                             n_pages=11, prefill_buckets=(16,),
                             decode_chunk=4, continuation_bucket=False)
    got = eng.run(mk_reqs())
    assert eng.stats["stalls"] >= 1, eng.stats
    assert eng.stats["preemptions"] == 0, eng.stats
    for uid in ref:
        np.testing.assert_array_equal(got[uid], ref[uid])
    assert len(eng._free_pages) == eng.n_pages
    assert not eng._stalled


def test_paged_continuation_bucket_unwedges(setup):
    """The same pool that WOULD wedge bucket-bound (both slots need a 6th
    page, neither fits the 16-token bucket as a continuation) completes
    via the auto continuation bucket: one slot is preempted, re-prefills
    prompt+stash through the big bucket, and outputs stay exact."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=24, do_sample=False,
                           repetition_penalty=1.05, eos_token_id=-1,
                           pad_token_id=0)

    def mk_reqs():
        return [_text_request(i, 16, seed=60 + i) for i in range(2)]

    ref = ServingEngine(params, cfg, gen, n_slots=2, max_len=64,
                        prefill_buckets=(16,)).run(mk_reqs())
    eng = PagedServingEngine(params, cfg, gen, n_slots=2, page_size=4,
                             n_pages=10, prefill_buckets=(16,),
                             decode_chunk=4)
    assert eng._cont_bucket > 16 and eng._cont_bucket in eng.buckets
    got = eng.run(mk_reqs())
    assert eng.stats["preemptions"] >= 1, eng.stats
    for uid in ref:
        np.testing.assert_array_equal(got[uid], ref[uid])
    assert len(eng._free_pages) == eng.n_pages


def test_paged_wedged_pool_raises(setup):
    """A pool that can never make progress (every in-flight slot stalled,
    nothing preemptible, nothing admittable) must raise, not spin."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=24, do_sample=False,
                           repetition_penalty=1.05, eos_token_id=-1,
                           pad_token_id=0)
    reqs = [_text_request(i, 16, seed=60 + i) for i in range(2)]
    # 10 pages: both slots admit at 5 pages (20 tokens), both need a 6th
    # to keep decoding, neither can finish (caps 24) nor be preempted
    # (continuation 20 > bucket 16, auto bucket disabled)
    eng = PagedServingEngine(params, cfg, gen, n_slots=2, page_size=4,
                             n_pages=10, prefill_buckets=(16,),
                             decode_chunk=4, continuation_bucket=False)
    with pytest.raises(RuntimeError, match="wedged"):
        eng.run(list(reqs))


def test_paged_eos_and_cancel_free_pages(setup):
    """EOS termination and cancellation both recycle pages."""
    cfg, params = setup
    gen0 = GenerationConfig(max_new_tokens=6, do_sample=False,
                            repetition_penalty=1.0, eos_token_id=-1,
                            pad_token_id=0)
    req = _text_request("a", 10, seed=42)
    eng0 = PagedServingEngine(params, cfg, gen0, n_slots=1, page_size=4,
                              prefill_buckets=(16,))
    first = eng0.run([req])["a"]
    eos = int(first[2])

    gen1 = GenerationConfig(max_new_tokens=6, do_sample=False,
                            repetition_penalty=1.0, eos_token_id=eos,
                            pad_token_id=0)
    eng = PagedServingEngine(params, cfg, gen1, n_slots=1, page_size=4,
                             prefill_buckets=(16,))
    results = eng.run([Request(uid="a", batch=req.batch),
                       Request(uid="b", batch=req.batch)])
    stop = int(np.argmax(first == eos)) + 1
    np.testing.assert_array_equal(results["a"], first[:stop])
    np.testing.assert_array_equal(results["b"], first[:stop])
    assert len(eng._free_pages) == eng.n_pages

    # cancel an in-flight request: pages come back too
    canceled = []

    def cb(uid, toks):
        if uid == "c" and len(toks) >= 2 and not canceled:
            canceled.append(uid)
            eng2.cancel("c")

    eng2 = PagedServingEngine(params, cfg, gen0, n_slots=1, page_size=4,
                              prefill_buckets=(16,), stream_cb=cb)
    out = eng2.run([Request(uid="c", batch=req.batch)])
    assert 2 <= len(out["c"]) <= 6
    assert len(eng2._free_pages) == eng2.n_pages


def test_paged_per_request_sampling(setup):
    """Greedy per-request overrides inside a sampling-default paged pool
    match the dense engine's greedy rows."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=6, do_sample=True,
                           temperature=0.8, top_k=8, top_p=0.95,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    greedy = GenerationConfig(max_new_tokens=6, do_sample=False,
                              repetition_penalty=1.1, eos_token_id=-1,
                              pad_token_id=0)
    reqs = [_text_request(i, 6 + i, seed=40 + i) for i in range(3)]
    reqs[0].sampling = {"temperature": 0}
    reqs[1].sampling = {"greedy": True}
    eng = PagedServingEngine(params, cfg, gen, n_slots=3, page_size=4,
                             prefill_buckets=(16,))
    results = eng.run(list(reqs))
    ref = _dense_ref(params, cfg, greedy, reqs[:2])
    for i in (0, 1):
        np.testing.assert_array_equal(results[i], ref[i])
    assert len(results[2]) == 6


def test_inference_cli_serve_paged_matches_static(tmp_path):
    """--serve --serve-paged produces the same greedy JSONL outputs as
    static batching through the real CLI (tiny model, tiny parquet)."""
    import json
    from test_train_cli import _toy_parquet
    from molly_tpu.inference.cli import main as infer_main

    data = str(tmp_path / "d.parquet")
    _toy_parquet(data, 6)
    common = [
        "--input-file", data, "--tiny", "--greedy",
        "--max-length", "256", "--max-new-tokens", "6",
        "--dna-rna-k-tokens", "4", "--protein-k-tokens", "4",
        "--batch-size", "3",
    ]
    static_out = str(tmp_path / "static.jsonl")
    infer_main(common + ["--output-file", static_out])
    paged_out = str(tmp_path / "paged.jsonl")
    infer_main(common + ["--output-file", paged_out, "--serve",
                         "--serve-paged", "--page-size", "32",
                         "--serve-chunk", "2"])
    paged8_out = str(tmp_path / "paged8.jsonl")
    infer_main(common + ["--output-file", paged8_out, "--serve",
                         "--serve-paged", "--serve-kv-int8",
                         "--page-size", "32", "--serve-chunk", "2"])

    static = [json.loads(l) for l in open(static_out)]
    paged = [json.loads(l) for l in open(paged_out)]
    paged8 = [json.loads(l) for l in open(paged8_out)]
    assert len(static) == len(paged) == len(paged8) == 6
    s_by_input = {r["input"]: r for r in static}
    for r in paged:
        ref = s_by_input[r["input"]]
        assert r["decoded_output"] == ref["decoded_output"]
        assert r["task"] == ref["task"]
    # int8 pages through the CLI: same schema; greedy tokens may flip on
    # a random tiny model under quantization — only shape-check here (the
    # close-tracking check is test_paged_engine_int8_kv)
    for r in paged8:
        assert r["input"] in s_by_input


def test_pack_batch():
    b = {"input_ids": np.asarray([[0, 0, 5, 6, 7, 0]], np.int32),
         "attention_mask": np.asarray([[0, 0, 1, 1, 1, 0]], np.int32),
         "dna_rna_pos": np.asarray([[3, -1]], np.int32)}
    out = _pack_batch(b)
    np.testing.assert_array_equal(out["input_ids"], [[5, 6, 7]])
    np.testing.assert_array_equal(out["attention_mask"], [[1, 1, 1]])
    np.testing.assert_array_equal(out["dna_rna_pos"], [[1, -1]])
    with pytest.raises(ValueError):
        _pack_batch({"input_ids": np.asarray([[1, 2, 3]], np.int32),
                     "attention_mask": np.asarray([[1, 0, 1]], np.int32)})


def test_paged_shared_prefix_parity_and_page_sharing(setup):
    """Shared-prefix pages: greedy outputs match the no-prefix paged
    engine on the same prompts, the prefix KV is stored ONCE (allocator
    pins n_shared pages; peak page use drops vs no sharing), and a
    non-page-aligned prefix shares only its full pages (the remainder
    rides each suffix)."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=-1,
                           pad_token_id=0)
    rng = np.random.default_rng(5)
    prefix = rng.integers(1, 64, 10).astype(np.int32)  # 2 pages + 2 toks
    reqs = []
    for i, s in enumerate([3, 7, 5]):
        suf = rng.integers(1, 64, (1, s)).astype(np.int32)
        ids = np.concatenate([prefix[None], suf], axis=1)
        reqs.append(Request(uid=i, batch={
            "input_ids": ids,
            "attention_mask": np.ones_like(ids, np.int32)}))
    plain = PagedServingEngine(params, cfg, gen, n_slots=3, page_size=4,
                               prefill_buckets=(20,))
    ref = plain.run([Request(r.uid, dict(r.batch)) for r in reqs])
    eng = PagedServingEngine(params, cfg, gen, n_slots=3, page_size=4,
                             prefill_buckets=(16,), prefix_ids=prefix)
    assert eng.s_pre == 8 and eng._n_shared == 2  # page-aligned share
    got = eng.run(list(reqs))
    for uid in ref:
        np.testing.assert_array_equal(got[uid], ref[uid])
    # shared pages stay pinned; every per-slot page returned
    assert len(eng._free_pages) == eng.n_pages - eng._n_shared
    # the prefix was held once, not once per slot
    assert eng.stats["pages_peak"] < plain.stats["pages_peak"]


def test_paged_shared_prefix_int8_pages(setup):
    """Prefix sharing composes with int8 KV pages: identical quantized
    values land in the shared pages, so greedy outputs match the
    no-prefix int8 engine exactly on a tiny f32 model."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=-1,
                           pad_token_id=0)
    rng = np.random.default_rng(9)
    prefix = rng.integers(1, 64, 8).astype(np.int32)
    reqs = []
    for i, s in enumerate([4, 6]):
        suf = rng.integers(1, 64, (1, s)).astype(np.int32)
        ids = np.concatenate([prefix[None], suf], axis=1)
        reqs.append(Request(uid=i, batch={
            "input_ids": ids,
            "attention_mask": np.ones_like(ids, np.int32)}))
    ref = PagedServingEngine(params, cfg, gen, n_slots=2, page_size=4,
                             prefill_buckets=(16,), kv_quant="int8").run(
        [Request(r.uid, dict(r.batch)) for r in reqs])
    eng = PagedServingEngine(params, cfg, gen, n_slots=2, page_size=4,
                             prefill_buckets=(8,), kv_quant="int8",
                             prefix_ids=prefix)
    got = eng.run(list(reqs))
    flips = 0
    for uid in ref:
        assert len(got[uid]) == len(ref[uid])
        flips += int(np.sum(np.asarray(got[uid]) != np.asarray(ref[uid])))
    assert flips <= 2, flips  # separate-graph prefix KV may flip an argmax


def test_paged_shared_prefix_preemption(setup):
    """Preemption + continuation under prefix sharing: the continuation
    re-prefills (prefix re-stripped), outputs still match the dense
    engine with the same prefix cached."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=10, do_sample=False,
                           repetition_penalty=1.05, eos_token_id=-1,
                           pad_token_id=0)
    rng = np.random.default_rng(13)
    prefix = rng.integers(1, 64, 8).astype(np.int32)
    reqs = []
    for i in range(2):
        suf = rng.integers(1, 64, (1, 6)).astype(np.int32)
        ids = np.concatenate([prefix[None], suf], axis=1)
        reqs.append(Request(uid=i, batch={
            "input_ids": ids,
            "attention_mask": np.ones_like(ids, np.int32)}))
    ref = _dense_ref(params, cfg, gen, reqs, prefix_ids=prefix)
    # own pages per request: ceil((8 + 6 + 10)/4) - 2 = 4; shared 2 +
    # own 6 < 2 + 8 forces preemption when both grow
    eng = PagedServingEngine(params, cfg, gen, n_slots=2, page_size=4,
                             n_pages=8, prefill_buckets=(16,),
                             decode_chunk=2, prefix_ids=prefix)
    got = eng.run(list(reqs))
    assert eng.stats["preemptions"] >= 1
    for uid in ref:
        np.testing.assert_array_equal(got[uid], ref[uid])
    assert len(eng._free_pages) == eng.n_pages - eng._n_shared


def test_paged_prefix_mismatch_raises(setup):
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=4, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=-1,
                           pad_token_id=0)
    prefix = np.arange(1, 9, dtype=np.int32)
    eng = PagedServingEngine(params, cfg, gen, n_slots=2, page_size=4,
                             prefill_buckets=(8,), prefix_ids=prefix)
    bad = _text_request(0, 12, seed=3)
    with pytest.raises(ValueError, match="prefix"):
        eng.run([bad])


def test_paged_attention_int8_kernel_interpret_matches_xla():
    """Our per-row-scales int8 Pallas kernel (ops/paged_attention_int8)
    through the Pallas INTERPRETER matches the XLA dequant reference —
    CI coverage of the kernel body itself, not just the XLA fallback
    (the shipped QuantizedTensor kernel broadcasts scales to the full
    pool shape — 4 bytes/elem of HBM — which this variant exists to
    avoid; on-chip parity: benchmarks/paged_kernel_parity.py)."""
    from molly_tpu.models.qwen3 import quantize_page_rows
    from molly_tpu.ops.paged_attention import paged_attention
    from molly_tpu.ops.paged_attention_int8 import (paged_attention_int8,
                                                    scales_to_tile,
                                                    tile_to_rows)
    rng = np.random.default_rng(3)
    B, Nq, Nkv, Dh, P, PPS = 3, 4, 2, 16, 4, 4
    NP = B * PPS + 1
    q = jnp.asarray(rng.normal(size=(B, Nq, Dh)).astype(np.float32))
    kp = jnp.asarray(rng.normal(size=(Nkv, NP, P, Dh)).astype(np.float32))
    vp = jnp.asarray(rng.normal(size=(Nkv, NP, P, Dh)).astype(np.float32))
    table = jnp.asarray(
        rng.permutation(NP - 1)[:B * PPS].reshape(B, PPS), jnp.int32)
    lengths = jnp.asarray([6, 15, 1], jnp.int32)
    kq, ksc = quantize_page_rows(kp)
    vq, vsc = quantize_page_rows(vp)
    kt, vt = scales_to_tile(ksc), scales_to_tile(vsc)
    assert kt.shape == (Nkv, NP, 8, P)
    np.testing.assert_array_equal(np.asarray(tile_to_rows(kt)),
                                  np.asarray(ksc))
    scale = Dh ** -0.5
    got = paged_attention_int8(
        (q * scale), kq, kt, vq, vt, lengths, table,
        pages_per_compute_block=2, interpret=True)
    # the XLA reference accepts both layouts — check tile vs rows too
    ref = paged_attention(q, kq, vq, lengths, table, impl="xla",
                          k_scales=ksc, v_scales=vsc)
    ref_t = paged_attention(q, kq, vq, lengths, table, impl="xla",
                            k_scales=kt, v_scales=vt)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(ref_t))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
