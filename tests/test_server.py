"""Continuous-batching serving engine tests: greedy parity with the batch
decode engine, slot reuse with more requests than slots, mixed prompt
lengths (buckets), and fusion (omics-injected) prompts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from molly_tpu.inference.engine import GenerationConfig, generate
from molly_tpu.inference.server import Request, ServingEngine, _pad_to_bucket
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


def _engine_reference(params, cfg, req, gen, bucket):
    """Single-request greedy decode through the batch engine on the same
    padded bucket the server uses."""
    padded = _pad_to_bucket(req.batch, bucket, gen.pad_token_id)
    jb = {k: jnp.asarray(v) for k, v in padded.items()}
    toks = generate(params, cfg, jb, gen, jax.random.key(0))
    return np.asarray(toks)[0]


def test_greedy_parity_mixed_lengths(setup):
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    reqs = [_text_request(i, s, seed=i) for i, s in
            enumerate([5, 12, 20, 7])]
    eng = ServingEngine(params, cfg, gen, n_slots=4, max_len=64,
                        prefill_buckets=(8, 16, 32))
    results = eng.run(list(reqs))
    assert set(results) == {0, 1, 2, 3}
    for req in reqs:
        S = req.batch["input_ids"].shape[1]
        bucket = next(b for b in (8, 16, 32) if S <= b)
        ref = _engine_reference(params, cfg, req, gen, bucket)
        got = results[req.uid]
        assert len(got) == gen.max_new_tokens
        np.testing.assert_array_equal(got, ref[:len(got)])


def test_slot_reuse_more_requests_than_slots(setup):
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=-1,
                           pad_token_id=0)
    reqs = [Request(uid=f"r{i}",
                    batch=_text_request(0, 6 + i, seed=10 + i).batch,
                    max_new_tokens=3 + (i % 4))
            for i in range(7)]
    eng = ServingEngine(params, cfg, gen, n_slots=2, max_len=32,
                        prefill_buckets=(16,))
    results = eng.run(list(reqs))
    assert len(results) == 7
    for i, req in enumerate(reqs):
        got = results[f"r{i}"]
        assert len(got) == 3 + (i % 4), (i, got)
        ref = _engine_reference(params, cfg, req, gen, 16)
        np.testing.assert_array_equal(got, ref[:len(got)])


def test_fusion_prompt_parity(setup):
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
    eng = ServingEngine(params, cfg, gen, n_slots=2, max_len=32,
                        prefill_buckets=(16,))
    results = eng.run([req])
    ref = _engine_reference(params, cfg, req, gen, 16)
    np.testing.assert_array_equal(results["omics"], ref[:5])


def test_eos_frees_slot(setup):
    """Force EOS on the first decode step via eos == greedy argmax: run one
    request, find its second token, then rerun with that as eos and check
    the generation stops early and the slot is reused."""
    cfg, params = setup
    gen0 = GenerationConfig(max_new_tokens=6, do_sample=False,
                            repetition_penalty=1.0, eos_token_id=-1,
                            pad_token_id=0)
    req = _text_request("a", 10, seed=42)
    eng = ServingEngine(params, cfg, gen0, n_slots=1, max_len=32,
                        prefill_buckets=(16,))
    first = eng.run([req])["a"]
    eos = int(first[2])

    gen1 = GenerationConfig(max_new_tokens=6, do_sample=False,
                            repetition_penalty=1.0, eos_token_id=eos,
                            pad_token_id=0)
    eng = ServingEngine(params, cfg, gen1, n_slots=1, max_len=32,
                        prefill_buckets=(16,))
    req2 = Request(uid="b", batch=req.batch)
    results = eng.run([Request(uid="a", batch=req.batch), req2])
    assert len(results) == 2
    # stopped at the first EOS occurrence, slot freed and reused for b
    stop = int(np.argmax(first == eos)) + 1
    np.testing.assert_array_equal(results["a"], first[:stop])
    np.testing.assert_array_equal(results["b"], first[:stop])


def test_pad_to_bucket_shifts_positions():
    batch = {
        "input_ids": np.arange(1, 7, dtype=np.int32)[None],
        "attention_mask": np.ones((1, 6), np.int32),
        "dna_rna_pos": np.asarray([[2, -1]], np.int32),
    }
    out = _pad_to_bucket(batch, 10, pad_id=0)
    assert out["input_ids"].shape == (1, 10)
    np.testing.assert_array_equal(out["input_ids"][0, :4], 0)
    np.testing.assert_array_equal(out["attention_mask"][0],
                                  [0, 0, 0, 0, 1, 1, 1, 1, 1, 1])
    np.testing.assert_array_equal(out["dna_rna_pos"][0], [6, -1])


def test_decode_chunking_parity(setup):
    """decode_chunk > 1 (one dispatch for several steps) produces the same
    greedy tokens as per-step scheduling."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=7, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    reqs = [_text_request(i, 9 + i, seed=50 + i) for i in range(3)]
    ref = ServingEngine(params, cfg, gen, n_slots=2, max_len=32,
                        prefill_buckets=(16,)).run(list(reqs))
    got = ServingEngine(params, cfg, gen, n_slots=2, max_len=32,
                        prefill_buckets=(16,), decode_chunk=4).run(list(reqs))
    for i in range(3):
        np.testing.assert_array_equal(got[i], ref[i])


def test_inference_cli_serve_matches_static(tmp_path):
    """--serve produces the same greedy JSONL outputs as static batching
    through the real CLI (tiny model, tiny parquet)."""
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
    serve_out = str(tmp_path / "serve.jsonl")
    infer_main(common + ["--output-file", serve_out, "--serve",
                         "--serve-chunk", "2"])

    static = [json.loads(l) for l in open(static_out)]
    serve = [json.loads(l) for l in open(serve_out)]
    assert len(static) == len(serve) == 6
    s_by_input = {r["input"]: r for r in static}
    for r in serve:
        ref = s_by_input[r["input"]]
        assert r["decoded_output"] == ref["decoded_output"]
        assert r["task"] == ref["task"]


def test_prefix_caching_parity(setup):
    """Engine with a shared-prefix KV cache produces the same greedy
    outputs as the plain engine on prompts that share that prefix."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    rng = np.random.default_rng(11)
    prefix = rng.integers(1, 64, 6).astype(np.int32)
    reqs = []
    for i in range(3):
        suffix = rng.integers(1, 64, (1, 5 + i)).astype(np.int32)
        ids = np.concatenate([prefix[None], suffix], axis=1)
        batch = {"input_ids": ids,
                 "attention_mask": np.ones_like(ids),
                 "dna_rna_tokens": rng.integers(2, 16, (1, 1, 4)).astype(
                     np.int32),
                 # segment in the suffix (position is prompt-relative)
                 "dna_rna_pos": np.asarray([[6 + i]], np.int32)}
        reqs.append(Request(uid=i, batch=batch))

    plain = ServingEngine(params, cfg, gen, n_slots=2, max_len=32,
                          prefill_buckets=(16,)).run(list(reqs))
    cached = ServingEngine(params, cfg, gen, n_slots=2, max_len=32,
                           prefill_buckets=(16,),
                           prefix_ids=prefix).run(list(reqs))
    for i in range(3):
        np.testing.assert_array_equal(cached[i], plain[i])


def test_prefix_mismatch_raises(setup):
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=4, do_sample=False,
                           eos_token_id=-1, pad_token_id=0)
    prefix = np.arange(1, 7, dtype=np.int32)
    eng = ServingEngine(params, cfg, gen, n_slots=1, max_len=32,
                        prefill_buckets=(8,), prefix_ids=prefix)
    bad = Request(uid=0, batch={
        "input_ids": np.full((1, 10), 9, np.int32),
        "attention_mask": np.ones((1, 10), np.int32)})
    eng.submit(bad)
    with pytest.raises(ValueError):
        eng.run([])


def test_streaming_delivers_monotone_prefixes(setup):
    """stream_cb receives growing prefixes that culminate in exactly the
    final result for every request."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=7, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    streamed = {}

    def cb(uid, toks):
        prev = streamed.setdefault(uid, [])
        if prev:
            np.testing.assert_array_equal(prev[-1],
                                          toks[:len(prev[-1])])
        prev.append(np.array(toks))

    reqs = [_text_request(i, 8 + i, seed=70 + i) for i in range(3)]
    eng = ServingEngine(params, cfg, gen, n_slots=2, max_len=32,
                        prefill_buckets=(16,), decode_chunk=2,
                        stream_cb=cb)
    results = eng.run(list(reqs))
    assert set(streamed) == {0, 1, 2}
    for uid, chunks in streamed.items():
        np.testing.assert_array_equal(chunks[-1], results[uid])


def test_int8_kv_cache_decode_matches_bf16(setup):
    """int8 KV cache (per-column scales factored into the attention dots):
    the serving engine's greedy outputs on a tiny f32 model must MATCH the
    bf16-cache engine — quantization noise (~1e-2 on logits) only flips
    argmaxes at near-ties, which a fixed-seed tiny model avoids; exactness
    is asserted on agreement of >= 90% of tokens and identical shapes."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    reqs = [_text_request(i, s, seed=100 + i) for i, s in
            enumerate([6, 11, 16, 9])]
    ref_eng = ServingEngine(params, cfg, gen, n_slots=4, max_len=64,
                            prefill_buckets=(16,))
    ref = ref_eng.run([Request(r.uid, dict(r.batch)) for r in reqs])
    q_eng = ServingEngine(params, cfg, gen, n_slots=4, max_len=64,
                          prefill_buckets=(16,), kv_quant="int8")
    got = q_eng.run([Request(r.uid, dict(r.batch)) for r in reqs])
    assert set(got) == set(ref)
    agree = total = 0
    for uid in ref:
        assert got[uid].shape == ref[uid].shape
        agree += int(np.sum(got[uid] == ref[uid]))
        total += ref[uid].size
    assert agree / total >= 0.9, (agree, total)


def test_int8_kv_forward_logits_close():
    """Direct numeric check: one prefill+decode through an int8 cache vs a
    f32 cache — logits must be close (the per-column scale factoring is
    exact math; only the int8 rounding differs)."""
    from molly_tpu.models import qwen3

    cfg = tiny_qwen3(vocab_size=64, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=8)
    params = qwen3.init_params(cfg, jax.random.key(3))
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 64, (2, 10)),
                      jnp.int32)
    emb = qwen3.embed_tokens(params, ids)
    mask = jnp.ones((2, 12), jnp.int32)

    outs = {}
    for quant in (None, "int8"):
        cache = qwen3.init_cache(cfg, 2, 12, quant=quant)
        h, cache = qwen3.forward_hidden(
            params, cfg, inputs_embeds=emb,
            attention_mask=mask.at[:, 10:].set(0),
            positions=jnp.arange(10)[None].repeat(2, 0),
            cache=cache, cache_index=0)
        tok = jnp.argmax(qwen3.logits_from_hidden(params, cfg, h[:, -1:]),
                         -1)
        h2, cache = qwen3.forward_hidden(
            params, cfg, input_ids=tok, attention_mask=mask.at[:, 11:].set(0),
            positions=jnp.full((2, 1), 10), cache=cache, cache_index=10)
        outs[quant] = np.asarray(
            qwen3.logits_from_hidden(params, cfg, h2[:, 0]))
    ref, got = outs[None], outs["int8"]
    denom = np.maximum(np.abs(ref).max(), 1e-3)
    assert np.max(np.abs(ref - got)) / denom < 0.05, (
        np.max(np.abs(ref - got)), denom)


def test_rowwise_sampler_matches_static():
    """sample_tokens_rowwise with uniform rows reproduces sample_tokens
    exactly (same processor order, same rng stream) across greedy,
    top-k sampled, and full-vocab nucleus modes."""
    from molly_tpu.inference.sampling import (sample_tokens,
                                              sample_tokens_rowwise)
    rng = np.random.default_rng(3)
    B, V = 5, 97
    logits = jnp.asarray(rng.normal(size=(B, V)).astype(np.float32))
    presence = jnp.asarray(rng.random((B, V)) < 0.1)
    key = jax.random.key(7)

    def uniform(greedy, temp, k, p, pen):
        return {"greedy": jnp.full((B,), greedy),
                "temperature": jnp.full((B,), temp, jnp.float32),
                "top_k": jnp.full((B,), max(k, 1), jnp.int32),
                "top_p": jnp.full((B,), p, jnp.float32),
                "repetition_penalty": jnp.full((B,), pen, jnp.float32)}

    a = sample_tokens(logits, key, do_sample=False,
                      repetition_penalty=1.1, presence=presence)
    b = sample_tokens_rowwise(logits, key,
                              uniform(True, 0.8, 20, 0.95, 1.1),
                              presence, max_top_k=20)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    a = sample_tokens(logits, key, do_sample=True, temperature=0.7,
                      top_k=8, top_p=0.9, repetition_penalty=1.1,
                      presence=presence)
    b = sample_tokens_rowwise(logits, key,
                              uniform(False, 0.7, 8, 0.9, 1.1),
                              presence, max_top_k=8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    a = sample_tokens(logits, key, do_sample=True, temperature=1.3,
                      top_k=0, top_p=0.8, presence=presence)
    b = sample_tokens_rowwise(logits, key,
                              uniform(False, 1.3, 1, 0.8, 1.0),
                              presence, max_top_k=0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_per_request_sampling_mixed(setup):
    """A sampling-default engine honors per-request greedy overrides
    (temperature=0 or greedy=True): those rows must match the batch
    engine's greedy decode exactly while a sampled row rides along in
    the same slot pool / compiled program."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=6, do_sample=True,
                           temperature=0.8, top_k=8, top_p=0.95,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    greedy_gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                                  repetition_penalty=1.1, eos_token_id=-1,
                                  pad_token_id=0)
    reqs = [_text_request(i, 6 + i, seed=40 + i) for i in range(3)]
    reqs[0].sampling = {"temperature": 0}
    reqs[1].sampling = {"greedy": True}
    eng = ServingEngine(params, cfg, gen, n_slots=3, max_len=48,
                        prefill_buckets=(16,))
    results = eng.run(list(reqs))
    assert set(results) == {0, 1, 2}
    for i in (0, 1):
        ref = _engine_reference(params, cfg, reqs[i], greedy_gen, 16)
        np.testing.assert_array_equal(results[i], ref[:len(results[i])])
    assert len(results[2]) == 6


def test_cancel_frees_slot_and_returns_partial(setup):
    """cancel() on an in-flight request force-finishes its slot (partial
    output harvested, prefix-exact vs uncanceled decode) and the freed
    slot backfills the queue; cancel() on a QUEUED request drops it with
    an empty result."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=12, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=-1,
                           pad_token_id=0)
    canceled = []

    def cb(uid, toks):
        if uid == 0 and len(toks) >= 2 and not canceled:
            canceled.append(uid)
            eng.cancel(0)

    eng = ServingEngine(params, cfg, gen, n_slots=1, max_len=48,
                        prefill_buckets=(16,), decode_chunk=2,
                        stream_cb=cb)
    reqs = [_text_request(0, 6, seed=1), _text_request(1, 7, seed=2),
            _text_request(2, 8, seed=3)]
    for r in reqs:
        eng.submit(r)
    eng.cancel(2)  # still queued -> dropped, empty result
    results = eng.run([])
    assert set(results) == {0, 1, 2}
    assert 2 <= len(results[0]) < 12
    ref = _engine_reference(params, cfg, reqs[0], gen, 16)
    np.testing.assert_array_equal(results[0], ref[:len(results[0])])
    assert len(results[1]) == 12  # backfilled into the freed slot
    assert len(results[2]) == 0


def test_multi_lora_bank_mixed_pool(setup):
    """Multi-LoRA serving: one slot pool, three requests on three
    different adapters (0 = base). The base row must be BIT-identical to
    the bank-less engine (zero-delta bypass adds exact 0.0); adapter
    rows must match a single-adapter MERGED engine greedy-for-greedy
    (merge folds a@b into W in fp32 — adapter deltas are made large so
    argmax decisions dominate the merge-vs-bypass rounding)."""
    from molly_tpu.models.lora import (LoraConfig, init_lora, merge_lora,
                                       stack_adapters)
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    lcfg = LoraConfig(r=4, alpha=8.0, dropout=0.0)
    adapters = []
    for i in range(2):
        key = jax.random.key(100 + i)
        lora = init_lora(cfg.text, lcfg, key)
        lora = {"layers": {
            t: {"a": ab["a"],
                "b": 0.5 * jax.random.normal(
                    jax.random.fold_in(key, hash(t) % 97),
                    ab["b"].shape, jnp.float32)}
            for t, ab in lora["layers"].items()}}
        adapters.append(lora)
    bank = stack_adapters(adapters, scales=[lcfg.scale] * 2)

    reqs = [_text_request(i, 6 + i, seed=60 + i) for i in range(3)]
    reqs[1].adapter = 1
    reqs[2].adapter = 2
    eng = ServingEngine(params, cfg, gen, n_slots=3, max_len=48,
                        prefill_buckets=(16,), lora_bank=bank)
    results = eng.run(list(reqs))

    # base row: bit-exact vs the plain engine
    plain = ServingEngine(params, cfg, gen, n_slots=1, max_len=48,
                          prefill_buckets=(16,)).run(
        [Request(uid=0, batch=reqs[0].batch)])
    np.testing.assert_array_equal(results[0], plain[0])

    # adapter rows: match single-adapter merged decodes
    for i, lora in enumerate(adapters):
        merged = dict(params)
        merged["text"] = merge_lora(params["text"], lora, lcfg)
        ref = _engine_reference(merged, cfg, reqs[i + 1], gen, 16)
        np.testing.assert_array_equal(results[i + 1],
                                      ref[:len(results[i + 1])])
    # and the adapters actually change behavior vs the base model
    base_ref1 = _engine_reference(params, cfg, reqs[1], gen, 16)
    assert not np.array_equal(results[1], base_ref1[:len(results[1])])


def test_multi_lora_bank_fused_decode_path(setup):
    """Multi-LoRA on the FUSED serving weights (qkv_proj/gateup_proj):
    per-target deltas land on column slices of the fused projections
    (models.lora.apply_lora_fused), so a bank-loaded engine keeps the
    fused decode path. Greedy tokens must match the unfused bank engine
    row for row."""
    from molly_tpu.models import qwen3
    from molly_tpu.models.lora import LoraConfig, init_lora, stack_adapters
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    lcfg = LoraConfig(r=4, alpha=8.0, dropout=0.0)
    adapters = []
    for i in range(2):
        key = jax.random.key(200 + i)
        lora = init_lora(cfg.text, lcfg, key)
        lora = {"layers": {
            t: {"a": ab["a"],
                "b": 0.5 * jax.random.normal(
                    jax.random.fold_in(key, hash(t) % 97),
                    ab["b"].shape, jnp.float32)}
            for t, ab in lora["layers"].items()}}
        adapters.append(lora)
    bank = stack_adapters(adapters, scales=[lcfg.scale] * 2)

    reqs = [_text_request(i, 6 + i, seed=80 + i) for i in range(3)]
    reqs[1].adapter = 1
    reqs[2].adapter = 2

    def run(text_params):
        eng = ServingEngine({**params, "text": text_params}, cfg, gen,
                            n_slots=3, max_len=48, prefill_buckets=(16,),
                            lora_bank=bank)
        return eng.run([Request(uid=r.uid, batch=r.batch,
                                adapter=r.adapter) for r in reqs])

    unfused = run(params["text"])
    fused = run(qwen3.fuse_for_decode(params["text"], cfg.text))
    for uid in (0, 1, 2):
        np.testing.assert_array_equal(fused[uid], unfused[uid])
    # adapters actually fire on the fused path (rows differ from base)
    assert not np.array_equal(fused[1], fused[0][:len(fused[1])]) or \
        not np.array_equal(fused[2], fused[0][:len(fused[2])])
