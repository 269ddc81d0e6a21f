"""OpenAI-compatible HTTP API over the continuous-batching engine:
greedy parity with the batch engine, SSE streaming, chat endpoint,
omics-tagged prompts, concurrency. (The reference has no online serving;
its only inference mode is a batch script, inference_lora.py.)"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from molly_tpu.data import (DataConfig, collate_test,
                            default_modality_tokenizers,
                            load_text_tokenizer)
from molly_tpu.data.omics_dataset import OmicsSampleEncoder
from molly_tpu.inference.api_server import (OnlineServer, make_http_server)
from molly_tpu.inference.engine import GenerationConfig, generate
from molly_tpu.models import fusion, tiny_esm, tiny_qwen3
from molly_tpu.models.fusion import FusionConfig

PROMPTS = [
    "What does this protein do? <protein>MKTAYIAKQR</protein>",
    "Classify this sequence: <dna>ACGTACGTAACC</dna>",
    "Is the sky blue?",
]


@pytest.fixture(scope="module")
def api():
    text_tok = load_text_tokenizer(None)
    dna_tok, prot_tok = default_modality_tokenizers()
    dcfg = DataConfig(max_len=256, dna_rna_k_tokens=4, protein_k_tokens=4)
    encoder = OmicsSampleEncoder(text_tok, dna_tok, prot_tok, dcfg)
    cfg = FusionConfig(
        text=tiny_qwen3(vocab_size=-(-text_tok.vocab_size // 128) * 128,
                        dtype="float32"),
        dna_rna=tiny_esm(vocab_size=dna_tok.vocab_size, mask_token_id=2,
                         dtype="float32"),
        protein=tiny_esm(vocab_size=prot_tok.vocab_size,
                         mask_token_id=prot_tok.mask_id, dtype="float32"),
        dna_rna_k_tokens=4, protein_k_tokens=4)
    params = fusion.init_params(cfg, jax.random.key(0))
    # the SERVER defaults to sampling; every parity request below pins
    # itself greedy via per-request temperature=0 — this exercises the
    # per-row sampling path end-to-end
    gen = GenerationConfig(max_new_tokens=8, do_sample=True,
                           temperature=0.8, top_k=20, top_p=0.95,
                           repetition_penalty=1.1,
                           eos_token_id=text_tok.eos_token_id,
                           pad_token_id=text_tok.pad_token_id)
    greedy_gen = GenerationConfig(
        max_new_tokens=8, do_sample=False, repetition_penalty=1.1,
        eos_token_id=text_tok.eos_token_id,
        pad_token_id=text_tok.pad_token_id)
    online = OnlineServer(params, cfg, gen, encoder, text_tok,
                          n_slots=2, decode_chunk=2, admit_batch=1)
    httpd = make_http_server(online, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]

    def reference(prompt: str) -> str:
        sample = encoder.encode_test({"input": prompt})
        batch = collate_test([sample])
        arrs = {k: jnp.asarray(v) for k, v in batch.items()
                if isinstance(v, np.ndarray)}
        toks = np.asarray(generate(params, cfg, arrs, greedy_gen,
                                   jax.random.key(0)))[0]
        toks = toks[toks != greedy_gen.pad_token_id]
        return text_tok.decode(toks.tolist(), skip_special_tokens=True)

    yield port, reference
    httpd.shutdown()
    online.close()


def _post(port: int, path: str, body: dict):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=300)


def test_completions_parity_concurrent(api):
    port, reference = api
    results: dict = {}

    def hit(i, prompt):
        with _post(port, "/v1/completions",
                   {"prompt": prompt, "max_tokens": 8,
                    "temperature": 0}) as r:
            results[i] = json.loads(r.read())

    threads = [threading.Thread(target=hit, args=(i, p))
               for i, p in enumerate(PROMPTS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert set(results) == {0, 1, 2}
    for i, prompt in enumerate(PROMPTS):
        body = results[i]
        assert body["object"] == "text_completion"
        choice = body["choices"][0]
        assert choice["finish_reason"] in ("stop", "length")
        assert choice["text"] == reference(prompt)
        assert body["usage"]["completion_tokens"] > 0


def test_streaming_sse_matches_nonstream(api):
    port, reference = api
    prompt = PROMPTS[2]
    deltas = []
    with _post(port, "/v1/completions",
               {"prompt": prompt, "stream": True, "temperature": 0}) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                break
            deltas.append(json.loads(payload)["choices"][0]["text"])
    assert "".join(deltas) == reference(prompt)


def test_chat_endpoint(api):
    port, reference = api
    with _post(port, "/v1/chat/completions", {"temperature": 0,
            "messages": [
            {"role": "system", "content": "ignored (fixed template)"},
            {"role": "user", "content": PROMPTS[0]}]}) as r:
        body = json.loads(r.read())
    assert body["object"] == "chat.completion"
    msg = body["choices"][0]["message"]
    assert msg["role"] == "assistant"
    assert msg["content"] == reference(PROMPTS[0])


def test_http_errors(api):
    port, _ = api
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(port, "/v1/completions", {"prompt": ""})
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(port, "/v1/nope", {"prompt": "x"})
    assert ei.value.code == 404
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/models", timeout=30) as r:
        assert json.loads(r.read())["data"][0]["id"]


def test_stop_sequences(api):
    """OpenAI "stop": generation truncates BEFORE the stop string, the
    finish_reason is "stop", and the engine slot is freed early
    (best-effort cancel)."""
    port, reference = api
    ref = reference(PROMPTS[2])
    assert len(ref) >= 3
    stop = ref[1:3]
    with _post(port, "/v1/completions",
               {"prompt": PROMPTS[2], "temperature": 0,
                "stop": stop}) as r:
        body = json.loads(r.read())
    choice = body["choices"][0]
    assert choice["text"] == ref[:ref.find(stop)]
    assert choice["finish_reason"] == "stop"

    # streamed variant delivers the same truncated text
    deltas = []
    with _post(port, "/v1/completions",
               {"prompt": PROMPTS[2], "temperature": 0, "stream": True,
                "stop": [stop, "zzz-never"]}) as r:
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                break
            deltas.append(json.loads(payload)["choices"][0]["text"])
    assert "".join(deltas) == ref[:ref.find(stop)]


def test_logprobs(api):
    """"logprobs": chosen-token logprobs (raw model distribution) aligned
    with the completion tokens."""
    port, reference = api
    with _post(port, "/v1/completions",
               {"prompt": PROMPTS[1], "temperature": 0,
                "logprobs": 1}) as r:
        body = json.loads(r.read())
    choice = body["choices"][0]
    lp = choice["logprobs"]
    n = body["usage"]["completion_tokens"]
    assert len(lp["token_logprobs"]) == len(lp["tokens"]) == n > 0
    assert all(x <= 0.0 for x in lp["token_logprobs"])
    # greedy chooses high-probability tokens on a tiny vocab: logprobs
    # must be finite (log_softmax, not a masked sampler distribution)
    assert all(x > -50 for x in lp["token_logprobs"])


def test_multi_lora_model_routing():
    """Multi-LoRA over HTTP: the OpenAI "model" field routes requests to
    stacked adapters; unknown/absent model names serve the base; /v1/models
    lists every adapter. (Engine-level merged-parity is pinned in
    test_server.py::test_multi_lora_bank_mixed_pool.)"""
    from molly_tpu.models.lora import LoraConfig, init_lora, stack_adapters

    text_tok = load_text_tokenizer(None)
    dna_tok, prot_tok = default_modality_tokenizers()
    dcfg = DataConfig(max_len=192, dna_rna_k_tokens=4, protein_k_tokens=4)
    encoder = OmicsSampleEncoder(text_tok, dna_tok, prot_tok, dcfg)
    cfg = FusionConfig(
        text=tiny_qwen3(vocab_size=-(-text_tok.vocab_size // 128) * 128,
                        dtype="float32"),
        dna_rna=tiny_esm(vocab_size=dna_tok.vocab_size, mask_token_id=2,
                         dtype="float32"),
        protein=tiny_esm(vocab_size=prot_tok.vocab_size,
                         mask_token_id=prot_tok.mask_id, dtype="float32"),
        dna_rna_k_tokens=4, protein_k_tokens=4)
    params = fusion.init_params(cfg, jax.random.key(1))
    lcfg = LoraConfig(r=4, alpha=8.0, dropout=0.0)
    key = jax.random.key(9)
    lora = init_lora(cfg.text, lcfg, key)
    lora = {"layers": {t: {"a": ab["a"],
                           "b": 0.5 * jax.random.normal(
                               jax.random.fold_in(key, j),
                               ab["b"].shape, jnp.float32)}
                       for j, (t, ab) in
                       enumerate(sorted(lora["layers"].items()))}}
    bank = stack_adapters([lora], scales=[lcfg.scale])
    gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                           repetition_penalty=1.1,
                           eos_token_id=text_tok.eos_token_id,
                           pad_token_id=text_tok.pad_token_id)
    online = OnlineServer(params, cfg, gen, encoder, text_tok,
                          n_slots=2, decode_chunk=2, admit_batch=1,
                          lora_bank=bank, adapter_names=["bio-ft"])
    httpd = make_http_server(online, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/v1/models", timeout=30) as r:
            ids = [m["id"] for m in json.loads(r.read())["data"]]
        assert "bio-ft" in ids
        outs = {}
        for model in ("molly-tpu", "bio-ft", "not-a-model"):
            with _post(port, "/v1/completions",
                       {"prompt": "hello", "model": model,
                        "temperature": 0}) as r:
                outs[model] = json.loads(r.read())["choices"][0]["text"]
        assert outs["not-a-model"] == outs["molly-tpu"]  # base fallback
        assert outs["bio-ft"] != outs["molly-tpu"]       # adapter routed
    finally:
        httpd.shutdown()
        online.close()


def test_n_choices(api):
    """OpenAI "n": n choices per request — indices 0..n-1, greedy rows
    coincide, sampled rows draw independently, usage sums completions."""
    port, reference = api
    with _post(port, "/v1/completions",
               {"prompt": PROMPTS[2], "max_tokens": 8,
                "temperature": 0, "n": 3}) as r:
        body = json.loads(r.read())
    assert [c["index"] for c in body["choices"]] == [0, 1, 2]
    want = reference(PROMPTS[2])
    for c in body["choices"]:
        assert want.endswith(c["text"])  # greedy: all n identical
        assert c["text"] == body["choices"][0]["text"]
    n_tok = body["usage"]["completion_tokens"]
    assert n_tok == body["usage"]["total_tokens"] - \
        body["usage"]["prompt_tokens"]
    # sampled at high temperature: at least one pair diverges
    with _post(port, "/v1/completions",
               {"prompt": PROMPTS[2], "max_tokens": 8,
                "temperature": 1.5, "n": 4}) as r:
        body = json.loads(r.read())
    texts = [c["text"] for c in body["choices"]]
    assert len(texts) == 4
    assert len(set(texts)) > 1
    # invalid n / n with stream are 400s
    for bad in ({"prompt": "x", "n": 0},
                {"prompt": "x", "n": 2, "stream": True}):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(port, "/v1/completions", bad)
        assert ei.value.code == 400


def test_embeddings_endpoint(api):
    """/v1/embeddings serves the embed_text.py representation online:
    same pooled vector as the offline tool, one row per input."""
    port, _ = api
    with _post(port, "/v1/embeddings",
               {"input": [PROMPTS[0], PROMPTS[2]]}) as r:
        body = json.loads(r.read())
    assert body["object"] == "list"
    assert [d["index"] for d in body["data"]] == [0, 1]
    v0 = np.asarray(body["data"][0]["embedding"])
    v1 = np.asarray(body["data"][1]["embedding"])
    assert v0.shape == v1.shape and v0.ndim == 1 and v0.size > 0
    assert np.all(np.isfinite(v0))
    assert not np.allclose(v0, v1)  # different prompts, different vectors
    # deterministic: same input twice -> same vector
    with _post(port, "/v1/embeddings", {"input": PROMPTS[0]}) as r:
        again = np.asarray(
            json.loads(r.read())["data"][0]["embedding"])
    np.testing.assert_allclose(again, v0, rtol=1e-5, atol=1e-5)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(port, "/v1/embeddings", {"input": []})
    assert ei.value.code == 400


def test_api_server_paged_engine_parity():
    """OnlineServer(paged=True): the OpenAI surface rides the paged
    engine (prefix pages of the system prompt shared across slots) and
    greedy completions match the batch-engine reference."""
    text_tok = load_text_tokenizer(None)
    dna_tok, prot_tok = default_modality_tokenizers()
    dcfg = DataConfig(max_len=256, dna_rna_k_tokens=4, protein_k_tokens=4)
    encoder = OmicsSampleEncoder(text_tok, dna_tok, prot_tok, dcfg)
    cfg = FusionConfig(
        text=tiny_qwen3(vocab_size=-(-text_tok.vocab_size // 128) * 128,
                        dtype="float32"),
        dna_rna=tiny_esm(vocab_size=dna_tok.vocab_size, mask_token_id=2,
                         dtype="float32"),
        protein=tiny_esm(vocab_size=prot_tok.vocab_size,
                         mask_token_id=prot_tok.mask_id, dtype="float32"),
        dna_rna_k_tokens=4, protein_k_tokens=4)
    params = fusion.init_params(cfg, jax.random.key(0))
    gen = GenerationConfig(max_new_tokens=6, do_sample=True,
                           temperature=0.8, top_k=20, top_p=0.95,
                           repetition_penalty=1.1,
                           eos_token_id=text_tok.eos_token_id,
                           pad_token_id=text_tok.pad_token_id)
    greedy_gen = GenerationConfig(
        max_new_tokens=6, do_sample=False, repetition_penalty=1.1,
        eos_token_id=text_tok.eos_token_id,
        pad_token_id=text_tok.pad_token_id)
    online = OnlineServer(params, cfg, gen, encoder, text_tok,
                          n_slots=2, decode_chunk=2, admit_batch=1,
                          paged=True, page_size=32)
    from molly_tpu.inference.paged import PagedServingEngine
    assert isinstance(online.engine, PagedServingEngine)
    assert online.engine._n_shared >= 1  # system prompt shares pages
    httpd = make_http_server(online, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    port = httpd.server_address[1]
    try:
        prompt = "Is this DNA GC rich? <dna>ACGTACGT</dna>"
        with _post(port, "/v1/completions",
                   {"prompt": prompt, "temperature": 0}) as r:
            out = json.loads(r.read())
        sample = encoder.encode_test({"input": prompt})
        batch = collate_test([sample])
        arrs = {k: jnp.asarray(v) for k, v in batch.items()
                if isinstance(v, np.ndarray)}
        toks = np.asarray(generate(params, cfg, arrs, greedy_gen,
                                   jax.random.key(0)))[0]
        toks = toks[toks != greedy_gen.pad_token_id]
        ref = text_tok.decode(toks.tolist(), skip_special_tokens=True)
        assert out["choices"][0]["text"] == ref
    finally:
        httpd.shutdown()
        online.close()
