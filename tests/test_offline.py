"""Device-side admission ring (inference.offline): greedy token parity
with the online ServingEngine and the batch engine, slot recycling with
more requests than slots, per-request caps, EOS termination, queue
padding, and the int8-KV variant."""

import numpy as np
import pytest

import jax

from molly_tpu.inference.engine import GenerationConfig
from molly_tpu.inference.offline import run_offline
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


def _queue(n, bucket, seed=0, vocab=64):
    """n left-padded prompts of mixed real length in one bucket."""
    rng = np.random.default_rng(seed)
    ids = np.zeros((n, bucket), np.int32)
    mask = np.zeros((n, bucket), np.int32)
    for i in range(n):
        s = int(rng.integers(4, bucket + 1))
        ids[i, bucket - s:] = rng.integers(1, vocab, (s,))
        mask[i, bucket - s:] = 1
    return ids, mask


def _server_reference(params, cfg, gen, ids, mask, caps, n_slots, max_len,
                      bucket):
    reqs = []
    for i in range(ids.shape[0]):
        reqs.append(Request(
            uid=i, batch={"input_ids": ids[i:i + 1],
                          "attention_mask": mask[i:i + 1]},
            max_new_tokens=int(caps[i]) if caps is not None else None))
    eng = ServingEngine(params, cfg, gen, n_slots=n_slots, max_len=max_len,
                        prefill_buckets=(bucket,))
    return eng.run(reqs)


@pytest.mark.parametrize("kv_quant", [None, "int8"])
def test_offline_matches_online_greedy(setup, kv_quant):
    """Greedy outputs of the one-dispatch ring must match the online
    engine token-for-token (f32 tiny model: no argmax near-ties). The
    int8-KV variant is allowed >= 90% token agreement (quantization
    noise), same bar as the online engine's int8 test."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    bucket, n, n_slots = 16, 10, 4
    ids, mask = _queue(n, bucket, seed=3)
    ref = _server_reference(params, cfg, gen, ids, mask, None, n_slots,
                            64, bucket)
    out = run_offline(params, cfg, gen, ids, mask, n_slots=n_slots,
                      max_len=64, admit_group=2, kv_quant=kv_quant)
    assert out["tokens"].shape == (n, 8)
    agree = total = 0
    for i in range(n):
        got = out["tokens"][i, :out["lengths"][i]]
        assert got.shape == ref[i].shape, (i, got, ref[i])
        agree += int(np.sum(got == ref[i]))
        total += ref[i].size
    if kv_quant is None:
        assert agree == total, (agree, total)
    else:
        assert agree / total >= 0.9, (agree, total)


def test_offline_caps_and_eos(setup):
    """Per-request caps terminate rows at the right length; an EOS id the
    tiny model actually emits ends that row early and is included."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=10, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=-1,
                           pad_token_id=0)
    bucket, n = 8, 5
    ids, mask = _queue(n, bucket, seed=7)
    caps = np.asarray([1, 3, 10, 5, 2], np.int32)
    out = run_offline(params, cfg, gen, ids, mask, caps, n_slots=2,
                      max_len=32, admit_group=1)
    np.testing.assert_array_equal(out["lengths"], caps)
    # tokens beyond each row's length are pad
    for i in range(n):
        assert (out["tokens"][i, caps[i]:] == 0).all()

    # EOS: pick each row's 2nd generated token as its eos and re-run —
    # rows must stop at 2 tokens with the eos included
    eos = int(out["tokens"][2, 1])
    gen2 = GenerationConfig(max_new_tokens=10, do_sample=False,
                            repetition_penalty=1.0, eos_token_id=eos,
                            pad_token_id=0)
    out2 = run_offline(params, cfg, gen2, ids[2:3], mask[2:3],
                       n_slots=2, max_len=32, admit_group=1)
    n2 = out2["lengths"][0]
    assert out2["tokens"][0, n2 - 1] == eos


def test_offline_queue_padding_and_recycling(setup):
    """More requests than slots, queue size not a multiple of the
    admission group: every request gets exactly its own output."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=4, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    bucket, n = 8, 11  # 11 % 4 != 0 -> dummy-row padding
    ids, mask = _queue(n, bucket, seed=11)
    ref = _server_reference(params, cfg, gen, ids, mask, None, 4, 32,
                            bucket)
    out = run_offline(params, cfg, gen, ids, mask, n_slots=4,
                      max_len=32, admit_group=4)
    for i in range(n):
        np.testing.assert_array_equal(
            out["tokens"][i, :out["lengths"][i]], ref[i],
            err_msg=f"request {i}")


def test_offline_spec_lookup_token_exact(setup):
    """Prompt-lookup speculation inside the ring must be token-identical
    to the plain ring (greedy, default repetition penalty): acceptance
    changes how many rounds produce the tokens, never which tokens."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=16, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    bucket, n, n_slots = 16, 10, 4
    ids, mask = _queue(n, bucket, seed=5)
    plain = run_offline(params, cfg, gen, ids, mask, n_slots=n_slots,
                        max_len=96, admit_group=2)
    spec = run_offline(params, cfg, gen, ids, mask, n_slots=n_slots,
                       max_len=96, admit_group=2, spec_lookup=4)
    np.testing.assert_array_equal(spec["lengths"], plain["lengths"])
    for i in range(n):
        np.testing.assert_array_equal(
            spec["tokens"][i, :spec["lengths"][i]],
            plain["tokens"][i, :plain["lengths"][i]],
            err_msg=f"request {i}")
    # a verify round emits at least one token, so rounds <= plain ticks;
    # tiny random greedy models loop, so lookup should accept something
    assert spec["decode_ticks"] <= plain["decode_ticks"]
    assert spec["accepted"] > 0, "no drafts accepted on a looping model"


def test_offline_spec_lookup_caps_eos_and_no_penalty(setup):
    """Spec mode respects per-request caps and EOS mid-chain, and stays
    exact with repetition_penalty=1.0 (no presence chain in play)."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=12, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=-1,
                           pad_token_id=0)
    bucket, n = 8, 5
    ids, mask = _queue(n, bucket, seed=9)
    caps = np.asarray([1, 3, 12, 5, 2], np.int32)
    plain = run_offline(params, cfg, gen, ids, mask, caps, n_slots=2,
                        max_len=48, admit_group=1)
    spec = run_offline(params, cfg, gen, ids, mask, caps, n_slots=2,
                       max_len=48, admit_group=1, spec_lookup=3)
    np.testing.assert_array_equal(spec["lengths"], plain["lengths"])
    for i in range(n):
        np.testing.assert_array_equal(
            spec["tokens"][i, :spec["lengths"][i]],
            plain["tokens"][i, :plain["lengths"][i]],
            err_msg=f"request {i}")

    # EOS mid-chain: make row 2's 3rd token its eos; the spec ring must
    # stop there and include it
    eos = int(plain["tokens"][2, 2])
    gen2 = GenerationConfig(max_new_tokens=12, do_sample=False,
                            repetition_penalty=1.0, eos_token_id=eos,
                            pad_token_id=0)
    ref = run_offline(params, cfg, gen2, ids[2:3], mask[2:3], n_slots=2,
                      max_len=48, admit_group=1)
    got = run_offline(params, cfg, gen2, ids[2:3], mask[2:3], n_slots=2,
                      max_len=48, admit_group=1, spec_lookup=3)
    np.testing.assert_array_equal(got["lengths"], ref["lengths"])
    np.testing.assert_array_equal(
        got["tokens"][0, :got["lengths"][0]],
        ref["tokens"][0, :ref["lengths"][0]])


def test_offline_spec_lookup_int8_kv(setup):
    """Spec + int8 KV cache compose; >=90% token agreement with the plain
    int8 ring (the quantized columns are written identically, but matmul
    shape differences can flip argmax near-ties on a random model)."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    bucket, n = 16, 6
    ids, mask = _queue(n, bucket, seed=13)
    plain = run_offline(params, cfg, gen, ids, mask, n_slots=3,
                        max_len=64, admit_group=1, kv_quant="int8")
    spec = run_offline(params, cfg, gen, ids, mask, n_slots=3,
                       max_len=64, admit_group=1, kv_quant="int8",
                       spec_lookup=4)
    agree = total = 0
    for i in range(n):
        a = plain["tokens"][i, :plain["lengths"][i]]
        b = spec["tokens"][i, :spec["lengths"][i]]
        k = min(a.size, b.size)
        agree += int(np.sum(a[:k] == b[:k]))
        total += max(a.size, b.size)
    assert agree / total >= 0.9, (agree, total)


def test_offline_spec_lookup_sampled_distribution(setup):
    """Sampled in-ring speculation must leave the OUTPUT DISTRIBUTION
    unchanged (point-mass rejection rule). Many requests share one
    prompt; per-position token frequencies across requests of the plain
    sampled ring and the spec ring must agree within empirical-TV noise
    (same bar as test_speculative's single-stream distribution tests)."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=3, do_sample=True,
                           temperature=0.9, top_k=8, top_p=0.95,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    n, bucket = 512, 8
    ids = np.tile(np.arange(1, bucket + 1, dtype=np.int32), (n, 1))
    mask = np.ones((n, bucket), np.int32)
    plain = run_offline(params, cfg, gen, ids, mask, n_slots=64,
                        max_len=32, admit_group=64,
                        rng=jax.random.key(11))
    plain2 = run_offline(params, cfg, gen, ids, mask, n_slots=64,
                         max_len=32, admit_group=64,
                         rng=jax.random.key(77))
    spec = run_offline(params, cfg, gen, ids, mask, n_slots=64,
                       max_len=32, admit_group=64, spec_lookup=3,
                       rng=jax.random.key(23))
    assert (plain["lengths"] == 3).all() and (spec["lengths"] == 3).all()
    V = cfg.text.vocab_size

    def tv(a, b, pos):
        fa = np.bincount(a["tokens"][:, pos], minlength=V) / n
        fb = np.bincount(b["tokens"][:, pos], minlength=V) / n
        return 0.5 * np.abs(fa - fb).sum()

    for pos in range(3):
        noise = tv(plain, plain2, pos)  # empirical-TV floor at this n
        got = tv(plain, spec, pos)
        assert got < noise + 0.08, (pos, got, noise)


def test_offline_fusion_prompts_match_online(setup):
    """Fusion (omics-injected) prompts through the ring: greedy outputs
    must match the online engine, which runs the same encoders +
    injection per admission group (reference inference_lora.py's actual
    workload is omics-tagged)."""
    from molly_tpu.inference.server import _pad_to_bucket
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    bucket, n, n_slots = 16, 7, 3
    rng = np.random.default_rng(21)
    reqs, rows = [], []
    for i in range(n):
        s = int(rng.integers(8, bucket + 1))
        batch = {
            "input_ids": rng.integers(1, 64, (1, s)).astype(np.int32),
            "attention_mask": np.ones((1, s), np.int32),
            # one DNA segment (k=4 placeholder slots) at a start that
            # keeps start+1+4 inside the prompt; every other request
            # also carries a protein segment
            "dna_rna_tokens": rng.integers(2, 16, (1, 1, 4)).astype(
                np.int32),
            "dna_rna_pos": np.asarray([[int(rng.integers(0, s - 5))]],
                                      np.int32),
        }
        if i % 2:
            batch["protein_tokens"] = np.full((1, 1, 4), 3, np.int32)
            batch["protein_pos"] = np.asarray(
                [[int(rng.integers(0, s - 5))]], np.int32)
        else:  # static queue shapes: padded no-segment rows
            batch["protein_tokens"] = np.full((1, 1, 4), 1, np.int32)
            batch["protein_pos"] = np.asarray([[-1]], np.int32)
        reqs.append(Request(uid=i, batch=batch))
        rows.append(_pad_to_bucket(batch, bucket, gen.pad_token_id))

    eng = ServingEngine(params, cfg, gen, n_slots=n_slots, max_len=48,
                        prefill_buckets=(bucket,))
    ref = eng.run(reqs)

    ids = np.concatenate([r["input_ids"] for r in rows])
    mask = np.concatenate([r["attention_mask"] for r in rows])
    omics = {k: np.concatenate([r[k] for r in rows])
             for k in ("dna_rna_tokens", "dna_rna_pos",
                       "protein_tokens", "protein_pos")}
    out = run_offline(params, cfg, gen, ids, mask, n_slots=n_slots,
                      max_len=48, admit_group=2, queue_omics=omics)
    for i in range(n):
        np.testing.assert_array_equal(
            out["tokens"][i, :out["lengths"][i]], ref[i],
            err_msg=f"request {i}")


def test_inference_cli_offline_ring_matches_static(tmp_path):
    """--offline-ring produces the same greedy JSONL outputs as the
    static batch path through the real CLI (tiny model, omics-tagged
    toy parquet, one device dispatch for the whole file)."""
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
    ring_out = str(tmp_path / "ring.jsonl")
    infer_main(common + ["--output-file", ring_out, "--offline-ring",
                         "--serve-admit", "2", "--ring-spec", "3"])

    static = [json.loads(l) for l in open(static_out)]
    ring = [json.loads(l) for l in open(ring_out)]
    assert len(static) == len(ring) == 6
    s_by_input = {r["input"]: r for r in static}
    for r in ring:
        ref = s_by_input[r["input"]]
        assert r["decoded_output"] == ref["decoded_output"]
        assert r["task"] == ref["task"]


def test_offline_spec_near_full_acceptance_trained_copy():
    """Trained-acceptance proof for the IN-RING speculation: a tiny model
    trained to continue a periodic stream (the workload shape molly
    serves — outputs quoting spans of the input) must make the ring's
    batched lookup accept nearly everything: decode ROUNDS collapse to
    ~tokens/(k+1) while outputs stay token-identical to the plain ring."""
    import optax

    from molly_tpu.models import qwen3, tiny_qwen3

    cfg_t = tiny_qwen3(num_hidden_layers=2, vocab_size=32)
    tparams = qwen3.init_params(cfg_t, jax.random.key(3))
    pat = np.asarray([7, 3, 11, 19, 5, 23, 2, 13], np.int32)
    seq = np.tile(pat, 8)[None]

    import jax.numpy as jnp

    def loss_fn(p):
        logits = qwen3.forward_logits(
            p, cfg_t,
            inputs_embeds=qwen3.embed_tokens(p, jnp.asarray(seq[:, :-1])),
            attention_mask=jnp.ones((1, 63), jnp.int32))
        ll = jax.nn.log_softmax(logits[0].astype(jnp.float32))
        return -jnp.mean(ll[jnp.arange(63), seq[0, 1:]])

    opt = optax.adamw(3e-3)
    state = opt.init(tparams)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    for _ in range(150):
        tparams, state, loss = step(tparams, state)
    assert float(loss) < 0.1, float(loss)

    cfg = FusionConfig(text=cfg_t, dna_rna=tiny_esm(vocab_size=16),
                       protein=tiny_esm(vocab_size=20),
                       dna_rna_k_tokens=4, protein_k_tokens=4)
    params = fusion.init_params(cfg, jax.random.key(2))
    params["text"] = tparams

    gen = GenerationConfig(max_new_tokens=24, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=-1,
                           pad_token_id=0)
    n, bucket = 8, 24
    ids = np.tile(pat, (n, 3))          # every request: 3 periods
    mask = np.ones((n, bucket), np.int32)
    plain = run_offline(params, cfg, gen, ids, mask, n_slots=4,
                        max_len=96, admit_group=4)
    spec = run_offline(params, cfg, gen, ids, mask, n_slots=4,
                       max_len=96, admit_group=4, spec_lookup=5)
    for i in range(n):
        np.testing.assert_array_equal(
            spec["tokens"][i, :spec["lengths"][i]],
            plain["tokens"][i, :plain["lengths"][i]], err_msg=str(i))
    # 8 reqs x 24 tokens on 4 slots: plain needs ~2x24 rounds; near-full
    # acceptance collapses it to ~2x24/(k+1)=8 (allow scheduling slack)
    assert plain["decode_ticks"] >= 40, plain["decode_ticks"]
    assert spec["decode_ticks"] <= 14, (spec["decode_ticks"],
                                        spec["accepted"])
    assert spec["accepted"] >= 0.75 * (n * 24 - n), spec["accepted"]
    # the acceptance-adaptive ring must KEEP speculation on here (EMA
    # stays near 1) and match both fixed modes token-for-token
    adapt = run_offline(params, cfg, gen, ids, mask, n_slots=4,
                        max_len=96, admit_group=4, spec_lookup=5,
                        spec_threshold=0.2)
    for i in range(n):
        np.testing.assert_array_equal(
            adapt["tokens"][i, :adapt["lengths"][i]],
            plain["tokens"][i, :plain["lengths"][i]], err_msg=str(i))
    assert adapt["spec_ema"] > 0.6, adapt["spec_ema"]
    assert adapt["spec_ticks"] == adapt["decode_ticks"], (
        adapt["spec_ticks"], adapt["decode_ticks"])
    assert adapt["decode_ticks"] <= 16, adapt["decode_ticks"]
    # shadow flip-ON: start the EMA BELOW threshold (plain mode, no
    # probes) — the shadow-draft estimator in the plain ticks must
    # detect the quotable workload and turn speculation on by itself,
    # still token-exact vs the plain ring
    flip = run_offline(params, cfg, gen, ids, mask, n_slots=4,
                       max_len=96, admit_group=4, spec_lookup=5,
                       spec_threshold=0.2, spec_chunk=8,
                       spec_initial_ema=0.0)
    for i in range(n):
        np.testing.assert_array_equal(
            flip["tokens"][i, :flip["lengths"][i]],
            plain["tokens"][i, :plain["lengths"][i]], err_msg=str(i))
    assert flip["spec_ticks"] > 0, flip
    assert flip["spec_ticks"] < flip["decode_ticks"], flip
    assert flip["spec_ema"] > 0.6, flip["spec_ema"]
    assert flip["decode_ticks"] < plain["decode_ticks"], (
        flip["decode_ticks"], plain["decode_ticks"])


def test_offline_moe_int8_experts_matches_online():
    """MoE decoder with int8 expert weights through the one-dispatch
    admission ring: token-exact vs the online engine on the same
    quantized params (f32 activations — no argmax near-ties)."""
    from molly_tpu.models import qwen3, tiny_moe

    cfg = FusionConfig(
        text=tiny_moe(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=8),
        dna_rna=tiny_esm(vocab_size=16), protein=tiny_esm(vocab_size=20),
        dna_rna_k_tokens=4, protein_k_tokens=4)
    params = fusion.init_params(cfg, jax.random.key(5))
    params = {**params,
              "text": qwen3.quantize_for_decode(params["text"], cfg.text,
                                                moe_experts=True)}
    assert "w_q" in params["text"]["layers"]["expert_gateup"]
    gen = GenerationConfig(max_new_tokens=6, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    bucket, n, n_slots = 16, 6, 2
    ids, mask = _queue(n, bucket, seed=7)
    ref = _server_reference(params, cfg, gen, ids, mask, None, n_slots,
                            48, bucket)
    out = run_offline(params, cfg, gen, ids, mask, n_slots=n_slots,
                      max_len=48, admit_group=2)
    for i in range(n):
        got = out["tokens"][i, :out["lengths"][i]]
        np.testing.assert_array_equal(got, ref[i])


def test_offline_moe_spec_lookup_token_exact():
    """In-ring prompt-lookup speculation on a MoE decoder (the k+1-wide
    verify runs the sparse FFN at S>1 with per-row cache columns):
    greedy output must equal the plain ring's."""
    from molly_tpu.models import tiny_moe

    cfg = FusionConfig(
        text=tiny_moe(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=8),
        dna_rna=tiny_esm(vocab_size=16), protein=tiny_esm(vocab_size=20),
        dna_rna_k_tokens=4, protein_k_tokens=4)
    params = fusion.init_params(cfg, jax.random.key(6))
    gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    bucket, n, n_slots = 16, 6, 2
    ids, mask = _queue(n, bucket, seed=11)
    plain = run_offline(params, cfg, gen, ids, mask, n_slots=n_slots,
                        max_len=64, admit_group=2)
    spec = run_offline(params, cfg, gen, ids, mask, n_slots=n_slots,
                       max_len=64, admit_group=2, spec_lookup=3)
    for i in range(n):
        np.testing.assert_array_equal(
            spec["tokens"][i, :spec["lengths"][i]],
            plain["tokens"][i, :plain["lengths"][i]])


def test_offline_spec_adaptive_token_exact(setup):
    """Acceptance-adaptive ring (spec_threshold set): greedy outputs must
    equal the plain ring token-for-token REGARDLESS of where the
    spec/plain mode flips land — both tick types are token-exact, and the
    adaptive plain tick keeps the per-row dense ring columns + token
    history that the spec cycles rely on."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=16, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    bucket, n, n_slots = 16, 10, 4
    ids, mask = _queue(n, bucket, seed=5)
    plain = run_offline(params, cfg, gen, ids, mask, n_slots=n_slots,
                        max_len=96, admit_group=2)
    for thr in (0.2, 0.95):  # spec-mostly and plain-mostly policies
        adapt = run_offline(params, cfg, gen, ids, mask, n_slots=n_slots,
                            max_len=96, admit_group=2, spec_lookup=4,
                            spec_threshold=thr)
        np.testing.assert_array_equal(adapt["lengths"], plain["lengths"])
        for i in range(n):
            np.testing.assert_array_equal(
                adapt["tokens"][i, :adapt["lengths"][i]],
                plain["tokens"][i, :plain["lengths"][i]],
                err_msg=f"thr={thr} request {i}")
        assert adapt["spec_ticks"] >= 0
        assert adapt["spec_ema"] >= 0.0


def test_offline_spec_adaptive_flips_off_on_no_match(setup):
    """Sampled no-match workload (random prompts, temperature sampling on
    random weights: drafted n-grams almost never accepted): the
    acceptance EMA must decay below threshold and flip the ring to plain
    ticks — only the periodic probe chunks stay speculative."""
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=24, do_sample=True,
                           temperature=1.0, top_k=0, top_p=1.0,
                           repetition_penalty=1.0, eos_token_id=-1,
                           pad_token_id=0)
    bucket, n, n_slots = 16, 16, 4
    ids, mask = _queue(n, bucket, seed=9)
    out = run_offline(params, cfg, gen, ids, mask, n_slots=n_slots,
                      max_len=96, admit_group=4, spec_lookup=4,
                      spec_threshold=0.3)
    assert (out["lengths"] == 24).all()
    assert out["spec_ema"] < 0.3, out["spec_ema"]
    # most rounds must have run plain: spec rounds are the optimistic
    # start plus periodic probes, a strict minority
    assert 0 < out["spec_ticks"] < 0.5 * out["decode_ticks"], (
        out["spec_ticks"], out["decode_ticks"])


def test_spec_break_even_threshold_formula():
    """a* = (t_spec/t_plain - 1)/k, floored at 0 — pins the decisions at
    the two MEASURED round-4 operating points (benchmarks/README "in-ring
    speculation on the copy-trained workload"):
    - B=1 large-model decode is weight-bound: verifying k+1 tokens costs
      ~one plain tick (ratio ~1.1) -> tiny threshold, spec ON at any
      real span-quoting acceptance;
    - 32-slot 0.6B: the (k+1)-wide verify turns compute-bound — measured
      tick-cost ratio ~2.1 (also visible as the 4,024-vs-1,814
      zero-acceptance floor, ratio 2.2). Copy-trained run: 18,194 useful
      over 310 rounds x 32 rows -> 1.83 tokens/round/row -> acceptance
      a = 0.83/8 ~ 0.10, BELOW the 0.1375 break-even -> spec correctly
      OFF (matching the measured 6,105-vs-6,788 loss)."""
    from molly_tpu.inference.offline import spec_break_even_threshold
    k = 8
    # weight-bound point: ratio 1.1 -> threshold ~0.0125 -> spec ON for
    # any acceptance the shadow estimator would report on a copy workload
    thr = spec_break_even_threshold(1.0, 1.1, k)
    assert 0.0 < thr < 0.05
    # compute-bound point: measured ratio 2.1 -> threshold 0.1375, above
    # the measured copy-workload acceptance (~0.10) -> spec OFF
    thr32 = spec_break_even_threshold(1.0, 2.1, k)
    a_meas = (18194 / (310 * 32) - 1) / k
    assert abs(thr32 - 0.1375) < 1e-9
    assert thr32 > a_meas, (thr32, a_meas)
    # degenerate: spec cheaper than plain -> always on
    assert spec_break_even_threshold(1.0, 0.9, k) == 0.0


def test_calibrate_spec_threshold_runs(setup):
    """End-to-end calibration on CPU: returns a finite threshold and the
    measured tick costs; the calibrated value feeds run_offline."""
    from molly_tpu.inference.offline import calibrate_spec_threshold
    cfg, params = setup
    gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=-1,
                           pad_token_id=0)
    cal = calibrate_spec_threshold(params, cfg, gen, n_slots=4, max_len=64,
                                   bucket=16, spec_k=4, cal_tokens=8)
    assert np.isfinite(cal["threshold"]) and cal["threshold"] >= 0.0
    assert cal["t_plain_tick"] > 0 and cal["t_spec_round"] > 0
    ids, mask = _queue(4, 16, seed=3)
    out = run_offline(params, cfg, gen, ids, mask, n_slots=4, max_len=64,
                      spec_lookup=4, spec_threshold=cal["threshold"])
    assert (out["lengths"] == 8).all()
