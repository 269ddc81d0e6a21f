"""Speculative decoding: token-exact parity with target-only greedy
generation, for both a perfect draft (same model) and a disagreeing draft
(different random model), plus EOS semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from molly_tpu.inference.engine import GenerationConfig, _generate_from_embeds
from molly_tpu.inference.speculative import generate_speculative
from molly_tpu.models import qwen3, tiny_qwen3


@pytest.fixture(scope="module")
def models():
    cfg = tiny_qwen3(num_hidden_layers=2, vocab_size=128)
    target = qwen3.init_params(cfg, jax.random.key(0))
    draft_cfg = tiny_qwen3(num_hidden_layers=1, vocab_size=128,
                           hidden_size=32, intermediate_size=64)
    draft = qwen3.init_params(draft_cfg, jax.random.key(9))
    return cfg, target, draft_cfg, draft


def _target_greedy(params, cfg, ids, gen):
    embeds = qwen3.embed_tokens(params, ids)
    mask = jnp.ones(ids.shape, jnp.int32)
    return np.asarray(_generate_from_embeds(
        params, cfg, embeds, mask, gen, jax.random.key(0)))


@pytest.mark.parametrize("k", [1, 3, 4])
def test_perfect_draft_matches_greedy(models, k):
    cfg, target, _, _ = models
    gen = GenerationConfig(max_new_tokens=10, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=-1,
                           pad_token_id=0)
    ids = jnp.asarray(
        np.random.default_rng(1).integers(2, 128, (1, 9)), jnp.int32)
    ref = _target_greedy(target, cfg, ids, gen)
    got = np.asarray(generate_speculative(target, cfg, target, cfg, ids,
                                          gen, k=k))
    np.testing.assert_array_equal(got, ref)


def test_disagreeing_draft_still_exact(models):
    cfg, target, draft_cfg, draft = models
    gen = GenerationConfig(max_new_tokens=12, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=-1,
                           pad_token_id=0)
    ids = jnp.asarray(
        np.random.default_rng(2).integers(2, 128, (1, 7)), jnp.int32)
    ref = _target_greedy(target, cfg, ids, gen)
    got = np.asarray(generate_speculative(target, cfg, draft, draft_cfg,
                                          ids, gen, k=3))
    np.testing.assert_array_equal(got, ref)


def test_eos_stops_and_pads(models):
    cfg, target, draft_cfg, draft = models
    gen0 = GenerationConfig(max_new_tokens=12, do_sample=False,
                            repetition_penalty=1.0, eos_token_id=-1,
                            pad_token_id=0)
    ids = jnp.asarray(
        np.random.default_rng(3).integers(2, 128, (1, 8)), jnp.int32)
    free = _target_greedy(target, cfg, ids, gen0)[0]
    eos = int(free[3])
    gen = GenerationConfig(max_new_tokens=12, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=eos,
                           pad_token_id=0)
    ref = _target_greedy(target, cfg, ids, gen)
    got = np.asarray(generate_speculative(target, cfg, draft, draft_cfg,
                                          ids, gen, k=3))
    np.testing.assert_array_equal(got, ref)


def _sample_gen(T=6):
    return GenerationConfig(max_new_tokens=T, do_sample=True,
                            temperature=0.8, top_p=0.95, top_k=10,
                            repetition_penalty=1.1, eos_token_id=-1,
                            pad_token_id=0)


def test_sampled_perfect_draft_accepts_everything(models):
    """With draft == target the acceptance ratio is exactly 1: every draft
    token is accepted in every round."""
    cfg, target, _, _ = models
    gen = _sample_gen()
    ids = jnp.asarray(
        np.random.default_rng(5).integers(2, 128, (1, 8)), jnp.int32)
    _, n_rounds, n_acc = generate_speculative(
        target, cfg, target, cfg, ids, gen, k=3,
        rng=jax.random.key(7), return_stats=True)
    assert int(n_acc) == 3 * int(n_rounds)


@pytest.mark.parametrize("use_other_draft", [False, True])
def test_sampled_distribution_matches_engine(models, use_other_draft):
    """The marginal distribution of the first two generated tokens matches
    target-only sampling (speculative sampling's exactness guarantee),
    both with a perfect draft (always accept) and a disagreeing draft
    (rejection + residual path)."""
    cfg, target, draft_cfg, draft = models
    gen = _sample_gen(T=2)
    ids = jnp.asarray(
        np.random.default_rng(6).integers(2, 128, (1, 8)), jnp.int32)
    embeds = qwen3.embed_tokens(target, ids)
    mask = jnp.ones(ids.shape, jnp.int32)

    n = 600
    ref = np.stack([np.asarray(_generate_from_embeds(
        target, cfg, embeds, mask, gen, jax.random.key(1000 + i)))[0]
        for i in range(n)])
    d_params, d_cfg = (draft, draft_cfg) if use_other_draft else (
        target, cfg)
    got = np.stack([np.asarray(generate_speculative(
        target, cfg, d_params, d_cfg, ids, gen, k=2,
        rng=jax.random.key(2000 + i)))[0] for i in range(n)])

    V = 128
    for pos in range(2):
        f_ref = np.bincount(ref[:, pos], minlength=V) / n
        f_got = np.bincount(got[:, pos], minlength=V) / n
        tv = 0.5 * np.abs(f_ref - f_got).sum()
        # empirical-TV noise floor at n=600 is ~0.07 (pos 0) and ~0.11
        # (pos 1: wider support); verified to converge (0.021 / 0.052 at
        # n=3000), so 0.16 separates noise from a real distribution bug
        assert tv < 0.16, (pos, tv)


def test_fusion_prompt_speculative(models):
    """Speculative decode from injected fusion embeddings (omics prompt)
    matches the engine's greedy generation on the same embeddings."""
    from molly_tpu.models import fusion, tiny_esm
    from molly_tpu.models.fusion import FusionConfig

    cfg, target, _, _ = models
    fcfg = FusionConfig(text=cfg, dna_rna=tiny_esm(vocab_size=16),
                        protein=tiny_esm(vocab_size=20),
                        dna_rna_k_tokens=4, protein_k_tokens=4)
    params = fusion.init_params(fcfg, jax.random.key(2))
    params["text"] = target
    rng = np.random.default_rng(8)
    S = 12
    batch = {
        "input_ids": jnp.asarray(rng.integers(2, 128, (1, S)), jnp.int32),
        "dna_rna_tokens": jnp.asarray(rng.integers(2, 16, (1, 1, 4)),
                                      jnp.int32),
        "dna_rna_pos": jnp.asarray([[3]], jnp.int32),
        "protein_tokens": jnp.full((1, 1, 4), 1, jnp.int32),
        "protein_pos": jnp.asarray([[-1]], jnp.int32),
    }
    embeds = fusion.build_inputs_embeds(params, fcfg, batch)
    gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=-1,
                           pad_token_id=0)
    ref = np.asarray(_generate_from_embeds(
        target, cfg, embeds, jnp.ones((1, S), jnp.int32), gen,
        jax.random.key(0)))
    got = np.asarray(generate_speculative(
        target, cfg, target, cfg, gen=gen, k=3, inputs_embeds=embeds))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("use_other_draft", [False, True])
def test_greedy_with_repetition_penalty_matches_engine(models,
                                                       use_other_draft):
    """Greedy speculation under the engine's DEFAULT repetition penalty
    (1.1) is token-exact vs engine greedy: the penalty must be applied to
    draft, first-token, and verify argmaxes with per-position presence
    (advisor round-2 finding)."""
    cfg, target, draft_cfg, draft = models
    gen = GenerationConfig(max_new_tokens=12, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    ids = jnp.asarray(
        np.random.default_rng(11).integers(2, 128, (1, 9)), jnp.int32)
    ref = _target_greedy(target, cfg, ids, gen)
    d_params, d_cfg = (draft, draft_cfg) if use_other_draft else (
        target, cfg)
    got = np.asarray(generate_speculative(target, cfg, d_params, d_cfg,
                                          ids, gen, k=3))
    np.testing.assert_array_equal(got, ref)


def test_full_accept_leaves_no_draft_cache_hole(models):
    """With draft == target every round fully accepts (m == k); the draft
    cache must still hold REAL KV at every attended position, so the
    draft's proposals keep matching the target's argmaxes in later rounds
    (advisor round-2 finding: a garbage row per full-accept round)."""
    cfg, target, _, _ = models
    gen = GenerationConfig(max_new_tokens=16, do_sample=False,
                           repetition_penalty=1.1, eos_token_id=-1,
                           pad_token_id=0)
    ids = jnp.asarray(
        np.random.default_rng(12).integers(2, 128, (1, 6)), jnp.int32)
    out, n_rounds, n_acc = generate_speculative(
        target, cfg, target, cfg, ids, gen, k=4, return_stats=True)
    # a perfect draft with an intact cache accepts ALL k drafts each round
    assert int(n_acc) == 4 * int(n_rounds), (int(n_acc), int(n_rounds))
    np.testing.assert_array_equal(np.asarray(out),
                                  _target_greedy(target, cfg, ids, gen))


# ---------------------------------------------------------------------------
# Prompt-lookup (n-gram) drafting — no draft model
# ---------------------------------------------------------------------------

def test_lookup_drafts_unit():
    """The draft is the continuation of the MOST RECENT prior occurrence
    of the trailing n-gram; no match proposes the (pad) slice at L."""
    from molly_tpu.inference.speculative import _lookup_drafts
    #        0  1  2  3  4  5  6  7   8   9
    hist = jnp.asarray([5, 6, 7, 9, 5, 6, 8, 5, 6, 0, 0, 0], jnp.int32)
    # history length 9, trailing 2-gram (5, 6) occurs at 0-1 and 4-5;
    # most recent prior ends at index 5 -> draft = hist[6:6+3] = [8, 5, 6]
    drafts = _lookup_drafts(hist, jnp.int32(9), 12, n=2, k=3)
    np.testing.assert_array_equal(np.asarray(drafts), [8, 5, 6])
    # no prior occurrence of (6, 8): slice at L -> pads
    hist2 = jnp.asarray([1, 2, 3, 4, 6, 8, 0, 0, 0, 0, 0, 0], jnp.int32)
    drafts2 = _lookup_drafts(hist2, jnp.int32(6), 12, n=2, k=3)
    np.testing.assert_array_equal(np.asarray(drafts2), [0, 0, 0])


@pytest.mark.parametrize("rep_pen", [1.0, 1.1])
def test_lookup_greedy_exact(models, rep_pen):
    """Greedy lookup speculation is token-exact vs engine greedy (the
    verify corrects every miss), including under repetition penalty."""
    from molly_tpu.inference.speculative import generate_lookup
    cfg, target, _, _ = models
    gen = GenerationConfig(max_new_tokens=12, do_sample=False,
                           repetition_penalty=rep_pen, eos_token_id=-1,
                           pad_token_id=0)
    rng = np.random.default_rng(21)
    pat = rng.integers(2, 128, 4)
    ids = jnp.asarray(np.concatenate([pat, pat, pat])[None], jnp.int32)
    ref = _target_greedy(target, cfg, ids, gen)
    got = np.asarray(generate_lookup(target, cfg, ids, gen, k=4, n=2))
    np.testing.assert_array_equal(got, ref)


def test_lookup_eos_stops_and_pads(models):
    from molly_tpu.inference.speculative import generate_lookup
    cfg, target, _, _ = models
    gen0 = GenerationConfig(max_new_tokens=12, do_sample=False,
                            repetition_penalty=1.0, eos_token_id=-1,
                            pad_token_id=0)
    ids = jnp.asarray(
        np.random.default_rng(3).integers(2, 128, (1, 8)), jnp.int32)
    free = _target_greedy(target, cfg, ids, gen0)[0]
    eos = int(free[3])
    gen = GenerationConfig(max_new_tokens=12, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=eos,
                           pad_token_id=0)
    ref = _target_greedy(target, cfg, ids, gen)
    got = np.asarray(generate_lookup(target, cfg, ids, gen, k=3, n=2))
    np.testing.assert_array_equal(got, ref)


def test_lookup_sampled_distribution_matches_engine(models):
    """Point-mass-q rejection sampling stays distribution-exact: the
    marginal of the first two sampled tokens matches target-only
    sampling."""
    from molly_tpu.inference.speculative import generate_lookup
    cfg, target, _, _ = models
    gen = _sample_gen(T=2)
    ids = jnp.asarray(
        np.random.default_rng(6).integers(2, 128, (1, 8)), jnp.int32)
    embeds = qwen3.embed_tokens(target, ids)
    mask = jnp.ones(ids.shape, jnp.int32)
    n = 600
    ref = np.stack([np.asarray(_generate_from_embeds(
        target, cfg, embeds, mask, gen, jax.random.key(1000 + i)))[0]
        for i in range(n)])
    got = np.stack([np.asarray(generate_lookup(
        target, cfg, ids, gen, k=2, n=2,
        rng=jax.random.key(2000 + i)))[0] for i in range(n)])
    V = 128
    for pos in range(2):
        f_ref = np.bincount(ref[:, pos], minlength=V) / n
        f_got = np.bincount(got[:, pos], minlength=V) / n
        tv = 0.5 * np.abs(f_ref - f_got).sum()
        assert tv < 0.16, (pos, tv)


def test_lookup_fusion_prompt(models):
    """Lookup speculation from injected fusion embeddings (ids carried
    alongside for history matching) matches engine greedy."""
    from molly_tpu.inference.speculative import generate_lookup
    from molly_tpu.models import fusion, tiny_esm
    from molly_tpu.models.fusion import FusionConfig

    cfg, target, _, _ = models
    fcfg = FusionConfig(text=cfg, dna_rna=tiny_esm(vocab_size=16),
                        protein=tiny_esm(vocab_size=20),
                        dna_rna_k_tokens=4, protein_k_tokens=4)
    params = fusion.init_params(fcfg, jax.random.key(2))
    params["text"] = target
    rng = np.random.default_rng(8)
    S = 12
    batch = {
        "input_ids": jnp.asarray(rng.integers(2, 128, (1, S)), jnp.int32),
        "dna_rna_tokens": jnp.asarray(rng.integers(2, 16, (1, 1, 4)),
                                      jnp.int32),
        "dna_rna_pos": jnp.asarray([[3]], jnp.int32),
        "protein_tokens": jnp.full((1, 1, 4), 1, jnp.int32),
        "protein_pos": jnp.asarray([[-1]], jnp.int32),
    }
    embeds = fusion.build_inputs_embeds(params, fcfg, batch)
    gen = GenerationConfig(max_new_tokens=8, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=-1,
                           pad_token_id=0)
    ref = np.asarray(_generate_from_embeds(
        target, cfg, embeds, jnp.ones((1, S), jnp.int32), gen,
        jax.random.key(0)))
    got = np.asarray(generate_lookup(
        target, cfg, batch["input_ids"], gen=gen, k=3, n=2,
        inputs_embeds=embeds))
    np.testing.assert_array_equal(got, ref)


def test_lookup_accepts_on_learned_copy_task():
    """POSITIVE acceptance proof: a tiny model trained to continue a
    fixed periodic stream makes lookup drafting accept nearly every
    proposal (the workload shape molly serves: outputs that quote spans
    of the input). Verifies rounds ~= T/(k+1) instead of T."""
    import optax
    from molly_tpu.inference.speculative import generate_lookup

    cfg = tiny_qwen3(num_hidden_layers=2, vocab_size=32)
    params = qwen3.init_params(cfg, jax.random.key(3))
    pat = jnp.asarray([7, 3, 11, 19, 5, 23, 2, 13], jnp.int32)
    seq = jnp.tile(pat, 8)[None]  # [1, 64] periodic stream

    def loss_fn(p):
        logits = qwen3.forward_logits(
            p, cfg, inputs_embeds=qwen3.embed_tokens(p, seq[:, :-1]),
            attention_mask=jnp.ones((1, 63), jnp.int32))
        ll = jax.nn.log_softmax(logits[0].astype(jnp.float32))
        return -jnp.mean(ll[jnp.arange(63), seq[0, 1:]])

    opt = optax.adamw(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    for _ in range(150):
        params, state, loss = step(params, state)
    assert float(loss) < 0.1, f"copy task did not train: loss={loss}"

    gen = GenerationConfig(max_new_tokens=24, do_sample=False,
                           repetition_penalty=1.0, eos_token_id=-1,
                           pad_token_id=0)
    ids = jnp.tile(pat, 3)[None]  # 24-token prompt, 3 periods
    ref = _target_greedy(params, cfg, ids, gen)
    out, n_rounds, n_acc = generate_lookup(
        params, cfg, ids, gen, k=5, n=3, return_stats=True)
    np.testing.assert_array_equal(np.asarray(out), ref)
    # a trained copier + periodic history: near-full acceptance
    assert int(n_rounds) <= 6, int(n_rounds)   # vs 24 target-only steps
    assert int(n_acc) >= 4 * int(n_rounds) - 4


def test_inference_cli_lookup_matches_engine(tmp_path):
    """--decoding lookup produces the same greedy JSONL outputs as the
    batch engine through the real CLI (tiny model, tiny parquet)."""
    import json
    from test_train_cli import _toy_parquet
    from molly_tpu.inference.cli import main as infer_main

    data = str(tmp_path / "d.parquet")
    _toy_parquet(data, 4)
    common = [
        "--input-file", data, "--tiny", "--greedy",
        "--max-length", "256", "--max-new-tokens", "6",
        "--dna-rna-k-tokens", "4", "--protein-k-tokens", "4",
        "--batch-size", "2",
    ]
    eng_out = str(tmp_path / "engine.jsonl")
    infer_main(common + ["--output-file", eng_out])
    lk_out = str(tmp_path / "lookup.jsonl")
    infer_main(common + ["--output-file", lk_out, "--decoding", "lookup",
                         "--lookup-k", "3", "--lookup-n", "2"])

    eng = [json.loads(l) for l in open(eng_out)]
    lk = [json.loads(l) for l in open(lk_out)]
    assert len(eng) == len(lk) == 4
    e_by_input = {r["input"]: r for r in eng}
    for r in lk:
        assert r["decoded_output"] == e_by_input[r["input"]]["decoded_output"]
