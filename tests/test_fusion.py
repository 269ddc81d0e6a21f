"""Fusion model tests: injection semantics + end-to-end parity against a
torch composition that follows the reference OmicsOne flow
(/root/reference/src/model/omics_one.py:49-185): embed -> encoder ->
project -> in-place overwrite -> decoder on inputs_embeds."""

from contextlib import contextmanager

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from molly_tpu.models import fusion
from molly_tpu.models.fusion import FusionConfig
from molly_tpu.models.hf_import import (
    esm_cfg_from_hf_config,
    esm_from_hf,
    qwen3_cfg_from_hf_config,
    qwen3_from_hf,
)
from molly_tpu.data.omics_dataset import LABEL_IGNORE


@contextmanager
def enable_x64():
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)


def test_inject_scatter():
    hidden = jnp.zeros((2, 10, 4))
    emb = jnp.ones((2, 2, 3, 4))  # G=2 segments of K=3
    emb = emb * jnp.arange(1, 5)[None, None, None, :]
    pos = jnp.array([[2, -1], [0, 5]])  # sample0: one active; sample1: two
    out = fusion.inject(hidden, emb, pos)
    out = np.asarray(out)
    # sample 0: rows 3,4,5 written; everything else zero
    assert (out[0, 3:6] == np.arange(1, 5)).all()
    assert (out[0, :3] == 0).all() and (out[0, 6:] == 0).all()
    # sample 1: rows 1..3 and 6..8 written
    assert (out[1, 1:4] == np.arange(1, 5)).all()
    assert (out[1, 6:9] == np.arange(1, 5)).all()
    assert (out[1, 0] == 0).all() and (out[1, 4:6] == 0).all()
    assert (out[1, 9] == 0).all()


def test_inject_overflow_dropped():
    hidden = jnp.zeros((1, 6, 2))
    emb = jnp.ones((1, 1, 4, 2))
    pos = jnp.array([[4]])  # start+1+K = 5..8 exceeds S=6 -> partial write
    out = np.asarray(fusion.inject(hidden, emb, pos))
    assert (out[0, 5] == 1).all()
    assert (out[0, :5] == 0).all()


def _build_torch_reference():
    from transformers import (EsmConfig, EsmForMaskedLM, Qwen3Config,
                              Qwen3ForCausalLM)

    torch.manual_seed(7)
    qcfg = Qwen3Config(
        vocab_size=300, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=True, attn_implementation="eager")
    qwen = Qwen3ForCausalLM(qcfg).eval()
    ecfg_d = EsmConfig(
        vocab_size=32, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4,
        position_embedding_type="rotary", token_dropout=True,
        emb_layer_norm_before=False, mask_token_id=2, pad_token_id=1,
        max_position_embeddings=64, attn_implementation="eager",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    dna = EsmForMaskedLM(ecfg_d).eval()
    ecfg_p = EsmConfig(
        vocab_size=33, hidden_size=40, intermediate_size=80,
        num_hidden_layers=2, num_attention_heads=4,
        position_embedding_type="rotary", token_dropout=True,
        emb_layer_norm_before=False, mask_token_id=32, pad_token_id=1,
        max_position_embeddings=64, attn_implementation="eager",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    prot = EsmForMaskedLM(ecfg_p).eval()
    dproj = torch.nn.Linear(48, 64)
    pproj = torch.nn.Linear(40, 64)
    return qwen, qcfg, dna, ecfg_d, prot, ecfg_p, dproj, pproj


def test_fusion_logit_parity_x64():
    qwen, qcfg, dna, ecfg_d, prot, ecfg_p, dproj, pproj = \
        _build_torch_reference()
    K = 4
    B, S = 2, 24
    rng = np.random.default_rng(11)
    ids = rng.integers(0, 300, (B, S))
    am = np.ones((B, S), dtype=np.int64)

    # segments: sample0 has 1 dna (start 2) + 1 protein (start 10);
    # sample1 has 1 dna (start 5); second slots inactive
    dna_tokens = np.full((B, 2, K), 1, dtype=np.int64)
    dna_tokens[0, 0] = [3, 7, 8, 9]
    dna_tokens[1, 0] = [3, 12, 1, 1]  # shorter seq, padded
    dna_pos = np.array([[2, -1], [5, -1]])
    prot_tokens = np.full((B, 1, K), 1, dtype=np.int64)
    prot_tokens[0, 0] = [0, 5, 6, 2]
    prot_pos = np.array([[10], [-1]])

    # ---- torch reference flow (OmicsOne semantics) ----
    for m in (qwen, dna, prot, dproj, pproj):
        m.double()
    with torch.no_grad():
        hidden = qwen.model.embed_tokens(torch.tensor(ids))
        for (toks, poss, enc, proj) in ((dna_tokens, dna_pos, dna, dproj),
                                        (prot_tokens, prot_pos, prot, pproj)):
            for b in range(B):
                for g in range(toks.shape[1]):
                    if poss[b, g] < 0:
                        continue
                    t = torch.tensor(toks[b, g][None])
                    mask = (t != 1).long()
                    out = enc.esm(t, attention_mask=mask).last_hidden_state
                    emb = proj(out)[0]
                    s = poss[b, g]
                    hidden[b, s + 1 : s + 1 + K] = emb
        ref = qwen(inputs_embeds=hidden,
                   attention_mask=torch.tensor(am)).logits.numpy()

    # ---- molly_tpu flow ----
    with enable_x64():
        tcfg = qwen3_cfg_from_hf_config(qcfg, dtype="float64")
        dcfg = esm_cfg_from_hf_config(ecfg_d, dtype="float64")
        pcfg = esm_cfg_from_hf_config(ecfg_p, dtype="float64")
        cfg = FusionConfig(text=tcfg, dna_rna=dcfg, protein=pcfg,
                           dna_rna_k_tokens=K, protein_k_tokens=K)
        params = {
            "text": qwen3_from_hf(qwen.state_dict(), tcfg, dtype="float64"),
            "dna_rna": esm_from_hf(dna.state_dict(), dcfg, dtype="float64"),
            "protein": esm_from_hf(prot.state_dict(), pcfg, dtype="float64"),
            "dna_rna_projector": {
                "kernel": jnp.asarray(
                    dproj.weight.detach().numpy().T),
                "bias": jnp.asarray(dproj.bias.detach().numpy()),
            },
            "protein_projector": {
                "kernel": jnp.asarray(pproj.weight.detach().numpy().T),
                "bias": jnp.asarray(pproj.bias.detach().numpy()),
            },
        }
        batch = {
            "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.asarray(am),
            "dna_rna_tokens": jnp.asarray(dna_tokens),
            "dna_rna_pos": jnp.asarray(dna_pos),
            "protein_tokens": jnp.asarray(prot_tokens),
            "protein_pos": jnp.asarray(prot_pos),
        }
        got = np.asarray(fusion.forward_logits(params, cfg, batch))

    diff = np.abs(ref - got).max()
    assert diff < 1e-5, f"max |Δlogit| = {diff}"


def test_cross_entropy_loss_and_domain():
    rng = np.random.default_rng(0)
    B, S, V = 3, 6, 11
    logits = jnp.asarray(rng.normal(size=(B, S, V)).astype(np.float32))
    labels = np.full((B, S), LABEL_IGNORE, dtype=np.int32)
    labels[0, 2:5] = [1, 2, 3]
    labels[1, 4:6] = [4, 5]
    # sample 2 fully unsupervised
    task_label = jnp.asarray([0, 19, 100])

    loss, metrics = fusion.cross_entropy_loss(
        logits, jnp.asarray(labels), task_label=task_label)

    # manual
    lg = np.asarray(logits)[:, :-1]
    lb = labels[:, 1:]
    lse = np.log(np.exp(lg).sum(-1))
    nlls, count = 0.0, 0
    per_sample = np.zeros(B)
    for b in range(B):
        tot, n = 0.0, 0
        for s in range(S - 1):
            if lb[b, s] != LABEL_IGNORE:
                tot += lse[b, s] - lg[b, s, lb[b, s]]
                n += 1
        nlls += tot
        count += n
        per_sample[b] = tot / max(n, 1)
    np.testing.assert_allclose(float(loss), nlls / count, rtol=1e-5)
    assert int(metrics["tokens"]) == count
    ds = np.asarray(metrics["domain_loss_sum"])
    dc = np.asarray(metrics["domain_loss_count"])
    np.testing.assert_allclose(ds[0], per_sample[0], rtol=1e-5)
    np.testing.assert_allclose(ds[19], per_sample[1], rtol=1e-5)
    np.testing.assert_allclose(ds[20], per_sample[2], rtol=1e-5)  # unknown
    assert dc[0] == 1 and dc[19] == 1 and dc[20] == 1 and dc[1:19].sum() == 0


def test_inject_many_mixed_segments():
    """Stress: 4 DNA + 3 protein segments per sample, interleaved, with
    inactive slots — one compiled graph regardless of layout."""
    import jax

    from molly_tpu.models import fusion as F
    from molly_tpu.models import tiny_esm, tiny_qwen3

    cfg = FusionConfig(
        text=tiny_qwen3(vocab_size=128, hidden_size=32,
                        intermediate_size=64, num_hidden_layers=1,
                        num_attention_heads=2, num_key_value_heads=1,
                        head_dim=16),
        dna_rna=tiny_esm(vocab_size=16), protein=tiny_esm(vocab_size=20),
        dna_rna_k_tokens=3, protein_k_tokens=3)
    params = F.init_params(cfg, jax.random.key(0))
    B, S, K = 2, 64, 3
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 128, (B, S))),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "dna_rna_tokens": jnp.asarray(rng.integers(6, 16, (B, 4, K))),
        # sample 0: 4 active at 0,5,10,15; sample 1: 2 active
        "dna_rna_pos": jnp.asarray([[0, 5, 10, 15], [3, 40, -1, -1]]),
        "protein_tokens": jnp.asarray(rng.integers(4, 20, (B, 3, K))),
        "protein_pos": jnp.asarray([[20, 30, 44], [-1, -1, -1]]),
    }
    emb = F.build_inputs_embeds(params, cfg, batch)
    assert np.isfinite(np.asarray(emb, dtype=np.float32)).all()
    base = qwen3_embed(params, batch["input_ids"])
    changed = np.abs(np.asarray(emb) - np.asarray(base)).sum(axis=-1) > 1e-6
    # sample 0: rows 1..4, 6..9, 11..14, 16..19 (dna) + 21..24,31..34,45..48
    for start in (0, 5, 10, 15, 20, 30, 44):
        assert changed[0, start + 1 : start + 1 + K].all(), start
    assert not changed[0, 50:].any()
    # sample 1: only two dna segments
    for start in (3, 40):
        assert changed[1, start + 1 : start + 1 + K].all(), start
    assert not changed[1, 50:].any()


def qwen3_embed(params, ids):
    from molly_tpu.models import qwen3 as q
    return q.embed_tokens(params["text"], ids)
