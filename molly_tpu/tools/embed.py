"""Embedding/visualization tool — the reference embed_text.py equivalent
(/root/reference/src/embed_text.py:92-319): every sample becomes
concat(text last-real-token hidden || mean-pooled DNA/RNA encoder states ||
mean-pooled protein encoder states); saved as embeddings.npy plus a 2-D
PCA projection parquet (replacing the cuML-GPU UMAP side-dependency with a
dependency-free JAX PCA; SURVEY.md §2.3).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np


def embed_batch(params, cfg, batch) -> np.ndarray:
    """[B, H_text + H_dna + H_prot] embedding for one collated batch."""
    return np.asarray(_embed_batch_jit(params, cfg, batch))


import functools


@functools.lru_cache(maxsize=None)
def _get_embed_fn(cfg):
    import jax

    return jax.jit(lambda p, b: _embed_batch_impl(p, cfg, b))


def _embed_batch_jit(params, cfg, batch):
    return _get_embed_fn(cfg)(params, batch)


def _embed_batch_impl(params, cfg, batch):
    import jax.numpy as jnp

    from ..models import esm, fusion, qwen3

    embeds = fusion.build_inputs_embeds(params, cfg, batch)
    hidden, _ = qwen3.forward_hidden(
        params["text"], cfg.text, inputs_embeds=embeds,
        attention_mask=batch["attention_mask"])
    # last real token pool (right-padded train layout)
    last_idx = jnp.maximum(jnp.sum(batch["attention_mask"], axis=1) - 1, 0)
    text_pool = jnp.take_along_axis(
        hidden, last_idx[:, None, None].astype(jnp.int32), axis=1)[:, 0]

    def pooled(enc_name, enc_cfg, tokens):
        B, G, K = tokens.shape
        flat = tokens.reshape(B * G, K)
        mask = (flat != 1).astype(jnp.int32)
        mask = mask.at[:, 0].set(1)
        h = esm.forward_hidden(params[enc_name], enc_cfg, flat, mask)
        m = mask[..., None].astype(h.dtype)
        mean = jnp.sum(h * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1)
        return jnp.mean(mean.reshape(B, G, -1), axis=1)

    dna_pool = pooled("dna_rna", cfg.dna_rna, batch["dna_rna_tokens"])
    prot_pool = pooled("protein", cfg.protein, batch["protein_tokens"])
    return jnp.concatenate([text_pool.astype(jnp.float32),
                            dna_pool.astype(jnp.float32),
                            prot_pool.astype(jnp.float32)], axis=-1)


def pca_2d(x: np.ndarray) -> np.ndarray:
    """Standardize + project to 2 principal components (replaces
    StandardScaler + cuML UMAP, embed_text.py:301-319)."""
    mu = x.mean(0, keepdims=True)
    sd = x.std(0, keepdims=True) + 1e-8
    z = (x - mu) / sd
    _, _, vt = np.linalg.svd(z, full_matrices=False)
    return z @ vt[:2].T


def run_embedding(dataset, params, cfg, out_dir: str,
                  batch_size: int = 16) -> Dict[str, Any]:
    import jax.numpy as jnp

    from ..data.collate import iterate_batches

    os.makedirs(out_dir, exist_ok=True)
    chunks, tasks = [], []
    for batch in iterate_batches(dataset, batch_size, drop_last=False):
        arrs = {k: jnp.asarray(v) for k, v in batch.items()
                if not isinstance(v, list)}
        chunks.append(embed_batch(params, cfg, arrs))
        tasks.extend([""] * chunks[-1].shape[0])
    emb = np.concatenate(chunks, axis=0)
    np.save(os.path.join(out_dir, "embeddings.npy"), emb)

    proj = pca_2d(emb)
    import pandas as pd
    pd.DataFrame({"x": proj[:, 0], "y": proj[:, 1]}).to_parquet(
        os.path.join(out_dir, "projection_2d.parquet"))
    return {"n": emb.shape[0], "dim": emb.shape[1], "out_dir": out_dir}
