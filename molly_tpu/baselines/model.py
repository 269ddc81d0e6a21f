"""Encoder + classification-head baselines — the reference BackboneWithClsHead
equivalents (/root/reference/baselines/model.py:33-215) in JAX.

Six model types: NT, ESM, NT+ESM, NT+NT, ESM+ESM (CLS embeddings, concat
for pairs) over frozen ESM-family backbones + one trainable linear head;
CE loss, or BCE-with-logits for multi-answer tasks (:190-197). The EVO
(Evo2 CUDA) variant is a documented non-goal (SURVEY.md §7).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models import esm
from ..models.configs import EsmConfig

MODEL_TYPES = ("NT", "ESM", "NT+ESM", "NT+NT", "ESM+ESM")


@dataclass(frozen=True)
class BaselineConfig:
    model_type: str = "NT"
    nt: Optional[EsmConfig] = None
    protein: Optional[EsmConfig] = None
    num_labels: int = 2
    multi_answer: bool = False  # BCE-with-logits over multihot labels

    def encoder_cfgs(self) -> Tuple[EsmConfig, Optional[EsmConfig]]:
        t = self.model_type
        if t == "NT":
            return self.nt, None
        if t == "ESM":
            return self.protein, None
        if t == "NT+ESM":
            return self.nt, self.protein
        if t == "NT+NT":
            return self.nt, self.nt
        if t == "ESM+ESM":
            return self.protein, self.protein
        raise ValueError(f"invalid model_type {t!r}")


def init_params(cfg: BaselineConfig, key: jax.Array) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    c1, c2 = cfg.encoder_cfgs()
    dim = c1.hidden_size + (c2.hidden_size if c2 else 0)
    bound = dim ** -0.5
    params: Dict[str, Any] = {
        "enc1": esm.init_params(c1, k1),
        "head": {
            "kernel": jax.random.uniform(k3, (dim, cfg.num_labels),
                                         jnp.float32, -bound, bound),
            "bias": jnp.zeros((cfg.num_labels,), jnp.float32),
        },
    }
    if c2 is not None:
        # NT+NT / ESM+ESM use two *independent* copies (deepcopy in the
        # reference, model.py:67,71); NT+ESM two different encoders
        params["enc2"] = esm.init_params(c2, k2)
    return params


def _cls_embedding(enc_params, enc_cfg: EsmConfig, ids, mask):
    h = esm.forward_hidden(enc_params, enc_cfg, ids, mask)
    return h[:, 0]  # [CLS]


def forward_logits(params, cfg: BaselineConfig, batch) -> jnp.ndarray:
    c1, c2 = cfg.encoder_cfgs()
    h = _cls_embedding(params["enc1"], c1, batch["x1"], batch["mask1"])
    if c2 is not None:
        h2 = _cls_embedding(params["enc2"], c2, batch["x2"], batch["mask2"])
        h = jnp.concatenate([h, h2], axis=-1)
    head = params["head"]
    return h.astype(jnp.float32) @ head["kernel"] + head["bias"]


def loss_fn(params, cfg: BaselineConfig, batch):
    logits = forward_logits(params, cfg, batch)
    labels = batch["labels"]
    if cfg.multi_answer:
        labels = labels.astype(jnp.float32)
        logp = jax.nn.log_sigmoid(logits)
        lognp = jax.nn.log_sigmoid(-logits)
        loss = -jnp.mean(labels * logp + (1 - labels) * lognp)
    else:
        lse = jax.nn.logsumexp(logits, axis=-1)
        tgt = jnp.take_along_axis(logits, labels[:, None], 1)[:, 0]
        loss = jnp.mean(lse - tgt)
    return loss, logits
