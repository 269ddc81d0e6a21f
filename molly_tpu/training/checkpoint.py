"""Checkpointing: Orbax for sharded train state + lightweight adapter export.

Reference behavior mirrored (SURVEY.md §5.4):
  - full-state save/resume with optimizer + step (HF Trainer/DeepSpeed did
    this via deepspeed_load_checkpoint, domain_loss.py:487-543)
  - LoRA runs export adapter + the two projectors separately so inference
    can recombine them with base checkpoints
    (/root/reference/src/trainer/omics_trainer.py:85-105,
    src/inference_lora.py:214-234)
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


# One long-lived async checkpointer for the process. Orbax's
# StandardCheckpointer IS an AsyncCheckpointer — save() returns once the
# device arrays are snapshotted and serializes to disk on a background
# thread — but only if it outlives the call: the previous implementation
# wrapped each save in `with StandardCheckpointer()`, whose __exit__ waits
# for completion, silently making every save synchronous (at 8B scale each
# save stalled the step loop for seconds; SURVEY.md §5.4 prescribes async).
_ASYNC_CKPTR = None


def _checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = _ocp().StandardCheckpointer()
    return _ASYNC_CKPTR


def _serializable_tree(tree):
    """Orbax writes a ``_sharding`` manifest next to the arrays; leaves
    carrying shardings it cannot serialize (e.g. GSPMDSharding, which
    jit sometimes assigns to outputs under a mesh) are silently OMITTED
    from the manifest ("Conversion ... has not been implemented"
    warnings), producing checkpoints that cannot be restored or even
    metadata-read without an exact target tree (NOT_FOUND on the
    manifest member). Normalize such leaves to host numpy before saving
    — single-process only; such leaves are rare (observed: LoRA
    optimizer moments) and small."""
    if jax.process_count() > 1:
        return tree

    def fix(x):
        if isinstance(x, jax.Array) and \
                type(x.sharding).__name__ == "GSPMDSharding":
            return np.asarray(x)
        return x

    return jax.tree.map(fix, tree)


def save_train_state(path: str, state, *, force: bool = True,
                     wait: bool = False) -> None:
    """Asynchronous save: returns as soon as the arrays are snapshotted;
    disk serialization overlaps subsequent train steps. Orbax internally
    waits for any prior in-flight save before starting a new one (at most
    one save buffers in memory). ``wait=True`` blocks until durable — use
    it for preemption checkpoints, where the process is about to die."""
    ckptr = _checkpointer()
    ckptr.save(os.path.abspath(path),
               _serializable_tree(
                   {"params": state.params, "opt_state": state.opt_state,
                    "step": state.step}), force=force)
    if wait:
        ckptr.wait_until_finished()


def wait_for_saves() -> None:
    """Barrier: block until every issued save is durable on disk. Call
    before process exit and before deleting rotated checkpoints."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def restore_train_state(path: str, state):
    """Restore into the structure (and shardings) of ``state``."""
    ocp = _ocp()
    wait_for_saves()  # the path may still be writing
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        target = {"params": state.params, "opt_state": state.opt_state,
                  "step": state.step}
        restored = ckptr.restore(path, target)
    return type(state)(params=restored["params"],
                       opt_state=restored["opt_state"],
                       step=restored["step"])


def export_adapter(path: str, params: Dict[str, Any],
                   lora_cfg=None) -> None:
    """Save LoRA A/B + projectors as one .npz (the reference saves
    adapter_model.bin + dna_rna_projector.bin + protein_projector.bin).

    ``lora_cfg`` (models.lora.LoraConfig) records r/alpha in a
    ``__lora_meta__`` entry so inference merges with the trained scale —
    an adapter trained with alpha != 64 must not be silently merged with
    the default (PEFT stores the same in adapter_config.json)."""
    flat = {}

    def add(prefix, tree):
        leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
        for kp, leaf in leaves:
            key = prefix + "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
            flat[key] = np.asarray(leaf, dtype=np.float32)

    if "lora" in params:
        add("lora/", params["lora"])
        r = int(next(iter(
            params["lora"]["layers"].values()))["a"].shape[-1])
        alpha = float(lora_cfg.alpha) if lora_cfg is not None else 64.0
        if lora_cfg is not None and lora_cfg.r != r:
            raise ValueError(f"lora_cfg.r={lora_cfg.r} != adapter r={r}")
        flat["__lora_meta__"] = np.asarray([r, alpha], np.float32)
    add("dna_rna_projector/", params["dna_rna_projector"])
    add("protein_projector/", params["protein_projector"])
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def adapter_meta(path: str) -> Optional[Dict[str, float]]:
    """{'r': int, 'alpha': float} recorded at export time, or None for
    pre-meta archives (callers fall back to shape-derived r, alpha=64)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    if "__lora_meta__" not in data.files:
        return None
    r, alpha = data["__lora_meta__"]
    return {"r": int(r), "alpha": float(alpha)}


def load_adapter(path: str, params: Dict[str, Any],
                 dtype=None) -> Dict[str, Any]:
    """Inverse of export_adapter: graft saved leaves onto a param tree
    (base weights untouched). The LoRA subtree is reconstructed directly
    from the archive keys, so it loads even when the target tree has no
    adapter attached yet (the usual inference case)."""
    import jax.numpy as jnp

    data = np.load(path if path.endswith(".npz") else path + ".npz")
    out = dict(params)

    def rebuild(prefix, tree):
        def visit(kp, leaf):
            key = prefix + "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
            arr = data[key]
            return jnp.asarray(arr, dtype=dtype or leaf.dtype)
        return jax.tree_util.tree_map_with_path(visit, tree)

    lora_keys = [k for k in data.files if k.startswith("lora/")]
    if lora_keys:
        lora: Dict[str, Any] = {}
        for k in lora_keys:
            node = lora
            parts = k.split("/")[1:]
            for part in parts[:-1]:
                node = node.setdefault(part, {})
            node[parts[-1]] = jnp.asarray(data[k], dtype=dtype)
        out["lora"] = lora
    out["dna_rna_projector"] = rebuild("dna_rna_projector/",
                                       params["dna_rna_projector"])
    out["protein_projector"] = rebuild("protein_projector/",
                                       params["protein_projector"])
    return out
