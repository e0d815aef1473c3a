"""Checkpoint save/load/resume.

Parity with the reference ckpt_util (openpoints/utils/ckpt_util.py:61-216):
``save_checkpoint`` writes ``<ckpt_dir>/<run_name>_ckpt_latest.*``, copies to
``_ckpt_best`` on best, and ``_E{epoch}`` milestones when ``save_freq>0``;
``load_checkpoint`` is a tolerant partial restore reporting missing/unexpected
keys; ``resume_checkpoint`` restores model/opt/sched state + start epoch.

Storage: flax msgpack serialization of pytrees (single-file, host-agnostic).
"""
from __future__ import annotations

import logging
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "resume_checkpoint", "save_pytree", "load_pytree"]


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_pytree(tree, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(_to_host(tree)))


def load_pytree(path: str, target=None):
    with open(path, "rb") as f:
        data = f.read()
    if target is None:
        return serialization.msgpack_restore(data)
    return serialization.from_bytes(target, data)


def save_checkpoint(cfg, state: Dict[str, Any], epoch: int, *, is_best: bool = False,
                    additional: Optional[dict] = None, post_fix: str = "ckpt_latest",
                    save_name: Optional[str] = None) -> str:
    save_name = save_name or cfg.run_name
    payload = dict(state)
    payload["epoch"] = epoch
    if additional:
        payload.update(additional)
    path = os.path.join(cfg.ckpt_dir, f"{save_name}_{post_fix}.msgpack")
    save_pytree(payload, path)
    if is_best:
        shutil.copyfile(path, os.path.join(cfg.ckpt_dir, f"{save_name}_ckpt_best.msgpack"))
    save_freq = cfg.get("save_freq", -1)
    if save_freq and save_freq > 0 and epoch % save_freq == 0:
        shutil.copyfile(path, os.path.join(cfg.ckpt_dir, f"{save_name}_E{epoch}.msgpack"))
    return path


def _merge_tolerant(target, loaded, path=""):
    """Recursively copy loaded leaves into target where keys/shapes match."""
    missing, unexpected, mismatched = [], [], []

    def rec(t, l, p):
        if isinstance(t, dict) and isinstance(l, dict):
            out = {}
            for k in t:
                kp = f"{p}/{k}" if p else str(k)
                if k in l:
                    out[k] = rec(t[k], l[k], kp)
                else:
                    missing.append(kp)
                    out[k] = t[k]
            for k in l:
                if k not in t:
                    unexpected.append(f"{p}/{k}" if p else str(k))
            return out
        # optax states serialize as dicts keyed '0','1',... or as sequences
        if isinstance(t, (list, tuple)):
            l_seq = ([l[str(i)] if str(i) in l else None for i in range(len(t))]
                     if isinstance(l, dict) else list(l))
            out = [rec(ti, li, f"{p}/{i}") if li is not None else ti
                   for i, (ti, li) in enumerate(zip(t, l_seq))]
            return type(t)(out) if not hasattr(t, "_fields") else type(t)(*out)
        t_arr = np.asarray(t) if not isinstance(t, dict) else None
        if t_arr is not None and not isinstance(l, dict):
            l_arr = np.asarray(l)
            if t_arr.shape == l_arr.shape:
                return l_arr.astype(t_arr.dtype) if hasattr(t_arr, "dtype") else l_arr
            mismatched.append(f"{p}: ckpt {l_arr.shape} vs model {t_arr.shape}")
            return t
        mismatched.append(p)
        return t

    merged = rec(target, loaded, path)
    return merged, missing, unexpected, mismatched


def load_checkpoint(target_state: Dict[str, Any], pretrained_path: str):
    """Tolerant partial load. Returns (merged_state, epoch, best_val)."""
    loaded = load_pytree(pretrained_path)
    epoch = int(loaded.pop("epoch", 0)) if isinstance(loaded, dict) else 0
    best_val = loaded.pop("best_val", 0.0) if isinstance(loaded, dict) else 0.0
    merged, missing, unexpected, mismatched = _merge_tolerant(target_state, loaded)
    if missing:
        logging.warning("Missing keys in checkpoint: %s", missing[:20])
    if unexpected:
        logging.warning("Unexpected keys in checkpoint: %s", unexpected[:20])
    if mismatched:
        logging.warning("Shape-mismatched keys skipped: %s", mismatched[:20])
    return merged, epoch, best_val


def maybe_splice_opt_moments(opt_state, pretrained_path: str):
    """Splice converter-produced torch Adam moments into an optax state.

    Checkpoints from ``scripts/convert_torch_ckpt.py --optimizer`` carry
    ``opt_moments`` ({mu, nu, count}) instead of an ``opt_state`` tree
    (the reference side has no optax structure). Returns the opt_state
    unchanged when the checkpoint has none."""
    raw = load_pytree(pretrained_path)
    if isinstance(raw, dict) and "opt_moments" in raw:
        from .torch_convert import splice_adam_state
        om = raw["opt_moments"]
        logging.info("spliced converted optimizer moments (count=%d)",
                     int(om["count"]))
        return splice_adam_state(opt_state, om["mu"], om["nu"],
                                 int(om["count"]))
    return opt_state


def resume_checkpoint(cfg, target_state: Dict[str, Any], pretrained_path: Optional[str] = None):
    pretrained_path = pretrained_path or cfg.get("pretrained_path")
    merged, epoch, best_val = load_checkpoint(target_state, pretrained_path)
    cfg.start_epoch = epoch + 1
    logging.info("Resumed from %s at epoch %d (best_val=%s)", pretrained_path, epoch, best_val)
    return merged, epoch, best_val
