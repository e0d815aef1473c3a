"""Device mesh + sharding helpers — the TPU replacement for the reference's
NCCL DDP stack (openpoints/utils/dist_utils.py + DDP wiring, SURVEY.md §2.2).

Data parallelism: one ``jax.sharding.Mesh`` axis 'dp' over all devices; batches
are sharded on axis 0, parameters replicated. Gradient averaging, SyncBN batch
statistics, and metric reduction all come from XLA-inserted collectives over
the sharded jit program (psum over ICI) — no explicit NCCL-style calls.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["get_mesh", "batch_sharding", "shard_batch", "replicate",
           "shard_batch_stack"]


def get_mesh(devices=None, axis_name: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, batch: dict, axis_name: str = "dp",
                pad_to_mesh: bool = False) -> dict:
    """device_put each batch array sharded on axis 0 (scalars replicated).

    Raises if the batch axis is not divisible by the mesh size: silently
    replicating would run the full batch redundantly on every device (8x
    the compute at 1/8 the throughput on an 8-chip mesh) with no warning.
    Configure ``batch_size`` as a multiple of the device count instead —
    the data loaders pad ragged final batches to full size already.

    ``pad_to_mesh=True`` (eval paths that slice results by ``n_valid``)
    instead pads the batch axis by repeating row 0 up to the next multiple
    of the mesh size — callers MUST discard the trailing rows of anything
    computed from the padded batch.
    """
    sharding = batch_sharding(mesh, axis_name)
    rep = NamedSharding(mesh, P())
    out = {}
    for k, v in batch.items():
        arr = np.asarray(v)
        if arr.ndim == 0:
            out[k] = jax.device_put(arr, rep)
            continue
        if arr.shape[0] % mesh.size != 0:
            if pad_to_mesh:
                reps = mesh.size - arr.shape[0] % mesh.size
                arr = np.concatenate(
                    [arr, np.repeat(arr[:1], reps, axis=0)], axis=0)
            else:
                raise ValueError(
                    f"shard_batch: batch axis of '{k}' ({arr.shape[0]}) is "
                    f"not divisible by the mesh size ({mesh.size}); set "
                    f"batch_size to a multiple of the device count (loaders "
                    f"pad ragged final batches to full size)")
        out[k] = jax.device_put(arr, sharding)
    return out


def replicate(tree, mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return jax.device_put(tree, rep)


def shard_batch_stack(mesh: Mesh, batches: list, axis_name: str = "dp") -> dict:
    """Stack K same-shape batches into {(K, B, ...)} sharded on the BATCH
    axis (axis 1) for the lax.scan multi-batch executors
    (cls_trainer.make_train_step_scan) — axis 0 is the scan axis."""
    sharding = NamedSharding(mesh, P(None, axis_name))
    out = {}
    for k in batches[0]:
        arr = np.stack([np.asarray(b[k]) for b in batches], axis=0)
        if arr.ndim <= 1:
            out[k] = jax.device_put(arr, NamedSharding(mesh, P()))
            continue
        if arr.shape[1] % mesh.size != 0:
            raise ValueError(
                f"shard_batch_stack: batch axis of '{k}' ({arr.shape[1]}) "
                f"not divisible by the mesh size ({mesh.size})")
        out[k] = jax.device_put(arr, sharding)
    return out
