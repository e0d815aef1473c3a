"""Seed plumbing (parity: openpoints/utils/random.py:6).

JAX randomness is explicit: ``set_random_seed`` seeds numpy (data pipeline) and
returns a root ``jax.random.PRNGKey`` that the engine threads through steps.
"""
from __future__ import annotations

import random

import numpy as np

__all__ = ["set_random_seed"]


def set_random_seed(seed: int = 0, deterministic: bool = False):
    import jax

    random.seed(seed)
    np.random.seed(seed)
    # deterministic flag is a no-op on TPU/XLA: compiled programs are
    # deterministic by construction (no atexit atomics like CUDA atomicAdd).
    return jax.random.PRNGKey(seed)
