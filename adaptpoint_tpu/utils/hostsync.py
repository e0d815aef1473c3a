"""One-step-delayed host fetches for training/eval loops.

Through a remote TPU runtime every ``float(x)`` / ``np.asarray(x)`` on a
device value is a blocking round-trip, and the reference-parity epoch loops
fetch several scalars plus the generated clouds after every step — measured
at ~3/4 of the wall time of an adversarial epoch (12 s device vs 41 s wall
at the hard-protocol ModelNet shapes).

``PipelinedFetcher`` defers the host side by exactly one step: the loop
dispatches step ``i+1`` (JAX dispatch is asynchronous) and only then fetches
step ``i``'s outputs — which are already materialized on the device — so the
transfer and any host-side processing overlap the device compute of the next
step. Values, ordering and therefore every logged metric are identical to
the eager loop; only the wall-clock interleaving changes.

Usage::

    fetch = PipelinedFetcher()
    for batch in loader:
        outs = step(...)                 # async dispatch
        fetch.push(outs, process, batch["y"])   # fetches PREVIOUS outs
    fetch.flush()                        # fetches the last step's outs

``process(host_outs, *ctx)`` receives ``jax.device_get(outs)`` (numpy
leaves) in push order.
"""
from __future__ import annotations

from typing import Any, Callable

import jax

__all__ = ["PipelinedFetcher"]


class PipelinedFetcher:
    """Defer host fetches by one loop step so they overlap device compute."""

    def __init__(self) -> None:
        self._pending = None

    def push(self, outputs: Any, process: Callable, *ctx: Any) -> None:
        """Queue ``outputs`` for fetching; fetch + process the previous ones."""
        prev, self._pending = self._pending, (outputs, process, ctx)
        if prev is not None:
            outs, fn, c = prev
            fn(jax.device_get(outs), *c)

    def flush(self) -> None:
        """Fetch + process whatever is still queued (end of epoch)."""
        if self._pending is not None:
            outs, fn, c = self._pending
            self._pending = None
            fn(jax.device_get(outs), *c)
