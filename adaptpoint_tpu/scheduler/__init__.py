"""Epoch LR schedules as pure functions epoch -> lr.

Parity with the reference timm scheduler factory
(openpoints/scheduler/scheduler_factory.py:12-110): cosine (t_max, min_lr,
warmup), step, multistep, poly, tanh; constant fallback. The engine evaluates
``lr_fn(epoch - 1)`` at the start of each epoch, which reproduces timm's
``scheduler.step(epoch)``-at-epoch-end stepping with sched_on_epoch=True.
"""
from __future__ import annotations

import math
from typing import Callable

__all__ = ["build_scheduler_from_cfg"]


def build_scheduler_from_cfg(cfg) -> Callable[[int], float]:
    sched = cfg.get("sched", "cosine")
    lr = cfg.lr
    epochs = cfg.epochs
    warmup_t = cfg.get("warmup_epochs", 0)
    warmup_lr = cfg.get("warmup_lr", 1e-6)
    min_lr = cfg.get("min_lr", None) or lr / 1000.0
    t_max = cfg.get("t_max", epochs)
    decay_rate = cfg.get("decay_rate", None) or cfg.get("final_decay_rate", 0.01) ** (1.0 / epochs)
    decay_epochs = cfg.get("decay_epochs", 1)

    def warmup(t: int) -> float:
        # linear warmup from warmup_lr to lr over warmup_t epochs
        return warmup_lr + (lr - warmup_lr) * t / max(warmup_t, 1)

    def cosine(t: int) -> float:
        if warmup_t and t < warmup_t:
            return warmup(t)
        if t >= t_max:
            return min_lr  # past the single cycle (cycle_limit=1)
        return min_lr + 0.5 * (lr - min_lr) * (1 + math.cos(math.pi * t / t_max))

    def tanh(t: int) -> float:
        if warmup_t and t < warmup_t:
            return warmup(t)
        if t >= epochs:
            return min_lr
        lb, ub = -6.0, 4.0
        tr = t / epochs
        return min_lr + 0.5 * (lr - min_lr) * (1 - math.tanh(lb + (ub - lb) * tr))

    def step(t: int) -> float:
        if warmup_t and t < warmup_t:
            return warmup(t)
        return lr * (decay_rate ** (t // decay_epochs))

    def multistep(t: int) -> float:
        if warmup_t and t < warmup_t:
            return warmup(t)
        milestones = decay_epochs if isinstance(decay_epochs, (list, tuple)) else [decay_epochs]
        k = sum(1 for m in milestones if t >= m)
        return lr * (decay_rate ** k)

    def poly(t: int) -> float:
        if warmup_t and t < warmup_t:
            return warmup(t)
        if t >= epochs:
            return min_lr
        power = cfg.get("decay_rate", None) or 1.0
        return min_lr + (lr - min_lr) * (1 - t / epochs) ** power

    def constant(t: int) -> float:
        return lr

    table = {"cosine": cosine, "tanh": tanh, "step": step,
             "multistep": multistep, "poly": poly, "constant": constant,
             None: constant}
    if sched not in table:
        raise ValueError(f"unsupported sched {sched}")
    return table[sched]
