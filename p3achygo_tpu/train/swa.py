"""Stochastic weight averaging + BN refresh.

Mirrors python/weight_snapshot.py:11 + rl_loop/model_utils.py:31-116:
snapshots are chain-averaged with momentum 0.75 (swa_avg_weights) and
BatchNorm statistics are recomputed with forward passes before export.
"""
from __future__ import annotations

from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp


def swa_average(avg_params: Any, new_params: Any, momentum: float = 0.75) -> Any:
    """avg <- momentum * avg + (1 - momentum) * new (model_utils.py:31-39)."""
    return jax.tree_util.tree_map(
        lambda a, p: momentum * a + (1.0 - momentum) * p, avg_params, new_params)


class SnapshotManager:
    """Collects periodic weight snapshots during training
    (weight_snapshot.py:11-40)."""

    def __init__(self, interval: int = 1000, momentum: float = 0.75):
        self.interval = interval
        self.momentum = momentum
        self.avg = None
        self._last_step = -1

    def maybe_snapshot(self, step: int, params: Any):
        if step // self.interval > self._last_step // self.interval or \
                self.avg is None:
            self.avg = params if self.avg is None else swa_average(
                self.avg, params, self.momentum)
        self._last_step = step

    def final(self, params: Any) -> Any:
        return params if self.avg is None else swa_average(
            self.avg, params, self.momentum)


def make_bn_fwd(model):
    """Build the jitted BN-refresh forward once (params traced, so repeated
    per-generation refreshes never recompile)."""

    @jax.jit
    def fwd(params, batch_stats, planes, scalars):
        _, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            planes, scalars, train=True, mutable=["batch_stats"])
        return mutated["batch_stats"]

    return fwd


def recompute_batch_stats(model, params: Any, init_batch_stats: Any,
                          batches: Iterable, num_passes: int = 64,
                          fwd_fn=None) -> Any:
    """Refresh BN running stats with forward passes (model_utils.py:42-116,
    reference default 150 batches, no stat reset).

    Runs `num_passes` train-mode forwards; with BN momentum 0.99 this
    converges the running stats toward the averaged weights' activations.
    Pass `fwd_fn` (from make_bn_fwd) to reuse one compiled executable
    across calls.
    """
    if fwd_fn is None:
        fwd_fn = make_bn_fwd(model)
    batch_stats = init_batch_stats
    count = 0
    for planes, scalars in batches:
        batch_stats = fwd_fn(params, batch_stats, planes, scalars)
        count += 1
        if count >= num_passes:
            break
    return batch_stats
