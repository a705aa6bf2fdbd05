"""Validation metrics (mirrors python/train.py val :1038: loss breakdown +
accuracy metrics over a held-out batch stream)."""
from __future__ import annotations

from typing import Dict, Iterable

import jax
import jax.numpy as jnp

from p3achygo_tpu.models.losses import GroundTruth, LossCoeffs, compute_losses


def batch_metrics(outputs, targets: GroundTruth) -> Dict[str, jnp.ndarray]:
    """Accuracy-style metrics for one batch."""
    pred_move = jnp.argmax(outputs.pi_logits, axis=-1)
    true_move = jnp.argmax(targets.policy, axis=-1)
    pol_acc = jnp.mean((pred_move == true_move).astype(jnp.float32))

    top5 = jax.lax.top_k(outputs.pi_logits, 5)[1]
    pol_acc5 = jnp.mean(jnp.any(top5 == true_move[:, None],
                                axis=-1).astype(jnp.float32))

    pred_win = outputs.outcome_probs[:, 1] > 0.5
    true_win = targets.game_outcome[:, 1] > 0.5
    outcome_acc = jnp.mean((pred_win == true_win).astype(jnp.float32))

    score_values = jnp.arange(outputs.score_probs.shape[-1],
                              dtype=jnp.float32) - 400.0 + 0.5
    pred_score = jnp.sum(outputs.score_probs * score_values[None, :], axis=-1)
    score_mae = jnp.mean(jnp.abs(pred_score - targets.score))

    own_mae = jnp.mean(jnp.abs(outputs.ownership - targets.own))
    return dict(policy_acc=pol_acc, policy_acc_top5=pol_acc5,
                outcome_acc=outcome_acc, score_mae=score_mae,
                own_mae=own_mae)


def validate(model, variables, batches: Iterable,
             coeffs: LossCoeffs) -> Dict[str, float]:
    """Average losses + metrics over an iterable of
    (planes, scalars, GroundTruth) batches."""

    @jax.jit
    def one(planes, scalars, targets):
        outputs = model.apply(variables, planes, scalars, train=False)
        losses = compute_losses(outputs, targets, coeffs)
        metrics = batch_metrics(outputs, targets)
        return {**losses, **metrics}

    totals: Dict[str, float] = {}
    count = 0
    for planes, scalars, targets in batches:
        out = one(planes, scalars, targets)
        for key, val in out.items():
            totals[key] = totals.get(key, 0.0) + float(val)
        count += 1
    return {k: v / max(count, 1) for k, v in totals.items()}
