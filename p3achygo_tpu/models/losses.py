"""Training losses (mirrors python/model.py compute_losses model.py:1297-1520
and python/loss_coeffs.py)."""
from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from p3achygo_tpu.constants import NUM_MOVES, NUM_V_BUCKETS


@dataclasses.dataclass(frozen=True)
class LossCoeffs:
    """Loss weights (loss_coeffs.py:7-48)."""

    w_pi: float
    w_pi_aux: float
    w_val: float
    w_outcome: float
    w_score: float
    w_own: float
    w_q6: float
    w_q16: float
    w_q50: float
    w_gamma: float
    w_q_err: float = 0.0
    w_q_score: float = 0.0
    w_q_score_err: float = 0.0
    w_pi_soft: float = 0.0
    w_pi_optimistic: float = 0.0
    w_mcts_dist: float = 0.0

    @staticmethod
    def sl():
        return LossCoeffs(1.0, 0.15, 1.0, 1.5, 0.02, 0, 0, 0, 0, 0.005)

    @staticmethod
    def rl():
        return LossCoeffs(1.0, 0.15, 1.0, 1.5, 0.02, 0.45, 0.7, 0.4, 0.3,
                          0.005, 3.0, 0.2, 0.2, 4.0, 1.0, 0.125)


class GroundTruth(NamedTuple):
    """Training targets (model.py:55-77). All [N, ...]."""

    policy: jnp.ndarray  # [N, 362] improved-policy probs
    policy_aux: jnp.ndarray  # [N] int32 next-move encoding
    score: jnp.ndarray  # [N] black-perspective margin (for current player)
    score_one_hot: jnp.ndarray  # [N, 800]
    game_outcome: jnp.ndarray  # [N, 2] one-hot {loss, win}
    own: jnp.ndarray  # [N, 361] in [-1, 1] (current-player perspective)
    q6: jnp.ndarray  # [N]
    q16: jnp.ndarray
    q50: jnp.ndarray
    q6_score: jnp.ndarray
    q16_score: jnp.ndarray
    q50_score: jnp.ndarray
    policy_aux_dist: jnp.ndarray  # [N, 362] next-move search dist
    has_pi_aux_dist: jnp.ndarray  # [N] bool
    mcts_value_dist: jnp.ndarray  # [N, 51] visit-count histogram
    has_mcts_value_dist: jnp.ndarray  # [N] bool


def _kld(target_probs, pred_probs, eps=1e-10, axis=-1):
    """KL(target || pred), per example; zero-target terms drop out."""
    t = jnp.clip(target_probs, 0.0, 1.0)
    return jnp.sum(
        jnp.where(t > 0, t * (jnp.log(t + eps) - jnp.log(pred_probs + eps)), 0.0),
        axis=axis)


def _softmax_xent_int(labels, logits):
    """Sparse CE from logits, per example."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def _xent_probs(target_probs, logits):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(target_probs * logp, axis=-1)


def _huber(target, pred, delta=1.0):
    err = pred - target
    a = jnp.abs(err)
    return jnp.where(a <= delta, 0.5 * err * err, delta * (a - 0.5 * delta))


def compute_losses(outputs, targets: GroundTruth, w: LossCoeffs
                   ) -> Dict[str, jnp.ndarray]:
    """Total + per-component losses (model.py:1297-1448 + v1_loss_terms)."""
    eps = 1e-6

    # Policy: KLD(target, softmax(pi_logits)).
    pi_probs = jax.nn.softmax(outputs.pi_logits, axis=-1)
    policy_loss = jnp.mean(_kld(targets.policy, pi_probs))

    # Aux policy: per-example either dist-KLD (has dist) or sparse CE at
    # 0.6x weight (model.py:1328-1345).
    has_dist = targets.has_pi_aux_dist.astype(jnp.float32)
    pi_aux_probs = jax.nn.softmax(outputs.pi_logits_aux, axis=-1)
    aux_dist_loss = jnp.mean(has_dist * _kld(targets.policy_aux_dist, pi_aux_probs))
    per_ex_scce = jnp.clip(
        _softmax_xent_int(targets.policy_aux, outputs.pi_logits_aux), 0.0, 50.0)
    aux_scalar_loss = jnp.mean((1.0 - has_dist) * per_ex_scce)

    outcome_loss = jnp.mean(_xent_probs(targets.game_outcome,
                                        outputs.outcome_logits))
    q6_loss = jnp.mean((targets.q6 - outputs.q6) ** 2)
    q16_loss = jnp.mean((targets.q16 - outputs.q16) ** 2)
    q50_loss = jnp.mean((targets.q50 - outputs.q50) ** 2)

    score_probs = jax.nn.softmax(outputs.score_logits, axis=-1)
    score_pdf_loss = jnp.mean(_xent_probs(targets.score_one_hot,
                                          outputs.score_logits))
    score_cdf_loss = jnp.mean(
        jnp.sum(
            (jnp.cumsum(targets.score_one_hot, axis=1)
             - jnp.cumsum(score_probs, axis=1)) ** 2,
            axis=1))

    own_loss = jnp.mean((targets.own - outputs.ownership) ** 2)
    gamma = outputs.gamma[:, 0]
    gamma_loss = jnp.mean(gamma * gamma) * w.w_gamma

    val_loss = (
        w.w_val * (w.w_outcome * outcome_loss + w.w_q6 * q6_loss
                   + w.w_q16 * q16_loss + w.w_q50 * q50_loss
                   + w.w_score * score_pdf_loss + w.w_own * own_loss)
        + w.w_score * score_cdf_loss  # outside w_val (model.py:1392-1400)
    )

    # MCTS value-distribution KLD, masked by availability.
    mv_mask = targets.has_mcts_value_dist.astype(jnp.float32)
    mv = targets.mcts_value_dist.astype(jnp.float32)
    mv_total = jnp.maximum(jnp.sum(mv, axis=1, keepdims=True), 1.0)
    mv_norm = mv / mv_total
    mcts_dist_probs = jax.nn.softmax(outputs.mcts_dist_logits, axis=-1)
    mcts_dist_loss = jnp.mean(mv_mask * _kld(mv_norm, mcts_dist_probs))

    # --- v1 terms (model.py:1451-1566) ---
    sg = jax.lax.stop_gradient
    q6_err_t = (sg(outputs.q6) - targets.q6) ** 2
    q16_err_t = (sg(outputs.q16) - targets.q16) ** 2
    q50_err_t = (sg(outputs.q50) - targets.q50) ** 2
    q_err_loss = (jnp.mean(_huber(q6_err_t, outputs.q6_err))
                  + jnp.mean(_huber(q16_err_t, outputs.q16_err))
                  + jnp.mean(_huber(q50_err_t, outputs.q50_err))) / 3.0

    q_score_loss = jnp.clip(
        (jnp.mean(_huber(targets.q6_score / 10.0, outputs.q6_score / 10.0))
         + jnp.mean(_huber(targets.q16_score / 10.0, outputs.q16_score / 10.0))
         + jnp.mean(_huber(targets.q50_score / 10.0, outputs.q50_score / 10.0))
         ) / 3.0, 0.0, 200.0)

    q6_se_t = (sg(outputs.q6_score) - targets.q6_score) ** 2
    q16_se_t = (sg(outputs.q16_score) - targets.q16_score) ** 2
    q50_se_t = (sg(outputs.q50_score) - targets.q50_score) ** 2
    q_score_err_loss = jnp.clip(
        (jnp.mean(_huber(q6_se_t / 100.0, outputs.q6_score_err / 100.0))
         + jnp.mean(_huber(q16_se_t / 100.0, outputs.q16_score_err / 100.0))
         + jnp.mean(_huber(q50_se_t / 100.0, outputs.q50_score_err / 100.0))
         ) / 3.0, 0.0, 1000.0)

    # Soft policy: KLD against policy^0.25 renormalized.
    p_soft = targets.policy ** 0.25
    p_soft = p_soft / jnp.maximum(jnp.sum(p_soft, axis=-1, keepdims=True), eps)
    pi_soft_probs = jax.nn.softmax(outputs.pi_logits_soft, axis=-1)
    pi_soft_loss = jnp.mean(_kld(p_soft, pi_soft_probs))

    # Optimistic policy: weighted by sigmoid z-score of short-term surprise.
    z6 = (targets.q6 - sg(outputs.q6)) / sg(jnp.sqrt(outputs.q6_err + eps))
    z16 = (targets.q16 - sg(outputs.q16)) / sg(jnp.sqrt(outputs.q16_err + eps))
    z50 = (targets.q50 - sg(outputs.q50)) / sg(jnp.sqrt(outputs.q50_err + eps))
    zdecay = 4.0 / 7.0
    z = (zdecay * 3 * z6 + zdecay * 1.5 * z16 + zdecay * 0.75 * z50) / 3.0
    opt_weight = jnp.clip(jax.nn.sigmoid((z - 1.0) * 3.0), 0.0, 1.0)
    pi_opt_probs = jax.nn.softmax(outputs.pi_logits_optimistic, axis=-1)
    pi_opt_loss = jnp.mean(opt_weight * _kld(targets.policy, pi_opt_probs))

    total = (
        w.w_pi * policy_loss
        + w.w_pi_aux * aux_dist_loss
        + w.w_pi_aux * 0.6 * aux_scalar_loss
        + val_loss
        + gamma_loss
        + w.w_mcts_dist * mcts_dist_loss
        + w.w_q_err * q_err_loss
        + w.w_q_score * q_score_loss
        + w.w_q_score_err * q_score_err_loss
        + w.w_pi_soft * pi_soft_loss
        + w.w_pi_optimistic * pi_opt_loss
    )

    return dict(
        loss=total,
        policy=policy_loss,
        policy_aux_dist=aux_dist_loss,
        policy_aux_scalar=aux_scalar_loss,
        outcome=outcome_loss,
        q6=q6_loss, q16=q16_loss, q50=q50_loss,
        score_pdf=score_pdf_loss, score_cdf=score_cdf_loss,
        own=own_loss,
        gamma=gamma_loss,
        q_err=q_err_loss, q_score=q_score_loss, q_score_err=q_score_err_loss,
        pi_soft=pi_soft_loss, pi_optimistic=pi_opt_loss,
        mcts_dist=mcts_dist_loss,
    )
