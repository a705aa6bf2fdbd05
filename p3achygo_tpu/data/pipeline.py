"""Replay batch -> model inputs + GroundTruth, on device.

Mirrors python/transforms.py expand (transforms.py:488): rebuild the input
planes from the recorded position (plane building transforms.py:179-243),
apply a random D4 symmetry to every spatial tensor (transforms.py:119-178),
and build score one-hot / outcome targets (transforms.py:244-258).

Ladder planes are currently zeroed in BOTH selfplay inference and training
(consistent featurization); see features.py / SURVEY §7 hard parts.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from p3achygo_tpu.constants import (
    BLACK,
    BOARD_LEN,
    DEFAULT_KOMI,
    MAX_HISTORY,
    NUM_LAST_MOVES,
    NUM_LOCS,
    NUM_MOVES,
    NUM_SCORE_LOGITS,
    NUM_V_BUCKETS,
    SCORE_INFLECTION_POINT,
)
from p3achygo_tpu.features import features
from p3achygo_tpu.game.board import GoState, compute_chains, new_state
from p3achygo_tpu.game.symmetry import (
    apply_symmetry_action,
    apply_symmetry_grid,
    apply_symmetry_policy,
)
from p3achygo_tpu.models.losses import GroundTruth


def _state_from_record(stones, last_moves, to_move, komi) -> GoState:
    """Minimal GoState for featurization (history fields are dummies)."""
    st = new_state(DEFAULT_KOMI)
    return st._replace(
        stones=stones.astype(jnp.int8),
        chain_id=compute_chains(stones.astype(jnp.int8)),
        last_moves=last_moves.astype(jnp.int32),
        to_move=to_move.astype(jnp.int8),
        komi=komi.astype(jnp.float32),
    )


def _augment_one(sym, stones, last_moves, pi, pi_aux, pi_aux_dist, own):
    stones_t = apply_symmetry_grid(stones, sym)
    lm_t = jax.vmap(lambda m: apply_symmetry_action(m, sym))(
        last_moves.astype(jnp.int32))
    pi_t = apply_symmetry_policy(pi, sym)
    aux_t = apply_symmetry_action(pi_aux.astype(jnp.int32), sym)
    aux_dist_t = apply_symmetry_policy(pi_aux_dist, sym)
    own_t = apply_symmetry_grid(own, sym)
    return stones_t, lm_t, pi_t, aux_t, aux_dist_t, own_t


def prepare_batch(key: jax.Array, batch: Dict[str, jnp.ndarray],
                  augment: bool = True
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, GroundTruth]:
    """-> (planes [N,19,19,15], scalars [N,8], GroundTruth). Jit-able."""
    N = batch["stones"].shape[0]
    stones = batch["stones"]
    last_moves = batch["last_moves"]
    pi = batch["pi"]
    pi_aux = batch["pi_aux"]
    pi_aux_dist = batch["pi_aux_dist"]
    own = batch["own"].astype(jnp.float32)

    if augment:
        key, ksym = jax.random.split(key)
        syms = jax.random.randint(ksym, (N,), 0, 8)
        stones, last_moves, pi, pi_aux, pi_aux_dist, own = jax.vmap(
            _augment_one)(syms, stones, last_moves, pi, pi_aux, pi_aux_dist,
                          own)

    states = jax.vmap(_state_from_record)(
        stones, last_moves, batch["color"], batch["komi"])
    planes, scalars = jax.vmap(lambda s: features(s, False))(states)

    score_idx = jnp.clip(
        jnp.floor(batch["score_margin"]).astype(jnp.int32)
        + SCORE_INFLECTION_POINT, 0, NUM_SCORE_LOGITS - 1)
    score_one_hot = jax.nn.one_hot(score_idx, NUM_SCORE_LOGITS)
    win = (batch["z"] > 0).astype(jnp.int32)
    outcome = jax.nn.one_hot(win, 2)  # [loss, win]; value = p[1] - p[0]

    targets = GroundTruth(
        policy=pi,
        policy_aux=pi_aux.astype(jnp.int32),
        score=batch["score_margin"],
        score_one_hot=score_one_hot,
        game_outcome=outcome,
        own=own,
        q6=batch["q6"], q16=batch["q16"], q50=batch["q50"],
        q6_score=batch["q6_score"], q16_score=batch["q16_score"],
        q50_score=batch["q50_score"],
        policy_aux_dist=pi_aux_dist,
        has_pi_aux_dist=batch["has_pi_aux_dist"],
        mcts_value_dist=batch.get(
            "mcts_value_dist",
            jnp.zeros((N, NUM_V_BUCKETS), jnp.uint16)).astype(jnp.float32),
        has_mcts_value_dist=(
            jnp.sum(batch["mcts_value_dist"].astype(jnp.int32), axis=-1) > 0
            if "mcts_value_dist" in batch else jnp.zeros((N,), jnp.bool_)),
    )
    return planes, scalars, targets
