"""Per-game training-record extraction (host side).

Mirrors the reference's game-replay recorder (cc/recorder/tf_recorder.cc
:120-280): one example per *trainable* move with improved policy, next-move
aux targets, ownership, score margin, exp-weighted TD value targets
(λ = 5/6, 15/16, 49/50 with alternating turn sign, tf_recorder.cc:186-215),
and policy-surprise frequency weights (0.5 + 0.5 * kld / avg_kld,
tf_recorder.cc:224-235). Instead of duplicating examples ∝ weight into a
file chunk, the weight is stored and used as a sampling weight in the
replay buffer — same expectation, no file relay.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from p3achygo_tpu.constants import (
    BLACK,
    EMPTY,
    NUM_LAST_MOVES,
    NUM_LOCS,
    NUM_MOVES,
    PASS_MOVE,
    WHITE,
)


@dataclasses.dataclass
class GameExamples:
    """Columnar per-move training examples for one finished game."""

    stones: np.ndarray  # int8[M, 361]
    last_moves: np.ndarray  # int16[M, 5]
    color: np.ndarray  # int8[M]
    komi: np.ndarray  # f32[M]
    pi: np.ndarray  # f32[M, 362]
    pi_aux: np.ndarray  # int16[M] next-move encoding (pass at end)
    pi_aux_dist: np.ndarray  # f32[M, 362]
    has_pi_aux_dist: np.ndarray  # bool[M]
    own: np.ndarray  # int8[M, 361] player-perspective {-1, 0, 1}
    score_margin: np.ndarray  # f32[M] player perspective
    z: np.ndarray  # f32[M] +-1 game outcome for player
    q6: np.ndarray  # f32[M]
    q16: np.ndarray
    q50: np.ndarray
    q6_score: np.ndarray
    q16_score: np.ndarray
    q50_score: np.ndarray
    weight: np.ndarray  # f32[M] surprise sampling weight
    mcts_value_dist: np.ndarray  # u16[M, 51] root value histogram

    def __len__(self):
        return self.stones.shape[0]


def _exp_weighted(values: np.ndarray, t: int, lam: float, horizon: int):
    """(1/N) sum_i (-1)^i lam^i values[t+i], i = 0..horizon."""
    idx = np.arange(horizon + 1)
    w = lam ** idx
    sign = np.where(idx % 2 == 0, 1.0, -1.0)
    return float(np.sum(sign * w * values[t:t + horizon + 1]) / np.sum(w))


def finalize_game(
    stones: np.ndarray,  # int8[T, 361] per-move pre-move position
    last_moves: np.ndarray,  # int16[T, 5]
    to_move: np.ndarray,  # int8[T]
    pi: np.ndarray,  # f32[T, 362]
    move: np.ndarray,  # int16[T]
    root_q_outcome: np.ndarray,  # f32[T]
    root_score: np.ndarray,  # f32[T]
    kld: np.ndarray,  # f32[T]
    trainable: np.ndarray,  # bool[T]
    num_moves: int,
    black_score: float,
    white_score: float,
    ownership: np.ndarray,  # int8[361] final {0, 1, -1}
    komi: float,
    mcts_value_dist: np.ndarray = None,  # int16[T, 51] or None
) -> Optional[GameExamples]:
    """Convert one finished game's move records into training examples."""
    L = int(num_moves)
    if L <= 0:
        return None
    winner = BLACK if black_score > white_score else WHITE

    tr_idx = np.flatnonzero(trainable[:L])
    if tr_idx.size == 0:
        return None

    kld_sum = float(kld[tr_idx].sum())
    avg_kld = kld_sum / tr_idx.size if tr_idx.size else 0.0

    vals = root_q_outcome[:L].astype(np.float64)
    svals = root_score[:L].astype(np.float64)

    M = tr_idx.size
    ex = GameExamples(
        stones=stones[tr_idx].astype(np.int8),
        last_moves=last_moves[tr_idx].astype(np.int16),
        color=to_move[tr_idx].astype(np.int8),
        komi=np.full((M,), komi, np.float32),
        pi=pi[tr_idx].astype(np.float32),
        pi_aux=np.zeros((M,), np.int16),
        pi_aux_dist=np.zeros((M, NUM_MOVES), np.float32),
        has_pi_aux_dist=np.zeros((M,), bool),
        own=np.zeros((M, NUM_LOCS), np.int8),
        score_margin=np.zeros((M,), np.float32),
        z=np.zeros((M,), np.float32),
        q6=np.zeros((M,), np.float32),
        q16=np.zeros((M,), np.float32),
        q50=np.zeros((M,), np.float32),
        q6_score=np.zeros((M,), np.float32),
        q16_score=np.zeros((M,), np.float32),
        q50_score=np.zeros((M,), np.float32),
        weight=np.ones((M,), np.float32),
        mcts_value_dist=(mcts_value_dist[tr_idx].astype(np.uint16)
                         if mcts_value_dist is not None
                         else np.zeros((M, 51), np.uint16)),
    )

    for j, t in enumerate(tr_idx):
        color = int(to_move[t])
        ex.z[j] = 1.0 if winner == color else -1.0
        margin = (black_score - white_score) if color == BLACK \
            else (white_score - black_score)
        ex.score_margin[j] = margin
        ex.own[j] = (ownership * color).astype(np.int8)
        if t < L - 1:
            ex.pi_aux[j] = move[t + 1]
            ex.pi_aux_dist[j] = pi[t + 1]
            ex.has_pi_aux_dist[j] = True
        else:
            ex.pi_aux[j] = PASS_MOVE
        ex.q6[j] = _exp_weighted(vals, t, 5.0 / 6.0, min(6, L - t - 1))
        ex.q16[j] = _exp_weighted(vals, t, 15.0 / 16.0, min(16, L - t - 1))
        ex.q50[j] = _exp_weighted(vals, t, 49.0 / 50.0, L - t - 1)
        ex.q6_score[j] = _exp_weighted(svals, t, 5.0 / 6.0, min(6, L - t - 1))
        ex.q16_score[j] = _exp_weighted(svals, t, 15.0 / 16.0, min(16, L - t - 1))
        ex.q50_score[j] = _exp_weighted(svals, t, 49.0 / 50.0, L - t - 1)
        ex.weight[j] = 1.0 if avg_kld == 0.0 else \
            0.5 + 0.5 * float(kld[t]) / avg_kld
    return ex


def game_to_sgf(to_move: np.ndarray, move: np.ndarray, num_moves: int,
                black_score: float, white_score: float, komi: float,
                by_resign: bool = False) -> str:
    """Finished-game move list -> SGF text (SgfRecorder parity)."""
    from p3achygo_tpu.sgf import result_string, serialize_game

    L = int(num_moves)
    moves = [(int(to_move[t]), int(move[t])) for t in range(L)]
    winner = BLACK if black_score > white_score else WHITE
    return serialize_game(
        moves, komi=komi,
        result=result_string(black_score, white_score, by_resign, winner))
