"""Cur-vs-cand evaluation harness (replaces cc/eval/, ~1,500 LoC C++).

The reference plays one game per thread with two engines + two NNInterfaces
(eval/main.cc:380-444). Here all games run in lockstep on one chip:

- Board i < B/2 gives the candidate Black; i >= B/2 gives it White
  (color alternation by game parity, eval.cc:110).
- Because pass is a move, to_move is identical across the lockstep batch
  at every ply, so each ply needs the candidate net for exactly one half
  of the batch and the incumbent for the other; the eval_fn evaluates each
  contiguous half with its model and concatenates. Two jitted step
  variants (even/odd ply) cover the routing statically.
- Resign at root value < -0.92 (eval.cc:28).
- Result: winrate -> relative Elo +- 95% CI (eval/main.cc:455-470).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from p3achygo_tpu.constants import BLACK, MAX_GAME_LEN, PASS_MOVE, WHITE
from p3achygo_tpu.eval.elo import elo_with_ci
from p3achygo_tpu.game.board import is_game_over, new_state, step, superko_violation
from p3achygo_tpu.game.scoring import score as score_board
from p3achygo_tpu.mcts.gumbel import EvalFn, EvalOutput, SearchParams, search_root


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    num_games: int = 64  # must be even; half cand-black, half cand-white
    komi: float = 7.5
    max_game_len: int = MAX_GAME_LEN
    resign_threshold: float = -0.92
    search: SearchParams = dataclasses.field(
        default_factory=lambda: SearchParams(n=32, k=4, noise_scale=0.0,
                                             tau=0.0))


@dataclasses.dataclass
class EvalResult:
    cand_wins: float
    num_games: int
    winrate: float
    elo: float
    elo_lo: float
    elo_hi: float
    by_resign: int


def _half_eval_fn(eval_cand: EvalFn, eval_cur: EvalFn, cand_first: bool) -> EvalFn:
    """Evaluate first half of the batch with one net, second with the other."""

    def fn(states) -> EvalOutput:
        B = states.stones.shape[0]
        H = B // 2
        first = jax.tree_util.tree_map(lambda x: x[:H], states)
        second = jax.tree_util.tree_map(lambda x: x[H:], states)
        fa = eval_cand if cand_first else eval_cur
        fb = eval_cur if cand_first else eval_cand
        oa, ob = fa(first), fb(second)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=0), oa, ob)

    return fn


def run_eval(key: jax.Array, eval_cand: EvalFn, eval_cur: EvalFn,
             cfg: EvalConfig, verbose: bool = False) -> EvalResult:
    """Play cfg.num_games lockstep games; return candidate's relative Elo."""
    B = cfg.num_games
    assert B % 2 == 0
    H = B // 2
    states = jax.vmap(lambda _: new_state(cfg.komi))(jnp.arange(B))

    # cand plays black on boards [0, H); white on [H, B).
    cand_is_black = jnp.arange(B) < H

    # Ply parity t: to_move is BLACK iff t even (lockstep invariant).
    # cand to move <=> (t even) == cand_is_black.
    def make_step(cand_first: bool):
        fn = _half_eval_fn(eval_cand, eval_cur, cand_first)

        @jax.jit
        def eval_step(states, key, resigned, winner):
            key, ks = jax.random.split(key)
            res = search_root(ks, states, fn, cfg.search)
            viol = jax.vmap(superko_violation)(states, res.mcts_move)
            move = jnp.where(viol, PASS_MOVE, res.mcts_move)
            over = jax.vmap(is_game_over)(states) | resigned
            move = jnp.where(over, PASS_MOVE, move)

            # Resignation by the player to move.
            should_resign = (res.root_value < cfg.resign_threshold) & ~over
            mover_color = states.to_move
            new_resigned = resigned | should_resign
            winner = jnp.where(should_resign & (winner == 0),
                               (-mover_color).astype(jnp.int8), winner)

            new_states, _ = jax.vmap(step)(states, move)
            active = ~over & ~should_resign
            Bn = states.stones.shape[0]
            states = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    jnp.reshape(active, (Bn,) + (1,) * (new.ndim - 1)), new, old),
                new_states, states)
            return states, key, new_resigned, winner

        return eval_step

    # cand_first=True means the FIRST half (cand-black boards) uses cand.
    step_even = make_step(True)   # t even: black to move; cand on first half
    step_odd = make_step(False)   # t odd: white to move; cand on second half

    resigned = jnp.zeros((B,), jnp.bool_)
    winner = jnp.zeros((B,), jnp.int8)  # 0 = undecided / by score
    for t in range(cfg.max_game_len):
        sfn = step_even if t % 2 == 0 else step_odd
        states, key, resigned, winner = sfn(states, key, resigned, winner)
        done = (jax.vmap(is_game_over)(states) | resigned)
        if bool(jnp.all(done)):
            break

    # Score the non-resigned games.
    bs, ws, _ = jax.vmap(score_board)(states)
    score_winner = jnp.where(bs > ws, BLACK, WHITE).astype(jnp.int8)
    final_winner = jnp.where(winner != 0, winner, score_winner)
    cand_color = jnp.where(cand_is_black, BLACK, WHITE).astype(jnp.int8)
    cand_wins = float(jnp.sum(final_winner == cand_color))

    elo, lo, hi = elo_with_ci(cand_wins, B)
    return EvalResult(
        cand_wins=cand_wins,
        num_games=B,
        winrate=cand_wins / B,
        elo=elo,
        elo_lo=lo,
        elo_hi=hi,
        by_resign=int(jnp.sum(resigned)),
    )


class EvalRunner:
    """run_eval with model weights as TRACED jit arguments and the two
    ply-parity step programs compiled once — repeated gating evals across
    generations reuse the executables."""

    def __init__(self, model, cfg: EvalConfig):
        self.model = model
        self.cfg = cfg
        self._step_even = self._make_step(True)
        self._step_odd = self._make_step(False)

    def _make_step(self, cand_first: bool):
        from p3achygo_tpu.mcts.gumbel import make_eval_fn

        model, cfg = self.model, self.cfg

        @jax.jit
        def eval_step(states, key, resigned, winner, cand_v, cur_v):
            fa = make_eval_fn(model, cand_v if cand_first else cur_v)
            fb = make_eval_fn(model, cur_v if cand_first else cand_v)
            fn = _half_eval_fn(fa, fb, True)
            key, ks = jax.random.split(key)
            res = search_root(ks, states, fn, cfg.search)
            viol = jax.vmap(superko_violation)(states, res.mcts_move)
            move = jnp.where(viol, PASS_MOVE, res.mcts_move)
            over = jax.vmap(is_game_over)(states) | resigned
            move = jnp.where(over, PASS_MOVE, move)
            should_resign = (res.root_value < cfg.resign_threshold) & ~over
            mover_color = states.to_move
            new_resigned = resigned | should_resign
            winner = jnp.where(should_resign & (winner == 0),
                               (-mover_color).astype(jnp.int8), winner)
            new_states, _ = jax.vmap(step)(states, move)
            active = ~over & ~should_resign
            Bn = states.stones.shape[0]
            out_states = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    jnp.reshape(active, (Bn,) + (1,) * (new.ndim - 1)),
                    new, old),
                new_states, states)
            return out_states, key, new_resigned, winner

        return eval_step

    def run(self, key: jax.Array, cand_vars, cur_vars) -> EvalResult:
        cfg = self.cfg
        B = cfg.num_games
        assert B % 2 == 0
        states = jax.vmap(lambda _: new_state(cfg.komi))(jnp.arange(B))
        cand_is_black = jnp.arange(B) < B // 2
        resigned = jnp.zeros((B,), jnp.bool_)
        winner = jnp.zeros((B,), jnp.int8)
        for t in range(cfg.max_game_len):
            sfn = self._step_even if t % 2 == 0 else self._step_odd
            states, key, resigned, winner = sfn(states, key, resigned,
                                                winner, cand_vars, cur_vars)
            done = (jax.vmap(is_game_over)(states) | resigned)
            if bool(jnp.all(done)):
                break

        bs, ws, _ = jax.vmap(score_board)(states)
        score_winner = jnp.where(bs > ws, BLACK, WHITE).astype(jnp.int8)
        final_winner = jnp.where(winner != 0, winner, score_winner)
        cand_color = jnp.where(cand_is_black, BLACK, WHITE).astype(jnp.int8)
        cand_wins = float(jnp.sum(final_winner == cand_color))
        elo, lo, hi = elo_with_ci(cand_wins, B)
        return EvalResult(
            cand_wins=cand_wins, num_games=B, winrate=cand_wins / B,
            elo=elo, elo_lo=lo, elo_hi=hi, by_resign=int(jnp.sum(resigned)))


def run_eval_params(key, model, cand_vars, cur_vars,
                    cfg: EvalConfig) -> EvalResult:
    """One-shot convenience wrapper over EvalRunner."""
    return EvalRunner(model, cfg).run(key, cand_vars, cur_vars)
