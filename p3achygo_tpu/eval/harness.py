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
- Per-player search configs (player_config.h:21-109): each player may run
  Gumbel or PUCT search with its own n/k/knobs (eval.cc:230-268 dispatch).
  When the two players' programs are identical the whole batch searches as
  one program; otherwise each half runs its active player's program.
- Per-player tree reuse across plies (eval.cc:125-141, :330-358): each
  board keeps one tree per COLOR (the color->player mapping is fixed per
  board); after every move BOTH trees advance to the played move's child
  via subtree compaction, so each player's search statistics persist exactly
  as the reference's NodeTable Reap. PUCT players do not carry trees
  (deviation: search_root_puct has no init_tree path yet).
- Resign at root OUTCOME value < -0.92 (kResignThreshold eval.cc:28,
  checked as VOutcome(player_tree), eval.cc:278-283).
- Result: winrate -> relative Elo +- 95% CI (eval/main.cc:455-470).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from p3achygo_tpu.constants import BLACK, MAX_GAME_LEN, PASS_MOVE, WHITE
from p3achygo_tpu.eval.elo import elo_with_ci
from p3achygo_tpu.eval.player_config import PlayerSearchConfig
from p3achygo_tpu.game.board import is_game_over, new_state, step, superko_violation
from p3achygo_tpu.game.scoring import score as score_board
from p3achygo_tpu.mcts.gumbel import EvalFn, EvalOutput, SearchParams, search_root
from p3achygo_tpu.mcts.tree import compact_subtree, make_tree


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    num_games: int = 100  # reference protocol (train_sp_eval.py:31-33)
    komi: float = 7.5
    max_game_len: int = MAX_GAME_LEN
    resign_threshold: float = -0.92
    # noise_scale 1.0 = reference gumbel semantics (root Gumbel noise is
    # part of the algorithm, gumbel.cc:287-306) AND the source of
    # per-game diversity: with noise 0 and tau 0 every game of a color
    # half is IDENTICAL, so a 2N-game match measures only 2 distinct
    # games (winrates collapse to {0, .5, 1} — the round-3 gating bug).
    search: SearchParams = dataclasses.field(
        default_factory=lambda: SearchParams(n=32, k=4, noise_scale=1.0,
                                             tau=0.0))
    # Per-player overrides (player_config.h); None -> gumbel with `search`.
    cand: Optional[PlayerSearchConfig] = None
    cur: Optional[PlayerSearchConfig] = None
    # Per-player tree reuse across plies (eval.cc:330-358 Reap).
    tree_reuse: bool = True


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


def _player_cfg(sp: SearchParams) -> PlayerSearchConfig:
    return PlayerSearchConfig(search_type="gumbel", n=sp.n, k=sp.k,
                              tau=sp.tau, noise_scale=sp.noise_scale,
                              score_weight=sp.score_weight,
                              max_depth=sp.max_depth)


def _resolve_players(cfg: EvalConfig) -> Tuple[PlayerSearchConfig,
                                               PlayerSearchConfig]:
    cand = cfg.cand if cfg.cand is not None else _player_cfg(cfg.search)
    cur = cfg.cur if cfg.cur is not None else _player_cfg(cfg.search)
    return cand, cur


def _reuse_capacity(cfg: EvalConfig) -> int:
    """Carried-subtree capacity: covers the biggest gumbel player's n."""
    if not cfg.tree_reuse:
        return 0
    cand, cur = _resolve_players(cfg)
    ns = [p.n for p in (cand, cur) if p.search_type != "puct"]
    return (max(ns) + 2) if ns else 0


def _half_search(key, states_h, fn_h, pcfg: PlayerSearchConfig,
                 tree_h, rcap: int):
    """Run one half's active player's search program."""
    if pcfg.search_type == "puct":
        from p3achygo_tpu.mcts.puct import search_root_puct

        return search_root_puct(key, states_h, fn_h, pcfg.to_puct_params()), \
            None
    sp = pcfg.to_search_params()
    if tree_h is not None:
        return search_root(key, states_h, fn_h, sp, init_tree=tree_h,
                           reuse_capacity=rcap)
    return search_root(key, states_h, fn_h, sp), None


def _eval_ply(key, states, resigned, winner, tree_m, tree_o,
              fn_cand, fn_cur, cfg: EvalConfig, cand_first: bool):
    """One lockstep eval ply (search -> resign check -> move -> tree Reap).

    `tree_m`/`tree_o` are the mover-color / opponent-color trees (or None
    without reuse). `fn_cand`/`fn_cur` evaluate with the candidate /
    incumbent net; `cand_first` says the first half's mover is the
    candidate at this ply parity. Returns
    (states, key, resigned, winner, next_tree_m, next_tree_o).
    """
    B = states.stones.shape[0]
    H = B // 2
    cand_cfg, cur_cfg = _resolve_players(cfg)
    rcap = _reuse_capacity(cfg)
    first_cfg = cand_cfg if cand_first else cur_cfg
    second_cfg = cur_cfg if cand_first else cand_cfg
    fn_first = fn_cand if cand_first else fn_cur
    fn_second = fn_cur if cand_first else fn_cand

    key, k1, k2 = jax.random.split(key, 3)
    if first_cfg == second_cfg and first_cfg.search_type != "puct":
        # Identical programs: one full-batch search (weights still routed
        # per half by _half_eval_fn).
        fn = _half_eval_fn(fn_cand, fn_cur, cand_first)
        res, work = _half_search(k1, states, fn, first_cfg, tree_m, rcap)
        works = (work,)
    else:
        halves = []
        for (sl, fn_h, pcfg, kh) in (
                (slice(0, H), fn_first, first_cfg, k1),
                (slice(H, B), fn_second, second_cfg, k2)):
            st_h = jax.tree_util.tree_map(lambda x: x[sl], states)
            tr_h = (jax.tree_util.tree_map(lambda x: x[sl], tree_m)
                    if tree_m is not None and pcfg.search_type != "puct"
                    else None)
            halves.append(_half_search(kh, st_h, fn_h, pcfg, tr_h, rcap))
        res = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=0),
            halves[0][0], halves[1][0])
        works = (halves[0][1], halves[1][1])

    viol = jax.vmap(superko_violation)(states, res.mcts_move)
    move = jnp.where(viol, PASS_MOVE, res.mcts_move)
    over = jax.vmap(is_game_over)(states) | resigned
    move = jnp.where(over, PASS_MOVE, move)

    # Resignation by the player to move on root OUTCOME value
    # (VOutcome(player_tree) < kResignThreshold, eval.cc:278-283).
    should_resign = (res.root_outcome < cfg.resign_threshold) & ~over
    mover_color = states.to_move
    new_resigned = resigned | should_resign
    winner = jnp.where(should_resign & (winner == 0),
                       (-mover_color).astype(jnp.int8), winner)

    new_states, _ = jax.vmap(step)(states, move)
    active = ~over & ~should_resign
    out_states = jax.tree_util.tree_map(
        lambda new, old: jnp.where(
            jnp.reshape(active, (B,) + (1,) * (new.ndim - 1)), new, old),
        new_states, states)

    # Tree Reap (eval.cc:330-358): the mover's next tree comes from its
    # post-search WORK tree compacted under the played move; the opponent's
    # stored tree advances under the same move. Frozen boards keep trees.
    next_m, next_o = tree_m, tree_o
    if tree_m is not None:
        if len(works) == 1:
            nm = (compact_subtree(works[0], move, rcap)
                  if works[0] is not None else make_tree(B, rcap))
        else:
            parts = []
            for i, (sl, pcfg) in enumerate(((slice(0, H), first_cfg),
                                            (slice(H, B), second_cfg))):
                if works[i] is not None:
                    parts.append(compact_subtree(works[i], move[sl], rcap))
                else:
                    parts.append(make_tree(H, rcap))
            nm = jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b], axis=0), *parts)
        no = compact_subtree(tree_o, move, rcap)
        keep = lambda new, old: jnp.where(
            jnp.reshape(active, (B,) + (1,) * (new.ndim - 1)), new, old)
        next_m = jax.tree_util.tree_map(keep, nm, tree_m)
        next_o = jax.tree_util.tree_map(keep, no, tree_o)

    return out_states, key, new_resigned, winner, next_m, next_o


def _finish(states, resigned, winner, cand_is_black, B) -> EvalResult:
    bs, ws, _ = jax.vmap(score_board)(states)
    score_winner = jnp.where(bs > ws, BLACK, WHITE).astype(jnp.int8)
    final_winner = jnp.where(winner != 0, winner, score_winner)
    cand_color = jnp.where(cand_is_black, BLACK, WHITE).astype(jnp.int8)
    cand_wins = float(jnp.sum(final_winner == cand_color))
    elo, lo, hi = elo_with_ci(cand_wins, B)
    return EvalResult(
        cand_wins=cand_wins, num_games=B, winrate=cand_wins / B,
        elo=elo, elo_lo=lo, elo_hi=hi, by_resign=int(jnp.sum(resigned)))


def run_eval(key: jax.Array, eval_cand: EvalFn, eval_cur: EvalFn,
             cfg: EvalConfig, verbose: bool = False) -> EvalResult:
    """Play cfg.num_games lockstep games; return candidate's relative Elo."""
    B = cfg.num_games
    assert B % 2 == 0
    states = jax.vmap(lambda _: new_state(cfg.komi))(jnp.arange(B))
    cand_is_black = jnp.arange(B) < B // 2
    rcap = _reuse_capacity(cfg)

    # Ply parity t: to_move is BLACK iff t even (lockstep invariant);
    # cand to move <=> (t even) == cand_is_black, so the first half's mover
    # is cand at even plies.
    def make_step(cand_first: bool):
        @jax.jit
        def eval_step(states, key, resigned, winner, tree_m, tree_o):
            return _eval_ply(key, states, resigned, winner, tree_m, tree_o,
                             eval_cand, eval_cur, cfg, cand_first)

        return eval_step

    step_even = make_step(True)
    step_odd = make_step(False)

    tree_b = make_tree(B, rcap) if rcap else None
    tree_w = make_tree(B, rcap) if rcap else None
    resigned = jnp.zeros((B,), jnp.bool_)
    winner = jnp.zeros((B,), jnp.int8)
    for t in range(cfg.max_game_len):
        even = t % 2 == 0
        sfn = step_even if even else step_odd
        tm, to = (tree_b, tree_w) if even else (tree_w, tree_b)
        states, key, resigned, winner, tm, to = sfn(
            states, key, resigned, winner, tm, to)
        tree_b, tree_w = (tm, to) if even else (to, tm)
        done = (jax.vmap(is_game_over)(states) | resigned)
        if bool(jnp.all(done)):
            break

    return _finish(states, resigned, winner, cand_is_black, B)


class EvalRunner:
    """run_eval with model weights as TRACED jit arguments and the two
    ply-parity step programs compiled once — repeated gating evals across
    generations reuse the executables."""

    def __init__(self, model, cfg: EvalConfig):
        self.model = model
        self.cfg = cfg
        self.rcap = _reuse_capacity(cfg)
        self._step_even = self._make_step(True)
        self._step_odd = self._make_step(False)

    def _make_step(self, cand_first: bool):
        from p3achygo_tpu.mcts.gumbel import make_eval_fn

        model, cfg = self.model, self.cfg

        @jax.jit
        def eval_step(states, key, resigned, winner, tree_m, tree_o,
                      cand_v, cur_v):
            fn_cand = make_eval_fn(model, cand_v)
            fn_cur = make_eval_fn(model, cur_v)
            return _eval_ply(key, states, resigned, winner, tree_m, tree_o,
                             fn_cand, fn_cur, cfg, cand_first)

        return eval_step

    def run(self, key: jax.Array, cand_vars, cur_vars) -> EvalResult:
        cfg = self.cfg
        B = cfg.num_games
        assert B % 2 == 0
        states = jax.vmap(lambda _: new_state(cfg.komi))(jnp.arange(B))
        cand_is_black = jnp.arange(B) < B // 2
        tree_b = make_tree(B, self.rcap) if self.rcap else None
        tree_w = make_tree(B, self.rcap) if self.rcap else None
        resigned = jnp.zeros((B,), jnp.bool_)
        winner = jnp.zeros((B,), jnp.int8)
        for t in range(cfg.max_game_len):
            even = t % 2 == 0
            sfn = self._step_even if even else self._step_odd
            tm, to = (tree_b, tree_w) if even else (tree_w, tree_b)
            states, key, resigned, winner, tm, to = sfn(
                states, key, resigned, winner, tm, to, cand_vars, cur_vars)
            tree_b, tree_w = (tm, to) if even else (to, tm)
            done = (jax.vmap(is_game_over)(states) | resigned)
            if bool(jnp.all(done)):
                break

        return _finish(states, resigned, winner, cand_is_black, B)


def run_eval_params(key, model, cand_vars, cur_vars,
                    cfg: EvalConfig) -> EvalResult:
    """One-shot convenience wrapper over EvalRunner."""
    return EvalRunner(model, cfg).run(key, cand_vars, cur_vars)
