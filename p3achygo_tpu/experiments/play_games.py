"""play_games experiment harness (cc/experiments/play_games.cc,
callbacks.h, bias_callback.cc).

Plays full games with per-move callbacks. The reference loops games
sequentially on one NN thread; here `num_games` games run as ONE lockstep
batch — each move searches every live board simultaneously (Gumbel
sequential halving or PUCT by LCB, main.cc:12 --seq_halving) with tree
reuse across moves (root = root->children[move] + Reap,
play_games.cc:46-51 -> compact_subtree).

Callbacks receive host-side numpy views per move:

- PrintCallback — renders the position each move (callbacks.h:18-29).
- BiasCallback — keeps the top-|NN eval − MCTS eval| positions per game
  and per episode in bounded heaps and dumps them at game/episode end
  (bias_callback.cc), surfacing where the net disagrees most with search.
"""
from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from p3achygo_tpu.constants import BLACK, WHITE
from p3achygo_tpu.game.board import is_game_over, new_state, step
from p3achygo_tpu.game.dsl import render
from p3achygo_tpu.game.scoring import score as score_board
from p3achygo_tpu.mcts.gumbel import EvalFn, SearchParams, search_root
from p3achygo_tpu.mcts.puct import PuctParams, search_root_puct
from p3achygo_tpu.mcts.tree import compact_subtree, make_tree


@dataclass
class MoveInfo:
    """Per-board per-move snapshot handed to callbacks (the reference's
    (game, color, root, search_result) tuple, callbacks.h:11-13)."""
    game_idx: int
    move_num: int
    color_to_move: int
    position: np.ndarray  # int8[361] before the move
    last_five_moves: np.ndarray  # int32[5]
    move: int
    nn_eval: float  # root init_util_est
    mcts_eval: float  # root v (w/n)
    nn_v: float  # root init_outcome_est
    mcts_v: float  # root v_outcome
    nn_score: float  # root init_score_est
    mcts_score: float  # root score mean
    num_visits: int


@dataclass
class GameResult:
    game_idx: int
    winner: int  # BLACK/WHITE
    bscore: float
    wscore: float
    num_moves: int

    def __str__(self) -> str:
        w = "B" if self.winner == BLACK else "W"
        margin = (self.bscore - self.wscore if self.winner == BLACK
                  else self.wscore - self.bscore)
        return f"{w}+{margin:g}"


class Callback:
    def on_move(self, info: MoveInfo) -> None:  # pragma: no cover
        pass

    def on_game_end(self, result: GameResult) -> None:  # pragma: no cover
        pass

    def on_episode_end(self) -> None:  # pragma: no cover
        pass


class PrintCallback(Callback):
    """Prints move number + position per move (callbacks.h:18-29)."""

    def __init__(self, out=None):
        import sys
        self.out = out or sys.stderr

    def on_move(self, info: MoveInfo) -> None:
        print(f"Game {info.game_idx} Move Num: {info.move_num}, Position:",
              file=self.out)
        print(render(info.position) + "\n", file=self.out)


@dataclass(order=True)
class _HeapItem:
    bias: float
    seq: int
    info: MoveInfo = field(compare=False)


class _BoundedMinHeap:
    """Keeps the `cap` largest-bias entries (core::Heap used as a bounded
    min-heap in bias_callback.cc:37-39)."""

    def __init__(self, cap: int):
        self.cap = cap
        self._h: List[_HeapItem] = []
        self._seq = 0

    def push(self, bias: float, info: MoveInfo):
        item = _HeapItem(bias, self._seq, info)
        self._seq += 1
        if len(self._h) < self.cap:
            heapq.heappush(self._h, item)
        elif bias > self._h[0].bias:
            heapq.heapreplace(self._h, item)

    def drain_desc(self) -> List[_HeapItem]:
        out = sorted(self._h, key=lambda it: -it.bias)
        self._h = []
        return out


class BiasCallback(Callback):
    """Top-|nn_eval − mcts_eval| positions per game (10) and per episode
    (20), dumped at game/episode end (bias_callback.cc:37-91)."""

    def __init__(self, out=None, per_game: int = 10, per_episode: int = 20):
        import sys
        self.out = out or sys.stdout
        self.per_game_cap = per_game
        self.game_heaps = {}
        self.episode_heap = _BoundedMinHeap(per_episode)

    def on_move(self, info: MoveInfo) -> None:
        bias = abs(info.nn_eval - info.mcts_eval)
        self.game_heaps.setdefault(
            info.game_idx, _BoundedMinHeap(self.per_game_cap)).push(bias, info)
        self.episode_heap.push(bias, info)

    def _dump(self, info: MoveInfo) -> None:
        color = "BLACK" if info.color_to_move == BLACK else "WHITE"
        print(f"Color: {color}", file=self.out)
        print("Last Moves: " + " ".join(str(int(m))
                                        for m in info.last_five_moves),
              file=self.out)
        print("Position", file=self.out)
        print(render(info.position), file=self.out)
        print(f"Num Visits: {info.num_visits}", file=self.out)
        print(f"NN Eval: {info.nn_eval}", file=self.out)
        print(f"MCTS Eval: {info.mcts_eval}", file=self.out)
        print(f"NN Outcome: {info.nn_v}", file=self.out)
        print(f"MCTS Outcome: {info.mcts_v}", file=self.out)
        print(f"NN Score: {info.nn_score}", file=self.out)
        print(f"MCTS Score: {info.mcts_score}", file=self.out)
        print(f"Bias: {info.nn_eval - info.mcts_eval}", file=self.out)
        print("----------------------", file=self.out)

    def on_game_end(self, result: GameResult) -> None:
        print(f"Game Result: {result}", file=self.out)
        print("Dumping Most Biased Positions for Game", file=self.out)
        heap = self.game_heaps.pop(result.game_idx, None)
        if heap:
            for item in heap.drain_desc():
                self._dump(item.info)

    def on_episode_end(self) -> None:
        print("Dumping Most Biased Positions for Episode", file=self.out)
        for item in self.episode_heap.drain_desc():
            self._dump(item.info)


def play_games(eval_fn: EvalFn, num_games: int, visit_count: int,
               seq_halving: bool, callbacks: Sequence[Callback],
               komi: float = 7.5, k: int = 16, max_depth: int = 32,
               max_moves: int = 600, seed: int = 0,
               reuse_capacity: Optional[int] = None) -> List[GameResult]:
    """Play `num_games` lockstep games to completion (PlayGames,
    play_games.cc:15-61). Returns per-game results in index order."""
    B = num_games
    if reuse_capacity is None:
        reuse_capacity = max(visit_count // 2, 16)
    states = jax.vmap(lambda _: new_state(komi))(jnp.arange(B))
    key = jax.random.PRNGKey(seed)
    # Empty init tree (evaluated=False roots are treated as fresh) so every
    # move gets the (result, working_tree) form for stats + compaction.
    tree = make_tree(B, reuse_capacity)

    gp = SearchParams(n=visit_count, k=k, max_depth=max_depth)
    pp = PuctParams(n=visit_count, root_selection="lcb", max_depth=max_depth)

    @jax.jit
    def search_gumbel(key, states, tree):
        res, work = search_root(key, states, eval_fn, gp, init_tree=tree,
                                reuse_capacity=reuse_capacity)
        return res, work

    # Deviation: the reference reuses the node_table across moves for the
    # PUCT kind too (play_games.cc:46-51); search_root_puct takes no
    # init_tree, so PUCT games search fresh each move here.
    @jax.jit
    def search_puct(key, states):
        return search_root_puct(key, states, eval_fn, pp, return_tree=True)

    @jax.jit
    def advance(states, moves, work):
        nxt, statuses = jax.vmap(step)(states, moves)
        carried = compact_subtree(work, moves, reuse_capacity)
        over = jax.vmap(is_game_over)(nxt)
        return nxt, statuses, carried, over

    @jax.jit
    def root_stats(work):
        n = jnp.maximum(work.n[:, 0], 1).astype(jnp.float32)
        return (work.init_util[:, 0], work.w[:, 0] / n,
                work.init_outcome[:, 0], work.w_outcome[:, 0] / n,
                work.init_score[:, 0], work.score_sum[:, 0] / n,
                work.n[:, 0])

    score_batch = jax.jit(jax.vmap(score_board))

    done = np.zeros((B,), bool)
    results: List[Optional[GameResult]] = [None] * B
    for move_num in range(max_moves):
        key, ks = jax.random.split(key)
        if seq_halving:
            res, work = search_gumbel(ks, states, tree)
        else:
            res, work = search_puct(ks, states)

        moves = np.asarray(res.mcts_move)
        stats = [np.asarray(x) for x in root_stats(work)]
        stones_np = np.asarray(states.stones)
        last5_np = np.asarray(states.last_moves)
        colors_np = np.asarray(states.to_move)
        for g in range(B):
            if done[g]:
                continue
            info = MoveInfo(
                game_idx=g, move_num=move_num,
                color_to_move=int(colors_np[g]),
                position=stones_np[g], last_five_moves=last5_np[g],
                move=int(moves[g]),
                nn_eval=float(stats[0][g]), mcts_eval=float(stats[1][g]),
                nn_v=float(stats[2][g]), mcts_v=float(stats[3][g]),
                nn_score=float(stats[4][g]), mcts_score=float(stats[5][g]),
                num_visits=int(stats[6][g]))
            for cb in callbacks:
                cb.on_move(info)

        states, _, tree, over = advance(states, res.mcts_move, work)
        over_np = np.asarray(over)
        newly_done = over_np & ~done
        if newly_done.any():
            bs, ws, _ = score_batch(states)
            bs, ws = np.asarray(bs), np.asarray(ws)
            for g in np.flatnonzero(newly_done):
                results[g] = GameResult(
                    game_idx=int(g),
                    winner=BLACK if bs[g] > ws[g] else WHITE,
                    bscore=float(bs[g]), wscore=float(ws[g]),
                    num_moves=move_num + 1)
                for cb in callbacks:
                    cb.on_game_end(results[g])
        done |= over_np
        if done.all():
            break

    # Score any games that hit max_moves without finishing.
    if not done.all():
        bs, ws, _ = score_batch(states)
        bs, ws = np.asarray(bs), np.asarray(ws)
        for g in np.flatnonzero(~done):
            results[g] = GameResult(
                game_idx=int(g), winner=BLACK if bs[g] > ws[g] else WHITE,
                bscore=float(bs[g]), wscore=float(ws[g]),
                num_moves=max_moves)
            for cb in callbacks:
                cb.on_game_end(results[g])

    for cb in callbacks:
        cb.on_episode_end()
    return results  # type: ignore[return-value]
