"""Cheap vs exact in-tree terminal evaluation: outcome-parity frequency.

VERDICT r2 weak #7 (other half): SearchParams.terminal_mode defaults to
"cheap" (1-step Tromp-Taylor attribution) for in-tree terminal sims; the
reference scores terminals exactly (leaf_evaluator.cc:157-188). This
probe plays full games and compares the cheap terminal (winner + margin)
against exact Benson scoring on every FINISHED position — the positions
in-tree terminal eval actually sees are double-pass states like these.

Usage: PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/terminal_mode_probe.py
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from p3achygo_tpu.game.board import is_game_over, legal_mask_batch, new_state, step
    from p3achygo_tpu.game.scoring import score as score_board
    from p3achygo_tpu.mcts.gumbel import (SearchParams, _cheap_scores,
                                          search_root, uniform_eval_fn)

    B = 32
    ROUNDS = 8
    params = SearchParams(n=16, k=4, max_depth=10)
    key = jax.random.PRNGKey(5)

    cheap_fn = jax.jit(_cheap_scores)
    exact_fn = jax.jit(jax.vmap(score_board))

    @jax.jit
    def play(states, key):
        res = search_root(key, states, uniform_eval_fn, params,
                          tau=jnp.full((B,), 0.4))
        nxt, _ = jax.vmap(step)(states, res.mcts_move)
        return nxt

    games = 0
    winner_flips = 0
    margin_err = []
    for r in range(ROUNDS):
        states = jax.vmap(lambda _: new_state(7.5))(jnp.arange(B))
        for ply in range(350):
            key, k = jax.random.split(key)
            states = play(states, k)
            if bool(jnp.all(jax.vmap(is_game_over)(states))):
                break
        done = np.asarray(jax.vmap(is_game_over)(states))
        cb, cw = (np.asarray(x) for x in cheap_fn(states))
        eb, ew, _ = (np.asarray(x) for x in exact_fn(states))
        for b in np.flatnonzero(done):
            games += 1
            if (cb[b] > cw[b]) != (eb[b] > ew[b]):
                winner_flips += 1
            margin_err.append(abs((cb[b] - cw[b]) - (eb[b] - ew[b])))
        print(f"round {r}: {done.sum()}/{B} finished", flush=True)
    me = np.asarray(margin_err)
    print(f"finished games: {games}")
    print(f"winner flips cheap vs exact: {winner_flips} "
          f"({winner_flips / max(games, 1) * 100:.2f}%)")
    print(f"|margin error|: mean {me.mean():.2f}, p50 {np.median(me):.1f}, "
          f"p95 {np.percentile(me, 95):.1f}, max {me.max():.1f}")


if __name__ == "__main__":
    main()
