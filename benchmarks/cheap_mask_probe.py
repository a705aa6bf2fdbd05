"""How often does the cheap in-tree legality mask admit a superko-illegal
move? (VERDICT r2 weak #7 A/B, frequency half.)

In-tree search uses `legal_mask` (no positional-superko check; exact
superko is enforced on real moves only — documented deviation,
board.cc:637-639). This probe plays realistic selfplay games and, at
every reached position, counts moves the cheap mask allows but
`full_legal_mask` (exact superko) bans — the rate at which a search
descent could step through a superko-illegal move.

Usage: PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/cheap_mask_probe.py
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from p3achygo_tpu.game.board import (full_legal_mask, legal_mask,
                                         legal_mask_batch, new_state, step)
    from p3achygo_tpu.mcts.gumbel import SearchParams, search_root, uniform_eval_fn

    B = 16
    MAX_PLIES = 220
    params = SearchParams(n=16, k=4, max_depth=10)
    states = jax.vmap(lambda _: new_state(7.5))(jnp.arange(B))
    key = jax.random.PRNGKey(3)

    cheap_fn = jax.jit(legal_mask_batch)
    exact_fn = jax.jit(jax.vmap(full_legal_mask))

    @jax.jit
    def play(states, key):
        res = search_root(key, states, uniform_eval_fn, params,
                          tau=jnp.full((B,), 0.5))
        nxt, _ = jax.vmap(step)(states, res.mcts_move)
        return nxt

    total_moves = 0
    total_positions = 0
    violations = 0
    positions_with_any = 0
    by_phase = np.zeros(3, np.int64)  # opening/mid/end violation counts
    for ply in range(MAX_PLIES):
        cheap = np.asarray(cheap_fn(states))
        exact = np.asarray(exact_fn(states))
        # cheap admits, exact bans (the only allowed direction; the
        # reverse would be a bug).
        diff = cheap & ~exact
        assert not (exact & ~cheap).any(), "exact mask admits more than cheap?!"
        v = int(diff.sum())
        violations += v
        positions_with_any += int(diff.any(axis=1).sum())
        total_moves += int(cheap.sum())
        total_positions += B
        by_phase[min(ply // 80, 2)] += v
        key, k = jax.random.split(key)
        states = play(states, k)
    print(f"positions: {total_positions}, legal-move slots: {total_moves}")
    print(f"cheap-mask superko violations: {violations} "
          f"({violations / max(total_moves, 1) * 100:.4f}% of legal slots)")
    print(f"positions with >=1 violation: {positions_with_any} "
          f"({positions_with_any / total_positions * 100:.2f}%)")
    print(f"by phase (ply 0-79 / 80-159 / 160+): {by_phase.tolist()}")


if __name__ == "__main__":
    main()
