"""Fixed-seed reproducibility spec (SURVEY §7: counter-based per-board RNG
instead of the reference's absl::HashOf(worker_id, thread_id) seeding)."""
import jax
import jax.numpy as jnp
import numpy as np

from p3achygo_tpu.game import new_state
from p3achygo_tpu.mcts import SearchParams, search_root, uniform_eval_fn
from p3achygo_tpu.selfplay.loop import (
    SelfplayConfig,
    make_aux,
    make_game_buffer,
    selfplay_step,
)


def _run_selfplay(seed, steps=6):
    B = 4
    cfg = SelfplayConfig(batch_size=B, max_game_len=30, max_raw_policy_moves=4)
    params = SearchParams(n=8, k=4, noise_scale=1.0, max_depth=8)
    key = jax.random.PRNGKey(seed)
    key, kaux = jax.random.split(key)
    states = jax.vmap(lambda _: new_state())(jnp.arange(B))
    buf = make_game_buffer(B, cfg.max_game_len)
    aux = make_aux(kaux, B, cfg.max_raw_policy_moves)
    moves = []
    for _ in range(steps):
        states, buf, aux, key = selfplay_step(
            states, buf, aux, key, uniform_eval_fn, params, cfg,
            selected_tier=True)
    return np.asarray(buf.move), np.asarray(states.stones)


def test_selfplay_deterministic_given_seed():
    m1, s1 = _run_selfplay(11)
    m2, s2 = _run_selfplay(11)
    np.testing.assert_array_equal(m1, m2)
    np.testing.assert_array_equal(s1, s2)


def test_selfplay_differs_across_seeds():
    m1, _ = _run_selfplay(11)
    m2, _ = _run_selfplay(12)
    assert (m1 != m2).any()


def test_search_deterministic_across_jit_boundaries():
    states = jax.vmap(lambda _: new_state())(jnp.arange(2))
    params = SearchParams(n=8, k=4, noise_scale=1.0, tau=0.5)
    r_eager = search_root(jax.random.PRNGKey(3), states, uniform_eval_fn,
                          params)
    r_jit = jax.jit(lambda k, s: search_root(k, s, uniform_eval_fn, params))(
        jax.random.PRNGKey(3), states)
    np.testing.assert_array_equal(np.asarray(r_eager.mcts_move),
                                  np.asarray(r_jit.mcts_move))
    np.testing.assert_allclose(np.asarray(r_eager.pi_improved),
                               np.asarray(r_jit.pi_improved), atol=1e-5)
