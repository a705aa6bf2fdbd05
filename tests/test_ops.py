"""Pallas kernel parity tests (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from p3achygo_tpu.game import board_from_dsl, new_state, step
from p3achygo_tpu.ops.liberties import (
    point_liberties_batch,
    point_liberties_reference,
)


def _random_states(B, moves, seed):
    rng = np.random.default_rng(seed)
    states = jax.vmap(lambda _: new_state())(jnp.arange(B))
    from p3achygo_tpu.game import legal_mask
    for _ in range(moves):
        masks = np.asarray(jax.vmap(legal_mask)(states))
        acts = np.array([rng.choice(np.flatnonzero(m[:361]))
                         for m in masks], np.int32)
        states, _ = jax.vmap(step)(states, jnp.asarray(acts))
    return states


def test_kernel_matches_reference_on_random_boards():
    states = _random_states(B=5, moves=40, seed=11)
    ref = np.asarray(point_liberties_reference(states.stones, states.chain_id))
    ker = np.asarray(point_liberties_batch(states.stones, states.chain_id,
                                           interpret=True))
    np.testing.assert_array_equal(ker, ref)


def test_kernel_on_dsl_position():
    st = board_from_dsl(
        """
        x o . . .
        . o o . .
        x x . . .
        """)
    stones = st.stones[None]
    chain = st.chain_id[None]
    ref = np.asarray(point_liberties_reference(stones, chain))
    ker = np.asarray(point_liberties_batch(stones, chain, interpret=True))
    np.testing.assert_array_equal(ker, ref)
    # spot check: white chain (0,1),(1,1),(1,2) libs:
    # (0,2),(1,0),(2,2),(1,3) = 4
    assert ker[0, 1] == 4


def test_kernel_odd_batch_padding():
    states = _random_states(B=3, moves=10, seed=5)
    ref = np.asarray(point_liberties_reference(states.stones, states.chain_id))
    ker = np.asarray(point_liberties_batch(states.stones, states.chain_id,
                                           interpret=True))
    np.testing.assert_array_equal(ker, ref)
