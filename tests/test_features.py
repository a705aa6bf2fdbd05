"""Featurizer parity tests (vs go_features.cc:10-62 semantics)."""
import jax
import jax.numpy as jnp
import numpy as np

from p3achygo_tpu.constants import BLACK, PASS_MOVE, WHITE
from p3achygo_tpu.features import features
from p3achygo_tpu.game import board_from_dsl, new_state, step


def P(i, j):
    return i * 19 + j


def test_shapes():
    planes, scalars = features(new_state())
    assert planes.shape == (19, 19, 15)
    assert scalars.shape == (8,)


def test_stone_planes_perspective():
    st = board_from_dsl("x o", to_move=BLACK)
    planes, scalars = features(st)
    p = np.asarray(planes)
    assert p[0, 0, 0] == 1.0 and p[0, 1, 0] == 0.0  # own = black
    assert p[0, 1, 1] == 1.0 and p[0, 0, 1] == 0.0  # opp = white
    assert np.asarray(scalars)[0] == 1.0 and np.asarray(scalars)[1] == 0.0
    # white to move: perspectives flip
    st_w = st._replace(to_move=jnp.int8(WHITE))
    planes_w, scalars_w = features(st_w)
    pw = np.asarray(planes_w)
    assert pw[0, 1, 0] == 1.0 and pw[0, 0, 1] == 1.0
    assert np.asarray(scalars_w)[1] == 1.0


def test_last_move_planes_and_pass_flags():
    st = new_state()
    st, _ = step(st, jnp.int32(P(3, 3)))  # black
    st, _ = step(st, jnp.int32(PASS_MOVE))  # white pass
    st, _ = step(st, jnp.int32(P(5, 5)))  # black
    planes, scalars = features(st)
    p, s = np.asarray(planes), np.asarray(scalars)
    # newest move (5,5) in channel 6; (3,3) two moves ago in channel 4;
    # pass move produces no plane but sets scalar flag slot 3+2=5.
    assert p[5, 5, 6] == 1.0
    assert p[3, 3, 4] == 1.0
    assert p[:, :, 5].sum() == 0.0  # pass move: no one-hot
    assert s[5] == 1.0  # pass flag for slot k-2
    assert s[6] == 0.0


def test_liberty_planes():
    # black corner stone with 1 liberty; white neighbor with 2 liberties
    st = board_from_dsl(
        """
        x o . . .
        . . . . .
        """, to_move=BLACK)
    planes, _ = features(st)
    p = np.asarray(planes)
    assert p[0, 0, 7] == 1.0  # own atari: (0,0) only liberty is (1,0)
    # white (0,1): liberties = (0,2),(1,1) = 2 libs -> opp 2-lib plane
    assert p[0, 1, 10] == 1.0
    assert p[0, 1, 8] == 0.0


def test_komi_scalar_sign():
    st = new_state(komi=7.5)
    _, s_b = features(st)
    assert np.isclose(np.asarray(s_b)[7], -0.5)
    st_w = st._replace(to_move=jnp.int8(WHITE))
    _, s_w = features(st_w)
    assert np.isclose(np.asarray(s_w)[7], 0.5)


def test_vmapped():
    B = 4
    states = jax.vmap(lambda _: new_state())(jnp.arange(B))
    planes, scalars = jax.vmap(lambda s: features(s))(states)
    assert planes.shape == (B, 19, 19, 15)
    assert scalars.shape == (B, 8)


def test_state_level_symmetrize_matches_plane_level():
    """make_eval_fn's state-level symmetrize (flip/transpose the stone and
    chain grids BEFORE featurizing) must produce exactly the planes the old
    path produced by featurizing first and gather-transforming the planes
    (nn_interface.cc:123-127 random-symmetry semantics)."""
    from p3achygo_tpu.features import batched_features
    from p3achygo_tpu.game.symmetry import (
        NUM_SYMMETRIES,
        apply_symmetry_action,
        apply_symmetry_grid,
        apply_symmetry_grid_batch,
    )

    # a position with chains, captures nearby, a recent move history
    st = new_state()
    rng = np.random.RandomState(7)
    for mv in [P(3, 3), P(3, 4), P(15, 16), P(4, 3), P(0, 0), P(4, 4),
               PASS_MOVE, P(10, 2), P(2, 3), P(9, 9)]:
        st, _ = step(st, jnp.int32(mv))

    B = NUM_SYMMETRIES
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), st)
    sym = jnp.arange(B, dtype=jnp.int32)

    # plane-level (reference path)
    planes, scalars = batched_features(states, include_ladders=False)
    want = jax.vmap(
        lambda p, s: apply_symmetry_grid(
            p.reshape(361, 15).T, s).T.reshape(19, 19, 15))(planes, sym)

    # state-level (new path)
    sym_states = states._replace(
        stones=apply_symmetry_grid_batch(states.stones, sym),
        chain_id=apply_symmetry_grid_batch(states.chain_id, sym),
        last_moves=jax.vmap(apply_symmetry_action)(states.last_moves, sym),
    )
    got, scalars2 = batched_features(sym_states, include_ladders=False)

    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(scalars), np.asarray(scalars2))
