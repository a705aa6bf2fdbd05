"""Ladder feature tests (bounded greedy chase vs textbook positions)."""
import jax.numpy as jnp
import numpy as np

from p3achygo_tpu.constants import BLACK, WHITE
from p3achygo_tpu.game import board_from_dsl
from p3achygo_tpu.game.ladder import laddered_stones


def _grid(*stones_by_color):
    """Build a 19x19 DSL from {(i, j): 'x'|'o'} dicts."""
    g = [["." for _ in range(19)] for _ in range(19)]
    for d in stones_by_color:
        for (i, j), ch in d.items():
            g[i][j] = ch
    return "\n".join(" ".join(row) for row in g)


def test_working_ladder():
    # Minimal working ladder: black north + west + NE-diagonal of W(9,9);
    # the ladder zigzags to the SE edge and captures.
    dsl = _grid({(8, 9): "x", (9, 8): "x", (8, 10): "x"}, {(9, 9): "o"})
    st = board_from_dsl(dsl, to_move=BLACK)
    lad = np.asarray(laddered_stones(st)).reshape(19, 19)
    assert lad[9, 9]
    assert lad.sum() == 1  # the driving black stones are not laddered


def test_ladder_breaker_escapes():
    # Same shape with a white stone on the SE escape path: not laddered.
    dsl = _grid({(8, 9): "x", (9, 8): "x", (8, 10): "x"},
                {(9, 9): "o", (15, 15): "o"})
    st = board_from_dsl(dsl, to_move=BLACK)
    lad = np.asarray(laddered_stones(st)).reshape(19, 19)
    assert not lad[9, 9]


def test_bare_crosscut_not_laddered():
    # A bare crosscut is NOT a working ladder (each extension reaches 3
    # liberties with no driving wall).
    dsl = _grid({(9, 10): "x", (10, 9): "x"}, {(9, 9): "o", (10, 10): "o"})
    st = board_from_dsl(dsl, to_move=BLACK)
    lad = np.asarray(laddered_stones(st)).reshape(19, 19)
    assert not lad[9, 9]


def test_lone_two_liberty_stone_not_laddered():
    # A lone stone with 2 libs and no driving wall escapes (extension gains
    # 3 liberties immediately).
    dsl = _grid({(0, 1): "x", (1, 0): "x"}, {(1, 1): "o"})
    st = board_from_dsl(dsl, to_move=BLACK)
    lad = np.asarray(laddered_stones(st)).reshape(19, 19)
    assert not lad[1, 1]


def test_safe_group_not_marked():
    dsl = _grid({}, {(5, 5): "o", (5, 6): "o", (6, 5): "o", (6, 6): "o"})
    st = board_from_dsl(dsl, to_move=BLACK)
    lad = np.asarray(laddered_stones(st))
    assert not lad.any()


def test_dead_atari_group_marked():
    # White corner stone in atari whose only extension point stays at 1 lib.
    dsl = _grid({(0, 1): "x", (1, 1): "x", (2, 0): "x"}, {(0, 0): "o"})
    st = board_from_dsl(dsl, to_move=WHITE)
    lad = np.asarray(laddered_stones(st)).reshape(19, 19)
    assert lad[0, 0]
