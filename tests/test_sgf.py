"""SGF round-trip tests (mirrors cc/sgf/__tests__ coverage)."""
import numpy as np

from p3achygo_tpu.constants import BLACK, PASS_MOVE, WHITE
from p3achygo_tpu.sgf import (
    extract_moves,
    game_info,
    parse_sgf,
    result_string,
    serialize_game,
    sgf_to_loc,
    loc_to_sgf,
)


def P(i, j):
    return i * 19 + j


def test_coord_roundtrip():
    for a in [0, 18, 19 * 18, 360, P(3, 15)]:
        assert sgf_to_loc(loc_to_sgf(a)) == a
    assert loc_to_sgf(PASS_MOVE) == ""
    assert sgf_to_loc("") == PASS_MOVE
    assert sgf_to_loc("tt") == PASS_MOVE
    assert loc_to_sgf(P(2, 3)) == "dc"  # col d, row c


def test_serialize_parse_roundtrip():
    moves = [(BLACK, P(3, 3)), (WHITE, P(15, 15)), (BLACK, PASS_MOVE),
             (WHITE, P(9, 9))]
    text = serialize_game(moves, komi=6.5, result="W+2.5")
    root = parse_sgf(text)
    info = game_info(root)
    assert info["komi"] == 6.5
    assert info["result"] == "W+2.5"
    assert info["board_size"] == 19
    assert extract_moves(root) == moves


def test_parse_variations_main_line():
    text = "(;GM[1]SZ[19];B[dd](;W[qq];B[dc])(;W[pp]))"
    root = parse_sgf(text)
    moves = extract_moves(root)
    # main line takes the first variation
    assert moves == [(BLACK, sgf_to_loc("dd")), (WHITE, sgf_to_loc("qq")),
                     (BLACK, sgf_to_loc("dc"))]


def test_parse_escapes():
    text = "(;GM[1]C[a \\] bracket];B[dd])"
    root = parse_sgf(text)
    assert root.get("C") == "a ] bracket"


def test_result_string():
    assert result_string(180.0, 172.5) == "B+7.5"
    assert result_string(170.0, 180.5) == "W+10.5"
    assert result_string(0, 0, by_resign=True, winner=BLACK) == "B+R"


def test_serialize_game_with_tree_variations():
    """Full-tree SGF (sgf_recorder.cc PopulateTree): visited children
    become variations with stat comments, parseable by our own parser."""
    import jax
    import jax.numpy as jnp

    from p3achygo_tpu.constants import BLACK, WHITE
    from p3achygo_tpu.game.board import new_state
    from p3achygo_tpu.mcts.gumbel import (SearchParams, search_root,
                                          uniform_eval_fn)
    from p3achygo_tpu.mcts.tree import make_tree
    from p3achygo_tpu.sgf import (extract_moves, parse_sgf,
                                  serialize_game_with_tree)

    states = jax.vmap(new_state)(jnp.asarray([7.5]))
    init = make_tree(1, 18)
    p = SearchParams(n=16, k=4, noise_scale=0.0, max_depth=8)
    _, work = search_root(jax.random.PRNGKey(5), states, uniform_eval_fn, p,
                          init_tree=init, reuse_capacity=18)
    moves = [(BLACK, 60), (WHITE, 72)]
    text = serialize_game_with_tree(moves, work, komi=7.5)
    root = parse_sgf(text)
    assert extract_moves(root)[:2] == moves
    # variations exist (the root had >= 2 visited children at n=16/k=4)
    assert "Root Color:" in text and "nn_score_est" in text
    assert text.count("(") >= 3  # game tree + >=2 variation branches
    # every visited root child appears as a variation move
    import numpy as np
    en = np.asarray(work.edge_n[0, 0])
    n_vis = int((en > 0).sum())
    assert n_vis >= 2
