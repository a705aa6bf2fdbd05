"""Board engine parity tests, mirroring cases from cc/game/__tests__/board_test.cc."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from p3achygo_tpu.constants import BLACK, EMPTY, NUM_LOCS, NUM_MOVES, PASS_MOVE, WHITE
from p3achygo_tpu.game import (
    GoState,
    MOVE_LOC_NOT_EMPTY,
    MOVE_REPEATED_POSITION,
    MOVE_SELF_CAPTURE,
    MOVE_VALID,
    board_from_dsl,
    compute_pass_alive,
    full_legal_mask,
    is_game_over,
    legal_mask,
    new_state,
    point_liberties,
    score,
    step,
)


def P(i, j):
    return i * 19 + j


def play(state, *moves):
    """Play a move sequence; asserts every move is valid."""
    for m in moves:
        state, status = step(state, jnp.int32(m))
        assert int(status) == MOVE_VALID, f"move {m} -> status {int(status)}"
    return state


def stones_np(state):
    return np.asarray(state.stones)


class TestBasics:
    def test_empty_board(self):
        st = new_state()
        assert stones_np(st).sum() == 0
        assert int(st.to_move) == BLACK
        assert not bool(is_game_over(st))

    def test_place_and_alternate(self):
        st = new_state()
        st = play(st, P(3, 3))
        assert stones_np(st)[P(3, 3)] == BLACK
        assert int(st.to_move) == WHITE
        st = play(st, P(15, 15))
        assert stones_np(st)[P(15, 15)] == WHITE
        assert int(st.to_move) == BLACK

    def test_occupied_is_illegal(self):
        st = play(new_state(), P(3, 3))
        st2, status = step(st, jnp.int32(P(3, 3)))
        assert int(status) == MOVE_LOC_NOT_EMPTY
        # Board unchanged, treated as pass.
        assert stones_np(st2)[P(3, 3)] == BLACK
        assert int(st2.consecutive_passes) == 1

    def test_two_passes_end_game(self):
        st = play(new_state(), PASS_MOVE, PASS_MOVE)
        assert bool(is_game_over(st))

    def test_liberties(self):
        st = play(new_state(), P(0, 0))
        libs = point_liberties(st.stones, st.chain_id)
        assert int(libs[P(0, 0)]) == 2
        st = play(st, P(10, 10), P(0, 1))  # extend corner group
        libs = point_liberties(st.stones, st.chain_id)
        assert int(libs[P(0, 0)]) == 3
        assert int(libs[P(0, 1)]) == 3


class TestCapture:
    def test_single_stone_capture(self):
        # White stone at (0,0) captured by black (0,1), (1,0).
        st = new_state()
        st = play(st, P(0, 1), P(0, 0), P(1, 0))
        assert stones_np(st)[P(0, 0)] == EMPTY
        assert int(st.num_w_prisoners) == 1

    def test_group_capture(self):
        # o o .        x stones surround two whites on the edge
        # x x x
        st = board_from_dsl(
            """
            o o . . .
            x x . . .
            """, to_move=BLACK)
        st = play(st, P(0, 2))
        s = stones_np(st)
        assert s[P(0, 0)] == EMPTY and s[P(0, 1)] == EMPTY
        assert int(st.num_w_prisoners) == 2

    def test_capture_gives_liberties(self):
        # Placing into the last liberty of an enemy group is legal when it
        # captures.
        st = board_from_dsl(
            """
            . x o .
            x o . .
            . x o .
            """, to_move=WHITE)
        # White plays (1,2)? No: black (1,2) would capture o at (1,1).
        st = st._replace(to_move=jnp.int8(BLACK))
        st = play(st, P(1, 2))
        assert stones_np(st)[P(1, 1)] == EMPTY

    def test_multi_group_capture(self):
        # Black move captures two separate white groups simultaneously.
        st = board_from_dsl(
            """
            . x x x .
            x o . o x
            . x x x .
            """, to_move=BLACK)
        st = play(st, P(1, 2))
        s = stones_np(st)
        assert s[P(1, 1)] == EMPTY and s[P(1, 3)] == EMPTY
        assert int(st.num_w_prisoners) == 2


class TestSuicide:
    def test_simple_suicide_illegal(self):
        st = board_from_dsl(
            """
            . o .
            o . o
            . o .
            """, to_move=BLACK)
        mask = np.asarray(legal_mask(st))
        assert not mask[P(1, 1)]
        st2, status = step(st, jnp.int32(P(1, 1)))
        assert int(status) == MOVE_SELF_CAPTURE
        assert stones_np(st2)[P(1, 1)] == EMPTY

    def test_group_suicide_illegal(self):
        # x fills its own last liberty -> illegal.
        st = board_from_dsl(
            """
            o o o .
            o x . o
            o o o .
            """, to_move=BLACK)
        mask = np.asarray(legal_mask(st))
        assert not mask[P(1, 2)]

    def test_capture_not_suicide(self):
        # Placing into a point with no liberties is fine if it captures.
        st = board_from_dsl(
            """
            . x o .
            x o . .
            . x o .
            """, to_move=BLACK)
        mask = np.asarray(legal_mask(st))
        assert mask[P(1, 2)]


class TestKo:
    def _ko_state(self):
        # Classic ko:
        #  . x o .
        #  x o . o
        #  . x o .
        # black plays (1,2), capturing (1,1). White retake at (1,1) = ko.
        st = board_from_dsl(
            """
            . x o .
            x o . o
            . x o .
            """, to_move=BLACK)
        return play(st, P(1, 2))

    def test_ko_point_set(self):
        st = self._ko_state()
        assert int(st.ko_point) == P(1, 1)
        mask = np.asarray(legal_mask(st))
        assert not mask[P(1, 1)]

    def test_ko_retake_is_superko_violation(self):
        st = self._ko_state()
        st2, status = step(st, jnp.int32(P(1, 1)))
        assert int(status) == MOVE_REPEATED_POSITION
        assert stones_np(st2)[P(1, 2)] == BLACK  # unchanged

    def test_ko_legal_after_threat_exchange(self):
        st = self._ko_state()
        # White plays elsewhere; black responds; now retake is legal
        # (different position because of the two extra stones).
        st = play(st, P(10, 10), P(12, 12))
        mask = np.asarray(full_legal_mask(st))
        assert mask[P(1, 1)]
        st = play(st, P(1, 1))
        assert stones_np(st)[P(1, 2)] == EMPTY

    def test_full_mask_matches_dry_run(self):
        st = self._ko_state()
        mask = np.asarray(full_legal_mask(st))
        assert not mask[P(1, 1)]
        assert mask[PASS_MOVE]
        # occupied points illegal
        assert not mask[P(0, 1)]


class TestScoring:
    def test_empty_board_score(self):
        st = new_state(komi=7.5)
        b, w, own = score(st)
        # Tromp-taylor on empty board: no one owns anything.
        assert float(b) == 0.0
        assert float(w) == 7.5

    def test_simple_territory(self):
        # Black wall down column 9 owns nothing yet (both sides open).
        # Build: black wall col 2, white wall col 4 => black owns cols 0-1
        # (2x19=38 + 19 wall = 57), white owns rest.
        rows = []
        for i in range(19):
            row = ["."] * 19
            row[2] = "x"
            row[4] = "o"
            rows.append(" ".join(row))
        st = board_from_dsl("\n".join(rows), komi=7.5)
        b, w, own = score(st)
        own = np.asarray(own).reshape(19, 19)
        assert float(b) == 19 * 3  # cols 0,1 territory + wall
        assert float(w) == 19 * 15 + 7.5  # cols 5-18 + wall; col 3 is dame
        assert (own[:, 0] == BLACK).all()
        assert (own[:, 3] == EMPTY).all()  # dame between walls
        assert (own[:, 5] == WHITE).all()

    def test_dead_stones_in_pass_alive_territory(self):
        # Black pass-alive group with two eyes; dead white stone inside
        # territory is counted for black.
        st = board_from_dsl(
            """
            . x . x .
            x x x x x
            o . . . .
            """, to_move=BLACK)
        b, w, own = score(st)
        pa = np.asarray(compute_pass_alive(st)).reshape(19, 19)
        assert pa[0, 1] == BLACK  # group is pass-alive
        assert pa[0, 0] == BLACK and pa[0, 2] == BLACK  # eyes too


class TestBensonPassAlive:
    def test_two_eye_group_is_pass_alive(self):
        st = board_from_dsl(
            """
            . x . x .
            x x x x x
            """)
        pa = np.asarray(compute_pass_alive(st)).reshape(19, 19)
        assert pa[0, 1] == BLACK
        assert pa[1, 0] == BLACK

    def test_one_eye_group_not_pass_alive(self):
        st = board_from_dsl(
            """
            . x . . .
            x x . . .
            """)
        pa = np.asarray(compute_pass_alive(st))
        assert (pa == 0).all()

    def test_big_eye_not_pass_alive(self):
        # Single large eye space (3 empty points) is not pass-alive (can be
        # killed by consecutive opponent moves).
        st = board_from_dsl(
            """
            . . . x .
            x x x x .
            """)
        pa = np.asarray(compute_pass_alive(st))
        assert (pa == 0).all()


class TestBatched:
    def test_vmap_step(self):
        B = 8
        states = jax.vmap(lambda _: new_state())(jnp.arange(B))
        actions = jnp.array([P(3, 3)] * 4 + [PASS_MOVE] * 4, jnp.int32)
        new_states, statuses = jax.vmap(step)(states, actions)
        assert np.asarray(statuses).tolist() == [MOVE_VALID] * 8
        s = np.asarray(new_states.stones)
        assert (s[:4, P(3, 3)] == BLACK).all()
        assert (s[4:] == 0).all()
        assert np.asarray(new_states.consecutive_passes).tolist() == [0] * 4 + [1] * 4

    def test_jit_step_compiles_once(self):
        jit_step = jax.jit(jax.vmap(step))
        B = 4
        states = jax.vmap(lambda _: new_state())(jnp.arange(B))
        for mv in [P(0, 0), P(5, 5), P(9, 9)]:
            states, _ = jit_step(states, jnp.full((B,), mv, jnp.int32))
        s = np.asarray(states.stones)
        assert (s[:, P(0, 0)] == BLACK).all()
        assert (s[:, P(5, 5)] == WHITE).all()


class TestRandomGamesInvariants:
    """Random playouts: engine invariants hold at every step."""

    def test_random_playout(self):
        rng = np.random.default_rng(7)
        st = new_state()
        for _ in range(120):
            mask = np.asarray(legal_mask(st))
            legal_actions = np.flatnonzero(mask[:NUM_LOCS])
            if len(legal_actions) == 0:
                a = PASS_MOVE
            else:
                a = int(rng.choice(legal_actions))
            st, status = step(st, jnp.int32(a))
            assert int(status) in (MOVE_VALID, MOVE_REPEATED_POSITION)
            # invariant: chain ids consistent with recomputed labels
            s = stones_np(st)
            # every stone has a chain id; every empty has -1
            cid = np.asarray(st.chain_id)
            assert ((cid >= 0) == (s != EMPTY)).all()
            # liberties nonzero for all chains on board
            libs = np.asarray(point_liberties(st.stones, st.chain_id))
            assert (libs[s != EMPTY] > 0).all()


class TestPassAliveEnforcement:
    """In-game pass-alive move bans (board.cc:607-608 kPassAliveRegion +
    self_play_thread.cc:701-705 checkpointed recompute)."""

    def _pa_state(self):
        from p3achygo_tpu.game.scoring import refresh_pass_alive

        st = board_from_dsl(
            """
            . x . x .
            x x x x x
            """, to_move=WHITE)
        states = jax.tree_util.tree_map(lambda x: x[None], st)
        need = jnp.ones((1,), jnp.bool_)
        return refresh_pass_alive(states, need)

    def test_refresh_sets_map_and_bans_moves(self):
        from p3achygo_tpu.game.board import (
            MOVE_PASS_ALIVE_REGION,
            legal_mask,
            step,
        )

        states = self._pa_state()
        pa = np.asarray(states.pass_alive[0]).reshape(19, 19)
        assert pa[0, 0] == BLACK and pa[0, 2] == BLACK  # eyes banned
        st = jax.tree_util.tree_map(lambda x: x[0], states)
        legal = np.asarray(legal_mask(st))
        assert not legal[0 * 19 + 0] and not legal[0 * 19 + 2]
        assert legal[PASS_MOVE]
        # step() refuses the banned point and records a pass
        new_st, status = step(st, jnp.int32(0 * 19 + 2))
        assert int(status) == MOVE_PASS_ALIVE_REGION
        assert int(new_st.consecutive_passes) == 1
        assert np.asarray(new_st.stones).sum() == np.asarray(st.stones).sum()

    def test_refresh_trigger_schedule(self):
        from p3achygo_tpu.game.scoring import pass_alive_refresh_needed
        from p3achygo_tpu.game.board import new_state

        states = jax.vmap(new_state)(jnp.asarray([7.5] * 4))
        states = states._replace(
            move_count=jnp.asarray([150, 201, 260, 100], jnp.int32),
            pa_move=jnp.asarray([0, 0, 250, 0], jnp.int32),
            passes=jnp.asarray([0, 0, 0, 3], jnp.int32),
        )
        need = np.asarray(pass_alive_refresh_needed(states))
        assert not need[0]  # below first checkpoint
        assert need[1]      # crossed 200
        assert not need[2]  # refreshed at 250 already, next is 300
        assert need[3]      # >= 3 passes endgame regime

    def test_noop_when_no_board_needs_it(self):
        from p3achygo_tpu.game.scoring import refresh_pass_alive
        from p3achygo_tpu.game.board import new_state

        states = jax.vmap(new_state)(jnp.asarray([7.5, 7.5]))
        out = refresh_pass_alive(states)
        assert (np.asarray(out.pass_alive) == 0).all()
        assert (np.asarray(out.pa_move) == 0).all()
