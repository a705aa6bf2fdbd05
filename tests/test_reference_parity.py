"""Move-sequence / legality / score / pass-alive / ladder parity against the
REFERENCE board engine (BASELINE.md acceptance criterion).

tests/parity/board_oracle.cc compiles the reference sources
(/root/reference/cc/game/board.cc etc., via the absl shims in tests/parity)
into a line-protocol driver; these tests play the SAME fixed-seed move
sequences on both engines and compare stones, legality verdicts, scores,
ownership, Benson maps and laddered stones.
"""
import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from p3achygo_tpu.constants import BLACK, EMPTY, NUM_LOCS, PASS_MOVE, WHITE
from p3achygo_tpu.game.board import (
    GoState,
    full_legal_mask,
    is_game_over,
    new_state,
    step,
)
from p3achygo_tpu.game.scoring import compute_pass_alive, score

REF = "/root/reference"
PARITY_DIR = os.path.join(os.path.dirname(__file__), "parity")
ORACLE_BIN = "/tmp/p3achygo_board_oracle"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not present")


def _build_oracle():
    if os.path.exists(ORACLE_BIN):
        return ORACLE_BIN
    cmd = [
        "g++", "-std=c++20", "-O2", "-w", f"-I{PARITY_DIR}", f"-I{REF}",
        os.path.join(PARITY_DIR, "board_oracle.cc"),
        f"{REF}/cc/game/board.cc", f"{REF}/cc/game/board_dsl.cc",
        f"{REF}/cc/game/zobrist.cc", f"{REF}/cc/core/rand.cc",
        "-o", ORACLE_BIN,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return ORACLE_BIN


class Oracle:
    """Line-protocol client for the reference board driver."""

    def __init__(self, komi=7.5, prohibit_pa=False):
        self.proc = subprocess.Popen(
            [_build_oracle()], stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            text=True, bufsize=1)
        self._cmd(f"new {komi} {1 if prohibit_pa else 0}")

    def _cmd(self, line, lines=1):
        self.proc.stdin.write(line + "\n")
        self.proc.stdin.flush()
        return [self.proc.stdout.readline().rstrip("\n") for _ in range(lines)]

    def play(self, color, flat):
        st, board = self._cmd(f"play {'b' if color == BLACK else 'w'} {flat}",
                              lines=2)
        return int(st.split()[1]), _parse_board(board)

    def legal(self, color):
        (s,) = self._cmd(f"legal {'b' if color == BLACK else 'w'}")
        return np.frombuffer(s.encode(), np.uint8) == ord("1")

    def score(self):
        head, own = self._cmd("score", lines=2)
        _, b, w = head.split()
        return float(b), float(w), _parse_board(own)

    def pass_alive(self):
        (s,) = self._cmd("pa")
        return _parse_board(s)

    def set_board(self, stones):
        chars = np.full(NUM_LOCS, ".", "U1")
        chars[stones == BLACK] = "x"
        chars[stones == WHITE] = "o"
        (ok,) = self._cmd("set " + "".join(chars))
        assert ok == "ok"

    def ladders(self):
        (s,) = self._cmd("ladders")
        return _parse_board(s)

    def game_over(self):
        (s,) = self._cmd("gameover")
        return bool(int(s.split()[1]))

    def close(self):
        try:
            self._cmd("quit", lines=0)
            self.proc.wait(timeout=5)
        except Exception:
            self.proc.kill()


def _parse_board(s):
    arr = np.frombuffer(s.encode(), np.uint8)
    out = np.zeros(NUM_LOCS, np.int8)
    out[arr == ord("x")] = BLACK
    out[arr == ord("o")] = WHITE
    return out


# Reference MoveStatus (board.h:54-62) -> repo codes (board.py:53-59).
REF_STATUS = {0: 0, 1: 1, 2: 2, 3: 3, 4: 6, 5: 4, 6: 5}


def _random_game_parity(seed, plies, check_legal_every=10, komi=7.5,
                        init_state=None, init_oracle=None):
    """Play a fixed-seed random legal game on both engines in lockstep.

    `init_state`/`init_oracle` optionally start from a prepared position
    (handicap-start coverage); default is an empty board."""
    rng = np.random.default_rng(seed)
    st = init_state if init_state is not None else new_state(komi)
    oracle = init_oracle if init_oracle is not None else Oracle(komi=komi)
    legal_fn = jax.jit(full_legal_mask)
    step_fn = jax.jit(step)
    try:
        for ply in range(plies):
            color = int(st.to_move)
            ours = np.asarray(legal_fn(st))
            if ply % check_legal_every == 0:
                theirs = oracle.legal(color)
                np.testing.assert_array_equal(
                    ours, theirs, err_msg=f"legal mask diverged ply {ply}")
            choices = np.flatnonzero(ours[:NUM_LOCS])
            if len(choices) == 0:
                move = PASS_MOVE
            # bias toward board moves; occasional pass
            elif rng.uniform() < 0.03:
                move = PASS_MOVE
            else:
                move = int(rng.choice(choices))
            st, status = step_fn(st, jnp.int32(move))
            ref_status, ref_board = oracle.play(color, move)
            assert REF_STATUS[ref_status] == int(status), \
                f"status diverged ply {ply} move {move}"
            np.testing.assert_array_equal(
                np.asarray(st.stones), ref_board,
                err_msg=f"stones diverged ply {ply} move {move}")
            if bool(is_game_over(st)):
                assert oracle.game_over()
                break
        return st, oracle
    except Exception:
        oracle.close()
        raise


def test_random_game_move_parity():
    for seed in (0, 1):
        st, oracle = _random_game_parity(seed, plies=120)
        oracle.close()


def test_score_and_ownership_parity():
    st, oracle = _random_game_parity(7, plies=180)
    try:
        b_ref, w_ref, own_ref = oracle.score()
        b, w, own = score(st)
        assert float(b) == pytest.approx(b_ref)
        assert float(w) == pytest.approx(w_ref)
        np.testing.assert_array_equal(np.asarray(own), own_ref)
    finally:
        oracle.close()


def test_pass_alive_parity():
    # Build a two-eye black corner group by alternating legal play; white
    # answers far away. Compare full Benson maps afterwards.
    black_moves = [0 * 19 + 1, 1 * 19 + 0, 1 * 19 + 1, 1 * 19 + 2,
                   0 * 19 + 3, 1 * 19 + 3, 1 * 19 + 4, 0 * 19 + 5,
                   1 * 19 + 5]
    white_moves = [18 * 19 + j for j in range(len(black_moves))]
    st = new_state(7.5)
    oracle = Oracle(komi=7.5)
    try:
        for bm, wm in zip(black_moves, white_moves):
            for color, mv in ((BLACK, bm), (WHITE, wm)):
                st, status = step(st, jnp.int32(mv))
                ref_status, _ = oracle.play(color, mv)
                assert int(status) == REF_STATUS[ref_status] == 0
        ours = np.asarray(compute_pass_alive(st))
        theirs = oracle.pass_alive()
        np.testing.assert_array_equal(ours, theirs)
        assert (ours != 0).any()  # the corner group is pass-alive
    finally:
        oracle.close()


def test_pass_alive_parity_random_endgames():
    """Benson maps agree on random positions too (usually empty, sometimes
    not — either way they must match)."""
    for seed in (3, 5):
        st, oracle = _random_game_parity(seed, plies=220, check_legal_every=999)
        try:
            ours = np.asarray(compute_pass_alive(st))
            theirs = oracle.pass_alive()
            np.testing.assert_array_equal(ours, theirs)
        finally:
            oracle.close()


def _play_both(st, oracle, moves):
    for color, mv in moves:
        st, status = step(st, jnp.int32(mv))
        ref_status, _ = oracle.play(color, mv)
        assert int(status) == REF_STATUS[ref_status] == 0
    return st


def _ij(i, j):
    return i * 19 + j


# --- ladder parity: the reference's own test positions ---
# (board positions from cc/game/__tests__/board_test.cc LadderTest; each
# scenario = (black stones, white stones, expected-laddered points,
# expected-free points)).
_L_BASE_B = [(15, 1), (16, 1), (16, 3), (17, 2)]
_L_BASE_W = [(16, 2)]
LADDER_SCENARIOS = {
    "SimpleLadder": (_L_BASE_B, _L_BASE_W, [(16, 2)], []),
    "SimpleBrokenLadder": (_L_BASE_B, _L_BASE_W + [(3, 15)], [], [(16, 2)]),
    "AtariBrokenLadder": (_L_BASE_B, _L_BASE_W + [(5, 15)], [], [(16, 2)]),
    "DirectionLadder": (
        [(4, 2), (4, 6), (4, 7), (4, 8), (5, 1), (5, 4), (6, 2), (6, 3)],
        [(5, 2), (5, 3)], [(5, 2), (5, 3)], []),
    "DoubleLadder": (
        _L_BASE_B + [(8, 15)],
        _L_BASE_W + [(7, 15), (8, 14), (8, 16), (9, 16)],
        [(16, 2), (8, 15)], []),
    "NoLadder": (
        [(16, 1), (16, 3), (17, 2)], _L_BASE_W, [], [(16, 2)]),
}


@pytest.mark.parametrize("name", sorted(LADDER_SCENARIOS))
def test_ladder_parity_reference_cases(name):
    """Reference LadderTest positions: the recursive solver
    (board.cc:692-899) and our bounded chase (game/ladder.py) must agree
    on the laddered-stones map."""
    from p3achygo_tpu.game.board import from_stones
    from p3achygo_tpu.game.ladder import laddered_stones

    blacks, whites, laddered, free = LADDER_SCENARIOS[name]
    stones = np.zeros(NUM_LOCS, np.int8)
    for i, j in blacks:
        stones[_ij(i, j)] = BLACK
    for i, j in whites:
        stones[_ij(i, j)] = WHITE
    st = from_stones(jnp.asarray(stones), 7.5)
    oracle = Oracle(komi=7.5)
    try:
        oracle.set_board(stones)
        theirs = oracle.ladders() != 0
        ours = np.asarray(laddered_stones(st))
        for i, j in laddered:
            assert theirs[_ij(i, j)], f"{name}: oracle disagrees with ref"
        for i, j in free:
            assert not theirs[_ij(i, j)], f"{name}: oracle disagrees"
        np.testing.assert_array_equal(
            ours, theirs, err_msg=f"{name}: ladder maps diverge")
    finally:
        oracle.close()


# --- endgame / komi / handicap coverage (VERDICT r2 weak #9) ---

def test_double_pass_end_parity():
    """Consecutive-pass game-end semantics (board.cc IsGameOver: two
    consecutive passes): force pass/pass after a random middlegame and
    compare game-over flags and exact scores."""
    st, oracle = _random_game_parity(11, plies=60, check_legal_every=999)
    try:
        step_fn = jax.jit(step)
        for _ in range(2):
            color = int(st.to_move)
            st, status = step_fn(st, jnp.int32(PASS_MOVE))
            ref_status, _ = oracle.play(color, PASS_MOVE)
            assert int(status) == REF_STATUS[ref_status] == 0
        assert bool(is_game_over(st)) and oracle.game_over()
        b_ref, w_ref, own_ref = oracle.score()
        b, w, own = score(st)
        assert float(b) == pytest.approx(b_ref)
        assert float(w) == pytest.approx(w_ref)
        np.testing.assert_array_equal(np.asarray(own), own_ref)
    finally:
        oracle.close()


@pytest.mark.parametrize("komi", [0.5, 5.5, 9.5])
def test_komi_sweep_score_parity(komi):
    """Score parity across komi values (game.h:15 komi plumbed through
    Scores; rl/loop.py randomizes komi over ~4.5..10.5)."""
    st, oracle = _random_game_parity(13, plies=140, check_legal_every=70,
                                     komi=komi)
    try:
        b_ref, w_ref, _ = oracle.score()
        b, w, _ = score(st)
        assert float(b) == pytest.approx(b_ref)
        assert float(w) == pytest.approx(w_ref)
        assert w - b == pytest.approx(w_ref - b_ref)
    finally:
        oracle.close()


@pytest.mark.parametrize("handicap", [2, 3, 4])
def test_handicap_start_parity(handicap):
    """Handicap starts (board.cc:466-492 kHandicapStones; used by
    rl/loop.py _build_restart_batch): black stones pre-placed, WHITE
    moves first; move/legality/stones parity over a random game, then
    score parity."""
    from p3achygo_tpu.game.board import from_stones

    HANDICAP_STONES = (15 * 19 + 3, 3 * 19 + 15, 3 * 19 + 3, 15 * 19 + 15)
    stones = np.zeros(NUM_LOCS, np.int8)
    for loc in HANDICAP_STONES[:handicap]:
        stones[loc] = BLACK
    st = from_stones(jnp.asarray(stones), 7.5, to_move=WHITE)
    oracle = Oracle(komi=7.5)
    try:
        oracle.set_board(stones)
        st, oracle = _random_game_parity(17 + handicap, plies=100,
                                         check_legal_every=25,
                                         init_state=st, init_oracle=oracle)
        b_ref, w_ref, own_ref = oracle.score()
        b, w, own = score(st)
        assert float(b) == pytest.approx(b_ref)
        assert float(w) == pytest.approx(w_ref)
        np.testing.assert_array_equal(np.asarray(own), own_ref)
    finally:
        oracle.close()
