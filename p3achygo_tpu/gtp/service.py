"""GTP engine service (replaces cc/gtp/, 2,216 LoC C++).

The reference runs a stdin thread -> command queue -> service thread ->
response queue -> stdout thread (client.h:23-103) because its engine
blocks on a shared GPU batcher. Here a genmove is one jitted call on the
chip, so a plain synchronous loop suffices; analysis/pondering can layer
asyncio on top later. Command set mirrors service.h:20-65 (core GTP +
ownership/final_score extensions).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from p3achygo_tpu.constants import BLACK, BOARD_LEN, PASS_MOVE, WHITE
from p3achygo_tpu.game.board import (
    GoState,
    dry_run_status,
    is_game_over,
    new_state,
    step,
)
from p3achygo_tpu.game.scoring import score as score_board
from p3achygo_tpu.gtp.time_control import TimeControl
from p3achygo_tpu.mcts.gumbel import EvalFn, SearchParams, search_root
from p3achygo_tpu.sgf import extract_moves, parse_sgf

_COLS = "ABCDEFGHJKLMNOPQRST"  # GTP skips I


def gtp_vertex_to_action(vertex: str) -> int:
    v = vertex.strip().upper()
    if v == "PASS":
        return PASS_MOVE
    col = _COLS.index(v[0])
    row = int(v[1:])  # 1 = bottom row
    i = BOARD_LEN - row
    return i * BOARD_LEN + col


def action_to_gtp_vertex(action: int) -> str:
    if action < 0 or action >= PASS_MOVE:
        return "pass"
    i, j = divmod(int(action), BOARD_LEN)
    return f"{_COLS[j]}{BOARD_LEN - i}"


def parse_color(s: str) -> int:
    s = s.strip().lower()
    if s in ("b", "black"):
        return BLACK
    if s in ("w", "white"):
        return WHITE
    raise ValueError(f"bad color {s!r}")


@dataclasses.dataclass
class GtpConfig:
    search: SearchParams = dataclasses.field(
        default_factory=lambda: SearchParams(n=128, k=8, noise_scale=0.0,
                                             tau=0.0))
    name: str = "p3achygo_tpu"
    version: str = "0.1"


class GtpService:
    """Stateful GTP engine over a single board (batch of 1)."""

    COMMANDS = [
        "protocol_version", "name", "version", "known_command",
        "list_commands", "quit", "boardsize", "clear_board", "komi", "play",
        "genmove", "showboard", "final_score", "undo", "loadsgf",
        "p3achygo-ownership", "time_settings", "time_left", "lz-analyze",
    ]

    def __init__(self, eval_fn: EvalFn, config: Optional[GtpConfig] = None):
        self.eval_fn = eval_fn
        self.config = config or GtpConfig()
        self.komi = 7.5
        self._history: List[GoState] = []
        self.state = self._fresh()
        self.key = jax.random.PRNGKey(0)
        self.time_control = TimeControl()
        self._last_root_v = None
        self._search_cache = {}
        self._search = self._get_search(self.config.search.n)

    def _get_search(self, n: int):
        """Per-visit-count jitted search (time control picks among sizes)."""
        if n not in self._search_cache:
            import dataclasses as _dc

            params = _dc.replace(self.config.search, n=n)
            self._search_cache[n] = jax.jit(
                lambda key, st: search_root(
                    key, jax.tree_util.tree_map(lambda x: x[None], st),
                    self.eval_fn, params))
        return self._search_cache[n]

    def _fresh(self) -> GoState:
        return new_state(self.komi)

    # ---------------- command dispatch ----------------
    def handle(self, line: str) -> Tuple[bool, str]:
        """-> (ok, response). Raises SystemExit on quit."""
        parts = line.strip().split()
        if not parts:
            return True, ""
        # optional numeric id
        cmd_id = ""
        if parts[0].isdigit():
            cmd_id = parts[0]
            parts = parts[1:]
        if not parts:
            return True, ""
        cmd, args = parts[0], parts[1:]
        fn = getattr(self, f"cmd_{cmd.replace('-', '_')}", None)
        if cmd == "p3achygo-ownership":
            fn = self.cmd_ownership
        if fn is None:
            return False, "unknown command"
        try:
            return True, fn(*args)
        except SystemExit:
            raise
        except Exception as e:  # GTP failure response
            return False, str(e)

    # ---------------- commands ----------------
    def cmd_protocol_version(self):
        return "2"

    def cmd_name(self):
        return self.config.name

    def cmd_version(self):
        return self.config.version

    def cmd_known_command(self, cmd=""):
        return "true" if cmd in self.COMMANDS else "false"

    def cmd_list_commands(self):
        return "\n".join(self.COMMANDS)

    def cmd_quit(self):
        raise SystemExit

    def cmd_boardsize(self, size=""):
        if int(size) != BOARD_LEN:
            raise ValueError(f"unacceptable size (compiled for {BOARD_LEN})")
        return ""

    def cmd_clear_board(self):
        self._history = []
        self.state = self._fresh()
        return ""

    def cmd_komi(self, value=""):
        self.komi = float(value)
        self.state = self.state._replace(komi=jnp.float32(self.komi))
        return ""

    def cmd_play(self, color="", vertex=""):
        c = parse_color(color)
        action = gtp_vertex_to_action(vertex)
        st = self.state
        if int(st.to_move) != c:
            # GTP allows out-of-turn play; flip the mover.
            st = st._replace(to_move=jnp.int8(c))
        status = int(dry_run_status(st, jnp.int32(action)))
        if status != 0:
            raise ValueError("illegal move")
        self._history.append(self.state)
        self.state, _ = step(st, jnp.int32(action))
        return ""

    def cmd_undo(self):
        if not self._history:
            raise ValueError("cannot undo")
        self.state = self._history.pop()
        return ""

    def cmd_genmove(self, color=""):
        import time as _time

        c = parse_color(color)
        st = self.state
        if int(st.to_move) != c:
            st = st._replace(to_move=jnp.int8(c))
        budget = self.time_control.compute_move_time_ms(
            int(st.move_count), self._last_root_v)
        nmax = self.config.search.n
        choices = tuple(n for n in (16, 32, 64, 128, 256, 512) if n <= nmax)             or (nmax,)
        n = self.time_control.pick_visits(budget, choices, default=nmax)
        self.key, ks = jax.random.split(self.key)
        t0 = _time.time()
        res = self._get_search(n)(ks, st)
        action = int(res.mcts_move[0])
        self.time_control.observe_search(
            (_time.time() - t0) * 1000.0, int(res.visits[0]))
        self._last_root_v = float(res.root_value[0])
        self._history.append(self.state)
        self.state, _ = step(st, jnp.int32(action))
        return action_to_gtp_vertex(action)

    def cmd_time_settings(self, main_s="0", byo_s="0", byo_stones="0"):
        self.time_control.set_time_settings(int(main_s), int(byo_s),
                                            int(byo_stones))
        return ""

    def cmd_time_left(self, color="", seconds="0", stones="0"):
        secs, stones = int(seconds), int(stones)
        if stones > 0:
            self.time_control.set_time_left(0, secs, stones)
        else:
            self.time_control.set_time_left(secs, 0, 0)
        return ""

    def cmd_lz_analyze(self, *args):
        """One-shot analysis snapshot of the current position."""
        from p3achygo_tpu.gtp.analysis import analysis_rows, format_lz_analyze

        self.key, ks = jax.random.split(self.key)
        res = self._search(ks, self.state)
        return format_lz_analyze(analysis_rows(res))

    def cmd_showboard(self):
        from p3achygo_tpu.game.dsl import render

        return "\n" + render(np.asarray(self.state.stones))

    def cmd_final_score(self):
        b, w, _ = score_board(self.state)
        b, w = float(b), float(w)
        if b > w:
            return f"B+{b - w:g}"
        return f"W+{w - b:g}"

    def cmd_ownership(self):
        _, _, own = score_board(self.state)
        rows = []
        o = np.asarray(own).reshape(BOARD_LEN, BOARD_LEN)
        for i in range(BOARD_LEN):
            rows.append(" ".join(str(int(v)) for v in o[i]))
        return "\n".join(rows)

    def cmd_loadsgf(self, path="", move_num=""):
        with open(path) as f:
            root = parse_sgf(f.read())
        moves = extract_moves(root)
        if move_num:
            moves = moves[: int(move_num)]
        self.cmd_clear_board()
        for color, action in moves:
            st = self.state
            if int(st.to_move) != color:
                st = st._replace(to_move=jnp.int8(color))
            self._history.append(self.state)
            self.state, _ = step(st, jnp.int32(action))
        return ""


def run_stdin_loop(service: GtpService, infile=None, outfile=None):
    """Blocking GTP REPL (client.cc parity)."""
    import sys

    infile = infile or sys.stdin
    outfile = outfile or sys.stdout
    for line in infile:
        line = line.split("#")[0]
        if not line.strip():
            continue
        try:
            ok, resp = service.handle(line)
        except SystemExit:
            outfile.write("=\n\n")
            outfile.flush()
            return
        prefix = "=" if ok else "?"
        outfile.write(f"{prefix} {resp}\n\n" if resp else f"{prefix}\n\n")
        outfile.flush()
