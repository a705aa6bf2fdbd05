"""GTP engine service (replaces cc/gtp/, 2,216 LoC C++).

The reference runs a stdin thread -> command queue -> service thread ->
response queue -> stdout thread (client.h:23-103) plus a ponder jthread
(service.cc:667-705) because its engine blocks on a shared GPU batcher.
Here a genmove is one jitted call on the chip, so a plain synchronous
loop suffices; PONDERING maps to searching the persistent root tree in
idle slices between commands (select on stdin), and lz-analyze with an
interval streams info lines between search batches the same way. The
service keeps ONE reuse tree across commands — genmove/play advance it
under the played move (Reap), ponder/analyze batches accumulate into it
(root-compacted back to a static capacity). Command set mirrors
service.h:20-65 (core GTP + ownership/final_score extensions).
"""
from __future__ import annotations

import dataclasses
from functools import partial
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
from p3achygo_tpu.mcts.tree import compact_root, compact_subtree, make_tree
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
    # Carried-tree capacity across commands (0 = 2*n+2); ponder batches
    # accumulate into it up to ponder_visit_cap root visits
    # (total_visit_budget 1<<17, service.cc:692).
    reuse_capacity: int = 0
    ponder: bool = False
    ponder_visit_cap: int = 1 << 14
    # Value-bias cache (use_bias_cache, eval.cc:156-163; 0 = off).
    bias_lambda: float = 0.0
    bias_alpha: float = 0.8


class GtpService:
    """Stateful GTP engine over a single board (batch of 1)."""

    COMMANDS = [
        "protocol_version", "name", "version", "known_command",
        "list_commands", "quit", "boardsize", "clear_board", "komi", "play",
        "genmove", "showboard", "final_score", "undo", "loadsgf",
        "p3achygo-ownership", "time_settings", "time_left", "lz-analyze",
        "p3achygo-serialize_sgf_with_trees",
    ]

    def __init__(self, eval_fn: EvalFn, config: Optional[GtpConfig] = None):
        self.eval_fn = eval_fn
        self.config = config or GtpConfig()
        self.komi = 7.5
        self._history: List[GoState] = []
        self._moves: List[Tuple[int, int]] = []  # (color, action) played
        self.state = self._fresh()
        self.key = jax.random.PRNGKey(0)
        self.time_control = TimeControl()
        self._last_root_v = None
        self._search_cache = {}
        self._cap = self.config.reuse_capacity \
            or (2 * self.config.search.n + 2)
        self._tree = make_tree(1, self._cap)
        if self.config.bias_lambda > 0:
            from p3achygo_tpu.mcts.bias import make_bias_table

            self._bias = make_bias_table(1, 1024)
        else:
            self._bias = None
        self._compact_move = jax.jit(compact_subtree, static_argnums=(2,))
        self._compact_root = jax.jit(compact_root, static_argnums=(1,))
        self._search = self._get_search(self.config.search.n)

    def _get_search(self, n: int):
        """Per-visit-count jitted search (time control picks among sizes);
        every search reuses the carried tree -> (result, working_tree)."""
        if n not in self._search_cache:
            import dataclasses as _dc

            params = _dc.replace(self.config.search, n=n,
                                 bias_lambda=self.config.bias_lambda,
                                 bias_alpha=self.config.bias_alpha)
            cap = self._cap
            if self._bias is not None:
                self._search_cache[n] = jax.jit(
                    lambda key, st, tree, bias: search_root(
                        key, jax.tree_util.tree_map(lambda x: x[None], st),
                        self.eval_fn, params, init_tree=tree,
                        reuse_capacity=cap, bias_table=bias))
            else:
                self._search_cache[n] = jax.jit(
                    lambda key, st, tree: search_root(
                        key, jax.tree_util.tree_map(lambda x: x[None], st),
                        self.eval_fn, params, init_tree=tree,
                        reuse_capacity=cap))
        return self._search_cache[n]

    def _run_search(self, n, key, st):
        """Search with the carried tree (and bias table when enabled)."""
        fn = self._get_search(n)
        if self._bias is not None:
            res, work, self._bias = fn(key, st, self._tree, self._bias)
        else:
            res, work = fn(key, st, self._tree)
        return res, work

    def _fresh(self) -> GoState:
        return new_state(self.komi)

    def _reset_tree(self):
        self._tree = make_tree(1, self._cap)

    def _advance_tree(self, action: int, work=None):
        """Reap the carried tree under a played move (service.cc genmove /
        play paths advance current_root())."""
        src = work if work is not None else self._tree
        self._tree = self._compact_move(
            src, jnp.asarray([action], jnp.int32), self._cap)

    def ponder_once(self) -> int:
        """One search batch on the current root, accumulated into the
        carried tree (Ponder, service.cc:677-705). Returns the root's
        total visits so the caller can stop at ponder_visit_cap."""
        if bool(is_game_over(self.state)):
            return 1 << 30
        self.key, ks = jax.random.split(self.key)
        _, work = self._run_search(self.config.search.n, ks, self.state)
        self._tree = self._compact_root(work, self._cap)
        return int(self._tree.n[0, 0])

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
        self._moves = []
        self.state = self._fresh()
        self._reset_tree()
        return ""

    def cmd_komi(self, value=""):
        self.komi = float(value)
        self.state = self.state._replace(komi=jnp.float32(self.komi))
        self._reset_tree()  # carried values were computed for the old komi
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
        self._moves.append((c, action))
        self.state, _ = step(st, jnp.int32(action))
        self._advance_tree(action)
        return ""

    def cmd_undo(self):
        if not self._history:
            raise ValueError("cannot undo")
        self.state = self._history.pop()
        if self._moves:
            self._moves.pop()
        self._reset_tree()
        return ""

    def cmd_genmove(self, color=""):
        c = parse_color(color)
        st = self.state
        if int(st.to_move) != c:
            st = st._replace(to_move=jnp.int8(c))
        budget = self.time_control.compute_move_time_ms(
            int(st.move_count), self._last_root_v)
        res, work = self._timed_search(st, budget)
        action = int(res.mcts_move[0])
        self._last_root_v = float(res.root_value[0])
        self._history.append(self.state)
        self._moves.append((c, action))
        self.state, _ = step(st, jnp.int32(action))
        self._advance_tree(action, work)
        return action_to_gtp_vertex(action)

    def _timed_search(self, st, budget_ms, clock=None):
        """Search within a wall-clock budget by ACCUMULATED SLICES.

        The reference aborts a running search from a timer thread at the
        per-move budget (search.cc:795-807, time_control.cc:35). A jitted
        search has a static visit count, so mid-search cutoff happens at
        slice granularity instead: run small precompiled slices that
        accumulate into the carried tree (the lz-analyze machinery,
        service.cc:677-705 Ponder-style), and stop starting new slices
        once the remaining budget would be overrun (predicted by the
        online ms/visit estimate). A byoyomi period is therefore never
        exceeded as long as one slice fits; the first slice always runs.

        budget_ms <= 0 = untimed: one fixed-visit search at config n.
        `clock` (for tests) -> current time in seconds.
        """
        import time as _time
        clock = clock or _time.time

        nmax = self.config.search.n
        self.key, ks = jax.random.split(self.key)
        if budget_ms <= 0:
            t0 = clock()
            res, work = self._run_search(nmax, ks, st)
            self.time_control.observe_search((clock() - t0) * 1000.0,
                                             int(res.visits[0]))
            return res, work

        choices = tuple(n for n in (16, 32, 64, 128, 256, 512)
                        if n <= nmax) or (nmax,)
        t_start = clock()
        res = work = None
        # Hard cap so a mis-estimated ms/visit can't loop unboundedly:
        # the reference's budget maps to <= budget/ms_per_visit visits.
        max_slices = max(1, (8 * nmax) // max(choices[0], 1))
        for _ in range(max_slices):
            # Size each slice to the REMAINING budget: a generous byoyomi
            # period runs one deep (near-nmax) sequential-halving search
            # like the reference's timer-aborted full search, not a chain
            # of shallow 16-visit restarts; a nearly-spent budget drops to
            # the smallest precompiled slice.
            remaining = budget_ms - (clock() - t_start) * 1000.0
            slice_n = self.time_control.pick_visits(
                max(int(remaining), 1), choices=choices, default=choices[0])
            t0 = clock()
            res, work = self._run_search(slice_n, ks, st)
            v = int(res.visits[0])
            self.time_control.observe_search((clock() - t0) * 1000.0, v)
            self.key, ks = jax.random.split(self.key)
            elapsed_ms = (clock() - t_start) * 1000.0
            est_next = self.time_control.ms_per_visit * choices[0]
            if elapsed_ms + est_next > budget_ms:
                break
            # Accumulate this slice into the carried tree so the next
            # slice (and the final result) builds on all visits so far.
            self._tree = self._compact_root(work, self._cap)
        return res, work

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

    @staticmethod
    def _parse_analyze_args(args):
        """lz-analyze [color] [interval_centiseconds]."""
        interval_cs = None
        for a in args:
            if a.isdigit():
                interval_cs = int(a)
        return interval_cs

    def _analyze_batch(self):
        """One accumulated search batch -> (rows, formatted info line)."""
        from p3achygo_tpu.gtp.analysis import analysis_rows, format_lz_analyze

        self.key, ks = jax.random.split(self.key)
        res, work = self._run_search(self.config.search.n, ks, self.state)
        self._tree = self._compact_root(work, self._cap)
        rows = analysis_rows(res, work=self._tree)
        return rows, format_lz_analyze(rows)

    def cmd_lz_analyze(self, *args):
        """One-shot analysis snapshot (streaming happens in
        run_stdin_loop's analyze path, service.cc:561-605)."""
        _, line = self._analyze_batch()
        return line

    def analyze_stream(self, args, write: Callable[[str], None],
                       input_ready: Callable[[], bool],
                       max_batches: int = 1 << 20):
        """Stream lz-analyze info lines between search batches until a new
        command is pending on stdin (the reference's analyze thread,
        service.cc:561-605); the carried tree accumulates visits."""
        for _ in range(max_batches):
            _, line = self._analyze_batch()
            write(line + "\n")
            if input_ready():
                return

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
            self._moves.append((color, action))
            self.state, _ = step(st, jnp.int32(action))
        return ""

    def cmd_p3achygo_serialize_sgf_with_trees(self, path=""):
        """Write the game + the CURRENT carried search tree as SGF
        variations with per-node stat comments
        (GtpSerializeSgfWithTrees, service.cc:496-505; PopulateTree,
        sgf_recorder.cc:117-148). Ponder/analyze first to grow the tree."""
        from p3achygo_tpu.sgf import serialize_game_with_tree

        if not path:
            raise ValueError("filename required")
        text = serialize_game_with_tree(self._moves, self._tree,
                                        komi=self.komi,
                                        pb=self.config.name,
                                        pw=self.config.name)
        with open(path, "w") as f:
            f.write(text)
        return path


def run_stdin_loop(service: GtpService, infile=None, outfile=None):
    """Blocking GTP REPL (client.cc parity) with idle-slice pondering and
    streamed lz-analyze when the input supports select()."""
    import select
    import sys

    infile = infile or sys.stdin
    outfile = outfile or sys.stdout

    try:
        fd = infile.fileno()

        def input_ready() -> bool:
            return bool(select.select([fd], [], [], 0.0)[0])
    except Exception:  # StringIO / pipes without fileno: no idle work
        fd = None

        def input_ready() -> bool:
            return True

    def read_line():
        """Next stdin line; ponder in idle slices while waiting
        (Ponder, service.cc:667-705)."""
        if fd is None or not service.config.ponder:
            return infile.readline()
        while True:
            if input_ready():
                return infile.readline()
            if service.ponder_once() >= service.config.ponder_visit_cap:
                return infile.readline()  # cap reached: block normally

    while True:
        line = read_line()
        if line == "":
            return
        line = line.split("#")[0]
        if not line.strip():
            continue
        parts = line.strip().split()
        cmd = parts[1] if parts and parts[0].isdigit() and len(parts) > 1 \
            else (parts[0] if parts else "")
        if cmd == "lz-analyze" and fd is not None:
            interval = GtpService._parse_analyze_args(parts[1:])
            if interval is not None:
                outfile.write("=\n")
                outfile.flush()
                service.analyze_stream(
                    parts[1:], lambda s: (outfile.write(s),
                                          outfile.flush()), input_ready)
                outfile.write("\n")
                outfile.flush()
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
