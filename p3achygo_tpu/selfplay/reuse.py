"""GoExploit position-reuse buffer (arXiv 2302.12359; mirrors
cc/selfplay/reuse_buffer.h:56-151).

Host-side ring of mid-game starting positions: selfplay adds ~1 position
per game (kAddSeenStateProb = 0.003/move, self_play_thread.cc:40), and new
games restart from a random popped entry with probability
`use_seen_state_prob`. The regret-guided variant (max-heap by regret) can
layer on top once the fork manager lands.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from p3achygo_tpu.constants import GO_EXPLOIT_BUFFER_SIZE


@dataclasses.dataclass
class InitState:
    """Mirrors reuse_buffer.h:27-42 (board + last moves + mover + move#)."""

    stones: np.ndarray  # int8[361]
    last_moves: np.ndarray  # int16[5]
    to_move: int
    move_num: int


class GoExploitBuffer:
    def __init__(self, capacity: int = GO_EXPLOIT_BUFFER_SIZE, seed: int = 0):
        self.capacity = capacity
        self._buf: List[InitState] = []
        self._write = 0
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self._buf)

    def add(self, state: InitState):
        if len(self._buf) < self.capacity:
            self._buf.append(state)
        else:
            self._buf[self._write] = state
            self._write = (self._write + 1) % self.capacity

    def pop_random(self) -> Optional[InitState]:
        """Random removal (GoExploitReuseBuffer::Get semantics)."""
        if not self._buf:
            return None
        idx = int(self._rng.integers(len(self._buf)))
        state = self._buf[idx]
        self._buf[idx] = self._buf[-1]
        self._buf.pop()
        return state

    def maybe_add_from_game(self, stones: np.ndarray, last_moves: np.ndarray,
                            to_move: np.ndarray, num_moves: int,
                            add_prob: float = 0.003):
        """Sample positions of a finished game into the buffer
        (|V|-annealing omitted: uniform per-move Bernoulli for now)."""
        L = int(num_moves)
        for t in range(L):
            if self._rng.uniform() < add_prob:
                self.add(InitState(
                    stones=stones[t].copy(),
                    last_moves=last_moves[t].copy(),
                    to_move=int(to_move[t]),
                    move_num=t,
                ))
