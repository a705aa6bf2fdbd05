"""Minimum end-to-end actor-learner slice (SURVEY.md §7 stage 5).

One process, one device: vectorized self-play fills the replay buffer,
the learner trains on sampled batches, repeat. This is the seed of the full
RL loop (rl/loop.py adds generations, eval gating, checkpoints).
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from p3achygo_tpu.data.pipeline import prepare_batch
from p3achygo_tpu.data.replay import ReplayBuffer
from p3achygo_tpu.game.board import new_state
from p3achygo_tpu.mcts.gumbel import SearchParams, make_eval_fn
from p3achygo_tpu.models import LossCoeffs, build_model, get_config, init_params
from p3achygo_tpu.selfplay.loop import (
    SelfplayConfig,
    final_scores,
    finished_mask,
    make_aux,
    make_game_buffer,
    reset_finished,
    selfplay_step,
)
from p3achygo_tpu.selfplay.records import finalize_game
from p3achygo_tpu.train.optimizer import sgd_nesterov
from p3achygo_tpu.train.step import create_train_state, make_train_step


@dataclasses.dataclass
class SliceConfig:
    model: str = "b8c64"
    batch_size: int = 32  # selfplay boards in lockstep
    train_batch_size: int = 64
    search: SearchParams = dataclasses.field(
        default_factory=lambda: SearchParams(n=16, k=4, noise_scale=1.0))
    selfplay: SelfplayConfig = dataclasses.field(default_factory=SelfplayConfig)
    lr: float = 1e-2
    dtype: str = "bfloat16"
    seed: int = 0


class RLSlice:
    """Owns model/state/replay and exposes selfplay + train primitives."""

    def __init__(self, cfg: SliceConfig):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self.model = build_model(get_config(cfg.model), dtype=dtype)
        self.variables = init_params(self.model, jax.random.PRNGKey(cfg.seed))
        self.replay = ReplayBuffer(capacity=1 << 18, seed=cfg.seed)
        self.key = jax.random.PRNGKey(cfg.seed + 1)

        tx = sgd_nesterov(cfg.lr)
        self.tx = tx
        self.train_state = create_train_state(self.variables, tx)
        self._train_step = jax.jit(
            make_train_step(self.model, tx, LossCoeffs.rl()))
        self._prepare = jax.jit(partial(prepare_batch, augment=True))

        B = cfg.batch_size
        self.states = jax.vmap(lambda _: new_state(cfg.selfplay.komi))(
            jnp.arange(B))
        self.buf = make_game_buffer(B, cfg.selfplay.max_game_len)
        self.key, kaux = jax.random.split(self.key)
        self.aux = make_aux(kaux, B, cfg.selfplay.max_raw_policy_moves)
        from p3achygo_tpu.mcts.tree import make_tree

        self.reuse_capacity = cfg.search.n + 2 if cfg.selfplay.tree_reuse else 0
        self.tree = (make_tree(B, self.reuse_capacity)
                     if cfg.selfplay.tree_reuse else None)
        self._sp_step = None
        self._score_fn = jax.jit(final_scores)

    def _make_sp_step(self):
        """(Re)build the jitted selfplay step bound to current weights."""
        eval_fn = make_eval_fn(self.model, {
            "params": self.train_state.params,
            "batch_stats": self.train_state.batch_stats,
        })
        cfg = self.cfg

        if self.tree is not None:
            @jax.jit
            def sp_step(states, buf, aux, tree, key):
                return selfplay_step(states, buf, aux, key, eval_fn,
                                     cfg.search, cfg.selfplay,
                                     selected_tier=True, reuse_tree=tree,
                                     reuse_capacity=self.reuse_capacity)
        else:
            @jax.jit
            def sp_step(states, buf, aux, key):
                return selfplay_step(states, buf, aux, key, eval_fn,
                                     cfg.search, cfg.selfplay,
                                     selected_tier=True)

        return sp_step

    def refresh_weights(self):
        self._sp_step = self._make_sp_step()

    def play_moves(self, num_moves: int) -> int:
        """Advance all boards `num_moves` plies; harvest finished games.

        Returns number of finished games harvested.
        """
        if self._sp_step is None:
            self.refresh_weights()
        harvested = 0
        for _ in range(num_moves):
            if self.tree is not None:
                (self.states, self.buf, self.aux, self.tree,
                 self.key) = self._sp_step(self.states, self.buf, self.aux,
                                           self.tree, self.key)
            else:
                self.states, self.buf, self.aux, self.key = self._sp_step(
                    self.states, self.buf, self.aux, self.key)
            done = finished_mask(self.states, self.cfg.selfplay)
            if bool(jnp.any(done)):
                harvested += self._harvest(np.asarray(done))
        return harvested

    def _harvest(self, done: np.ndarray) -> int:
        idx = np.flatnonzero(done)
        bs, ws, own = self._score_fn(self.states)
        buf_np = jax.tree_util.tree_map(np.asarray, self.buf)
        counts = np.asarray(self.states.move_count)
        komi = np.asarray(self.states.komi)
        for b in idx:
            ex = finalize_game(
                stones=buf_np.stones[b],
                last_moves=buf_np.last_moves[b],
                to_move=buf_np.to_move[b],
                pi=buf_np.pi[b],
                move=buf_np.move[b],
                root_q_outcome=buf_np.root_q_outcome[b],
                root_score=buf_np.root_score[b],
                kld=buf_np.kld[b],
                trainable=buf_np.trainable[b],
                mcts_value_dist=buf_np.mcts_value_dist[b],
                num_moves=min(int(counts[b]), self.cfg.selfplay.max_game_len),
                black_score=float(bs[b]),
                white_score=float(ws[b]),
                ownership=np.asarray(own[b]),
                komi=float(komi[b]),
            )
            if ex is not None:
                self.replay.add_game(ex)
        self.key, kreset = jax.random.split(self.key)
        out = reset_finished(
            self.states, self.buf, self.aux, jnp.asarray(done),
            self.cfg.selfplay.komi, kreset,
            max_raw_policy_moves=self.cfg.selfplay.max_raw_policy_moves,
            reuse_tree=self.tree)
        if self.tree is not None:
            self.states, self.buf, self.aux, self.tree = out
        else:
            self.states, self.buf, self.aux = out
        return len(idx)

    def train_steps(self, num_steps: int, window: Optional[int] = None):
        """Run `num_steps` learner updates from the replay buffer."""
        losses = None
        for _ in range(num_steps):
            batch = self.replay.sample(self.cfg.train_batch_size, window)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            self.key, kprep = jax.random.split(self.key)
            planes, scalars, targets = self._prepare(kprep, batch)
            self.train_state, losses = self._train_step(
                self.train_state, planes, scalars, targets)
        self._sp_step = None  # selfplay must rebind to the new weights
        return {k: float(v) for k, v in losses.items()} if losses else {}
