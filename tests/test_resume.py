"""Run resume / elastic recovery (train_sp_eval.py:213-215, fs_utils.py:25-65).

Simulates a crash by running one generation in a GenerationLoop, then
constructing a brand-new loop over the same run dir (as a restarted
process would) and checking that `try_resume` restores the run: gen
counter, golden + live train state, optimizer state, and the replay ring.
"""
import dataclasses
import os

import jax
import numpy as np

from p3achygo_tpu.rl.config import RunConfig
from p3achygo_tpu.rl.loop import GenerationLoop


def tiny_run_cfg():
    return RunConfig(
        model_config="tiny",
        num_generations=3,
        games_first_gen=2,
        games_per_gen=2,
        selfplay_batch_size=4,
        train_batch_size=8,
        selfplay_max_game_len=12,
        eval_max_game_len=12,
        eval_games=4,
        eval_n=4, eval_k=2,
        min_train_selected_n=4, max_train_selected_n=4,
        min_train_selected_k=2, max_train_selected_k=2,
        min_train_default_n=4, max_train_default_n=4,
        min_train_default_k=2, max_train_default_k=2,
        bn_recompute_passes=1,
        val_batches=1,
        val_game_frac=0.0,
        replay_capacity=1 << 12,
        handicap_game_prob=0.0,
    )


def _leaves_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_resume_roundtrip(tmp_path):
    root = str(tmp_path / "run")
    cfg = tiny_run_cfg()

    loop = GenerationLoop(cfg, root_dir=root, seed=5, dtype=np.float32)
    info = loop.run_generation()
    assert info["gen"] == 1
    assert os.path.isdir(os.path.join(root, "model_0001"))
    assert os.path.isdir(os.path.join(root, "live"))
    assert os.path.isdir(os.path.join(root, "cand"))  # candidate-first save
    assert os.path.exists(os.path.join(root, "replay.npz"))
    saved_len = len(loop.replay)
    saved_step = int(loop.train_state.step)

    # "Restart": a brand-new process builds a fresh loop over the run dir.
    loop2 = GenerationLoop(cfg, root_dir=root, seed=5, dtype=np.float32)
    assert loop2.try_resume()
    assert loop2.gen == 1
    assert len(loop2.replay) == saved_len
    assert loop2.replay.games_added == loop.replay.games_added
    assert int(loop2.train_state.step) == saved_step
    _leaves_equal(loop2.golden["params"], loop.golden["params"])
    _leaves_equal(loop2.train_state.params, loop.train_state.params)
    _leaves_equal(loop2.train_state.opt_state, loop.train_state.opt_state)

    # The resumed loop continues: generation 2 runs end-to-end.
    info2 = loop2.run_generation()
    assert info2["gen"] == 2
    assert os.path.isdir(os.path.join(root, "model_0002"))

    # A third process resumes at gen 2, not gen 1.
    loop3 = GenerationLoop(cfg, root_dir=root, seed=5, dtype=np.float32)
    assert loop3.try_resume()
    assert loop3.gen == 2


def test_try_resume_fresh_dir_is_noop(tmp_path):
    cfg = tiny_run_cfg()
    loop = GenerationLoop(cfg, root_dir=str(tmp_path / "fresh"), seed=1,
                          dtype=np.float32)
    assert not loop.try_resume()
    assert loop.gen == 0


def test_replay_save_load_roundtrip(tmp_path):
    from p3achygo_tpu.data.replay import ReplayBuffer
    from p3achygo_tpu.selfplay.records import GameExamples

    buf = ReplayBuffer(capacity=64, seed=0)
    rng = np.random.default_rng(2)
    for g in range(3):
        n = 10
        ex = GameExamples(
            stones=rng.integers(-1, 2, (n, 361)).astype(np.int8),
            last_moves=rng.integers(0, 362, (n, 5)).astype(np.int16),
            color=np.where(np.arange(n) % 2 == 0, 1, -1).astype(np.int8),
            komi=np.full(n, 7.5, np.float32),
            pi=np.full((n, 362), 1 / 362, np.float32),
            pi_aux=np.zeros(n, np.int16),
            pi_aux_dist=np.full((n, 362), 1 / 362, np.float32),
            has_pi_aux_dist=np.ones(n, bool),
            own=np.zeros((n, 361), np.int8),
            score_margin=np.zeros(n, np.float32),
            z=np.ones(n, np.float32),
            q6=np.zeros(n, np.float32), q16=np.zeros(n, np.float32),
            q50=np.zeros(n, np.float32),
            q6_score=np.zeros(n, np.float32),
            q16_score=np.zeros(n, np.float32),
            q50_score=np.zeros(n, np.float32),
            weight=np.ones(n, np.float32),
            mcts_value_dist=np.zeros((n, 51), np.uint16),
        )
        buf.add_game(ex)

    path = str(tmp_path / "replay.npz")
    buf.save(path)
    buf2 = ReplayBuffer(capacity=64, seed=9)
    buf2.load(path)
    assert len(buf2) == len(buf)
    assert buf2.total_added == buf.total_added
    assert buf2.games_added == buf.games_added
    # identical rng state -> identical future samples
    s1 = buf.sample(8)
    s2 = buf2.sample(8)
    for k in s1:
        np.testing.assert_array_equal(s1[k], s2[k])
