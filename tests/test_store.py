"""Store bus + decoupled actor/learner tests (fs_utils.py/gcs_utils.py,
train_sp_eval.py worker architecture)."""
import os

import numpy as np
import pytest

from p3achygo_tpu.data.store import (
    SP_CHUNKS_DIR,
    LocalStore,
    list_done_chunks,
    make_store,
    model_name,
    most_recent_model,
)


def test_local_store_roundtrip(tmp_path):
    s = make_store(str(tmp_path / "bus"))
    assert isinstance(s, LocalStore)
    s.write_bytes("a/b.txt", b"hello")
    assert s.read_bytes("a/b.txt") == b"hello"
    assert s.exists("a/b.txt") and not s.exists("a/c.txt")
    # dir publish + done gating
    d = tmp_path / "art"
    d.mkdir()
    (d / "f1").write_text("x")
    (d / "sub").mkdir()
    (d / "sub" / "f2").write_text("y")
    s.put(str(d), model_name(3))
    assert most_recent_model(s) == -1  # not done yet
    s.mark_done(model_name(3))
    assert most_recent_model(s) == 3
    out = s.get(model_name(3), str(tmp_path / "pull"))
    assert open(os.path.join(out, "sub", "f2")).read() == "y"


def test_done_chunk_listing(tmp_path):
    s = LocalStore(str(tmp_path))
    s.write_bytes(f"{SP_CHUNKS_DIR}/c1.tfrecord.zz", b"d1")
    s.write_bytes(f"{SP_CHUNKS_DIR}/c2.tfrecord.zz", b"d2")
    s.mark_done(f"{SP_CHUNKS_DIR}/c2.tfrecord.zz")
    assert list_done_chunks(s) == ["c2.tfrecord.zz"]


def test_chunk_examples_roundtrip(tmp_path):
    """records_to_examples inverts examples_to_records on the stored
    fields (z reconstructed from the margin sign, weight defaults)."""
    from p3achygo_tpu.data.export import (examples_to_records,
                                          read_game_chunk, write_game_chunk)
    from p3achygo_tpu.selfplay.records import GameExamples

    rng = np.random.default_rng(0)
    M = 5
    margin = rng.normal(size=M).astype(np.float32)
    margin[margin == 0] = 1.0
    ex = GameExamples(
        stones=rng.integers(-1, 2, (M, 361)).astype(np.int8),
        last_moves=rng.integers(-1, 362, (M, 5)).astype(np.int16),
        color=np.asarray([1, -1, 1, -1, 1], np.int8),
        komi=np.full((M,), 7.5, np.float32),
        pi=rng.random((M, 362)).astype(np.float32),
        pi_aux=rng.integers(0, 362, (M,)).astype(np.int16),
        pi_aux_dist=rng.random((M, 362)).astype(np.float32),
        has_pi_aux_dist=np.ones((M,), bool),
        own=rng.integers(-1, 2, (M, 361)).astype(np.int8),
        score_margin=margin,
        z=np.where(margin > 0, 1.0, -1.0).astype(np.float32),
        q6=rng.normal(size=M).astype(np.float32),
        q16=rng.normal(size=M).astype(np.float32),
        q50=rng.normal(size=M).astype(np.float32),
        q6_score=rng.normal(size=M).astype(np.float32),
        q16_score=rng.normal(size=M).astype(np.float32),
        q50_score=rng.normal(size=M).astype(np.float32),
        weight=np.ones((M,), np.float32),
        mcts_value_dist=rng.integers(0, 9, (M, 51)).astype(np.uint16),
    )
    path = write_game_chunk(str(tmp_path), [ex], gen=2)
    back = read_game_chunk(path)
    assert len(back) == M
    np.testing.assert_array_equal(back.stones, ex.stones)
    np.testing.assert_array_equal(back.last_moves, ex.last_moves)
    np.testing.assert_array_equal(back.color, ex.color)
    np.testing.assert_allclose(back.pi, ex.pi, rtol=1e-6)
    np.testing.assert_array_equal(back.pi_aux, ex.pi_aux)
    np.testing.assert_array_equal(back.own, ex.own)
    np.testing.assert_allclose(back.score_margin, ex.score_margin,
                               rtol=1e-5)
    np.testing.assert_array_equal(back.z, ex.z)
    np.testing.assert_allclose(back.q16, ex.q16, rtol=1e-6)
    np.testing.assert_array_equal(back.mcts_value_dist, ex.mcts_value_dist)


@pytest.mark.slow
def test_actor_learner_over_bus(tmp_path):
    """End-to-end decoupled generation: the actor plays against the bus
    model and publishes chunks; the learner ingests them, trains, gates,
    and publishes the next golden; the actor hot-swaps it."""
    from p3achygo_tpu.rl.config import RunConfig
    from p3achygo_tpu.rl.workers import Learner, SelfplayActor

    cfg = RunConfig(
        model_config="tiny", num_generations=2, games_first_gen=2,
        games_per_gen=2, selfplay_batch_size=4, train_batch_size=8,
        selfplay_max_game_len=12, eval_max_game_len=12, eval_games=2,
        eval_n=4, eval_k=2,
        min_train_selected_n=4, max_train_selected_n=4,
        min_train_selected_k=2, max_train_selected_k=2,
        min_train_default_n=4, max_train_default_n=4,
        min_train_default_k=2, max_train_default_k=2,
        bn_recompute_passes=1, val_batches=1, val_game_frac=0.0,
        replay_capacity=1 << 12, fork_enabled=False)
    store = make_store(str(tmp_path / "bus"))

    learner = Learner(cfg, store, run_dir=str(tmp_path / "learner"),
                      seed=1)
    learner.publish_golden()  # gen-0 golden on the bus
    assert most_recent_model(store) == 0

    actor = SelfplayActor(cfg, store, worker_id="wA",
                          scratch_dir=str(tmp_path / "actor"), seed=2)
    assert actor.sync_model()
    assert actor.model_gen == 0
    name = actor.play_and_publish(num_games=2)
    assert name and store.is_done(name)

    got = learner.wait_for_examples(min_examples=1, timeout_s=5.0)
    assert got > 0 and len(learner.loop.replay) > 0
    out = learner.train_generation(eval_gating=False)
    assert out["gen"] == 1
    assert most_recent_model(store) == 1
    # actor adopts the new golden
    assert actor.sync_model() and actor.model_gen == 1
