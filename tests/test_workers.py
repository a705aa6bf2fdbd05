"""Actor/learner worker round-trip over a local store bus (rl/workers.py).

The reference deploys selfplay workers (cc/selfplay/main.cc) and the
trainer (train_sp_eval.py:100-230) as separate processes exchanging
artifacts through GCS. This drives the same protocol end-to-end on a
local-dir Store: learner seeds the bus with a gen-0 golden → actor syncs
weights, plays games, publishes a `.done` chunk → learner ingests the
chunk into its replay and trains a generation → publishes the new golden
→ actor hot-swaps it. Covers model_%04d/chunk formats, `.done` gating,
sync idempotence, and the gen-follows-bus rule."""
import jax

from p3achygo_tpu.data.store import SP_CHUNKS_DIR, make_store, most_recent_model
from p3achygo_tpu.rl.workers import Learner, SelfplayActor
from tests.test_resume import tiny_run_cfg


def test_actor_learner_roundtrip(tmp_path):
    cfg = tiny_run_cfg()
    store = make_store(str(tmp_path / "bus"))

    learner = Learner(cfg, store, run_dir=str(tmp_path / "learner"))
    assert most_recent_model(store) < 0
    learner.publish_golden()
    assert most_recent_model(store) == 0

    actor = SelfplayActor(cfg, store, worker_id="wA",
                          scratch_dir=str(tmp_path / "actor"), seed=3)
    assert actor.sync_model() is True
    assert actor.model_gen == 0
    assert actor.sync_model() is False  # idempotent: nothing newer

    name = actor.play_and_publish(cfg.games_per_gen)
    assert name.startswith(SP_CHUNKS_DIR + "/")

    got = learner.wait_for_examples(min_examples=1, timeout_s=5.0)
    assert got > 0
    assert len(learner.loop.replay) == got

    # Re-ingest is a no-op (chunk de-dup by name).
    assert learner.ingest_new_chunks() == 0

    info = learner.train_generation(eval_gating=False)
    assert info["gen"] == 1
    assert most_recent_model(store) == 1

    # Actor hot-swaps the new golden; its n/k schedule follows the bus gen.
    assert actor.sync_model() is True
    assert actor.model_gen == 1
    assert actor.loop.gen == 1


def test_two_actors_one_learner(tmp_path):
    """Scale-out shape: two actors publish to one bus; the learner
    ingests both workers' chunks (multi-process DP selfplay skeleton,
    SURVEY §2.13 — worker_id keeps chunk names disjoint)."""
    cfg = tiny_run_cfg()
    store = make_store(str(tmp_path / "bus"))
    learner = Learner(cfg, store, run_dir=str(tmp_path / "learner"))
    learner.publish_golden()

    names = []
    for i, wid in enumerate(("w0", "w1")):
        actor = SelfplayActor(cfg, store, worker_id=wid,
                              scratch_dir=str(tmp_path / f"a{i}"), seed=i)
        actor.sync_model()
        names.append(actor.play_and_publish(cfg.games_per_gen))
    assert len(set(names)) == 2

    got = learner.wait_for_examples(min_examples=1, timeout_s=5.0)
    assert got > 0
    assert len(learner._seen_chunks) == 2
