"""SL pipeline tests: SGF corpus -> examples -> trainable batch."""
import os
import tempfile

import numpy as np

from p3achygo_tpu.constants import BLACK, WHITE
from p3achygo_tpu.data.replay import ReplayBuffer
from p3achygo_tpu.data.sl import _result_to_z_margin, build_sl_replay, sgf_to_examples
from p3achygo_tpu.sgf import serialize_game


def _make_sgf(result="B+7.5", n_moves=8):
    moves = []
    pts = [(3, 3), (15, 15), (3, 15), (15, 3), (9, 9), (2, 9), (9, 2), (16, 9)]
    for i in range(n_moves):
        color = BLACK if i % 2 == 0 else WHITE
        moves.append((color, pts[i][0] * 19 + pts[i][1]))
    return serialize_game(moves, komi=7.5, result=result)


def test_result_parsing():
    assert _result_to_z_margin("B+3.5") == (BLACK, 3.5)
    assert _result_to_z_margin("W+R") == (WHITE, None)
    assert _result_to_z_margin("w+12") == (WHITE, 12.0)
    assert _result_to_z_margin("0") == (0, None)


def test_sgf_to_examples():
    ex = sgf_to_examples(_make_sgf())
    assert ex is not None and len(ex) == 8
    # one-hot policy of the played move
    assert ex.pi[0].sum() == 1.0
    assert ex.pi[0, 3 * 19 + 3] == 1.0
    # black wins: black positions +1
    assert (ex.z[::2] == 1.0).all() and (ex.z[1::2] == -1.0).all()
    # mover-perspective margin
    assert ex.score_margin[0] == 7.5 and ex.score_margin[1] == -7.5
    # aux = next move
    assert ex.pi_aux[0] == 15 * 19 + 15
    # board state advances
    assert ex.stones[0].sum() == 0
    assert np.abs(ex.stones[4]).sum() == 4


def test_resign_game_has_no_margin():
    ex = sgf_to_examples(_make_sgf(result="W+R"))
    assert (ex.score_margin == 0).all()
    assert (ex.z[::2] == -1.0).all()


def test_build_sl_replay_and_train_batch():
    with tempfile.TemporaryDirectory() as d:
        for i in range(3):
            with open(os.path.join(d, f"g{i}.sgf"), "w") as f:
                f.write(_make_sgf())
        replay = ReplayBuffer(capacity=1024)
        n = build_sl_replay(d, replay)
        assert n == 3 and len(replay) == 24
        batch = replay.sample(8)
        assert batch["pi"].shape == (8, 362)
        np.testing.assert_allclose(batch["pi"].sum(-1), 1.0)


def test_build_sl_shards_multiworker():
    """Coordinator/worker shard builder (cc/data/coordinator.h:11-48):
    2 spawn-context workers over a small SGF corpus; shards + .done
    marker written; every example readable back through the codec."""
    import json

    from p3achygo_tpu.data.sl import build_sl_shards
    from p3achygo_tpu.data.tfrecord import read_records

    with tempfile.TemporaryDirectory() as d:
        sgf_dir = os.path.join(d, "sgfs")
        out_dir = os.path.join(d, "out")
        os.makedirs(sgf_dir)
        for i in range(5):
            with open(os.path.join(sgf_dir, f"g{i}.sgf"), "w") as f:
                f.write(_make_sgf(result="B+7.5" if i % 2 else "W+2.5"))
        with open(os.path.join(sgf_dir, "bad.sgf"), "w") as f:
            f.write("(;GM[1]")  # unusable

        rep = build_sl_shards(sgf_dir, out_dir, num_workers=2,
                              examples_per_shard=12)
        assert rep["files"] == 6 and rep["games"] == 5
        assert rep["examples"] == 40  # 5 games x 8 moves
        assert rep["errors"] == 1 and rep["workers"] == 2
        assert rep["shards"]
        done = json.load(open(os.path.join(out_dir, "sl_shards.done")))
        assert done["examples"] == 40
        total = 0
        for name in rep["shards"]:
            total += len(list(read_records(os.path.join(out_dir, name))))
        assert total == 40
