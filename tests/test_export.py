"""Chunk export tests (reference file-format parity)."""
import glob
import os
import tempfile

import numpy as np

from p3achygo_tpu.data.example import decode_example
from p3achygo_tpu.data.export import write_game_chunk, write_golden_chunk
from p3achygo_tpu.data.tfrecord import read_records
from p3achygo_tpu.selfplay.records import GameExamples, game_to_sgf


def _fake_game(m=3):
    z = lambda *s: np.zeros(s, np.float32)
    ex = GameExamples(
        stones=np.zeros((m, 361), np.int8),
        last_moves=np.zeros((m, 5), np.int16),
        color=np.array([1, -1, 1][:m], np.int8),
        komi=np.full(m, 7.5, np.float32),
        pi=np.full((m, 362), 1 / 362, np.float32),
        pi_aux=np.full(m, 361, np.int16),
        pi_aux_dist=np.zeros((m, 362), np.float32),
        has_pi_aux_dist=np.ones(m, bool),
        own=np.zeros((m, 361), np.int8),
        score_margin=np.array([2.5, -2.5, 2.5][:m], np.float32),
        z=np.ones(m, np.float32),
        q6=z(m), q16=z(m), q50=z(m),
        q6_score=z(m), q16_score=z(m), q50_score=z(m),
        weight=np.ones(m, np.float32),
        mcts_value_dist=np.zeros((m, 51), np.uint16),
    )
    ex.stones[:, 60] = 1
    return ex


def test_write_game_chunk_roundtrip():
    with tempfile.TemporaryDirectory() as d:
        path = write_game_chunk(d, [_fake_game(), _fake_game()], gen=7)
        assert os.path.exists(path) and os.path.exists(path + ".done")
        assert os.path.basename(path).startswith("gen007_b000_g002_n00006_")
        recs = list(read_records(path))
        assert len(recs) == 6
        back = decode_example(recs[0])
        assert len(back["board"]) == 361
        assert back["komi"] == [7.5]
        # black-perspective margin stored as mover-perspective in proto:
        # row 0 is black with black-margin 2.5*1=2.5 -> mover margin 2.5
        assert back["score_margin"] == [2.5]


def test_golden_chunk():
    with tempfile.TemporaryDirectory() as d:
        p = write_golden_chunk(d, [b"a", b"b"], gen=3)
        assert os.path.basename(p) == "chunk_0003.tfrecord.zz"
        assert open(p + ".size").read() == "2"


def test_game_to_sgf():
    to_move = np.array([1, -1, 1], np.int8)
    move = np.array([60, 361, 72], np.int16)
    text = game_to_sgf(to_move, move, 3, 180.0, 172.5, 7.5)
    assert "RE[B+7.5]" in text
    assert ";B[" in text and ";W[]" in text
