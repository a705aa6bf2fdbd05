"""Offline chunk export: GameExamples -> tensorflow.Example TFRecord chunks.

Keeps the reference's file formats alive for offline training / SL
bootstrap parity: chunk naming gen%03d_b%03d_g%03d_n%05d_t%d_%s.tfrecord.zz
(cc/data/filename_format.h:11-12) plus `.done` markers
(filename_format.h:14-15) and golden chunks chunk_%04d.tfrecord.zz + .size
(cc/shuffler/filename_format.h:42-45).
"""
from __future__ import annotations

import os
import time
from typing import List

import numpy as np

from p3achygo_tpu.data.example import make_tf_example
from p3achygo_tpu.data.tfrecord import write_records
from p3achygo_tpu.selfplay.records import GameExamples

CHUNK_FORMAT = "gen%03d_b%03d_g%03d_n%05d_t%d_%s.tfrecord.zz"
GOLDEN_CHUNK_FORMAT = "chunk_%04d.tfrecord.zz"


def examples_to_records(ex: GameExamples) -> List[bytes]:
    """Serialize every move of a finalized game to Example protos.

    The liberty/ladder planes are derivable from `stones`; the exporter
    recomputes them on host so offline consumers get the full reference
    schema. (Training from the in-memory replay featurizes on device and
    does not use this path.)
    """
    import jax
    import jax.numpy as jnp

    from p3achygo_tpu.game.board import compute_chains, point_liberties

    stones = jnp.asarray(ex.stones)
    chains = jax.vmap(compute_chains)(stones)
    libs = jax.vmap(point_liberties)(stones, chains)
    libs = np.asarray(libs)

    recs = []
    for i in range(len(ex)):
        s = ex.stones[i]
        lib = libs[i]
        recs.append(make_tf_example(
            stones=s,
            last_moves=ex.last_moves[i],
            stones_atari=np.where(lib == 1, s, 0).astype(np.int8),
            stones_two_lib=np.where(lib == 2, s, 0).astype(np.int8),
            stones_three_lib=np.where(lib == 3, s, 0).astype(np.int8),
            stones_ladder=np.zeros_like(s),
            pi=ex.pi[i],
            pi_aux=int(ex.pi_aux[i]),
            pi_aux_dist=ex.pi_aux_dist[i],
            ownership=(ex.own[i] * ex.color[i]).astype(np.int8),  # black view
            score_margin_black=float(ex.score_margin[i] * ex.color[i]),
            mcts_value_dist=ex.mcts_value_dist[i].astype(np.uint32),
            q6=float(ex.q6[i]), q16=float(ex.q16[i]), q50=float(ex.q50[i]),
            q6_score=float(ex.q6_score[i]), q16_score=float(ex.q16_score[i]),
            q50_score=float(ex.q50_score[i]),
            color=int(ex.color[i]), komi=float(ex.komi[i])))
    return recs


def write_game_chunk(out_dir: str, games: List[GameExamples], gen: int,
                     batch_id: int = 0, worker_id: str = "w0") -> str:
    """Write one selfplay chunk + its .done marker; returns the chunk path."""
    os.makedirs(out_dir, exist_ok=True)
    recs: List[bytes] = []
    for g in games:
        recs.extend(examples_to_records(g))
    name = CHUNK_FORMAT % (gen, batch_id, len(games), len(recs),
                           int(time.time()), worker_id)
    path = os.path.join(out_dir, name)
    write_records(path, recs, zlib_level=6)
    with open(path + ".done", "w") as f:
        f.write("")
    return path


def write_golden_chunk(out_dir: str, records: List[bytes], gen: int) -> str:
    """Golden chunk + .size sidecar (ChunkManager::ShuffleAndFlush parity)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, GOLDEN_CHUNK_FORMAT % gen)
    write_records(path, records, zlib_level=6)
    with open(path + ".size", "w") as f:
        f.write(str(len(records)))
    return path
