"""PositionCache diagnostic tests (position_cache.h:11-58)."""
import numpy as np

from p3achygo_tpu.mcts.position_cache import PositionCache


def test_insert_counts_and_stats():
    pc = PositionCache(max_size=4)
    assert pc.insert(100) == 1
    assert pc.insert(100) == 2
    assert pc.insert(200) == 1
    assert pc.insert(100) == 3
    assert pc.num_queries == 4
    assert pc.num_hits == 2
    assert pc.num_unique_positions_approx == 2
    assert abs(pc.hit_rate - 0.5) < 1e-9


def test_lru_eviction_recounts_as_unique():
    pc = PositionCache(max_size=2)
    pc.insert(1)
    pc.insert(2)
    pc.insert(3)  # evicts 1 (LRU)
    assert pc.insert(1) == 1  # re-inserted: approx-unique increments again
    assert pc.num_unique_positions_approx == 4
    # 2 was evicted when 1 re-entered; 3 is still resident.
    assert pc.insert(3) == 2


def test_insert_batch_hash_lanes():
    pc = PositionCache()
    lanes = np.array([[[1, 2]], [[1, 2]], [[3, 4]]], np.uint32)  # [3,1,2]
    counts = pc.insert_batch(lanes)
    assert counts.shape == (3, 1)
    assert counts[0, 0] == 1 and counts[1, 0] == 2 and counts[2, 0] == 1
    assert pc.num_queries == 3 and pc.num_hits == 1


def test_real_selfplay_hashes():
    import jax
    import jax.numpy as jnp
    from p3achygo_tpu.game.board import new_state, step
    pc = PositionCache()
    states = jax.vmap(lambda _: new_state(7.5))(jnp.arange(2))
    pc.insert_batch(np.asarray(states.hash))  # empty boards: same hash
    assert pc.num_hits == 1  # both boards identical
    states, _ = jax.vmap(step)(states, jnp.array([0, 1], jnp.int32))
    counts = pc.insert_batch(np.asarray(states.hash))
    assert (counts == 1).all()  # different moves -> unique positions
