"""MCGS transposition-table tests (McgsNodeTable, node_table.h:78-120).

Unit tests of the device hash table + an integration test showing that
transposed positions share one node (a DAG edge pair) and pool statistics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from p3achygo_tpu.constants import NUM_MOVES
from p3achygo_tpu.game.board import new_state
from p3achygo_tpu.mcts.gumbel import (
    EvalOutput,
    SearchParams,
    search_root,
)
from p3achygo_tpu.mcts.tree import (
    make_mcgs_table,
    mcgs_insert,
    mcgs_meta,
    mcgs_probe,
)


def test_mcgs_table_probe_insert_roundtrip():
    B, S = 2, 64
    t = make_mcgs_table(B, S)
    h0 = jnp.asarray([0xDEADBEEF, 0x12345678], jnp.uint32)
    h1 = jnp.asarray([0xCAFEBABE, 0x0F0F0F0F], jnp.uint32)
    meta = mcgs_meta(jnp.asarray([1, -1], jnp.int8),
                     jnp.asarray([False, True]))
    # miss on empty table
    hit, node, slot, has_empty = mcgs_probe(t, 1, h0, h1, meta)
    assert not bool(hit.any())
    assert bool(has_empty.all())
    # insert then hit with the right node ids
    t = mcgs_insert(t, 1, slot, h0, h1, meta,
                    jnp.asarray([7, 9], jnp.int32),
                    jnp.asarray([True, True]))
    hit, node, _, _ = mcgs_probe(t, 1, h0, h1, meta)
    assert bool(hit.all())
    assert node.tolist() == [7, 9]
    # same hash, different color/terminal tag -> miss
    other = mcgs_meta(jnp.asarray([-1, -1], jnp.int8),
                      jnp.asarray([False, False]))
    hit2, _, _, _ = mcgs_probe(t, 1, h0, h1, other)
    assert not bool(hit2.any())
    # do=False lanes are not inserted
    h0b = h0 + jnp.uint32(1)
    _, _, slot_b, _ = mcgs_probe(t, 1, h0b, h1, meta)
    t2 = mcgs_insert(t, 1, slot_b, h0b, h1, meta,
                     jnp.asarray([3, 4], jnp.int32),
                     jnp.asarray([True, False]))
    hit3, node3, _, _ = mcgs_probe(t2, 1, h0b, h1, meta)
    assert bool(hit3[0]) and not bool(hit3[1])
    assert int(node3[0]) == 3


def test_mcgs_probe_linear_probing_collisions():
    """Colliding keys occupy successive probe slots and both stay findable."""
    B, S = 1, 64
    t = make_mcgs_table(B, S)
    # Same slot0 by construction: identical h0^f(h1) is hard to arrange with
    # different keys, so force it: keys differing only in bits that cancel.
    h0a = jnp.asarray([0x00000010], jnp.uint32)
    h0b = jnp.asarray([0x00000010 + S], jnp.uint32)  # same slot mod S
    h1 = jnp.asarray([0], jnp.uint32)
    meta = mcgs_meta(jnp.asarray([1], jnp.int8), jnp.asarray([False]))
    _, _, s1, _ = mcgs_probe(t, 1, h0a, h1, meta)
    t = mcgs_insert(t, 1, s1, h0a, h1, meta, jnp.asarray([1], jnp.int32),
                    jnp.asarray([True]))
    _, _, s2, he = mcgs_probe(t, 1, h0b, h1, meta)
    assert bool(he[0]) and int(s2[0]) == int(s1[0]) + 1
    t = mcgs_insert(t, 1, s2, h0b, h1, meta, jnp.asarray([2], jnp.int32),
                    jnp.asarray([True]))
    hit_a, node_a, _, _ = mcgs_probe(t, 1, h0a, h1, meta)
    hit_b, node_b, _, _ = mcgs_probe(t, 1, h0b, h1, meta)
    assert bool(hit_a[0]) and int(node_a[0]) == 1
    assert bool(hit_b[0]) and int(node_b[0]) == 2


def _transposition_eval():
    """Priors engineered so two root candidates' subtrees reach the SAME
    position (black a + black c + white b) through different move orders
    at different sweeps (one line explores breadth first)."""
    a = 3 * 19 + 3
    c = 3 * 19 + 15
    b = 9 * 19 + 9
    d = 9 * 19 + 10

    def eval_fn(states):
        B = states.stones.shape[0]
        logits = jnp.full((B, NUM_MOVES), -4.0)
        black = states.to_move[:, None] == 1
        black_l = jnp.full((NUM_MOVES,), -4.0).at[a].set(3.0).at[c].set(2.8)
        white_l = jnp.full((NUM_MOVES,), -4.0).at[b].set(3.0).at[d].set(2.9)
        logits = jnp.where(black, black_l[None, :], white_l[None, :])
        return EvalOutput(
            log_priors=jax.nn.log_softmax(logits, axis=-1),
            outcome_value=jnp.zeros((B,)),
            score_est=jnp.zeros((B,)),
            score_var=jnp.zeros((B,)),
        )

    return eval_fn


def _incoming_edges(tree):
    """For each node slot: number of (parent, action) edges pointing at it."""
    ch = np.asarray(tree.children[0])  # [N, 362]
    N = ch.shape[0]
    counts = np.zeros(N, np.int64)
    for idx in ch[ch >= 0].ravel():
        counts[idx] += 1
    return counts


def test_mcgs_transposed_positions_share_nodes():
    states = jax.vmap(new_state)(jnp.asarray([7.5]))
    eval_fn = _transposition_eval()
    p_tree = SearchParams(n=32, k=2, noise_scale=0.0, max_depth=10)
    p_mcgs = SearchParams(n=32, k=2, noise_scale=0.0, max_depth=10,
                          use_mcgs=True)
    key = jax.random.PRNGKey(0)

    # Pass an empty init_tree so search_root returns the working tree.
    from p3achygo_tpu.mcts.tree import make_tree

    init = make_tree(1, 4)
    res_t, work_t = search_root(key, states, eval_fn, p_tree,
                                init_tree=init, reuse_capacity=4)
    res_g, work_g = search_root(key, states, eval_fn, p_mcgs,
                                init_tree=init, reuse_capacity=4)

    alloc_tree = int(work_t.next_free[0])
    alloc_mcgs = int(work_g.next_free[0])
    # Sharing strictly reduces allocations on this engineered workload.
    assert alloc_mcgs < alloc_tree, (alloc_mcgs, alloc_tree)

    # DAG structure: at least one node has two incoming edges under MCGS,
    # none does in tree mode.
    inc_t = _incoming_edges(work_t)
    inc_g = _incoming_edges(work_g)
    assert inc_t.max() == 1
    assert inc_g.max() >= 2

    # Pooled statistics: every node's visit count equals the sum of visits
    # over its incoming edges (the shared node accumulates from BOTH paths).
    ch = np.asarray(work_g.children[0])
    en = np.asarray(work_g.edge_n[0])
    n = np.asarray(work_g.n[0])
    shared = int(np.argmax(inc_g))
    edge_sum = en[ch == shared].sum()
    assert n[shared] == edge_sum
    assert inc_g[shared] >= 2

    # Search output is still sane.
    assert int(res_g.mcts_move[0]) >= 0
    assert np.isfinite(float(res_g.root_value[0]))


def test_mcgs_search_matches_tree_when_no_transpositions():
    """With a single candidate path and depth < 3 no transpositions exist;
    MCGS must produce identical results to tree mode."""
    states = jax.vmap(new_state)(jnp.asarray([7.5, 7.5]))

    def eval_fn(states):
        B = states.stones.shape[0]
        logits = jnp.zeros((B, NUM_MOVES))
        return EvalOutput(
            log_priors=jax.nn.log_softmax(logits, axis=-1),
            outcome_value=jnp.full((B,), 0.1),
            score_est=jnp.zeros((B,)),
            score_var=jnp.zeros((B,)),
        )

    key = jax.random.PRNGKey(7)
    p1 = SearchParams(n=8, k=4, noise_scale=1.0, max_depth=2)
    p2 = SearchParams(n=8, k=4, noise_scale=1.0, max_depth=2, use_mcgs=True)
    r1 = search_root(key, states, eval_fn, p1)
    r2 = search_root(key, states, eval_fn, p2)
    np.testing.assert_array_equal(np.asarray(r1.mcts_move),
                                  np.asarray(r2.mcts_move))
    np.testing.assert_allclose(np.asarray(r1.root_value),
                               np.asarray(r2.root_value), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(r1.root_child_visits),
                                  np.asarray(r2.root_child_visits))
