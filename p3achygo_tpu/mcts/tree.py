"""Array-of-nodes search tree (mctx-style), batched over boards.

Replaces the reference's pointer tree (cc/mcts/tree.h TreeNode: 362 child
pointers, value stats, NN priors) with preallocated [B, N, ...] arrays:
each Gumbel simulation allocates at most one node, so N = n_sims + 1 slots
suffice. Per-node log-prior storage is softmax-invariant everywhere it's
consumed (improved policy, Gumbel ranking), so raw logits are not kept.

Sign conventions mirror tree.h:95-162: `v` is from the perspective of the
player to move at that node; Q(parent, a) = -v[child]; missing children
read as kMinQ (init-to-loss).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from p3achygo_tpu.constants import NUM_MOVES

# Q bounds (cc/mcts/constants.h:6-11).
MIN_Q = -1.5
MAX_Q = 1.5
NUM_V_BUCKETS = 51
V_BUCKET_RANGE = 2.0 / NUM_V_BUCKETS

NO_CHILD = jnp.int32(-1)


class Tree(NamedTuple):
    """Batched node arrays. B leading, N = max nodes."""

    n: jnp.ndarray  # int32[B, N] visit count
    w: jnp.ndarray  # f32[B, N] summed utility (own perspective)
    w_outcome: jnp.ndarray  # f32[B, N] summed outcome value
    score_sum: jnp.ndarray  # f32[B, N] running mean * n of score est
    v_var_sum: jnp.ndarray  # f32[B, N] n * Var(v) (incremental, tree.h:810)
    init_util: jnp.ndarray  # f32[B, N]
    init_outcome: jnp.ndarray  # f32[B, N]
    init_score: jnp.ndarray  # f32[B, N]
    log_priors: jnp.ndarray  # f32[B, N, 362] log-softmax of NN policy
    children: jnp.ndarray  # int32[B, N, 362] node index or -1
    color: jnp.ndarray  # int8[B, N] player to move at node
    is_terminal: jnp.ndarray  # bool[B, N]
    evaluated: jnp.ndarray  # bool[B, N]
    next_free: jnp.ndarray  # int32[B] node allocation cursor
    v_categorical: jnp.ndarray  # int32[B, N, 51] outcome-value histogram


def make_tree(batch_size: int, max_nodes: int) -> Tree:
    B, N = batch_size, max_nodes
    return Tree(
        n=jnp.zeros((B, N), jnp.int32),
        w=jnp.zeros((B, N), jnp.float32),
        w_outcome=jnp.zeros((B, N), jnp.float32),
        score_sum=jnp.zeros((B, N), jnp.float32),
        v_var_sum=jnp.zeros((B, N), jnp.float32),
        init_util=jnp.zeros((B, N), jnp.float32),
        init_outcome=jnp.zeros((B, N), jnp.float32),
        init_score=jnp.zeros((B, N), jnp.float32),
        log_priors=jnp.zeros((B, N, NUM_MOVES), jnp.float32),
        children=jnp.full((B, N, NUM_MOVES), NO_CHILD, jnp.int32),
        color=jnp.zeros((B, N), jnp.int8),
        is_terminal=jnp.zeros((B, N), jnp.bool_),
        evaluated=jnp.zeros((B, N), jnp.bool_),
        next_free=jnp.ones((B,), jnp.int32),  # slot 0 = root
        v_categorical=jnp.zeros((B, N, NUM_V_BUCKETS), jnp.int32),
    )


def node_v(tree: Tree, node: jnp.ndarray) -> jnp.ndarray:
    """Mean utility of node [B] (own perspective); MIN_Q when unvisited."""
    b = jnp.arange(tree.n.shape[0])
    n = tree.n[b, node]
    return jnp.where(n > 0, tree.w[b, node] / jnp.maximum(n, 1), MIN_Q)


def q_of_children(tree: Tree, node: jnp.ndarray,
                  bidx: jnp.ndarray = None) -> jnp.ndarray:
    """[N, 362] Q(node, a) = -v[child_a]; MIN_Q for missing children.

    `bidx` maps each row of `node` to its board (defaults to identity;
    k-wide search passes repeated board indices).
    """
    b = jnp.arange(node.shape[0]) if bidx is None else bidx
    kids = tree.children[b, node]  # [N, 362]
    safe = jnp.clip(kids, 0, tree.n.shape[1] - 1)
    kid_n = tree.n[b[:, None], safe]  # [N, 362]
    kid_v = jnp.where(kid_n > 0,
                      tree.w[b[:, None], safe] / jnp.maximum(kid_n, 1), -MIN_Q)
    return jnp.where(kids >= 0, -kid_v, MIN_Q)


def child_visits(tree: Tree, node: jnp.ndarray,
                 bidx: jnp.ndarray = None) -> jnp.ndarray:
    """[N, 362] visit counts of node's children (0 if missing)."""
    b = jnp.arange(node.shape[0]) if bidx is None else bidx
    kids = tree.children[b, node]  # [N, 362]
    safe = jnp.clip(kids, 0, tree.n.shape[1] - 1)
    return jnp.where(kids >= 0, tree.n[b[:, None], safe], 0)
