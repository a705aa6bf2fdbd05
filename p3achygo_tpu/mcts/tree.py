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

import jax
import jax.numpy as jnp

from p3achygo_tpu.constants import NUM_MOVES

# Q bounds (cc/mcts/constants.h:6-11).
MIN_Q = -1.5
MAX_Q = 1.5
NUM_V_BUCKETS = 51
V_BUCKET_RANGE = 2.0 / NUM_V_BUCKETS

NO_CHILD = jnp.int32(-1)


class Tree(NamedTuple):
    """Batched node arrays. B leading, N = max nodes.

    Child statistics are kept EDGE-indexed (`edge_n`/`edge_w` [B, N, 362],
    like the reference's per-node child_visits, tree.h:44) in addition to
    the node arrays: in a tree (no transpositions) an edge's stats equal
    its child node's, and edge indexing lets the descent read all children
    of a node with a one-hot row contraction instead of a TPU generic
    gather (which lowers to a scalar loop, ~12 ms per [4096, 362] gather).
    """

    n: jnp.ndarray  # int32[B, N] visit count
    w: jnp.ndarray  # f32[B, N] summed utility (own perspective)
    w_outcome: jnp.ndarray  # f32[B, N] summed outcome value
    score_sum: jnp.ndarray  # f32[B, N] running mean * n of score est
    v_var_sum: jnp.ndarray  # f32[B, N] n * Var(v) (incremental, tree.h:810)
    vz_var_sum: jnp.ndarray  # f32[B, N] n * Var(v_outcome) (tree.h:52)
    init_util: jnp.ndarray  # f32[B, N]
    init_outcome: jnp.ndarray  # f32[B, N]
    init_score: jnp.ndarray  # f32[B, N]
    init_err: jnp.ndarray  # f32[B, N] NN uncertainty sqrt(err2), tree.h:55
    log_priors: jnp.ndarray  # f32[B, N, 362] log-softmax of NN policy
    children: jnp.ndarray  # int32[B, N, 362] node index or -1
    edge_n: jnp.ndarray  # int32[B, N, 362] per-edge visit count
    edge_w: jnp.ndarray  # f32[B, N, 362] per-edge summed child utility
    color: jnp.ndarray  # int8[B, N] player to move at node
    is_terminal: jnp.ndarray  # bool[B, N]
    evaluated: jnp.ndarray  # bool[B, N]
    next_free: jnp.ndarray  # int32[B] node allocation cursor
    v_categorical: jnp.ndarray  # int32[B, N, 51] outcome-value histogram
    parent: jnp.ndarray  # int32[B, N] allocation parent (-1 for root)
    parent_action: jnp.ndarray  # int32[B, N] action from parent


def make_tree(batch_size: int, max_nodes: int) -> Tree:
    B, N = batch_size, max_nodes
    return Tree(
        n=jnp.zeros((B, N), jnp.int32),
        w=jnp.zeros((B, N), jnp.float32),
        w_outcome=jnp.zeros((B, N), jnp.float32),
        score_sum=jnp.zeros((B, N), jnp.float32),
        v_var_sum=jnp.zeros((B, N), jnp.float32),
        vz_var_sum=jnp.zeros((B, N), jnp.float32),
        init_util=jnp.zeros((B, N), jnp.float32),
        init_outcome=jnp.zeros((B, N), jnp.float32),
        init_score=jnp.zeros((B, N), jnp.float32),
        init_err=jnp.zeros((B, N), jnp.float32),
        log_priors=jnp.zeros((B, N, NUM_MOVES), jnp.float32),
        children=jnp.full((B, N, NUM_MOVES), NO_CHILD, jnp.int32),
        edge_n=jnp.zeros((B, N, NUM_MOVES), jnp.int32),
        edge_w=jnp.zeros((B, N, NUM_MOVES), jnp.float32),
        color=jnp.zeros((B, N), jnp.int8),
        is_terminal=jnp.zeros((B, N), jnp.bool_),
        evaluated=jnp.zeros((B, N), jnp.bool_),
        next_free=jnp.ones((B,), jnp.int32),  # slot 0 = root
        v_categorical=jnp.zeros((B, N, NUM_V_BUCKETS), jnp.int32),
        parent=jnp.full((B, N), -1, jnp.int32),
        parent_action=jnp.zeros((B, N), jnp.int32),
    )


def rows_by_node(arr: jnp.ndarray, node_bk: jnp.ndarray) -> jnp.ndarray:
    """Select per-node rows: arr [B, N, A] + node [B, k] -> [B, k, A].

    One-hot MXU contraction over the (small) node axis — TPU generic
    row-gathers serialize, this doesn't.
    """
    N = arr.shape[1]
    oh = jax.nn.one_hot(node_bk, N, dtype=jnp.float32)
    out = jnp.einsum("bkn,bna->bka", oh, arr.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return out


def node_v(tree: Tree, node: jnp.ndarray) -> jnp.ndarray:
    """Mean utility of node [B] (own perspective); MIN_Q when unvisited."""
    b = jnp.arange(tree.n.shape[0])
    n = tree.n[b, node]
    return jnp.where(n > 0, tree.w[b, node] / jnp.maximum(n, 1), MIN_Q)


def q_nvis_of_children(tree: Tree, node_bk: jnp.ndarray):
    """Per-child Q and visit counts from edge stats.

    node_bk [B, k] -> (q [B, k, 362], nvis [B, k, 362]); Q = -edge_w/edge_n
    (sign flip, tree.h:118-123), MIN_Q where unvisited.
    """
    en = rows_by_node(tree.edge_n.astype(jnp.float32), node_bk)
    ew = rows_by_node(tree.edge_w, node_bk)
    nvis = en.astype(jnp.int32)
    q = jnp.where(nvis > 0, -(ew / jnp.maximum(en, 1.0)), MIN_Q)
    return q, nvis


def q_of_children(tree: Tree, node: jnp.ndarray,
                  bidx: jnp.ndarray = None) -> jnp.ndarray:
    """[W, 362] Q(node, a) (flat-lane convenience wrapper)."""
    q, _ = q_nvis_of_children(tree, node[:, None] if node.ndim == 1 else node)
    return q[:, 0] if node.ndim == 1 else q


def child_visits(tree: Tree, node: jnp.ndarray,
                 bidx: jnp.ndarray = None) -> jnp.ndarray:
    """[W, 362] visit counts of node's children (flat-lane wrapper)."""
    _, nvis = q_nvis_of_children(tree,
                                 node[:, None] if node.ndim == 1 else node)
    return nvis[:, 0] if node.ndim == 1 else nvis


def compact_subtree(tree: Tree, action: jnp.ndarray, capacity: int) -> Tree:
    """Extract the subtree under root's child `action` into a fresh tree.

    Replaces NodeTable::Reap + tree reuse (node_table.h Reap, selfplay tree
    reuse self_play_thread.cc:709-727): after a real move, the selected
    child becomes the next search's root with its statistics intact.

    Works in allocation order (children always have higher slot indices
    than parents), so reachability is one sequential scan over node slots
    and every copy is a one-hot contraction. The child table is REBUILT
    from compacted (parent, action) pairs instead of value-remapping the
    [B, N, 362] pointer array (which costs N passes over it). Boards whose
    chosen action has no child get an empty (unevaluated) tree.
    """
    B, N = tree.n.shape
    b = jnp.arange(B)
    new_root = tree.children[b, jnp.zeros((B,), jnp.int32), action]  # [B]

    # reachable[m] = (m == new_root) | reachable[parent[m]]
    def scan_body(reach, m):
        par = tree.parent[b, m]
        par_reach = jnp.take_along_axis(
            reach, jnp.clip(par, 0, N - 1)[:, None], axis=1)[:, 0]
        r = (m == new_root) | (par_reach & (par >= 0))
        reach = reach.at[:, m].set(r)
        return reach, None

    reach0 = jnp.zeros((B, N), jnp.bool_)
    reachable, _ = jax.lax.scan(scan_body, reach0,
                                jnp.arange(N, dtype=jnp.int32))

    new_idx = jnp.where(reachable, jnp.cumsum(reachable, axis=1) - 1, -1)
    num = jnp.sum(reachable, axis=1).astype(jnp.int32)

    # One-hot selection matrix [B, capacity, N]: row r takes old slot m.
    sel = jax.nn.one_hot(
        jnp.where(reachable, new_idx, capacity), capacity,
        dtype=jnp.float32, axis=-1).transpose(0, 2, 1)  # [B, cap, N]

    def rows(arr):
        if arr.ndim == 2:
            out = jnp.einsum("bcm,bm->bc", sel, arr.astype(jnp.float32))
        else:
            out = jnp.einsum("bcm,bma->bca", sel, arr.astype(jnp.float32))
        return out.astype(arr.dtype)

    # Parent remap over the small [B, cap] array (new root's parent -> -1).
    parent_rows = rows(jnp.where(tree.parent < 0, N, tree.parent))
    parent_new = jnp.full((B, capacity), -1, jnp.int32)
    for m in range(N):
        nm = new_idx[:, m][:, None]
        parent_new = jnp.where((parent_rows == m) & (nm >= 0), nm, parent_new)
    action_rows = rows(tree.parent_action)
    compact_reach = rows(reachable.astype(jnp.int32)) > 0  # [B, cap]
    # the new root (slot 0) has no parent
    parent_new = parent_new.at[:, 0].set(-1)

    # Rebuild children from (parent_new, action) of nodes 1..cap-1.
    is_child = compact_reach & (jnp.arange(capacity)[None, :] > 0)
    oh_p = jax.nn.one_hot(
        jnp.where(is_child, parent_new, capacity), capacity,
        dtype=jnp.float32)  # [B, cap(r), cap(p)]
    oh_a = jax.nn.one_hot(
        jnp.where(is_child, action_rows, NUM_MOVES), NUM_MOVES,
        dtype=jnp.float32)  # [B, cap(r), 362]
    r_ids = jnp.arange(capacity, dtype=jnp.float32)[None, :, None]
    counts = jnp.einsum("brp,bra->bpa", oh_p, oh_a,
                        preferred_element_type=jnp.float32)
    vals = jnp.einsum("brp,bra->bpa", oh_p * r_ids, oh_a,
                      preferred_element_type=jnp.float32)
    children_new = jnp.where(counts > 0, vals, -1.0).astype(jnp.int32)

    out = make_tree(B, capacity)
    out = out._replace(
        n=rows(tree.n),
        w=rows(tree.w),
        w_outcome=rows(tree.w_outcome),
        score_sum=rows(tree.score_sum),
        v_var_sum=rows(tree.v_var_sum),
        vz_var_sum=rows(tree.vz_var_sum),
        init_util=rows(tree.init_util),
        init_outcome=rows(tree.init_outcome),
        init_score=rows(tree.init_score),
        init_err=rows(tree.init_err),
        log_priors=rows(tree.log_priors),
        children=children_new,
        edge_n=rows(tree.edge_n),
        edge_w=rows(tree.edge_w),
        color=rows(tree.color),
        is_terminal=rows(tree.is_terminal.astype(jnp.int32)).astype(jnp.bool_),
        evaluated=rows(tree.evaluated.astype(jnp.int32)).astype(jnp.bool_),
        # Clamp to capacity: when the reachable subtree exceeds `capacity`
        # (deep reused lines), nodes past capacity are dropped by the
        # one-hot above, and the allocation cursor must not point past the
        # array or subsequent searches would scatter out of bounds /
        # corrupt the spare slot.
        next_free=jnp.clip(num, 1, capacity),
        v_categorical=rows(tree.v_categorical),
        parent=parent_new,
        parent_action=jnp.where(compact_reach, action_rows, 0),
    )
    return out
