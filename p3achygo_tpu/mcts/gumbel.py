"""Batched Gumbel AlphaZero root search (sequential halving), pure JAX.

Re-designs cc/mcts/gumbel.cc for lockstep TPU execution: the reference runs
one sequential-halving search per CPU thread with an out-of-process batched
NN server; here a whole batch of boards searches simultaneously as one
array program, and the NN evaluates all B leaves in-graph once per
simulation — batching is the array axis, no inference server needed
(SURVEY.md §2.2 →TPU note).

Semantics mirrored from the reference:
- Gumbel noise + logit + q-transform ranking, sequential halving rounds
  with v = round(n / (rounds * k_r)) visits/action (gumbel.cc:388-473)
- Non-root descent by completed-Q improved-policy disparity
  (gumbel.cc:214-237, ComputeImprovedPolicy gumbel.cc:196-212)
- Leaf/terminal evaluation with score utility (leaf_evaluator.cc:85-188)
- Root improved policy over completed-Q with visit-advantage weighting
  (ComputeRootImprovedPolicy gumbel.cc:154-175), temperature-tau sampling,
  KLD(improved || prior) (gumbel.cc:183-193)
- Root stat stitching: visits from all children, value only from the
  selected child (gumbel.cc:510-557)

Deviations (documented): no tree reuse across moves yet; in-tree legality
uses the cheap mask (exact superko is enforced on real game moves, not
simulated ones); early-stopping/over-search not yet implemented.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from p3achygo_tpu.constants import (
    BLACK,
    BOARD_LEN,
    NUM_MOVES,
    NUM_SCORE_LOGITS,
    PASS_MOVE,
    SCORE_INFLECTION_POINT,
)
from p3achygo_tpu.features import features
from p3achygo_tpu.game.board import GoState, is_game_over, legal_mask, step
from p3achygo_tpu.game.scoring import score as score_board
from p3achygo_tpu.mcts.tree import (
    MIN_Q,
    NUM_V_BUCKETS,
    V_BUCKET_RANGE,
    Tree,
    child_visits,
    make_tree,
    q_of_children,
)

_BIG_NEG = -1e9


class EvalOutput(NamedTuple):
    """Per-board NN outputs needed by search (from to-move perspective)."""

    log_priors: jnp.ndarray  # f32[B, 362] log-softmax policy
    outcome_value: jnp.ndarray  # f32[B] E[win] - E[loss]
    score_est: jnp.ndarray  # f32[B] E[score]
    score_var: jnp.ndarray  # f32[B] Var[score]


EvalFn = Callable[[GoState], EvalOutput]


@dataclasses.dataclass(frozen=True)
class SearchParams:
    """Static search configuration (GumbelSearchParams, gumbel.h:18-66)."""

    n: int = 32
    k: int = 4
    max_depth: int = 24
    noise_scale: float = 1.0
    tau: float = 0.0  # 0 => deterministic top candidate
    c_visit: float = 50.0
    c_scale: float = 1.0
    score_weight: float = 0.5
    disable_pass: bool = False
    use_terminal_scoring: bool = True


class GumbelResult(NamedTuple):
    mcts_move: jnp.ndarray  # int32[B]
    raw_nn_move: jnp.ndarray  # int32[B]
    pi_improved: jnp.ndarray  # f32[B, 362]
    root_value: jnp.ndarray  # f32[B] stitched root utility
    root_outcome: jnp.ndarray  # f32[B] stitched root outcome value
    root_score_est: jnp.ndarray  # f32[B] root NN score estimate
    q_selected: jnp.ndarray  # f32[B] Q of the selected move (MIN_Q if unvisited)
    qz_selected: jnp.ndarray  # f32[B] outcome-Q of the selected move
    kld: jnp.ndarray  # f32[B] KLD(improved || prior)
    visits: jnp.ndarray  # int32[B] sims spent
    root_child_visits: jnp.ndarray  # int32[B, 362]


def make_eval_fn(model, variables) -> EvalFn:
    """NN eval adapter: featurize states, run the model, reduce outputs."""

    score_values = (jnp.arange(NUM_SCORE_LOGITS, dtype=jnp.float32)
                    - SCORE_INFLECTION_POINT + 0.5)

    def eval_fn(states: GoState) -> EvalOutput:
        planes, scalars = jax.vmap(lambda s: features(s))(states)
        out = model.apply(variables, planes, scalars, train=False)
        value = out.outcome_probs[:, 1] - out.outcome_probs[:, 0]
        score_est = jnp.sum(out.score_probs * score_values[None, :], axis=-1)
        score_sq = jnp.sum(out.score_probs * score_values[None, :] ** 2, axis=-1)
        return EvalOutput(
            log_priors=jax.nn.log_softmax(out.pi_logits, axis=-1),
            outcome_value=value,
            score_est=score_est,
            score_var=jnp.maximum(score_sq - score_est**2, 0.0),
        )

    return eval_fn


def uniform_eval_fn(states: GoState) -> EvalOutput:
    """Dummy NN: uniform policy, zero value (tests / benchmarks)."""
    B = states.stones.shape[0]
    return EvalOutput(
        log_priors=jnp.full((B, NUM_MOVES), -jnp.log(float(NUM_MOVES))),
        outcome_value=jnp.zeros((B,)),
        score_est=jnp.zeros((B,)),
        score_var=jnp.zeros((B,)),
    )


def _score_utility(score_weight, score_est, root_score_signed):
    """Direct-mode score utility (leaf_evaluator.cc:79-82 ScoreTransform)."""
    return score_weight * (2.0 / math.pi) * jnp.arctan(
        (score_est - root_score_signed) / BOARD_LEN)


def _init_nodes(tree: Tree, node: jnp.ndarray, ev: EvalOutput,
                color: jnp.ndarray, util: jnp.ndarray,
                active: jnp.ndarray) -> Tree:
    """Write NN eval into node slots (InitFields, leaf_evaluator.cc:93-122)."""
    b = jnp.arange(node.shape[0])
    sel = lambda new, old: jnp.where(active, new, old)
    return tree._replace(
        log_priors=tree.log_priors.at[b, node].set(
            jnp.where(active[:, None], ev.log_priors, tree.log_priors[b, node])),
        init_outcome=tree.init_outcome.at[b, node].set(
            sel(ev.outcome_value, tree.init_outcome[b, node])),
        init_score=tree.init_score.at[b, node].set(
            sel(ev.score_est, tree.init_score[b, node])),
        init_util=tree.init_util.at[b, node].set(
            sel(util, tree.init_util[b, node])),
        color=tree.color.at[b, node].set(
            jnp.where(active, color, tree.color[b, node]).astype(jnp.int8)),
        evaluated=tree.evaluated.at[b, node].set(
            tree.evaluated[b, node] | active),
    )


def _nonroot_action(tree: Tree, node: jnp.ndarray, legal: jnp.ndarray,
                    c_visit: float, c_scale: float) -> jnp.ndarray:
    """Improved-policy-minus-visit-share argmax (gumbel.cc:214-237)."""
    B = node.shape[0]
    b = jnp.arange(B)
    logp = tree.log_priors[b, node]  # [B, 362]
    q = q_of_children(tree, node)
    nvis = child_visits(tree, node)
    visited = nvis > 0
    maxn = jnp.max(nvis, axis=-1)
    sum_children = jnp.maximum(tree.n[b, node] - 1, 0).astype(jnp.float32)

    probs = jnp.exp(logp)
    visited_prob = jnp.sum(jnp.where(visited, probs, 0.0), axis=-1)
    weighted_q = jnp.sum(jnp.where(visited, probs * q, 0.0), axis=-1)
    init_util = tree.init_util[b, node]
    v_mix = jnp.where(
        sum_children > 0,
        (weighted_q * sum_children / jnp.maximum(visited_prob, 1e-10)
         + init_util) / (1.0 + sum_children),
        init_util,
    )

    q_scale = jnp.where(maxn > 0, 2.0 * jnp.log(jnp.maximum(maxn, 1).astype(jnp.float32)), 0.0)
    q_norm = (q + 1.5) / 3.0
    v_mix_norm = (v_mix + 1.5) / 3.0
    completed = jnp.where(visited, q_norm, v_mix_norm[:, None])
    logits_improved = logp + ((c_visit + q_scale[:, None]) * c_scale) * completed
    pi = jax.nn.softmax(logits_improved, axis=-1)
    disparity = pi - nvis.astype(jnp.float32) / (1.0 + sum_children)[:, None]
    return jnp.argmax(jnp.where(legal, disparity, _BIG_NEG), axis=-1).astype(jnp.int32)


def _v_mixed_root(tree: Tree, probs0, q0, nvis0):
    """VMixed at root (gumbel.cc:68-88)."""
    b = jnp.arange(tree.n.shape[0])
    visited = nvis0 > 0
    sum_children = jnp.sum(nvis0, axis=-1).astype(jnp.float32)
    visited_prob = jnp.sum(jnp.where(visited, probs0, 0.0), axis=-1)
    weighted_q = jnp.sum(jnp.where(visited, probs0 * q0, 0.0), axis=-1)
    init_util = tree.init_util[b, 0]
    return jnp.where(
        sum_children > 0,
        (weighted_q * sum_children / jnp.maximum(visited_prob, 1e-10)
         + init_util) / (1.0 + sum_children),
        init_util,
    )


def search_root(key: jax.Array, states: GoState, eval_fn: EvalFn,
                params: SearchParams,
                tau: Optional[jnp.ndarray] = None) -> GumbelResult:
    """Run sequential-halving Gumbel search on a batch of boards.

    `tau` optionally overrides params.tau with a per-board [B] temperature
    (selfplay decays it with move number, self_play_thread.cc:570-581);
    tau <= 0 rows play the deterministic top candidate.
    """
    B = states.stones.shape[0]
    b = jnp.arange(B)
    n, k = params.n, params.k
    num_rounds = max(int(math.log2(k)) if k > 1 else 1, 1)

    # Exact visit schedule (gumbel.cc:388-401): per round r with k_r
    # candidates, v_r = round(n / (num_rounds * k_r)) visits per action.
    schedule = []  # (round, slot) per simulation
    k_r, total_sims = k, 0
    round_specs = []
    while k_r > 1:
        v_r = int(round(n / (num_rounds * k_r)))
        v_r = max(v_r, 1)
        round_specs.append((k_r, v_r))
        total_sims += v_r * k_r
        k_r //= 2
    theoretical_winner_visits = sum(v for _, v in round_specs)

    max_nodes = total_sims + 2
    tree = make_tree(B, max_nodes)

    # --- root eval (EvaluateRoot, leaf_evaluator.cc:136-154) ---
    root_ev = eval_fn(states)
    root_color = states.to_move
    active_all = jnp.ones((B,), jnp.bool_)
    tree = _init_nodes(tree, jnp.zeros((B,), jnp.int32), root_ev, root_color,
                       root_ev.outcome_value, active_all)
    tree = tree._replace(
        n=tree.n.at[:, 0].set(1),
        w=tree.w.at[:, 0].set(root_ev.outcome_value),
        w_outcome=tree.w_outcome.at[:, 0].set(root_ev.outcome_value),
        score_sum=tree.score_sum.at[:, 0].set(root_ev.score_est),
        v_categorical=tree.v_categorical.at[
            b, 0,
            jnp.clip(((root_ev.outcome_value + 1.0) / V_BUCKET_RANGE).astype(jnp.int32),
                     0, NUM_V_BUCKETS - 1)].add(1),
    )
    root_score_est = root_ev.score_est

    # --- root candidates: logits + gumbel noise (gumbel.cc:287-306) ---
    legal0 = jax.vmap(legal_mask)(states)  # [B, 362]
    if params.disable_pass:
        has_board_move = jnp.any(legal0[:, :PASS_MOVE], axis=-1)
        legal0 = legal0.at[:, PASS_MOVE].set(
            legal0[:, PASS_MOVE] & ~has_board_move)
    masked_logp = jnp.where(legal0, root_ev.log_priors, _BIG_NEG)
    key, knoise = jax.random.split(key)
    gnoise = params.noise_scale * jax.random.gumbel(knoise, (B, NUM_MOVES))
    gnoise = jnp.where(legal0, gnoise, 0.0)
    base_score = masked_logp + gnoise

    raw_nn_move = jnp.argmax(root_ev.log_priors, axis=-1).astype(jnp.int32)

    if n <= 1:
        # n == 1: play the raw-policy argmax (gumbel.cc:312-316).
        pi = jax.nn.softmax(masked_logp, axis=-1)
        return GumbelResult(
            mcts_move=raw_nn_move,
            raw_nn_move=raw_nn_move,
            pi_improved=pi,
            root_value=root_ev.outcome_value,
            root_outcome=root_ev.outcome_value,
            root_score_est=root_score_est,
            q_selected=jnp.full((B,), MIN_Q),
            qz_selected=jnp.full((B,), -1.0),
            kld=jnp.zeros((B,)),
            visits=jnp.zeros((B,), jnp.int32),
            root_child_visits=jnp.zeros((B, NUM_MOVES), jnp.int32),
        )

    _, cand_actions = jax.lax.top_k(base_score, k)  # [B, k] desc
    cand_actions = cand_actions.astype(jnp.int32)
    cand_valid = jnp.take_along_axis(legal0, cand_actions, axis=1)
    board_over = jax.vmap(is_game_over)(states)

    def simulate(carry, slot):
        tree, key = carry
        action0 = jnp.take_along_axis(cand_actions, slot[None, None].repeat(B, 0),
                                      axis=1)[:, 0]
        valid0 = jnp.take_along_axis(cand_valid, slot[None, None].repeat(B, 0),
                                     axis=1)[:, 0] & ~board_over

        # --- descent (Search, gumbel.cc:674-727) ---
        D = params.max_depth
        path_nodes = jnp.full((B, D), -1, jnp.int32)

        def body(carry):
            (tree, scratch, cur, depth, done, path_nodes, leaf_new,
             leaf_terminal) = carry
            active = ~done
            node = cur  # parent for this edge; at depth 0, node == root(0)
            legal = jax.vmap(legal_mask)(scratch)
            a_policy = _nonroot_action(tree, node, legal, params.c_visit,
                                       params.c_scale)
            a = jnp.where(depth == 0, action0, a_policy)

            new_scratch, _ = jax.vmap(step)(scratch, a)
            scratch = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    jnp.reshape(active, (B,) + (1,) * (new.ndim - 1)), new, old),
                new_scratch, scratch)

            child = tree.children[b, node, a]
            need_alloc = (child < 0) & active
            child_idx = jnp.where(need_alloc, tree.next_free, child)
            tree = tree._replace(
                children=tree.children.at[b, node, a].set(
                    jnp.where(active, child_idx, tree.children[b, node, a])),
                next_free=tree.next_free + need_alloc.astype(jnp.int32),
            )
            terminal_board = jax.vmap(is_game_over)(scratch) & active
            known_terminal = tree.is_terminal[b, jnp.clip(child_idx, 0, max_nodes - 1)]
            stop = (need_alloc | terminal_board | known_terminal) & active

            path_nodes = path_nodes.at[b, depth].set(
                jnp.where(active, child_idx, path_nodes[b, depth]))
            leaf_new = jnp.where(stop & need_alloc & ~terminal_board, True,
                                 leaf_new)
            leaf_terminal = jnp.where(stop & terminal_board, True, leaf_terminal)
            cur = jnp.where(active, child_idx, cur)
            depth = depth + active.astype(jnp.int32)
            done = done | stop | (depth >= D)
            return (tree, scratch, cur, depth, done, path_nodes, leaf_new,
                    leaf_terminal)

        def cond(carry):
            done = carry[4]
            return ~jnp.all(done)

        init = (tree, states, jnp.zeros((B,), jnp.int32),
                jnp.zeros((B,), jnp.int32), ~valid0, path_nodes,
                jnp.zeros((B,), jnp.bool_), jnp.zeros((B,), jnp.bool_))
        (tree, leaf_states, leaf_node, depth, _, path_nodes, leaf_new,
         leaf_terminal) = jax.lax.while_loop(cond, body, init)

        leaf_color = leaf_states.to_move
        root_sign = jnp.where(leaf_color == root_color, 1.0, -1.0)

        # --- leaf evaluation ---
        ev = eval_fn(leaf_states)
        util = ev.outcome_value + _score_utility(
            params.score_weight, ev.score_est, root_sign * root_score_est)
        eval_active = leaf_new & valid0
        tree = _init_nodes(tree, leaf_node, ev, leaf_color, util, eval_active)

        # --- terminal evaluation (EvaluateTerminal, leaf_evaluator.cc:157-188)
        def with_terminal(tree):
            bs, ws, _ = jax.vmap(score_board)(leaf_states)
            player = jnp.where(leaf_color == BLACK, bs, ws)
            oppv = jnp.where(leaf_color == BLACK, ws, bs)
            final_score = player - oppv
            emp_out = jnp.where(player > oppv, 1.0, -1.0)
            emp_q = emp_out + _score_utility(params.score_weight, final_score,
                                             root_sign * root_score_est)
            t_active = leaf_terminal & valid0 & ~tree.is_terminal[b, leaf_node]
            sel = lambda new, old: jnp.where(t_active, new, old)
            return tree._replace(
                init_util=tree.init_util.at[b, leaf_node].set(
                    sel(emp_q, tree.init_util[b, leaf_node])),
                init_outcome=tree.init_outcome.at[b, leaf_node].set(
                    sel(emp_out, tree.init_outcome[b, leaf_node])),
                init_score=tree.init_score.at[b, leaf_node].set(
                    sel(final_score, tree.init_score[b, leaf_node])),
                color=tree.color.at[b, leaf_node].set(
                    jnp.where(t_active, leaf_color,
                              tree.color[b, leaf_node]).astype(jnp.int8)),
                is_terminal=tree.is_terminal.at[b, leaf_node].set(
                    tree.is_terminal[b, leaf_node] | t_active),
                evaluated=tree.evaluated.at[b, leaf_node].set(
                    tree.evaluated[b, leaf_node] | t_active),
            )

        if params.use_terminal_scoring:
            tree = jax.lax.cond(jnp.any(leaf_terminal & valid0), with_terminal,
                                lambda t: t, tree)

        # --- backprop (Backward, gumbel.cc:738-761) ---
        leaf_q = tree.init_util[b, leaf_node]
        leaf_qz = tree.init_outcome[b, leaf_node]
        leaf_score = tree.init_score[b, leaf_node]
        leaf_c = tree.color[b, leaf_node]

        def backup_step(tree, d):
            node = path_nodes[b, d]
            on_path = (node >= 0) & valid0
            node_s = jnp.clip(node, 0, max_nodes - 1)
            sign = jnp.where(tree.color[b, node_s] == leaf_c, 1.0, -1.0)
            is_leaf_slot = node == leaf_node
            q = sign * leaf_q
            qz = sign * leaf_qz
            sc = sign * leaf_score
            inc = on_path.astype(jnp.int32)
            # Leaf nodes keep v == init (SingleBackup is_leaf branch,
            # gumbel.cc:763-771): add init each visit so w/n == init.
            add_w = jnp.where(is_leaf_slot, tree.init_util[b, node_s], q)
            add_wz = jnp.where(is_leaf_slot, tree.init_outcome[b, node_s], qz)
            add_sc = jnp.where(is_leaf_slot, tree.init_score[b, node_s], sc)
            n_old = tree.n[b, node_s].astype(jnp.float32)
            n_new = n_old + inc
            v_old = jnp.where(n_old > 0, tree.w[b, node_s] / jnp.maximum(n_old, 1),
                              tree.init_util[b, node_s])
            w_new = tree.w[b, node_s] + jnp.where(on_path, add_w, 0.0)
            v_new = w_new / jnp.maximum(n_new, 1)
            dvar = (q - v_old) * (q - v_new)
            bucket = jnp.clip(((qz + 1.0) / V_BUCKET_RANGE).astype(jnp.int32), 0,
                              NUM_V_BUCKETS - 1)
            return tree._replace(
                n=tree.n.at[b, node_s].add(inc),
                w=tree.w.at[b, node_s].add(jnp.where(on_path, add_w, 0.0)),
                w_outcome=tree.w_outcome.at[b, node_s].add(
                    jnp.where(on_path, add_wz, 0.0)),
                score_sum=tree.score_sum.at[b, node_s].add(
                    jnp.where(on_path, add_sc, 0.0)),
                v_var_sum=tree.v_var_sum.at[b, node_s].add(
                    jnp.where(on_path & ~is_leaf_slot, dvar, 0.0)),
                v_categorical=tree.v_categorical.at[b, node_s, bucket].add(
                    jnp.where(on_path & ~is_leaf_slot, 1, 0)),
            ), None

        tree, _ = jax.lax.scan(backup_step, tree,
                               jnp.arange(D - 1, -1, -1, dtype=jnp.int32))
        return (tree, key), valid0.astype(jnp.int32)

    visits_spent = jnp.zeros((B,), jnp.int32)
    for k_r, v_r in round_specs:
        slots = jnp.tile(jnp.arange(k_r, dtype=jnp.int32), v_r)
        (tree, key), valid_counts = jax.lax.scan(simulate, (tree, key), slots)
        visits_spent = visits_spent + jnp.sum(valid_counts, axis=0)

        # Re-rank candidates by logit + gumbel + qtransform
        # (update_qtransform, gumbel.cc:355-366).
        q0 = q_of_children(tree, jnp.zeros((B,), jnp.int32))
        nvis0 = child_visits(tree, jnp.zeros((B,), jnp.int32))
        maxn = jnp.max(nvis0, axis=-1).astype(jnp.float32)
        qtransform = (params.c_visit + maxn[:, None]) * params.c_scale * q0
        cand_scores = jnp.take_along_axis(base_score + qtransform, cand_actions,
                                          axis=1)
        cand_scores = jnp.where(cand_valid, cand_scores, _BIG_NEG)
        # keep only current-round candidates in the ranking
        in_round = jnp.arange(k)[None, :] < k_r
        cand_scores = jnp.where(in_round, cand_scores, _BIG_NEG)
        order = jnp.argsort(-cand_scores, axis=1)
        cand_actions = jnp.take_along_axis(cand_actions, order, axis=1)
        cand_valid = jnp.take_along_axis(cand_valid, order, axis=1)

    # --- final improved policy (ComputeRootImprovedPolicy, gumbel.cc:154-175)
    q0 = q_of_children(tree, jnp.zeros((B,), jnp.int32))
    nvis0 = child_visits(tree, jnp.zeros((B,), jnp.int32))
    probs0 = jax.nn.softmax(masked_logp, axis=-1)
    # Reference parity: root->n is still 1 when ComputeRootImprovedPolicy
    # runs (stitching happens after), so VMixed(root) short-circuits to
    # init_util_est (gumbel.cc:68-72,477-480).
    v_mix = tree.init_util[:, 0]
    visit_advantage = 2.0 * math.log(theoretical_winner_visits + 1.0)
    q_norm = (q0 + 1.1) / 2.2
    v_mix_norm = (v_mix + 1.1) / 2.2
    completed = jnp.where(nvis0 > 0, q_norm, v_mix_norm[:, None])
    logits_improved = masked_logp + (params.c_visit + visit_advantage) \
        * params.c_scale * completed
    pi_improved = jax.nn.softmax(logits_improved, axis=-1)

    # --- move selection ---
    top_candidate = cand_actions[:, 0]
    if tau is None:
        tau_arr = jnp.full((B,), params.tau, jnp.float32)
        use_sampling = params.tau > 0.0
    else:
        tau_arr = tau.astype(jnp.float32)
        use_sampling = True
    if use_sampling:
        key, ksample = jax.random.split(key)
        safe_tau = jnp.maximum(tau_arr, 1e-3)[:, None]
        tempered_logits = jnp.where(
            pi_improved > 0,
            jnp.log(jnp.maximum(pi_improved, 1e-30)) / safe_tau, _BIG_NEG)
        sampled = jax.random.categorical(ksample, tempered_logits,
                                         axis=-1).astype(jnp.int32)
        mcts_move = jnp.where(tau_arr > 0, sampled,
                              top_candidate.astype(jnp.int32))
    else:
        mcts_move = top_candidate.astype(jnp.int32)
    # Boards with no valid candidate (terminal / all illegal) pass.
    any_valid = jnp.any(cand_valid, axis=-1)
    mcts_move = jnp.where(any_valid & ~board_over, mcts_move, PASS_MOVE)

    # --- root stitching (gumbel.cc:510-557) ---
    sel_n = jnp.take_along_axis(nvis0, mcts_move[:, None], axis=1)[:, 0]
    sel_q = jnp.take_along_axis(q0, mcts_move[:, None], axis=1)[:, 0]
    sel_child = tree.children[b, 0, mcts_move]
    sel_child_s = jnp.clip(sel_child, 0, max_nodes - 1)
    sel_qz = jnp.where(
        sel_child >= 0,
        -jnp.where(tree.n[b, sel_child_s] > 0,
                   tree.w_outcome[b, sel_child_s]
                   / jnp.maximum(tree.n[b, sel_child_s], 1), -1.0),
        -1.0)
    total = 1.0 + sel_n.astype(jnp.float32)
    root_value = (root_ev.outcome_value + sel_n * sel_q) / total
    root_outcome = (root_ev.outcome_value + sel_n * sel_qz) / total

    eps = 1e-10
    kld = jnp.sum(
        jnp.where(pi_improved > 0,
                  pi_improved * (jnp.log(pi_improved + eps)
                                 - jnp.log(probs0 + eps)), 0.0), axis=-1)

    return GumbelResult(
        mcts_move=mcts_move,
        raw_nn_move=raw_nn_move,
        pi_improved=pi_improved,
        root_value=root_value,
        root_outcome=root_outcome,
        root_score_est=root_score_est,
        q_selected=sel_q,
        qz_selected=sel_qz,
        kld=kld,
        visits=visits_spent,
        root_child_visits=nvis0,
    )
