"""Value-bias cache tests (bias_cache.h:16-205 / mcts/bias.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from p3achygo_tpu.constants import BLACK, NUM_LOCS, NUM_MOVES, WHITE
from p3achygo_tpu.game.board import from_stones, new_state
from p3achygo_tpu.mcts.bias import (
    bias_accumulate,
    bias_fetch,
    bias_probe,
    local_pattern_keys,
    make_bias_table,
)
from p3achygo_tpu.mcts.gumbel import SearchParams, search_root, uniform_eval_fn
from p3achygo_tpu.mcts.tree import make_tree


def _keys_for(stones_np, last, prev, to_move=BLACK):
    W = 1
    stones = jnp.asarray(stones_np[None])
    atari = jnp.zeros((W, NUM_LOCS), bool)
    ill = jnp.zeros((W, NUM_LOCS), bool)
    lm = jnp.full((W, 5), -1, jnp.int32)
    lm = lm.at[0, 4].set(last).at[0, 3].set(prev)
    return local_pattern_keys(stones, atari, ill, lm,
                              jnp.asarray([to_move], jnp.int8))


def test_pattern_keys_locality_and_validity():
    stones = np.zeros(NUM_LOCS, np.int8)
    stones[5 * 19 + 5] = BLACK
    h0a, h1a, va = _keys_for(stones, last=5 * 19 + 6, prev=5 * 19 + 5)
    assert bool(va[0])
    # a DISTANT stone doesn't change the local pattern
    stones2 = stones.copy()
    stones2[17 * 19 + 17] = WHITE
    h0b, h1b, vb = _keys_for(stones2, last=5 * 19 + 6, prev=5 * 19 + 5)
    assert int(h0a[0]) == int(h0b[0]) and int(h1a[0]) == int(h1b[0])
    # a NEARBY stone does
    stones3 = stones.copy()
    stones3[5 * 19 + 7] = WHITE
    h0c, _, _ = _keys_for(stones3, last=5 * 19 + 6, prev=5 * 19 + 5)
    assert int(h0c[0]) != int(h0a[0])
    # pass / noop last moves are invalid patterns (bias_cache.h:70-74)
    _, _, v_pass = _keys_for(stones, last=NUM_LOCS, prev=5 * 19 + 5)
    assert not bool(v_pass[0])
    _, _, v_noop = _keys_for(stones, last=5 * 19 + 6, prev=-1)
    assert not bool(v_noop[0])


def test_table_fetch_accumulate_roundtrip():
    t = make_bias_table(1, 64)
    h0 = jnp.asarray([123456789], jnp.uint32)
    h1 = jnp.asarray([987654321], jnp.uint32)
    valid = jnp.asarray([True])
    # miss -> zero bias, but a usable slot
    num, den, slot, can = bias_probe(t, 1, h0, h1, valid)
    assert float(den[0]) == 0.0 and bool(can[0])
    # accumulate err=2.0 with weight 4.0 at that slot
    t = bias_accumulate(
        t, slot[None].astype(jnp.int32) * jnp.ones((1, 1), jnp.int32),
        jnp.ones((1, 1), bool), h0[None], h1[None],
        jnp.asarray([[2.0]]), jnp.asarray([[4.0]]))
    got = bias_fetch(t, 1, h0, h1, valid, lam=0.4)
    assert abs(float(got[0]) - 0.4 * 2.0 / 4.0) < 1e-6
    # a different key misses
    other = bias_fetch(t, 1, h0 + jnp.uint32(1), h1, valid, lam=0.4)
    assert float(other[0]) == 0.0


def test_search_bias_corrects_systematic_nn_error():
    """A net that is systematically optimistic about one local pattern gets
    its fresh-leaf utilities corrected by the learned bias."""
    from p3achygo_tpu.game.board import step

    states = jax.vmap(new_state)(jnp.asarray([7.5]))
    # play two opening moves so nodes near the root have a real last-move
    # window (fresh-game noop history marks patterns invalid,
    # bias_cache.h:70-74)
    states, _ = jax.vmap(step)(states, jnp.asarray([3 * 19 + 3]))
    states, _ = jax.vmap(step)(states, jnp.asarray([15 * 19 + 15]))

    def optimistic(states):
        out = uniform_eval_fn(states)
        B = states.stones.shape[0]
        lg = jnp.zeros((B, NUM_MOVES)).at[:, 60].set(3.0).at[:, 61].set(2.7)
        # +0.5 outcome everywhere: search discovers children are worse
        # than the parent's init (obs_err > 0 accumulates)
        return out._replace(log_priors=jax.nn.log_softmax(lg, -1),
                            outcome_value=out.outcome_value + 0.5)

    p = SearchParams(n=16, k=2, noise_scale=0.0, max_depth=8,
                     bias_lambda=0.4, bias_alpha=0.8)
    init = make_tree(1, 8)
    table = make_bias_table(1, 256)
    key = jax.random.PRNGKey(0)
    res1, work1, table = search_root(key, states, optimistic, p,
                                     init_tree=init, reuse_capacity=8,
                                     bias_table=table)
    used1 = int(np.asarray(table.used).sum())
    # bias entries were learned for visited patterns
    assert used1 > 0
    assert float(np.asarray(table.w_sum).sum()) > 0
    # a second search (fresh tree, same table) fetches non-zero corrections:
    # run and confirm entries keep telescoping (no double counting when the
    # SAME tree is re-searched)
    res2, work2, table2 = search_root(key, states, optimistic, p,
                                      init_tree=init, reuse_capacity=8,
                                      bias_table=table)
    # identical search on the same fresh tree: same obs terms, so the
    # accumulated sums at most double (not blow up)
    w1 = float(np.asarray(table.w_sum).sum())
    w2 = float(np.asarray(table2.w_sum).sum())
    assert w2 <= 2.0 * w1 + 1e-4

    # disabled (lambda=0) searches return the plain (result, tree) tuple
    p0 = SearchParams(n=16, k=2, noise_scale=0.0, max_depth=8)
    out = search_root(key, states, optimistic, p0, init_tree=init,
                      reuse_capacity=8)
    assert len(out) == 2


def test_bias_telescopes_under_tree_reuse():
    """Re-searching a REUSED tree contributes only the delta of each
    node's terms (bias_obs_last/bias_w_last), not a fresh full copy."""
    from p3achygo_tpu.mcts.tree import compact_subtree

    states = jax.vmap(new_state)(jnp.asarray([7.5]))

    def biased_eval(states):
        out = uniform_eval_fn(states)
        B = states.stones.shape[0]
        lg = jnp.zeros((B, NUM_MOVES)).at[:, 60].set(3.0).at[:, 61].set(2.7)
        return out._replace(log_priors=jax.nn.log_softmax(lg, -1),
                            outcome_value=out.outcome_value + 0.3)

    p = SearchParams(n=8, k=2, noise_scale=0.0, max_depth=6,
                     bias_lambda=0.4)
    init = make_tree(1, 10)
    table = make_bias_table(1, 256)
    key = jax.random.PRNGKey(1)
    res, work, table = search_root(key, states, biased_eval, p,
                                   init_tree=init, reuse_capacity=10,
                                   bias_table=table)
    w_after_1 = float(np.asarray(table.w_sum).sum())
    # advance a move with reuse, search again from the carried subtree
    carried = compact_subtree(work, res.mcts_move, 10)
    from p3achygo_tpu.game.board import step

    states2, _ = jax.vmap(step)(states, res.mcts_move)
    key2 = jax.random.PRNGKey(2)
    _, _, table = search_root(key2, states2, biased_eval, p,
                              init_tree=carried, reuse_capacity=10,
                              bias_table=table)
    w_after_2 = float(np.asarray(table.w_sum).sum())
    # weights grow (new observations) but stay bounded by the total
    # visit budget — carried nodes only contributed deltas
    assert w_after_2 > 0
    assert np.isfinite(w_after_2)
    assert w_after_2 < w_after_1 + 3 * p.n  # loose telescoping bound
