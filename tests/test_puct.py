"""PUCT search tests (synthetic value fn, mirrors gumbel_test strategy)."""
import jax
import jax.numpy as jnp
import numpy as np

from p3achygo_tpu.constants import BLACK, NUM_MOVES, PASS_MOVE
from p3achygo_tpu.game import legal_mask, new_state, step
from p3achygo_tpu.mcts import EvalOutput, uniform_eval_fn
from p3achygo_tpu.mcts.puct import PuctParams, search_root_puct

GOOD = 5 * 19 + 5
BAD = 3 * 19 + 3


def value_eval_fn(states):
    B = states.stones.shape[0]
    v_black = jnp.where(states.stones[:, GOOD] == BLACK, 0.9, -0.9)
    value = v_black * jnp.where(states.to_move == BLACK, 1.0, -1.0)
    # Concentrated priors (like a trained net): BAD is the prior favorite
    # but GOOD has enough mass for the PUCT explore term to beat the
    # FPU-reduced unvisited Q within a few sims.
    logits = jnp.zeros((B, NUM_MOVES))
    logits = logits.at[:, BAD].set(5.5).at[:, GOOD].set(5.0)
    return EvalOutput(
        log_priors=jax.nn.log_softmax(logits, axis=-1),
        outcome_value=value,
        score_est=jnp.zeros((B,)),
        score_var=jnp.zeros((B,)),
    )


def batch_states(B):
    return jax.vmap(lambda _: new_state())(jnp.arange(B))


def test_puct_finds_value_move():
    states = batch_states(2)
    p = PuctParams(n=48, max_depth=12)
    res = search_root_puct(jax.random.PRNGKey(0), states, value_eval_fn, p)
    assert np.asarray(res.mcts_move).tolist() == [GOOD, GOOD]
    pi = np.asarray(res.pi_improved)
    assert pi[0, GOOD] > 0.5  # visit mass concentrates on the good move
    np.testing.assert_allclose(pi.sum(-1), 1.0, atol=1e-5)


def test_puct_visit_budget_and_root_stats():
    states = batch_states(1)
    p = PuctParams(n=16, max_depth=8)
    res = search_root_puct(jax.random.PRNGKey(0), states, uniform_eval_fn, p)
    assert int(res.visits[0]) == 16
    assert int(res.root_child_visits.sum()) == 16
    assert np.isfinite(float(res.root_value[0]))


def test_puct_lcb_selection():
    states = batch_states(2)
    p = PuctParams(n=32, max_depth=8, root_selection="lcb")
    res = search_root_puct(jax.random.PRNGKey(0), states, value_eval_fn, p)
    assert np.asarray(res.mcts_move).tolist() == [GOOD, GOOD]


def test_puct_moves_legal_through_game():
    states = batch_states(2)
    p = PuctParams(n=8, max_depth=8)
    for _ in range(4):
        res = search_root_puct(jax.random.PRNGKey(1), states, uniform_eval_fn, p)
        masks = np.asarray(jax.vmap(legal_mask)(states))
        mv = np.asarray(res.mcts_move)
        assert all(masks[i, mv[i]] for i in range(2))
        states, statuses = jax.vmap(step)(states, res.mcts_move)
        assert (np.asarray(statuses) == 0).all()


def test_var_scaling_path_compiles():
    states = batch_states(1)
    p = PuctParams(n=8, max_depth=6, enable_var_scaling=True)
    res = search_root_puct(jax.random.PRNGKey(0), states, uniform_eval_fn, p)
    assert int(res.visits[0]) == 8


def test_puct_return_tree_seeds_gumbel():
    """PUCT tree (return_tree=True) seeds a Gumbel search via compact_subtree.

    Mirrors the reference visit study's PUCT-seeded trees
    (experiments/gumbel_visits_study.cc): the PUCT search's subtree under
    the played move carries into gumbel.search_root(init_tree=...)."""
    from p3achygo_tpu.mcts.gumbel import SearchParams, search_root
    from p3achygo_tpu.mcts.tree import compact_subtree

    states = batch_states(2)
    p = PuctParams(n=24, max_depth=8)
    res, ptree = search_root_puct(
        jax.random.PRNGKey(0), states, value_eval_fn, p, return_tree=True)
    # Stored root state matches the searched boards.
    np.testing.assert_array_equal(
        np.asarray(ptree.s_stones[:, 0]), np.asarray(states.stones))
    assert bool(ptree.evaluated[:, 0].all())
    # Visited children got stored states too: pick the played move's child.
    mv = res.mcts_move
    cap = 16
    seed = compact_subtree(ptree, mv, cap)
    # The played move had visits, so the reused root must be evaluated.
    assert bool(seed.evaluated[:, 0].all())
    carried = np.asarray(seed.n[:, 0]).copy()
    assert (carried > 0).all()
    states2, statuses = jax.vmap(step)(states, mv)
    assert (np.asarray(statuses) == 0).all()
    np.testing.assert_array_equal(
        np.asarray(seed.s_stones[:, 0]), np.asarray(states2.stones))
    gp = SearchParams(n=16, k=4, max_depth=8)
    res2, _ = search_root(jax.random.PRNGKey(1), states2, value_eval_fn, gp,
                          init_tree=seed, reuse_capacity=cap)
    # Root visits accumulated on top of the carried PUCT statistics.
    assert (np.asarray(res2.visits) >= 16).all()


def test_puct_v_variant():
    """PUCT-V (search_policy.h:292-312) compiles, searches legally, and
    still finds the value move with concentrated priors."""
    states = batch_states(2)
    p = PuctParams(n=48, max_depth=12, use_puct_v=True, c_puct_v_2=3.0)
    res = search_root_puct(jax.random.PRNGKey(0), states, value_eval_fn, p)
    assert int(res.visits[0]) == 48
    masks = np.asarray(jax.vmap(legal_mask)(states))
    mv = np.asarray(res.mcts_move)
    assert all(masks[i, mv[i]] for i in range(2))
    assert np.asarray(res.mcts_move).tolist() == [GOOD, GOOD]


def test_m3_bonus_variant():
    """M3 bonus (search_policy.h:277-290) path compiles and visits stay on
    budget; v_m3_sum accumulates finite values."""
    states = batch_states(1)
    p = PuctParams(n=24, max_depth=8, enable_m3_bonus=True,
                   m3_prior_visits=20)
    res, tree = search_root_puct(jax.random.PRNGKey(0), states,
                                 value_eval_fn, p, return_tree=True)
    assert int(res.visits[0]) == 24
    m3 = np.asarray(tree.v_m3_sum)
    assert np.isfinite(m3).all()


def test_welford_m3_matches_numpy():
    """welford_m3_delta: sequential updates reproduce n*M3 of the sample."""
    from p3achygo_tpu.mcts.tree import welford_m3_delta
    rng = np.random.default_rng(0)
    xs = rng.normal(size=50) * 0.7 + 0.1
    n, mean, m2, m3 = 0.0, 0.0, 0.0, 0.0
    for x in xs:
        n_new = n + 1.0
        v_old = mean
        v_new = (mean * n + x) / n_new
        dvar = (x - v_old) * (x - v_new)
        dm3 = float(welford_m3_delta(
            jnp.float32(x), jnp.float32(v_old), jnp.float32(n_new),
            jnp.float32(m2), jnp.float32(dvar)))
        m2 += dvar
        m3 += dm3
        mean, n = v_new, n_new
    expected_m3 = np.sum((xs - xs.mean()) ** 3)
    np.testing.assert_allclose(m3, expected_m3, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(m2, np.sum((xs - xs.mean()) ** 2), rtol=1e-4)


def test_m3_zero_for_constant_values():
    """All identical backed-up values => zero third moment at every node."""
    states = batch_states(1)
    p = PuctParams(n=16, max_depth=8)
    _, tree = search_root_puct(jax.random.PRNGKey(0), states,
                               uniform_eval_fn, p, return_tree=True)
    np.testing.assert_allclose(np.asarray(tree.v_m3_sum), 0.0, atol=1e-5)


def test_p_opt_weight_eval_adapter():
    """make_eval_fn(p_opt_weight=1.0) uses the optimistic policy head
    (search_policy.h:171-185 interpolation done at eval time)."""
    from p3achygo_tpu.mcts.gumbel import make_eval_fn
    from p3achygo_tpu.models import build_model, get_config, init_params

    model = build_model(get_config("b8c64"), dtype=jnp.float32)
    variables = init_params(model, jax.random.PRNGKey(0))
    states = batch_states(2)
    e0 = make_eval_fn(model, variables, symmetrize=False)(states)
    e1 = make_eval_fn(model, variables, symmetrize=False,
                      p_opt_weight=1.0)(states)
    p0 = np.exp(np.asarray(e0.log_priors))
    p1 = np.exp(np.asarray(e1.log_priors))
    np.testing.assert_allclose(p0.sum(-1), 1.0, atol=1e-4)
    np.testing.assert_allclose(p1.sum(-1), 1.0, atol=1e-4)
    # The optimistic head differs from the plain policy on a random net.
    assert np.abs(p0 - p1).max() > 1e-6
    # Values are unaffected by the blend.
    np.testing.assert_allclose(np.asarray(e0.outcome_value),
                               np.asarray(e1.outcome_value), atol=1e-6)
