"""Eval harness tests: Elo math + a biased-strength matchup."""
import jax
import jax.numpy as jnp
import numpy as np

from p3achygo_tpu.constants import BLACK, NUM_MOVES
from p3achygo_tpu.eval import EvalConfig, elo_with_ci, relative_elo, run_eval
from p3achygo_tpu.mcts.gumbel import EvalOutput, SearchParams, uniform_eval_fn


def test_relative_elo():
    assert abs(relative_elo(0.5)) < 1e-9
    assert abs(relative_elo(0.64) - 100.0) < 2.0  # ~100 elo at 64%
    assert relative_elo(0.9) > relative_elo(0.6) > 0
    assert relative_elo(0.1) < 0


def test_elo_ci_brackets_point():
    elo, lo, hi = elo_with_ci(60, 100)
    assert lo < elo < hi
    elo2, lo2, hi2 = elo_with_ci(600, 1000)
    assert (hi2 - lo2) < (hi - lo)  # more games -> tighter CI


def _center_loving_eval(states):
    """Net that likes the center point and evaluates center-ownership."""
    B = states.stones.shape[0]
    center = 9 * 19 + 9
    logits = jnp.zeros((B, NUM_MOVES)).at[:, center].set(3.0)
    v_black = jnp.where(states.stones[:, center] == BLACK, 0.5, -0.1)
    value = v_black * jnp.where(states.to_move == BLACK, 1.0, -1.0)
    return EvalOutput(
        log_priors=jax.nn.log_softmax(logits, axis=-1),
        outcome_value=value,
        score_est=jnp.zeros((B,)),
        score_var=jnp.zeros((B,)),
    )


def test_run_eval_smoke():
    cfg = EvalConfig(
        num_games=4,
        max_game_len=16,
        search=SearchParams(n=4, k=2, noise_scale=0.0, tau=0.0, max_depth=8),
    )
    res = run_eval(jax.random.PRNGKey(0), _center_loving_eval, uniform_eval_fn,
                   cfg)
    assert res.num_games == 4
    assert 0.0 <= res.winrate <= 1.0
    assert np.isfinite(res.elo)


def test_resignation_decides_games():
    # Black is always hopeless (consistent across the tree) -> black
    # resigns on its first move.
    def despair(states):
        B = states.stones.shape[0]
        v = jnp.where(states.to_move == BLACK, -0.99, 0.99)
        return EvalOutput(
            log_priors=jnp.full((B, NUM_MOVES), -jnp.log(float(NUM_MOVES))),
            outcome_value=v,
            score_est=jnp.zeros((B,)),
            score_var=jnp.zeros((B,)),
        )

    cfg = EvalConfig(
        num_games=4, max_game_len=12,
        search=SearchParams(n=4, k=2, noise_scale=0.0, max_depth=6))
    res = run_eval(jax.random.PRNGKey(0), despair, despair, cfg)
    assert res.by_resign == 4
    # Black (the first mover) resigns everywhere: cand wins its white games.
    assert res.cand_wins == 2.0


def test_eval_puct_dispatch():
    """search_type='puct' in a player config actually drives the PUCT
    program in the harness (eval.cc:230-268 dispatch)."""
    from p3achygo_tpu.eval.player_config import PlayerSearchConfig

    cfg = EvalConfig(
        num_games=4, max_game_len=12,
        search=SearchParams(n=4, k=2, noise_scale=0.0, tau=0.0, max_depth=6),
        cand=PlayerSearchConfig(search_type="puct", n=4, max_depth=6),
        cur=PlayerSearchConfig(search_type="gumbel", n=4, k=2,
                               noise_scale=0.0, max_depth=6))
    res = run_eval(jax.random.PRNGKey(3), _center_loving_eval,
                   uniform_eval_fn, cfg)
    assert res.num_games == 4
    assert 0.0 <= res.winrate <= 1.0


def test_eval_tree_reuse_runs_and_matches_protocol():
    """Per-player tree reuse across plies (eval.cc:330-358) executes and
    produces a decided result; reuse-off still works."""
    cfg_on = EvalConfig(
        num_games=4, max_game_len=16, tree_reuse=True,
        search=SearchParams(n=4, k=2, noise_scale=0.0, tau=0.0, max_depth=8))
    cfg_off = EvalConfig(
        num_games=4, max_game_len=16, tree_reuse=False,
        search=SearchParams(n=4, k=2, noise_scale=0.0, tau=0.0, max_depth=8))
    r_on = run_eval(jax.random.PRNGKey(4), _center_loving_eval,
                    uniform_eval_fn, cfg_on)
    r_off = run_eval(jax.random.PRNGKey(4), _center_loving_eval,
                     uniform_eval_fn, cfg_off)
    for r in (r_on, r_off):
        assert r.num_games == 4
        assert 0.0 <= r.winrate <= 1.0


def test_eval_n_growth():
    from p3achygo_tpu.rl.config import RunConfig, eval_n_for_gen

    cfg = RunConfig(eval_n=128, min_eval_n=16, eval_n_growth_window=10,
                    eval_k=2)
    assert eval_n_for_gen(cfg, 0) == 16
    assert eval_n_for_gen(cfg, 10) == 128
    assert eval_n_for_gen(cfg, 100) == 128
    assert 16 < eval_n_for_gen(cfg, 5) < 128
    cfg2 = RunConfig(eval_n=128, eval_n_growth_window=0)
    assert eval_n_for_gen(cfg2, 0) == 128


def test_player_config_parsing():
    from p3achygo_tpu.eval.player_config import parse_player_config

    cfg = parse_player_config("""
# eval config
search_type: puct
n: 64
k: 4
c_puct: 1.5
enable_var_scaling: true
root_selection: lcb
tau: 0.5
""")
    assert cfg.search_type == "puct"
    assert cfg.n == 64 and cfg.k == 4
    assert cfg.c_puct == 1.5
    assert cfg.enable_var_scaling is True
    pp = cfg.to_puct_params()
    assert pp.root_selection == "lcb" and pp.n == 64
    sp = cfg.to_search_params()
    assert sp.tau == 0.5


def test_eval_games_differ_within_color_half():
    """Round-3 gating bug regression: match games must differ from each
    other. Root Gumbel noise (noise_scale=1.0, the reference semantics)
    is drawn per board, so identical positions in one eval batch search
    differently; with noise 0 + tau 0 every game of a half is identical
    and a 2N-game match measures only 2 games."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from p3achygo_tpu.eval.harness import EvalConfig
    from p3achygo_tpu.game import new_state
    from p3achygo_tpu.mcts.gumbel import (SearchParams, search_root,
                                          uniform_eval_fn)

    # The default eval config keeps noise ON.
    assert EvalConfig().search.noise_scale == 1.0

    states = jax.vmap(lambda _: new_state())(jnp.arange(6))
    key = jax.random.PRNGKey(0)
    res_n = search_root(key, states, uniform_eval_fn,
                        SearchParams(n=8, k=4, noise_scale=1.0, tau=0.0,
                                     max_depth=6))
    moves = np.asarray(res_n.mcts_move)
    assert len(set(moves.tolist())) > 1, \
        "identical positions must search differently under root noise"
    res_0 = search_root(key, states, uniform_eval_fn,
                        SearchParams(n=8, k=4, noise_scale=0.0, tau=0.0,
                                     max_depth=6))
    assert len(set(np.asarray(res_0.mcts_move).tolist())) == 1
