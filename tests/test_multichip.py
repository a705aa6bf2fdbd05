"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from p3achygo_tpu.parallel import make_mesh, param_partition_spec, shard_batch


def test_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_param_partition_rule():
    from jax.sharding import PartitionSpec as P

    big = jnp.zeros((128, 64))
    small = jnp.zeros((5,))
    tiny2d = jnp.zeros((3, 4))
    assert param_partition_spec(big, 2) == P(None, "model")
    assert param_partition_spec(small, 2) == P()
    assert param_partition_spec(tiny2d, 2) == P()
    assert param_partition_spec(big, 1) == P()


def test_dryrun_multichip_full():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts internally


def test_sharded_batch_spmd_matches_single_device():
    # A sharded forward produces the same numbers as unsharded.
    from p3achygo_tpu.models import build_model, get_config, init_params

    model = build_model(get_config("tiny"))
    variables = init_params(model, jax.random.PRNGKey(0))
    board = jax.random.uniform(jax.random.PRNGKey(1), (16, 19, 19, 15))
    scal = jax.random.uniform(jax.random.PRNGKey(2), (16, 8))
    ref = model.apply(variables, board, scal, train=False).pi_logits

    mesh = make_mesh(8, model_parallel=1)
    with mesh:
        board_s = shard_batch(board, mesh)
        scal_s = shard_batch(scal, mesh)
        out = jax.jit(lambda b, s: model.apply(
            variables, b, s, train=False).pi_logits)(board_s, scal_s)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-4)


def test_sharded_selfplay_step():
    """Selfplay envs sharded over the data axis run SPMD (BASELINE north
    star: boards sharded across chips)."""
    import jax.numpy as jnp

    from p3achygo_tpu.mcts.gumbel import SearchParams, uniform_eval_fn
    from p3achygo_tpu.selfplay.loop import (
        SelfplayConfig,
        make_aux,
        make_game_buffer,
        selfplay_step,
    )
    from p3achygo_tpu.game import new_state

    B = 16
    mesh = make_mesh(8, model_parallel=1)
    cfg = SelfplayConfig(batch_size=B, max_game_len=20, tree_reuse=False)
    params = SearchParams(n=4, k=2, max_depth=6)
    key = jax.random.PRNGKey(0)
    key, kaux = jax.random.split(key)
    states = jax.vmap(lambda _: new_state())(jnp.arange(B))
    buf = make_game_buffer(B, cfg.max_game_len)
    aux = make_aux(kaux, B, 0)

    with mesh:
        states = shard_batch(states, mesh)
        buf = shard_batch(buf, mesh)
        aux = shard_batch(aux, mesh)

        @jax.jit
        def sp(states, buf, aux, key):
            return selfplay_step(states, buf, aux, key, uniform_eval_fn,
                                 params, cfg, selected_tier=True)

        for _ in range(2):
            states, buf, aux, key = sp(states, buf, aux, key)
    assert len(states.stones.sharding.device_set) == 8
    mc = np.asarray(states.move_count)
    assert (mc == 2).all()


def test_tiered_selfplay_grouped_tiers_sharded():
    """tier_groups == data shards keeps the per-step tier permutation
    shard-local (no all-gather of board state; see SelfplayConfig). The
    grouped step must run SPMD and draw exactly B_sel/G selected boards
    per group."""
    import jax.numpy as jnp

    from p3achygo_tpu.game import new_state
    from p3achygo_tpu.mcts.gumbel import SearchParams, uniform_eval_fn
    from p3achygo_tpu.selfplay.loop import (SelfplayConfig, make_aux,
                                            make_game_buffer,
                                            selfplay_step_tiered)

    B, G = 32, 8
    mesh = make_mesh(8, model_parallel=1)
    cfg = SelfplayConfig(batch_size=B, max_game_len=20, tree_reuse=False,
                         trainable_move_prob=0.25, tier_groups=G)
    p_sel = SearchParams(n=4, k=2, max_depth=4)
    p_fast = SearchParams(n=2, k=2, max_depth=4)
    key = jax.random.PRNGKey(0)
    key, kaux = jax.random.split(key)
    states = jax.vmap(lambda _: new_state())(jnp.arange(B))
    buf = make_game_buffer(B, cfg.max_game_len)
    aux = make_aux(kaux, B, 0)

    with mesh:
        states = shard_batch(states, mesh)
        buf = shard_batch(buf, mesh)
        aux = shard_batch(aux, mesh)

        @jax.jit
        def sp(states, buf, aux, key):
            return selfplay_step_tiered(states, buf, aux, key,
                                        uniform_eval_fn, p_sel, p_fast, cfg)

        states, buf, aux, key = sp(states, buf, aux, key)
    assert len(states.stones.sharding.device_set) == 8
    mc = np.asarray(states.move_count)
    assert (mc == 1).all()
