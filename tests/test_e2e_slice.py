"""End-to-end slice test: selfplay -> replay -> train, tiny everything."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from p3achygo_tpu.mcts.gumbel import SearchParams
from p3achygo_tpu.rl.slice import RLSlice, SliceConfig
from p3achygo_tpu.selfplay.loop import SelfplayConfig


def tiny_cfg():
    return SliceConfig(
        model="tiny",
        batch_size=4,
        train_batch_size=8,
        search=SearchParams(n=4, k=2, noise_scale=1.0, max_depth=8),
        selfplay=SelfplayConfig(batch_size=4, max_game_len=12,
                                tau_initial=1.0, tau_min=0.5,
                                max_raw_policy_moves=2),
        lr=1e-3,
        dtype="float32",
        seed=3,
    )


def test_selfplay_to_train_roundtrip():
    slice_ = RLSlice(tiny_cfg())
    # 12-move cap -> all 4 games finish within 14 plies
    harvested = slice_.play_moves(14)
    assert harvested >= 4
    assert len(slice_.replay) > 0
    assert slice_.replay.games_added >= 4

    # examples are sane
    batch = slice_.replay.sample(8)
    assert batch["pi"].shape == (8, 362)
    np.testing.assert_allclose(batch["pi"].sum(-1), 1.0, atol=1e-4)
    assert set(np.unique(batch["z"])) <= {-1.0, 1.0}
    assert np.isfinite(batch["q6"]).all()
    assert (np.abs(batch["q6"]) <= 1.0 + 1e-5).all()

    # a couple of learner steps run and produce finite, nonzero grads
    losses = slice_.train_steps(2)
    assert np.isfinite(losses["loss"])
    assert losses["grad_norm"] > 0

    # selfplay continues against updated weights
    harvested2 = slice_.play_moves(14)
    assert harvested2 >= 4


def test_td_targets_alternating_sign():
    from p3achygo_tpu.selfplay.records import _exp_weighted

    vals = np.array([0.5, -0.5, 0.5, -0.5, 0.5], np.float64)
    # perfectly alternating root values = consistent game: q should be ~0.5
    q = _exp_weighted(vals, 0, 5.0 / 6.0, 4)
    assert abs(q - 0.5) < 1e-9
    # horizon 0: exactly the current value
    assert _exp_weighted(vals, 2, 5.0 / 6.0, 0) == 0.5


def test_exp_weighted_all_matches_scalar():
    from p3achygo_tpu.selfplay.records import _exp_weighted, _exp_weighted_all

    rng = np.random.default_rng(0)
    vals = rng.normal(size=37)
    for lam, hor in ((5 / 6, 6), (15 / 16, 16)):
        allv = _exp_weighted_all(vals, lam, hor)
        for t in range(len(vals)):
            ref = _exp_weighted(vals, t, lam, min(hor, len(vals) - t - 1))
            assert abs(allv[t] - ref) < 1e-9, (lam, t)
    allv = _exp_weighted_all(vals, 49 / 50, None)
    for t in range(len(vals)):
        ref = _exp_weighted(vals, t, 49 / 50, len(vals) - t - 1)
        assert abs(allv[t] - ref) < 1e-9, t
