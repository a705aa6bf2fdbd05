"""sel_mult signal tests vs a straight-line port of the reference math
(move_sel_manager.h:39-177) plus .stats pipeline round-trips
(tf_recorder.cc:313-461, sel_mult_calibration.py)."""
import math

import jax.numpy as jnp
import numpy as np

from p3achygo_tpu.selfplay.move_sel import (
    DEFAULT_FLAGS,
    KLD_PENALTY,
    NN_MCTS_BONUS,
    NUM_STD_BINS,
    STDDEV_BONUS,
    STDDEV_PENALTY,
    SelMultCalibration,
    calibration_from_dict,
    compute_move_sel,
    default_calibration,
)
from p3achygo_tpu.selfplay.stats import (
    MoveStatsBatch,
    compute_calibration,
    compute_percentiles,
    compute_sel_mult_base,
    expected_std_bins,
    sel_mult_mean,
    write_calibration_file,
    write_stats_file,
)


def scalar_ref_compute(n_pre, std_dev, pre_kld, nn_mcts_diff, q_canonical,
                       scale, expected_by_bin, flags,
                       std_adj_pcts=(0.02, 0.64, 1.52, 4.96),
                       kld_pcts=(0.0001, 0.310, 1.166),
                       nn_pcts=(0.1463, 0.6500)):
    """Pure-python mirror of MoveSelManager::Compute for cross-checking."""

    def std_adj():
        if std_dev == 0.0 or not expected_by_bin:
            return 0.0
        query = min(n_pre // 5 * 5, 200)
        neighbors = sorted(
            [(b, v) for b, v in expected_by_bin.items() if v > 0],
            key=lambda bv: abs(bv[0] - query))
        k = min(4, len(neighbors))
        if k == 0:
            return 0.0
        sw = swv = 0.0
        for b, v in neighbors[:k]:
            w = 1.0 / (abs(b - query) + 5.0)
            sw += w
            swv += w * v
        e = swv / sw
        return std_dev / e if e > 0 else 0.0

    sa = std_adj()
    if sa == 0.0:
        saa = 0.0
    else:
        att = min(1.0, 0.2 + 0.8 * (n_pre / 40.0) ** 0.54)
        saa = 1.0 + (sa - 1.0) * att
    base = 1.0 - min(max((abs(q_canonical) - 0.5) / 0.4, 0.0), 1.0)
    qadj = base ** 0.4

    p01, p50, p80, p99 = std_adj_pcts
    if saa == 0.0 or saa <= p80 or p99 <= p80:
        sb = 1.0
    else:
        sb = 1.0 + 0.5 * (saa - p80) / (p99 - p80)
    if saa == 0.0:
        sp = 1.0
    elif saa >= p50:
        sp = 1.0
    elif saa <= p01 or p50 <= p01:
        sp = 0.3
    else:
        sp = 1.0 - 0.7 * (p50 - saa) / (p50 - p01)

    k05, k70, k95 = kld_pcts
    if pre_kld == 0.0 or pre_kld <= k70 or k95 <= k70:
        kb = 1.0
    else:
        kb = min(1.5, 1.0 + 0.5 * (pre_kld - k70) / (k95 - k70))
    if pre_kld == 0.0 or pre_kld >= 0.06:
        kp = 1.0
    elif pre_kld <= k05 or 0.06 <= k05:
        kp = 0.3
    else:
        kp = 1.0 - 0.7 * (0.06 - pre_kld) / (0.06 - k05)

    n70, n99 = nn_pcts
    if nn_mcts_diff == 0.0 or nn_mcts_diff <= n70 or n99 <= n70:
        nb = 1.0
    else:
        nb = 1.0 + 0.60 * (nn_mcts_diff - n70) / (n99 - n70)

    raw_bonus = min(max(sb if flags & STDDEV_BONUS else 1.0,
                        1.0,  # kld bonus disabled in these tests
                        nb if flags & NN_MCTS_BONUS else 1.0), 2.5)
    raw_penalty = min(sp if flags & STDDEV_PENALTY else 1.0,
                      kp if flags & KLD_PENALTY else 1.0)
    sel_bonus = 1.0 + qadj * (raw_bonus - 1.0)
    sel_penalty = 1.0 + qadj * (raw_penalty - 1.0)
    unscaled = sel_bonus * sel_penalty
    return 1.0 + scale * (unscaled - 1.0)


def run_one(n_pre, std_dev, pre_kld, nn_mcts_diff, q, scale,
            calib=None, flags=DEFAULT_FLAGS):
    if calib is None:
        calib = default_calibration()
    res = compute_move_sel(
        jnp.array([n_pre], jnp.int32), jnp.array([std_dev]),
        jnp.array([pre_kld]), jnp.array([nn_mcts_diff]), jnp.array([q]),
        scale, calib, flags)
    return float(res.modifier[0])


class TestMoveSel:
    def test_zero_signals_give_unit_modifier(self):
        assert run_one(0, 0.0, 0.0, 0.0, 0.0, 1.0) == 1.0

    def test_decided_position_attenuates_to_one(self):
        # |q| >= 0.9 -> sel_q_adjust == 0 -> modifier == 1 even with strong
        # signals (move_sel_manager.h:119-123).
        m = run_one(50, 0.0, 0.03, 0.5, 0.95, 1.0)
        assert abs(m - 1.0) < 1e-6

    def test_kld_penalty_matches_reference_math(self):
        m = run_one(0, 0.0, 0.03, 0.0, 0.0, 1.0, flags=KLD_PENALTY)
        expect = 1.0 - 0.7 * (0.06 - 0.03) / (0.06 - 0.0001)
        assert abs(m - expect) < 1e-5

    def test_nn_mcts_bonus_matches_reference_math(self):
        m = run_one(0, 0.0, 0.0, 0.40, 0.0, 1.0, flags=NN_MCTS_BONUS)
        expect = 1.0 + 0.60 * (0.40 - 0.1463) / (0.6500 - 0.1463)
        assert abs(m - expect) < 1e-5

    def test_scale_factor_zero_collapses_to_one(self):
        assert abs(run_one(50, 0.0, 0.03, 0.5, 0.0, 0.0) - 1.0) < 1e-6

    def test_random_cross_check_vs_scalar_reference(self):
        rng = np.random.RandomState(0)
        expected_by_bin = {0: 0.05, 10: 0.2, 20: 0.35, 50: 0.5, 200: 0.9}
        table = np.zeros((NUM_STD_BINS,), np.float32)
        for b, v in expected_by_bin.items():
            table[b // 5] = v
        calib = default_calibration()._replace(
            expected_std_by_n=jnp.asarray(table))
        flags = (STDDEV_BONUS | STDDEV_PENALTY | KLD_PENALTY
                 | NN_MCTS_BONUS)
        for _ in range(50):
            n_pre = int(rng.randint(0, 260))
            std = float(rng.rand() * 1.2) if rng.rand() > 0.2 else 0.0
            kld = float(rng.rand() * 0.5) if rng.rand() > 0.2 else 0.0
            diff = float(rng.rand() * 0.9) if rng.rand() > 0.2 else 0.0
            q = float(rng.rand() * 2 - 1)
            scale = float(rng.rand())
            got = run_one(n_pre, std, kld, diff, q, scale, calib, flags)
            want = scalar_ref_compute(n_pre, std, kld, diff, q, scale,
                                      expected_by_bin, flags)
            assert abs(got - want) < 1e-4, (n_pre, std, kld, diff, q, scale)


def make_stats(n=200, seed=1):
    rng = np.random.RandomState(seed)
    return MoveStatsBatch(
        sampled_raw_policy=rng.rand(n) < 0.1,
        nn_q=rng.randn(n) * 0.3,
        mcts_q=rng.randn(n) * 0.3,
        nn_mcts_diff=np.abs(rng.randn(n)) * 0.2,
        v_outcome_stddev=np.abs(rng.randn(n)) * 0.3,
        prior_entropy=rng.rand(n) * 4,
        nn_uncertainty=rng.rand(n),
        kld=rng.rand(n),
        pre_kld=rng.rand(n) * 0.3,
        sel_mult_modifier=0.5 + rng.rand(n),
        sel_mult_modifier_weight=np.ones(n),
        visit_count=rng.randint(1, 200, n).astype(np.float32),
        visit_count_pre=rng.randint(0, 260, n).astype(np.float32),
    )


class TestStatsPipeline:
    def test_percentiles_nearest_rank(self):
        vals = np.arange(1.0, 101.0)  # 1..100
        pcts = compute_percentiles(vals)
        # p50 -> index round(0.5 * 99) = 50 -> value 51 (tf_recorder.cc:29-33)
        assert pcts[10] == 51.0
        assert pcts[0] == vals[round(0.01 * 99)]
        assert pcts[-1] == vals[round(0.99 * 99)]

    def test_stats_file_roundtrip_and_calibration(self, tmp_path):
        stats = make_stats()
        write_stats_file(tmp_path / "gen001_b000.stats", stats)
        write_stats_file(tmp_path / "gen001_b001.stats", make_stats(seed=2))
        calib = compute_calibration(tmp_path, 1)
        assert calib is not None
        assert "pre_kld.p70" in calib
        assert "v_outcome_stddev_adj.p50" in calib
        assert any(k.startswith("expected_std.n") for k in calib)
        base = compute_sel_mult_base(calib)
        assert base is not None and abs(base * calib["sel_mult_mean"] - 1.0) < 1e-6

        write_calibration_file(calib, tmp_path / "calib.txt")
        text = (tmp_path / "calib.txt").read_text()
        assert "pre_kld.p70=" in text

        sel_calib = calibration_from_dict(calib)
        assert isinstance(sel_calib, SelMultCalibration)
        # expected_std table populated from the averaged bins
        assert float(jnp.sum(sel_calib.expected_std_by_n > 0)) > 0

    def test_expected_std_bins_cap(self):
        stats = make_stats()
        bins = expected_std_bins(stats)
        assert bins.shape == (NUM_STD_BINS,)
        # entries at n >= 200 collapse into the cap bin
        big = (stats.visit_count_pre >= 200) & (stats.v_outcome_stddev > 0) \
            & ~stats.sampled_raw_policy.astype(bool)
        if big.any():
            assert bins[-1] > 0

    def test_sel_mult_mean_weighted(self):
        stats = MoveStatsBatch(
            sampled_raw_policy=np.array([False, False, True]),
            nn_q=np.zeros(3), mcts_q=np.zeros(3), nn_mcts_diff=np.zeros(3),
            v_outcome_stddev=np.zeros(3), prior_entropy=np.zeros(3),
            nn_uncertainty=np.zeros(3), kld=np.zeros(3),
            pre_kld=np.zeros(3),
            sel_mult_modifier=np.array([2.0, 1.0, 100.0]),
            sel_mult_modifier_weight=np.array([1.0, 3.0, 1.0]),
            visit_count=np.zeros(3), visit_count_pre=np.zeros(3))
        # raw-policy row excluded; weighted mean = (2 + 3) / 4
        assert abs(sel_mult_mean(stats) - 1.25) < 1e-9
