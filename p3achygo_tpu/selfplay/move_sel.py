"""Move-selection multiplier (sel_mult) signals, vectorized over boards.

Mirrors cc/selfplay/move_sel_manager.h (MoveSelManager::Compute and its
signal helpers, move_sel_manager.h:39-177) and the SelMultCalibration
struct (self_play_thread.h:23-36): the probability of recording a move as
a training example is scaled by a modifier derived from pre-search root
signals — outcome-value stddev (normalized against a per-generation
expected-stddev-by-visit-count table), pre-search policy KLD, and
|NN - MCTS| value disagreement — each gated against per-generation
percentile thresholds and attenuated at decided positions.

The reference computes this per move on the CPU thread; here it is a pure
[B]-vectorized function evaluated in-graph from `mcts.gumbel.root_pre_stats`
of the reused tree.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# MoveSelFlags (move_sel_manager.h:11-17).
STDDEV_BONUS = 1 << 0
STDDEV_PENALTY = 1 << 1
KLD_BONUS = 1 << 2
KLD_PENALTY = 1 << 3
NN_MCTS_BONUS = 1 << 4
# Production flag set (self_play_thread.cc:315-316).
DEFAULT_FLAGS = NN_MCTS_BONUS | KLD_PENALTY

# expected_std_by_n bins: 0, 5, ..., 200 (visit_count_pre // 5 * 5, capped;
# move_sel_manager.h:81, tf_recorder.cc:400-428).
STD_BIN_CAP = 200
NUM_STD_BINS = STD_BIN_CAP // 5 + 1  # 41


class SelMultCalibration(NamedTuple):
    """Per-generation percentile thresholds (self_play_thread.h:23-36).

    Scalar fields default to the reference's hardcoded fallbacks
    (move_sel_manager.h:128-172); `expected_std_by_n[i]` is the mean
    pre-search outcome stddev for visit bin 5*i (0 = no data, which
    disables the stddev signals exactly like the reference's empty map).
    """

    std_adj_p01: jnp.ndarray
    std_adj_p50: jnp.ndarray
    std_adj_p80: jnp.ndarray
    std_adj_p99: jnp.ndarray
    pre_kld_p05: jnp.ndarray
    pre_kld_p70: jnp.ndarray
    pre_kld_p95: jnp.ndarray
    nn_mcts_p70: jnp.ndarray
    nn_mcts_p99: jnp.ndarray
    expected_std_by_n: jnp.ndarray  # f32[NUM_STD_BINS]


def default_calibration() -> SelMultCalibration:
    f = lambda x: jnp.float32(x)
    return SelMultCalibration(
        std_adj_p01=f(0.02), std_adj_p50=f(0.64),
        std_adj_p80=f(1.52), std_adj_p99=f(4.96),
        pre_kld_p05=f(0.0001), pre_kld_p70=f(0.310), pre_kld_p95=f(1.166),
        nn_mcts_p70=f(0.1463), nn_mcts_p99=f(0.6500),
        expected_std_by_n=jnp.zeros((NUM_STD_BINS,), jnp.float32),
    )


def calibration_from_dict(calib: dict) -> SelMultCalibration:
    """Build a SelMultCalibration from a flat {'field.pct': value} dict
    (the format written by the calibration loop / parsed by
    main.cc ParseCalibrationFile:71-121). Missing keys keep defaults."""
    d = default_calibration()
    g = lambda key, dflt: jnp.float32(calib.get(key, float(dflt)))
    expected = np.zeros((NUM_STD_BINS,), np.float32)
    for key, val in calib.items():
        if key.startswith("expected_std.n"):
            try:
                bin_n = int(key[len("expected_std.n"):])
            except ValueError:
                continue
            if 0 <= bin_n <= STD_BIN_CAP and bin_n % 5 == 0:
                expected[bin_n // 5] = val
    return SelMultCalibration(
        std_adj_p01=g("v_outcome_stddev_adj.p01", d.std_adj_p01),
        std_adj_p50=g("v_outcome_stddev_adj.p50", d.std_adj_p50),
        std_adj_p80=g("v_outcome_stddev_adj.p80", d.std_adj_p80),
        std_adj_p99=g("v_outcome_stddev_adj.p99", d.std_adj_p99),
        pre_kld_p05=g("pre_kld.p05", d.pre_kld_p05),
        pre_kld_p70=g("pre_kld.p70", d.pre_kld_p70),
        pre_kld_p95=g("pre_kld.p95", d.pre_kld_p95),
        nn_mcts_p70=g("nn_mcts_diff.p70", d.nn_mcts_p70),
        nn_mcts_p99=g("nn_mcts_diff.p99", d.nn_mcts_p99),
        expected_std_by_n=jnp.asarray(expected),
    )


class MoveSelResult(NamedTuple):
    """All signals, computed unconditionally for logging
    (move_sel_manager.h:19-32); flags gate which are applied."""

    modifier: jnp.ndarray  # effective (sel_mult_scale_factor applied)
    modifier_unscaled: jnp.ndarray
    sel_bonus: jnp.ndarray
    sel_penalty: jnp.ndarray
    sel_std_bonus: jnp.ndarray
    sel_std_penalty: jnp.ndarray
    sel_kld_bonus: jnp.ndarray
    sel_kld_penalty: jnp.ndarray
    sel_nn_mcts_bonus: jnp.ndarray
    sel_q_adjust: jnp.ndarray
    std_adj: jnp.ndarray
    std_adj_att: jnp.ndarray


def _expected_std(n_pre: jnp.ndarray,
                  calib: SelMultCalibration) -> jnp.ndarray:
    """4-nearest-populated-bin interpolation of expected_std_by_n
    (MoveSelManager::StdAdj, move_sel_manager.h:76-105). -> f32[B], 0 when
    the table is empty."""
    bins = jnp.arange(NUM_STD_BINS, dtype=jnp.int32) * 5
    vals = calib.expected_std_by_n
    populated = vals > 0.0
    query = jnp.minimum((n_pre // 5) * 5, STD_BIN_CAP)  # [B]
    dist = jnp.abs(bins[None, :] - query[:, None]).astype(jnp.float32)
    # top_k over negated distance; unpopulated bins pushed to the bottom.
    # Ties at equal distance resolve to the lower bin index, matching the
    # reference's stable sort over ascending bins.
    score = jnp.where(populated[None, :], -dist, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(score, 4)  # [B, 4]
    usable = jnp.isfinite(top_scores)
    d = jnp.where(usable, -top_scores, 0.0)
    w = jnp.where(usable, 1.0 / (d + 5.0), 0.0)
    oh = jax.nn.one_hot(top_idx, NUM_STD_BINS, dtype=jnp.float32)
    v = jnp.einsum("bkn,n->bk", oh, vals)
    sum_w = jnp.sum(w, axis=1)
    expected = jnp.where(sum_w > 0, jnp.sum(w * v, axis=1)
                         / jnp.maximum(sum_w, 1e-10), 0.0)
    return expected


def compute_move_sel(n_pre: jnp.ndarray, std_dev: jnp.ndarray,
                     pre_kld: jnp.ndarray, nn_mcts_diff: jnp.ndarray,
                     q_canonical: jnp.ndarray,
                     sel_mult_scale_factor,
                     calib: SelMultCalibration,
                     flags: int = DEFAULT_FLAGS) -> MoveSelResult:
    """MoveSelManager::Compute (move_sel_manager.h:39-73), [B]-vectorized."""
    expected = _expected_std(n_pre, calib)
    std_adj = jnp.where((std_dev > 0) & (expected > 0), std_dev
                        / jnp.maximum(expected, 1e-10), 0.0)

    # Attenuate toward 1 at low n_pre (move_sel_manager.h:110-115).
    att = jnp.minimum(
        1.0, 0.2 + 0.8 * jnp.power(
            jnp.maximum(n_pre.astype(jnp.float32), 0.0) / 40.0, 0.54))
    std_adj_att = jnp.where(std_adj == 0.0, 0.0,
                            1.0 + (std_adj - 1.0) * att)

    # Won/lost positions have naturally weak signals
    # (move_sel_manager.h:119-123).
    base = 1.0 - jnp.clip((jnp.abs(q_canonical) - 0.5) / 0.4, 0.0, 1.0)
    sel_q_adjust = jnp.power(jnp.maximum(base, 0.0), 0.4)

    sa = std_adj_att
    # StdBonus (move_sel_manager.h:125-133).
    lb, ub = calib.std_adj_p80, calib.std_adj_p99
    std_bonus = jnp.where(
        (sa == 0.0) | (sa <= lb) | (ub <= lb), 1.0,
        1.0 + 0.5 * (sa - lb) / jnp.maximum(ub - lb, 1e-10))
    # StdPenalty (move_sel_manager.h:135-145).
    lb, ub = calib.std_adj_p01, calib.std_adj_p50
    floor = 0.3
    std_penalty = jnp.where(
        sa == 0.0, 1.0,
        jnp.where(sa >= ub, 1.0,
                  jnp.where((sa <= lb) | (ub <= lb), floor,
                            1.0 - (1.0 - floor) * (ub - sa)
                            / jnp.maximum(ub - lb, 1e-10))))
    # KldBonus (move_sel_manager.h:147-152).
    lb, ub = calib.pre_kld_p70, calib.pre_kld_p95
    kld_bonus = jnp.where(
        (pre_kld == 0.0) | (pre_kld <= lb) | (ub <= lb), 1.0,
        jnp.minimum(1.5, 1.0 + 0.5 * (pre_kld - lb)
                    / jnp.maximum(ub - lb, 1e-10)))
    # KldPenalty (move_sel_manager.h:154-161): constant upper bound 0.06.
    lb = calib.pre_kld_p05
    kub = 0.06
    kld_penalty = jnp.where(
        (pre_kld == 0.0) | (pre_kld >= kub), 1.0,
        jnp.where((pre_kld <= lb) | (kub <= lb), floor,
                  1.0 - (1.0 - floor) * (kub - pre_kld)
                  / jnp.maximum(kub - lb, 1e-10)))
    # NnMctsBonus (move_sel_manager.h:165-173).
    lb, ub = calib.nn_mcts_p70, calib.nn_mcts_p99
    nn_mcts_bonus = jnp.where(
        (nn_mcts_diff == 0.0) | (nn_mcts_diff <= lb) | (ub <= lb), 1.0,
        1.0 + 0.60 * (nn_mcts_diff - lb) / jnp.maximum(ub - lb, 1e-10))

    one = jnp.ones_like(std_bonus)
    max_bonus = 2.5
    raw_bonus = jnp.minimum(
        jnp.maximum(
            jnp.maximum(std_bonus if flags & STDDEV_BONUS else one,
                        kld_bonus if flags & KLD_BONUS else one),
            nn_mcts_bonus if flags & NN_MCTS_BONUS else one),
        max_bonus)
    raw_penalty = jnp.minimum(std_penalty if flags & STDDEV_PENALTY else one,
                              kld_penalty if flags & KLD_PENALTY else one)

    sel_bonus = 1.0 + sel_q_adjust * (raw_bonus - 1.0)
    sel_penalty = 1.0 + sel_q_adjust * (raw_penalty - 1.0)
    modifier_unscaled = sel_bonus * sel_penalty
    modifier = 1.0 + sel_mult_scale_factor * (modifier_unscaled - 1.0)
    return MoveSelResult(
        modifier=modifier, modifier_unscaled=modifier_unscaled,
        sel_bonus=sel_bonus, sel_penalty=sel_penalty,
        sel_std_bonus=std_bonus, sel_std_penalty=std_penalty,
        sel_kld_bonus=kld_bonus, sel_kld_penalty=kld_penalty,
        sel_nn_mcts_bonus=nn_mcts_bonus, sel_q_adjust=sel_q_adjust,
        std_adj=std_adj, std_adj_att=std_adj_att)
