"""RunConfig growth schedules: gating games/eval-n growth and the
per-generation LR schedule (rl_loop/train.py:33-49 get_lr;
train_sp_eval.py:70-74 get_eval_n; round-4 gating-resolution growth)."""
import json
import os

from p3achygo_tpu.rl.config import (RunConfig, eval_games_for_gen,
                                    eval_n_for_gen, gumbel_params_for_gen,
                                    parse)
from p3achygo_tpu.train.lr_schedule import lr_for_gen


def test_eval_games_growth():
    cfg = RunConfig(eval_games=128, min_eval_games=64,
                    eval_games_growth_window=8)
    assert eval_games_for_gen(cfg, 0) == 64
    assert eval_games_for_gen(cfg, 4) == 96
    assert eval_games_for_gen(cfg, 8) == 128
    assert eval_games_for_gen(cfg, 100) == 128
    # always even (color-parity halves)
    for g in range(12):
        assert eval_games_for_gen(cfg, g) % 2 == 0


def test_eval_games_growth_disabled():
    cfg = RunConfig(eval_games=100)
    assert eval_games_for_gen(cfg, 0) == 100
    assert eval_games_for_gen(cfg, 50) == 100


def test_eval_n_growth_clamps_to_2k():
    cfg = RunConfig(eval_n=32, min_eval_n=4, eval_n_growth_window=10,
                    eval_k=4)
    assert eval_n_for_gen(cfg, 0) == 8  # clamped to 2*eval_k
    assert eval_n_for_gen(cfg, 10) == 32


def test_lr_schedule_piecewise_with_transition():
    cfg = RunConfig(lr=1e-2, lr_schedule=[(0, 1e-2), (9, 3e-3)],
                    lr_transition_window=3)
    assert lr_for_gen(cfg, 0) == 1e-2
    assert lr_for_gen(cfg, 5) == 1e-2  # before the transition window
    # inside the window: half-cosine toward 3e-3
    mid = lr_for_gen(cfg, 8)
    assert 3e-3 < mid < 1e-2
    assert lr_for_gen(cfg, 9) == 3e-3
    assert lr_for_gen(cfg, 15) == 3e-3


def test_lr_growth_window_scale():
    cfg = RunConfig(lr=1e-2, lr_growth_window=4)
    assert abs(lr_for_gen(cfg, 0) - 1e-3) < 1e-9  # 0.1x warmup floor
    assert abs(lr_for_gen(cfg, 4) - 1e-2) < 1e-9


def test_parse_r4_curve_config():
    cfg = parse("config/r4-b8c64-curve.json")
    assert cfg.terminal_mode == "exact"
    assert cfg.min_eval_games == 64 and cfg.eval_games == 128
    assert cfg.lr_schedule == [(0, 1e-2), (9, 3e-3)]
    assert eval_games_for_gen(cfg, 8) == 128
    n, k = gumbel_params_for_gen(cfg, 0, selected=True)
    assert (n, k) == (32, 4)
