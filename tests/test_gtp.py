"""GTP service tests (command parity with cc/gtp/service.h:20-65)."""
import io

import numpy as np
import pytest

from p3achygo_tpu.gtp import (
    GtpConfig,
    GtpService,
    action_to_gtp_vertex,
    gtp_vertex_to_action,
    run_stdin_loop,
)
from p3achygo_tpu.mcts.gumbel import SearchParams, uniform_eval_fn


@pytest.fixture(scope="module")
def svc():
    return GtpService(uniform_eval_fn,
                      GtpConfig(search=SearchParams(n=4, k=2, max_depth=6)))


def test_vertex_roundtrip():
    assert gtp_vertex_to_action("A1") == 18 * 19 + 0
    assert gtp_vertex_to_action("T19") == 18
    assert gtp_vertex_to_action("pass") == 361
    # 'I' is skipped: J3 is column index 8
    assert gtp_vertex_to_action("J3") == 16 * 19 + 8
    for v in ("D4", "Q16", "K10", "pass"):
        assert action_to_gtp_vertex(gtp_vertex_to_action(v)) == v.lower() \
            if v == "pass" else action_to_gtp_vertex(gtp_vertex_to_action(v)) == v


def test_basic_commands(svc):
    ok, resp = svc.handle("protocol_version")
    assert ok and resp == "2"
    ok, resp = svc.handle("name")
    assert ok and resp == "p3achygo_tpu"
    ok, resp = svc.handle("known_command genmove")
    assert ok and resp == "true"
    ok, resp = svc.handle("known_command frobnicate")
    assert ok and resp == "false"
    ok, resp = svc.handle("boardsize 19")
    assert ok
    ok, resp = svc.handle("boardsize 9")
    assert not ok


def test_play_and_genmove(svc):
    svc.handle("clear_board")
    ok, _ = svc.handle("play b D4")
    assert ok
    ok, resp = svc.handle("genmove w")
    assert ok
    assert resp == "pass" or resp[0] in "ABCDEFGHJKLMNOPQRST"
    ok, _ = svc.handle("play b D4")  # occupied now
    assert not ok
    ok, _ = svc.handle("undo")
    assert ok


def test_final_score_and_ownership(svc):
    svc.handle("clear_board")
    ok, resp = svc.handle("final_score")
    assert ok and resp.startswith("W+")  # komi on empty board
    ok, resp = svc.handle("p3achygo-ownership")
    assert ok and len(resp.splitlines()) == 19


def test_stdin_loop():
    svc = GtpService(uniform_eval_fn,
                     GtpConfig(search=SearchParams(n=4, k=2, max_depth=6)))
    inp = io.StringIO("1 name\nbogus_cmd\nplay b Q16\nquit\n")
    out = io.StringIO()
    run_stdin_loop(svc, inp, out)
    text = out.getvalue()
    assert "= p3achygo_tpu" in text
    assert "? unknown command" in text
    assert text.strip().endswith("=")


def test_time_control_commands(svc):
    svc.handle("clear_board")
    ok, _ = svc.handle("time_settings 300 30 5")
    assert ok
    ok, _ = svc.handle("time_left b 120 0")
    assert ok
    ok, resp = svc.handle("genmove b")
    assert ok
    # budget tracking established an ms/visit estimate
    assert svc.time_control.ms_per_visit > 0


def test_lz_analyze(svc):
    svc.handle("clear_board")
    svc.handle("play b D4")
    ok, resp = svc.handle("lz-analyze")
    assert ok
    assert resp.startswith("info move ")
    assert "visits" in resp and "winrate" in resp


def test_time_control_budget_math():
    from p3achygo_tpu.gtp.time_control import TimeControl

    tc = TimeControl()
    assert tc.compute_move_time_ms(0) == 0  # unconfigured
    tc.set_time_settings(300, 0, 0)
    b = tc.compute_move_time_ms(100)
    assert 0 < b <= 300000
    tc.set_time_left(0, 10, 3)  # byoyomi: move at last second
    assert tc.compute_move_time_ms(100) == 9000
    tc2 = TimeControl()
    tc2.ms_per_visit = 10.0
    assert tc2.pick_visits(700, (16, 32, 64, 128)) == 64
    assert tc2.pick_visits(50, (16, 32, 64)) == 16
