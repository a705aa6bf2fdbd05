"""Fork manager + reuse buffer variant tests (fork_manager.h, reuse_buffer.h)."""
import numpy as np
import pytest

from p3achygo_tpu.constants import NUM_LOCS, PASS_MOVE
from p3achygo_tpu.selfplay.fork import (
    EARLY,
    LATE,
    REGRET,
    SAMPLE_UNIFORM,
    UNIFORM,
    ForkEvaluator,
    ForkManager,
    ForkParams,
    ForkPlan,
    GameRecord,
    compute_komi_delta,
    regret_candidates,
    sample_fork_plan,
    sample_trapezoidal,
)
from p3achygo_tpu.selfplay.reuse import (
    FMB_FORCE_FULL_SEARCH,
    FMB_SAMPLE,
    CompositeBuffer,
    GoExploitBuffer,
    InitState,
    RegretGuidedBuffer,
    make_reuse_buffer,
)


def make_record(L=40, komi=7.5, winner=1, seed=0):
    rng = np.random.default_rng(seed)
    return GameRecord(
        stones=rng.integers(-1, 2, size=(L, NUM_LOCS)).astype(np.int8),
        last_moves=rng.integers(0, 361, size=(L, 5)).astype(np.int16),
        to_move=np.array([1 if t % 2 == 0 else -1 for t in range(L)],
                         np.int8),
        move=rng.integers(0, 361, size=(L,)).astype(np.int16),
        nn_value=rng.uniform(-0.5, 0.5, L).astype(np.float32),
        mcts_value=rng.uniform(-0.5, 0.5, L).astype(np.float32),
        mcts_score=rng.uniform(-10, 10, L).astype(np.float32),
        eligible=np.ones(L, bool),
        komi=komi, winner=winner)


class TestSampling:
    def test_trapezoidal_support_and_shape(self):
        rng = np.random.default_rng(0)
        draws = np.array([sample_trapezoidal(rng) for _ in range(4000)])
        assert draws.min() >= 10 and draws.max() <= 250
        # ~60% of mass in [10, 100), decaying tail after.
        flat_frac = np.mean(draws < 100)
        assert 0.52 < flat_frac < 0.68
        early_tail = np.mean((draws >= 100) & (draws < 175))
        late_tail = np.mean(draws >= 175)
        assert early_tail > late_tail  # decaying density

    def test_plan_distribution(self):
        rng = np.random.default_rng(1)
        p = ForkParams()
        kinds = [sample_fork_plan(rng, p).kind for _ in range(4000)]
        frac = {k: kinds.count(k) / len(kinds)
                for k in (LATE, SAMPLE_UNIFORM, UNIFORM)}
        assert abs(frac[LATE] - 0.09) < 0.02
        assert abs(frac[SAMPLE_UNIFORM] - 0.01) < 0.01
        assert abs(frac[UNIFORM] - 0.90) < 0.03

    def test_for_reuse_rescaling(self):
        # Halving reuse_prob doubles fork rates (fork_manager.h:65-96).
        p = ForkParams.for_reuse(0.1)
        assert abs(p.late_fork_prob - 0.18) < 1e-6
        assert abs(p.sample_random_prob - 0.02) < 1e-6
        # Overflow clamps to 0.9 total fork mass.
        p2 = ForkParams.for_reuse(0.01)
        total = (p2.early_fork_prob + p2.late_fork_prob
                 + p2.sample_policy_t1_prob + p2.sample_policy_t2_prob
                 + p2.sample_random_prob)
        assert abs(total - 0.9) < 1e-5
        assert abs(p2.uniform_prob - 0.1) < 1e-5

    def test_komi_delta_signs(self):
        # Black ahead by S -> +S; White ahead by S (from White's
        # perspective) -> -S (fork_manager.h:513-521).
        assert compute_komi_delta(6.4, 1) == 6.0
        assert compute_komi_delta(6.4, -1) == -6.0


class TestRegret:
    def test_regret_matches_scalar_port(self):
        """Cross-check the vector math against a literal transcription."""
        rec = make_record(L=20, seed=3)
        rng = np.random.default_rng(7)
        got = regret_candidates(rec, rng)
        # With |mcts_value| <= 0.5 and moves < 100, both attenuation
        # weights are 1 -> every eligible move is accepted.
        assert len(got) == 20
        # Literal recompute for move 0.
        m = 0
        color = int(rec.to_move[m])
        ema, w, ws = 0.0, 1.0, 0.0
        for k in range(1, 50):
            if m + k >= 20:
                break
            w *= 0.94
            fv = float(rec.mcts_value[m + k])
            if int(rec.to_move[m + k]) != color:
                fv = -fv
            ema += w * fv
            ws += w
        ema /= ws
        smoothed = (float(rec.mcts_value[m]) + ema * 0.94) / 1.94
        outcome = 1.5 if rec.winner == color else -1.5
        expect = (abs(float(rec.nn_value[m]) - smoothed)**2
                  + abs(float(rec.mcts_value[m]) - ema)**2
                  + max(smoothed - outcome - abs(outcome), 0.0)**2)
        score0 = [s for s, mm in got if mm == 0][0]
        assert abs(score0 - expect) < 1e-6

    def test_decided_positions_are_attenuated(self):
        rec = make_record(L=10, seed=4)
        rec.mcts_value[:] = 0.95  # |v| > 0.9 -> weight 0
        rng = np.random.default_rng(0)
        assert regret_candidates(rec, rng) == []


class TestBuffers:
    def _st(self, n):
        return InitState(stones=np.zeros(NUM_LOCS, np.int8),
                         last_moves=np.full(5, PASS_MOVE, np.int16),
                         to_move=1, move_num=n)

    def test_regret_buffer_max_order_and_forced_search(self):
        buf = RegretGuidedBuffer(capacity=8)
        for i, r in enumerate([0.3, 0.9, 0.1, 0.5]):
            buf.add(self._st(i), r)
        top = buf.get()
        assert top.move_num == 1  # regret 0.9
        assert top.first_move_behavior == FMB_FORCE_FULL_SEARCH
        assert buf.get().move_num == 3  # 0.5

    def test_regret_buffer_evicts_lowest(self):
        buf = RegretGuidedBuffer(capacity=3)
        for i, r in enumerate([0.4, 0.2, 0.6, 0.8]):
            buf.add(self._st(i), r)
        got = sorted([buf.get().move_num for _ in range(3)])
        assert got == [0, 2, 3]  # regret 0.2 evicted

    def test_composite_alternates(self):
        buf = CompositeBuffer(capacity=8)
        buf.add(self._st(0), 0.1)
        buf.add(self._st(1), 0.9)
        a, b = buf.get(), buf.get()
        kinds = {a.first_move_behavior, b.first_move_behavior}
        assert FMB_FORCE_FULL_SEARCH in kinds  # one came from regret side

    def test_factory(self):
        assert isinstance(make_reuse_buffer("goexploit"), GoExploitBuffer)
        assert isinstance(make_reuse_buffer("regret"), RegretGuidedBuffer)
        assert isinstance(make_reuse_buffer("composite"), CompositeBuffer)
        with pytest.raises(ValueError):
            make_reuse_buffer("bogus")


class TestForkManagerIntegration:
    def _evaluator(self):
        from p3achygo_tpu.mcts.gumbel import uniform_eval_fn

        return ForkEvaluator(eval_fn=uniform_eval_fn, batch=16)

    def _empty_board_record(self, L=30, seed=0):
        # Real empty-ish boards so legality/play work.
        rec = make_record(L=L, seed=seed)
        rec.stones[:] = 0
        rec.last_moves[:] = PASS_MOVE
        return rec

    def test_uniform_fork_adds_restart(self):
        buf = GoExploitBuffer(capacity=64)
        fm = ForkManager(ForkParams(), buf, self._evaluator(), seed=5)
        rec = self._empty_board_record()
        rec.mcts_value[:] = 0.0  # no attenuation
        for seed in range(40):
            fm.process_game(ForkPlan(UNIFORM, -1), rec)
        assert len(buf) > 0
        st = buf.pop_random()
        assert st.kind == "fork_" + UNIFORM
        assert st.first_move_behavior == FMB_SAMPLE

    def test_late_fork_flush_produces_legal_child(self):
        buf = GoExploitBuffer(capacity=64)
        fm = ForkManager(ForkParams(), buf, self._evaluator(), seed=6)
        rec = self._empty_board_record(L=40)
        fm.process_game(ForkPlan(LATE, 12), rec)
        added = fm.flush(variables=None)
        assert added == 1
        st = buf.pop_random()
        # P' (or P'') has 1 or 2 stones on an empty board fork.
        nstones = int(np.sum(st.stones != 0))
        assert nstones in (1, 2)
        assert st.move_num in (13, 14)
        assert st.komi is not None

    def test_sample_uniform_forces_full_search(self):
        buf = GoExploitBuffer(capacity=64)
        fm = ForkManager(ForkParams(), buf, self._evaluator(), seed=7)
        rec = self._empty_board_record(L=40)
        fm.process_game(ForkPlan(SAMPLE_UNIFORM, 5), rec)
        assert fm.flush(variables=None) == 1
        st = buf.pop_random()
        assert st.first_move_behavior == FMB_FORCE_FULL_SEARCH

    def test_regret_plan_feeds_buffer_with_score(self):
        buf = RegretGuidedBuffer(capacity=16)
        fm = ForkManager(ForkParams(regret_prob=1.0, late_fork_prob=0.0,
                                    sample_random_prob=0.0),
                         buf, self._evaluator(), seed=8)
        rec = make_record(L=20, seed=9)
        fm.process_game(ForkPlan(REGRET, -1), rec)
        assert len(buf) == 1
        st = buf.get()
        assert st.regret > 0
        assert st.first_move_behavior == FMB_FORCE_FULL_SEARCH

    def test_restarted_games_never_fork(self):
        fm = ForkManager(ForkParams(), GoExploitBuffer(), self._evaluator(),
                         seed=10)
        assert fm.new_plan(is_fresh=False) is None
        assert fm.new_plan(is_fresh=True) is not None
