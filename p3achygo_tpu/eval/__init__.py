"""Cur-vs-cand evaluation + Elo gating."""
from p3achygo_tpu.eval.elo import elo_with_ci, relative_elo  # noqa: F401
from p3achygo_tpu.eval.harness import EvalConfig, EvalResult, run_eval  # noqa: F401
