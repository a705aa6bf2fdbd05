"""Replay buffer + training data pipeline."""
from p3achygo_tpu.data.pipeline import prepare_batch  # noqa: F401
from p3achygo_tpu.data.replay import ReplayBuffer  # noqa: F401
