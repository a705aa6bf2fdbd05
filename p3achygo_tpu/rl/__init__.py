"""RL orchestration: end-to-end slice, generations, gating."""
from p3achygo_tpu.rl.slice import RLSlice, SliceConfig  # noqa: F401
