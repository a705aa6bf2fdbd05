"""Vectorized self-play: lockstep driver, records, reuse buffers."""
from p3achygo_tpu.selfplay.loop import (  # noqa: F401
    GameBuffer,
    SelfplayAux,
    SelfplayConfig,
    make_aux,
    final_scores,
    finished_mask,
    make_game_buffer,
    reset_finished,
    selfplay_step,
    tau_schedule,
)
from p3achygo_tpu.selfplay.records import GameExamples, finalize_game  # noqa: F401
