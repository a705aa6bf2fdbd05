"""Model zoo: trunk blocks, heads, configs, losses."""
from p3achygo_tpu.models.config import CONFIG_OPTIONS, ModelConfig, get_config  # noqa: F401
from p3achygo_tpu.models.losses import GroundTruth, LossCoeffs, compute_losses  # noqa: F401
from p3achygo_tpu.models.model import (  # noqa: F401
    ModelOutputs,
    P3achyGoModel,
    build_model,
    init_params,
)
