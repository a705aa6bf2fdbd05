"""Pallas TPU kernels for the hot ops."""
from p3achygo_tpu.ops.liberties import (  # noqa: F401
    point_liberties_auto,
    point_liberties_batch,
    point_liberties_reference,
)
