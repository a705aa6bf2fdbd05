"""Test config: run on a virtual 8-device CPU mesh, never on the TPU chip.

Must run before jax is imported. The container env pins JAX_PLATFORMS=axon
(single tunneled TPU chip); tests force the CPU platform so they are
parallel-safe and don't contend for the chip.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_TRACEBACK_FILTERING", "off")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
