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

# Persistent CPU compile cache: the suite jits ~200 programs; caching them
# across runs cuts wall time several-fold and reduces in-process compiler
# churn (two full-suite runs crashed with an LLVM abort inside
# backend_compile_and_load under heavy compile load; cache hits avoid
# recompiling entirely). Separate dir from the TPU cache (.jax_cache).
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
