"""Two-process jax.distributed smoke test (SURVEY §2.13 multi-host).

Spawns two fresh CPU processes, each with 4 virtual devices, that join one
jax.distributed cluster (8 global devices), assemble a host-sharded batch
with `host_local_to_global`, broadcast weights with `replicate`, and run
one SPMD train step — the multi-host actor-learner skeleton
(p3achygo_tpu/parallel/distributed.py).
"""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PYTHONSTARTUP", None)
pid = int(sys.argv[1]); port = sys.argv[2]

from p3achygo_tpu.parallel.distributed import (
    global_mesh, host_local_to_global, init_multihost, local_shards,
    replicate, shard_params_global)
init_multihost(f"localhost:{port}", num_processes=2, process_id=pid,
               local_device_count=4)

import jax, jax.numpy as jnp, numpy as np
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

from p3achygo_tpu.models import LossCoeffs, build_model, get_config, init_params
from p3achygo_tpu.train.optimizer import sgd_nesterov
from p3achygo_tpu.train.step import create_train_state, make_train_step
from p3achygo_tpu.data.pipeline import prepare_batch
from p3achygo_tpu.constants import NUM_MOVES

mesh = global_mesh(model_parallel=1)
model = build_model(get_config("tiny"), dtype=jnp.float32)
variables = init_params(model, jax.random.PRNGKey(0))
tx = sgd_nesterov(1e-3)
state = create_train_state(variables, tx)
train_step = jax.jit(make_train_step(model, tx, LossCoeffs.rl()))

with mesh:
    state = jax.tree_util.tree_map(lambda x: x, state)
    state = state._replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh))

    # Each host contributes its own 8 rows of the global 16-row batch.
    rng = np.random.default_rng(100 + pid)
    B_local = 8
    local = {
        "stones": rng.integers(-1, 2, (B_local, 361)).astype(np.int8),
        "last_moves": rng.integers(-1, 362, (B_local, 5)).astype(np.int16),
        "color": rng.choice([-1, 1], (B_local,)).astype(np.int8),
        "komi": np.full((B_local,), 7.5, np.float32),
        "pi": np.full((B_local, NUM_MOVES), 1.0 / NUM_MOVES, np.float32),
        "pi_aux": np.zeros((B_local,), np.int16),
        "pi_aux_dist": np.full((B_local, NUM_MOVES), 1.0 / NUM_MOVES,
                               np.float32),
        "has_pi_aux_dist": np.ones((B_local,), bool),
        "own": np.zeros((B_local, 361), np.int8),
        "score_margin": np.zeros((B_local,), np.float32),
        "z": np.ones((B_local,), np.float32),
        "q6": np.zeros((B_local,), np.float32),
        "q16": np.zeros((B_local,), np.float32),
        "q50": np.zeros((B_local,), np.float32),
        "q6_score": np.zeros((B_local,), np.float32),
        "q16_score": np.zeros((B_local,), np.float32),
        "q50_score": np.zeros((B_local,), np.float32),
        "weight": np.ones((B_local,), np.float32),
    }
    gbatch = host_local_to_global(local, mesh)
    planes, scalars, targets = jax.jit(
        prepare_batch, static_argnames=("augment",))(
        jax.random.PRNGKey(1), gbatch, augment=False)
    new_state, losses = train_step(state, planes, scalars, targets)
    loss = float(losses["loss"])
    assert np.isfinite(loss)
    # Every host computes the SAME loss (one SPMD program, summed grads).
    print(f"MULTIHOST_OK pid={pid} loss={loss:.6f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_spmd_train_step(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "PYTHONPATH")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        assert "MULTIHOST_OK" in out, out[-4000:]
    # Both processes agree on the global loss.
    losses = sorted(line.split("loss=")[1] for out in outs
                    for line in out.splitlines() if "MULTIHOST_OK" in line)
    assert len(losses) == 2 and losses[0] == losses[1], losses
