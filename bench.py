"""Benchmark: self-play moves/s/chip on b12c128 @ 19x19 (BASELINE.json).

Runs the full vectorized self-play step (Gumbel n=32 k=4 search with
in-graph b12c128btl3 bf16 inference, superko guard, board step, record
writes) on the real chip and reports lockstep moves/s.

Reference anchor: ~70 min/generation at 5,000 games/gen on 1x A100 + 30
vCPU => ~250-400 self-play moves/s system-wide (BASELINE.md, journal.md:188).
vs_baseline uses the 325 moves/s midpoint.

Prints ONE JSON line.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: the axon remote-compile path is slow; cache
# compiled executables across bench runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

BASELINE_MOVES_PER_SEC = 325.0


def main():
    from p3achygo_tpu.game.board import new_state
    from p3achygo_tpu.mcts.gumbel import SearchParams, make_eval_fn
    from p3achygo_tpu.models import build_model, get_config, init_params
    from p3achygo_tpu.selfplay.loop import (
        SelfplayConfig,
        make_aux,
        make_game_buffer,
        selfplay_step,
    )

    B = 1024
    cfg = SelfplayConfig(batch_size=B)
    params = SearchParams(n=32, k=4, noise_scale=1.0, max_depth=24)

    model = build_model(get_config("b12c128btl3"), dtype=jnp.bfloat16)
    variables = init_params(model, jax.random.PRNGKey(0))
    eval_fn = make_eval_fn(model, variables)

    from p3achygo_tpu.mcts.tree import make_tree

    reuse_capacity = params.n + 2

    @jax.jit
    def sp_step(states, buf, aux, tree, key):
        return selfplay_step(states, buf, aux, key, eval_fn, params, cfg,
                             selected_tier=True, reuse_tree=tree,
                             reuse_capacity=reuse_capacity)

    states = jax.vmap(lambda _: new_state(cfg.komi))(jnp.arange(B))
    buf = make_game_buffer(B, cfg.max_game_len)
    key = jax.random.PRNGKey(1)
    key, kaux = jax.random.split(key)
    aux = make_aux(kaux, B)
    # Disable the raw-policy opening for a pure full-search benchmark.
    aux = aux._replace(raw_until=aux.raw_until * 0)
    tree = make_tree(B, reuse_capacity)

    # Warmup/compile.
    states, buf, aux, tree, key = sp_step(states, buf, aux, tree, key)
    jax.block_until_ready(states.stones)

    steps = 8
    t0 = time.time()
    for _ in range(steps):
        states, buf, aux, tree, key = sp_step(states, buf, aux, tree, key)
    jax.block_until_ready(states.stones)
    dt = time.time() - t0

    moves_per_sec = B * steps / dt
    print(json.dumps({
        "metric": "selfplay_moves_per_sec_per_chip_b12c128_n32k4",
        "value": round(moves_per_sec, 2),
        "unit": "moves/s/chip",
        "vs_baseline": round(moves_per_sec / BASELINE_MOVES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
