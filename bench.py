"""Benchmark: self-play moves/s/chip on b12c128 @ 19x19 (BASELINE.json).

Runs the full vectorized self-play step with the REFERENCE workload mix
(selfplay/main.cc:40-47 defaults: 25% of moves selected-tier n=128 k=8,
75% fast-tier n=32 k=5, per-board playout-cap randomization) with
in-graph b12c128btl3 bf16 inference, tree reuse, superko guard, board
step and record writes — measured at STEADY STATE: 100 plies are played
before timing so trees, reuse carries and game phases reflect mid-game
self-play rather than the tiny-tree opening.

Finished boards are recycled with fresh games at the production harvest
cadence (rl/loop.py harvests + reset_finished every 16 plies): without
recycling, the active-board count decays through the measurement window
while the lockstep step cost stays full-width, so moves/s would measure
the game-length distribution of the random-init net instead of sustained
throughput. Reset cost is inside the timed region.

Reference anchor: ~70 min/generation at 5,000 games/gen on 1x A100 + 30
vCPU => ~250-400 self-play moves/s system-wide (BASELINE.md,
journal.md:188), with the same 25/75 tier mix. vs_baseline uses the 325
moves/s midpoint.

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
WARMUP_PLIES = int(os.environ.get("BENCH_WARMUP_PLIES", "100"))
TIMED_PLIES = int(os.environ.get("BENCH_TIMED_PLIES", "32"))
RESET_EVERY = 16  # production harvest cadence (rl/loop.py:297)
# Noise floor (VERDICT r4 weak #5): repeat the timed window TRIALS times
# on the same warmed state and report the median; min/max spread goes in
# the JSON so cross-round deltas are interpretable (same-day controls in
# round 4 showed ~2% environment drift on single-shot windows).
TRIALS = int(os.environ.get("BENCH_TRIALS", "5"))
# Serving graph: BN-folded, head-pruned forward (p3achygo_tpu/nn/serve.py).
SERVE_FOLD = os.environ.get("BENCH_SERVE_FOLD", "1") == "1"
# int8-ACTIVATION serving graph (p3achygo_tpu/nn/serve_q.py, ROOFLINE.md
# lever #1). OPT-IN A/B knob only — the official number stays bf16 until
# int8 serving passes a strength match (the visit_group precedent).
SERVE_Q = os.environ.get("BENCH_SERVE_Q", "0") == "1"


def main():
    from p3achygo_tpu.game.board import new_state
    from p3achygo_tpu.mcts.gumbel import SearchParams, make_eval_fn
    from p3achygo_tpu.models import build_model, get_config, init_params
    from p3achygo_tpu.mcts.tree import make_tree
    from p3achygo_tpu.selfplay.loop import (
        SelfplayConfig,
        finished_mask,
        make_aux,
        make_game_buffer,
        reset_finished,
        selfplay_step_tiered,
    )

    B = int(os.environ.get("BENCH_BATCH", "1024"))
    cfg = SelfplayConfig(batch_size=B)
    # Grouped visits (SearchParams.visit_group): the production default.
    g = int(os.environ.get("BENCH_VISIT_GROUP", "4"))
    params_sel = SearchParams(n=128, k=8, noise_scale=1.0, max_depth=24,
                              visit_group=g)
    params_fast = SearchParams(n=32, k=5, noise_scale=1.0, max_depth=24,
                               visit_group=g)

    model = build_model(get_config("b12c128btl3"), dtype=jnp.bfloat16)
    variables = init_params(model, jax.random.PRNGKey(0))
    serve_q_scales = None
    if SERVE_Q:
        from p3achygo_tpu.features import batched_features
        from p3achygo_tpu.game.board import legal_mask, step
        from p3achygo_tpu.nn.serve_q import calibrate

        # Calibration positions: random playouts to mixed plies (same
        # protocol as benchmarks/int8_serve_probe.py — empty boards would
        # under-range every site).
        calib = jax.vmap(lambda _: new_state(7.5))(jnp.arange(1024))
        ck = jax.random.PRNGKey(7)

        @jax.jit
        def rstep(states, key):
            lm = jax.vmap(legal_mask)(states)
            mv = jax.random.categorical(key, jnp.where(lm, 0.0, -1e9), -1)
            return jax.vmap(step)(states, mv.astype(jnp.int32))[0]

        for _ in range(60):
            ck, ks = jax.random.split(ck)
            calib = rstep(calib, ks)
        cp, cs = batched_features(calib, False, planes_dtype=jnp.bfloat16)
        serve_q_scales = jax.jit(
            lambda p, s: calibrate(model, variables, p, s))(cp, cs)
    eval_fn = make_eval_fn(model, variables, serve_fold=SERVE_FOLD,
                           serve_q_scales=serve_q_scales)

    reuse_capacity = 64

    @jax.jit
    def sp_step(states, buf, aux, tree, key):
        return selfplay_step_tiered(
            states, buf, aux, key, eval_fn, params_sel, params_fast, cfg,
            reuse_tree=tree, reuse_capacity=reuse_capacity)

    @jax.jit
    def recycle(states, buf, aux, tree, key):
        # Fresh games only, raw-policy opening kept off (pure full-search
        # workload); records are dropped (the production loop harvests
        # them host-side at the same cadence).
        done = finished_mask(states, cfg)
        states, buf, aux, tree = reset_finished(
            states, buf, aux, done, cfg.komi, key,
            max_raw_policy_moves=0, reuse_tree=tree)
        return states, buf, aux, tree

    states = jax.vmap(lambda _: new_state(cfg.komi))(jnp.arange(B))
    buf = make_game_buffer(B, cfg.max_game_len)
    key = jax.random.PRNGKey(1)
    key, kaux = jax.random.split(key)
    aux = make_aux(kaux, B)
    # Disable the raw-policy opening for a pure full-search benchmark.
    aux = aux._replace(raw_until=aux.raw_until * 0)
    tree = make_tree(B, reuse_capacity)

    # Warmup/compile + play into the mid-game, recycling finished games at
    # the production cadence.
    for i in range(WARMUP_PLIES):
        states, buf, aux, tree, key = sp_step(states, buf, aux, tree, key)
        if (i + 1) % RESET_EVERY == 0:
            key, kr = jax.random.split(key)
            states, buf, aux, tree = recycle(states, buf, aux, tree, kr)
    jax.block_until_ready(states.stones)

    trial_rates = []
    for _ in range(TRIALS):
        active_counts = []
        t0 = time.time()
        for i in range(TIMED_PLIES):
            active_counts.append(jnp.sum(~finished_mask(states, cfg)))
            states, buf, aux, tree, key = sp_step(states, buf, aux, tree, key)
            if (i + 1) % RESET_EVERY == 0:
                key, kr = jax.random.split(key)
                states, buf, aux, tree = recycle(states, buf, aux, tree, kr)
        jax.block_until_ready(states.stones)
        dt = time.time() - t0
        moves = int(sum(int(c) for c in active_counts))
        trial_rates.append(moves / dt)

    trial_rates.sort()
    moves_per_sec = trial_rates[len(trial_rates) // 2]
    print(json.dumps({
        "metric": "selfplay_moves_per_sec_per_chip_b12c128_refmix_steady",
        "value": round(moves_per_sec, 2),
        "unit": "moves/s/chip",
        "vs_baseline": round(moves_per_sec / BASELINE_MOVES_PER_SEC, 3),
        "trials": len(trial_rates),
        "spread": [round(trial_rates[0], 2), round(trial_rates[-1], 2)],
        "serve_fold": SERVE_FOLD,
    }))


if __name__ == "__main__":
    main()
