"""Strength validation for int8-ACTIVATION serving: int8 vs bf16 folded
graph, SAME trained weights, head-to-head under the eval harness.

The int8 serving graph (nn/serve_q.py, ROOFLINE.md lever #1) may only
become a bench/production default if its search-quality cost is
measured and acceptable — the visit_group precedent (that default
shipped two rounds on an invalid proxy; the honest match then cost a
round of reruns). This is the honest match, run BEFORE any default
flip.

Protocol (mirrors benchmarks/group_strength_proxy.py, the harness's
gating-bug rules): root Gumbel noise ON, trained weights (newest
committed curve golden), >=256 games, production fast tier (and
--selected for the n=128 tier). Candidate = int8 serving, incumbent =
bf16 serve-fold; same weights, so Elo delta isolates serving precision.

Also prints top-1 agreement + value delta on trained-net positions (the
probe's random-init agreement under-states trained-net agreement:
peaked policies quantize cleanly).

Usage: python benchmarks/int8_strength.py [games] [ckpt] [tier]
       (TPU env, ONE process; tier in {fast, selected})
"""
import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks.group_strength_proxy import _default_ckpt  # noqa: E402


def main():
    from p3achygo_tpu.eval.harness import EvalConfig, run_eval
    from p3achygo_tpu.features import batched_features
    from p3achygo_tpu.game.board import legal_mask, new_state, step
    from p3achygo_tpu.mcts.gumbel import SearchParams, make_eval_fn
    from p3achygo_tpu.models import build_model, get_config, init_params
    from p3achygo_tpu.nn.serve import serve_forward
    from p3achygo_tpu.nn.serve_q import calibrate, serve_q_forward
    from p3achygo_tpu.train.checkpoint import restore_checkpoint

    games = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    ckpt = sys.argv[2] if len(sys.argv) > 2 else _default_ckpt()
    tier = sys.argv[3] if len(sys.argv) > 3 else "fast"
    n, k = (128, 8) if tier == "selected" else (32, 5)
    # CPU-smoke overrides
    n = int(os.environ.get("INT8S_N", n))
    k = int(os.environ.get("INT8S_K", k))
    max_len = int(os.environ.get("INT8S_MAXLEN", "220"))
    calib_b = int(os.environ.get("INT8S_CALIB", "512"))

    model = build_model(get_config("b8c64"), dtype=jnp.bfloat16)
    variables = init_params(model, jax.random.PRNGKey(7))
    if ckpt != "random" and os.path.isdir(ckpt):
        tmpl = {"params": variables["params"],
                "batch_stats": variables["batch_stats"],
                "step": jnp.zeros((), jnp.int32)}
        full = restore_checkpoint(ckpt, tmpl)
        variables = {"params": full["params"],
                     "batch_stats": full["batch_stats"]}
        print(f"weights: {ckpt}", flush=True)
    else:
        print("weights: random-init", flush=True)

    # Calibration: random playouts at three ply depths; per-site max of
    # the three scale sets covers opening/mid/late activation ranges.
    @jax.jit
    def rstep(states, key):
        lm = jax.vmap(legal_mask)(states)
        mv = jax.random.categorical(key, jnp.where(lm, 0.0, -1e9), -1)
        return jax.vmap(step)(states, mv.astype(jnp.int32))[0]

    cal = jax.jit(lambda p, s: calibrate(model, variables, p, s))
    scales = None
    states = jax.vmap(lambda _: new_state(7.5))(jnp.arange(calib_b))
    key = jax.random.PRNGKey(3)
    for depth in (20, 60, 120):
        while int(states.move_count[0]) < depth:
            key, ks = jax.random.split(key)
            states = rstep(states, ks)
        cp, cs = batched_features(states, False, planes_dtype=jnp.bfloat16)
        s = cal(cp, cs)
        scales = s if scales is None else jax.tree_util.tree_map(
            jnp.maximum, scales, s)
        if depth == 60:
            # trained-net agreement snapshot at mid-game
            ref = serve_forward(model, variables, cp, cs)
            got = serve_q_forward(model, variables, cp, cs, scales=s)
            agree = float((np.argmax(np.asarray(ref.pi_logits), -1)
                           == np.argmax(np.asarray(got.pi_logits), -1)).mean())
            vd = np.abs(np.asarray(ref.outcome_probs)[:, 1]
                        - np.asarray(got.outcome_probs)[:, 1])
            print(f"trained-net top-1 agreement ({calib_b} mid-game): "
                  f"{agree:.4f} |value d| mean {vd.mean():.4f} p95 "
                  f"{np.percentile(vd, 95):.4f}", flush=True)

    fn_int8 = make_eval_fn(model, variables, serve_q_scales=scales)
    fn_bf16 = make_eval_fn(model, variables, serve_fold=True)

    cfg = EvalConfig(
        num_games=games, max_game_len=max_len,
        search=SearchParams(n=n, k=k, noise_scale=1.0, tau=0.0,
                            visit_group=4))
    res = run_eval(jax.random.PRNGKey(1), fn_int8, fn_bf16, cfg)
    print(f"[{tier} n={n} k={k} g=4] int8 vs bf16 serving: "
          f"winrate={res.winrate:.3f} elo={res.elo:+.1f} "
          f"[{res.elo_lo:+.1f},{res.elo_hi:+.1f}] "
          f"({games} games, resign {res.by_resign})", flush=True)


if __name__ == "__main__":
    main()
