"""Strength proxy for grouped visits: visit_group=G vs =1, same net.

Both players share the same (random-init) b8c64 weights; search quality is
measured as head-to-head winrate under the eval harness (the search that
better optimizes the net's own value function wins more). Not a
substitute for a trained-model eval, but a cheap regression guard for the
within-group Q-freeze approximation.

Usage: python benchmarks/group_strength_proxy.py [G] [games] (TPU env)
"""
import os
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from p3achygo_tpu.eval.harness import EvalConfig, EvalRunner
    from p3achygo_tpu.eval.player_config import PlayerSearchConfig
    from p3achygo_tpu.mcts.gumbel import SearchParams
    from p3achygo_tpu.models import build_model, get_config, init_params

    G = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    games = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    model = build_model(get_config("b8c64"), dtype=jnp.bfloat16)
    variables = init_params(model, jax.random.PRNGKey(7))

    cfg = EvalConfig(
        num_games=games, max_game_len=220,
        search=SearchParams(n=32, k=4, noise_scale=0.0, tau=0.0),
        cand=PlayerSearchConfig(n=32, k=4, noise_scale=0.0, visit_group=G),
        cur=PlayerSearchConfig(n=32, k=4, noise_scale=0.0, visit_group=1))
    runner = EvalRunner(model, cfg)
    res = runner.run(jax.random.PRNGKey(1), variables, variables)
    print(f"visit_group={G} vs 1: winrate={res.winrate:.3f} "
          f"elo={res.elo:+.1f} [{res.elo_lo:+.1f},{res.elo_hi:+.1f}] "
          f"({games} games, resign {res.by_resign})")


if __name__ == "__main__":
    main()
