"""Time the v2 fused Pallas trunk (interleaved layout) vs flax on-chip.

Usage: python benchmarks/bench_trunk_kernel2.py [W] (TPU env, ONE process)
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / iters * 1000
    print(f"  {name}: {ms:.2f} ms", flush=True)
    return ms


def main():
    from p3achygo_tpu.models import build_model, get_config, init_params
    from p3achygo_tpu.nn.trunk_kernel2 import build_trunk_fn_v2

    W = int(sys.argv[1]) if len(sys.argv) > 1 else 15360
    cfg = get_config("b12c128btl3")
    model = build_model(cfg, dtype=jnp.bfloat16)
    variables = init_params(model, jax.random.PRNGKey(0))

    planes = jnp.zeros((W, 19, 19, 15), jnp.float32)
    scalars = jnp.zeros((W, 8), jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(W, 19, 19, 128)),
                    jnp.bfloat16)

    trunk_fn = build_trunk_fn_v2(cfg, variables)
    tk = jax.jit(trunk_fn)
    timeit(f"pallas trunk v2 W={W}", tk, x)

    fwd_flax = jax.jit(lambda p, s: model.apply(variables, p, s,
                                                train=False))
    fwd_fused = jax.jit(lambda p, s: model.apply(variables, p, s,
                                                 train=False,
                                                 trunk_fn=trunk_fn))
    t1 = timeit("model.apply flax", fwd_flax, planes, scalars, iters=4)
    t2 = timeit("model.apply fused trunk v2", fwd_fused, planes, scalars,
                iters=4)
    a = np.argmax(np.asarray(fwd_flax(planes, scalars).pi_logits), -1)
    b = np.argmax(np.asarray(fwd_fused(planes, scalars).pi_logits), -1)
    print(f"  top-1 agreement: {(a == b).mean():.4f}")
    print(f"  speedup: {t1 / t2:.2f}x", flush=True)


if __name__ == "__main__":
    main()
