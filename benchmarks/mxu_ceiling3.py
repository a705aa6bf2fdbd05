"""MXU ceiling, measured honestly: dependent-chain fori_loop inside ONE
jit (per CLAUDE.md: independent back-to-back host calls lie through the
axon relay — mxu_ceiling2.py 'measured' 3.8 PFLOP/s). Per-iteration cost
is the (n_hi - n_lo) slope, which cancels dispatch + boundary effects.

Usage: python benchmarks/mxu_ceiling3.py  (TPU env, ONE process)
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_LO, N_HI = 4, 20


def slope_ms(chain, *args):
    lo = functools.partial(chain, n=N_LO)
    hi = functools.partial(chain, n=N_HI)
    lo_j = jax.jit(lo)
    hi_j = jax.jit(hi)
    jax.block_until_ready(lo_j(*args))
    jax.block_until_ready(hi_j(*args))
    t0 = time.time()
    jax.block_until_ready(lo_j(*args))
    t_lo = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(hi_j(*args))
    t_hi = time.time() - t0
    return (t_hi - t_lo) / (N_HI - N_LO) * 1000


def report(name, ms, flops):
    print(f"  {name}: {ms:.2f} ms/iter  ({flops / (ms / 1000) / 1e12:.1f} "
          f"TFLOP/s)", flush=True)


def main():
    key = jax.random.PRNGKey(0)

    # square matmul chain with renorm
    M = 4096
    a = jax.random.normal(key, (M, M), jnp.bfloat16)
    b = jax.random.normal(key, (M, M), jnp.bfloat16)

    def mm_chain(a, b, n):
        def body(i, y):
            y = y @ b
            return y * lax.rsqrt(jnp.mean(jnp.square(
                y.astype(jnp.float32)))).astype(jnp.bfloat16)
        return lax.fori_loop(0, n, body, a)

    report(f"bf16 {M}^3 matmul", slope_ms(mm_chain, a, b), 2 * M**3)

    # trunk im2col shapes: [P,K]x[K,N] with a cheap projection back to K
    P = 4096 * 361
    for (K, N, label) in ((576, 64, "inner 3x3 im2col [P,576]x[576,64]"),
                          (1152, 128, "c128 3x3 im2col [P,1152]x[1152,128]")):
        x = jax.random.normal(key, (P, K), jnp.bfloat16)
        w = jax.random.normal(key, (K, N), jnp.bfloat16)
        wb = jax.random.normal(key, (N, K), jnp.bfloat16) * 0.01

        def proj_chain(x, w, wb, n, K=K, N=N):
            def body(i, x):
                y = x @ w
                x = jnp.minimum(x, jnp.max(jnp.abs(
                    y.astype(jnp.float32))) + 1e9).astype(jnp.bfloat16)
                return x
            return lax.fori_loop(0, n, body, x)

        report(label, slope_ms(proj_chain, x, w, wb), 2 * P * K * N)

    # XLA conv3x3 chain (shape-preserving)
    for C in (64, 128):
        x = jax.random.normal(key, (4096, 19, 19, C), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) \
            * (1.0 / (3 * C) ** 0.5)

        def conv_chain(x, w, n):
            def body(i, x):
                y = lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return y * lax.rsqrt(jnp.mean(jnp.square(
                    y.astype(jnp.float32)))).astype(jnp.bfloat16)
            return lax.fori_loop(0, n, body, x)

        report(f"XLA conv3x3 {C}ch [4096,19,19,{C}]",
               slope_ms(conv_chain, x, w), 2 * 4096 * 361 * 9 * C * C)

    # the real model forward, dependency-chained through the input planes
    from p3achygo_tpu.models import build_model, get_config, init_params
    model = build_model(get_config("b12c128btl3"), dtype=jnp.bfloat16)
    variables = init_params(model, jax.random.PRNGKey(0))
    W = 4096
    planes = (jax.random.uniform(key, (W, 19, 19, 15)) < 0.3).astype(
        jnp.float32)
    scalars = jnp.zeros((W, 8), jnp.float32)

    def model_chain(planes, scalars, n):
        def body(i, carry):
            planes, acc = carry
            out = model.apply(variables, planes, scalars, train=False)
            s = jnp.sum(out.outcome_probs).astype(jnp.float32)
            planes = jnp.minimum(planes, s + 1e9)
            return planes, acc + s
        return lax.fori_loop(0, n, body, (planes, 0.0))

    ms = slope_ms(model_chain, planes, scalars)
    print(f"  model.apply b12c128btl3 @W=4096 (chained): {ms:.2f} ms/iter",
          flush=True)


if __name__ == "__main__":
    main()
