"""mxu_ceiling with memoization-proof timing: distinct input buffers per
iteration (the axon relay appears to short-circuit repeated identical
executions — mxu_ceiling.py measured 50 PFLOP/s)."""
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit_varied(name, fn, make_args, flops, iters=8):
    args_list = [make_args(i) for i in range(iters)]
    jax.block_until_ready(args_list)
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*a) for a in args_list]
    jax.block_until_ready(outs)
    ms = (time.time() - t0) / iters * 1000
    tf = (flops / (ms / 1000)) / 1e12
    print(f"  {name}: {ms:.2f} ms  ({tf:.1f} TFLOP/s)", flush=True)
    return ms


def main():
    print("devices:", jax.devices(), flush=True)
    mm = jax.jit(lambda a, b: a @ b)

    M = 4096
    timeit_varied(
        f"bf16 {M}^3 matmul", mm,
        lambda i: (jax.random.normal(jax.random.PRNGKey(i), (M, M),
                                     jnp.bfloat16),
                   jax.random.normal(jax.random.PRNGKey(100 + i), (M, M),
                                     jnp.bfloat16)),
        flops=2 * M**3)

    P = 4096 * 361
    for (K, N, label) in ((576, 64, "inner 3x3 im2col [P,576]x[576,64]"),
                          (1152, 128, "c128 3x3 im2col [P,1152]x[1152,128]")):
        timeit_varied(
            label, mm,
            lambda i, K=K, N=N: (
                jax.random.normal(jax.random.PRNGKey(i), (P, K),
                                  jnp.bfloat16),
                jax.random.normal(jax.random.PRNGKey(100 + i), (K, N),
                                  jnp.bfloat16)),
            flops=2 * P * K * N)

    for C in (64, 128):
        @jax.jit
        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        timeit_varied(
            f"XLA conv3x3 {C}ch [4096,19,19,{C}]", conv,
            lambda i, C=C: (
                jax.random.normal(jax.random.PRNGKey(i), (4096, 19, 19, C),
                                  jnp.bfloat16),
                jax.random.normal(jax.random.PRNGKey(100 + i), (3, 3, C, C),
                                  jnp.bfloat16)),
            flops=2 * 4096 * 361 * 9 * C * C)


if __name__ == "__main__":
    main()
