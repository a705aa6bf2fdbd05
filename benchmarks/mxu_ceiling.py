"""What is the chip's realizable bf16 MXU peak, and how close is the
b12c128btl3 forward to it at search widths?

Times (a) a large square bf16 matmul (peak proxy), (b) the trunk's exact
im2col shapes at W=4096, (c) XLA's conv3x3 at the same shapes, (d) the
9-shift-matmul conv formulation (pallas-style candidate).

Usage: python benchmarks/mxu_ceiling.py  (TPU env, ONE process)
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(name, fn, *args, flops=None, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / iters * 1000
    tf = (flops / (ms / 1000)) / 1e12 if flops else 0.0
    print(f"  {name}: {ms:.2f} ms" + (f"  ({tf:.1f} TFLOP/s)" if flops else ""),
          flush=True)
    return ms


def main():
    key = jax.random.PRNGKey(0)

    # (a) peak proxy: 8192^3 matmul
    M = 8192
    a = jax.random.normal(key, (M, M), jnp.bfloat16)
    b = jax.random.normal(key, (M, M), jnp.bfloat16)
    mm = jax.jit(lambda a, b: a @ b)
    timeit("bf16 8192^3 matmul", mm, a, b, flops=2 * M**3)

    # (b) trunk im2col shapes at W=4096 (P = W*361 rows)
    P = 4096 * 361
    for (K, N, label) in ((576, 64, "inner 3x3 im2col [P,576]x[576,64]"),
                          (128, 64, "reduce 1x1      [P,128]x[128,64]"),
                          (64, 128, "expand 1x1      [P,64]x[64,128]"),
                          (1152, 128, "c128 3x3 im2col [P,1152]x[1152,128]")):
        x = jax.random.normal(key, (P, K), jnp.bfloat16)
        w = jax.random.normal(key, (K, N), jnp.bfloat16)
        timeit(label, mm, x, w, flops=2 * P * K * N)

    # (c) XLA conv3x3 at both widths
    for C in (64, 128):
        x = jax.random.normal(key, (4096, 19, 19, C), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16)

        @jax.jit
        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        timeit(f"XLA conv3x3 {C}ch [4096,19,19,{C}]", conv, x, w,
               flops=2 * 4096 * 361 * 9 * C * C)

    # (d) 9-shift-matmul conv: sum_{di,dj} shift(x) @ W[di,dj]
    C = 64
    x = jax.random.normal(key, (4096, 19, 19, C), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16)

    @jax.jit
    def shift_conv(x, w):
        out = jnp.zeros_like(x)
        for di in range(3):
            for dj in range(3):
                xs = jnp.roll(x, (1 - di, 1 - dj), axis=(1, 2))
                # zero the wrapped edge rows/cols
                if di == 0:
                    xs = xs.at[:, 0, :, :].set(0)
                elif di == 2:
                    xs = xs.at[:, -1, :, :].set(0)
                if dj == 0:
                    xs = xs.at[:, :, 0, :].set(0)
                elif dj == 2:
                    xs = xs.at[:, :, -1, :].set(0)
                out = out + jnp.einsum("nhwc,cd->nhwd", xs, w[di, dj],
                                       preferred_element_type=jnp.bfloat16)
        return out
    timeit("9-shift matmul conv 64ch", shift_conv, x, w,
           flops=2 * 4096 * 361 * 9 * C * C)


if __name__ == "__main__":
    main()
