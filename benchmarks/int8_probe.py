"""int8 quantization probe (TRT int8 calibrator parity question,
cc/nn/engine/trt_calibrator.cc; PARITY §2.2 r3 item).

On TPU the int8 story is: (a) does weight-only int8 (per-output-channel
symmetric, dequant at load) hurt policy/value quality? (b) does a TRUE
int8 MXU matmul beat bf16 at this model's dominant shapes (else int8
serving can't pay off regardless of accuracy)?

Measures:
  1. policy top-1 agreement + |value delta| of a w8-quantized b12c128
     net vs its bf16 baseline over positions from random playouts.
  2. int8 vs bf16 matmul wall-clock at the im2col'd 3x3-conv shape
     (the model's FLOPs bulk) and the 1x1/head shape.

Usage: python benchmarks/int8_probe.py  (TPU env, ONE process)
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


def quantize_w8(params):
    """Per-output-channel symmetric int8 fake-quant of every kernel."""
    def q(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name != "kernel" or x.ndim < 2:
            return x
        # output channels = last axis; reduce over the rest.
        red = tuple(range(x.ndim - 1))
        scale = jnp.max(jnp.abs(x), axis=red, keepdims=True) / 127.0
        scale = jnp.maximum(scale, 1e-12)
        qx = jnp.clip(jnp.round(x / scale), -127, 127)
        return (qx * scale).astype(x.dtype)
    return jax.tree_util.tree_map_with_path(q, params)


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / iters * 1000
    print(f"{name}: {ms:.3f} ms", flush=True)
    return ms


def main():
    from p3achygo_tpu.game.board import legal_mask, new_state, step
    from p3achygo_tpu.mcts.gumbel import make_eval_fn
    from p3achygo_tpu.models import build_model, get_config, init_params

    B = 1024
    model = build_model(get_config("b12c128btl3"), dtype=jnp.bfloat16)
    variables = init_params(model, jax.random.PRNGKey(0))
    qvariables = dict(variables)
    qvariables["params"] = quantize_w8(variables["params"])

    eval_bf16 = jax.jit(make_eval_fn(model, variables, symmetrize=False))
    eval_w8 = jax.jit(make_eval_fn(model, qvariables, symmetrize=False))

    # Positions from random playouts (mix of plies).
    states = jax.vmap(lambda _: new_state(7.5))(jnp.arange(B))
    key = jax.random.PRNGKey(1)

    @jax.jit
    def random_step(states, key):
        lm = jax.vmap(legal_mask)(states)
        mv = jax.random.categorical(key, jnp.where(lm, 0.0, -1e9), axis=-1)
        nxt, _ = jax.vmap(step)(states, mv.astype(jnp.int32))
        return nxt

    for i in range(40):
        key, ks = jax.random.split(key)
        states = random_step(states, ks)

    o_b = eval_bf16(states)
    o_q = eval_w8(states)
    top_b = np.argmax(np.asarray(o_b.log_priors), -1)
    top_q = np.argmax(np.asarray(o_q.log_priors), -1)
    agree = float((top_b == top_q).mean())
    vd = np.abs(np.asarray(o_b.outcome_value) - np.asarray(o_q.outcome_value))
    print(f"w8 policy top-1 agreement: {agree:.4f}")
    print(f"w8 |value delta|: mean {vd.mean():.4f}  p95 "
          f"{np.percentile(vd, 95):.4f}  max {vd.max():.4f}", flush=True)

    # True int8 matmul vs bf16 at model shapes.
    M = 4096 * 361  # rows of an im2col'd batch (W=4096 NN width)
    for (m, k_, n_) in ((M // 8, 1152, 128), (M // 8, 128, 128)):
        kk = jax.random.PRNGKey(2)
        a8 = jax.random.randint(kk, (m, k_), -127, 127, dtype=jnp.int8)
        w8 = jax.random.randint(kk, (k_, n_), -127, 127, dtype=jnp.int8)
        ab = a8.astype(jnp.bfloat16)
        wb = w8.astype(jnp.bfloat16)
        f_i8 = jax.jit(lambda a, w: jax.lax.dot(
            a, w, preferred_element_type=jnp.int32))
        f_bf = jax.jit(lambda a, w: jax.lax.dot(
            a, w, preferred_element_type=jnp.float32))
        t_i = timeit(f"int8 dot [{m},{k_}]x[{k_},{n_}]", f_i8, a8, w8)
        t_b = timeit(f"bf16 dot [{m},{k_}]x[{k_},{n_}]", f_bf, ab, wb)
        print(f"  int8/bf16 speed ratio: {t_b / t_i:.2f}x", flush=True)

    # Full fwd timing (w8 dequant is still bf16 math; sanity only).
    planes_shape = None
    timeit("fwd bf16 (W=4096)",
           lambda s: eval_bf16(s).outcome_value,
           jax.tree_util.tree_map(lambda x: jnp.concatenate([x] * 4), states))


if __name__ == "__main__":
    main()
